#!/bin/bash
# One-healthy-window micro-batch: VPU-transcendental probe + the
# base-vs-attn_bnhd flagship A/B (base compile is warm in the cache).
# Run manually when the battery is idle: bash tools/hw_window1.sh
set -u
cd "$(dirname "$0")/.."
timeout 1200 python tools/probe_vpu.py \
    > evidence/PROBE_VPU_r04.txt 2> evidence/PROBE_VPU_r04.err
echo "rc=$?" >> evidence/PROBE_VPU_r04.txt
timeout 1800 python tools/profile_flagship_ab2.py base attn_bnhd \
    --iters 16 --rounds 3 \
    > evidence/PROFILE_ATTN_AB_r04.txt 2> evidence/PROFILE_ATTN_AB_r04.err
echo "rc=$?" >> evidence/PROFILE_ATTN_AB_r04.txt
