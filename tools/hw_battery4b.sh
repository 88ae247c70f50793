#!/bin/bash
# Round-4 battery, wave 2: re-runs whatever wave 1 lost to tunnel wedges,
# with a health gate BEFORE EVERY item (wave 1 gated only once up front and
# a mid-battery wedge starved three items through their timeouts).
# Run from the repo root:  bash tools/hw_battery4b.sh
set -u
cd "$(dirname "$0")/.."
LOG=evidence/hw_battery4b.log

probe() {
    timeout 120 python - <<'EOF' 2>/dev/null
import sys; sys.path.insert(0, ".")
from bench import probe_tflops
t = probe_tflops(iters=5)
print(f"{t:.1f}")
sys.exit(0 if t >= 15.0 else 1)
EOF
}

wait_healthy() {  # wait_healthy <max_probes>
    for i in $(seq 1 "$1"); do
        if out=$(probe); then
            echo "# healthy (${out} TFLOP/s) probe $i $(date -u +%H:%M:%S)" \
                | tee -a "$LOG"
            return 0
        fi
        echo "# probe $i: wedged ($(date -u +%H:%M:%S))" >> "$LOG"
        sleep 45
    done
    echo "# gave up waiting $(date -u +%H:%M:%S)" | tee -a "$LOG"
    return 1
}

run() {  # run <tag> <timeout_s> <cmd...>
    local tag=$1 to=$2; shift 2
    wait_healthy 40 || return 1
    echo "# [$tag] start $(date -u +%H:%M:%S)" | tee -a "$LOG"
    timeout "$to" "$@" > "evidence/${tag}.txt" 2> "evidence/${tag}.err"
    echo "rc=$?" >> "evidence/${tag}.txt"
    echo "# [$tag] done  $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

echo "# battery4b start $(date -u +%H:%M:%S)" | tee -a "$LOG"
run PROFILE_DECOMPOSE_r04    2400 python tools/profile_decompose.py
run PROFILE_DGCNN_AB_r04     2400 python tools/profile_dgcnn_ab2.py \
        first_tn128 split_tn128 first_tn256 reference --iters 8 --rounds 3
run BENCH_PIPELINE_r04       1800 python tools/bench_pipeline.py --steps 200
run BENCH_r04_local          1500 python bench.py
echo "# battery4b end $(date -u +%H:%M:%S)" | tee -a "$LOG"
