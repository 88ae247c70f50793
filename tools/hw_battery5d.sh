#!/bin/bash
# Round-5 battery, wave 4: packed-key selection A/B (opt-in approximate
# argmin) + closing flagship A/B at default knobs.
set -u
cd "$(dirname "$0")/.."
LOG=evidence/hw_battery5d.log

probe() {
    timeout 180 python - <<'PYEOF' 2>/dev/null
import sys; sys.path.insert(0, ".")
from bench import probe_tflops
t = probe_tflops(iters=5)
print(f"{t:.1f}")
sys.exit(0 if t >= 15.0 else 1)
PYEOF
}

wait_healthy() {
    for i in $(seq 1 "$1"); do
        if out=$(probe); then
            echo "# healthy (${out} TFLOP/s) probe $i $(date -u +%H:%M:%S)" | tee -a "$LOG"
            return 0
        fi
        echo "# probe $i: wedged/degraded ($(date -u +%H:%M:%S))" >> "$LOG"
        sleep 45
    done
    echo "# gave up waiting $(date -u +%H:%M:%S)" | tee -a "$LOG"
    return 1
}

run() {
    local tag=$1 to=$2; shift 2
    wait_healthy 30 || return 1
    echo "# [$tag] start $(date -u +%H:%M:%S)" | tee -a "$LOG"
    timeout "$to" "$@" > "evidence/${tag}.txt" 2> "evidence/${tag}.err"
    echo "rc=$?" >> "evidence/${tag}.txt"
    echo "# [$tag] done  $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

echo "# battery5d start $(date -u +%H:%M:%S)" | tee -a "$LOG"
run PROFILE_DGCNN_PACKED_r05 2700 env PF_SKIP_GATE=1 python \
        tools/profile_dgcnn_ab2.py dot_tn256 packed_tn256 packed_tn512 \
        --iters 8 --rounds 3
echo "# battery5d end $(date -u +%H:%M:%S)" | tee -a "$LOG"
