#!/bin/bash
# Round-5 battery, wave 5: the battery5c remainder (killed mid-wave) —
# folding-head A/B, flagship batch-512 probe, DCE-fixed fwd_bwd
# marginals, downstream bench retry, closing bench. Health gate before
# every item.
set -u
cd "$(dirname "$0")/.."
LOG=evidence/hw_battery5e.log

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
            echo "# healthy (${out} TFLOP/s) probe $i $(date -u +%H:%M:%S)" \
                | tee -a "$LOG"
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

echo "# battery5e start $(date -u +%H:%M:%S)" | tee -a "$LOG"
run PROFILE_FLAGSHIP_FOLD_r05 2700 env PF_SKIP_GATE=1 python \
        tools/profile_flagship_ab2.py base fold_xla --iters 16 --rounds 4
run PROFILE_MARGINAL_r05b 2700 env PF_SKIP_GATE=1 PM_ONLY=fwd_bwd python \
        tools/profile_marginal.py
run PROFILE_FLAGSHIP_B512_r05 2400 env PF_SKIP_GATE=1 python \
        tools/profile_flagship_ab2.py base --iters 8 --rounds 3 --batch 512
run BENCH_DOWNSTREAM_r05b 2700 env PF_SKIP_GATE=1 python \
        tools/bench_downstream.py
run BENCH_r05b_local 1800 python bench.py
echo "# battery5e end $(date -u +%H:%M:%S)" | tee -a "$LOG"
