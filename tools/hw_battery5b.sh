#!/bin/bash
# Round-5 battery, wave 2: post-argmin DGCNN re-measure, flagship
# backward map, downstream benches, roofline, full bench (incl. the new
# e2e-cached metric), TPU kernel smoke. Health gate before every item.
set -u
cd "$(dirname "$0")/.."
LOG=evidence/hw_battery5b.log

probe() {
    timeout 180 python - <<'EOF' 2>/dev/null
import sys; sys.path.insert(0, ".")
from bench import probe_tflops
t = probe_tflops(iters=5)
print(f"{t:.1f}")
sys.exit(0 if t >= 15.0 else 1)
EOF
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

echo "# battery5b start $(date -u +%H:%M:%S)" | tee -a "$LOG"
run PROFILE_DGCNN_AB_r05b 2700 env PF_SKIP_GATE=1 python \
        tools/profile_dgcnn_ab2.py dot_tn256 first_tn512 reference \
        --iters 8 --rounds 3
run PROFILE_DGCNN_STAGES_r05b 2700 env PF_SKIP_GATE=1 python \
        tools/profile_dgcnn_stages.py
run PROFILE_MARGINAL_r05 3000 env PF_SKIP_GATE=1 python \
        tools/profile_marginal.py
run BENCH_DOWNSTREAM_r05 2700 env PF_SKIP_GATE=1 python \
        tools/bench_downstream.py
run TPU_SMOKE_r05 1800 python tools/tpu_smoke.py
run ROOFLINE_r05 2400 python tools/roofline.py
# extract the JSON record for the committed roofline artifact
grep -h "^{" evidence/ROOFLINE_r05.txt | tail -1 > evidence/ROOFLINE_r05.json \
    || true
run BENCH_r05_local 1800 python bench.py
echo "# battery5b end $(date -u +%H:%M:%S)" | tee -a "$LOG"
