#!/bin/bash
# Round-4 hardware battery: waits for the axon tunnel to recover, then runs
# every queued measurement in sequence, each appending to evidence/.
# Run from the repo root:  bash tools/hw_battery4.sh
set -u
cd "$(dirname "$0")/.."

probe() {
    timeout 120 python - <<'EOF' 2>/dev/null
import sys; sys.path.insert(0, ".")
from bench import probe_tflops
t = probe_tflops(iters=5)
print(f"{t:.1f}")
sys.exit(0 if t >= 15.0 else 1)
EOF
}

echo "# battery4 start $(date -u +%H:%M:%S)" | tee -a evidence/hw_battery4.log
for i in $(seq 1 240); do
    if out=$(probe); then
        echo "# tunnel healthy (${out} TFLOP/s) after $i probes $(date -u +%H:%M:%S)" \
            | tee -a evidence/hw_battery4.log
        break
    fi
    echo "# probe $i: wedged/degraded ($(date -u +%H:%M:%S))" >> evidence/hw_battery4.log
    sleep 45
done

run() {  # run <tag> <timeout_s> <cmd...>
    local tag=$1 to=$2; shift 2
    echo "# [$tag] start $(date -u +%H:%M:%S)" | tee -a evidence/hw_battery4.log
    timeout "$to" "$@" > "evidence/${tag}.txt" 2> "evidence/${tag}.err"
    echo "rc=$?" >> "evidence/${tag}.txt"
    echo "# [$tag] done  $(date -u +%H:%M:%S) rc recorded" | tee -a evidence/hw_battery4.log
}

run TPU_SMOKE_r04            900  python tools/tpu_smoke.py
run PROFILE_FLAGSHIP_AB_r04  2400 python tools/profile_flagship_ab2.py \
        base remat residual_bf16 remat+residual --iters 16 --rounds 3
run PROFILE_DGCNN_AB_r04     2400 python tools/profile_dgcnn_ab2.py \
        first_tn128 split_tn128 first_tn256 reference --iters 8 --rounds 3
run BENCH_PIPELINE_r04       1800 python tools/bench_pipeline.py --steps 200
run BENCH_r04_local          1500 python bench.py
echo "# battery4 end $(date -u +%H:%M:%S)" | tee -a evidence/hw_battery4.log
