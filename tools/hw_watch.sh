#!/bin/bash
# Probe the TPU tunnel; when healthy, run the hardware evidence battery
# (kernel-parity smoke, DGCNN EdgeConv A/B profile, flagship bench) and
# save outputs under evidence/.
cd /root/repo
mkdir -p evidence
for i in $(seq 1 200); do
  TF=$(timeout 120 python - <<'PY' 2>/dev/null
import time, jax, jax.numpy as jnp
x = jnp.ones((4096, 4096), jnp.bfloat16)
f = jax.jit(lambda a: a @ a)
# scalar read forces completion without pulling 32 MiB through the tunnel
y = f(x); _ = float(y[0,0])
t0 = time.perf_counter()
for _ in range(20): y = f(x)
_ = float(y[0,0])
print(int(2*4096**3*20/(time.perf_counter()-t0)/1e12))
PY
)
  echo "$(date +%H:%M:%S) probe: ${TF:-hang} TFLOP/s" >> evidence/hw_watch.log
  if [ -n "$TF" ] && [ "$TF" -ge 20 ]; then
    echo "$(date +%H:%M:%S) healthy - running battery" >> evidence/hw_watch.log
    timeout 1500 python tools/tpu_smoke.py > evidence/TPU_SMOKE_r02.txt 2>&1
    echo "smoke rc=$?" >> evidence/hw_watch.log
    timeout 2400 python tools/profile_dgcnn.py > evidence/PROFILE_DGCNN_r02.txt 2>&1
    echo "profile rc=$?" >> evidence/hw_watch.log
    timeout 1500 python bench.py > evidence/BENCH_local_r02.txt 2>&1  # inner watchdog (1080s) fires first
    echo "bench rc=$?" >> evidence/hw_watch.log
    timeout 1200 python tools/roofline.py --batch 256 > evidence/ROOFLINE_r02.json 2>evidence/roofline_stderr.log
    echo "roofline rc=$?" >> evidence/hw_watch.log
    exit 0
  fi
  sleep 300
done
echo "gave up after 60 probes" >> evidence/hw_watch.log
exit 1
