#!/bin/bash
# Probe the TPU tunnel; when healthy, run the hardware evidence battery
# (kernel-parity smoke, DGCNN EdgeConv A/B profile, flagship bench) and
# save outputs under evidence/.
cd /root/repo
mkdir -p evidence
for i in $(seq 1 200); do
  TF=$(timeout 120 python -c \
    "from bench import probe_tflops; print(int(probe_tflops()))" 2>/dev/null)
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
echo "gave up after 200 probes" >> evidence/hw_watch.log
exit 1
