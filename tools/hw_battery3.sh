#!/bin/bash
# Round-3 roofline battery: wait for a healthy tunnel (probe >= 60
# TFLOP/s), then run the roofline (with the r3 upper/lower DRAM bracket)
# and a fresh flagship bench so the §11 reconciliation uses numbers from
# the SAME healthy window.
cd /root/repo
mkdir -p evidence
LOG=evidence/hw_watch_r03.log
echo "$(date +%H:%M:%S) battery3 start" >> "$LOG"
for i in $(seq 1 60); do
  TF=$(timeout 240 python -c \
    "from bench import probe_tflops; print(int(probe_tflops()))" 2>/dev/null | tail -1)
  echo "$(date +%H:%M:%S) b3 probe: ${TF:-hang} TFLOP/s" >> "$LOG"
  if [ -n "$TF" ] && [ "$TF" -ge 60 ] 2>/dev/null; then
    echo "$(date +%H:%M:%S) healthy - roofline" >> "$LOG"
    timeout 1800 python tools/roofline.py --batch 256 \
      > evidence/ROOFLINE_r03.json 2>evidence/roofline_r03_stderr.log
    echo "$(date +%H:%M:%S) roofline rc=$?" >> "$LOG"
    timeout 1800 python bench.py > evidence/BENCH_local_r03b.txt 2>&1
    echo "$(date +%H:%M:%S) bench rc=$?" >> "$LOG"
    echo "$(date +%H:%M:%S) battery3 done" >> "$LOG"
    exit 0
  fi
  sleep 120
done
echo "$(date +%H:%M:%S) battery3 gave up" >> "$LOG"
exit 1
