#!/bin/bash
# Resume the round-2 hardware evidence battery: the smoke already passed
# (evidence/TPU_SMOKE_r02.txt); re-run the OOM-fixed DGCNN profile, then
# the flagship bench and the roofline.
cd /root/repo
mkdir -p evidence
echo "$(date +%H:%M:%S) battery2 start" >> evidence/hw_watch.log
timeout 2400 python tools/profile_dgcnn.py > evidence/PROFILE_DGCNN_r02.txt 2>&1
echo "$(date +%H:%M:%S) profile rc=$?" >> evidence/hw_watch.log
timeout 1500 python bench.py > evidence/BENCH_local_r02.txt 2>&1
echo "$(date +%H:%M:%S) bench rc=$?" >> evidence/hw_watch.log
timeout 1200 python tools/roofline.py --batch 256 > evidence/ROOFLINE_r02.json 2>evidence/roofline_stderr.log
echo "$(date +%H:%M:%S) roofline rc=$?" >> evidence/hw_watch.log
echo "$(date +%H:%M:%S) battery2 done" >> evidence/hw_watch.log
