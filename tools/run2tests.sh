#!/bin/bash
cd /root/repo
mkdir -p tmp/fulltest
for i in 6 7; do
  echo "=== RUN $i start $(date +%H:%M:%S) head $(git rev-parse --short HEAD) ===" >> tmp/fulltest/summary.txt
  sbt -batch test > tmp/fulltest/run_$i.log 2>&1
  rc=$?
  grep -E "^\[info\] Tests:" tmp/fulltest/run_$i.log | tail -1 >> tmp/fulltest/summary.txt
  echo "rc=$rc end $(date +%H:%M:%S)" >> tmp/fulltest/summary.txt
  if [ $rc -ne 0 ]; then echo "STOPPING: run $i failed" >> tmp/fulltest/summary.txt; break; fi
done
echo "HEAD RUNS DONE" >> tmp/fulltest/summary.txt
