#!/bin/bash
# Round-17 gate evidence: five consecutive FULL `sbt test` runs (the
# r16 verdict's done-criterion for the mergedScan fix — the old
# manifest-evolution spec flaked in full runs only). Logs + verbatim
# `Tests:` lines land in tmp/fulltest/.
cd /root/repo
mkdir -p tmp/fulltest
for i in 1 2 3 4 5; do
  echo "=== RUN $i start $(date +%H:%M:%S) ===" >> tmp/fulltest/summary.txt
  sbt -batch test > tmp/fulltest/run_$i.log 2>&1
  rc=$?
  grep -E "^\[info\] Tests:" tmp/fulltest/run_$i.log | tail -1 >> tmp/fulltest/summary.txt
  echo "rc=$rc end $(date +%H:%M:%S)" >> tmp/fulltest/summary.txt
  if [ $rc -ne 0 ]; then echo "STOPPING: run $i failed" >> tmp/fulltest/summary.txt; break; fi
done
echo "ALL DONE" >> tmp/fulltest/summary.txt
