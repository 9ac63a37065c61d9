#!/bin/bash
# Dev loop for the optimization rounds: verify + micro-bench a subset of
# queries after an edit.
#   tools/optloop.sh verify x125_perplexity_filter,x131_fluency_external
#   tools/optloop.sh bench  x125_perplexity_filter,x131_fluency_external [reps]
# Uses the exported Test classpath in /tmp/test_cp.txt (refresh with
#   sbt -batch "export Test/fullClasspath" | tail -1 > /tmp/test_cp.txt
# after dependency changes); always `sbt -batch Test/compile` first.
set -e
MODE=$1; QS=$2; REPS=${3:-3}
CP=$(cat /tmp/test_cp.txt)
JFLAGS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
case $MODE in
  verify)
    rm -rf /tmp/vsub
    SPARK_GRAFT_CPUS=8 SPARK_GRAFT_VERIFY_ONLY="$QS" \
      java -cp "$CP" $JFLAGS graft.Verify /root/testdata/sf0.01 /tmp/vsub \
      2>/dev/null | grep -E "\[verify\]" || true
    python3 - "$QS" <<'EOF'
import json, sys
qs = set(sys.argv[1].split(","))
p = "/tmp/vsub/oracle_sql.json"
d = json.load(open(p))
json.dump({k: v for k, v in d.items() if k in qs}, open(p, "w"))
EOF
    python3 tools/check.py /root/testdata/sf0.01 /tmp/vsub
    ;;
  bench)
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_ONLY="$QS" SPARK_GRAFT_BENCH_REPS=$REPS \
      SPARK_GRAFT_BENCH_OUT=/tmp/bench_sub.json \
      java -cp "$CP" $JFLAGS graft.Bench 2>/dev/null | grep '"metric"'
    ;;
  *) echo "usage: optloop.sh verify|bench q1,q2[,..] [reps]"; exit 2;;
esac
