#!/bin/bash
# Quiet-window probe loop (the round-12 process, scripted — VERDICT r12
# item 4's "probes keep logging" half): every ~INTERVAL seconds run the
# 1-query Bench subset probe on prebuilt classes (plain java — no sbt
# lock, so it can run alongside dev sbt work) and append both raw
# calibration factors to the log. The close bench should only run in a
# window where BOTH factors are <= 1.05 (see memory: loadavg lies; the
# single-thread + 8-thread probes are the only trustworthy phase signal),
# falling back to a deadline run with the phase recorded in-artifact.
#
# Usage: tools/probe_loop.sh [logfile] [interval_sec]
LOG="${1:-probes_r13.txt}"
INTERVAL="${2:-720}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
ART=/root/repo/bench_out_sf0.001_subset.json
while true; do
  # remove the previous artifact FIRST: a failed run (stale classes, OOM)
  # must log an empty sample, never re-log the last good factors under a
  # fresh timestamp (the r12 probes' first-3-empty honesty, kept)
  rm -f "$ART"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_REPS=1 SPARK_GRAFT_WARMUP_DIR=/nonexistent \
  java $OPENS -Dspark.ui.enabled=false -Xmx8g -cp "$CP" \
    graft.Bench q_topk >/dev/null 2>&1
  C=$(python3 -c "import json;d=json.load(open('$ART'));print(d.get('calib_factor_raw',''))" 2>/dev/null)
  M=$(python3 -c "import json;d=json.load(open('$ART'));print(d.get('calib_mt_factor_raw',''))" 2>/dev/null)
  echo "$(date +%H:%M:%S) calib=$C mt=$M" >> "$LOG"
  sleep "$INTERVAL"
done
