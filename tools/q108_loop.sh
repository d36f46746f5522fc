#!/bin/bash
# q108 flake hunt: run the single-query Verify -> DuckDB compare path in a
# fresh JVM per iteration (the driver's own shape), logging the 3-row
# checksum and the per-bucket manifest stats each time. Usage:
#   tools/q108_loop.sh [iterations]
set -u
N="${1:-20}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
PASS=0; FAIL=0
for i in $(seq 1 "$N"); do
  OUT="/tmp/q108_hunt_$i"
  rm -rf "$OUT"
  LOG=$(SPARK_GRAFT_ONLY=q108 java $OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Verify /root/testdata/sf0.01 "$OUT" 2>&1)
  echo "$LOG" | grep -E '^\[q108\]'
  RES=$(python3 /root/repo/tools/compare.py /root/testdata/sf0.01 "$OUT" 2>&1 | grep q108)
  echo "iter $i: $RES"
  if echo "$RES" | grep -q '^PASS'; then PASS=$((PASS+1)); else
    FAIL=$((FAIL+1))
    echo "$LOG" > "/tmp/q108_hunt_fail_$i.log"
    python3 - "$OUT/q108_stream_cdc" <<'PY'
import sys, glob, pyarrow.parquet as pq
for f in glob.glob(sys.argv[1] + "/*.parquet"):
    print(pq.read_table(f).to_pandas().to_string())
PY
  fi
  rm -rf "$OUT"
done
echo "== q108 loop: $PASS pass, $FAIL fail of $N =="
