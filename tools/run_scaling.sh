#!/usr/bin/env bash
# Two-parallelism scaling evidence (BASELINE.md protocol):
# identical job + input + partitioning at local[8] vs local[32].
set -euo pipefail
cd "$(dirname "$0")/.."

rm -f /tmp/openmldb_spark.zip
(zip -qr /tmp/openmldb_spark.zip openmldb_spark)

for N in 2 8; do
  echo "=== local[$N] ===" >&2
  spark-submit --master "local[$N]" \
    --driver-memory "${SPARK_GRAFT_DRIVER_MEM:-48g}" \
    --py-files /tmp/openmldb_spark.zip \
    tools/scaling_job.py 2>/dev/null
done
