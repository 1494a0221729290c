#!/usr/bin/env bash
# Two-parallelism scaling evidence (BASELINE.md protocol): identical
# job + input + partitioning at N and 4N cores. Defaults: 42M turns
# (16000 convs x 2400 avg), local[1] vs local[4], shuffle scratch on
# tmpfs (/dev/shm — the local-NVMe analogue; the sandbox's /tmp disk
# serializes shuffle IO across cores and corrupts the measurement).
set -euo pipefail
cd "$(dirname "$0")/.."

rm -f /tmp/openmldb_spark.zip
(zip -qr /tmp/openmldb_spark.zip openmldb_spark)
mkdir -p /dev/shm/sparktmp

for N in "${SCALING_N:-1}" "${SCALING_4N:-4}"; do
  echo "=== local[$N] ===" >&2
  SCALING_CONVS="${SCALING_CONVS:-16000}" SCALING_TURNS="${SCALING_TURNS:-2400}" \
  spark-submit --master "local[$N]" \
    --driver-memory "${SPARK_GRAFT_DRIVER_MEM:-48g}" \
    --conf spark.local.dir=/dev/shm/sparktmp \
    --py-files /tmp/openmldb_spark.zip \
    tools/scaling_job.py 2>/dev/null
done
