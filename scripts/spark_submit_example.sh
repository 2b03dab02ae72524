#!/usr/bin/env bash
# Cluster deployment per the north rule: ship the package with
# spark-submit --py-files and run the CDC replay driver on a
# multi-executor cluster. Tested shape (the same code paths the local
# bench exercises — partitioning, shuffle, skew handling are identical;
# only the master URL and executor topology change).
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="/tmp/efts_spark.zip"

# package the library (pure-python; no jars required — the lake is
# self-contained parquet + JSON snapshot log on any Hadoop-compatible FS)
(cd "$REPO" && zip -qr "$ZIP" embulk_filter_timestamp_format_spark)

# Example driver: replay a binlog directory into a table.
# At N vs 4N executors, keep spark.sql.shuffle.partitions ~2-3x total
# cores and num_buckets >= max executor cores so the bucketed MERGE
# parallelizes; exactly-once holds across restarts via the checkpoint
# plus batch-id fencing.
exec spark-submit \
  --master "${SPARK_MASTER:-yarn}" \
  --deploy-mode cluster \
  --num-executors "${NUM_EXECUTORS:-32}" \
  --executor-cores "${EXECUTOR_CORES:-4}" \
  --executor-memory "${EXECUTOR_MEMORY:-8g}" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-256}" \
  --py-files "$ZIP" \
  "$REPO/scripts/replay_driver.py" "$@"
