#!/usr/bin/env bash
# Cluster submission (north_rule: spark-submit --py-files on a
# multi-executor cluster). Locally the same entrypoint runs on
# local[N]; nothing in the engine is local-mode specific.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/adscrawler_spark.zip
(cd "$REPO" && zip -qr "$ZIP" adscrawler_spark -x '*__pycache__*')
exec spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.parquet.compression.codec=zstd \
  "$REPO/adscrawler_spark/streaming/job.py" "$@"
