#!/usr/bin/env bash
# Ship the encode job the way the north rule requires: spark-submit --py-files.
# Usage: scripts/submit_encode.sh <output_dir> [extra encode_job args...]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:?usage: submit_encode.sh <output_dir> [args...]}"
shift || true
rm -f /tmp/orc_rust_spark_pyfiles.zip
zip -qr /tmp/orc_rust_spark_pyfiles.zip orc_rust_spark
CPUS="${SPARK_GRAFT_CPUS:-$(nproc)}"
exec spark-submit \
  --master "local[${CPUS}]" \
  --py-files /tmp/orc_rust_spark_pyfiles.zip \
  --conf spark.sql.shuffle.partitions="${CPUS}" \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  jobs/encode_job.py --output "$OUT" "$@"
