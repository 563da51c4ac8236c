#!/usr/bin/env bash
# Package + spark-submit the pipeline (local[N] stand-in for the
# cluster; on a real cluster swap --master / add executor flags).
#
#   scripts/submit.sh --corpus data/corpus_t1 --out /tmp/out [--resume]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CPUS="${SPARK_GRAFT_CPUS:-8}"
SPARK_SUBMIT="${SPARK_SUBMIT:-spark-submit}"

ZIP="$(python "$REPO/scripts/package.py")"

exec "$SPARK_SUBMIT" \
  --master "local[$CPUS]" \
  --driver-memory "${STATS_SPARK_DRIVER_MEM:-8g}" \
  --conf "spark.sql.shuffle.partitions=$CPUS" \
  --conf "spark.local.dir=${STATS_SPARK_LOCAL_DIR:-/dev/shm/spark-local}" \
  --conf "spark.executor.extraJavaOptions=-XX:-UseDynamicNumberOfCompilerThreads" \
  --conf "spark.ui.enabled=false" \
  --py-files "$ZIP" \
  "$REPO/scripts/run_job.py" "$@"
