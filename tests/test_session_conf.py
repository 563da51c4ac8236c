"""Pin the scale-critical session confs (no Spark session needed).

These settings carry measured scaling behavior; changing one is a
deliberate act, not a drive-by:

- AQE + skew-join: runtime re-planning for hot formats (north rule).
- Arrow batching: the parse mapInPandas ships one packed string per
  conversation; per-row transfer is the slow path.
- Scan-split sizing: the compact intermediates (battles checkpoint,
  staged frames) must decode on many tasks — under the 128 MB default
  every consumer job opened with a single-task scan, measured as
  ~167 s of core-count-invariant staging cost (the N→4N efficiency
  killer; see BENCH.md).
"""

from stats_spark.session import EXECUTOR_JVM_FLAGS, SQL_CONF


def test_aqe_and_skew_handling_enabled():
    assert SQL_CONF["spark.sql.adaptive.enabled"] == "true"
    assert SQL_CONF["spark.sql.adaptive.skewJoin.enabled"] == "true"


def test_arrow_batching_enabled():
    assert SQL_CONF["spark.sql.execution.arrow.pyspark.enabled"] == "true"
    assert int(SQL_CONF["spark.sql.execution.arrow.maxRecordsPerBatch"]) >= 1000


def test_scan_splits_sized_for_compact_intermediates():
    # splits small enough that a ~60 MB checkpoint scan parallelizes
    assert int(SQL_CONF["spark.sql.files.maxPartitionBytes"]) <= 16 * 1024 * 1024
    # open-cost low enough that many small files aren't packed into
    # one split (4 MB default re-serializes the scan)
    assert int(SQL_CONF["spark.sql.files.openCostInBytes"]) <= 1024 * 1024


def test_static_jit_pool_flag_present():
    assert "-XX:-UseDynamicNumberOfCompilerThreads" in EXECUTOR_JVM_FLAGS
