"""Date/format-dependent cutoff selection — workflows/smogon/stats.ts:42-72."""

from pyspark.sql import functions as F

from stats_spark.operators import enrich
from stats_spark.plans.pipeline import CUTOFF_SETS, cutoff_map, cutoffs_for


def test_cutoffs_for_rules():
    # gen 6 legacy-notation populars are date-independent
    assert cutoffs_for("ou", "2014-11") == CUTOFF_SETS["popular"]
    # gen7doublesou discontinuity at the beginning of the format
    assert cutoffs_for("gen7doublesou", "2017-01") == CUTOFF_SETS["default"]
    assert cutoffs_for("gen7doublesou", "2017-02") == CUTOFF_SETS["popular"]
    # gen 7 formats ceased to be popular from 2020-02
    assert cutoffs_for("gen7ou", "2019-12") == CUTOFF_SETS["popular"]
    assert cutoffs_for("gen7ou", "2020-02") == CUTOFF_SETS["default"]
    # the smogondoublessuspecttest special month
    assert cutoffs_for("smogondoublessuspecttest", "2015-04") \
        == CUTOFF_SETS["popular"]
    assert cutoffs_for("smogondoublessuspecttest", "2015-03") \
        == CUTOFF_SETS["default"]
    # gen 8/9 populars
    assert cutoffs_for("gen9ou", "2026-03") == CUTOFF_SETS["popular"]
    assert cutoffs_for("gen9uu", "2026-03") == CUTOFF_SETS["default"]


def test_per_format_explode(spark):
    df = spark.createDataFrame(
        [("gen9ou",), ("gen9uu",)], "format string")
    m = cutoff_map("2026-03", ["gen9ou", "gen9uu"])
    out = enrich.explode_cutoffs(df, m)
    got = {r.format: set() for r in out.collect()}
    for r in out.collect():
        got[r.format].add(r.cutoff)
    assert got["gen9ou"] == set(CUTOFF_SETS["popular"])
    assert got["gen9uu"] == set(CUTOFF_SETS["default"])
