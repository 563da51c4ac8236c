"""J5 integration: the pipeline routes by CANONICAL format.

The reference canonicalizes the batch format before gen routing,
cutoff selection, and aggregation keying
(workflows/smogon/stats.ts:124-130) — historical-era names merge into
their modern report trees.  These tests pin the Spark column
expression against the python twin, the gate-set extension, the
canonical cutoff keys, and the end-to-end routing through
build_frames.
"""

import pyspark.sql.functions as F

from stats_spark.datagen import dims
from stats_spark.plans import pipeline


def test_canonical_format_df_matches_python(spark):
    """The codegen rule pipeline and the python rule twin agree on
    every corpus format name plus the branch edge cases."""
    from stats_spark.operators.enrich import canonicalize_format_df

    names = [f for f, *_ in dims.FORMATS] + [
        "oucurrent", "pokebankoubeta", "pokebankdoublesoubeta",
        "orasuu", "orascapbeta", "vgc2014beta",
        "battlespotdoublesvgc2015", "smogondoublesubers",
        "smogondoublesuu", "xybattlespotspecialbeta", "gen7ou",
    ]
    df = spark.createDataFrame([(n, n) for n in names],
                               "raw string, format string")
    out = canonicalize_format_df(df)
    got = {r["raw"]: r["format"] for r in out.collect()}
    for n in names:
        assert got[n] == dims.canonicalize_format(n), n
    # the rewrite stays pure column expressions — no Python, no join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Join" not in plan


def test_canonical_format_map_matches_rules(spark):
    """The literal-map fast path the pipeline uses equals the rule
    pipeline over the whole corpus format universe."""
    from stats_spark.operators.enrich import (canonical_format_map_col,
                                              canonicalize_format_df)

    names = [f for f, *_ in dims.FORMATS]
    df = spark.createDataFrame([(n, n) for n in names],
                               "raw string, format string")
    via_map = {r["raw"]: r["m"] for r in df.select(
        "raw", canonical_format_map_col().alias("m")).collect()}
    via_rules = {r["raw"]: r["format"]
                 for r in canonicalize_format_df(df).collect()}
    assert via_map == via_rules


def test_gate_sets_carry_canonical_names():
    # battlespotdoubles (non-singles, 4v4) canonicalizes to vgc2015 —
    # the gates must fire on the canonical name the pipeline carries
    from stats_spark.operators import enrich
    assert "vgc2015" in enrich.NON_SINGLES_FORMATS
    assert "vgc2015" in enrich.NON_6V6_FORMATS
    assert "doublesou" in enrich.NON_SINGLES_FORMATS
    assert "xybattlespotsingles" in enrich.NON_6V6_FORMATS
    # singles 6v6 sources add nothing
    assert "ou" not in enrich.NON_SINGLES_FORMATS
    assert "uu" not in enrich.NON_6V6_FORMATS
    # the datagen sets stay raw (they participate in the corpus hash)
    assert "vgc2015" not in dims.NON_SINGLES_FORMATS


def test_cutoff_map_has_canonical_keys():
    m = pipeline.cutoff_map("2016-01")
    # gen-6 'ou' / 'doublesou' are POPULAR[6] — era notation is load-
    # bearing (stats.ts:60-62), reachable only via canonical names
    assert m["ou"] == pipeline.CUTOFF_SETS["popular"]
    assert m["doublesou"] == pipeline.CUTOFF_SETS["popular"]
    assert m["vgc2015"] == pipeline.CUTOFF_SETS["default"]
    # raw names stay present for pre-canonical callers (smogondoubles
    # is itself in POPULAR[6] — legacy notation is significant,
    # stats.ts:60-62)
    assert m["smogondoubles"] == pipeline.CUTOFF_SETS["popular"]


def test_build_frames_routes_by_canonical_format(spark, t1):
    """orasou battles land in the `ou` tree end-to-end; the raw name
    never reaches a sink frame."""
    from stats_spark.operators import parse
    from stats_spark.sources import tables

    tr = tables.load_transcripts(spark, t1)
    cv = tables.load_conversations(spark, t1)
    battles = (parse.parse_battles(tr, cv)
               .withColumn("format", F.lit("orasou")))
    frames = pipeline.build_frames(spark, battles)
    fmts = {r[0] for r in
            frames["usage"].select("format").distinct().collect()}
    assert fmts == {"ou"}
    leads = {r[0] for r in
             frames["leads"].select("format").distinct().collect()}
    assert leads == {"ou"}
