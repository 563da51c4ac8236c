"""ENRICH stage: broadcast-lookup enrichment + weighting + classification.

Everything here is declarative DataFrame API — broadcast hash joins
against the KB-sized dimension tables (SURVEY §2.4 J1–J5) and column
math — so Catalyst keeps it inside whole-stage codegen.  The only
Python is the Arrow-vectorized erf weighting UDF (A1).

Frames produced (all derived from the PARSE output `battles`):

  sides       one row per (battle, side): player, outcome, ratings,
              team array, short/singles gates
  mons        sides × explode(team) ⋈ dim_species ⋈ dim_natures,
              + computed stats, spread/stats strings, stalliness, bias
  side_class  per-side classification (bias, mean stalliness, tags)
              — classifier.ts:11-54 analog
  mons_w      mons × explode(cutoffs) + erf weight + gxe
  sides_w     sides ⋈ side_class × explode(cutoffs) + weight + gxe
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from stats_spark.datagen import dims
from stats_spark.functions import statcalc
from stats_spark.functions.weights import (gxe_udf, weighting_udf, WIN_RPR,
                                           LOSS_RPR, OUTCOME_RPRD,
                                           DEFAULT_RPR, DEFAULT_RPRD)


def dim_species_df(spark) -> DataFrame:
    return spark.createDataFrame(dims.species_table())


def dim_natures_df(spark) -> DataFrame:
    rows = [dict(nature=n, plus=p, minus=m) for n, (p, m) in dims.NATURES.items()]
    return spark.createDataFrame(rows)


def dim_formats_df(spark) -> DataFrame:
    return spark.createDataFrame(dims.formats_table())


def accepted_battles(battles: DataFrame) -> DataFrame:
    """F1 format accept filter + dead-letter split.  On the partitioned
    source this filter is pushed into partition pruning."""
    accepted = [f for f, *_ in dims.FORMATS if dims.accept_format(f)]
    return battles.filter(F.col("error").isNull()
                          & F.col("format").isin(accepted))


def rejected_battles(battles: DataFrame) -> DataFrame:
    return battles.filter(F.col("error").isNotNull())


def sides_from_battles(battles: DataFrame) -> DataFrame:
    """Explode battle rows to one row per (battle, side) — the unit the
    reference iterates in updateTagged (stats.ts:138-143)."""
    side_struct = [
        F.struct(
            F.lit(s).alias("side"),
            F.col(f"{s}_name").alias("player"),
            F.col(f"{s}_rpr").alias("rpr"),
            F.col(f"{s}_rprd").alias("rprd"),
            F.col(f"{s}_team").alias("team"),
            F.col(f"lead_{s}").alias("lead"),
        ) for s in ("p1", "p2")
    ]
    non_6v6 = sorted(dims.NON_6V6_FORMATS)
    non_singles = sorted(dims.NON_SINGLES_FORMATS)
    singles = ~F.col("format").isin(non_singles)
    # short-battle gate — stats.ts:134-136
    short = (~F.col("format").isin(non_6v6)
             & ((F.col("turns") < 2) | ((F.col("turns") < 3) & singles)))
    return (battles
            .withColumn("singles", singles)
            .withColumn("short", short)
            .select("conv_id", "format", "day", "turns", "winner", "ts",
                    "singles", "short",
                    F.explode(F.array(*side_struct)).alias("s"))
            .select("conv_id", "format", "day", "turns", "winner", "ts",
                    "singles", "short", "s.*")
            .withColumn("outcome",
                        F.when(F.col("winner") == "tie", F.lit(0))
                         .when(F.col("winner") == F.col("side"), F.lit(1))
                         .otherwise(F.lit(-1))))


def with_effective_rating(df: DataFrame) -> DataFrame:
    """Resolve Glicko defaults — stats.ts:245-258.  ``save`` marks a
    valid provided rating (drives the `saved` counters + GXE)."""
    valid = (F.col("rpr").isNotNull() & F.col("rprd").isNotNull()
             & (F.col("rprd") != 0))
    return (df
            .withColumn("rating_valid", valid)
            .withColumn("eff_rpr",
                        F.when(valid, F.col("rpr"))
                         .when(F.col("outcome") == 1, F.lit(WIN_RPR))
                         .when(F.col("outcome") == -1, F.lit(LOSS_RPR))
                         .otherwise(F.lit(DEFAULT_RPR)))
            .withColumn("eff_rprd",
                        F.when(valid, F.col("rprd"))
                         .when(F.col("outcome") != 0, F.lit(OUTCOME_RPRD))
                         .otherwise(F.lit(DEFAULT_RPRD)))
            .withColumn("gxe", F.when(valid, gxe_udf("rpr", "rprd"))))


def enrich_mons(sides: DataFrame, spark) -> DataFrame:
    """Explode teams and enrich each set: computed stats (A5), spread &
    stats strings, per-mon stalliness + bias (C2).  Dimension joins are
    explicit broadcasts."""
    sp = F.broadcast(dim_species_df(spark).select(
        "species_id", "display_name",
        *[F.col(f"base_{s}").alias(f"b_{s}") for s in statcalc.STATS],
        "types", "tier"))
    nat = F.broadcast(dim_natures_df(spark))

    mons = (sides
            .select("conv_id", "format", "day", "side", "player", "outcome",
                    "short", "singles", "rpr", "rprd", "rating_valid",
                    "eff_rpr", "eff_rprd", "gxe", "winner",
                    F.explode("team").alias("mon"))
            .select("*", "mon.*").drop("mon"))
    mons = (mons
            .join(sp, mons.species == sp.species_id, "left").drop("species_id")
            .join(nat, "nature", "left"))

    for s in statcalc.STATS:
        mons = mons.withColumn(
            f"stat_{s}",
            statcalc.calc_stat(s, F.col(f"b_{s}"), F.col(f"iv_{s}"),
                               F.col(f"ev_{s}"), F.col("level"),
                               F.col("plus"), F.col("minus")))
    # spread string "Nature:ev/.../ev" with EVs canonicalized through
    # the stat round-trip — stats.ts:391-412
    ev_cols = [
        statcalc.stat_to_ev(s, F.col(f"stat_{s}"), F.col(f"b_{s}"),
                            F.col(f"iv_{s}"), F.col("level"),
                            F.col("plus"), F.col("minus")).cast("long")
        for s in statcalc.STATS
    ]
    mons = (mons
            .withColumn("spread",
                        F.concat(F.initcap("nature"), F.lit(":"),
                                 F.concat_ws("/", *ev_cols)))
            .withColumn("stats_str",
                        F.concat_ws("/", *[F.col(f"stat_{s}").cast("long")
                                           for s in statcalc.STATS])))

    # per-mon stalliness — classifyForme: base + move modifiers − log2(3)
    # (classifier.ts:113-143; move-category modifiers simplified to the
    # synthetic dims' recovery/protection/setup categories)
    mv = dims.MOVE_CATEGORIES
    has = lambda cat: F.arrays_overlap(  # noqa: E731
        F.col("moves"), F.array(*[F.lit(m) for m in sorted(mv[cat])]))
    stall = statcalc.base_stalliness(
        F.col("stat_hp"), F.col("stat_atk"), F.col("stat_spa"),
        F.col("stat_def"), F.col("stat_spd"), F.col("level"),
        F.col("species"))
    stall = (stall
             + F.when(has("recovery"), 0.5).otherwise(0.0)
             + F.when(has("protection"), 0.5).otherwise(0.0)
             - F.when(has("setup"), 0.5).otherwise(0.0)
             - F.lit(statcalc.LOG3_LOG2))
    bias = (F.col("ev_atk") + F.col("ev_spa") - F.col("ev_hp")
            - F.col("ev_def") - F.col("ev_spd"))
    return (mons
            .withColumn("stalliness", stall)
            .withColumn("bias", bias.cast("long"))
            .withColumn("has_pivot", has("pivot")))


def classify_sides(mons: DataFrame) -> DataFrame:
    """Per-side classification — classifyTeam (classifier.ts:11-54):
    bias = Σ mon bias, stalliness = mean mon stalliness, tags = style
    bucket + monotype + voltturn."""
    agg = (mons.groupBy("conv_id", "side")
           .agg(F.sum("bias").alias("team_bias"),
                F.avg("stalliness").alias("team_stalliness"),
                F.count("*").alias("team_size"),
                F.sum(F.col("has_pivot").cast("int")).alias("n_pivot"),
                F.collect_list("types").alias("type_lists")))
    # monotype: a type shared by every team member — fold intersect
    agg = agg.withColumn(
        "shared_types",
        F.aggregate(F.slice("type_lists", 2, 16),
                    F.element_at("type_lists", 1),
                    lambda acc, x: F.array_intersect(acc, x)))
    bucket = statcalc.stalliness_bucket(F.col("team_stalliness"))
    mono = F.when(F.size("shared_types") > 0,
                  F.concat(F.lit("mono"), F.col("shared_types").getItem(0)))
    volt = F.when(F.col("n_pivot") >= 2, F.lit("voltturn"))
    tags = F.array_compact(F.array(bucket, mono, volt))
    return agg.select("conv_id", "side", "team_bias", "team_stalliness",
                      "team_size", tags.alias("tags"))


def explode_cutoffs(df: DataFrame,
                    cutoffs: list[int] = dims.DEFAULT_CUTOFFS) -> DataFrame:
    """A13 multi-cutoff fan-out: one pass computes every cutoff — the
    dimension becomes an ordinary group-by column."""
    arr = F.array(*[F.lit(c) for c in cutoffs])
    return df.withColumn("cutoff", F.explode(arr))


def with_weight(df: DataFrame) -> DataFrame:
    """A1 erf weighting per (row, cutoff), Arrow-vectorized."""
    return df.withColumn("weight",
                         weighting_udf("eff_rpr", "eff_rprd",
                                       F.col("cutoff").cast("double")))
