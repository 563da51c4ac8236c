"""W10/J8 — tier rise/drop update.

Spark restatement of the reference's tier-update report
(`reports.ts:414-509`, ladder walk `reports.ts:540-649`): usage is
averaged over months weighted by battle counts, then each species
walks the tier ladder — rise into tier T if usage(T) > RISE; a species
currently in T drops one tier if usage(T) < DROP.

The reference re-parses prior months' ASCII reports; here months are
just another grouping column and prior aggregates stay tables.  With a
single synthetic corpus, "months" are derived deterministically from a
conv_id hash bucket (oracle-recomputable), standing in for calendar
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from stats_spark.datagen import dims
from stats_spark.functions.text import md5_long
from stats_spark.functions.weights import weighting_udf

RISE = 0.04515839608           # reports.ts:473
DROP = RISE                    # reports.ts:474

# our synthetic ladder: usage-tier format ↔ tier name (ban tier: Ubers)
LADDER = [("gen9ou", "OU"), ("gen9uu", "UU")]
FLOOR = "RU"                   # species falling through the ladder
TIER_FORMATS = [f for f, _ in LADDER]


def monthly_usage(battles: DataFrame, cutoff: int = 1630,
                  n_months: int = 3) -> DataFrame:
    """Per (month, tier-format, species) usage fraction (weighted/total
    ×6, the reference's team-scaled share) with months = md5 buckets of
    conv_id."""
    from stats_spark.operators import enrich

    ok = battles.filter(F.col("error").isNull()
                        & F.col("format").isin(TIER_FORMATS))
    sides = enrich.with_effective_rating(enrich.sides_from_battles(ok))
    mons = (sides
            .withColumn("month", F.pmod(md5_long("conv_id"), F.lit(n_months)))
            .select("conv_id", "month", "format", "short",
                    "eff_rpr", "eff_rprd", F.explode("team").alias("m"))
            .withColumn("species", F.col("m.species"))
            .withColumn("weight",
                        weighting_udf("eff_rpr", "eff_rprd",
                                      F.lit(float(cutoff)))))
    per = (mons.filter(~F.col("short"))
           .groupBy("month", "format", "species")
           .agg(F.sum("weight").alias("w"),
                F.count("*").alias("raw")))
    tot = per.groupBy("month", "format").agg(
        F.greatest(F.lit(1.0), F.sum("w")).alias("total"),
        F.sum("raw").alias("n_battles_x"))
    return (per.join(tot, ["month", "format"])
            .select("month", "format", "species",
                    (F.col("w") / F.col("total") * 6).alias("usage_frac")))


def combined_usage(monthly: DataFrame) -> DataFrame:
    """Average usage across months (reports.ts:443-455: with one report
    per (month, tier) the month factor reduces to a plain mean over the
    month count)."""
    n_months = monthly.select("month").distinct().count()
    return (monthly.groupBy("format", "species")
            .agg((F.sum("usage_frac") / n_months).alias("usage")))


def tier_update(usage: DataFrame, spark) -> DataFrame:
    """The rise/drop ladder — computeRiseAndDrop (reports.ts:619-649)
    as a when-cascade over the pivoted per-tier usage columns."""
    pivoted = (usage.groupBy("species")
               .pivot("format", TIER_FORMATS).agg(F.first("usage"))
               .na.fill(0.0, TIER_FORMATS))
    cur = F.broadcast(spark.createDataFrame(
        dims.species_table()[["species_id", "tier"]])
        .withColumnRenamed("species_id", "species")
        .withColumnRenamed("tier", "current_tier"))
    j = pivoted.join(cur, "species", "right").na.fill(0.0, TIER_FORMATS)
    # normalize tiers outside the ladder to the floor (reports.ts:575:
    # tier not in TIERS[type] → floor)
    known = ["Ubers"] + [t for _, t in LADDER]
    j = j.withColumn("current_tier",
                     F.when(F.col("current_tier").isin(known),
                            F.col("current_tier")).otherwise(F.lit(FLOOR)))

    u = {fmt: F.col(fmt) for fmt in TIER_FORMATS}
    updated = F.when(F.col("current_tier") == "Ubers", F.lit("Ubers"))
    for fmt, tier in LADDER:
        idx = [t for _, t in LADDER].index(tier)
        lower = ([t for _, t in LADDER] + [FLOOR])[idx + 1]
        updated = updated.when(u[fmt] > RISE, F.lit(tier))
        updated = updated.when(
            F.col("current_tier") == tier,
            F.when(u[fmt] < DROP, F.lit(lower)).otherwise(F.lit(tier)))
    updated = updated.otherwise(F.lit(FLOOR))
    return (j.withColumn("updated_tier", updated)
            .withColumn("changed", F.col("updated_tier") != F.col("current_tier"))
            .select("species", "current_tier", "updated_tier", "changed",
                    *[F.round(u[f], 6).alias(f"usage_{f}") for f in TIER_FORMATS]))


def tier_update_lines(result: DataFrame) -> list[str]:
    """'X moved from A to B' lines — makeTable analog (reports.ts:758-784)."""
    rows = (result.filter("changed").orderBy("species").collect())
    return [f"{r.species} moved from {r.current_tier} to {r.updated_tier}"
            for r in rows]
