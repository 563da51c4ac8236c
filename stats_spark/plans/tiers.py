"""W10/J8 — tier rise/drop update.

Spark restatement of the reference's tier-update report
(`reports.ts:414-509`, ladder walk `reports.ts:540-649`): per-month
usage is merged across report suffixes weighted by battle counts
(reports.ts:426-455), averaged over months, then each species walks
the tier ladder:

  - rise into rung T if usage(T) > RISE (reports.ts:632-634)
  - a species currently in T drops one rung if usage(T) < DROP
    (reports.ts:636-643)
  - a species currently in T's banlist tier (TBL) stays there
    (reports.ts:644-647)
  - fallthrough lands on the floor tier (reports.ts:609)
  - the BL-list override bumps an updated tier T to TBL when the
    species is on Reports.BL[T] (reports.ts:611-614)

The 'moved from A to B' report suppresses a mega forme whose base
species already sits in a higher tier (reports.ts:493-504).

The reference re-parses prior months' ASCII reports; here months are
just another grouping column and prior aggregates stay tables.  With a
single synthetic corpus, "months" are derived deterministically from a
conv_id hash bucket (oracle-recomputable), standing in for calendar
partitions.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, functions as F

from stats_spark.datagen import dims
from stats_spark.functions.text import md5_long
from stats_spark.functions.weights import weighting_expr

RISE = 0.04515839608           # reports.ts:473
DROP = RISE                    # reports.ts:474

# synthetic 4-rung ladder: usage-tier format ↔ tier name, ban tier per
# rung (the TIERS ladder interleaves XBL tiers — reports.ts:54-56)
LADDER = [("gen9ou", "OU", None),
          ("gen9uu", "UU", "UUBL"),
          ("gen9monotype", "RU", "RUBL"),
          ("gen7ou", "NU", "NUBL")]
FLOOR = "PU"                   # species falling through the ladder
TIER_FORMATS = [f for f, _, _ in LADDER]
# full ordered tier list for the mega-vs-base comparison
TIER_ORDER = ["Ubers"]
for _f, _t, _b in LADDER:
    TIER_ORDER.append(_t)
    if _b:
        TIER_ORDER.append(_b)
TIER_ORDER.append(FLOOR)

SUFFIXES = ("suspecttest", "alpha", "beta")   # reports.ts:64


@lru_cache(maxsize=1)
def bl_sets() -> dict[str, frozenset]:
    """Synthetic Reports.BL — deterministic species subsets per ban
    tier (md5 bucket), oracle-recomputable."""
    import hashlib
    out: dict[str, set] = {b: set() for _f, _t, b in LADDER if b}
    bans = sorted(out)
    for sid in dims.species_table().species_id:
        h = int(hashlib.md5(sid.encode()).hexdigest()[:15], 16)
        if h % 7 == 0:
            out[bans[h % len(bans)]].add(sid)
    return {k: frozenset(v) for k, v in out.items()}


def current_tiers() -> dict[str, str]:
    """Species → current tier with the deterministic BL overlay: a
    species whose dim tier has a ban rung and md5 % 5 == 0 sits in the
    ban tier (exercises the reference's XBL stickiness rule)."""
    import hashlib
    bans = {t: b for _f, t, b in LADDER if b}
    out = {}
    for r in dims.species_table().itertuples():
        tier = r.tier
        h = int(hashlib.md5(r.species_id.encode()).hexdigest()[:15], 16)
        if tier in bans and h % 5 == 0:
            tier = bans[tier]
        out[r.species_id] = tier
    return out


def strip_suffix(fmt_col) -> F.Column:
    """Merge suffixed reports into their base rung — reports.ts:426-431
    reads `<format><suffix>` for every suffix and weights by battles."""
    expr = fmt_col
    out = F.col(expr) if isinstance(expr, str) else expr
    return F.regexp_replace(out, "(suspecttest|alpha|beta)$", "")


def monthly_usage(battles: DataFrame, cutoff: int = 1630,
                  n_months: int = 3) -> DataFrame:
    """Per (month, rung-format, species) usage fraction (weighted/total
    ×6, the reference's team-scaled share) with months = md5 buckets of
    conv_id.  Suffixed formats merge into their base rung weighted by
    their battle share (the n/ntot factor in reports.ts:443-455 —
    weighting by each suffix report's battles is exactly summing the
    weighted usage across suffixes before normalizing)."""
    from stats_spark.operators import enrich

    base_fmt = strip_suffix("format")
    ok = (battles.filter(F.col("error").isNull())
          .withColumn("format", base_fmt)
          .filter(F.col("format").isin(TIER_FORMATS)))
    sides = enrich.with_effective_rating(enrich.sides_from_battles(ok))
    mons = (sides
            .withColumn("month", F.pmod(md5_long("conv_id"), F.lit(n_months)))
            .select("conv_id", "month", "format", "short",
                    "eff_rpr", "eff_rprd", F.explode("team").alias("m"))
            .withColumn("species", F.col("m.species"))
            .withColumn("cutoff", F.lit(float(cutoff)))
            .withColumn("weight",
                        weighting_expr("eff_rpr", "eff_rprd", "cutoff")))
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
    """The full rise/drop ladder — computeRiseAndDrop
    (reports.ts:619-649) as a when-cascade over the pivoted per-rung
    usage columns, including XBL stickiness and the BL-list override."""
    pivoted = (usage.groupBy("species")
               .pivot("format", TIER_FORMATS).agg(F.first("usage"))
               .na.fill(0.0, TIER_FORMATS))
    cur_rows = [dict(species=s, current_tier=t)
                for s, t in sorted(current_tiers().items())]
    cur = F.broadcast(spark.createDataFrame(
        cur_rows, "species string, current_tier string"))
    j = pivoted.join(cur, "species", "right").na.fill(0.0, TIER_FORMATS)
    # normalize tiers outside the ladder to the floor (reports.ts:574:
    # tier not in TIERS[type] → floor)
    j = j.withColumn("current_tier",
                     F.when(F.col("current_tier").isin(TIER_ORDER),
                            F.col("current_tier")).otherwise(F.lit(FLOOR)))

    u = {fmt: F.col(fmt) for fmt in TIER_FORMATS}
    tiers_seq = [t for _f, t, _b in LADDER] + [FLOOR]
    updated = F.when(F.col("current_tier") == "Ubers", F.lit("Ubers"))
    for i, (fmt, tier, ban) in enumerate(LADDER):
        lower = tiers_seq[i + 1]
        updated = updated.when(u[fmt] > RISE, F.lit(tier))
        updated = updated.when(
            F.col("current_tier") == tier,
            F.when(u[fmt] < DROP, F.lit(lower)).otherwise(F.lit(tier)))
        if ban:
            # XBL stickiness — reports.ts:644-647
            updated = updated.when(F.col("current_tier") == ban, F.lit(ban))
    updated = updated.otherwise(F.lit(FLOOR))

    # BL-list override — reports.ts:611-614
    bl = bl_sets()
    final = updated
    for _f, tier, ban in LADDER:
        if ban and bl.get(ban):
            final = F.when((updated == tier)
                           & F.col("species").isin(sorted(bl[ban])),
                           F.lit(ban)).otherwise(final)

    return (j.withColumn("updated_tier", final)
            .withColumn("changed",
                        F.col("updated_tier") != F.col("current_tier"))
            .select("species", "current_tier", "updated_tier", "changed",
                    *[F.round(u[f], 6).alias(f"usage_{f}")
                      for f in TIER_FORMATS]))


def tier_update_lines(result: DataFrame, spark=None) -> list[str]:
    """'X moved from A to B' lines with the mega-vs-base suppression —
    reports.ts:488-508: a mega/primal forme's move is skipped when its
    base species' updated tier is strictly higher."""
    sp = dims.species_table()
    mega_base = {r.species_id: r.base_species_id
                 for r in sp.itertuples() if r.is_mega}
    rows = result.orderBy("species").collect()
    updated = {r.species: r.updated_tier for r in rows}
    rank = {t: i for i, t in enumerate(TIER_ORDER)}
    out = []
    for r in rows:
        if not r.changed:
            continue
        base = mega_base.get(r.species)
        if base is not None and base in updated:
            if rank.get(updated[base], 99) < rank.get(r.updated_tier, 99):
                continue
        out.append(f"{r.species} moved from {r.current_tier} "
                   f"to {r.updated_tier}")
    return out
