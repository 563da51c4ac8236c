"""W10/J8 — tier rise/drop update.

Spark restatement of the reference's tier-update report
(`reports.ts:414-509`, ladder walk `reports.ts:540-649`): per-month
usage is merged across report suffixes weighted by battle counts
(reports.ts:426-455), averaged over months, then each species walks
the tier ladder:

  - rise into rung T if usage(T) > RISE (reports.ts:632-634)
  - a species currently in T drops one rung if usage(T) < DROP
    (reports.ts:636-643)
  - a species currently in the ban tier BETWEEN rung T and the rung
    below stays there, checked in rung T's riseAndDrop call — i.e.
    BEFORE the next rung's rise check (reports.ts:602-606, 644-647:
    `riseAndDrop('OU','UU','UUBL')` tests tier===UUBL before
    `riseAndDrop('UU',...)` ever runs)
  - fallthrough lands on the floor tier (reports.ts:609)
  - the BL-list override fires ONLY on floor fallthrough — every
    riseAndDrop hit `continue`s past it, so `Reports.BL[newTier]` is
    always looked up with newTier = the floor, bumping floor species
    on the floor's BL list into the floor's ban tier
    (reports.ts:609-614)

The 'moved from A to B' report suppresses a mega forme whose base
species already sits in a higher tier (reports.ts:493-504).

The reference re-parses prior months' ASCII reports; here months are
just another grouping column and prior aggregates stay tables.  With a
single synthetic corpus, "months" are derived deterministically from a
conv_id hash bucket (oracle-recomputable), standing in for calendar
partitions.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

from pyspark.sql import DataFrame, functions as F

from stats_spark.datagen import dims
from stats_spark.functions.text import md5_long
from stats_spark.functions.weights import weighting_expr

RISE = 0.04515839608           # reports.ts:473
DROP = RISE                    # reports.ts:474

# synthetic 4-rung ladder: usage-tier format ↔ tier name, ban tier
# SITTING ABOVE that rung (TIERS interleaves XBL above its rung:
# 'Uber','OU','UUBL','UU','RUBL','RU',… — reports.ts:54-56)
LADDER = [("gen9ou", "OU", None),
          ("gen9uu", "UU", "UUBL"),
          ("gen9monotype", "RU", "RUBL"),
          ("gen7ou", "NU", "NUBL")]
FLOOR = "PU"                   # species falling through the ladder
FLOOR_BAN = "PUBL"             # the floor's ban tier (≙ ZUBL above ZU)
TIER_FORMATS = [f for f, _, _ in LADDER]
# full ordered tier list (highest first) for the mega-vs-base
# comparison — each XBL ranks ABOVE its rung, exactly as the
# reference's TIERS index order (reports.ts:54-56)
TIER_ORDER = ["Ubers"]
for _f, _t, _b in LADDER:
    if _b:
        TIER_ORDER.append(_b)
    TIER_ORDER.append(_t)
TIER_ORDER.append(FLOOR_BAN)
TIER_ORDER.append(FLOOR)

SUFFIXES = ("suspecttest", "alpha", "beta")   # reports.ts:64


@dataclass(frozen=True)
class LadderConfig:
    """One rise/drop ladder (reports.ts TIERS/USAGE_TIERS shapes).

    ``ladder`` entries are (usage_key, tier, ban_above_this_rung);
    ``usage_key`` is the pivot value in the usage frame's ``format``
    column, or None for a rung with no usage report (the reference's
    nationaldex ladder walks OU..ZU but only OU/UU reports exist —
    `update[tier]` is then `undefined`, which rises/drops nothing and
    leaves the rung's residents in place).  The synthetic default
    mirrors the driver corpus; parity/tier_goldens.py builds the
    reference's singles/doubles/nationaldex configs from the vendored
    tiers.json."""
    ladder: tuple
    floor: str
    floor_ban: str | None
    uber: str
    tier_order: tuple

    @property
    def report_keys(self) -> list[str]:
        return [k for k, _t, _b in self.ladder if k]


def synthetic_config() -> LadderConfig:
    return LadderConfig(ladder=tuple((f, t, b) for f, t, b in LADDER),
                        floor=FLOOR, floor_ban=FLOOR_BAN, uber="Ubers",
                        tier_order=tuple(TIER_ORDER))


@lru_cache(maxsize=1)
def bl_sets() -> dict[str, frozenset]:
    """Synthetic Reports.BL — deterministic species subsets per ban
    tier (md5 bucket), oracle-recomputable.  Only the FLOOR_BAN set is
    consulted by the ladder walk (the reference's override key is
    always the floor — reports.ts:609-614); the rung sets exist to
    mirror Reports.BL's shape."""
    import hashlib
    out: dict[str, set] = {b: set() for _f, _t, b in LADDER if b}
    out[FLOOR_BAN] = set()
    bans = sorted(out)
    for sid in dims.species_table().species_id:
        h = int(hashlib.md5(sid.encode()).hexdigest()[:15], 16)
        if h % 7 == 0:
            out[bans[h % len(bans)]].add(sid)
    return {k: frozenset(v) for k, v in out.items()}


def current_tiers() -> dict[str, str]:
    """Species → current tier with deterministic overlays: a species
    whose dim tier has a ban rung and md5 % 5 == 0 sits in the ban
    tier (exercises XBL stickiness); a non-Ubers member of the floor
    BL set, and any NU species with md5 % 5 == 1, sits on the floor —
    no dim tier is PU, so the floor (and with it the fallthrough +
    floor-BL-override paths) would otherwise be unpopulated in the
    driver corpus."""
    import hashlib
    bans = {t: b for _f, t, b in LADDER if b}
    floor_bl = bl_sets().get(FLOOR_BAN, frozenset())
    out = {}
    for r in dims.species_table().itertuples():
        tier = r.tier
        h = int(hashlib.md5(r.species_id.encode()).hexdigest()[:15], 16)
        if r.species_id in floor_bl and tier != "Ubers":
            tier = FLOOR
        elif tier in bans and h % 5 == 0:
            tier = bans[tier]
        elif tier == "NU" and h % 5 == 1:
            tier = FLOOR
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
    conv_id.

    Suffixed formats merge into their base rung exactly as
    reports.ts:443-455 does: each suffix report's usage FRACTION is
    computed against its own total first, then the fractions average
    weighted by each report's battle count (the n/ntot factor) —
    usage = Σ_s (n_s/ntot)·(w_s/total_s·6).  This differs from pooling
    raw weights (Σw_s/Σtotal_s) whenever average weight per battle
    varies across suffix reports; they coincide only for a single
    suffix (the synthetic corpus case, which keeps the DuckDB oracle's
    pooled formulation exact — tests/test_tiers.py::test_suffix_merge_
    n_weighted exercises the multi-suffix divergence directly)."""
    from stats_spark.operators import enrich

    ok = (battles.filter(F.col("error").isNull())
          .filter(strip_suffix("format").isin(TIER_FORMATS)))
    # report battle count n — EXACTLY what the reference's written
    # report carries in its 'Total battles' line (stats.ts:175-209):
    # short battles never count, and in singles formats a battle only
    # counts when updateLeads succeeded (both leads non-empty,
    # stats.ts:541).  Computed from the compact battles frame BEFORE
    # the side explode; one extra tiny aggregation.
    singles_b = ~F.col("format").isin(sorted(dims.NON_SINGLES_FORMATS))
    short_b = (~F.col("format").isin(sorted(dims.NON_6V6_FORMATS))
               & ((F.col("turns") < 2)
                  | ((F.col("turns") < 3) & singles_b)))
    leads_ok = (F.col("lead_p1").isNotNull() & F.col("lead_p2").isNotNull()
                & (F.col("lead_p1") != "empty")
                & (F.col("lead_p2") != "empty"))
    n_df = (ok.withColumn("month",
                          F.pmod(md5_long("conv_id"), F.lit(n_months)))
            .filter(~short_b & (leads_ok | ~singles_b))
            .groupBy("month", "format")
            .agg(F.count("*").alias("n")))
    sides = enrich.with_effective_rating(enrich.sides_from_battles(ok))
    mons = (sides
            .withColumn("month", F.pmod(md5_long("conv_id"), F.lit(n_months)))
            .filter(~F.col("short"))
            .select("conv_id", "month", "format",
                    "eff_rpr", "eff_rprd", F.explode("team").alias("m"))
            .withColumn("species", F.col("m.species"))
            .withColumn("cutoff", F.lit(float(cutoff)))
            .withColumn("weight",
                        weighting_expr("eff_rpr", "eff_rprd", "cutoff")))
    # per (month, SUFFIXED format) report: species weights and weight
    # total in one shuffle keyed by the suffixed format (battle count
    # n joins in from the pre-explode frame above), then suffixes
    # collapse into the base rung
    per = (mons.groupBy("month", "format", "species")
           .agg(F.sum("weight").alias("w")))
    tot = (mons.groupBy("month", "format")
           .agg(F.greatest(F.lit(1.0), F.sum("weight")).alias("total"))
           .join(n_df, ["month", "format"], "left")
           .na.fill(0, ["n"]))
    frac = (per.join(tot, ["month", "format"])
            .withColumn("frac", F.col("w") / F.col("total") * 6)
            .withColumn("base_format", strip_suffix("format")))
    ntot = (frac.select("month", "base_format", "format", "n").distinct()
            .groupBy("month", "base_format")
            .agg(F.sum("n").alias("ntot")))
    return (frac.join(ntot, ["month", "base_format"])
            .groupBy("month", F.col("base_format").alias("format"),
                     "species")
            .agg(F.sum(F.col("frac") * F.col("n") / F.col("ntot"))
                 .alias("usage_frac")))


def combined_usage(monthly: DataFrame,
                   n_months: int | None = None) -> DataFrame:
    """Average usage across months, dividing by the REQUESTED month
    count (reports.ts:452 divides by months.length — a month with no
    report contributes zero rather than shrinking the divisor)."""
    if n_months is None:
        n_months = monthly.select("month").distinct().count()
    return (monthly.groupBy("format", "species")
            .agg((F.sum("usage_frac") / n_months).alias("usage")))


def tier_update(usage: DataFrame, spark,
                current: dict[str, str] | None = None,
                floor_bl=None,
                config: LadderConfig | None = None) -> DataFrame:
    """The full rise/drop ladder — computeRiseAndDrop
    (reports.ts:619-649) as a when-cascade over the pivoted per-rung
    usage columns, including XBL stickiness and the floor-only BL
    override.  ``current``/``floor_bl``/``config`` default to the
    synthetic tables; tests inject hand-built ones to pin each branch
    and parity/tier_goldens.py injects the reference's real configs.

    A species that appears in NO usage report keeps its current tier
    (reports.ts:584-587 ``if (!update) { updated.set(id, tier);
    continue; }``) — has_usage is tracked before the zero-fill so an
    idle species does not read as zero usage and drop a rung."""
    cfg = config or synthetic_config()
    keys = cfg.report_keys
    pivoted = (usage.groupBy("species")
               .pivot("format", keys).agg(F.first("usage"))
               .withColumn("has_usage", F.lit(True)))
    cur_rows = [dict(species=s, current_tier=t)
                for s, t in sorted((current or current_tiers()).items())]
    cur = F.broadcast(spark.createDataFrame(
        cur_rows, "species string, current_tier string"))
    j = (pivoted.join(cur, "species", "right")
         .withColumn("has_usage",
                     F.coalesce("has_usage", F.lit(False)))
         .na.fill(0.0, keys))
    # normalize tiers outside the ladder to the floor (reports.ts:574:
    # tier not in TIERS[type] → floor)
    j = j.withColumn("current_tier",
                     F.when(F.col("current_tier").isin(list(cfg.tier_order)),
                            F.col("current_tier"))
                     .otherwise(F.lit(cfg.floor)))

    # per-rung usage column; a rung with no usage report gets NULL,
    # whose three-valued comparisons reproduce JS `undefined > x` /
    # `undefined < x` === false (no rise, no drop — residents stay)
    u = {t: (F.col(k) if k else F.lit(None).cast("double"))
         for k, t, _b in cfg.ladder}
    tiers_seq = [t for _k, t, _b in cfg.ladder] + [cfg.floor]
    updated = F.when(F.col("current_tier") == cfg.uber, F.lit(cfg.uber))
    for i, (_k, tier, _ban) in enumerate(cfg.ladder):
        lower = tiers_seq[i + 1]
        # the ban tier between this rung and the one below = the ban
        # of the DROP target (riseAndDrop(r, d, b) passes d's ban —
        # reports.ts:602-606), checked AFTER this rung's rise/drop and
        # BEFORE the next rung's rise check, so a banned species never
        # rises into the rung it's banned from
        ban_below = (cfg.ladder[i + 1][2] if i + 1 < len(cfg.ladder)
                     else cfg.floor_ban)
        updated = updated.when(u[tier] > RISE, F.lit(tier))
        updated = updated.when(
            F.col("current_tier") == tier,
            F.when(u[tier] < DROP, F.lit(lower)).otherwise(F.lit(tier)))
        if ban_below:
            # XBL stickiness — reports.ts:644-647
            updated = updated.when(F.col("current_tier") == ban_below,
                                   F.lit(ban_below))
    updated = updated.otherwise(F.lit(cfg.floor))

    # BL-list override — reports.ts:609-614: every riseAndDrop hit
    # `continue`s past it, so it fires only on TRUE fallthrough (a
    # species already on the floor that didn't rise), with the floor
    # as lookup key.  A drop from the last rung also lands on FLOOR
    # but via a riseAndDrop hit, so it must NOT be overridden — hence
    # the current_tier == FLOOR guard.
    if floor_bl is None and config is None:
        floor_bl = bl_sets().get(FLOOR_BAN, ())
    bl = sorted(floor_bl or ())
    final = updated
    if bl and cfg.floor_ban:
        final = F.when((F.col("current_tier") == cfg.floor)
                       & (updated == cfg.floor) & F.col("species").isin(bl),
                       F.lit(cfg.floor_ban)).otherwise(updated)
    # no usage entry at all → keep the (normalized) current tier; the
    # BL override never applies (reference continues before it)
    final = F.when(~F.col("has_usage"),
                   F.col("current_tier")).otherwise(final)

    return (j.withColumn("updated_tier", final)
            .withColumn("changed",
                        F.col("updated_tier") != F.col("current_tier"))
            .select("species", "current_tier", "updated_tier", "changed",
                    *[F.round(F.col(k), 6).alias(f"usage_{k}")
                      for k in keys]))


def tier_update_lines(result: DataFrame, spark=None) -> list[str]:
    """'X moved from A to B' lines with the mega-vs-base suppression —
    reports.ts:488-508: a mega/primal forme's move is skipped when its
    base species' updated tier is strictly higher."""
    sp = dims.species_table()
    mega_base = {r.species_id: r.base_species_id
                 for r in sp.itertuples() if r.is_mega}
    rows = result.orderBy("species").collect()
    updated = {r.species: r.updated_tier for r in rows}
    # TIERS.indexOf semantics (reports.ts:499-502): smaller index =
    # higher tier; an absent base gives indexOf(undefined) = -1, which
    # compares below every real tier and SUPPRESSES the mega's line
    rank = {t: i for i, t in enumerate(TIER_ORDER)}
    out = []
    for r in rows:
        if not r.changed:
            continue
        base = mega_base.get(r.species)
        if base is not None:
            if rank.get(updated.get(base), -1) < rank.get(r.updated_tier, -1):
                continue
        out.append(f"{r.species} moved from {r.current_tier} "
                   f"to {r.updated_tier}")
    return out
