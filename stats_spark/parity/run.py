"""Run the engine over the reference's fixture logs and render the
LEGACY usage/leads reports byte-for-byte (reports.ts:98-172 with
legacy=true, the mode integration.ts:57-67 generated the goldens in).

The aggregation itself is the production engine: parse_battles →
sides/mons frames → aggregate.usage_by_species / leads /
battle_counts.  Only the dims payload (curated real gen data instead of
the synthetic dims) and the format gate sets (the reference's legacy
sets) differ.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stats_spark.operators import aggregate as agg
from stats_spark.operators import enrich
from stats_spark.operators.parse import parse_battles
from stats_spark.parity import fixtures, gen_data
from stats_spark.plans.pipeline import battles_weighted

CUTOFFS = [0, 1500, 1630, 1760]


def build_format_frames(spark, fmt: str) -> dict:
    """Parse one fixture format and produce the usage/leads aggregate
    frames at all four cutoffs."""
    tr, cv = fixtures.to_spark(spark, fmt)
    payload = gen_data.dims_payload(legacy=True)
    battles = parse_battles(tr, cv, payload).cache()

    ns, n6 = payload["non_singles"], payload["non_6v6"]
    sides = enrich.with_effective_rating(
        enrich.sides_from_battles(battles.filter("error IS NULL"),
                                  non_singles=ns, non_6v6=n6))
    mons = (sides.select("conv_id", "format", "side", "short", "outcome",
                         "rating_valid", "eff_rpr", "eff_rprd",
                         F.explode("team").alias("mon"))
            .select("*", F.col("mon.species").alias("species"),
                    F.col("mon.turns_out").alias("turns_out"))
            .drop("mon"))
    mons_w = enrich.with_weight(enrich.explode_cutoffs(mons, CUTOFFS))
    usage = agg.usage_by_species(mons_w)
    totals = agg.usage_totals(usage)

    bw = battles_weighted(battles.filter("error IS NULL"), CUTOFFS,
                          non_singles=ns, non_6v6=n6)
    leads = agg.leads(bw)
    counts = agg.battle_counts(bw)
    return dict(battles=battles, usage=usage, totals=totals, leads=leads,
                counts=counts)


def gen_for_format(fmt: str) -> int:
    """util.ts genForFormat."""
    import re
    m = re.match(r"gen(\d)", fmt)
    return int(m.group(1)) if m else 6


def side_class_frame(spark, battles):
    """Per-(conv_id, side) legacy classification rows: the reference
    classifies during parse (parser.ts:113); here it is a mapInPandas
    over the parsed battles (teams cross the Arrow boundary as JSON —
    see the parse operator's rationale)."""
    import json

    import pandas as pd

    b = battles.filter("error IS NULL").select(
        "conv_id", "format",
        F.to_json("p1_team").alias("t1"), F.to_json("p2_team").alias("t2"))

    def fn(batches):
        from stats_spark.parity import classifier_legacy as C
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                gen = gen_for_format(r.format)
                for side, tj in (("p1", r.t1), ("p2", r.t2)):
                    team = json.loads(tj) if tj else []
                    bias, stall, tags = C.classify_team(gen, team)
                    rows.append(dict(conv_id=r.conv_id, side=side,
                                     team_bias=bias, team_stalliness=stall,
                                     tags=tags, n_slots=len(team)))
            if rows:
                yield pd.DataFrame(rows)

    schema = ("conv_id string, side string, team_bias long, "
              "team_stalliness double, tags array<string>, n_slots int")
    return b.mapInPandas(fn, schema=schema)


def add_metagame_frames(spark, fmt: str, frames: dict) -> dict:
    """metagame tag weights + stalliness samples: the reference adds
    weights.s once per team SLOT (incl. legacy 'empty' padding) —
    stats.ts:284-297."""
    battles = frames["battles"]
    sc = side_class_frame(spark, battles)
    payload = gen_data.dims_payload(legacy=True)
    sides = enrich.with_effective_rating(
        enrich.sides_from_battles(battles.filter("error IS NULL"),
                                  non_singles=payload["non_singles"],
                                  non_6v6=payload["non_6v6"]))
    sw = enrich.with_weight(enrich.explode_cutoffs(
        sides.join(sc, ["conv_id", "side"]), CUTOFFS))
    meta = (sw.filter(~F.col("short"))
            .select("format", "cutoff",
                    (F.col("weight") * F.col("n_slots")).alias("w"),
                    F.explode("tags").alias("tag"))
            .groupBy("format", "cutoff", "tag")
            .agg(F.sum("w").alias("weight")))
    samples = (sw.filter(~F.col("short"))
               .select("format", "cutoff", "team_stalliness", "weight",
                       "n_slots"))
    frames["meta"] = meta
    frames["samples"] = samples
    return frames


def render_metagame(fmt: str, cutoff: int, frames: dict) -> str:
    """reports.ts:367-412 via the engine's exact renderer, with the
    reference's per-slot sample expansion."""
    from stats_spark.plans.reports import render_metagame_report

    tags = [(r.tag, r.weight) for r in
            frames["meta"].filter((F.col("cutoff") == cutoff)
                                  & (F.col("format") == fmt)).collect()]
    samples = []
    for r in frames["samples"].filter((F.col("cutoff") == cutoff)
                                      & (F.col("format") == fmt)).collect():
        samples.extend([(r.team_stalliness, r.weight)] * r.n_slots)
    tot = {r["format"]: r["total_usage_weighted"] for r in
           frames["totals"].filter(F.col("cutoff") == cutoff).collect()}
    return render_metagame_report(tags, tot.get(fmt, 0.0), samples)


def _js_num(v: float) -> str:
    """JS Number#toString for the roundStr path (shortest repr)."""
    r = repr(v)
    return r[:-2] if r.endswith(".0") else r


def _round_str(v: float, p: float) -> str:
    """util.ts:277-284 — Math.round is half-up toward +inf."""
    import math
    num = math.floor(v * p + 0.5) / p
    return f"{num:.1f}" if num == math.floor(num) else _js_num(num)


def render_usage(fmt: str, cutoff: int, frames: dict) -> str:
    """reports.ts:98-137, legacy=true."""
    rows = [r.asDict() for r in
            frames["usage"].filter(F.col("cutoff") == cutoff).collect()]
    tot = {r["format"]: r.asDict() for r in
           frames["totals"].filter(F.col("cutoff") == cutoff).collect()}
    counts = {r["format"]: r["battles"] for r in
              frames["counts"].filter(F.col("cutoff") == cutoff).collect()}
    t = tot.get(fmt, {})
    battles = counts.get(fmt, 0)
    total = dict(
        raw=max(1.0, t.get("total_usage_raw") or 0),
        real=max(1.0, t.get("total_usage_real") or 0),
        weighted=max(1.0, t.get("total_usage_weighted") or 0.0),
    )

    entries = [r for r in rows if r["species"] != "empty"]
    if fmt in gen_data.REAL_RANKED:
        entries.sort(key=lambda r: (-r["usage_real"], r["species"]))
    else:
        entries.sort(key=lambda r: (-r["usage_weighted"], r["species"]))

    s = f"Total battles: {battles}\n"
    avg = (_round_str((t.get("total_usage_weighted") or 0.0) / battles / 12,
                      1e3) if battles else "0.0")
    s += f"Avg. weight/team: {avg}\n"
    bar = ("+ ---- + ------------------ + --------- + ------ + ------- "
           "+ ------ + ------- + \n")
    s += bar
    s += ("| Rank | Pokemon            | Usage %   | Raw    | %       "
          "| Real   | %       | \n")
    s += bar
    for i, r in enumerate(entries):
        if r["usage_raw"] == 0:
            break
        poke = gen_data.display_species(r["species"]).ljust(18)
        use = f"{100 * r['usage_weighted'] / total['weighted'] * 6:.5f}" \
            .rjust(8)
        rawp = f"{100 * r['usage_raw'] / total['raw'] * 6:.3f}".rjust(6)
        realp = f"{100 * r['usage_real'] / total['real'] * 6:.3f}".rjust(6)
        s += (f"| {str(i + 1).ljust(4)} | {poke} | {use}% "
              f"| {str(r['usage_raw']).ljust(6)} | {rawp}% "
              f"| {str(r['usage_real']).ljust(6)} | {realp}% | \n")
    s += bar
    return s


def render_leads(fmt: str, cutoff: int, frames: dict) -> str:
    """reports.ts:139-172, legacy=true."""
    rows = [r.asDict() for r in
            frames["leads"].filter((F.col("cutoff") == cutoff)
                                   & (F.col("format") == fmt)).collect()]
    counts = {r["format"]: r["battles"] for r in
              frames["counts"].filter(F.col("cutoff") == cutoff).collect()}
    battles = counts.get(fmt, 0)
    total_raw = max(1.0, sum(r["lead_raw"] for r in rows))
    total_w = max(1.0, sum(r["lead_weighted"] for r in rows))

    s = f"Total leads: {battles * 2}\n"
    bar = "+ ---- + ------------------ + --------- + ------ + ------- + \n"
    s += bar
    s += "| Rank | Pokemon            | Usage %   | Raw    | %       | \n"
    s += bar
    rows = [r for r in rows if r["species"] != "empty"]
    rows.sort(key=lambda r: (-r["lead_weighted"], -r["lead_raw"],
                             r["species"]))
    for i, r in enumerate(rows):
        if r["lead_raw"] == 0:
            break
        poke = gen_data.display_species(r["species"]).ljust(18)
        use = f"{100 * r['lead_weighted'] / total_w:.5f}".rjust(8)
        pct = f"{100 * r['lead_raw'] / total_raw:.3f}".rjust(6)
        s += (f"| {str(i + 1).ljust(4)} | {poke} | {use}% "
              f"| {str(r['lead_raw']).ljust(6)} | {pct}% | \n")
    s += bar
    return s
