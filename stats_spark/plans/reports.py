"""RANK / TOP-K report shaping + text rendering (SURVEY §2.6, §2.1 S6-S7).

Distributed part (Spark): rank windows, per-section weight ordering,
top-k and cumulative-95% truncations, checks-and-counters scoring —
everything that scales with the number of species/keys.

Driver part (plain Python): exact fixed-width text rendering of the
already-tiny per-(format, cutoff) row sets, mirroring the reference's
report formats byte-for-byte in structure:

  usage report      reports.ts:98-137  (rank table, ×6 team scaling)
  leads report      reports.ts:139-172
  moveset report    reports.ts:190-332 (section truncation rules)
  metagame report   reports.ts:367-412 (tags + stalliness histogram)

Rounding discipline mirrors X2: toFixed(5)/(3)/(2)/(1) at the exact
sites the reference uses them.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

# formats ranked by `real` rather than weighted — reports.ts:100-104.
# The reference matches these EXACT format names (not by suffix):
# 'gen7challengecup1v1' is weighted-ranked.
REAL_RANKED = ("challengecup1v1", "1v1")


def _is_real_fmt(fmt_col):
    return F.col(fmt_col).isin(*REAL_RANKED)


def usage_report_rows(usage: DataFrame, totals: DataFrame) -> DataFrame:
    """Ranked usage rows with the reference's percentages
    (100*x/total*6 — the ×6 scales per-mon counts to per-team)."""
    j = usage.join(totals, ["format", "cutoff"])
    real_fmt = _is_real_fmt("format")
    sort_key = F.when(real_fmt, F.col("usage_real").cast("double")) \
                .otherwise(F.col("usage_weighted"))
    tw = F.greatest(F.lit(1.0), F.col("total_usage_weighted"))
    tr = F.greatest(F.lit(1.0), F.col("total_usage_raw").cast("double"))
    tre = F.greatest(F.lit(1.0), F.col("total_usage_real").cast("double"))
    return (j.withColumn("rank", F.row_number().over(
                Window.partitionBy("format", "cutoff")
                      .orderBy(F.desc(sort_key), F.asc("species"))))
             .filter(F.col("usage_raw") > 0)
             .select("format", "cutoff", "rank", "species",
                     (100 * F.col("usage_weighted") / tw * 6).alias("usage_pct"),
                     F.col("usage_raw").alias("raw"),
                     (100 * F.col("usage_raw") / tr * 6).alias("raw_pct"),
                     F.col("usage_real").alias("real"),
                     (100 * F.col("usage_real") / tre * 6).alias("real_pct")))


def leads_report_rows(leads: DataFrame) -> DataFrame:
    tot = leads.groupBy("format", "cutoff").agg(
        F.greatest(F.lit(1.0), F.sum("lead_weighted")).alias("tw"),
        F.greatest(F.lit(1.0), F.sum("lead_raw").cast("double")).alias("tr"))
    w = Window.partitionBy("format", "cutoff").orderBy(
        F.desc("lead_weighted"), F.desc("lead_raw"), F.asc("species"))
    return (leads.join(tot, ["format", "cutoff"])
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("lead_raw") > 0)
            .select("format", "cutoff", "rank", "species",
                    (100 * F.col("lead_weighted") / F.col("tw")).alias("usage_pct"),
                    F.col("lead_raw").alias("raw"),
                    (100 * F.col("lead_raw") / F.col("tr")).alias("raw_pct")))


# per-section truncation rules — reports.ts:227-328 (W5)
SECTION_RULES = {
    "abilities": dict(top=6, cum=None),
    "items": dict(top=None, cum=0.95),
    "spreads": dict(top=6, cum=0.95),
    "moves": dict(top=None, cum=0.95, weight_div=4),
    "tera_types": dict(top=None, cum=0.95),
    "happinesses": dict(top=None, cum=0.95),
}


def moveset_section_rows(moveset: DataFrame, usage: DataFrame,
                         keep: int = 24) -> DataFrame:
    """Per-(species, section) ordered rows with share of the species'
    raw weight + running cumulative share; truncated at ``keep`` rows
    distributedly, final per-section cutoff applied at render time.
    Ordering matches toDisplayObject: weight desc, key asc."""
    denom = usage.select("format", "cutoff", "species",
                         F.greatest(F.lit(1e-12), F.col("raw_weight"))
                          .alias("species_weight"))
    w = Window.partitionBy("format", "cutoff", "species", "section") \
              .orderBy(F.desc("weight"), F.asc("key"))
    cum = Window.partitionBy("format", "cutoff", "species", "section") \
                .orderBy(F.desc("weight"), F.asc("key")) \
                .rowsBetween(Window.unboundedPreceding, -1)
    j = moveset.join(denom, ["format", "cutoff", "species"])
    return (j.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") <= keep)
             .withColumn("share", F.col("weight") / F.col("species_weight"))
             .withColumn("cum_before",
                         F.coalesce(F.sum(F.col("weight") / F.col("species_weight"))
                                    .over(cum), F.lit(0.0)))
             .select("format", "cutoff", "species", "section", "key",
                     "rn", "share", "cum_before"))


def teammates_rows(teammates: DataFrame, usage: DataFrame,
                   keep: int = 11) -> DataFrame:
    """Top teammates by shared weight; render cutoff: ≤11 rows, cum 95%
    of species weight, each ≥0.5% — reports.ts:293-303."""
    denom = usage.select("format", "cutoff", "species",
                         F.greatest(F.lit(1e-12), F.col("raw_weight"))
                          .alias("species_weight"))
    w = Window.partitionBy("format", "cutoff", "species") \
              .orderBy(F.desc("weight"), F.asc("teammate"))
    return (teammates.join(denom, ["format", "cutoff", "species"])
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= keep)
            .withColumn("share", F.col("weight") / F.col("species_weight"))
            .select("format", "cutoff", "species", "teammate", "rn",
                    "weight", "share", "species_weight"))


def checks_counters_rows(encounters: DataFrame, min_n: float = 20.0,
                         keep: int = 12) -> DataFrame:
    """W7 checks-and-counters scoring — util.ts:332-357:
    n = Σ outcomes[0..5]; p = (koed+switched)/n; d = sqrt(p(1-p)/n);
    score = p − 4d; keep top 12 by score desc, opponent asc."""
    n = sum(F.col(f"o{i}") for i in range(6))
    df = (encounters
          .withColumn("n", n)
          .filter(F.col("n") > min_n)
          .withColumn("p", F.round((F.col("o0") + F.col("o3")) / F.col("n"), 10))
          .withColumn("d", F.round(F.sqrt(F.col("p") * (1.0 - F.col("p"))
                                          / F.col("n")), 10))
          .withColumn("score", F.round(F.col("p") - 4 * F.col("d"), 10)))
    w = Window.partitionBy("format", "cutoff", "species") \
              .orderBy(F.desc("score"), F.asc("opponent"))
    return (df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= keep)
            .select("format", "cutoff", "species", "opponent", "rn",
                    F.col("o0").alias("koed"), F.col("o3").alias("switched"),
                    "n", "p", "d", "score"))


# ---------------------------------------------------------------------
# driver-side text rendering (tiny inputs: one format+cutoff at a time)

def _fixed(x: float, places: int) -> str:
    return f"{x:.{places}f}"


def render_usage_report(rows: list, battles: int,
                        total_weighted: float) -> str:
    """reports.ts:98-137 byte-format."""
    s = f"Total battles: {battles}\n"
    avg = (f"{round(total_weighted / battles / 12 * 1e3) / 1e3}"
           if battles else "0.0")
    s += f"Avg. weight/team: {avg}\n"
    bar = "+ ---- + ------------------ + --------- + ------ + ------- + ------ + ------- + \n"
    s += bar
    s += "| Rank | Pokemon            | Usage %   | Raw    | %       | Real   | %       | \n"
    s += bar
    for r in rows:
        s += ("| " + str(r["rank"]).ljust(4)
              + " | " + r["species"].ljust(18)
              + " | " + _fixed(r["usage_pct"], 5).rjust(8) + "%"
              + " | " + str(r["raw"]).ljust(6)
              + " | " + _fixed(r["raw_pct"], 3).rjust(6) + "%"
              + " | " + str(r["real"]).ljust(6)
              + " | " + _fixed(r["real_pct"], 3).rjust(6) + "%"
              + " | \n")
    s += bar
    return s


def render_leads_report(rows: list, battles: int) -> str:
    s = f"Total leads: {battles * 2}\n"
    bar = "+ ---- + ------------------ + --------- + ------ + ------- + \n"
    s += bar
    s += "| Rank | Pokemon            | Usage %   | Raw    | %       | \n"
    s += bar
    for r in rows:
        s += ("| " + str(r["rank"]).ljust(4)
              + " | " + r["species"].ljust(18)
              + " | " + _fixed(r["usage_pct"], 5).rjust(8) + "%"
              + " | " + str(r["raw"]).ljust(6)
              + " | " + _fixed(r["raw_pct"], 3).rjust(6) + "%"
              + " | \n")
    s += bar
    return s


def render_moveset_sections(species: str, raw_count: int, avg_weight,
                            viability_ceiling: int,
                            sections: dict, teammates: list,
                            checks: list) -> str:
    """reports.ts:190-332 truncation + formatting for one species."""
    W = 40
    pad = lambda t: t.ljust(W + 1) + "|"          # noqa: E731
    sep = "+" + "-" * W + "+\n"
    disp = lambda n, w: pad(f"| {n} {100 * w:.3f}%") + "\n"  # noqa: E731
    other = lambda t, f=1: pad(f"| Other {abs(f * 100 * (1 - t)):.3f}%") + "\n"  # noqa: E731

    s = sep + pad(f"| {species}") + "\n" + sep
    s += pad(f"| Raw count: {raw_count}") + "\n"
    s += pad(f"| Avg. weight: {avg_weight}") + "\n"
    s += pad(f"| Viability Ceiling: {viability_ceiling}") + "\n" + sep

    for name, sec_key in [("Abilities", "abilities"), ("Items", "items"),
                          ("Spreads", "spreads"), ("Moves", "moves"),
                          ("Tera Types", "tera_types")]:
        rows = sections.get(sec_key, [])
        if sec_key == "tera_types" and (
                not rows or (len(rows) == 1 and rows[0]["key"] == "nothing")):
            continue
        rule = SECTION_RULES[sec_key]
        s += pad(f"| {name}") + "\n"
        total = 0.0
        for i, r in enumerate(rows):
            if rule["top"] is not None and i > rule["top"] - 1:
                s += other(total)
                break
            if rule["cum"] is not None and total > rule["cum"]:
                s += other(total, rule.get("weight_div", 1))
                break
            s += disp(r["key"], r["share"])
            total += r["share"] / rule.get("weight_div", 1)
        s += sep

    s += pad("| Teammates") + "\n"
    total = 0.0
    for i, r in enumerate(teammates):
        if total > 0.95 or i > 10:
            break
        if r["weight"] < 0.005 * r["species_weight"]:
            break
        s += pad(f"| {r['teammate']} {100 * r['share']:.3f}%") + "\n"
        total += r["share"] / 5
    s += sep

    strong = [c for c in checks if c["p"] - 4.0 * c["d"] >= 0.5]
    if strong:
        s += pad("| Checks and Counters") + "\n"
        for i, c in enumerate(checks):
            if i > 11 or c["score"] < 0.5:
                break
            line = (f"| {c['opponent']} {100 * c['score']:.3f} "
                    f"({100 * c['p']:.2f}±{100 * c['d']:.2f})").ljust(W + 1) + "|\n"
            ko = 100 * c["koed"] / c["n"]
            sw = 100 * c["switched"] / c["n"]
            line += f"|\t({ko:.1f}% KOed / {sw:.1f}% switched out)"
            if ko < 10:
                line += " "
            if sw < 10:
                line += " "
            s += line + "\n"
        s += sep
    return s


def histogram_params(stall: DataFrame) -> dict:
    """Per-(format, cutoff) histogram parameters computed DISTRIBUTEDLY
    from the binned stalliness frame — util.ts:359-376 semantics:
    low/high are the values at count-index floor(n/1000) from each end
    of the count-sorted sample list, then sign-clamped; bin size from
    the pretty ladder.  Only ~#groups scalar rows reach the driver."""
    w = Window.partitionBy("format", "cutoff").orderBy("stalliness") \
              .rowsBetween(Window.unboundedPreceding, 0)
    df = (stall
          .withColumn("cum_n", F.sum("n").over(w))
          .withColumn("n_total", F.sum("n").over(
              Window.partitionBy("format", "cutoff")))
          .withColumn("idx", F.floor(F.col("n_total") / 1000)))
    # low = first value whose cumulative count exceeds idx;
    # high = first value (from the top) whose cum count from the end
    # exceeds idx  ⇔  last value with cum_n >= n_total - idx... use the
    # symmetric definition: value at count position (n_total - idx - 1)
    lows = (df.filter(F.col("cum_n") > F.col("idx"))
            .groupBy("format", "cutoff")
            .agg(F.min("stalliness").alias("low")))
    highs = (df.filter(F.col("cum_n") - F.col("n") <= F.col("n_total")
                       - F.col("idx") - 1)
             .groupBy("format", "cutoff")
             .agg(F.max("stalliness").alias("high")))
    scal = (stall.groupBy("format", "cutoff")
            .agg(F.sum(F.col("stalliness") * F.col("weight")).alias("vw"),
                 F.sum("weight").alias("total"),
                 F.sum("n").alias("n_total"))
            .join(lows, ["format", "cutoff"])
            .join(highs, ["format", "cutoff"]))
    out = {}
    for r in scal.collect():
        low, high = r.low, r.high
        if low > 0:
            low = 0.0
        elif high < 0:
            high = 0.0
        size = (high - low) / 12
        bin_size = next((b for b in [10, 5, 2.5, 2, 1.5, 1, 0.5, 0.25, 0.2,
                                     0.1, 0.05] if size > b), 0.05)
        n_pos = 0
        x = bin_size
        while x + bin_size / 2 < high:
            n_pos += 1
            x += bin_size
        n_neg = 0
        x = -bin_size
        while x - bin_size / 2 > low:
            n_neg += 1
            x -= bin_size
        out[(r.format, r.cutoff)] = dict(
            bin_size=bin_size, n_neg=n_neg, n_pos=n_pos,
            nbins=n_neg + n_pos + 1, mean=r.vw / r.total if r.total else 0.0,
            total=r.total)
    return out


def histogram_rows(stall: DataFrame, params: dict) -> dict:
    """Assign every (value, weight) row to its reference bin index
    distributedly; collect only the ≤ ~40 bins per group.  Returns
    {(format, cutoff): [[x, weight], ...]} sorted by x."""
    if not params:
        return {}
    spark = stall.sparkSession
    pdf = [dict(format=f, cutoff=c, bin_size=p["bin_size"],
                n_neg=p["n_neg"], nbins=p["nbins"]) for (f, c), p in
           params.items()]
    pp = F.broadcast(spark.createDataFrame(
        pdf, "format string, cutoff int, bin_size double, n_neg int, "
             "nbins int"))
    min_center = -F.col("n_neg") * F.col("bin_size")
    j = F.greatest(F.lit(0).cast("long"),
                   F.ceil((F.col("stalliness") - min_center)
                          / F.col("bin_size") - 0.5))
    binned = (stall.join(pp, ["format", "cutoff"])
              .withColumn("j", j)
              .filter(F.col("j") < F.col("nbins"))
              .groupBy("format", "cutoff", "j", "n_neg", "bin_size")
              .agg(F.sum("weight").alias("w")))
    out = {k: [[(jj - params[k]["n_neg"]) * params[k]["bin_size"], 0.0]
               for jj in range(params[k]["nbins"])] for k in params}
    for r in binned.collect():
        out[(r.format, r.cutoff)][r.j][1] = r.w
    return out


def stalliness_histogram(samples: list[tuple[float, float]]):
    """util.ts:359-408 — data-driven pretty binning; returns
    (histogram[[x, weight]], bin_size, mean, total)."""
    samples = sorted(samples)
    index = math.floor(len(samples) / 1000)
    low = samples[index][0]
    high = samples[len(samples) - index - 1][0]
    if low > 0:
        low = 0.0
    elif high < 0:
        high = 0.0
    nbins = 13
    size = (high - low) / (nbins - 1)
    bin_size = next((b for b in [10, 5, 2.5, 2, 1.5, 1, 0.5, 0.25, 0.2,
                                 0.1, 0.05] if size > b), 0.05)
    histogram = [[0.0, 0.0]]
    x = bin_size
    while x + bin_size / 2 < high:
        histogram.append([x, 0.0])
        x += bin_size
    x = -bin_size
    while x - bin_size / 2 > low:
        histogram.append([x, 0.0])
        x -= bin_size
    histogram.sort()
    nbins = len(histogram)
    j = 0
    for val, weight in samples:
        while val > histogram[0][0] + bin_size * (j + 0.5):
            j += 1
        if j >= nbins:
            break
        histogram[j][1] += weight
    total = sum(w for _, w in samples)
    mean = (sum(v * w for v, w in samples) / total) if total else 0.0
    return histogram, bin_size, mean, total


def render_metagame_report(tags: list, total_weighted: float,
                           samples: list[tuple[float, float]] | None = None,
                           hist: tuple | None = None) -> str:
    """reports.ts:367-412.  Histogram input is either raw ``samples``
    (small/test path) or a precomputed ``hist`` tuple
    (histogram, bin_size, mean, total) from the distributed path."""
    W = max(1.0, total_weighted)
    s = ""
    for tag, weight in sorted(tags, key=lambda t: (-t[1], t[0])):
        dots = "." * max(0, 18 - len(tag))
        s += f"{tag}{dots}{100.0 * weight / W * 6.0:.5f}%\n"
    s += "\n"
    if hist is None:
        if not samples:
            return s
        hist = stalliness_histogram(samples)
    histogram, bin_size, mean, total = hist
    mx = max((h[1] for h in histogram), default=0)
    blocks = mx / 30
    if blocks <= 0:
        return s
    def _fmod(a: float, b: float, f: float = 1e3) -> float:
        # reports.ts:651-655 — rounds to 1e-3 and mods ABSOLUTE values
        # (Python's math.fmod keeps sign and would mislabel negatives)
        a = math.floor(a * f + 0.5) / f
        b = math.floor(b * f + 0.5) / f
        return (abs(a * f) % (b * f)) / f

    s += f"Stalliness (mean: {mean:.3f})\n"
    for hx, hw in histogram:
        if _fmod(hx, 2 * bin_size) < bin_size / 2:
            line = "+" if hx > 0 else (" " if hx == 0 else "")
            line += f"{hx:.1f}|"
        else:
            line = "    |"
        # JS Math.round is half-up toward +inf
        s += line + "#" * int(math.floor(hw / blocks + 0.5)) + "\n"
    s += "more negative = more offensive, more positive = more stall\n"
    s += f"one # = {100.0 * blocks / total:.2f}%\n"
    return s


def write_reports(spark, frames: dict, out_dir: str,
                  formats: list[str] | None = None,
                  cutoffs: list[int] | None = None,
                  movesets: bool = True) -> dict:
    """S6 fan-out: render the full report suite per (format, cutoff) —
    usage / leads / metagame / moveset / detailed(chaos JSON) — into
    output/{,leads/,metagame/,moveset/,chaos/} trees (the reference's
    five-tree layout, workflows/smogon/stats.ts:159-196).

    Scale discipline: every collect here is BOUNDED — ranked usage/leads
    rows (#species), per-section top-k truncated moveset rows (window
    rank, keep=24/11/12 — the render cutoffs), metagame tags, and
    ≤ ~40 histogram bins per group computed by the distributed
    two-pass stalliness histogram.  No unbounded-cardinality frame is
    ever collected to the driver."""
    import json as _json
    import os

    usage_rows = usage_report_rows(frames["usage"], frames["usage_totals"])
    lead_rows = leads_report_rows(frames["leads"])
    counts = {(r["format"], r["cutoff"]): r["battles"]
              for r in frames["battle_counts"].collect()}
    totals = {(r["format"], r["cutoff"]): r["total_usage_weighted"]
              for r in frames["usage_totals"].collect()}
    meta = frames["metagame"].collect()
    hp = histogram_params(frames["stalliness"])
    hist = histogram_rows(frames["stalliness"], hp)

    u_pdf = usage_rows.toPandas()
    l_pdf = lead_rows.toPandas()

    ms_rows = tm_rows = cc_rows = None
    usage_pdf = via_pdf = None
    if movesets:
        ms_rows = moveset_section_rows(frames["moveset"], frames["usage"]) \
            .toPandas()
        tm_rows = teammates_rows(frames["teammates"], frames["usage"]) \
            .toPandas()
        cc_rows = checks_counters_rows(frames["encounters"]).toPandas()
        usage_pdf = frames["usage"].select(
            "format", "cutoff", "species", "raw_count", "saved_count",
            "saved_weight").toPandas()
        via_pdf = frames["viability"].select(
            "format", "cutoff", "species", "gxe_max").toPandas()

    written = []
    keys = sorted(counts.keys() if formats is None
                  else {(f, c) for f in formats for c in cutoffs})
    for sub in ("leads", "metagame", "moveset", "chaos"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    for fmt, cutoff in keys:
        base = os.path.join(out_dir, f"{fmt}-{cutoff}")
        rows = u_pdf[(u_pdf.format == fmt) & (u_pdf.cutoff == cutoff)] \
            .sort_values("rank").to_dict("records")
        with open(base + ".txt", "w") as f:
            f.write(render_usage_report(rows, counts.get((fmt, cutoff), 0),
                                        totals.get((fmt, cutoff), 0.0)))
        lrows = l_pdf[(l_pdf.format == fmt) & (l_pdf.cutoff == cutoff)] \
            .sort_values("rank").to_dict("records")
        with open(os.path.join(out_dir, "leads", f"{fmt}-{cutoff}.txt"),
                  "w") as f:
            f.write(render_leads_report(lrows, counts.get((fmt, cutoff), 0)))
        tags = [(r["tag"], r["weight"]) for r in meta
                if r["format"] == fmt and r["cutoff"] == cutoff]
        h = hp.get((fmt, cutoff))
        htuple = ((hist[(fmt, cutoff)], h["bin_size"], h["mean"],
                   h["total"]) if h else None)
        with open(os.path.join(out_dir, "metagame", f"{fmt}-{cutoff}.txt"),
                  "w") as f:
            f.write(render_metagame_report(
                tags, totals.get((fmt, cutoff), 0.0),
                samples=None if htuple else [], hist=htuple))

        if movesets:
            ms_txt, chaos = _render_movesets(
                fmt, cutoff, rows, usage_pdf, via_pdf, ms_rows, tm_rows,
                cc_rows, counts.get((fmt, cutoff), 0))
            with open(os.path.join(out_dir, "moveset",
                                   f"{fmt}-{cutoff}.txt"), "w") as f:
                f.write(ms_txt)
            with open(os.path.join(out_dir, "chaos",
                                   f"{fmt}-{cutoff}.json"), "w") as f:
                _json.dump(chaos, f, separators=(",", ":"))
        written.append(base)
    return dict(written=len(written))


def _render_movesets(fmt, cutoff, usage_rank_rows, usage_pdf, via_pdf,
                     ms_rows, tm_rows, cc_rows, battles):
    """Assemble the basic moveset text report + the detailed 'chaos'
    JSON for one (format, cutoff) from the pre-truncated frames —
    reports.ts:190-332 / 335-365 shapes.  The chaos maps carry the
    top-k rows the distributed truncation kept (keep=24 per section), a
    documented divergence from the reference's unbounded maps."""
    from stats_spark.functions.ids import to_id_py  # noqa: F401 (parity)

    u = usage_pdf[(usage_pdf.format == fmt) & (usage_pdf.cutoff == cutoff)]
    raw_counts = dict(zip(u.species, u.raw_count))
    saved = {r.species: (r.saved_count, r.saved_weight)
             for r in u.itertuples()}
    v = via_pdf[(via_pdf.format == fmt) & (via_pdf.cutoff == cutoff)]
    ceilings = dict(zip(v.species, v.gxe_max))
    ms = ms_rows[(ms_rows.format == fmt) & (ms_rows.cutoff == cutoff)]
    tm = tm_rows[(tm_rows.format == fmt) & (tm_rows.cutoff == cutoff)]
    cc = cc_rows[(cc_rows.format == fmt) & (cc_rows.cutoff == cutoff)]

    s = ""
    chaos_data = {}
    for r in usage_rank_rows:
        sp = r["species"]
        if r["usage_pct"] < 0.01:   # usage < 0.0001 — reports.ts:212
            break
        sec = ms[ms.species == sp]
        sections = {
            name: sec[sec.section == name].sort_values("rn")
            .to_dict("records")
            for name in ("abilities", "items", "spreads", "moves",
                         "tera_types", "happinesses", "stats")
        }
        mates = tm[tm.species == sp].sort_values("rn").to_dict("records")
        checks = cc[cc.species == sp].sort_values("rn").to_dict("records")
        sc, sw = saved.get(sp, (0, 0.0))
        avg = _round_str_simple(sw / sc) if sc else "---"
        ceiling = int(ceilings.get(sp, 0) or 0)
        s += render_moveset_sections(sp, int(raw_counts.get(sp, 0)), avg,
                                     ceiling, sections, mates, checks)
        chaos_data[sp] = {
            "Raw count": int(raw_counts.get(sp, 0)),
            "usage": round(r["usage_pct"] / 100.0, 7),
            "Viability Ceiling": ceiling,
            **{name.title().replace("_", " "):
               {row["key"]: row["share"] for row in rows}
               for name, rows in sections.items() if name != "stats"},
            "Teammates": {row["teammate"]: row["weight"] for row in mates},
            "Checks and Counters": {
                row["opponent"]: dict(n=row["n"], p=row["p"], d=row["d"])
                for row in checks},
        }
    info = {"metagame": fmt, "cutoff": cutoff, "cutoff deviation": 0,
            "team type": None, "number of battles": battles}
    return s, {"info": info, "data": chaos_data}


def _round_str_simple(v: float) -> str:
    import math
    num = math.floor(v * 1e12 + 0.5) / 1e12
    return f"{num:.1f}" if num == math.floor(num) else repr(num)
