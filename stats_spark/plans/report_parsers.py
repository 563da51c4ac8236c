"""Legacy ASCII-report re-parsers + `Display.fromReports`.

Driver-side port of the reference's legacy-interchange shim
(`stats/src/display.ts:174-300, 387-535`): the four report parsers
(`parseUsageReport`, `parseLeadsReport`, `partialParseMovesetReport`,
`parseMetagameReport`) and `Display.fromReports`, which stitches a
legacy report set back into the new display-JSON shape.

These parse SMALL per-format ASCII artifacts (a usage report is a few
hundred lines) — legitimately non-distributed glue, the engine keeps
its aggregates as DataFrames; this module only exists so a user of
the reference who holds legacy reports can re-enter the new format.
Every JS quirk is reproduced deliberately: break-not-continue on the
first falsy rounded usage, insertion-order result maps, the
`total = Σnum / e` histogram rescale (`display.ts:284` — the
reference's own `// BUG: this probably wrong` is kept for parity),
and `Number()`-style whitespace-tolerant numeric coercion.
"""

from __future__ import annotations

import math
import re

from stats_spark.functions.ids import to_id_py

# display.ts:85-87 — renamed species corrections
FIX = {"mimikyutotembusted": "mimikyubustedtotem"}

# display.ts:89-91
_SPECIES = re.compile(r"\| (.*) [-+.0-9]+ \([-+.0-9]+±[-+.0-9]+\)")
_OUTCOME = re.compile(r"\|\W+\(([-+.0-9]+)% KOed / ([-+.0-9]+)% switched out\)")
_WEIGHT = re.compile(r"\d[\d.]*")


def _num(s: str) -> float:
    """JS Number(): whitespace-trimmed, '' → 0, invalid → NaN."""
    s = s.strip()
    if not s:
        return 0.0
    try:
        return float(s)
    except ValueError:
        return float("nan")


def _R(v: float) -> float:
    """display.ts:8 — round to 4 decimal places, JS Math.round
    (half-up toward +inf)."""
    return math.floor(v * 1e4 + 0.5) / 1e4


def _lc_key(s: str):
    """JS localeCompare stand-in (ASCII names): case/punct-insensitive
    primary strength, raw string tiebreak."""
    primary = "".join(c for c in s.lower() if c.isalnum() or c == " ")
    return (primary, s)


def parse_usage_report(report: str) -> dict:
    """display.ts:387-406 — handles both the pre- and post-2026-03
    layouts (leading-space header vs none; Real column may be 0)."""
    usage: dict[str, dict] = {}
    lines = report.split("\n")
    battles = _num(lines[0].split(": ")[1])
    avg = _num(lines[1].split(": ")[1])
    for ln in lines[5:]:
        seg = ln.split("|")
        if len(seg) < 7:
            break
        name = seg[2][1:].strip()
        usage[to_id_py(name)] = dict(
            weightedp=_num(seg[3][1:seg[3].index("%")]) / 100,
            raw=_num(seg[4][1:-1]),
            rawp=_num(seg[5][1:seg[5].index("%")]) / 100,
            real=_num(seg[6][1:-1]),
            realp=_num(seg[7][1:seg[7].index("%")]) / 100,
        )
    return dict(battles=battles, avg=avg, usage=usage)


def parse_leads_report(report: str) -> dict:
    """display.ts:414-429."""
    usage: dict[str, dict] = {}
    lines = report.split("\n")
    total = _num(lines[0].split(": ")[1])
    for ln in lines[4:]:
        seg = ln.split("|")
        if len(seg) < 5:
            break
        name = seg[2][1:].strip()
        usage[to_id_py(name)] = dict(
            weightedp=_num(seg[3][1:seg[3].index("%")]) / 100,
            raw=_num(seg[4][1:-1]),
            rawp=_num(seg[5][1:seg[5].index("%")]) / 100,
        )
    return dict(total=total, usage=usage)


def partial_parse_moveset_report(report: str) -> dict:
    """display.ts:432-483 — the section-walking state machine: a
    species header is the first line of a section that follows an
    EMPTY section; Checks-and-Counters rows alternate species line /
    outcome line (the 2026-03 layout drops the trailing ` |`, which
    the `\\W+` outcome regex absorbs)."""
    movesets: dict[str, dict] = {}
    species = ""
    s = ""
    in_cc = False
    cc_line = 0
    section_lines = 0
    prev_section_empty = False
    for ln in report.split("\n"):
        if ln.lstrip().startswith("+"):
            prev_section_empty = section_lines == 0
            in_cc = False
            cc_line = 0
            section_lines = 0
            continue
        section_lines += 1
        if "Checks and Counters" in ln:
            in_cc = True
            cc_line = 0
            continue
        if section_lines == 1 and prev_section_empty:
            seg = ln.split("|")
            species = seg[1].strip() if len(seg) > 1 else ""
            continue
        if species not in movesets and "Avg. weight" in ln:
            m = _WEIGHT.search(ln)
            movesets[species] = dict(
                weight=_num(m.group(0)) if m else float("nan"),
                outcomes={})
            continue
        if in_cc:
            cc_line += 1
            if cc_line % 2 == 1:
                s = _SPECIES.search(ln).group(1)
            else:
                out = _OUTCOME.search(ln)
                movesets[species]["outcomes"][s] = dict(
                    koedn=_num(out.group(1)) / 100,
                    switchedn=_num(out.group(2)) / 100)
    return movesets


def parse_metagame_report(report: str) -> dict:
    """display.ts:485-535 — tag percentages, stalliness mean, and the
    '#'-bar histogram whose bin start/step are inferred from the
    labelled axis rows (both the old labelled-first-row and the new
    blank-leading-row layouts)."""
    tags: dict[str, float] = {}
    lines = report.split("\n")
    i = 0
    while i < len(lines):
        ln = lines[i].lstrip()
        d = ln.find(".")
        if d < 0:
            break
        tag = ln[:d]
        m = re.search(r"\d", ln)
        tags[tag] = _num(ln[m.start():ln.rfind("%")]) / 100
        i += 1
    i += 1
    if i >= len(lines):
        return dict(tags=tags, mean=0, histogram=[], legend=0)
    m = re.search(r"\d", lines[i])
    mean = _num(lines[i][m.start():lines[i].rfind(")")])

    j = 0
    start = None
    step = None
    values = []
    i += 1
    begin = i
    while i < len(lines):
        seg = lines[i].split("|")
        if len(seg) < 2:
            break
        if start is None or not step:
            if re.search(r"\d", seg[0]):
                n = _num(seg[0])
                if start is None:
                    start = n
                    j = i
                    if i != begin:
                        step = 0
                else:
                    s = (n - start) / (i - j)
                    if step == 0:
                        start -= (j - begin) * s
                    step = s
        values.append(len(seg[1]))
        i += 1
    histogram = []
    for v in values:
        histogram.append([start, v])
        start = (start or 0) + (step or 0)
    i += 1
    legend = 0
    if i < len(lines) and lines[i]:
        m = re.search(r"\d", lines[i])
        legend = _num(lines[i][m.start():lines[i].rfind("%")]) / 100
    return dict(tags=tags, mean=mean, histogram=histogram, legend=legend)


def _to_display_object(mapping: dict, weight: float,
                       display=None) -> dict:
    """display.ts:305-319 — weight-share map ordered value desc then
    display-name localeCompare asc, truncated at the first share that
    rounds to 0."""
    d = (lambda k: display(k) if display and isinstance(k, str)
         else str(k))
    obj = {}
    for k, v in sorted(mapping.items(),
                       key=lambda kv: (-kv[1], _lc_key(d(kv[0])))):
        r = _R(v / weight)
        if not r:
            break
        obj[d(k)] = r
    return obj


def from_reports(usage_report: str, moveset_report: str,
                 detailed_report: str, metagame_report: str | None = None,
                 leads_report: str | None = None,
                 names: dict | None = None) -> dict:
    """Display.fromReports (display.ts:174-300).  `names` maps section
    → {id: display name} (the `gen.*.get` lookups); missing entries
    fall back to the raw id, the mockGen behavior of the reference's
    own tests."""
    import json as _json

    names = names or {}

    def N(n: str) -> str:
        sp = names.get("species", {})
        return sp.get(FIX.get(to_id_py(n), n)) or sp.get(n) or n

    dr = _json.loads(detailed_report)
    ur = parse_usage_report(usage_report)
    pmr = partial_parse_moveset_report(moveset_report)
    mr = parse_metagame_report(metagame_report) if metagame_report else None
    lr = parse_leads_report(leads_report) if leads_report else None

    pokemon: dict[str, dict] = {}
    for species, entry in pmr.items():
        if species == "empty":
            continue
        p = dr["data"].get(species)
        if not p:
            continue
        sid = to_id_py(species)
        raw_weight = sum(p["Abilities"].values())
        w = entry["weight"]
        weight = _R(w) if w else None

        urp = ur["usage"].get(sid)
        if not urp:
            break
        usage = dict(raw=_R(urp["rawp"]), real=_R(urp["realp"]),
                     weighted=_R(urp["weightedp"]))
        if not usage["weighted"]:
            break

        lead = None
        lrp = lr["usage"].get(sid) if lr else None
        if lrp:
            lead = dict(raw=_R(lrp["rawp"]), real=0,
                        weighted=_R(lrp["weightedp"]))
            lead["real"] = lead["raw"]

        scored = {}
        for k, v in p["Checks and Counters"].items():
            if k not in entry["outcomes"]:
                continue
            n = v[0] if isinstance(v, list) else v["n"]
            koedn = entry["outcomes"][k]["koedn"]
            switchedn = entry["outcomes"][k]["switchedn"]
            q = _R((koedn * n + switchedn * n) / n)
            d = _R(math.sqrt((q * (1.0 - q)) / n))
            scored[N(k)] = dict(score=_R(q - 4 * d),
                                val=[_R(n), _R(koedn), _R(switchedn)])
        counters = {}
        for k, v in sorted(scored.items(),
                           key=lambda kv: (-kv[1]["score"], _lc_key(kv[0]))):
            counters[k] = v["val"]

        p["Teammates"].pop("empty", None)
        pokemon[N(species)] = dict(
            lead=lead,
            usage=usage,
            count=p["Raw count"],
            weight=weight,
            viability=p["Viability Ceiling"],
            abilities=_to_display_object(
                p["Abilities"], raw_weight,
                lambda a: names.get("abilities", {}).get(a) or a),
            items=_to_display_object(
                p["Items"], raw_weight,
                lambda it: "Nothing" if it == "nothing"
                else (names.get("items", {}).get(it) or it)),
            teraTypes=_to_display_object(
                p["Tera Types"], raw_weight,
                lambda t: t[0].upper() + t[1:] if t else t),
            happinesses=(_to_display_object(p["Happiness"], raw_weight)
                         if p.get("Happiness") else None),
            spreads=_to_display_object(p["Spreads"], raw_weight),
            moves=_to_display_object(
                p["Moves"], raw_weight,
                lambda mv: "Nothing" if mv == ""
                else (names.get("moves", {}).get(mv) or mv)),
            teammates=_to_display_object(p["Teammates"], raw_weight, N),
            counters=counters,
        )

    metagame = None
    if mr:
        tags = {}
        for tag, val in mr["tags"].items():
            r = _R(val)
            if not r:
                break
            tags[tag] = r
        # display.ts:283-284 — kept verbatim, including the reference's
        # own `// BUG: this probably wrong` ÷e rescale
        total = sum(num for _b, num in mr["histogram"]) / math.e
        metagame = dict(
            tags=tags,
            stalliness=dict(
                histogram=[[_R(b), _R(num * mr["legend"] * total)]
                           for b, num in mr["histogram"]],
                mean=_R(mr["mean"]),
                total=_R(total)))

    return dict(battles=dr["info"]["number of battles"],
                pokemon=pokemon, metagame=metagame)
