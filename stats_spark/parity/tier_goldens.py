"""W10 parity: the reference's OWN tier-update goldens, byte-for-byte.

The reference vendors everything the update needs
(`stats/src/test/testdata/stats/`): the full current tier table
(`tiers.json`, applied over gen data by `integration.ts:105-115
override()`), three months of real usage reports
(`2024-{04,05,06}/gen9*.txt`), and four golden outputs
(`update/{singles,doublesTier,nationaldex,littlecup}.txt`) written by
`integration.ts:162` from `Reports.tierUpdateReport`
(`reports.ts:414-509`).

This module re-runs that update end-to-end: the ASCII usage reports
are parsed (`parseUsageReport`, reports.ts:791-805), merged across
months/suffixes with the n-weighted average (reports.ts:425-455), fed
to the SAME Spark ladder the driver pipeline uses
(`plans/tiers.py:tier_update` with a reference `LadderConfig`), and
rendered (`makeTable` reports.ts:758-784 + the moved-from lines
reports.ts:486-508).  tests/test_parity.py byte-compares all four.

Display names come from the usage reports' own Pokemon column — every
species that can appear in a table, a moved line, or the LC banlist
necessarily appears in at least one report row (moves and bans both
require a usage entry), so no external species-name table is needed.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

from stats_spark.functions.ids import to_id_py
from stats_spark.plans import tiers

TESTDATA = "/root/reference/stats/src/test/testdata/stats"
# integration.ts:15-19 — newest month first
MONTHS = ("2024-06", "2024-05", "2024-04")
SUFFIXES = ("", "suspecttest", "alpha", "beta")      # reports.ts:64
UPDATE_FILES = {                                      # integration.ts:22-27
    "singles": "singles.txt",
    "doubles": "doublesTier.txt",
    "nationaldex": "nationaldex.txt",
    "littlecup": "littlecup.txt",
}

USAGE_TIERS = {                                       # reports.ts:46-51
    "singles": ("OU", "UU", "RU", "NU", "PU"),
    "doubles": ("DOU", "DUU"),
    "nationaldex": ("OU", "UU"),
    "littlecup": ("LC",),
}
TIERS_LIST = {                                        # reports.ts:53-62
    "singles": ("Uber", "OU", "UUBL", "UU", "RUBL", "RU", "NUBL", "NU",
                "PUBL", "PU", "ZUBL", "ZU"),
    "doubles": ("DUber", "DOU", "DUU", "DNU"),
    "nationaldex": ("Uber", "OU", "UUBL", "UU", "RUBL", "RU", "NUBL",
                    "NU", "PUBL", "PU", "ZUBL", "ZU"),
    "littlecup": ("LC", "LCBL", "LCUU"),
}

# reports.ts:512-521 — cosmetic-forme skip list
SKIP = {
    "pichuspikyeared", "unownb", "unownc", "unownd", "unowne", "unownf",
    "unowng", "unownh", "unowni", "unownj", "unownk", "unownl", "unownm",
    "unownn", "unowno", "unownp", "unownq", "unownr", "unowns", "unownt",
    "unownu", "unownv", "unownw", "unownx", "unowny", "unownz", "unownem",
    "unownqm", "burmysandy", "burmytrash", "cherrimsunshine", "shelloseast",
    "gastrodoneast", "deerlingsummer", "deerlingautumn", "deerlingwinter",
    "sawsbucksummer", "sawsbuckautumn", "sawsbuckwinter", "keldeoresolution",
    "genesectdouse", "genesectburn", "genesectshock", "genesectchill",
    "basculinbluestriped", "darmanitanzen", "keldeoresolute",
    "pikachucosplay",
}

# Reports.BL — reports.ts:69-96.  Ported for completeness, but the
# golden runs pass an EMPTY floor-BL set: the vendored goldens contain
# zero moves into any BL tier although six BL.ZU members (Alcremie,
# Bruxish, Dudunsparce, Electrode-Hisui, Oricorio-Sensu, Porygon2) sit
# at current ZU with usage and no rise — the floor-fallthrough path
# reports.ts:609-614 would bump every one of them, so the goldens were
# evidently generated before that override (or with these sets empty).
# Byte-parity reproduces the goldens; the synthetic driver ladder keeps
# the override active per the current source.
BL = {
    "UU": {
        "baxcalibur", "blaziken", "ceruledge", "espathra", "garchomp",
        "garganacl", "hoopaunbound", "ironboulder", "ironhands", "kommoo",
        "latias", "meowscarada", "moltresgalar", "okidogi", "pelipper",
        "polteageist", "quaquaval", "rillaboom", "ursaluna",
    },
    "RU": {
        "blastoise", "comfey", "enamorustherian", "hawlucha", "haxorus",
        "hoopaunbound", "hydreigon", "ironjugulis", "ironleaves", "manaphy",
        "moltresgalar", "polteageist", "ogerpon", "oricoriopompom",
        "salamence", "serperior", "thundurus", "thundurustherian", "yanmega",
        "zarude", "zoroarkhisui",
    },
    "NU": {
        "armarouge", "cetitan", "cloyster", "cresselia", "deoxysdefense",
        "feraligatr", "gallade", "gyarados", "ironthorns", "lilliganthisui",
        "lucario", "lycanrocdusk", "mew", "mienshao", "necrozma",
        "oricoriopompom", "oricoriosensu", "politoed", "porygonz",
        "regidrago", "suicune",
    },
    "PU": {
        "dragalge", "drednaw", "duraludon", "flamigo", "indeedee",
        "inteleon", "oricoriopompom", "raikou", "scyther", "torterra",
    },
    "ZU": {
        "alcremie", "articunogalar", "bruxish", "delphox", "dudunsparce",
        "electrodehisui", "emboar", "hariyama", "kingdra", "oricoriosensu",
        "porygon2", "tornadus", "uxie",
    },
}


def usage_tier_name(type_: str, tier: str) -> str:
    """reports.ts:532-538."""
    if type_ == "doubles" and tier == "DOU":
        return "doublesou"
    if type_ == "doubles" and tier == "DUU":
        return "doublesuu"
    if type_ == "nationaldex" and tier == "OU":
        return "nationaldex"
    if type_ == "nationaldex" and tier == "UU":
        return "nationaldexuu"
    return to_id_py(tier)


def parse_usage_report(text: str):
    """reports.ts:791-805 — returns (usage {id: frac}, battles,
    names {id: display})."""
    lines = text.split("\n")
    battles = float(lines[0][16:])     # Number(lines[0].slice(16))
    usage: dict[str, float] = {}
    names: dict[str, str] = {}
    for line in lines[5:]:
        parts = line.split("|")
        if len(parts) < 3:
            break
        name = parts[2][1:].strip()
        pct = float(parts[3][1:parts[3].index("%")]) / 100
        sid = to_id_py(name)
        usage[sid] = pct
        names[sid] = name
    return usage, battles, names


def load_combined(type_: str):
    """reports.ts:423-456 — per-species combined usage across months ×
    suffixes (battle-count weighted within a month, averaged over the
    requested month count) plus the per-rung title baselines and the
    id→display-name map harvested from the report rows."""
    cutoffs = {t: 0 for t in USAGE_TIERS[type_]}
    pokemon: dict[str, dict[str, float]] = {}
    names: dict[str, str] = {}
    for month in MONTHS:
        for tier in USAGE_TIERS[type_]:
            n: dict[str, float] = {}
            u: dict[str, dict[str, float]] = {}
            ntot = 0.0
            for suffix in SUFFIXES:
                fmt = f"{usage_tier_name(type_, tier)}{suffix}"
                # integration.ts:92 — ou/doublesou read at 1695
                baseline = 1695 if fmt in ("ou", "doublesou") else 1630
                path = os.path.join(TESTDATA, month,
                                    f"gen9{fmt}-{baseline}.txt")
                if not os.path.exists(path):
                    continue
                with open(path, encoding="utf-8") as f:
                    usage, battles, nm = parse_usage_report(f.read())
                cutoffs[tier] = baseline
                u[suffix], n[suffix] = usage, battles
                ntot += battles
                names.update(nm)
            for suffix in u:
                for sid, frac in u[suffix].items():
                    v = pokemon.setdefault(
                        sid, {t: 0.0 for t in USAGE_TIERS[type_]})
                    if sid != "empty":
                        v[tier] += ((n[suffix] / ntot) * frac) / len(MONTHS)
    return cutoffs, pokemon, names


@lru_cache(maxsize=1)
def _tiers_json() -> dict:
    with open(os.path.join(TESTDATA, "tiers.json"), encoding="utf-8") as f:
        return json.load(f)


def current_tiers_for(type_: str):
    """updateTiers' current-tier normalization (reports.ts:550-576)
    over the vendored tiers.json (integration.ts override()).

    Returns (current {id: normalized tier}, nfe set).  CAP species are
    skipped: for singles/doubles the reference skips them via
    ``species.isNonstandard`` (reports.ts:556-557); for nationaldex
    they normalize to the floor with no possible usage entry, so they
    keep the floor and emit nothing — output-equivalent."""
    data = _tiers_json()
    attr = {"doubles": "doublesTier",
            "nationaldex": "natDexTier"}.get(type_, "tier")
    base = {sid: t for t, ids in data["tier"].items() for sid in ids}
    of_type = {sid: t for t, ids in data[attr].items() for sid in ids}
    doubles = type_ == "doubles"
    tlist = TIERS_LIST[type_]
    current: dict[str, str] = {}
    nfe: set[str] = set()
    for sid in sorted(set(base) | set(of_type)):
        # species.doublesTier ?? species.tier (reports.ts:552-554)
        tier = of_type.get(sid, base.get(sid))
        if (sid in SKIP or not tier or tier in ("Illegal", "Unreleased")
                or tier.startswith("CAP")):
            continue
        if doubles:
            if tier[0] == "(":
                tier = "DNU"   # reference bug kept: every paren → DNU
            if tier in ("NFE", "LC", "LC Uber"):
                nfe.add(sid)
            tier = tier if tier in tlist else "DNU"
        else:
            if tier[0] == "(" and tier[1] != "P":
                tier = tier[1:-1]
            if tier[0] == "(" and tier[1] == "P":
                tier = "ZU"
            if tier in ("NFE", "LC", "LC Uber"):
                nfe.add(sid)
            tier = tier if tier in tlist else "ZU"
        current[sid] = tier
    return current, nfe


def ladder_config(type_: str) -> tiers.LadderConfig:
    """The riseAndDrop call chains (reports.ts:598-607) as a
    LadderConfig.  nationaldex walks the FULL singles ladder but only
    OU/UU have usage reports — rungs RU..PU get usage_key None (JS
    ``update[tier]`` is undefined there: residents stay put)."""
    if type_ == "doubles":
        return tiers.LadderConfig(
            ladder=(("DOU", "DOU", None), ("DUU", "DUU", None)),
            floor="DNU", floor_ban=None, uber="DUber",
            tier_order=TIERS_LIST["doubles"])
    reported = set(USAGE_TIERS[type_])
    ladder = tuple((t if t in reported else None, t, ban)
                   for t, ban in (("OU", None), ("UU", "UUBL"),
                                  ("RU", "RUBL"), ("NU", "NUBL"),
                                  ("PU", "PUBL")))
    return tiers.LadderConfig(ladder=ladder, floor="ZU", floor_ban="ZUBL",
                              uber="Uber", tier_order=TIERS_LIST[type_])


def make_table(pairs, type_: str, tier: str, cutoff: int,
               names: dict[str, str]) -> str:
    """reports.ts:758-784."""
    prefix = "National Dex " if type_ == "nationaldex" else ""
    title = f"{prefix}{tier} ({cutoff} stats)"
    s = f"[HIDE={title}][CODE]\n"
    s += f"Combined usage for {title}\n"
    s += " + ---- + ------------------ + ------- + \n"
    s += " | Rank | Pokemon            | Percent | \n"
    s += " + ---- + ------------------ + ------- + \n"
    for i, (sid, usage) in enumerate(pairs):
        if usage < 0.001:
            break
        rank = str(i + 1).ljust(4)
        poke = names[sid].ljust(18)
        percent = f"{100 * usage:.3f}".rjust(6)
        s += f" | {rank} | {poke} | {percent}% |\n"
    s += " + ---- + ------------------ + ------- + \n"
    s += "[/CODE][/HIDE]\n"
    return s


_MEGA_SUFFIXES = ("megax", "megay", "mega", "primal")


def mega_base(sid: str) -> str | None:
    """Mega/Primal forme → base species id (reports.ts:494-496 uses
    species.forme/baseSpecies; ids encode both).  'yanmega' is the one
    species id that ends in 'mega' without being a forme."""
    if sid == "yanmega":
        return None
    for suf in _MEGA_SUFFIXES:
        if sid.endswith(suf):
            return sid[: -len(suf)]
    return None


def tier_update_report(spark, type_: str) -> str:
    """Reports.tierUpdateReport (reports.ts:414-509) for one type,
    with the ladder walk running through plans/tiers.py:tier_update."""
    cutoffs, pokemon, names = load_combined(type_)

    # per-rung combined tables (reports.ts:458-471)
    s = ""
    for tier in USAGE_TIERS[type_]:
        pairs = [(sid, v[tier]) for sid, v in pokemon.items()
                 if v[tier] > 0]
        pairs.sort(key=lambda p: (-p[1], p[0]))
        s += make_table(pairs, type_, tier, cutoffs[tier], names)
    s += "\n"

    if type_ == "littlecup":                     # reports.ts:476-484
        bl = sorted(sid for sid, v in pokemon.items()
                    if v["LC"] > tiers.DROP)
        return s + "[b]LC UU Banlist:[/b] " + ", ".join(
            names[sid] for sid in bl)

    current, nfe = current_tiers_for(type_)
    cfg = ladder_config(type_)
    rows = [(rung, sid, val) for sid, v in pokemon.items()
            for rung, val in v.items()]
    usage_df = spark.createDataFrame(
        rows, "format string, species string, usage double")
    res = tiers.tier_update(usage_df, spark, current=current,
                            floor_bl=(), config=cfg)
    updated = {r["species"]: r["updated_tier"] for r in res.collect()}

    # moved-from lines (reports.ts:488-506)
    rank = {t: i for i, t in enumerate(cfg.tier_order)}
    prefix = "ND" if type_ == "nationaldex" else ""
    for sid in sorted(current):
        tier = current[sid]
        if type_ != "doubles" and tier == "ZU" and sid in nfe:
            continue
        upd = updated[sid]
        if tier == upd:
            continue
        base = mega_base(sid)
        if base is not None:
            # skip if the base already sits in a higher tier; an
            # absent base indexes at -1 and also suppresses
            # (reports.ts:497-501 indexOf semantics)
            if rank.get(updated.get(base, ""), -1) < rank[upd]:
                continue
        s += f"{names[sid]} moved from {prefix}{tier} to {prefix}{upd}\n"
    return s


def golden(type_: str) -> str:
    path = os.path.join(TESTDATA, "update", UPDATE_FILES[type_])
    with open(path, encoding="utf-8") as f:
        return f.read()
