"""Plain-Python oracle: independent reimplementation of the reference's
aggregation pass (stats.ts updateTagged/updateStats/updateLeads/
updateEncounters/updateTeammates) over parsed battles.

Used by the golden tests to cross-check every Spark aggregate frame.
The FSM itself (parse_battle) is shared with the engine and validated
separately by hand-written unit cases in test_parser_units.py — the
oracle here independently re-derives all the *aggregation* and
*enrichment* math (stat calc, spreads, stalliness, weighting defaults)
in straight-line dict code.

Known deliberate divergence from the reference: the `stats` moveset map
accumulates a clean weighted sum; the reference reuses the spreads
map's previous value there (stats.ts:346-350), an order-dependent quirk
we do not reproduce.
"""

from __future__ import annotations

import math
from collections import defaultdict

from stats_spark.datagen import dims
from stats_spark.functions.weights import (WIN_RPR, LOSS_RPR, OUTCOME_RPRD,
                                           DEFAULT_RPR, DEFAULT_RPRD)
from stats_spark.operators.parse import (INVERSE_OUTCOMES, make_dims_payload,
                                         parse_battle, ParseError)

LOG3_LOG2 = math.log(3) / math.log(2)
STATS = ["hp", "atk", "def", "spa", "spd", "spe"]

# canonical-aware gate sets (twin of enrich.NON_*_FORMATS, duplicated
# here so the oracle stays pyspark-free)
_NON_SINGLES = (dims.NON_SINGLES_FORMATS
                | {dims.canonicalize_format(f)
                   for f in dims.NON_SINGLES_FORMATS})
_NON_6V6 = (dims.NON_6V6_FORMATS
            | {dims.canonicalize_format(f) for f in dims.NON_6V6_FORMATS})


def weighting(rpr, rprd, cutoff):
    if rprd > 100 and cutoff > 1500:
        return 0.0
    return (math.erf((rpr - cutoff) / rprd / math.sqrt(2.0)) + 1.0) / 2.0


def victory_chance(r1, d1, r2, d2):
    c = (3.0 * math.log(10.0) ** 2) / (400.0 * math.pi) ** 2
    d = d1 ** 2 + d2 ** 2
    return 1.0 / (1.0 + 10.0 ** ((r2 - r1) / 400.0 / math.sqrt(1.0 + c * d)))


def effective_rating(rpr, rprd, outcome):
    valid = rpr is not None and rprd is not None and rprd != 0 \
        and not (isinstance(rpr, float) and math.isnan(rpr)) \
        and not (isinstance(rprd, float) and math.isnan(rprd))
    if valid:
        return rpr, rprd, True
    if outcome == 1:
        return WIN_RPR, OUTCOME_RPRD, False
    if outcome == -1:
        return LOSS_RPR, OUTCOME_RPRD, False
    return DEFAULT_RPR, DEFAULT_RPRD, False


def nature_mult(stat, nature):
    plus, minus = dims.NATURES[nature]
    return 1.1 if plus == stat else 0.9 if minus == stat else 1.0


def calc_stat(stat, base, iv, ev, level, nature):
    core = math.floor((2 * base + iv + math.floor(ev / 4)) * level / 100)
    if stat == "hp":
        return 1 if base == 1 else core + level + 10
    return math.floor((core + 5) * nature_mult(stat, nature))


def stat_to_ev(stat, val, base, iv, level, nature):
    if stat == "hp":
        if base == 1:
            return 0
        return max(0, (math.ceil((val - level - 10) * 100 / level) - 2 * base - iv) * 4)
    n = nature_mult(stat, nature)
    return max(0, (math.ceil((math.ceil(val / n) - 5) * 100 / level) - 2 * base - iv) * 4)


def _base_stats(species):
    r = dims.species_dict()[species]
    return {s: r[f"base_{s}"] for s in STATS}


def mon_computed(mon):
    base = _base_stats(mon["species"])
    stats = {s: calc_stat(s, base[s], mon[f"iv_{s}"], mon[f"ev_{s}"],
                          mon["level"], mon["nature"]) for s in STATS}
    evs = [stat_to_ev(s, stats[s], base[s], mon[f"iv_{s}"], mon["level"],
                      mon["nature"]) for s in STATS]
    spread = f"{mon['nature'].capitalize()}:{'/'.join(str(e) for e in evs)}"
    stats_str = "/".join(str(stats[s]) for s in STATS)
    return stats, spread, stats_str


# ---------------------------------------------------------------------
# classifier oracle: a literal, CAPPED-counter port of classifier.ts
# (the Spark implementation uses uncapped indicator sums with threshold
# tests; this oracle implements the reference's capped walk exactly, so
# the golden tests double as a proof of the threshold equivalence)

def _tables():
    from stats_spark.operators.classifier import (derive_move_tables,
                                                  role_moves, weather_moves)
    return derive_move_tables(), role_moves(), weather_moves()


def _ability(mon):
    return dims.ABILITY_ATTRS.get(mon["ability"], ("neutral", set()))


def _item(mon):
    return dims.ITEM_ATTRS.get(mon["item"], (0.0, set()))


SLOW_NATURES = {"brave", "relaxed", "quiet", "sassy"}
TRAP_ROLES = ("meanlook", "block")


def _base_stall_value(species, stats, level):
    if species == "shedinja":
        return 0.0
    if species == "ditto":
        return LOG3_LOG2
    return -math.log(
        ((math.floor(2.0 * level + 10) / 250
          * max(stats["atk"], stats["spa"])
          / max(stats["def"], stats["spd"])) * 120 + 2) * 0.925
        / stats["hp"]) / math.log(2)


def _has_role(moves, R, role):
    return bool(moves & R.get(role, frozenset()))


def _moves_mod(mon, T, R):
    mv = set(mon["moves"])
    mod = 0.0
    for role, d in [("toxic", 1.0), ("spikes", 0.5), ("toxicspikes", 0.5),
                    ("willowisp", 0.5), ("psychoshift", 0.5),
                    ("healbell", 0.5), ("haze", 0.5), ("substitute", -0.5),
                    ("superfang", -0.5), ("trick", -0.5), ("endeavor", -1.0)]:
        if _has_role(mv, R, role):
            mod += d
    for table, d in [("recovery", 1.0), ("protection", 1.0),
                     ("phazing", 0.5), ("paralysis", 0.5),
                     ("confusion", 0.5), ("sleep", -0.5),
                     ("lesser_offensive", -0.5), ("greater_offensive", -1.0),
                     ("ohko", -1.0)]:
        if mv & T[table]:
            mod += d
    if _has_role(mv, R, "bellydrum"):
        mod -= 2.0
    elif _has_role(mv, R, "shellsmash"):
        mod -= 1.5
    elif mv & T["greater_setup"]:
        mod -= 1.0
    elif mv & T["lesser_setup"]:
        mod -= 0.5
    return mod


def classify_pokemon(mon, T, R, W):
    """classifyPokemon/classifyForme — classifier.ts:60-144."""
    mv = set(mon["moves"])
    acls, aflags = _ability(mon)
    imod, _iflags = _item(mon)

    mod = {"greater_off": -1.0, "lesser_off": -0.5,
           "lesser_def": 0.5, "greater_def": 1.0}.get(acls, 0.0)
    mod += imod
    mod += _moves_mod(mon, T, R)
    # combo rules — classifier.ts:124-137
    if "trapping" in aflags:
        mod -= 1.0
    elif any(_has_role(mv, R, r) for r in TRAP_ROLES):
        mod -= 0.5
    if "harvest" in aflags or _has_role(mv, R, "recycle"):
        mod += 1.0
    if ("weather_sand" in aflags or "weather_hail" in aflags
            or mv & (W.get("sand", frozenset()) | W.get("hail", frozenset()))):
        mod += 0.5

    stats, _, _ = mon_computed(mon)
    stall = _base_stall_value(mon["species"], stats, mon["level"])
    sd = dims.species_dict()[mon["species"]]
    if sd["is_mega"]:
        base_id = sd["base_species_id"]
        base_mon = dict(mon, species=base_id)
        bstats, _, _ = mon_computed(base_mon)
        stall = (stall + _base_stall_value(base_id, bstats,
                                           mon["level"])) / 2.0
    bias = (mon["ev_atk"] + mon["ev_spa"] - mon["ev_hp"]
            - mon["ev_def"] - mon["ev_spd"])
    return bias, stall + mod - LOG3_LOG2


def _tag(team, stalliness, T, R, W):
    """tag() — classifier.ts:203-393, capped counters verbatim."""
    weather = dict(rain=0, sun=0, sand=0, hail=0)
    s = dict(batonpass=0, tailwind=0, trickroom=0, slow=0, gravityMoves=0,
             gravity=0, voltturn=0, dragons=0, trappers=0, clearance=0,
             fear=0, choice=0, swagplay=0)
    possible_types = None
    for mon in team:
        sd = dims.species_dict()[mon["species"]]
        base = dims.species_dict()[sd["base_species_id"]]
        mv = set(mon["moves"])
        acls, aflags = _ability(mon)
        _imod, iflags = _item(mon)
        possible_types = (list(base["types"]) if possible_types is None
                          else [t for t in possible_types
                                if t in base["types"]])
        for w in ("rain", "sun", "sand", "hail"):
            if f"weather_{w}" in aflags:
                weather[w] += 2
                break
        for w in ("rain", "sun", "sand", "hail"):
            if weather[w] < 2 and mv & W.get(w, frozenset()):
                weather[w] += 2 if f"rock_{w}" in iflags else 1
        if (s["batonpass"] < 2 and _has_role(mv, R, "batonpass")
                and ("setup" in aflags or mv & T["baton_pass"])):
            s["batonpass"] += 1
        if s["tailwind"] < 2 and _has_role(mv, R, "tailwind"):
            s["tailwind"] += 1
        if _has_role(mv, R, "trickroom") and not _has_role(mv, R, "imprison"):
            s["trickroom"] += 1
        if (s["slow"] < 2 and mon["ev_spe"] < 5
                and (mon["nature"] in SLOW_NATURES
                     or base["base_spe"] <= 50)):
            s["slow"] += 1
        if s["gravity"] < 2 and _has_role(mv, R, "gravity"):
            s["gravity"] += 1
        if mv & T["gravity"]:
            s["gravityMoves"] += 1
        if ((s["voltturn"] < 3 and "voltturn" in iflags)
                or mv & dims.UTURN_MOVES):
            s["voltturn"] += 1
        if ((s["trappers"] < 3 and "trapping" in aflags)
                or any(_has_role(mv, R, r) for r in TRAP_ROLES)):
            s["trappers"] += 1
        if "dragon" in base["types"]:
            s["dragons"] += 1
        if ((s["clearance"] < 2 and "clearance" in aflags)
                or _has_role(mv, R, "rapidspin")):
            s["clearance"] += 1
        if (s["fear"] < 3 and ("sturdy" in aflags or "sash" in iflags)
                and _has_role(mv, R, "endeavor")):
            s["fear"] += 1
        if (s["choice"] < 4 and "klutz" not in aflags
                and "choice" in iflags):
            s["choice"] += 1
        if (s["swagplay"] < 2
                and (_has_role(mv, R, "foulplay")
                     or _has_role(mv, R, "swagger"))):
            s["swagplay"] += 1

    tags = set()
    for w in ("rain", "sun", "sand", "hail"):
        if weather[w] > 1:
            tags.add(w)
    if len(tags) == 4:
        tags.add("allweather")
    elif len(tags) > 1:
        tags.add("multiweather")
    elif len(tags) == 0:
        tags.add("weatherless")
    if s["batonpass"] > 1:
        tags.add("batonpass")
    if s["tailwind"] > 1:
        tags.add("tailwind")
    trickroom = s["trickroom"] > 2 or (s["trickroom"] > 1 and s["slow"] > 1)
    if trickroom:
        tags.add("trickroom")
        for w in ("rain", "sun", "sand", "hail"):
            if weather[w] > 1:
                tags.add(f"trick{w}")
    if s["gravity"] > 2 or (s["gravity"] > 1 and s["gravityMoves"] > 1):
        tags.add("gravity")
    if s["voltturn"] > 2 and s["batonpass"] < 2:
        tags.add("voltturn")
    if s["dragons"] > 1 and s["trappers"] > 0:
        tags.add("dragmag")
    if s["trappers"] > 2:
        tags.add("trapper")
    if s["fear"] > 2 and s["clearance"] > 1:
        tags.add("fear")
        if weather["sand"] > 1:
            tags.add("sandfear")
        if weather["hail"] > 1:
            tags.add("hailfear")
        if trickroom:
            tags.add("trickfear")
    if s["choice"] > 3:
        tags.add("choice")
    if s["swagplay"] > 1:
        tags.add("swagplay")
    if possible_types:
        tags.add("monotype")
        for t in possible_types:
            tags.add(f"mono{t}")
    single_weather = not (tags & {"multiweather", "allweather", "weatherless"})
    if stalliness <= -1:
        tags.add("hyperoffense")
        if single_weather:
            if "rain" in tags:
                tags.add("rainoffense")
            elif "sun" in tags:
                tags.add("sunoffense")
            elif "sand" in tags:
                tags.add("sandoffense")
            else:
                tags.add("hailoffense")
    elif stalliness < 0:
        tags.add("offense")
    elif stalliness < 1.0:
        tags.add("balance")
    elif stalliness < LOG3_LOG2:
        tags.add("semistall")
    else:
        tags.add("stall")
        if single_weather:
            if "rain" in tags:
                tags.add("rainstall")
            elif "sun" in tags:
                tags.add("sunstall")
            elif "sand" in tags:
                tags.add("sandstall")
            else:
                tags.add("hailstall")
    return sorted(tags)


def classify_team(team):
    """classifyTeam — classifier.ts:11-54."""
    T, R, W = _tables()
    bias = 0
    stals = []
    for mon in team:
        b, st = classify_pokemon(mon, T, R, W)
        bias += b
        stals.append(st)
    stall = sum(stals) / len(stals)
    return bias, stall, _tag(team, stall, T, R, W)


def parse_corpus(convs_pdf, turns_pdf):
    """Parse every conversation with the shared FSM; returns
    (battles, rejects)."""
    D = make_dims_payload()
    grouped = dict(list(turns_pdf.sort_values("turn_idx").groupby("conv_id")))
    battles, rejects = [], []
    for meta in convs_pdf.to_dict("records"):
        cid = meta["conv_id"]
        lines = grouped[cid]["text"].tolist() if cid in grouped else []
        try:
            battles.append(parse_battle(meta, lines, D))
        except ParseError as e:
            rejects.append((cid, str(e)))
    return battles, rejects


class OracleStats:
    """Accumulates the full Statistics tree the reference way."""

    def __init__(self, cutoffs=dims.DEFAULT_CUTOFFS):
        self.cutoffs = cutoffs
        dd = defaultdict
        self.usage = dd(lambda: dd(float))          # (f,c,species) -> counters
        self.usage_tagged = dd(lambda: dd(float))   # (f,c,tag,species)
        self.totals = dd(lambda: dd(float))         # (f,c) -> counters
        self.moveset = dd(lambda: [0.0, 0])         # (f,c,sp,section,key) -> [w, raw]
        self.teammates = dd(float)                  # (f,c,a,b) -> w
        self.encounters = dd(lambda: [0.0] * 13)    # (f,c,a,b) -> outcome vec
        self.leads = dd(lambda: dd(float))          # (f,c,species)
        self.battles = dd(int)                      # (f,c)
        self.metagame = dd(float)                   # (f,c,tag) -> w
        self.stalliness = dd(float)                 # (f,c,value) -> w
        self.unique = {}                            # (f,c,sp,player) -> [r,w,g]

    def update(self, battle):
        fmt = battle["format"]
        if not dims.accept_format(fmt):
            return
        # J5: accept on the raw name, then everything keys/gates by the
        # canonical name (workflows/smogon/stats.ts:124-130) — matching
        # build_frames' canonical routing
        fmt = dims.canonicalize_format(fmt)
        singles = fmt not in _NON_SINGLES
        short = (fmt not in _NON_6V6
                 and (battle["turns"] < 2 or (battle["turns"] < 3 and singles)))

        side_w = {}
        for side in ("p1", "p2"):
            outcome = (0 if battle["winner"] == "tie"
                       else 1 if battle["winner"] == side else -1)
            rpr, rprd, valid = effective_rating(
                battle[f"{side}_rpr"], battle[f"{side}_rprd"], outcome)
            # gxe requires a PRESENT rating, not a valid one (rprd==0
            # still yields a gxe) — stats.ts:141-143
            has_rating = (battle[f"{side}_rpr"] is not None
                          and battle[f"{side}_rprd"] is not None
                          and not (isinstance(battle[f"{side}_rpr"], float)
                                   and math.isnan(battle[f"{side}_rpr"])))
            gxe = (math.floor(100 * victory_chance(battle[f"{side}_rpr"],
                                                   battle[f"{side}_rprd"],
                                                   1500, 130) + 0.5)
                   if has_rating else None)
            ws = {c: weighting(rpr, rprd, c) for c in self.cutoffs}
            side_w[side] = ws
            team = battle[f"{side}_team"]
            bias, stall, tags = classify_team(team)
            win = outcome == 1
            player = battle[f"{side}_name"]
            for c in self.cutoffs:
                w = ws[c]
                key = (fmt, c)
                for mon in team:
                    if not short:
                        self.totals[key]["usage_raw"] += 1
                        self.totals[key]["usage_weighted"] += w
                        if win:
                            self.totals[key]["win_raw"] += 1
                            self.totals[key]["win_weighted"] += w
                        for t in tags:
                            self.metagame[(fmt, c, t)] += w
                        sbin = math.floor(stall / 1e-4 + 0.5) * 1e-4
                        self.stalliness[(fmt, c, sbin)] += w
                    self.totals[key]["raw_count"] += 1
                    sp = mon["species"]
                    u = self.usage[(fmt, c, sp)]
                    u["raw_count"] += 1
                    u["raw_weight"] += w
                    for t in ["total"] + tags:
                        ut = self.usage_tagged[(fmt, c, t, sp)]
                        ut["raw_count"] += 1
                        ut["raw_weight"] += w
                        if not short:
                            ut["usage_raw"] += 1
                            ut["usage_weighted"] += w
                            if mon["turns_out"] > 0:
                                ut["usage_real"] += 1
                            if win:
                                ut["win_raw"] += 1
                                ut["win_weighted"] += w
                    if valid:
                        u["saved_count"] += 1
                        u["saved_weight"] += w
                    uq = self.unique.setdefault((fmt, c, sp, player),
                                                [0, 0.0, None])
                    if gxe is not None:
                        uq[2] = gxe if uq[2] is None else max(uq[2], gxe)
                    stats, spread, stats_str = mon_computed(mon)
                    ability = ("illuminate" if mon["ability"] == "unknown"
                               else mon["ability"])
                    for section, k in ([("abilities", ability),
                                        ("items", mon["item"]),
                                        ("tera_types", mon["tera_type"]),
                                        ("happinesses", str(mon["happiness"])),
                                        ("spreads", spread),
                                        ("stats", stats_str)]
                                       + [("moves", m) for m in mon["moves"]]):
                        ms = self.moveset[(fmt, c, sp, section, k)]
                        ms[0] += w
                        ms[1] += 1
                    if not short:
                        u["usage_raw"] += 1
                        u["usage_weighted"] += w
                        real = 1 if mon["turns_out"] > 0 else 0
                        if real:
                            u["usage_real"] += 1
                            self.totals[key]["usage_real"] += 1
                            if win:
                                u["win_real"] += 1
                                self.totals[key]["win_real"] += 1
                        if win:
                            u["win_raw"] += 1
                            u["win_weighted"] += w
                        uq[0] |= real
                        uq[1] = max(uq[1], w)
                        # teammates (both directions)
                        for other in team:
                            if other["slot"] < mon["slot"]:
                                self.teammates[(fmt, c, sp, other["species"])] += w
                                self.teammates[(fmt, c, other["species"], sp)] += w

        if short:
            return
        leads_ok = (battle.get("lead_p1") not in (None, "empty")
                    and battle.get("lead_p2") not in (None, "empty"))
        for c in self.cutoffs:
            if singles:
                if not leads_ok:
                    continue
                for side in ("p1", "p2"):
                    lu = self.leads[(fmt, c, battle[f"lead_{side}"])]
                    lu["lead_raw"] += 1
                    lu["lead_real"] += 1
                    lu["lead_weighted"] += side_w[side][c]
                w = min(side_w["p1"][c], side_w["p2"][c])
                for m in battle["matchups"]:
                    a, b, o = m["a"], m["b"], m["outcome"]
                    self.encounters[(fmt, c, a, b)][o] += w
                    self.encounters[(fmt, c, b, a)][INVERSE_OUTCOMES[o]] += w
                self.battles[(fmt, c)] += 1
            else:
                self.battles[(fmt, c)] += 1


def run_oracle(convs_pdf, turns_pdf, cutoffs=dims.DEFAULT_CUTOFFS):
    battles, rejects = parse_corpus(convs_pdf, turns_pdf)
    o = OracleStats(cutoffs)
    for b in battles:
        o.update(b)
    return o, battles, rejects
