"""Portable-SQL twin of the team classifier (operators/classifier.py)
for the DuckDB correctness oracle.

Generates a CTE chain producing one row per (conv_id, format, side)
with ``team_stalliness``, ``team_size``, ``turns`` and a ``tags`` LIST
column — the same classification the Spark engine computes with column
expressions, re-derived independently in SQL from the same dims config
(species base stats/types, move attribute tables, ability/item
classes).  Lets the driver hash-verify the metagame and tag-fan-out
queries instead of rows-only checks.
"""

from __future__ import annotations

from stats_spark.datagen import dims
from stats_spark.functions import sqlgen
from stats_spark.operators import classifier as C

LOG3_LOG2 = "1.5849625007211562"

STATS = ["hp", "atk", "def", "spa", "spd", "spe"]


def _lst(ids) -> str:
    return "[" + ", ".join(f"'{i}'" for i in sorted(ids)) + "]"


def _has(col: str, ids) -> str:
    if not ids:
        return "FALSE"
    return f"list_has_any({col}, {_lst(ids)})"


def _in(col: str, ids) -> str:
    if not ids:
        return "FALSE"
    return f"({col} IN ({', '.join(map(repr, sorted(ids)))}))"


def _nature_mult(stat: str) -> str:
    plus = sorted(n for n, (p, _m) in dims.NATURES.items() if p == stat)
    minus = sorted(n for n, (_p, m) in dims.NATURES.items() if m == stat)
    return (f"(CASE WHEN nature IN ({', '.join(map(repr, plus))}) THEN 1.1 "
            f"WHEN nature IN ({', '.join(map(repr, minus))}) THEN 0.9 "
            f"ELSE 1.0 END)")


def _stat(stat: str, b: str) -> str:
    core = (f"floor((2 * {b}_{stat} + iv_{stat} + floor(ev_{stat} / 4))"
            f" * level / 100)")
    if stat == "hp":
        return f"(CASE WHEN {b}_hp = 1 THEN 1 ELSE {core} + level + 10 END)"
    return f"floor(({core} + 5) * {_nature_mult(stat)})"


def _base_stall(prefix: str) -> str:
    """classifier.ts:146-161 twin over stat_{prefix}{s} columns."""
    p = prefix
    return (f"(-ln(((floor(2.0 * level + 10) / 250.0)"
            f" * greatest({p}atk, {p}spa) / greatest({p}def, {p}spd)"
            f" * 120.0 + 2.0) * 0.925 / {p}hp) / ln(2.0))")


def species_dims_values() -> str:
    """(species, 6 base stats, base_species, is_mega, types list)."""
    rows = []
    for r in dims.species_table().itertuples():
        types = "[" + ", ".join(f"'{t}'" for t in r.types) + "]"
        rows.append(
            f"('{r.species_id}', {r.base_hp}, {r.base_atk}, {r.base_def}, "
            f"{r.base_spa}, {r.base_spd}, {r.base_spe}, "
            f"'{r.base_species_id}', {str(bool(r.is_mega)).upper()}, "
            f"{types})")
    return ", ".join(rows)


def mods_sql() -> str:
    """Per-mon stalliness modifier expression (ability + item + moves +
    combos) — classifier.py ability/item/moves/combo twins."""
    A = C.ability_sets()
    T = C.derive_move_tables()
    R = C.role_moves()
    W = C.weather_moves()

    ability = (
        f"(CASE WHEN {_in('ability', A.get('greater_off', ()))} THEN -1.0 "
        f"WHEN {_in('ability', A.get('lesser_off', ()))} THEN -0.5 "
        f"WHEN {_in('ability', A.get('lesser_def', ()))} THEN 0.5 "
        f"WHEN {_in('ability', A.get('greater_def', ()))} THEN 1.0 "
        f"ELSE 0.0 END)")
    item_terms = []
    for iid, (mod, _fl) in sorted(dims.ITEM_ATTRS.items()):
        if mod:
            item_terms.append(f"WHEN item = '{iid}' THEN {mod}")
    item = f"(CASE {' '.join(item_terms)} ELSE 0.0 END)"

    terms = []
    for role, delta in [("toxic", 1.0), ("spikes", 0.5),
                        ("toxicspikes", 0.5), ("willowisp", 0.5),
                        ("psychoshift", 0.5), ("healbell", 0.5),
                        ("haze", 0.5), ("substitute", -0.5),
                        ("superfang", -0.5), ("trick", -0.5),
                        ("endeavor", -1.0)]:
        terms.append(f"(CASE WHEN {_has('moves', R.get(role, ()))} "
                     f"THEN {delta} ELSE 0.0 END)")
    for table, delta in [("recovery", 1.0), ("protection", 1.0),
                         ("phazing", 0.5), ("paralysis", 0.5),
                         ("confusion", 0.5), ("sleep", -0.5),
                         ("lesser_offensive", -0.5),
                         ("greater_offensive", -1.0), ("ohko", -1.0)]:
        terms.append(f"(CASE WHEN {_has('moves', T[table])} "
                     f"THEN {delta} ELSE 0.0 END)")
    setup = (f"(CASE WHEN {_has('moves', R.get('bellydrum', ()))} THEN -2.0 "
             f"WHEN {_has('moves', R.get('shellsmash', ()))} THEN -1.5 "
             f"WHEN {_has('moves', T['greater_setup'])} THEN -1.0 "
             f"WHEN {_has('moves', T['lesser_setup'])} THEN -0.5 "
             f"ELSE 0.0 END)")
    trap_moves = R.get("meanlook", frozenset()) | R.get("block", frozenset())
    trapping = (f"(CASE WHEN {_in('ability', A.get('flag_trapping', ()))} "
                f"THEN -1.0 WHEN {_has('moves', trap_moves)} THEN -0.5 "
                f"ELSE 0.0 END)")
    harvest = (f"(CASE WHEN {_in('ability', A.get('flag_harvest', ()))} "
               f"OR {_has('moves', R.get('recycle', ()))} THEN 1.0 "
               f"ELSE 0.0 END)")
    sand_hail_ab = (A.get("flag_weather_sand", frozenset())
                    | A.get("flag_weather_hail", frozenset()))
    sand_hail_mv = (W.get("sand", frozenset()) | W.get("hail", frozenset()))
    sand_hail = (f"(CASE WHEN {_in('ability', sand_hail_ab)} "
                 f"OR {_has('moves', sand_hail_mv)} THEN 0.5 ELSE 0.0 END)")
    return (" + ".join([ability, item] + terms
                       + [setup, trapping, harvest, sand_hail]))


def indicator_cols() -> str:
    """Per-mon tag indicator columns (classifier.mon_classifier_cols
    twins)."""
    A = C.ability_sets()
    I = C.item_sets()  # noqa: E741
    T = C.derive_move_tables()
    R = C.role_moves()
    W = C.weather_moves()
    has_role = lambda r: _has("moves", R.get(r, ()))  # noqa: E731

    cols = []
    for w in ("rain", "sun", "sand", "hail"):
        ability_pts = (f"(CASE WHEN "
                       f"{_in('ability', A.get(f'flag_weather_{w}', ()))} "
                       f"THEN 2 ELSE 0 END)")
        rock = _in("item", I.get(f"flag_rock_{w}", ()))
        move_pts = (f"(CASE WHEN {_has('moves', W.get(w, frozenset()))} "
                    f"THEN (CASE WHEN {rock} THEN 2 ELSE 1 END) "
                    f"ELSE 0 END)")
        cols.append(f"({ability_pts} + {move_pts}) AS w_{w}")

    ind = {
        "i_batonpass": (f"({has_role('batonpass')} AND "
                        f"({_in('ability', A.get('flag_setup', ()))} OR "
                        f"{_has('moves', T['baton_pass'])}))"),
        "i_tailwind": has_role("tailwind"),
        "i_trickroom": (f"({has_role('trickroom')} "
                        f"AND NOT {has_role('imprison')})"),
        "i_slow": (f"(ev_spe < 5 AND (nature IN ('brave', 'quiet', "
                   f"'relaxed', 'sassy') OR b2_spe <= 50))"),
        "i_gravity": has_role("gravity"),
        "i_gravity_moves": _has("moves", T["gravity"]),
        "i_voltturn": (f"({_in('item', I.get('flag_voltturn', ()))} OR "
                       f"{_has('moves', dims.UTURN_MOVES)})"),
        "i_trapper": (f"({_in('ability', A.get('flag_trapping', ()))} OR "
                      f"{_has('moves', R.get('meanlook', frozenset()) | R.get('block', frozenset()))})"),
        "i_dragon": "list_contains(base_types, 'dragon')",
        "i_clearance": (f"({_in('ability', A.get('flag_clearance', ()))} "
                        f"OR {has_role('rapidspin')})"),
        "i_fear": (f"(({_in('ability', A.get('flag_sturdy', ()))} OR "
                   f"{_in('item', I.get('flag_sash', ()))}) AND "
                   f"{has_role('endeavor')})"),
        "i_choice": (f"({_in('item', I.get('flag_choice', ()))} AND NOT "
                     f"{_in('ability', A.get('flag_klutz', ()))})"),
        "i_swagplay": f"({has_role('foulplay')} OR {has_role('swagger')})",
    }
    cols += [f"(CASE WHEN {expr} THEN 1 ELSE 0 END) AS {name}"
             for name, expr in ind.items()]
    return ", ".join(cols)


def tags_expr() -> str:
    """Side-level tags LIST from the aggregated indicator sums —
    classifier.classify_sides twin (over n_* / w_* columns)."""
    rain, sun = "(w_rain >= 2)", "(w_sun >= 2)"
    sand, hail = "(w_sand >= 2)", "(w_hail >= 2)"
    nw = (f"((CASE WHEN {rain} THEN 1 ELSE 0 END) + "
          f"(CASE WHEN {sun} THEN 1 ELSE 0 END) + "
          f"(CASE WHEN {sand} THEN 1 ELSE 0 END) + "
          f"(CASE WHEN {hail} THEN 1 ELSE 0 END))")
    trickroom = "(n_trickroom > 2 OR (n_trickroom > 1 AND n_slow >= 2))"
    fear = "(n_fear >= 3 AND n_clearance >= 2)"
    one_w = f"({nw} = 1)"
    stall = "team_stalliness"

    def t(cond, name):
        return f"(CASE WHEN {cond} THEN ['{name}'] ELSE [] END)"

    parts = [
        t(rain, "rain"), t(sun, "sun"), t(sand, "sand"), t(hail, "hail"),
        t(f"{nw} = 4", "allweather"),
        t(f"({nw} > 1 AND {nw} < 4)", "multiweather"),
        t(f"{nw} = 0", "weatherless"),
        t("n_batonpass >= 2", "batonpass"),
        t("n_tailwind >= 2", "tailwind"),
        t(trickroom, "trickroom"),
        t(f"({trickroom} AND {rain})", "trickrain"),
        t(f"({trickroom} AND {sun})", "tricksun"),
        t(f"({trickroom} AND {sand})", "tricksand"),
        t(f"({trickroom} AND {hail})", "trickhail"),
        t("(n_gravity >= 2 AND n_gravity_moves >= 2)", "gravity"),
        t("(n_voltturn >= 3 AND n_batonpass <= 1)", "voltturn"),
        t("(n_dragon >= 2 AND n_trapper >= 1)", "dragmag"),
        t("n_trapper >= 3", "trapper"),
        t(fear, "fear"),
        t(f"({fear} AND {sand})", "sandfear"),
        t(f"({fear} AND {hail})", "hailfear"),
        t(f"({fear} AND {trickroom})", "trickfear"),
        t("n_choice >= 4", "choice"),
        t("n_swagplay >= 2", "swagplay"),
        t(f"{stall} <= -1.0", "hyperoffense"),
        t(f"({stall} <= -1.0 AND {one_w} AND {rain})", "rainoffense"),
        t(f"({stall} <= -1.0 AND {one_w} AND {sun})", "sunoffense"),
        t(f"({stall} <= -1.0 AND {one_w} AND {sand})", "sandoffense"),
        t(f"({stall} <= -1.0 AND {one_w} AND {hail})", "hailoffense"),
        t(f"({stall} > -1.0 AND {stall} < 0.0)", "offense"),
        t(f"({stall} >= 0.0 AND {stall} < 1.0)", "balance"),
        t(f"({stall} >= 1.0 AND {stall} < {LOG3_LOG2})", "semistall"),
        t(f"{stall} >= {LOG3_LOG2}", "stall"),
        t(f"({stall} >= {LOG3_LOG2} AND {one_w} AND {rain})", "rainstall"),
        t(f"({stall} >= {LOG3_LOG2} AND {one_w} AND {sun})", "sunstall"),
        t(f"({stall} >= {LOG3_LOG2} AND {one_w} AND {sand})", "sandstall"),
        t(f"({stall} >= {LOG3_LOG2} AND {one_w} AND {hail})", "hailstall"),
    ]
    fixed = "flatten([" + ", ".join(parts) + "])"
    mono = ("(CASE WHEN len(shared_types) > 0 THEN "
            "flatten([['monotype'], "
            "list_transform(shared_types, t -> 'mono' || t)]) "
            "ELSE [] END)")
    return f"flatten([{fixed}, {mono}])"


def classified_sides_body(cv: str, rejects_cte: str, accepted: str,
                          mega_species_case, mega_ability_case) -> str:
    """The working CTE chain (see classified_sides_cte docstring)."""
    mods = mods_sql()
    ind = indicator_cols()
    stats_cur = ", ".join(f"{_stat(s, 'b')}::BIGINT AS stat_{s}"
                          for s in STATS)
    stats_base = ", ".join(f"{_stat(s, 'c')}::BIGINT AS bstat_{s}"
                           for s in STATS)
    ind_sums = ", ".join(
        f"sum({c}) AS n{c[1:]}" for c in
        ["i_batonpass", "i_tailwind", "i_trickroom", "i_slow", "i_gravity",
         "i_gravity_moves", "i_voltturn", "i_trapper", "i_dragon",
         "i_clearance", "i_fear", "i_choice", "i_swagplay"])
    w_sums = ", ".join(f"sum(w_{w}) AS w_{w}"
                       for w in ("rain", "sun", "sand", "hail"))
    return f"""{rejects_cte},
  csides AS (
    SELECT conv_id, format, turns,
           CASE WHEN winner = p1 THEN 1 WHEN winner = p2 THEN -1
                ELSE 0 END AS outcome,
           p1_rating_rpr AS rpr, p1_rating_rprd AS rprd,
           'p1' AS side, p1_team AS team
    FROM {cv} WHERE format IN {accepted}
      AND conv_id NOT IN (SELECT conv_id FROM rejects)
    UNION ALL
    SELECT conv_id, format, turns,
           CASE WHEN winner = p2 THEN 1 WHEN winner = p1 THEN -1
                ELSE 0 END,
           p2_rating_rpr, p2_rating_rprd, 'p2', p2_team
    FROM {cv} WHERE format IN {accepted}
      AND conv_id NOT IN (SELECT conv_id FROM rejects)),
  cmons0 AS (
    SELECT conv_id, format, turns, outcome, rpr, rprd, side,
           {mega_species_case('u.species', 'u.item')} AS species,
           {mega_ability_case('u.species', 'u.item', 'u.ability')} AS ability,
           u.item AS item, u.nature AS nature, u.moves AS moves,
           u.level AS level,
           u.ev_hp AS ev_hp, u.ev_atk AS ev_atk, u.ev_def AS ev_def,
           u.ev_spa AS ev_spa, u.ev_spd AS ev_spd, u.ev_spe AS ev_spe,
           u.iv_hp AS iv_hp, u.iv_atk AS iv_atk, u.iv_def AS iv_def,
           u.iv_spa AS iv_spa, u.iv_spd AS iv_spd, u.iv_spe AS iv_spe
    FROM (SELECT conv_id, format, turns, outcome, rpr, rprd, side,
                 unnest(team) AS u FROM csides)),
  cmonsb AS (
    SELECT m.*, d.b_hp, d.b_atk, d.b_def, d.b_spa, d.b_spd, d.b_spe,
           d.is_mega, d2.b_hp AS c_hp, d2.b_atk AS c_atk,
           d2.b_def AS c_def, d2.b_spa AS c_spa, d2.b_spd AS c_spd,
           d2.b_spe AS c_spe, d2.b_spe AS b2_spe,
           d2.types AS base_types
    FROM cmons0 m
    JOIN (VALUES {species_dims_values()})
      AS d(species_id, b_hp, b_atk, b_def, b_spa, b_spd, b_spe,
           base_species_id, is_mega, types)
      ON m.species = d.species_id
    JOIN (VALUES {species_dims_values()})
      AS d2(species_id, b_hp, b_atk, b_def, b_spa, b_spd, b_spe,
            base_species_id, is_mega, types)
      ON d.base_species_id = d2.species_id),
  cmonss AS (SELECT *, {stats_cur}, {stats_base} FROM cmonsb),
  cmonsf AS (
    SELECT *,
           (CASE WHEN is_mega
                 THEN ({_base_stall('stat_')} + {_base_stall('bstat_')}) / 2.0
                 ELSE {_base_stall('stat_')} END)
             + {mods} - {LOG3_LOG2} AS stalliness,
           {ind}
    FROM cmonss),
  cshared AS (
    SELECT conv_id, side, list(typ ORDER BY typ) AS shared_types
    FROM (
      SELECT conv_id, side, typ, count(*) AS c,
             max(team_size) AS team_size
      FROM (SELECT m.conv_id, m.side, unnest(m.base_types) AS typ,
                   t.team_size
            FROM cmonsf m JOIN (
              SELECT conv_id, side, count(*) AS team_size
              FROM cmonsf GROUP BY 1, 2) t
              ON m.conv_id = t.conv_id AND m.side = t.side)
      GROUP BY 1, 2, 3)
    WHERE c = team_size GROUP BY 1, 2),
  cagg AS (
    SELECT conv_id, format, side,
           max(turns) AS turns, max(outcome) AS outcome,
           max(rpr) AS rpr, max(rprd) AS rprd,
           count(*) AS team_size,
           avg(stalliness) AS team_stalliness,
           {w_sums}, {ind_sums}
    FROM cmonsf GROUP BY 1, 2, 3),
  side_class AS (
    SELECT g.*, {tags_expr()} AS tags
    FROM (SELECT cagg.*, coalesce(cs.shared_types, []) AS shared_types
          FROM cagg LEFT JOIN cshared cs
            ON cagg.conv_id = cs.conv_id AND cagg.side = cs.side) g)"""
