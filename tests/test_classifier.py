"""Classifier unit tests — the analog of the reference's
classifier.test.ts:11-120 (derived category tables diffed against
expected sets) plus targeted tag-triggering teams compared between the
Spark column implementation and the capped-walk oracle."""

import pytest
from pyspark.sql import functions as F

from stats_spark.datagen import dims
from stats_spark.operators import classifier

from tests import oracle as O


def test_derived_tables_expected():
    """Every hand-assigned category/role move must land in exactly the
    intended derived table (classifier.test.ts-style diff)."""
    T = classifier.derive_move_tables()
    assert T["recovery"] == {"mendwound", "softglow", "rootsiphon"}
    assert T["protection"] == {"wardveil", "mirrorguard"}
    assert T["phazing"] == set(dims.ROAR_MOVES)
    assert T["sleep"] == {"dozeweave"}
    assert T["paralysis"] == {"staticweb"}
    assert T["ohko"] == {"wildlance"}
    assert T["confusion"] == {"twinbolt"}
    assert {"embercrush", "shadowsurge"} <= T["greater_offensive"]
    # setup split: multi-stage boosts are greater, single-stage lesser
    assert {"bladedance", "mindamp"} <= T["greater_setup"]
    assert {"ironfocus", "quickstep"} <= T["lesser_setup"]
    # shellsmash is excluded from greater setup by name (ts:535)
    assert "stonehowl" not in T["greater_setup"]
    # grounded hazards + low accuracy + ohko all feed the gravity table
    assert {"stonelance", "venomcrush", "wildlance", "dozeweave",
            "embergale"} <= T["gravity"]
    # self-boosting moves are baton-passable; bellydrum/substitute too
    assert {"bladedance", "quickstep", "shadowwave", "twinhowl"} \
        <= T["baton_pass"]
    # every derived table only contains known move ids
    universe = set(dims.moves_table().move_id)
    for name, tbl in T.items():
        assert tbl <= universe, name


def _default_species():
    sp = dims.species_table()
    return sp[~sp.is_mega].iloc[10].species_id


def _mk_mon(species=None, item="nothing", ability="unknown",
            nature="hardy", moves=None, ev_spe=0, level=100):
    species = species or _default_species()
    evs = dict(hp=0, atk=0, d=0, spa=0, spd=0)
    mon = dict(species=species, item=item, ability=ability, nature=nature,
               moves=(moves or ["emberbeam"]) + ["nothing"] * 4,
               level=level, happiness=255, tera_type="nothing",
               slot=0, turns_out=1, kos=0,
               ev_hp=0, ev_atk=252, ev_def=0, ev_spa=0, ev_spd=4,
               ev_spe=ev_spe)
    for k in ("hp", "atk", "def", "spa", "spd", "spe"):
        mon[f"iv_{k}"] = 31
    mon["moves"] = mon["moves"][:4]
    return mon


def _species_ids():
    sp = dims.species_table()
    return list(sp[~sp.is_mega].species_id)


def _team(mons):
    out = []
    for i, m in enumerate(mons):
        m = dict(m)
        m["slot"] = i
        out.append(m)
    return out


def _spark_tags(spark, team):
    """Run the team through the real enrich path and return its tags."""
    from stats_spark.operators import enrich
    row = dict(conv_id="c1", format="gen9ou", day="2026-03-01", turns=10,
               winner="p1", ts=None, p1_name="a", p2_name="b",
               p1_rpr=1500.0, p1_rprd=50.0, p2_rpr=1500.0, p2_rprd=50.0,
               p1_team=team, p2_team=team, lead_p1=None, lead_p2=None,
               error=None, matchups=[])
    from stats_spark.operators.parse import BATTLE_SCHEMA
    battles = spark.createDataFrame([row], BATTLE_SCHEMA)
    sides = enrich.with_effective_rating(enrich.sides_from_battles(battles))
    mons = enrich.enrich_mons(sides, spark)
    sc = classifier.classify_sides(mons)
    r = sc.filter("side = 'p1'").collect()[0]
    return sorted(r.tags), r.team_stalliness, r.team_bias


CASES = [
    # rain: 2 users of the rain move (wildwave)
    ("rain", [_mk_mon(moves=["wildwave"]), _mk_mon(moves=["wildwave"]),
              _mk_mon(), _mk_mon(), _mk_mon(), _mk_mon()]),
    # rain via setter ability (stormcall = drizzle analog, worth 2)
    ("rain", [_mk_mon(ability="stormcall"), _mk_mon(), _mk_mon(),
              _mk_mon(), _mk_mon(), _mk_mon()]),
    # choice: 4 choice items
    ("choice", [_mk_mon(item="everlast"), _mk_mon(item="focusband"),
                _mk_mon(item="glowdust"), _mk_mon(item="everlast"),
                _mk_mon(), _mk_mon()]),
    # voltturn: 3 pivots, no batonpass pair
    ("voltturn", [_mk_mon(moves=["dashback"]), _mk_mon(moves=["sparkswap"]),
                  _mk_mon(item="ejectbutton"), _mk_mon(), _mk_mon(),
                  _mk_mon()]),
    # trickroom: 3 trickroom users
    ("trickroom", [_mk_mon(moves=["gleamburst"]),
                   _mk_mon(moves=["gleamburst"]),
                   _mk_mon(moves=["gleamburst"]), _mk_mon(), _mk_mon(),
                   _mk_mon()]),
    # swagplay: 2 foulplay/swagger users
    ("swagplay", [_mk_mon(moves=["shadowfang", "twinbolt"]),
                  _mk_mon(moves=["twinbolt"]), _mk_mon(), _mk_mon(),
                  _mk_mon(), _mk_mon()]),
    # trapper: 3 trapping mons (ability or move)
    ("trapper", [_mk_mon(ability="nightveil"), _mk_mon(moves=["shadowgale"]),
                 _mk_mon(moves=["venomgale"]), _mk_mon(), _mk_mon(),
                 _mk_mon()]),
]


@pytest.mark.parametrize("tag,team", CASES, ids=[c[0] for c in CASES])
def test_tag_cases(spark, tag, team):
    team = _team(team)
    tags, stall, bias = _spark_tags(spark, team)
    obias, ostall, otags = O.classify_team(team)
    assert tags == otags, f"spark {tags} vs oracle {otags}"
    assert tag in tags
    assert stall == pytest.approx(ostall, rel=1e-9)
    assert bias == obias


def test_monotype_and_mega_averaging(spark):
    """Monotype over base-forme types; mega stalliness is the average of
    base and mega formes (C4)."""
    sp = dims.species_table()
    mega = sp[sp.is_mega].iloc[0]
    base = sp[sp.species_id == mega.base_species_id].iloc[0]
    t = base.types[0]
    mono_ids = [r.species_id for r in sp[~sp.is_mega].itertuples()
                if t in r.types][:6]
    if len(mono_ids) >= 6:
        team = _team([_mk_mon(species=s) for s in mono_ids])
        tags, stall, _ = _spark_tags(spark, team)
        _, ostall, otags = O.classify_team(team)
        assert tags == otags
        assert "monotype" in tags and f"mono{t}" in tags

    team = _team([_mk_mon(species=mega.species_id, ability="megapower")]
                 + [_mk_mon() for _ in range(5)])
    tags, stall, _ = _spark_tags(spark, team)
    _, ostall, otags = O.classify_team(team)
    assert stall == pytest.approx(ostall, rel=1e-9)
    assert tags == otags


def test_weatherless_default(spark):
    team = _team([_mk_mon() for _ in range(6)])
    tags, _, _ = _spark_tags(spark, team)
    _, _, otags = O.classify_team(team)
    assert tags == otags
    assert "weatherless" in tags


def test_stalliness_modifier_values():
    """Spot-check classifyForme modifier arithmetic against hand
    computation (classifier.ts:479-516)."""
    T, R, W = O._tables()
    mon = _mk_mon(moves=["venomsurge", "mendwound"])  # toxic+recovery
    base = _mk_mon()
    _, s_mod = O.classify_pokemon(mon, T, R, W)
    _, s_base = O.classify_pokemon(base, T, R, W)
    # +1.0 toxic role, +1.0 recovery table — all else identical
    assert s_mod - s_base == pytest.approx(2.0, abs=1e-9)
