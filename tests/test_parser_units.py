"""FSM unit tests with hand-computed expectations — the analog of the
reference's parser tests (stats/src/test/parser.test.ts) plus dense
coverage of the matchup edge cases (parser.ts:121-272)."""

import pytest

from stats_spark.datagen import dims
from stats_spark.operators import parse as P


def _team(*species):
    return [dict(species=s, item="everlast", ability="thickhide",
                 nature="hardy", moves=["emberstrike"] * 4,
                 ev_hp=0, ev_atk=0, ev_def=0, ev_spa=0, ev_spd=0, ev_spe=0,
                 iv_hp=31, iv_atk=31, iv_def=31, iv_spa=31, iv_spd=31,
                 iv_spe=31, level=100, happiness=255, tera_type=None)
            for s in species]


@pytest.fixture(scope="module")
def D():
    return P.make_dims_payload()


@pytest.fixture(scope="module")
def six(D):
    sp = sorted(D["species"] - set(D["mega_formes"]))
    return sp


def meta_for(six, lines=None, **kw):
    m = dict(conv_id="battle-gen9ou-0", format="gen9ou", p1="alice", p2="bob",
             winner="alice", turns=5,
             p1_rating_rpr=1600.0, p1_rating_rprd=50.0,
             p2_rating_rpr=1500.0, p2_rating_rprd=60.0,
             p1_team=_team(*six[:6]), p2_team=_team(*six[6:12]),
             ts=None, day="2026-03-01")
    m.update(kw)
    return m


def disp(s):
    return s.capitalize()


def header(six):
    a, b = six[0], six[6]
    return [
        "|player|p1|alice", "|player|p2|bob", "|start",
        f"|switch|p1a: X|{disp(a)}, L100|100/100",
        f"|switch|p2a: Y|{disp(b)}, L100|100/100",
    ]


# ---- reject semantics (parser.test.ts:21-71 analog) -------------------

def test_no_turn_count(six, D):
    with pytest.raises(P.ParseError, match="No turn count"):
        P.parse_battle(meta_for(six, turns=None), [], D)


def test_two_winners(six, D):
    lines = header(six) + ["|win|alice", "|win|bob"]
    with pytest.raises(P.ParseError, match="two winners"):
        P.parse_battle(meta_for(six), lines, D)


def test_self_battle(six, D):
    with pytest.raises(P.ParseError, match="themself"):
        P.parse_battle(meta_for(six, p2="alice"), [], D)


def test_malformed_move(six, D):
    lines = header(six) + ["|turn|1", "|move|Bad"]
    with pytest.raises(P.ParseError, match="Could not parse"):
        P.parse_battle(meta_for(six), lines, D)


def test_malformed_switch(six, D):
    lines = header(six) + ["|turn|1", "|switch|Bad"]
    with pytest.raises(P.ParseError, match="Could not parse"):
        P.parse_battle(meta_for(six), lines, D)


def test_unknown_species(six, D):
    lines = header(six) + ["|turn|1", "|switch|p1a: X|Blorbo, L100|100/100"]
    with pytest.raises(P.ParseError, match="Unknown species"):
        P.parse_battle(meta_for(six), lines, D)


# ---- FSM semantics -----------------------------------------------------

def outcomes(battle):
    return [(m["a"], m["b"], m["outcome"]) for m in battle["matchups"]]


def test_clean_ko(six, D):
    """move → faint → replacement switch closes the matchup as KOED."""
    a, b, b2 = six[0], six[6], six[7]
    lines = header(six) + [
        "|turn|1",
        f"|move|p1a: X|Emberstrike|p2a: Y",
        "|faint|p2a: Y",
        f"|switch|p2a: Z|{disp(b2)}, L100|100/100",
        "|turn|2",
        "|win|alice",
    ]
    bt = P.parse_battle(meta_for(six), lines, D)
    assert outcomes(bt) == [(a, b, P.POKE2_KOED)]
    # kos counts times-KOed (the fainted side's mon) — parser.ts:161,253
    assert bt["p2_team"][0]["kos"] == 1
    assert bt["p1_team"][0]["kos"] == 0
    assert bt["p1_team"][0]["turns_out"] == 2
    assert bt["p2_team"][0]["turns_out"] == 1
    assert bt["p2_team"][1]["turns_out"] == 1
    assert bt["lead_p1"] == a and bt["lead_p2"] == b


def test_voluntary_switch(six, D):
    a, b, a2 = six[0], six[6], six[1]
    lines = header(six) + [
        "|turn|1",
        f"|switch|p1a: W|{disp(a2)}, L100|100/100",
        "|turn|2",
        "|win|alice",
    ]
    bt = P.parse_battle(meta_for(six), lines, D)
    assert outcomes(bt) == [(a, b, P.POKE1_SWITCHED_OUT)]
    assert bt["p1_team"][0]["kos"] == 0


def test_roar_forced_out(six, D):
    """phazing move forces the opponent out → FORCED_OUT."""
    a, b, b2 = six[0], six[6], six[7]
    roar_disp = disp(sorted(dims.ROAR_MOVES)[0])
    lines = header(six) + [
        "|turn|1",
        f"|move|p1a: X|{roar_disp}|p2a: Y",
        f"|drag|p2a: Z|{disp(b2)}, L100|100/100",
        "|turn|2",
        "|win|alice",
    ]
    bt = P.parse_battle(meta_for(six), lines, D)
    assert outcomes(bt) == [(a, b, P.POKE2_FORCED_OUT)]


def test_uturn_ko(six, D):
    """pivot move, mover switches, THEN the hit target faints:
    matchup review flags UTURN_KOED (parser.ts:216-236)."""
    a, b, a2 = six[0], six[6], six[1]
    uturn_disp = disp(sorted(dims.UTURN_MOVES)[0])
    b2 = six[7]
    lines = header(six) + [
        "|turn|1",
        f"|move|p1a: X|{uturn_disp}|p2a: Y",
        f"|switch|p1a: W|{disp(a2)}, L100|100/100",
        "|faint|p2a: Y",
        f"|switch|p2a: Z|{disp(b2)}, L100|100/100",
        "|turn|2",
        "|win|alice",
    ]
    bt = P.parse_battle(meta_for(six), lines, D)
    # first switch closes (a,b) as POKE1_SWITCHED_OUT; the faint after
    # sets ko+fodder? no — switch flag is on p1, faint on p2 → not
    # fodder; second switch reviews the matchup into POKE2_UTURN_KOED
    assert outcomes(bt) == [(a, b, P.POKE2_UTURN_KOED)]
    # review branch credits kos to the KOed side's active (parser.ts:232)
    assert bt["p2_team"][0]["kos"] == 1
    assert bt["p1_team"][0]["kos"] == 0


def test_double_switch(six, D):
    a, b, a2, b2 = six[0], six[6], six[1], six[7]
    lines = header(six) + [
        "|turn|1",
        f"|switch|p1a: W|{disp(a2)}, L100|100/100",
        f"|switch|p2a: Z|{disp(b2)}, L100|100/100",
        "|turn|2",
        "|win|alice",
    ]
    bt = P.parse_battle(meta_for(six), lines, D)
    assert outcomes(bt) == [(a, b, P.DOUBLE_SWITCH)]


def test_fodder_hazard(six, D):
    """switch-in dies before acting with hazard flag set → FODDERED."""
    a, b, b2, b3 = six[0], six[6], six[7], six[8]
    lines = header(six) + [
        "|turn|1",
        f"|switch|p2a: Z|{disp(b2)}, L100|100/100",   # closes (a,b) switch-out
        "|faint|p2a: Z",                                # fodder (switched then died)
        f"|switch|p2a: Q|{disp(b3)}, L100|100/100",
        "|turn|2",
        "|win|alice",
    ]
    bt = P.parse_battle(meta_for(six), lines, D)
    assert outcomes(bt) == [
        (a, b, P.POKE2_SWITCHED_OUT),
        (a, b2, P.POKE2_FODDERED),
    ]
    # foddered ≠ KO credit
    assert bt["p1_team"][0]["kos"] == 0


def test_ko_at_win_line(six, D):
    """faint with no replacement before |win| → closed at win
    (parser.ts:148-170)."""
    a, b = six[0], six[6]
    lines = header(six) + [
        "|turn|1",
        f"|move|p1a: X|Emberstrike|p2a: Y",
        "|faint|p2a: Y",
        "|win|alice",
    ]
    bt = P.parse_battle(meta_for(six), lines, D)
    assert outcomes(bt) == [(a, b, P.POKE2_KOED)]
    assert bt["p2_team"][0]["kos"] == 1


def test_tie(six, D):
    lines = header(six) + ["|turn|1", "|tie"]
    bt = P.parse_battle(meta_for(six, winner=""), lines, D)
    assert bt["winner"] == "tie"


def test_mega_canonicalization(six, D):
    """holding the matching stone rewrites species+ability (J3)."""
    base = sorted(D["mega"])[0]   # (species, item)
    team = _team(*six[:6])
    team[0]["species"] = base[0]
    team[0]["item"] = base[1]
    m = meta_for(six, p1_team=team)
    bt = P.parse_battle(m, [], D)
    assert bt["p1_team"][0]["species"] == D["mega"][base][0]
    assert bt["p1_team"][0]["ability"] == D["mega"][base][1]


def test_mega_identify_by_base_name(six, D):
    """|switch| details show the BASE species while the team holds the
    mega forme — identify's forme-reversal retry (parser.ts:381-391)."""
    (sp, item), (mega_sp, _) = sorted(D["mega"].items())[0]
    # exclude the base species and any prefix-colliding names from the
    # rest of the team so the forme-reversal retry is what resolves
    clean = [s for s in six if not s.startswith(sp) and not sp.startswith(s)]
    team = _team(sp, *clean[:5])
    team[0]["item"] = item
    six = [team[0]["species"]] + clean[:5] + clean[5:11]
    lines = [
        "|start",
        f"|switch|p1a: X|{disp(sp)}, L100|100/100",
        f"|switch|p2a: Y|{disp(six[6])}, L100|100/100",
        "|turn|1", "|turn|2", "|win|alice",
    ]
    bt = P.parse_battle(meta_for(six, p1_team=team), lines, D)
    assert bt["p1_team"][0]["species"] == mega_sp
    assert bt["p1_team"][0]["turns_out"] == 2


def test_alias_resolution(six, D):
    alias, target = sorted(D["aliases"].items())[0]
    team = _team(*six[:6])
    team[0]["species"] = alias
    bt = P.parse_battle(meta_for(six, p1_team=team), [], D)
    assert bt["p1_team"][0]["species"] == target


def test_defaults(six, D):
    team = _team(*six[:6])
    team[0].update(item="whatisthis", nature=None, ability="???",
                   happiness=None, tera_type=None)
    for k in list(team[0]):
        if k.startswith("iv_"):
            team[0][k] = None
    bt = P.parse_battle(meta_for(six, p1_team=team), [], D)
    mon = bt["p1_team"][0]
    assert mon["item"] == "nothing" and mon["nature"] == "hardy"
    assert mon["ability"] == "unknown" and mon["happiness"] == 255
    assert mon["tera_type"] == "nothing" and mon["iv_spe"] == 31
