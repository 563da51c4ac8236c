"""Display.fromReports + the four legacy ASCII report parsers — the
reference's own inline fixtures (display.test.ts:1-286), expectation
for expectation.  Pure driver-side code: no Spark session needed."""

import json

import pytest

from stats_spark.plans import report_parsers as RP

OLD_USAGE = "\n".join([
    " Total battles: 218",
    " Avg. weight/team: 1.0",
    " + ---- + ------------------ + --------- + ------ + ------- + ------ + ------- + ",
    " | Rank | Pokemon            | Usage %   | Raw    | %       | Real   | %       | ",
    " + ---- + ------------------ + --------- + ------ + ------- + ------ + ------- + ",
    " | 1    | Greninja           | 16.51376% | 72     | 16.514% | 49     | 18.980% | ",
    " | 2    | Incineroar         | 14.22018% | 62     | 14.220% | 38     | 14.719% | ",
])

NEW_USAGE = "\n".join([
    "Total battles: 423",
    "Avg. weight/team: 1.000",
    "+ ---- + ------------------ + --------- + ------ + ------- + ------ + ------- +",
    "| Rank | Pokemon            | Usage %   | Raw    | %       | Real   | %       |",
    "+ ---- + ------------------ + --------- + ------ + ------- + ------ + ------- +",
    "| 1    | Rillaboom          | 16.78487% | 142    | 16.785% | 0      |  0.000% |",
    "| 2    | Incineroar         | 16.19385% | 137    | 16.194% | 0      |  0.000% |",
])

OLD_LEADS = "\n".join([
    " Total leads: 6",
    " + ---- + ------------------ + --------- + ------ + ------- + ",
    " | Rank | Pokemon            | Usage %   | Raw    | %       | ",
    " + ---- + ------------------ + --------- + ------ + ------- + ",
    " | 1    | Ogerpon            | 16.66667% | 1      | 16.667% | ",
])

NEW_LEADS = "\n".join([
    "Total leads: 6",
    "+ ---- + ------------------ + --------- + ------ + ------- +",
    "| Rank | Pokemon            | Usage %   | Raw    | %       |",
    "+ ---- + ------------------ + --------- + ------ + ------- +",
    "| 1    | Ogerpon            | 16.66667% | 1      | 16.667% |",
])

OLD_METAGAME = "\n".join([
    " weatherless...................84.96715%",
    " offense.......................38.05594%",
    " balance.......................30.04767%",
    " hyperoffense..................13.71165%",
    " trickroom..................... 0.49318%",
    "",
    " Stalliness (mean:  0.108)",
    " -1.0|##",
    "     |###",
    " -0.5|####",
    "     |#####",
    "  0.0|######",
    " more negative = more offensive, more positive = more stall",
    " one # =  0.35%",
])

NEW_METAGAME = "\n".join([
    "weatherless.......88.37742%",
    "offense...........36.34664%",
    "balance...........36.40463%",
    "hyperoffense......10.25606%",
    "trickroom.........0.54911%",
    "",
    "Stalliness (mean: 0.189)",
    "    |",
    "-1.0|##",
    "    |###",
    "-0.5|####",
    "    |#####",
    " 0.0|######",
    "more negative = more offensive, more positive = more stall",
    "one # = 0.42%",
])

OLD_MOVESET = "\n".join([
    " +---+",
    " | Snorlax  |",
    " +---+",
    " | Raw count: 2  |",
    " | Avg. weight: 0.75  |",
    " +---+",
    " +---+",
    " +---+",
    " +---+",
    " +---+",
    " +---+",
    " +---+",
    " | Checks and Counters |",
    " | Tauros 1.0 (1.00±0.00) |",
    " |  (50.0% KOed / 25.0% switched out) |",
])

NEW_MOVESET = "\n".join([
    "+---+",
    "| Snorlax  |",
    "+---+",
    "| Raw count: 2  |",
    "| Avg. weight: 0.75  |",
    "+---+",
    "+---+",
    "+---+",
    "+---+",
    "+---+",
    "+---+",
    "+---+",
    "| Checks and Counters |",
    "| Tauros 1.0 (1.00±0.00) |",
    "|\t(50.0% KOed / 25.0% switched out)",
])


def test_parse_usage_report_old():
    r = RP.parse_usage_report(OLD_USAGE)
    assert r["battles"] == 218
    assert r["avg"] == 1.0
    g = r["usage"]["greninja"]
    assert g["weightedp"] == pytest.approx(0.1651376)
    assert g["raw"] == 72
    assert g["rawp"] == pytest.approx(0.16514)
    assert g["real"] == 49
    assert g["realp"] == pytest.approx(0.1898)


def test_parse_usage_report_new():
    r = RP.parse_usage_report(NEW_USAGE)
    assert r["battles"] == 423
    assert r["avg"] == 1.0
    g = r["usage"]["rillaboom"]
    assert g["weightedp"] == pytest.approx(0.1678487)
    assert g["raw"] == 142
    assert g["rawp"] == pytest.approx(0.16785)
    assert g["real"] == 0
    assert g["realp"] == 0


@pytest.mark.parametrize("fixture", [OLD_LEADS, NEW_LEADS])
def test_parse_leads_report(fixture):
    r = RP.parse_leads_report(fixture)
    assert r["total"] == 6
    o = r["usage"]["ogerpon"]
    assert o["weightedp"] == pytest.approx(0.1666667)
    assert o["raw"] == 1
    assert o["rawp"] == pytest.approx(0.16667)


def test_parse_metagame_report_old():
    r = RP.parse_metagame_report(OLD_METAGAME)
    assert list(r["tags"]) == ["weatherless", "offense", "balance",
                              "hyperoffense", "trickroom"]
    assert r["tags"]["weatherless"] == pytest.approx(0.8496715)
    assert r["tags"]["offense"] == pytest.approx(0.3805594)
    assert r["mean"] == pytest.approx(0.108)
    # 5 bars, bins inferred from the labelled axis rows at step 0.25
    assert [b for b, _n in r["histogram"]] == pytest.approx(
        [-1.0, -0.75, -0.5, -0.25, 0.0])
    assert [n for _b, n in r["histogram"]] == [2, 3, 4, 5, 6]
    assert r["legend"] == pytest.approx(0.0035)


def test_parse_metagame_report_new():
    r = RP.parse_metagame_report(NEW_METAGAME)
    assert list(r["tags"]) == ["weatherless", "offense", "balance",
                              "hyperoffense", "trickroom"]
    assert r["tags"]["weatherless"] == pytest.approx(0.8837742)
    assert r["tags"]["balance"] == pytest.approx(0.3640463)
    assert r["mean"] == pytest.approx(0.189)
    # blank leading axis row: start back-solved to -1.25
    assert [b for b, _n in r["histogram"]] == pytest.approx(
        [-1.25, -1.0, -0.75, -0.5, -0.25, 0.0])
    assert [n for _b, n in r["histogram"]] == [0, 2, 3, 4, 5, 6]
    assert r["legend"] == pytest.approx(0.0042)


@pytest.mark.parametrize("fixture", [OLD_MOVESET, NEW_MOVESET])
def test_partial_parse_moveset_report(fixture):
    r = RP.partial_parse_moveset_report(fixture)
    assert list(r) == ["Snorlax"]
    assert r["Snorlax"]["weight"] == pytest.approx(0.75)
    out = r["Snorlax"]["outcomes"]["Tauros"]
    assert out["koedn"] == pytest.approx(0.5)
    assert out["switchedn"] == pytest.approx(0.25)


def test_moveset_weight_ge_1():
    r = RP.partial_parse_moveset_report(
        OLD_MOVESET.replace("Avg. weight: 0.75", "Avg. weight: 1.5"))
    assert r["Snorlax"]["weight"] == pytest.approx(1.5)


# --- Display.fromReports (display.test.ts:219-286) --------------------

MOVESETS = "\n".join([
    " +---+",
    " | Snorlax  |",
    " +---+",
    " | Raw count: 2  |",
    " | Avg. weight: 1.0  |",
    " +---+",
    " +---+",
    " +---+",
    " +---+",
    " +---+",
    " +---+",
    " +---+",
    " | Checks and Counters |",
    " | Tauros 1.0 (1.00±0.00) |",
    " |  (100.0% KOed / 0.0% switched out) |",
])

USAGE_REPORT = "\n".join([
    " Total battles: 1",
    " Avg. weight/team: 1.0",
    " + ---- + ------------------ + --------- + ------ + ------- + ------ + ------- + ",
    " | Rank | Pokemon            | Usage %   | Raw    | %       | Real   | %       | ",
    " + ---- + ------------------ + --------- + ------ + ------- + ------ + ------- + ",
    " | 1    | Snorlax            | 100.0000% | 2      | 100.000%| 2      | 100.000%| ",
])

BASE_POKEMON = {
    "Raw count": 2,
    "usage": 1.0,
    "Viability Ceiling": [2, 89, 89, 89],
    "Abilities": {"illuminate": 2},
    "Items": {"nothing": 2},
    "Tera Types": {"nothing": 2},
    "Spreads": {"Serious:252/252/252/252/252/252": 2},
    "Moves": {"bodyslam": 2},
    "Teammates": {},
}

BASE_INFO = {
    "metagame": "gen1ou", "cutoff": 0, "cutoff deviation": 0,
    "team type": None, "number of battles": 1,
}


@pytest.mark.parametrize("cnc", [
    {"Tauros": [1, 1.0, 0.0]},           # old: [n, p, d] array
    {"Tauros": {"n": 1, "p": 1.0, "d": 0.0}},  # new (2026-03) object
])
def test_from_reports_checks_and_counters(cnc):
    detailed = json.dumps({
        "info": BASE_INFO,
        "data": {"Snorlax": {**BASE_POKEMON, "Checks and Counters": cnc}},
    })
    result = RP.from_reports(USAGE_REPORT, MOVESETS, detailed)
    assert result["pokemon"]["Snorlax"]["counters"] == {"Tauros": [1, 1, 0]}
    assert result["battles"] == 1
    assert result["pokemon"]["Snorlax"]["usage"] == dict(
        raw=1.0, real=1.0, weighted=1.0)
    assert result["pokemon"]["Snorlax"]["moves"] == {"bodyslam": 1.0}
    assert result["pokemon"]["Snorlax"]["items"] == {"Nothing": 1.0}


def test_from_reports_metagame_and_leads():
    detailed = json.dumps({
        "info": BASE_INFO,
        "data": {"Snorlax": {**BASE_POKEMON,
                             "Checks and Counters": {}}},
    })
    leads = "\n".join([
        " Total leads: 6",
        " + ---- + ------------------ + --------- + ------ + ------- + ",
        " | Rank | Pokemon            | Usage %   | Raw    | %       | ",
        " + ---- + ------------------ + --------- + ------ + ------- + ",
        " | 1    | Snorlax            | 16.66667% | 1      | 16.667% | ",
    ])
    result = RP.from_reports(USAGE_REPORT, MOVESETS, detailed,
                             metagame_report=OLD_METAGAME,
                             leads_report=leads)
    snorlax = result["pokemon"]["Snorlax"]
    assert snorlax["lead"] == dict(raw=0.1667, real=0.1667,
                                   weighted=0.1667)
    mg = result["metagame"]
    assert list(mg["tags"]) == ["weatherless", "offense", "balance",
                               "hyperoffense", "trickroom"]
    assert mg["stalliness"]["mean"] == pytest.approx(0.108)
    # display.ts:284's ÷e rescale, reproduced verbatim
    assert mg["stalliness"]["total"] == pytest.approx(
        RP._R(20 / 2.718281828459045), abs=1e-4)
