"""W10 tier rise/drop ladder unit tests (hand-built usage inputs)."""

import pytest

from stats_spark.datagen import dims
from stats_spark.plans import tiers


@pytest.fixture(scope="module")
def result(spark):
    sp = dims.species_table()
    by_tier = {t: list(sp[sp.tier == t].species_id) for t in
               ["OU", "UU", "RU", "NU", "Ubers"]}
    rows = [
        # UU-tier species with huge OU usage → rises to OU
        ("gen9ou", by_tier["UU"][0], 0.30),
        # OU-tier species below DROP in OU → drops to UU
        ("gen9ou", by_tier["OU"][0], 0.001),
        # OU-tier species above DROP in OU → stays OU
        ("gen9ou", by_tier["OU"][1], 0.10),
        # RU-tier species with big UU usage → rises to UU
        ("gen9uu", by_tier["RU"][0], 0.20),
    ]
    usage = spark.createDataFrame(rows, "format string, species string, usage double")
    pdf = tiers.tier_update(usage, spark).toPandas().set_index("species")
    return pdf, by_tier


def test_rise_to_ou(result):
    pdf, bt = result
    assert pdf.loc[bt["UU"][0]].updated_tier == "OU"
    assert bool(pdf.loc[bt["UU"][0]].changed)


def test_drop_from_ou(result):
    pdf, bt = result
    assert pdf.loc[bt["OU"][0]].updated_tier == "UU"


def test_stay_ou(result):
    pdf, bt = result
    assert pdf.loc[bt["OU"][1]].updated_tier == "OU"
    assert not bool(pdf.loc[bt["OU"][1]].changed)


def test_rise_to_uu(result):
    pdf, bt = result
    assert pdf.loc[bt["RU"][0]].updated_tier == "UU"


def test_ubers_never_moves(result):
    pdf, bt = result
    for s in bt["Ubers"]:
        assert pdf.loc[s].updated_tier == "Ubers"


def test_floor_default(result):
    pdf, bt = result
    # an NU species with no usage anywhere lands on the floor tier
    idle = [s for s in bt["NU"] if s in pdf.index]
    assert idle and all(pdf.loc[s].updated_tier == tiers.FLOOR for s in idle)


def test_changed_lines(spark, result):
    usage = spark.createDataFrame(
        [("gen9ou", "nobody", 0.0)], "format string, species string, usage double")
    res = tiers.tier_update(usage, spark)
    lines = tiers.tier_update_lines(res)
    assert all(" moved from " in ln for ln in lines)
