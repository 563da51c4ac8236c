"""W10 tier rise/drop ladder unit tests (hand-built usage inputs) —
now covering the full reference ladder: 4 rungs + floor, XBL
stickiness, the BL-list override, mega-vs-base suppression and
suffix-report merging (reports.ts:414-509, 540-649)."""

import pytest

from stats_spark.datagen import dims
from stats_spark.plans import tiers


def _by_tier():
    cur = tiers.current_tiers()
    by = {}
    for s, t in cur.items():
        by.setdefault(t, []).append(s)
    for t in by:
        by[t].sort()
    return by


@pytest.fixture(scope="module")
def result(spark):
    by_tier = _by_tier()
    rows = [
        # UU-tier species with huge OU usage → rises to OU
        ("gen9ou", by_tier["UU"][0], 0.30),
        # OU-tier species below DROP in OU → drops to UU
        ("gen9ou", by_tier["OU"][0], 0.001),
        # OU-tier species above DROP in OU → stays OU
        ("gen9ou", by_tier["OU"][1], 0.10),
        # RU-tier species with big UU usage → rises to UU
        ("gen9uu", by_tier["RU"][0], 0.20),
        # NU-tier species with big RU-rung usage → rises to RU
        ("gen9monotype", by_tier["NU"][0], 0.20),
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
    assert pdf.loc[bt["OU"][0]].updated_tier == "UU" or \
        pdf.loc[bt["OU"][0]].updated_tier == "UUBL"


def test_stay_ou(result):
    pdf, bt = result
    assert pdf.loc[bt["OU"][1]].updated_tier == "OU"
    assert not bool(pdf.loc[bt["OU"][1]].changed)


def test_rise_to_uu(result):
    pdf, bt = result
    sp = bt["RU"][0]
    want = "UUBL" if sp in tiers.bl_sets().get("UUBL", ()) else "UU"
    assert pdf.loc[sp].updated_tier == want


def test_rise_to_ru_third_rung(result):
    pdf, bt = result
    sp = bt["NU"][0]
    want = "RUBL" if sp in tiers.bl_sets().get("RUBL", ()) else "RU"
    assert pdf.loc[sp].updated_tier == want


def test_ubers_never_moves(result):
    pdf, bt = result
    for s in bt.get("Ubers", []):
        assert pdf.loc[s].updated_tier == "Ubers"


def test_xbl_stickiness(result):
    """A species whose current tier is a ban tier stays there when it
    neither rises nor sits on a rung — reports.ts:644-647."""
    pdf, bt = result
    for ban in ("UUBL", "RUBL", "NUBL"):
        for s in bt.get(ban, []):
            assert pdf.loc[s].updated_tier == ban, (s, ban)
            assert not bool(pdf.loc[s].changed)


def test_bl_override(spark):
    """A species rising into tier T while on Reports.BL[TBL] lands in
    TBL — reports.ts:611-614."""
    bl = tiers.bl_sets()
    members = sorted(bl.get("UUBL", ()))
    if not members:
        pytest.skip("no synthetic UUBL members")
    sp = members[0]
    usage = spark.createDataFrame(
        [("gen9uu", sp, 0.30)], "format string, species string, usage double")
    pdf = tiers.tier_update(usage, spark).toPandas().set_index("species")
    # rises into UU but the BL override bumps it to UUBL (unless it
    # rose higher via OU, which this input rules out)
    assert pdf.loc[sp].updated_tier == "UUBL"


def test_floor_default(result):
    pdf, bt = result
    idle = [s for s in bt.get("NU", []) if s in pdf.index][1:]
    assert idle and all(pdf.loc[s].updated_tier == tiers.FLOOR for s in idle)


def test_mega_suppression(spark):
    """A mega forme's 'moved' line is suppressed when its base species
    sits in a strictly higher updated tier — reports.ts:493-504."""
    sp = dims.species_table()
    mega = sp[sp.is_mega].iloc[0]
    base, forme = mega.base_species_id, mega.species_id
    # base rises to OU; the mega would move to UU — line suppressed
    usage = spark.createDataFrame(
        [("gen9ou", base, 0.30), ("gen9uu", forme, 0.30)],
        "format string, species string, usage double")
    res = tiers.tier_update(usage, spark)
    lines = tiers.tier_update_lines(res)
    assert not any(ln.startswith(f"{forme} moved") for ln in lines)
    pdf = res.toPandas().set_index("species")
    if bool(pdf.loc[base].changed):
        assert any(ln.startswith(f"{base} moved") for ln in lines)


def test_suffix_merge(spark):
    """Suffixed formats merge into their base rung weighted by battle
    share — reports.ts:426-455."""
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [("gen9ou",), ("gen9oususpecttest",), ("gen9oualpha",),
         ("gen9oubeta",), ("gen9uu",)], "format string")
    out = [r.b for r in df.select(
        tiers.strip_suffix("format").alias("b")).collect()]
    assert out == ["gen9ou", "gen9ou", "gen9ou", "gen9ou", "gen9uu"]


def test_changed_lines(spark):
    usage = spark.createDataFrame(
        [("gen9ou", "nobody", 0.0)], "format string, species string, usage double")
    res = tiers.tier_update(usage, spark)
    lines = tiers.tier_update_lines(res)
    assert all(" moved from " in ln for ln in lines)
