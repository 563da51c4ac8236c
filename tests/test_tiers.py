"""W10 tier rise/drop ladder unit tests (hand-built usage inputs) —
the full reference ladder: 4 rungs + floor, XBL stickiness checked in
riseAndDrop order (before the next rung's rise), the floor-only BL
override, mega-vs-base suppression and the n-weighted suffix-report
merge (reports.ts:414-509, 540-649)."""

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


def _update(spark, rows):
    usage = spark.createDataFrame(
        rows, "format string, species string, usage double")
    return tiers.tier_update(usage, spark).toPandas().set_index("species")


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
    return _update(spark, rows), by_tier


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
    """A rise is never BL-overridden — every riseAndDrop hit skips the
    override entirely (reports.ts:602-614)."""
    pdf, bt = result
    assert pdf.loc[bt["RU"][0]].updated_tier == "UU"


def test_rise_to_ru_third_rung(result):
    pdf, bt = result
    assert pdf.loc[bt["NU"][0]].updated_tier == "RU"


def test_ubers_never_moves(result):
    pdf, bt = result
    for s in bt.get("Ubers", []):
        assert pdf.loc[s].updated_tier == "Ubers"


def test_xbl_stickiness(result):
    """A species whose current tier is a ban tier stays there when it
    neither rises above the ban nor sits on a rung — reports.ts:644-647."""
    pdf, bt = result
    for ban in ("UUBL", "RUBL", "NUBL"):
        for s in bt.get(ban, []):
            assert pdf.loc[s].updated_tier == ban, (s, ban)
            assert not bool(pdf.loc[s].changed)


def test_xbl_blocks_rise_into_banned_rung(spark):
    """The ban-stick check sits BEFORE the next rung's rise check
    (riseAndDrop('OU','UU','UUBL') runs before riseAndDrop('UU',…)),
    so a UUBL species with huge UU usage still sticks at UUBL instead
    of rising into the rung it is banned from."""
    bt = _by_tier()
    if not bt.get("UUBL"):
        pytest.skip("no synthetic UUBL members")
    sp = bt["UUBL"][0]
    pdf = _update(spark, [("gen9uu", sp, 0.50)])
    assert pdf.loc[sp].updated_tier == "UUBL"
    # …but OU usage above RISE still lifts it clean past the ban
    pdf = _update(spark, [("gen9ou", sp, 0.50)])
    assert pdf.loc[sp].updated_tier == "OU"


def _update_inj(spark, rows, current, floor_bl):
    usage = spark.createDataFrame(
        rows, "format string, species string, usage double")
    return (tiers.tier_update(usage, spark, current=current,
                              floor_bl=floor_bl)
            .toPandas().set_index("species"))


def test_bl_override_floor_fallthrough(spark):
    """A floor species on the floor's BL list that appears in a report
    but doesn't rise falls through to the floor and is bumped to the
    floor's ban tier — reports.ts:609-614 (the only reachable override
    path).  The species must HAVE a usage entry: with none at all the
    reference keeps the current tier and never reaches the override
    (reports.ts:584-587)."""
    cur = {"blmon": tiers.FLOOR, "freemon": tiers.FLOOR}
    bl = frozenset({"blmon"})
    rows = [("gen9ou", "blmon", 0.0), ("gen9ou", "freemon", 0.0)]
    pdf = _update_inj(spark, rows, cur, bl)
    assert pdf.loc["blmon"].updated_tier == tiers.FLOOR_BAN
    assert pdf.loc["freemon"].updated_tier == tiers.FLOOR
    # a rise escapes the override (riseAndDrop hit → continue)
    pdf = _update_inj(spark, [("gen7ou", "blmon", 0.30)], cur, bl)
    assert pdf.loc["blmon"].updated_tier == "NU"


def test_bl_override_fires_in_synthetic_config(spark):
    """The driver corpus config itself exercises the override: at
    least one floor-BL member sits on the floor and lands in
    FLOOR_BAN when it appears in a report without rising."""
    cur = tiers.current_tiers()
    bl = tiers.bl_sets().get(tiers.FLOOR_BAN, frozenset())
    members = sorted(s for s in bl if cur.get(s) == tiers.FLOOR)
    assert members, "floor overlay must give the override a subject"
    pdf = _update(spark, [("gen9ou", members[0], 0.001)])
    assert pdf.loc[members[0]].updated_tier == tiers.FLOOR_BAN


def test_drop_to_floor_not_overridden(spark):
    """A species DROPPING from the last rung onto the floor got there
    via a riseAndDrop hit, so the BL override must not fire even if
    the species is on the floor BL list."""
    cur = {"blmon": "NU"}
    bl = frozenset({"blmon"})
    pdf = _update_inj(spark, [("gen9ou", "blmon", 0.0)], cur, bl)
    assert pdf.loc["blmon"].updated_tier == tiers.FLOOR


def test_no_usage_keeps_current_tier(result):
    """A species absent from EVERY usage report keeps its current tier
    (reports.ts:584-587 `if (!update) { updated.set(id, tier);
    continue; }`) — zero usage drops a rung, NO usage does not."""
    pdf, bt = result
    idle = [s for s in bt.get("NU", []) if s in pdf.index][1:]
    assert idle and all(pdf.loc[s].updated_tier == "NU" for s in idle)
    assert not any(bool(pdf.loc[s].changed) for s in idle)


def test_zero_usage_drops_a_rung(spark):
    """…while an explicit zero-usage entry (the species appears in a
    report) DOES drop one rung: the JS entry is zero-initialized for
    every rung once any report mentions the species."""
    cur = {"idlemon": "NU"}
    pdf = _update_inj(spark, [("gen9ou", "idlemon", 0.0)], cur, ())
    assert pdf.loc["idlemon"].updated_tier == tiers.FLOOR


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


def test_tier_order_ranks_ban_above_rung():
    """TIERS interleaves each XBL ABOVE its rung (reports.ts:54-56) —
    the mega-vs-base comparison depends on this index order."""
    o = tiers.TIER_ORDER
    assert o.index("UUBL") < o.index("UU")
    assert o.index("RUBL") < o.index("RU")
    assert o.index("NUBL") < o.index("NU")
    assert o.index(tiers.FLOOR_BAN) < o.index(tiers.FLOOR)
    assert o.index("OU") < o.index("UUBL")


def test_suffix_merge(spark):
    """Suffixed formats merge into their base rung — reports.ts:426-431."""
    df = spark.createDataFrame(
        [("gen9ou",), ("gen9oususpecttest",), ("gen9oualpha",),
         ("gen9oubeta",), ("gen9uu",)], "format string")
    out = [r.b for r in df.select(
        tiers.strip_suffix("format").alias("b")).collect()]
    assert out == ["gen9ou", "gen9ou", "gen9ou", "gen9ou", "gen9uu"]


def _battle_row(conv_id, fmt, rpr, team1, team2):
    team = lambda sps: [{"species": s} for s in sps]  # noqa: E731
    return dict(conv_id=conv_id, format=fmt, day="2024-01-01", turns=20,
                winner="p1", ts=None, error=None,
                p1_name="a", p1_rpr=float(rpr), p1_rprd=25.0,
                p1_team=team(team1), lead_p1="x",
                p2_name="b", p2_rpr=float(rpr), p2_rprd=25.0,
                p2_team=team(team2), lead_p2="y")


def test_suffix_merge_n_weighted(spark):
    """The suffix merge weights each suffix report's usage FRACTION by
    its battle share (Σ_s (n_s/ntot)·frac_s — reports.ts:443-455), not
    by pooled raw weights.  With 3 base-format battles of all-X teams
    (frac_X = 6) and 1 suspecttest battle of X-vs-Y at a DIFFERENT
    rating level (frac_X = frac_Y = 3), the n-weighted result is
    exactly (3/4)·6 + (1/4)·3 = 5.25 — independent of the two weight
    levels — while pooling raw weights would shift it toward whichever
    suffix weighs more per battle."""
    rows = [
        _battle_row("c1", "gen9ou", 1900, ["x"] * 6, ["x"] * 6),
        _battle_row("c2", "gen9ou", 1900, ["x"] * 6, ["x"] * 6),
        _battle_row("c3", "gen9ou", 1900, ["x"] * 6, ["x"] * 6),
        _battle_row("c4", "gen9oususpecttest", 1640,
                    ["x"] * 6, ["y"] * 6),
    ]
    schema = ("conv_id string, format string, day string, turns int, "
              "winner string, ts timestamp, error string, "
              "p1_name string, p1_rpr double, p1_rprd double, "
              "p1_team array<struct<species:string>>, lead_p1 string, "
              "p2_name string, p2_rpr double, p2_rprd double, "
              "p2_team array<struct<species:string>>, lead_p2 string")
    battles = spark.createDataFrame(rows, schema)
    monthly = tiers.monthly_usage(battles, cutoff=1630, n_months=1)
    got = {r.species: r.usage_frac for r in monthly.collect()}
    assert got["x"] == pytest.approx(0.75 * 6 + 0.25 * 3, abs=1e-9)
    assert got["y"] == pytest.approx(0.25 * 3, abs=1e-9)


def test_changed_lines(spark):
    usage = spark.createDataFrame(
        [("gen9ou", "nobody", 0.0)], "format string, species string, usage double")
    res = tiers.tier_update(usage, spark)
    lines = tiers.tier_update_lines(res)
    assert all(" moved from " in ln for ln in lines)
