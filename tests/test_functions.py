"""Unit tests for the scalar function library."""

import math

import numpy as np

from stats_spark.functions.erf import erf
from stats_spark.functions import weights as W
from stats_spark.functions.ids import to_id_py


def test_erf_matches_libm():
    xs = np.concatenate([np.linspace(-6, 6, 20001),
                         np.array([0.0, 0.46875, 4.0, 26.6, -26.6, 1e-300])])
    ref = np.array([math.erf(v) for v in xs])
    assert np.max(np.abs(erf(xs) - ref)) < 5e-16


def test_weighting_provisional_zero():
    # rd > 100 at cutoff > 1500 → weight 0 (util.ts:417)
    assert W.weighting_np(1700.0, 130.0, 1630.0) == 0.0
    assert W.weighting_np(1700.0, 130.0, 1500.0) > 0.0
    assert W.weighting_np(1700.0, 99.0, 1630.0) > 0.0


def test_weighting_cdf_shape():
    w = W.weighting_np(np.array([1500.0]), np.array([130.0]), np.array([1500.0]))
    assert w[0] == 0.5
    assert W.weighting_np(2000.0, 50.0, 1500.0) > 0.999


def test_effective_rating_defaults():
    rpr, rprd, valid = W.effective_rating_np(
        np.array([np.nan, 1650.0, np.nan]),
        np.array([np.nan, 40.0, np.nan]),
        np.array([1, 0, 0]))
    assert not valid[0] and valid[1] and not valid[2]
    assert rpr[0] == W.WIN_RPR and rprd[0] == W.OUTCOME_RPRD
    assert rpr[1] == 1650.0
    assert rpr[2] == W.DEFAULT_RPR and rprd[2] == W.DEFAULT_RPRD


def test_to_id():
    assert to_id_py("U-turn") == "uturn"
    assert to_id_py(" Mr. Mime 2 ") == "mrmime2"
    assert to_id_py(None) == ""


def test_gxe_half_up():
    # 50.5 rounds up like JS Math.round, not banker's
    assert W.gxe_np(1500.0, 130.0) == 50.0
    v = float(W.gxe_np(1504.0, 130.0))
    assert v == math.floor(100 * W.victory_chance_np(1504.0, 130.0, 1500.0, 130.0) + 0.5)


def test_canonicalize_format_rules():
    """J5 — every branch of util.ts:261-275, rule for rule."""
    from stats_spark.datagen.dims import canonicalize_format as c

    # *current strip (slice(0, -7))
    assert c("oucurrent") == "ou"
    assert c("uucurrent") == "uu"
    # pokebank* strip: slice(8, -4) removes the prefix AND a 4-char tail
    assert c("pokebankoubeta") == "ou"
    assert c("pokebankdoublesoubeta") == "doublesou"
    # oras* strip
    assert c("orasou") == "ou"
    assert c("orasuu") == "uu"
    # direct renames
    assert c("capbeta") == "cap"
    assert c("vgc2014beta") == "vgc2014"
    assert c("battlespotdoubles") == "vgc2015"
    assert c("battlespotdoublesvgc2015") == "vgc2015"
    assert c("smogondoubles") == "doublesou"
    assert c("smogondoublesubers") == "doublesubers"
    assert c("smogondoublesuu") == "doublesuu"
    # xybattlespot*beta strips only the beta suffix
    assert c("xybattlespotsinglesbeta") == "xybattlespotsingles"
    assert c("xybattlespotspecialbeta") == "xybattlespotspecial"
    # rule chaining: oras strip exposes the capbeta rename
    assert c("orascapbeta") == "cap"
    # modern names pass through untouched
    assert c("gen9ou") == "gen9ou"
    assert c("gen9doublesou") == "gen9doublesou"


def test_formats_table_carries_canonical_format():
    from stats_spark.datagen import dims

    t = dims.formats_table().set_index("format")["canonical_format"]
    assert t["smogondoubles"] == "doublesou"
    assert t["orasou"] == "ou"
    assert t["pokebankoubeta"] == "ou"
    assert t["uucurrent"] == "uu"
    assert t["battlespotdoubles"] == "vgc2015"
    assert t["capbeta"] == "cap"
    assert t["gen9ou"] == "gen9ou"
