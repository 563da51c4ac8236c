"""Unit tests for the interference-gate rule in scripts/scaling.py.

The scaling protocol (north rule: raw efficiency >=0.8 from N to 4N)
keeps a leg only if the clock sentinel AT THE LEG'S OWN concurrency
read ROUND-best (within tol) both immediately before and after the
leg — round-best being the fastest reading ever observed at that
concurrency across all protocol runs this round, persisted on disk so
a uniformly loaded session cannot grade its own depressed legs clean
against its own depressed best.  These tests pin the gate semantics
without running Spark.
"""

import importlib.util
import os
import sys

import pytest

_spec = importlib.util.spec_from_file_location(
    "scaling", os.path.join(os.path.dirname(__file__), os.pardir,
                            "scripts", "scaling.py"))
scaling = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(scaling)

LOW, HIGH, TOL = 2, 8, 0.05


@pytest.fixture
def proto(tmp_path, monkeypatch):
    monkeypatch.setattr(scaling, "HISTORY_PATH",
                        str(tmp_path / "history.json"))
    monkeypatch.setattr(scaling, "LEGS_PATH",
                        str(tmp_path / "legs_{n}_{low}_{high}.json"))
    monkeypatch.setattr(scaling, "PAIRS_PATH",
                        str(tmp_path / "pairs_{n}_{low}_{high}.json"))

    def make():
        return scaling.Protocol(1000, LOW, HIGH, TOL)

    return make


def leg(level, pre_low, pre_high, post_low, post_high, seconds=100.0):
    return {"level": level,
            "run": {"cores": level, "seconds": seconds, "turns": 1},
            "pre": {"low": pre_low, "high": pre_high},
            "post": {"low": post_low, "high": post_high}}


def test_clean_leg_within_tol_is_kept(proto):
    p = proto()
    p.add_leg(leg(LOW, 3.0, 3.0, 3.1, 3.0))
    p.observe({"low": 3.0, "high": 3.0})
    counts, best = p.gate()
    assert p.legs[0]["clean"] is True
    assert counts == {LOW: 1, HIGH: 0}
    assert best == {"low": 3.0, "high": 3.0}


def test_loaded_window_leg_is_discarded(proto):
    # pre sentinel at the leg's own concurrency 20% over round best
    p = proto()
    p.observe({"low": 3.0, "high": 3.0})
    p.add_leg(leg(LOW, 3.6, 3.0, 3.0, 3.0))
    counts, _ = p.gate()
    assert p.legs[0]["clean"] is False
    assert counts == {LOW: 0, HIGH: 0}


def test_other_level_sentinel_does_not_gate(proto):
    # the HIGH-concurrency reading is way off during a LOW leg: the
    # leg still gates only on its own concurrency's readings
    p = proto()
    p.observe({"low": 3.0, "high": 3.0})
    p.add_leg(leg(LOW, 3.0, 9.9, 3.0, 9.9))
    counts, _ = p.gate()
    assert p.legs[0]["clean"] is True
    assert counts[LOW] == 1


def test_post_reading_gates_too(proto):
    p = proto()
    p.observe({"low": 3.0, "high": 3.0})
    p.add_leg(leg(HIGH, 3.0, 3.0, 3.0, 3.9))
    counts, _ = p.gate()
    assert p.legs[0]["clean"] is False
    assert counts[HIGH] == 0


def test_round_best_updates_retroactively_discard(proto):
    # a later, faster sentinel reading — CORROBORATED by a second
    # sample within tol — lowers the round best and retroactively
    # discards an earlier slower-window leg
    p = proto()
    p.add_leg(leg(LOW, 3.0, 3.0, 3.0, 3.0))
    p.add_leg(leg(LOW, 2.7, 3.0, 2.7, 3.0))   # one fast post: pending
    counts, best = p.gate()
    assert best["low"] == 3.0                 # not yet corroborated
    assert counts[LOW] == 2
    p.observe({"low": 2.72, "high": 3.0})     # corroborating sample
    counts, best = p.gate()
    assert best["low"] == 2.7
    assert p.legs[0]["clean"] is False  # 3.0 > 2.7 * 1.05
    assert p.legs[1]["clean"] is True
    assert counts[LOW] == 1


def test_uncorroborated_best_does_not_gate(proto):
    # one anomalously fast sample must NOT permanently raise the gate
    # (ADVICE r05): it stays pending until a second sample agrees
    p = proto()
    p.observe({"low": 3.0, "high": 3.0})
    p.observe({"low": 2.0, "high": 3.0})      # lucky outlier
    assert p.best()["low"] == 3.0
    p.observe({"low": 2.8, "high": 3.0})      # disagrees: replaces pending
    assert p.best()["low"] == 3.0
    p.observe({"low": 2.82, "high": 3.0})     # agrees with 2.8 → promote
    assert p.best()["low"] == 2.8


def test_r05_one_sided_pairs_regraded_job_invalid(proto):
    # an r05 pair record (T_high-T_low-T_high, no second T_low leg)
    # may carry job_valid=True, but its one-sided bracket cannot
    # detect an inflating T_low spike — re-graded invalid under the
    # two-sided instrument; sentinel validity is untouched
    p = proto()
    old_pair = dict(t_low=1500.0, t_high=400.0, t_high2=410.0,
                    raw_s=0.94, raw_ab=0.93, job_spread=1.025,
                    job_valid=True, valid=False, ceiling=0.98,
                    stable=True,
                    s0={"low": 3.0, "high": 3.0},
                    s1={"low": 3.0, "high": 3.0},
                    s2={"low": 3.0, "high": 3.0})
    p.add_pair(old_pair)
    assert scaling._job_valid(old_pair) is False
    assert p.valid_pairs() == []
    new_pair = dict(old_pair, t_low2=1510.0, t_high3=405.0)
    assert scaling._job_valid(new_pair) is True


def test_run_pair_two_sided_bracket(proto, monkeypatch):
    # the five-leg flow: both T_low legs and all three T_high legs
    # must agree for job validity; the raw alias carries the value
    # certified by the pair's own valid instrument
    p = proto()
    p.observe({"low": 3.0, "high": 3.0})
    seq = {"low": [1520.0, 1500.0], "high": [400.0, 404.0, 402.0]}

    def fake_run_level(cores, n_convs):
        key = "low" if cores == LOW else "high"
        return {"cores": cores, "seconds": seq[key].pop(0), "turns": 10}

    monkeypatch.setattr(scaling, "run_level", fake_run_level)
    monkeypatch.setattr(scaling, "sentinel",
                        lambda lo, hi: {"low": 3.0, "high": 3.01})
    pair = scaling.run_pair(p, {"low": 3.0, "high": 3.0})
    assert pair["job_valid"] is True
    assert pair["t_low2"] == 1500.0 and pair["t_high3"] == 402.0
    # raw_ab = (mean T_low / mean T_high) / 4
    exp = round(((1520.0 + 1500.0) / 2) / ((400 + 404 + 402) / 3) / 4, 3)
    assert pair["raw_ab"] == exp
    assert pair["raw"] == exp          # certified by the job bracket
    assert len(p.legs) == 5
    assert all(g["pair"] == pair["attempt"] for g in p.legs)


def test_run_pair_aborts_on_low_spread(proto, monkeypatch):
    # a T_low disagreement kills the job instrument (this is exactly
    # the inflating direction the r05 bracket missed) — the pair is
    # finalized early, job-invalid, and raw falls back to the
    # sentinel instrument if that graded valid
    p = proto()
    p.observe({"low": 3.0, "high": 3.0})
    seq = {"low": [1500.0, 1900.0], "high": [400.0, 401.0, 999.0]}

    def fake_run_level(cores, n_convs):
        key = "low" if cores == LOW else "high"
        return {"cores": cores, "seconds": seq[key].pop(0), "turns": 10}

    monkeypatch.setattr(scaling, "run_level", fake_run_level)
    monkeypatch.setattr(scaling, "sentinel",
                        lambda lo, hi: {"low": 3.0, "high": 3.0})
    pair = scaling.run_pair(p, {"low": 3.0, "high": 3.0})
    assert pair["job_valid"] is False
    assert pair["job_aborted"]
    assert pair["t_high3"] is None     # fifth leg never ran
    assert seq["high"] == [999.0]
    assert pair["valid"] is True       # sentinel instrument held
    assert pair["raw"] == pair["raw_s"]


def test_both_levels_counted_independently(proto):
    p = proto()
    p.add_leg(leg(LOW, 3.0, 3.0, 3.0, 3.0))
    p.add_leg(leg(HIGH, 3.0, 3.0, 3.0, 3.0))
    p.add_leg(leg(HIGH, 3.0, 3.2, 3.0, 3.0))  # 3.2 > 3.0*1.05 own level
    counts, _ = p.gate()
    assert counts == {LOW: 1, HIGH: 1}


def test_round_best_persists_across_protocol_runs(proto):
    # run 1 observes a fast window and records a leg
    p1 = proto()
    p1.observe({"low": 2.5, "high": 2.6})
    p1.add_leg(leg(LOW, 2.5, 2.6, 2.55, 2.6))
    # run 2 (fresh process): its own session never sees a fast window,
    # so its depressed legs must NOT grade clean against themselves
    p2 = proto()
    assert p2.best() == {"low": 2.5, "high": 2.6}
    assert len(p2.legs) == 1  # legs merged across runs
    p2.add_leg(leg(LOW, 3.4, 3.4, 3.5, 3.4))
    counts, _ = p2.gate()
    assert p2.legs[1]["clean"] is False
    assert counts[LOW] == 1  # only run 1's fast-window leg


def test_window_clean_checks_own_level_only(proto):
    p = proto()
    p.observe({"low": 2.8, "high": 2.9})
    assert p.window_clean({"low": 2.9, "high": 9.9}, LOW)
    assert not p.window_clean({"low": 3.5, "high": 2.9}, LOW)
    assert p.window_clean({"low": 9.9, "high": 2.95}, HIGH)
    assert not p.window_clean({"low": 2.8, "high": 3.6}, HIGH)


# --- uniform-window paired measurement grading ---


def S(low, high):
    return {"low": low, "high": high}


def test_pair_valid_stable_flat_clock():
    # host 30% below round-best but constant and turbo-flat: valid,
    # ceiling ~1.0 — the constant clock cancels in the ratio
    ok, ceiling, stable = scaling.pair_valid(
        S(3.70, 3.71), S(3.72, 3.70), S(3.71, 3.73), TOL)
    assert ok and stable
    assert ceiling >= 0.99


def test_pair_invalid_if_clock_drifts_mid_pair():
    # clock recovers between the two legs: the T_high and T_low halves
    # ran at different speeds — ratio meaningless, discarded
    ok, ceiling, stable = scaling.pair_valid(
        S(3.70, 3.70), S(3.70, 3.70), S(2.90, 2.90), TOL)
    assert not ok and not stable


def test_pair_invalid_if_turbo_differential():
    # 8-way runs >3% slower per core than 2-way inside the window:
    # the pair would embed a turbo tax, so it is discarded, not
    # normalized
    ok, ceiling, stable = scaling.pair_valid(
        S(2.80, 2.95), S(2.80, 2.95), S(2.80, 2.95), TOL)
    assert stable
    assert ceiling < 0.97
    assert not ok


def test_pairs_persist_and_grade(proto):
    p = proto()
    p.add_pair(dict(t_low=1630.0, t_high=505.0, raw=0.807,
                    s0=S(3.7, 3.7), s1=S(3.7, 3.7), s2=S(3.7, 3.7),
                    valid=True, ceiling=1.0, stable=True,
                    clock_vs_round_best=0.75))
    p.add_pair(dict(t_low=1700.0, t_high=505.0, raw=0.842,
                    s0=S(3.7, 3.7), s1=S(3.7, 3.7), s2=S(2.9, 2.9),
                    valid=False, ceiling=1.0, stable=False,
                    clock_vs_round_best=0.75))
    # fresh process at the same (corpus, levels): pairs merge across runs
    p2 = proto()
    assert len(p2.pairs) == 2
    assert [q["raw"] for q in p2.valid_pairs()] == [0.807]
