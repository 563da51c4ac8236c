"""Unit tests for the interference-gate rule in scripts/scaling.py.

The scaling protocol (north rule: raw efficiency >=0.8 from N to 4N)
keeps a leg only if the clock sentinel AT THE LEG'S OWN concurrency
read session-best (within tol) both immediately before and after the
leg.  These tests pin the gate semantics without running Spark.
"""

import importlib.util
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "scaling", os.path.join(os.path.dirname(__file__), os.pardir,
                            "scripts", "scaling.py"))
scaling = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(scaling)

LOW, HIGH, TOL = 2, 8, 0.05


def leg(level, pre_low, pre_high, post_low, post_high, seconds=100.0):
    return {"level": level,
            "run": {"seconds": seconds, "turns": 1},
            "pre": {"low": pre_low, "high": pre_high},
            "post": {"low": post_low, "high": post_high}}


def samples_from(legs, first=(3.0, 3.0)):
    s = [{"low": first[0], "high": first[1]}]
    s += [g["post"] for g in legs]
    return s


def test_clean_leg_within_tol_is_kept():
    legs = [leg(LOW, 3.0, 3.0, 3.1, 3.0)]
    counts, best = scaling.gate_legs(legs, samples_from(legs),
                                     LOW, HIGH, TOL)
    assert legs[0]["clean"] is True
    assert counts == {LOW: 1, HIGH: 0}
    assert best == {"low": 3.0, "high": 3.0}


def test_loaded_window_leg_is_discarded():
    # pre sentinel at the leg's own concurrency 20% over session best
    legs = [leg(LOW, 3.6, 3.0, 3.0, 3.0)]
    counts, _ = scaling.gate_legs(legs, samples_from(legs),
                                  LOW, HIGH, TOL)
    assert legs[0]["clean"] is False
    assert counts == {LOW: 0, HIGH: 0}


def test_other_level_sentinel_does_not_gate():
    # the HIGH-concurrency reading is way off during a LOW leg: the
    # leg still gates only on its own concurrency's readings
    legs = [leg(LOW, 3.0, 9.9, 3.0, 9.9)]
    counts, _ = scaling.gate_legs(legs, samples_from(legs,
                                                     first=(3.0, 3.0)),
                                  LOW, HIGH, TOL)
    assert legs[0]["clean"] is True
    assert counts[LOW] == 1


def test_post_reading_gates_too():
    legs = [leg(HIGH, 3.0, 3.0, 3.0, 3.9)]
    counts, _ = scaling.gate_legs(legs, samples_from(legs),
                                  LOW, HIGH, TOL)
    assert legs[0]["clean"] is False
    assert counts[HIGH] == 0


def test_session_best_updates_retroactively_discard():
    # a later, faster sentinel reading lowers the session best and
    # retroactively discards an earlier slower-window leg
    g1 = leg(LOW, 3.0, 3.0, 3.0, 3.0)
    g2 = leg(LOW, 2.7, 3.0, 2.7, 3.0)
    legs = [g1, g2]
    counts, best = scaling.gate_legs(legs, samples_from(legs),
                                     LOW, HIGH, TOL)
    assert best["low"] == 2.7
    assert g1["clean"] is False  # 3.0 > 2.7 * 1.05
    assert g2["clean"] is True
    assert counts[LOW] == 1


def test_both_levels_counted_independently():
    legs = [leg(LOW, 3.0, 3.0, 3.0, 3.0),
            leg(HIGH, 3.0, 3.0, 3.0, 3.0),
            leg(HIGH, 3.0, 3.2, 3.0, 3.0)]  # 3.2 > 3.0*1.05 at own level
    counts, _ = scaling.gate_legs(legs, samples_from(legs),
                                  LOW, HIGH, TOL)
    assert counts == {LOW: 1, HIGH: 1}
