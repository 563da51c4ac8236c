"""P9 full-log anonymization against the reference's OWN goldens
(anon/src/testdata/{raw,anon,salt,team}.json) — the exact checks
`anon/src/index.test.ts:12-46` runs: unsalted + salted anonymize of a
complete gen7 battle log (teams, 206-line protocol log incl. legacy
'-activate'→'-block' upgrades, inputLog filtering), team-only
anonymization, and the Verifier leak path."""

import json
import os

import pytest

from stats_spark.operators import anon_log as A
from stats_spark.parity import gen_data

TESTDATA = "/root/reference/anon/src/testdata"

pytestmark = pytest.mark.skipif(
    not os.path.exists(TESTDATA),
    reason="reference anon fixtures not available")


def _base_name(sid: str) -> str:
    e = gen_data.SPECIES.get(sid)
    return gen_data.SPECIES[e[1]][0] if e else sid


def _load(name):
    with open(os.path.join(TESTDATA, name), encoding="utf-8") as f:
        return json.load(f)


def test_anonymize_unsalted_golden():
    raw, want = _load("raw.json"), _load("anon.json")
    v = A.Verifier()
    got = A.anonymize_raw(raw, _base_name, None, verifier=v, copy=True)
    assert got == want
    assert v.ok()


def test_anonymize_salted_golden():
    raw, want = _load("raw.json"), _load("salt.json")
    v = A.Verifier()
    got = A.anonymize_raw(raw, _base_name, "salt", verifier=v)
    assert got == want
    assert v.ok()


def test_anonymize_team_golden():
    team = _load("team.json")
    assert [p["name"] for p in A.anonymize_team(team, _base_name)] == \
        ["Rayquaza", "Greninja", "Meloetta", "Zoroark", "Ditto",
         "Shedinja"]
    assert [p["name"] for p in
            A.anonymize_team(_load("team.json"), _base_name,
                             salt="salt")] == \
        ["64bd07b346", "d677adb2c9", "962d76aee3", "a8d7f93b51",
         "ce04869101", "46ea409020"]


def test_verifier_catches_planted_leak():
    """index.test.ts:28-34 — a nickname that collides with an ability
    name ('Air Lock') survives anonymization of the |-ability| payload
    and must be flagged."""
    with open(os.path.join(TESTDATA, "raw.json"), encoding="utf-8") as f:
        mod = json.loads(f.read().replace("aaaaaaaaaa", "Air Lock"))
    v = A.Verifier()
    got = A.anonymize_raw(mod, _base_name, None, verifier=v, copy=True)
    assert got == _load("anon.json")
    assert not v.ok()
    assert v.leaks == [{
        "input": "|-ability|p2a: Air Lock|Air Lock",
        "output": "|-ability|p2a: Rayquaza|Air Lock",
    }]


def test_input_log_keeps_only_choices():
    raw = _load("raw.json")
    out = A.anonymize_input_log(raw["inputLog"])
    assert out and all(line.startswith(">p") for line in out)
    assert not any(line.startswith(">player") for line in out)
    assert out == _load("anon.json")["inputLog"]


def test_spark_operator_matches_driver_side(spark):
    """The Arrow-batched mapInPandas operator produces the same
    anonymized JSON for a small frame of raw logs (salted + leak
    counts), so the per-row semantics survive the Spark boundary."""
    raw = _load("raw.json")
    rows = [("b1", json.dumps(raw)), ("b2", json.dumps(raw))]
    df = spark.createDataFrame(rows, "conv_id string, raw string")
    base_names = {sid: gen_data.SPECIES[e[1]][0]
                  for sid, e in gen_data.SPECIES.items()}
    out = {r["conv_id"]: r for r in
           A.anonymize_logs(df, base_names, salt="salt")
           .collect()}
    assert len(out) == 2
    want = _load("salt.json")
    for r in out.values():
        assert json.loads(r["anon"]) == want
        assert r["n_leaks"] == 0
