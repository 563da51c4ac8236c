"""S7 display-JSON sink tests."""

import json
import os

import pytest

from stats_spark.plans import display, pipeline


@pytest.fixture(scope="module")
def frames(spark, t1):
    from stats_spark.operators.parse import parse_battles
    from stats_spark.sources import tables
    battles = parse_battles(tables.load_transcripts(spark, t1),
                            tables.load_conversations(spark, t1))
    return pipeline.build_frames(spark, battles)


def test_display_documents(frames, tmp_path):
    n = display.write_display(frames, str(tmp_path))
    assert n > 0
    path = tmp_path / "display" / "gen9ou-1500.json"
    doc = json.loads(path.read_text())
    assert doc["battles"] > 0
    assert set(doc["usage"]) == {"raw", "real", "weighted"}
    assert doc["pokemon"]
    some = next(iter(doc["pokemon"].values()))
    assert "usage" in some and "abilities" in some and "moves" in some
    # map ordering: weight desc
    moves = list(some["moves"].values())
    assert moves == sorted(moves, reverse=True)
    assert "tags" in doc["metagame"]
    # species keys sorted (deterministic output)
    keys = list(doc["pokemon"])
    assert keys == sorted(keys)


def test_display_deterministic(frames, tmp_path):
    a = display.build_display(frames)
    b = display.build_display(frames)
    sa = json.dumps({f"{k[0]}|{k[1]}": v for k, v in sorted(a.items())},
                    sort_keys=True)
    sb = json.dumps({f"{k[0]}|{k[1]}": v for k, v in sorted(b.items())},
                    sort_keys=True)
    assert sa == sb
