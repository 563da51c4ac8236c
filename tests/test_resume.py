"""Idempotent resume: a rerun after partial failure recomputes ONLY
the missing sinks, consulting the per-sink lineage ledger (north rule:
resumable from checkpoint with per-partition lineage + metrics)."""

import os
import shutil

import pytest

from stats_spark.plans import pipeline


@pytest.fixture(scope="module")
def out(spark, t1, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("resume"))
    m = pipeline.run_pipeline(spark, t1, d,
                              sinks=["usage", "leads", "battle_counts"],
                              count_rows=False)
    return d, m


def test_first_run_commits_lineage(spark, out):
    d, m = out
    done = pipeline.completed_sinks(spark, d)
    assert {"usage", "leads", "battle_counts", "rejects"} <= done
    assert all(not s.get("skipped") for s in m["sinks"])


def test_resume_skips_completed(spark, out):
    d, _ = out
    # simulate a crash that lost one sink's output
    shutil.rmtree(os.path.join(d, "leads"))
    before = {s: os.path.getmtime(os.path.join(d, s, "_SUCCESS"))
              for s in ("usage", "battle_counts")}

    m = pipeline.run_pipeline(spark, t1_paths(d), d,
                              sinks=["usage", "leads", "battle_counts"],
                              count_rows=False, resume=True)
    by = {s["partition"]: s for s in m["sinks"]}
    assert by["usage"]["skipped"] and by["battle_counts"]["skipped"]
    assert not by["leads"]["skipped"]
    # untouched sinks were not rewritten
    for s, t in before.items():
        assert os.path.getmtime(os.path.join(d, s, "_SUCCESS")) == t
    # the recomputed sink is back and committed
    assert os.path.exists(os.path.join(d, "leads", "_SUCCESS"))
    assert "leads" in pipeline.completed_sinks(spark, d)
    # parse was NOT rerun: the battles checkpoint was reused
    assert m["parse_seconds"] == 0.0


def t1_paths(_d):
    from stats_spark.datagen import corpus
    return corpus.ensure_corpus("t1")


def test_fresh_rerun_without_resume_overwrites(spark, out):
    d, _ = out
    m = pipeline.run_pipeline(spark, t1_paths(d), d, sinks=["usage"],
                              count_rows=False, resume=False)
    by = {s["partition"]: s for s in m["sinks"]}
    assert not by["usage"]["skipped"]
