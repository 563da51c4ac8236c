"""Stateful FSM-on-stream: the streaming parse must match the batch
parse EXACTLY on the t1 corpus (availableNow bounded run)."""

import json

from pyspark.sql import functions as F

from stats_spark.operators.parse import parse_battles
from stats_spark.sources import tables
from stats_spark.streaming import pipeline as SP


def _key(df):
    rows = {}
    for r in df.collect():
        rows[r.conv_id] = (
            r.format, r.turns, r.winner, r.error, r.p1_name, r.p2_name,
            r.lead_p1, r.lead_p2,
            json.dumps([m.asDict() for m in (r.matchups or [])]),
            json.dumps([{k: v for k, v in p.asDict().items()}
                        for p in (r.p1_team or [])], sort_keys=True),
            json.dumps([{k: v for k, v in p.asDict().items()}
                        for p in (r.p2_team or [])], sort_keys=True),
        )
    return rows


def test_stream_usage_matches_batch(spark, t1):
    """Full streamed pipeline: FSM-on-stream → enrichment → usage
    aggregation must equal the batch usage frame exactly."""
    import pytest
    from stats_spark.plans import pipeline

    battles = parse_battles(tables.load_transcripts(spark, t1),
                            tables.load_conversations(spark, t1))
    want = {(r.format, r.cutoff, r.species):
            (r.usage_raw, r.usage_real, r.usage_weighted)
            for r in pipeline.build_frames(spark, battles)["usage"]
            .collect()}

    stream = SP.stream_battles(spark, t1, max_files=3,
                               timeout_ms=3_600_000)
    usage = SP.stream_usage(stream)
    q = (usage.writeStream.outputMode("complete")
         .format("memory").queryName("usage_live")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.format, r.cutoff, r.species):
           (r.usage_raw, r.usage_real, r.usage_weighted)
           for r in spark.sql("SELECT * FROM usage_live").collect()}
    q.stop()
    assert set(got) == set(want)
    for k, (raw, real, w) in want.items():
        graw, greal, gw = got[k]
        assert graw == raw and greal == real, k
        assert gw == pytest.approx(w, rel=1e-9), k


def test_stream_matches_batch(spark, t1):
    batch = parse_battles(tables.load_transcripts(spark, t1),
                          tables.load_conversations(spark, t1))

    stream = SP.stream_battles(spark, t1, max_files=3)
    q = (stream.writeStream.outputMode("append")
         .format("memory").queryName("battles_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT * FROM battles_stream")

    # multiple micro-batches actually ran (state crossed batch edges)
    assert q.lastProgress is not None

    b, s = _key(batch), _key(got)
    assert set(b) == set(s)
    for cid in b:
        assert s[cid] == b[cid], cid
    q.stop()
