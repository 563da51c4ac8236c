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

    # no processing-time timeout here: a ProcessingTimeTimeout plan
    # keeps an availableNow run alive with endless no-data batches
    # (that is how Spark fires timeouts); the timeout path has its own
    # explicit-stop test below
    stream = SP.stream_battles(spark, t1, max_files=3)
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


def test_straggler_after_terminal(spark, t1, tmp_path):
    """Cross-batch disorder: the terminal |win| line arrives in an
    EARLIER micro-batch than a straggler turn line.  The FSM must hold
    state until the buffer is complete (contiguous 0..terminal), then
    emit exactly one row identical to the batch parse — not a
    prefix-parsed row plus a bogus re-created-state row."""
    import os

    import pandas as pd

    tr = tables.load_transcripts(spark, t1)
    cid = (tr.groupBy("conv_id").count().filter("count >= 5")
           .orderBy("conv_id").first().conv_id)
    pdf = (tr.filter(F.col("conv_id") == cid).toPandas()
           .sort_values("turn_idx").reset_index(drop=True))

    # write through an explicit arrow schema: bare pandas inference
    # would emit ns timestamps / null-typed all-None columns, which
    # the streaming reader's declared schema rejects
    import pyarrow as pa
    import pyarrow.parquet as pq
    schema = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int64()),
                        ("role", pa.string()), ("text", pa.string()),
                        ("tool", pa.string()), ("ts", pa.timestamp("us")),
                        ("day", pa.string()), ("format", pa.string())])
    cols = [f.name for f in schema]

    tdir = tmp_path / "transcripts.parquet"
    tdir.mkdir()
    straggler = pdf[pdf.turn_idx == 2]
    rest = pdf[pdf.turn_idx != 2]
    f_first, f_later = str(tdir / "a.parquet"), str(tdir / "b.parquet")
    for frame, path in ((rest, f_first),        # contains the terminal
                        (straggler, f_later)):  # arrives a batch later
        pq.write_table(pa.Table.from_pandas(frame[cols], schema=schema,
                                            preserve_index=False), path)
    now = 1_700_000_000
    os.utime(f_first, (now, now))               # oldest-first ordering
    os.utime(f_later, (now + 100, now + 100))

    paths = dict(t1)
    paths["transcripts"] = str(tdir)
    stream = SP.stream_battles(spark, paths, max_files=1)
    q = (stream.writeStream.outputMode("append")
         .format("memory").queryName("straggler_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT * FROM straggler_stream")
    q.stop()

    batch = parse_battles(tables.load_transcripts(spark, t1),
                          tables.load_conversations(spark, t1))
    b = _key(batch.filter(F.col("conv_id") == cid))
    s = _key(got)
    assert got.count() == 1, "exactly one row per conversation"
    assert s == b


def test_timeout_flushes_truncated_conversation(spark, t1, tmp_path):
    """A conversation whose terminal |win|/|tie| line never arrives
    (truncated log) must flush via the processing-time timeout instead
    of leaking state forever.  The query is stopped explicitly once
    the flushed row lands — with a ProcessingTimeTimeout plan even an
    availableNow run keeps cycling no-data batches (that is how the
    timeout fires), so awaitTermination would never return."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    tr = tables.load_transcripts(spark, t1)
    cid = (tr.groupBy("conv_id").count().filter("count >= 5")
           .orderBy("conv_id").first().conv_id)
    pdf = (tr.filter(F.col("conv_id") == cid).toPandas()
           .sort_values("turn_idx").reset_index(drop=True))
    truncated = pdf.iloc[:-1]  # drop the terminal line

    schema = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int64()),
                        ("role", pa.string()), ("text", pa.string()),
                        ("tool", pa.string()), ("ts", pa.timestamp("us")),
                        ("day", pa.string()), ("format", pa.string())])
    tdir = tmp_path / "transcripts.parquet"
    tdir.mkdir()
    pq.write_table(
        pa.Table.from_pandas(truncated[[f.name for f in schema]],
                             schema=schema, preserve_index=False),
        str(tdir / "a.parquet"))

    paths = dict(t1)
    paths["transcripts"] = str(tdir)
    stream = SP.stream_battles(spark, paths, max_files=1,
                               timeout_ms=2000)
    q = (stream.writeStream.outputMode("append")
         .format("memory").queryName("timeout_stream")
         .trigger(availableNow=True).start())
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT * FROM timeout_stream").count() >= 1:
                break
            time.sleep(1)
        rows = spark.sql("SELECT * FROM timeout_stream").collect()
    finally:
        q.stop()
    assert len(rows) == 1
    assert rows[0].conv_id == cid
    # the FSM saw a truncated battle: either a clean reject or a
    # parsed row — never a silent drop
    assert rows[0].error is not None or rows[0].turns is not None


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
