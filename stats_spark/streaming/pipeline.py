"""Structured Streaming variants of the pipeline front-end.

The reference is explicitly batch-only (FAQ.md:93-127); this module is
the forward-looking streaming path the north rule's checkpoint/resume
machinery maps onto: ``readStream`` over the transcripts table,
watermarked event-time windows, checkpointed sinks.

Two entry points:
  stream_line_counts   stateless-agg smoke: per (format, window,
                       line_type) counts with a watermark for late data
  stream_usage_raw     per-format per-window conversation counts (the
                       streaming analog of the battles counter)

Both read the same parquet layout the batch job reads, so
``Trigger.AvailableNow`` turns the batch corpus into a bounded stream —
the idempotent-resume story (checkpointLocation) matches the batch
job's lineage table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TRANSCRIPT_DDL = ("conv_id string, turn_idx int, role string, text string, "
                  "tool string, ts timestamp, day string")


def read_transcript_stream(spark: SparkSession, corpus_paths: dict) -> DataFrame:
    return (spark.readStream
            .schema(TRANSCRIPT_DDL + ", format string")
            .option("maxFilesPerTrigger", "4")
            .parquet(corpus_paths["transcripts"]))


def stream_line_counts(stream: DataFrame, window: str = "10 minutes",
                       watermark: str = "5 minutes") -> DataFrame:
    return (stream
            .withWatermark("ts", watermark)
            .groupBy("format", F.window("ts", window),
                     F.split("text", "\\|").getItem(1).alias("line_type"))
            .agg(F.count("*").alias("n"))
            .select("format", F.col("window.start").alias("window_start"),
                    "line_type", "n"))


def stream_usage_raw(stream: DataFrame, window: str = "30 minutes",
                     watermark: str = "10 minutes") -> DataFrame:
    """Conversations seen per format per window (counted at their
    |start| line so each conversation counts once)."""
    return (stream
            .filter(F.col("text") == "|start")
            .withWatermark("ts", watermark)
            .groupBy("format", F.window("ts", window))
            .agg(F.count("*").alias("n_convs"))
            .select("format", F.col("window.start").alias("window_start"),
                    "n_convs"))


def run_available_now(df: DataFrame, query_name: str,
                      mode: str = "complete"):
    """Drive a bounded stream to completion into an in-memory sink.

    ``complete`` by default: with append mode a bounded stream never
    advances the watermark past the final windows, so they would never
    emit.  Real unbounded deployments use append + checkpointLocation.
    """
    q = (df.writeStream.outputMode(mode)
         .format("memory").queryName(query_name)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
