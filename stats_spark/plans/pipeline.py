"""The end-to-end parse → enrich → route → aggregate job.

Spark restatement of the reference's `process smogon/stats` lifecycle
(SURVEY §3.1): partition-pruned scan → cogrouped FSM parse → broadcast
enrich → cutoff/tag fan-out → hash aggregations → routed sinks with
per-partition lineage records.

Scale notes (the 100 TB story):
  - transcripts and conversations shuffle ONCE each (the cogroup);
    at cluster scale both tables are bucketed by conv_id, removing it.
  - battles is the compact intermediate (≈1/25th of transcripts); it
    is optionally checkpointed to parquet — the reference's per-(format,
    day) checkpoint layer (S5) — making every downstream aggregate
    restartable without reparsing.
  - every aggregate groups on (format, cutoff, ...); AQE skew splitting
    plus the high-cardinality species/key suffix keeps hot formats from
    serializing on one task.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from stats_spark.datagen import dims
from stats_spark.operators import aggregate as agg
from stats_spark.operators import enrich
from stats_spark.operators.parse import parse_battles
from stats_spark.functions.weights import weighting_udf
from stats_spark.sources import tables


def battles_weighted(battles: DataFrame,
                     cutoffs: list[int] = dims.DEFAULT_CUTOFFS) -> DataFrame:
    """Battle × cutoff frame with both sides' weights and gate flags —
    feeds encounters / leads / battle counts."""
    non_6v6 = sorted(dims.NON_6V6_FORMATS)
    non_singles = sorted(dims.NON_SINGLES_FORMATS)
    singles = ~F.col("format").isin(non_singles)
    short = (~F.col("format").isin(non_6v6)
             & ((F.col("turns") < 2) | ((F.col("turns") < 3) & singles)))
    df = (battles
          .withColumn("singles", singles)
          .withColumn("short", short)
          .withColumn("leads_ok",
                      F.col("lead_p1").isNotNull()
                      & F.col("lead_p2").isNotNull()
                      & (F.col("lead_p1") != "empty")
                      & (F.col("lead_p2") != "empty")))
    for s in ("p1", "p2"):
        outcome = (F.when(F.col("winner") == "tie", 0)
                    .when(F.col("winner") == s, 1).otherwise(-1))
        df = (df.withColumn(f"{s}_outcome", outcome)
                .withColumnRenamed(f"{s}_rpr", "rpr")
                .withColumnRenamed(f"{s}_rprd", "rprd")
                .withColumn("outcome", F.col(f"{s}_outcome")))
        df = enrich.with_effective_rating(df)
        df = (df.withColumnRenamed("eff_rpr", f"{s}_eff_rpr")
                .withColumnRenamed("eff_rprd", f"{s}_eff_rprd")
                .drop("rpr", "rprd", "outcome", "rating_valid", "gxe"))
    df = enrich.explode_cutoffs(df, cutoffs)
    for s in ("p1", "p2"):
        df = df.withColumn(
            f"w_{s}", weighting_udf(f"{s}_eff_rpr", f"{s}_eff_rprd",
                                    F.col("cutoff").cast("double")))
    return df


def build_frames(spark: SparkSession, battles: DataFrame,
                 cutoffs: list[int] = dims.DEFAULT_CUTOFFS,
                 cache: bool = False) -> dict:
    """All aggregate DataFrames (lazy) from a parsed battles frame.

    ``cache=True`` persists the three shared intermediates (mons_w,
    sides_w, battles_w) — every sink reuses them instead of re-running
    the enrichment; use when materializing several sinks in one job."""
    ok = enrich.accepted_battles(battles)
    sides = enrich.with_effective_rating(enrich.sides_from_battles(ok))
    mons = enrich.enrich_mons(sides, spark)
    side_class = enrich.classify_sides(mons)

    mons_w = enrich.with_weight(enrich.explode_cutoffs(mons, cutoffs))
    sides_w = enrich.with_weight(enrich.explode_cutoffs(
        sides.join(side_class, ["conv_id", "side"]), cutoffs))
    battles_w = battles_weighted(ok, cutoffs)
    if cache:
        # prune to the union of columns the aggregates consume before
        # materializing — the full enriched frame is ~45 columns and
        # caching it costs more than every aggregate combined
        mons_w = mons_w.select(
            "format", "cutoff", "species", "player", "weight",
            "rating_valid", "short", "outcome", "turns_out", "gxe",
            "ability", "item", "tera_type", "happiness", "spread",
            "stats_str", "moves").cache()
        sides_w = sides_w.select(
            "conv_id", "format", "cutoff", "side", "weight", "short",
            "team", "team_size", "tags", "team_stalliness").cache()
        battles_w = battles_w.select(
            "conv_id", "format", "cutoff", "short", "singles", "leads_ok",
            "lead_p1", "lead_p2", "w_p1", "w_p2", "matchups").cache()

    usage = agg.usage_by_species(mons_w)
    frames = dict(
        battles=battles,
        rejects=enrich.rejected_battles(battles),
        usage=usage,
        usage_totals=agg.usage_totals(usage),
        moveset=agg.moveset_maps(mons_w),
        teammates=agg.teammates(sides_w),
        encounters=agg.encounters(battles_w),
        leads=agg.leads(battles_w),
        battle_counts=agg.battle_counts(battles_w),
        metagame=agg.metagame(sides_w),
        stalliness=agg.stalliness_samples(sides_w),
        unique_players=agg.unique_players(mons_w),
    )
    frames["viability"] = agg.viability(frames["unique_players"])
    return frames


SINKS = ["usage", "usage_totals", "moveset", "teammates", "encounters",
         "leads", "battle_counts", "metagame", "stalliness", "viability"]


def run_pipeline(spark: SparkSession, corpus_paths: dict, out_dir: str,
                 cutoffs: list[int] = dims.DEFAULT_CUTOFFS,
                 checkpoint_battles: bool = True,
                 sinks: list[str] | None = None) -> dict:
    """Full job: scan → parse → enrich → aggregate → ROUTE to per-sink
    partitioned parquet trees + lineage records.  Returns metrics."""
    t0 = time.time()
    tr = tables.load_transcripts(spark, corpus_paths)
    cv = tables.load_conversations(spark, corpus_paths)
    battles = parse_battles(tr, cv)

    if checkpoint_battles:
        # S5 checkpoint: compact columnar intermediate, partitioned on
        # the routing key; downstream stages re-read it (resume point).
        bpath = os.path.join(out_dir, "battles")
        (battles.write.mode("overwrite").partitionBy("format")
         .parquet(bpath))
        battles = spark.read.parquet(bpath)
    t_parse = time.time() - t0

    frames = build_frames(spark, battles, cutoffs, cache=True)
    metrics = []
    for sink in (sinks or SINKS):
        ts = time.time()
        df = frames[sink]
        part = ("format", "cutoff") if "cutoff" in df.columns else ("format",)
        path = tables.write_routed(df, out_dir, sink, partition_cols=part)
        metrics.append(dict(partition=sink, path=path,
                            rows=spark.read.parquet(path).count(),
                            seconds=round(time.time() - ts, 2)))
    # dead-letter route — P8 rejects
    rej = frames["rejects"].select("conv_id", "format", "day", "error", "ts")
    rej.write.mode("overwrite").parquet(os.path.join(out_dir, "rejects"))
    metrics.append(dict(partition="rejects", path=os.path.join(out_dir, "rejects"),
                        rows=rej.count(), seconds=0.0))
    tables.write_lineage(spark, out_dir, "stats_pipeline", metrics)
    return dict(seconds=time.time() - t0, parse_seconds=round(t_parse, 2),
                sinks=metrics)
