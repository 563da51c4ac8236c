"""spark-submit entry point for the full pipeline.

Launched as:

  spark-submit --master <cluster> --py-files dist/stats_spark.zip \
      scripts/run_job.py --corpus <dir> --out <dir> [--resume] \
      [--date YYYY-MM] [--sinks usage,moveset,...]

The script carries NO cluster topology — master, executor count and
memory come from the submit command (scripts/submit.sh wraps the
local[N] case).  ``stats_spark`` resolves from the shipped zip on the
driver and every executor.
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser(description="stats_spark pipeline job")
    ap.add_argument("--corpus", required=True,
                    help="corpus dir holding transcripts.parquet + "
                         "conversations.parquet")
    ap.add_argument("--out", required=True, help="output sink tree")
    ap.add_argument("--resume", action="store_true",
                    help="skip sinks the lineage ledger records as done")
    ap.add_argument("--date", default=None,
                    help="YYYY-MM for date-dependent cutoff sets")
    ap.add_argument("--sinks", default=None,
                    help="comma-separated sink subset (default: all)")
    args = ap.parse_args()

    from stats_spark.session import get_submit_spark

    spark = get_submit_spark("stats_spark_pipeline")

    from stats_spark.plans import pipeline

    corpus_paths = {
        "transcripts": os.path.join(args.corpus, "transcripts.parquet"),
        "conversations": os.path.join(args.corpus, "conversations.parquet"),
        "dir": args.corpus,
    }
    metrics = pipeline.run_pipeline(
        spark, corpus_paths, args.out,
        resume=args.resume, date=args.date,
        sinks=args.sinks.split(",") if args.sinks else None)
    print("JOB_METRICS " + json.dumps(metrics, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
