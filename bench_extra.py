"""Supplementary benchmark harness for the optimization rounds.

bench.py is FROZEN (driver contract).  This file adds what guide §1
asks for without touching it:

  * per-query isolation with the noop sink (times the computation, not
    the sink — §1.4) or with the same ``.count()`` action bench.py uses
    (comparable numbers)
  * multi-sample timing (median + min + all samples) so a ±30% host
    window can't masquerade as a code regression (VERDICT r05 #4)
  * ``--explain`` capture of the formatted physical plan per query to
    plans/r06/<query>_<tag>.txt

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --n 3 \
      --queries doc_minhash_lsh,emb_cosine_topk [--action noop] \
      [--explain plans/r06 --tag before]

Prints one JSON line: {"queries": {name: median}, "samples": {...},
"min": {...}, "sf": ..., "action": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

DEFAULT_QUERIES = ["q1_pricing_summary", "q3_shipping_priority",
                   "q_events_sessions", "doc_minhash_lsh", "doc_simhash",
                   "emb_cosine_topk"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--action", choices=["count", "noop"], default="count",
                    help="count = bench.py-comparable; noop = §1.4 "
                         "compute-everything-discard-output")
    ap.add_argument("--explain", default=None,
                    help="directory to write <query>_<tag>.txt plans")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from stats_spark.session import get_spark
    spark = get_spark("stats_spark_bench_extra", cores=args.cpus,
                      shuffle_partitions=max(args.cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py"))
    e = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(e)
    qs = e.queries()

    names = [q.strip() for q in args.queries.split(",") if q.strip()]
    samples: dict[str, list[float]] = {q: [] for q in names}

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for q in names:
            df = qs[q](spark, args.sf)
            jqe = df._jdf.queryExecution()
            txt = jqe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(args.explain,
                                   f"{q}_{args.tag}.txt"), "w") as f:
                f.write(txt)

    for i in range(args.n):
        for q in names:
            spark.sparkContext.setJobDescription(f"{q} sample {i}")
            t0 = time.time()
            df = qs[q](spark, args.sf)
            if args.action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples[q].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "queries": {q: round(statistics.median(s), 3)
                    for q, s in samples.items()},
        "min": {q: min(s) for q, s in samples.items()},
        "samples": samples,
        "sf": args.sf.rstrip("/").split("/")[-1],
        "action": args.action,
        "cpus": args.cpus,
    }))


if __name__ == "__main__":
    main()
