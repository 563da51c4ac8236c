"""Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the evidence protocol we
run the identical pipeline job on the identical input at two
parallelism levels (default local[8] vs local[32]) in fresh JVMs and
report throughput at both plus efficiency = (T_low/T_high)/(cpus_high/
cpus_low).  Results are written to BENCH.md.

Usage: python scripts/scaling.py [n_convs] [low_cores] [high_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
cores, n_convs = int(sys.argv[1]), int(sys.argv[2])
from stats_spark.session import get_spark
from stats_spark.datagen import corpus
from stats_spark.plans import pipeline
from stats_spark.sources import tables

corpus.TIERS["bench"] = n_convs
spark = get_spark(f"scale-{cores}", cores=cores,
                  shuffle_partitions=max(cores, 16))
spark.sparkContext.setLogLevel("ERROR")
c = corpus.ensure_corpus("bench", spark=spark)
n_turns = tables.load_transcripts(spark, c).count()
out = os.path.join(corpus.corpus_dir("bench"), f"scale_out_{cores}")
t0 = time.time()
m = pipeline.run_pipeline(spark, c, out)
dt = time.time() - t0
print(json.dumps(dict(cores=cores, seconds=round(dt, 2), turns=n_turns,
                      parse_seconds=m["parse_seconds"],
                      turns_per_sec=round(n_turns / dt, 1))))
"""


def run_level(cores: int, n_convs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), str(n_convs)],
        capture_output=True, text=True, timeout=3600)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    # pre-generate the corpus once so neither run pays generation
    from stats_spark.session import get_spark
    from stats_spark.datagen import corpus
    corpus.TIERS["bench"] = n_convs
    spark = get_spark("scale-gen", cores=high)
    spark.sparkContext.setLogLevel("ERROR")
    corpus.ensure_corpus("bench", spark=spark)
    spark.stop()

    r_low = run_level(low, n_convs)
    r_high = run_level(high, n_convs)
    eff = round((r_low["seconds"] / r_high["seconds"]) / (high / low), 3)
    result = dict(n_convs=n_convs, low=r_low, high=r_high,
                  scaling_efficiency=eff)
    print(json.dumps(result))

    md = f"""# BENCH — throughput + scaling evidence

Full parse→enrich→route→aggregate pipeline over the deterministic
synthetic transcript corpus ({n_convs:,} conversations,
{r_low['turns']:,} turn rows; skewed format sizes per
`logs/DESIGN.md:9-11`). Identical job, identical input, two
parallelism levels, fresh JVM each (the sandbox evidence protocol for
the north rule's two-cluster-size criterion).

| parallelism | wall-clock (s) | parse (s) | turns/sec |
| --- | --- | --- | --- |
| local[{low}] | {r_low['seconds']} | {r_low['parse_seconds']} | {r_low['turns_per_sec']:,} |
| local[{high}] | {r_high['seconds']} | {r_high['parse_seconds']} | {r_high['turns_per_sec']:,} |

**Scaling efficiency {low}→{high} cores:
(T{low}/T{high}) / ({high}/{low}) = {eff}** (target ≥ 0.8).

Measured by `scripts/scaling.py {n_convs} {low} {high}`;
`bench.py` reports the per-round headline numbers the driver records.
"""
    with open("/root/repo/BENCH.md", "w") as f:
        f.write(md)
    print("wrote /root/repo/BENCH.md")


if __name__ == "__main__":
    main()
