"""Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the evidence protocol we
run the identical pipeline job on the identical input at two
parallelism levels (default local[2] vs local[8]) in fresh JVMs and
report throughput at both plus raw efficiency
(T_low/T_high)/(cpus_high/cpus_low).

Interference-gated protocol (this host has noisy neighbors AND
shared-host frequency scaling):

  * a CLOCK SENTINEL — equal pure-CPU work per process, no memory
    traffic, no JVM — runs at BOTH concurrency levels immediately
    before and after every measured leg;
  * a leg is CLEAN only if both bracketing sentinel readings AT THE
    LEG'S OWN concurrency are within TOL (default 5%) of the
    session-best reading at that concurrency, i.e. the machine's
    per-core speed in the regime the leg ran in was as fast as it
    ever was this session — loaded-window legs are DISCARDED by
    protocol, not normalized after the fact (the other level's
    reading is published but does not gate: it measures a different
    turbo/contention regime and certifies nothing about this leg);
  * legs alternate low,high,low,high,… and the protocol keeps running
    until ≥N_CLEAN (default 3) clean legs exist at BOTH levels (or the
    wall-clock budget runs out, in which case whatever cleared the
    gate is reported, with the shortfall disclosed);
  * raw efficiency uses min-of-clean per level; every leg's sentinel
    readings are published in BENCH.md.

The hardware clock ceiling (session-best sentinel_low /
sentinel_high) is still reported — it bounds any job's raw efficiency
on a turbo host and is the figure a real N→4N scale-out (more hosts,
constant clocks) does not pay — but the headline number is RAW.

Usage: python scripts/scaling.py [n_convs] [low_cores] [high_cores]
Env:   SCALING_N_CLEAN (3)  SCALING_TOL (0.05)
       SCALING_BUDGET_S (7200)  SCALING_MAX_LEGS (12)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

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
                  shuffle_partitions=max(16, cores * 4))
spark.sparkContext.setLogLevel("ERROR")
c = corpus.ensure_corpus("bench", spark=spark)
n_turns = tables.load_transcripts(spark, c).count()
out = os.path.join(corpus.corpus_dir("bench"), f"scale_out_{cores}")
t0 = time.time()
m = pipeline.run_pipeline(spark, c, out, count_rows=False,
                          materialize="stage")
dt = time.time() - t0
print(json.dumps(dict(cores=cores, seconds=round(dt, 2), turns=n_turns,
                      parse_seconds=m["parse_seconds"],
                      turns_per_sec=round(n_turns / dt, 1))))
"""


def _BURN(n):
    s = 0
    for i in range(n):
        s += i * i % 7
    return s


def cpu_reference(procs: int, n: int = 50_000_000) -> float:
    """Per-core speed at this concurrency: wall time for EQUAL work per
    process (pure CPU, no memory traffic).  Sensitive to both neighbor
    load (stolen cycles) and shared/turbo frequency scaling."""
    import multiprocessing as mp

    with mp.Pool(procs) as p:
        t0 = time.time()
        p.map(_BURN, [n] * procs)
        return time.time() - t0


def sentinel(low: int, high: int) -> dict:
    """One bracketing sample: sentinel wall time at each level (best of
    2 back-to-back runs — a single sample can eat one scheduler hiccup)."""
    return {
        "low": round(min(cpu_reference(low) for _ in range(2)), 3),
        "high": round(min(cpu_reference(high) for _ in range(2)), 3),
    }


def run_level(cores: int, n_convs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), str(n_convs)],
        capture_output=True, text=True, timeout=7200)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def shutdown_gateway():
    """spark.stop() leaves the Py4J gateway JVM alive (~0.3-0.5 cores
    of GC/idle threads for the rest of the protocol) — kill it so the
    measured runs share the machine with nothing."""
    try:
        from pyspark.sql import SparkSession
        from pyspark import SparkContext
        SparkSession._instantiatedSession = None
        if SparkContext._gateway is not None:
            SparkContext._gateway.shutdown()
            SparkContext._gateway = None
            SparkContext._jvm = None
    except Exception as e:  # surface, don't silently bias the protocol
        print(f"WARNING: gateway shutdown failed: {e!r}", file=sys.stderr)
    # gateway.shutdown() closes the Py4J socket but the JVM has been
    # observed to linger (measured: ~1.5% CPU of idle GC threads for
    # 20+ min) — SIGKILL any java child of this process directly
    import signal
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            if parts[3] == str(os.getpid()) and "java" in parts[1]:
                os.kill(int(pid), signal.SIGKILL)
                os.waitpid(int(pid), os.WNOHANG)
                print(f"killed lingering JVM {pid}", file=sys.stderr)
        except (OSError, IndexError, ChildProcessError):
            continue


def gate_legs(legs: list, samples: list, low: int, high: int,
              tol: float) -> tuple[dict, dict]:
    """Mark each leg clean/discarded and return (clean counts, session
    bests).  A leg is CLEAN iff both bracketing sentinel readings AT
    THE LEG'S OWN concurrency are within ``tol`` of the session-best
    reading at that concurrency — per-core speed in the regime the leg
    actually ran in was as fast as it ever was this session.  The
    other level's reading is published but does not gate: it measures
    a different turbo/contention regime and certifies nothing about
    this leg, so gating on it doubles false discards.  Cross-level
    comparability holds because BOTH levels' kept legs must hit
    session-best at their own concurrency."""
    best = {k: min(s[k] for s in samples) for k in ("low", "high")}
    out = {low: 0, high: 0}
    for leg in legs:
        k = "low" if leg["level"] == low else "high"
        ok = all(leg[b][k] <= best[k] * (1 + tol)
                 for b in ("pre", "post"))
        leg["clean"] = ok
        if ok:
            out[leg["level"]] += 1
    return out, best


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_clean = int(os.environ.get("SCALING_N_CLEAN", "3"))
    tol = float(os.environ.get("SCALING_TOL", "0.05"))
    budget = float(os.environ.get("SCALING_BUDGET_S", "7200"))
    max_legs = int(os.environ.get("SCALING_MAX_LEGS", "12"))

    # pre-generate the corpus once so no leg pays generation
    from stats_spark.session import get_spark
    from stats_spark.datagen import corpus
    corpus.TIERS["bench"] = n_convs
    gen_cores = max(high, os.cpu_count() or high)
    spark = get_spark("scale-gen", cores=gen_cores)
    spark.sparkContext.setLogLevel("ERROR")
    corpus.ensure_corpus("bench", spark=spark)
    spark.stop()
    shutdown_gateway()

    t_start = time.time()
    # legs: [{level, run, pre, post}] — pre/post are sentinel samples
    legs = []
    sentinel(low, high)  # warm-up: the first sample after the corpus
    #                      JVM teardown reads hot/loaded — discard it
    samples = [sentinel(low, high)]  # session-wide sentinel history

    def clean_counts():
        return gate_legs(legs, samples, low, high, tol)

    while True:
        counts, _ = clean_counts()
        if counts[low] >= n_clean and counts[high] >= n_clean:
            break
        have = {lv: sum(1 for g in legs if g["level"] == lv)
                for lv in (low, high)}
        if ((len(legs) >= max_legs or time.time() - t_start > budget)
                and have[low] > 0 and have[high] > 0):
            print(f"WARNING: stopping with clean counts {counts} "
                  f"(target {n_clean} per level)", file=sys.stderr)
            break
        # a level with NO legs at all outranks everything (the report
        # needs at least one leg per level); then whichever level is
        # short on clean legs (ties go to the low level)
        if have[low] == 0 or have[high] == 0:
            level = low if have[low] == 0 else high
        elif counts[low] != counts[high]:
            level = low if counts[low] < counts[high] else high
        else:
            # clean-count tie: alternate by total legs run, so a
            # sustained noise burst can't contaminate only one level
            level = low if have[low] <= have[high] else high
        pre = samples[-1]
        run = run_level(level, n_convs)
        post = sentinel(low, high)
        samples.append(post)
        legs.append(dict(level=level, run=run, pre=pre, post=post))
        print(json.dumps(dict(leg=len(legs), level=level,
                              seconds=run["seconds"], pre=pre, post=post)),
              flush=True)

    counts, best = clean_counts()
    ceiling = round(best["low"] / best["high"], 4)

    def leg_secs(level, only_clean):
        return [leg["run"]["seconds"] for leg in legs
                if leg["level"] == level and (leg["clean"] or not only_clean)]

    use_clean = counts[low] > 0 and counts[high] > 0
    t_low = min(leg_secs(low, use_clean))
    t_high = min(leg_secs(high, use_clean))
    eff = round((t_low / t_high) / (high / low), 3)
    eff_norm = round(eff / ceiling, 3)
    turns = legs[0]["run"]["turns"] if legs else 0

    result = dict(n_convs=n_convs, low_cores=low, high_cores=high,
                  t_low=t_low, t_high=t_high,
                  scaling_efficiency_raw=eff,
                  hw_clock_ceiling=ceiling,
                  scaling_efficiency_clock_normalized=eff_norm,
                  clean_legs=counts, tol=tol,
                  legs=[dict(level=g["level"], seconds=g["run"]["seconds"],
                             clean=g["clean"], pre=g["pre"], post=g["post"])
                        for g in legs])
    print(json.dumps(result))

    rows = "\n".join(
        "| {i} | local[{lv}] | {s} | {c} | {pl} / {ph} | {ql} / {qh} |".format(
            i=i + 1, lv=g["level"], s=g["run"]["seconds"],
            c="yes" if g["clean"] else "NO — discarded",
            pl=g["pre"]["low"], ph=g["pre"]["high"],
            ql=g["post"]["low"], qh=g["post"]["high"])
        for i, g in enumerate(legs))
    gate = "" if (counts[low] >= n_clean and counts[high] >= n_clean) else (
        f"\n> **Disclosure:** the protocol targeted ≥{n_clean} clean legs"
        f" per level but the budget ended with {counts[low]}×local[{low}]"
        f" / {counts[high]}×local[{high}] clean legs.\n")

    md = f"""# BENCH — throughput + scaling evidence

Full parse→enrich→route→aggregate pipeline (staged materialization —
the cluster deployment path) over the deterministic synthetic
transcript corpus ({n_convs:,} conversations, {turns:,} turn rows;
skewed format sizes per `logs/DESIGN.md:9-11`).  Identical job,
identical input, two parallelism levels, fresh JVM per leg — the
sandbox evidence protocol for the north rule's two-cluster-size
criterion.

**Interference-gated protocol**: a pure-CPU clock sentinel (equal work
per process, no memory traffic, no JVM) runs at BOTH concurrency
levels immediately before and after every leg; a leg is kept only if
both bracketing readings AT THE LEG'S OWN concurrency are within
{tol:.0%} of the session-best reading at that concurrency — i.e. the
machine's per-core speed in the regime the leg actually ran in was as
fast as it ever was this session.  (The other level's reading is
published for the record but does not gate: it measures a different
turbo/contention regime and certifies nothing about this leg;
cross-level comparability holds because BOTH levels' kept legs must
hit session-best at their own concurrency.)  Legs from loaded windows
are discarded by protocol — no after-the-fact normalization enters
the headline number.  Efficiency uses min-of-clean per level
({counts[low]} clean local[{low}] legs, {counts[high]} clean
local[{high}] legs).
{gate}
| leg | parallelism | wall-clock (s) | clean | sentinel pre (c{low} / c{high}) | sentinel post (c{low} / c{high}) |
| --- | --- | --- | --- | --- | --- |
{rows}

| parallelism | best clean wall-clock (s) | turns/sec |
| --- | --- | --- |
| local[{low}] | {t_low} | {round(turns / t_low, 1):,} |
| local[{high}] | {t_high} | {round(turns / t_high, 1):,} |

**Raw scaling efficiency {low}→{high} cores:
(T{low}/T{high}) / ({high}/{low}) = {eff}** (target ≥ 0.8).

**Hardware clock ceiling** on this host this session: the sentinel
runs {ceiling}× slower per core at {high}-way concurrency than at
{low}-way (shared-host turbo/frequency scaling).  That ceiling bounds
ANY job's raw efficiency at {ceiling} on this box; a real N→4N
*executor* scale-out (more hosts, constant clocks) does not pay it.
Clock-normalized efficiency — context, not the headline: {eff_norm}.

Measured by `scripts/scaling.py {n_convs} {low} {high}`;
`bench.py` reports the per-round headline numbers the driver records.
"""
    # retained evidence sections (waste forensics, fixed-cost method,
    # streaming micro-bench, headline config) live in a supplement file
    # so protocol reruns don't erase them
    supp = "/root/repo/scripts/bench_supplement.md"
    if os.path.exists(supp):
        with open(supp) as f:
            md += f.read()
    with open("/root/repo/BENCH.md", "w") as f:
        f.write(md)
    print("wrote /root/repo/BENCH.md")


if __name__ == "__main__":
    main()
