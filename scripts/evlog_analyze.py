"""Rank scaling losses from a Spark event log.

For each stage: wall (submit->complete), task count, total task time,
longest task, and idle-core waste = wall*cores - task_time_sum (the
core-seconds the stage left on the table — wave quantization,
stragglers, or under-partitioned input).  Also reports driver gaps:
wall-clock windows where NO stage was running (scheduling, driver-side
work, py4j round-trips) — pure fixed cost at any core count.

Usage: python scripts/evlog_analyze.py <eventlog-file> <cores> [top_n]
"""

from __future__ import annotations

import json
import sys


def main():
    path, cores = sys.argv[1], int(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    stages = {}   # (stageId, attempt) -> dict
    tasks = {}    # (stageId, attempt) -> [duration_ms]
    app_start = app_end = None
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif e == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif e == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                k = (si["Stage ID"], si["Stage Attempt ID"])
                stages[k] = dict(name=si["Stage Name"],
                                 ntask=si["Number of Tasks"],
                                 submit=si.get("Submission Time"))
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                k = (si["Stage ID"], si["Stage Attempt ID"])
                s = stages.setdefault(k, dict(name=si["Stage Name"],
                                              ntask=si["Number of Tasks"]))
                s["submit"] = si.get("Submission Time", s.get("submit"))
                s["complete"] = si.get("Completion Time")
            elif e == "SparkListenerTaskEnd":
                k = (ev["Stage ID"], ev["Stage Attempt ID"])
                ti = ev.get("Task Info", {})
                if ti.get("Finish Time") and ti.get("Launch Time"):
                    tasks.setdefault(k, []).append(
                        ti["Finish Time"] - ti["Launch Time"])

    rows = []
    for k, s in stages.items():
        if not s.get("submit") or not s.get("complete"):
            continue
        wall = (s["complete"] - s["submit"]) / 1000.0
        tt = sorted(tasks.get(k, []))
        task_sum = sum(tt) / 1000.0
        waste = wall * cores - task_sum
        rows.append(dict(stage=k[0], wall=round(wall, 1),
                         ntask=s["ntask"], task_sum=round(task_sum, 1),
                         max_task=round(tt[-1] / 1000.0, 1) if tt else 0,
                         waste=round(waste, 1),
                         name=s["name"].split("\n")[0][:80]))

    rows.sort(key=lambda r: -r["waste"])
    print(f"{'stage':>5} {'wall':>7} {'ntask':>5} {'task_sum':>8} "
          f"{'max_task':>8} {'waste_cs':>8}  name")
    for r in rows[:top_n]:
        print(f"{r['stage']:>5} {r['wall']:>7} {r['ntask']:>5} "
              f"{r['task_sum']:>8} {r['max_task']:>8} {r['waste']:>8}"
              f"  {r['name']}")
    total_wall = (app_end - app_start) / 1000.0 if app_end else None
    total_task = sum(sum(t) for t in tasks.values()) / 1000.0
    print(f"\napp wall: {total_wall}s  total task core-s: "
          f"{round(total_task, 1)}  cores: {cores}")
    if total_wall:
        print(f"overall core utilization: "
              f"{round(total_task / (total_wall * cores), 3)}")

    # driver gaps: windows with no stage running (merge stage intervals)
    ivals = sorted((s["submit"], s["complete"]) for s in stages.values()
                   if s.get("submit") and s.get("complete"))
    gaps, cur_end = [], None
    for a, b in ivals:
        if cur_end is not None and a > cur_end:
            gaps.append((cur_end, a))
        cur_end = b if cur_end is None else max(cur_end, b)
    gap_total = sum(b - a for a, b in gaps) / 1000.0
    print(f"driver gaps (no stage running): {round(gap_total, 1)}s "
          f"across {len(gaps)} windows; largest: "
          f"{[round((b - a) / 1000.0, 1) for a, b in sorted(gaps, key=lambda g: g[0] - g[1])[:8]]}")


if __name__ == "__main__":
    main()
