"""Event-log attribution: per-job wall time (keyed by setJobDescription
labels), driver-side gaps between jobs, and per-stage task-metric sums.

Usage: python tools/evlog.py <eventlog-file-or-dir> [--stages]

Reads the JSON-lines event log Spark writes under SPARK_GRAFT_EVENTLOG
(session.py seam) and prints, in job order:

  job <id>  <wall s>  (+<gap s> driver gap before)  <description>

plus a per-description rollup and, with --stages, per-stage sums of
executor run / CPU / shuffle-write / GC time — the same numbers the
history server surfaces, greppable. This is how the round-5 fixed-term
attribution (driver dispatch vs shuffle-writer contention vs compute)
was measured; kept as a repo tool so the next regression hunt doesn't
re-invent it.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def load_events(path: str):
    # SPARK_GRAFT_EVENTLOG dir -> newest app entry; Spark 4 rolling logs
    # are themselves directories of ordered events_N_* part files
    if os.path.isdir(path):
        ents = [os.path.join(path, f) for f in os.listdir(path)
                if not f.startswith(".")]
        if ents and all(os.path.basename(e).startswith(("eventlog_", "app"))
                        or os.path.isdir(e) for e in ents):
            path = max(ents, key=os.path.getmtime)
    if os.path.isdir(path):
        files = sorted(
            (f for f in os.listdir(path) if f.startswith("events_")),
            key=lambda f: int(f.split("_")[1]))
        files = [os.path.join(path, f) for f in files]
    else:
        files = [path]
    for fp in files:
        if fp.endswith(".zstd"):
            # no python zstd binding in this env; shell out to the zstd CLI
            import subprocess

            f = iter(subprocess.run(
                ["zstd", "-dc", fp], capture_output=True, text=True,
                check=True).stdout.splitlines())
        else:
            f = open(fp)
        try:
            for line in f:
                try:
                    yield json.loads(line)
                except json.JSONDecodeError:
                    continue
        finally:
            if hasattr(f, "close"):
                f.close()


def analyze(path: str, show_stages: bool = False) -> dict:
    jobs = {}  # id -> dict
    stage_metrics = defaultdict(lambda: defaultdict(float))
    stage_names = {}
    stage_to_job = {}
    app_start = app_end = None
    for ev in load_events(path):
        e = ev.get("Event")
        if e == "SparkListenerApplicationStart":
            app_start = ev.get("Timestamp")
        elif e == "SparkListenerApplicationEnd":
            app_end = ev.get("Timestamp")
        elif e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "start": ev["Submission Time"],
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""),
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
            for s in ev.get("Stage Infos", []):
                stage_to_job[s["Stage ID"]] = jid
                stage_names[s["Stage ID"]] = s.get("Stage Name", "")
        elif e == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            tm = ev.get("Task Metrics") or {}
            stage_metrics[sid]["tasks"] += 1
            stage_metrics[sid]["run_s"] += tm.get("Executor Run Time", 0) / 1e3
            stage_metrics[sid]["cpu_s"] += tm.get("Executor CPU Time", 0) / 1e9
            stage_metrics[sid]["gc_s"] += tm.get("JVM GC Time", 0) / 1e3
            sw = tm.get("Shuffle Write Metrics") or {}
            stage_metrics[sid]["shw_s"] += sw.get("Shuffle Write Time", 0) / 1e9
            stage_metrics[sid]["shw_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
            sr = tm.get("Shuffle Read Metrics") or {}
            stage_metrics[sid]["shr_mb"] += (
                sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)) / 1e6
            stage_metrics[sid]["fetch_s"] += sr.get("Fetch Wait Time", 0) / 1e3
            inp = tm.get("Input Metrics") or {}
            stage_metrics[sid]["in_mb"] += inp.get("Bytes Read", 0) / 1e6

    order = sorted(jobs, key=lambda j: jobs[j]["start"])
    prev_end = app_start
    total_gap = total_job = 0.0
    by_desc = defaultdict(lambda: [0.0, 0.0, 0])  # wall, gap_before, count
    print(f"{'job':>4} {'wall_s':>8} {'gap_s':>7}  description")
    for jid in order:
        j = jobs[jid]
        end = j.get("end", j["start"])
        wall = (end - j["start"]) / 1e3
        gap = max(0.0, (j["start"] - prev_end) / 1e3) if prev_end else 0.0
        prev_end = max(prev_end or end, end)
        total_gap += gap
        total_job += wall
        d = j["desc"] or "(none)"
        by_desc[d][0] += wall
        by_desc[d][1] += gap
        by_desc[d][2] += 1
        print(f"{jid:>4} {wall:>8.2f} {gap:>7.2f}  {d[:90]}")
    tail_gap = (max(0.0, (app_end - prev_end) / 1e3)
                if app_end and prev_end else 0.0)
    print(f"\napp wall: {((app_end - app_start) / 1e3 if app_end and app_start else float('nan')):.2f} s"
          f" | in-job {total_job:.2f} s | driver gaps {total_gap:.2f} s"
          f" | tail {tail_gap:.2f} s | jobs {len(order)}")
    print("\nper-description rollup (wall s / gap-before s / jobs):")
    for d, (w, g, c) in sorted(by_desc.items(), key=lambda kv: -kv[1][0]):
        print(f"  {w:>8.2f} {g:>7.2f} {c:>3}  {d[:90]}")
    if show_stages:
        print("\nper-stage task-metric sums:")
        print(f"{'stage':>6} {'job':>4} {'tasks':>6} {'run_s':>8} {'cpu_s':>8} "
              f"{'gc_s':>6} {'shw_s':>7} {'shw_mb':>8} {'shr_mb':>8} {'in_mb':>8}  name")
        for sid in sorted(stage_metrics):
            m = stage_metrics[sid]
            print(f"{sid:>6} {stage_to_job.get(sid, -1):>4} {int(m['tasks']):>6} "
                  f"{m['run_s']:>8.1f} {m['cpu_s']:>8.1f} {m['gc_s']:>6.1f} "
                  f"{m['shw_s']:>7.1f} {m['shw_mb']:>8.1f} {m['shr_mb']:>8.1f} "
                  f"{m['in_mb']:>8.1f}  {stage_names.get(sid, '')[:60]}")
    return {"jobs": len(order), "in_job_s": total_job, "gap_s": total_gap}


if __name__ == "__main__":
    analyze(sys.argv[1], show_stages="--stages" in sys.argv)
