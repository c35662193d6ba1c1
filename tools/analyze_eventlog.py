#!/usr/bin/env python3
"""Decompose a ScalingChild Spark event log into per-stage wall vs
core-seconds, GC share, and scheduler-gap time.

Usage: python3 tools/analyze_eventlog.py <eventlog-dir-or-file> [topN]

Prints, per stage (aggregated over attempts): wall (submission->
completion), sum of task run time (core-s), sum of GC time, task count
— then totals including the "no stage running" driver-gap time, which
is the parallelism-resistant serial term the north-rule scaling bar is
sensitive to.
"""
import json
import os
import sys
from collections import defaultdict


def events(path):
    if os.path.isdir(path):
        # eventlog_v2 rolling dir: appstatus file marks completion
        files = sorted(
            f for f in os.listdir(path)
            if f.startswith("events_") or f.startswith("eventLog")
        ) or [f for f in os.listdir(path) if not f.startswith("appstatus")]
        for f in files:
            with open(os.path.join(path, f)) as fh:
                for line in fh:
                    if line.strip():
                        yield json.loads(line)
    else:
        with open(path) as fh:
            for line in fh:
                if line.strip():
                    yield json.loads(line)


def main():
    path = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    stages = {}  # (stageId) -> dict
    gaps = []
    intervals = []  # (submit, complete) per stage
    task_run = defaultdict(float)
    task_gc = defaultdict(float)
    task_cnt = defaultdict(int)
    task_cpu = defaultdict(float)
    shuffle_w = defaultdict(float)
    app_start = app_end = None
    for ev in events(path):
        e = ev.get("Event")
        if e == "SparkListenerApplicationStart":
            app_start = ev["Timestamp"]
        elif e == "SparkListenerApplicationEnd":
            app_end = ev["Timestamp"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            com = si.get("Completion Time")
            if sub and com:
                stages[sid] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "wall": (com - sub) / 1e3,
                    "sub": sub,
                    "com": com,
                    "ntask": si.get("Number of Tasks"),
                }
                intervals.append((sub, com))
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            m = ev.get("Task Metrics") or {}
            task_run[sid] += m.get("Executor Run Time", 0) / 1e3
            task_gc[sid] += m.get("JVM GC Time", 0) / 1e3
            task_cpu[sid] += m.get("Executor CPU Time", 0) / 1e9
            task_cnt[sid] += 1
            sw = m.get("Shuffle Write Metrics") or {}
            shuffle_w[sid] += sw.get("Shuffle Write Time", 0) / 1e9

    # merge stage intervals to find covered wall vs gaps
    intervals.sort()
    covered = 0.0
    cur_s = cur_e = None
    for s, e in intervals:
        if cur_s is None:
            cur_s, cur_e = s, e
        elif s <= cur_e:
            cur_e = max(cur_e, e)
        else:
            covered += cur_e - cur_s
            cur_s, cur_e = s, e
    if cur_s is not None:
        covered += cur_e - cur_s
    covered /= 1e3

    total_wall = ((app_end or cur_e) - app_start) / 1e3 if app_start else 0
    rows = []
    for sid, st in stages.items():
        rows.append((
            st["wall"], task_run.get(sid, 0), task_gc.get(sid, 0),
            task_cpu.get(sid, 0), task_cnt.get(sid, 0), st["ntask"],
            sid, st["name"],
        ))
    rows.sort(reverse=True)
    print(f"app wall {total_wall:.1f}s | stage-covered {covered:.1f}s | "
          f"driver gaps {total_wall - covered:.1f}s")
    print(f"sum task-run {sum(task_run.values()):.1f} core-s | "
          f"sum task-cpu {sum(task_cpu.values()):.1f} core-s | "
          f"sum GC {sum(task_gc.values()):.1f} core-s | "
          f"stages {len(stages)} | tasks {sum(task_cnt.values())}")
    print(f"{'wall':>8} {'run':>9} {'cpu':>9} {'gc':>7} {'tasks':>6}  stage")
    for wall, run, gc, cpu, cnt, ntask, sid, name in rows[:topn]:
        print(f"{wall:8.1f} {run:9.1f} {cpu:9.1f} {gc:7.1f} {cnt:6d}  [{sid}] {name}")


if __name__ == "__main__":
    main()
