#!/usr/bin/env python3
"""Per-SQL-execution breakdown of a Spark event log.

For each SQLExecutionStart..End: wall time, #jobs, #stages, sum of task
time, sum of GC time, and the driver-side remainder (wall - stage wall
coverage). Points at executions whose wall far exceeds their task
time/cores — the driver/planning/scheduling-bound ones.

Usage: eventlog_exec.py <events_file> [min_wall_sec]
"""
import json
import sys
from collections import defaultdict


def main():
    path = sys.argv[1]
    min_wall = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    execs = {}          # execId -> dict
    job_exec = {}       # jobId -> execId
    stage_job = {}      # stageId -> jobId
    stage_info = defaultdict(lambda: dict(task=0.0, gc=0.0, n=0,
                                          sub=None, done=None, name=""))
    for line in open(path, errors="replace"):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event", "")
        if ev.endswith("SQLExecutionStart"):
            execs[e["executionId"]] = dict(
                desc=e.get("description", "")[:90], t0=e["time"], t1=None,
                jobs=set())
        elif ev.endswith("SQLExecutionEnd"):
            if e["executionId"] in execs:
                execs[e["executionId"]]["t1"] = e["time"]
        elif ev == "SparkListenerJobStart":
            props = e.get("Properties", {}) or {}
            eid = props.get("spark.sql.execution.id")
            if eid is not None:
                job_exec[e["Job ID"]] = int(eid)
                if int(eid) in execs:
                    execs[int(eid)]["jobs"].add(e["Job ID"])
            for sid in e.get("Stage IDs", []):
                stage_job[sid] = e["Job ID"]
        elif ev == "SparkListenerStageSubmitted":
            si = e["Stage Info"]
            s = stage_info[si["Stage ID"]]
            s["sub"] = si.get("Submission Time")
            s["name"] = si.get("Stage Name", "")[:60]
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            s = stage_info[si["Stage ID"]]
            s["sub"] = si.get("Submission Time") or s["sub"]
            s["done"] = si.get("Completion Time")
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            m = e.get("Task Metrics") or {}
            s = stage_info[sid]
            s["task"] += m.get("Executor Run Time", 0) / 1e3
            s["gc"] += m.get("JVM GC Time", 0) / 1e3
            s["n"] += 1

    rows = []
    for eid, x in sorted(execs.items()):
        if x["t1"] is None:
            continue
        wall = (x["t1"] - x["t0"]) / 1e3
        if wall < min_wall:
            continue
        sids = [sid for sid, j in stage_job.items() if j in x["jobs"]]
        task = sum(stage_info[s]["task"] for s in sids)
        gc = sum(stage_info[s]["gc"] for s in sids)
        ntask = sum(stage_info[s]["n"] for s in sids)
        # stage wall coverage: union of [sub, done] intervals
        iv = sorted((stage_info[s]["sub"], stage_info[s]["done"])
                    for s in sids if stage_info[s]["sub"] and stage_info[s]["done"])
        cover = 0
        cur = None
        for a, b in iv:
            if cur is None or a > cur[1]:
                if cur:
                    cover += cur[1] - cur[0]
                cur = [a, b]
            else:
                cur[1] = max(cur[1], b)
        if cur:
            cover += cur[1] - cur[0]
        rows.append((wall, eid, len(x["jobs"]), len(sids), ntask, task, gc,
                     cover / 1e3, x["desc"]))
    print(f"{'wall':>7} {'eid':>4} {'jobs':>4} {'stg':>4} {'tasks':>6} "
          f"{'taskSec':>8} {'gcSec':>7} {'stgWall':>8}  desc")
    for wall, eid, nj, ns, nt, task, gc, cover, desc in rows:
        print(f"{wall:>7.2f} {eid:>4} {nj:>4} {ns:>4} {nt:>6} "
              f"{task:>8.1f} {gc:>7.1f} {cover:>8.2f}  {desc}")


if __name__ == "__main__":
    main()
