#!/usr/bin/env python3
"""Localize driver-idle gaps (no stage running) in a Spark event log:
prints the top gaps with the job/stage that ENDED before the gap and
the one that STARTED after it — the gap is driver-side planning,
collect processing, or engine driver code between actions.

Usage: python3 tools/gap_analysis.py <decompressed-eventlog-dir> [topN]
"""
import json
import os
import sys


def events(path):
    files = sorted(f for f in os.listdir(path) if f.startswith("events_"))
    for f in files:
        with open(os.path.join(path, f)) as fh:
            for line in fh:
                if line.strip():
                    yield json.loads(line)


def main():
    path = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    intervals = []
    names = {}
    for ev in events(path):
        if ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub, com = si.get("Submission Time"), si.get("Completion Time")
            if sub and com:
                intervals.append((sub, com, si["Stage ID"]))
                names[si["Stage ID"]] = si["Stage Name"].split("\n")[0][:60]
    intervals.sort()
    gaps = []
    cur_e, cur_sid = None, None
    for s, e, sid in intervals:
        if cur_e is not None and s > cur_e:
            gaps.append((s - cur_e, cur_sid, sid, cur_e))
        if cur_e is None or e > cur_e:
            cur_e, cur_sid = e, sid
    gaps.sort(reverse=True)
    total = sum(g[0] for g in gaps) / 1e3
    print(f"{len(gaps)} gaps, total {total:.1f}s; "
          f"count>=1s: {sum(1 for g in gaps if g[0] >= 1000)}, "
          f"sum<250ms: {sum(g[0] for g in gaps if g[0] < 250)/1e3:.1f}s "
          f"(n={sum(1 for g in gaps if g[0] < 250)})")
    for dur, before, after, t in gaps[:topn]:
        print(f"{dur/1e3:7.2f}s  after [{before}] {names.get(before,'')[:45]:45s} "
              f"-> [{after}] {names.get(after,'')[:45]}")


if __name__ == "__main__":
    main()
