#!/usr/bin/env python3
"""Summarize GRAFT_TRACE output from a ScalingBench window log.

Groups the [trace] lines into child runs (a run starts at its `init`
line), labels each run with the pinned level inferred from run order
(warm-up + best-of-K per level, low level first), and prints per-phase
wall time for the BEST run at each level plus the 4x-scaling residual:
phases whose time does not fall ~4x from the low to the high level are
where the serial term lives.

Usage: python3 tools/trace_summary.py <window.log> [nLow] [nHigh] [bestOf]
"""
import re
import sys
from collections import defaultdict


def main():
    path = sys.argv[1]
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    best_of = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    pat = re.compile(r"\[trace\] wave=(-?\d+) (\S+)\s+([\d.]+)s")
    runs = []  # list of dict: (wave, phase) -> sec
    for line in open(path, errors="replace"):
        m = pat.search(line)
        if not m:
            continue
        wave, phase, sec = int(m.group(1)), m.group(2), float(m.group(3))
        if phase == "init":
            runs.append({})
        if runs:
            runs[-1][(wave, phase)] = sec
    # per level: 1 warm-up + best_of measured runs
    per_level = 1 + best_of
    if len(runs) < 2 * per_level:
        print(f"warning: {len(runs)} runs parsed, expected {2*per_level}; "
              "labeling best-effort")
    levels = {}
    for i, run in enumerate(runs):
        level = n_low if i < per_level else n_high
        warm = (i % per_level) == 0
        if warm:
            continue
        levels.setdefault(level, []).append(run)
    best = {lvl: min(rs, key=lambda r: sum(r.values()))
            for lvl, rs in levels.items()}
    phases = sorted({k for r in best.values() for k in r},
                    key=lambda k: (k[0], k[1]))
    lo, hi = best.get(n_low, {}), best.get(n_high, {})
    print(f"{'wave':>4} {'phase':<20} {f'{n_low}c':>8} {f'{n_high}c':>8} "
          f"{'ratio':>6}  (ratio ~= " + f"{n_high//n_low}.0 = perfect scaling)")
    t_lo = t_hi = serial = 0.0
    for w, p in phases:
        a, b = lo.get((w, p), 0.0), hi.get((w, p), 0.0)
        t_lo += a
        t_hi += b
        ratio = a / b if b > 0 else float("nan")
        print(f"{w:>4} {p:<20} {a:>8.2f} {b:>8.2f} {ratio:>6.2f}")
        # serial component s solves: a = w_par + s, b = w_par*nlow/nhigh + s
        k = n_low / n_high
        s = max(0.0, (b - k * a) / (1 - k))
        serial += s
    print(f"{'':>4} {'TOTAL':<20} {t_lo:>8.2f} {t_hi:>8.2f} "
          f"{t_lo/t_hi if t_hi else float('nan'):>6.2f}")
    print(f"back-solved serial term (sum of per-phase max(0,(hi-k*lo)/(1-k))): "
          f"{serial:.1f}s/run")
    eff = t_lo / (t_hi * (n_high / n_low)) if t_hi else float("nan")
    print(f"traced-phase efficiency {n_low}->{n_high}: {eff:.3f}")


if __name__ == "__main__":
    main()
