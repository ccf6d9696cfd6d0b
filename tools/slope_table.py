#!/usr/bin/env python3
"""Per-key slope table between two graft.Bench JSON lines (e.g. sf30 vs
sf100 from the decade-cadence sweeps). Prints markdown sorted by slope,
flagging keys whose time grew superlinearly vs the data factor.

Usage: slope_table.py <bench_small.json> <bench_big.json> <data_factor>
(data_factor: e.g. 3.33 for sf30 -> sf100.)
"""
import json
import sys


def load(path: str) -> dict:
    # a captured log can hold several bench JSON lines (back-to-back sweeps
    # in one window): take the LAST one — the most recent run — and say so,
    # instead of silently using the earliest.
    matches = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"metric"'):
                matches.append(line)
    if not matches:
        raise SystemExit(f"no bench JSON line in {path}")
    if len(matches) > 1:
        print(f"[slope_table] {path}: {len(matches)} bench lines, using the last",
              file=sys.stderr)
    return json.loads(matches[-1])


def main(small_p: str, big_p: str, factor: float) -> None:
    small, big = load(small_p), load(big_p)
    qs, qb = small["queries"], big["queries"]
    common = sorted(set(qs) & set(qb))
    rows = []
    for k in common:
        a, b = qs[k], qb[k]
        slope = b / a if a > 0 else float("inf")
        rows.append((slope, k, a, b))
    rows.sort(reverse=True)
    print(f"| key | {small.get('sf','small')} | {big.get('sf','big')} | slope (data x{factor}) |")
    print("|---|---|---|---|")
    for slope, k, a, b in rows:
        flag = " **superlinear**" if slope > factor * 1.5 and b > 1.0 else ""
        print(f"| {k} | {a:.2f} s | {b:.2f} s | {slope:.2f}x{flag} |")
    n_super = sum(1 for s, k, a, b in rows if s > factor * 1.5 and b > 1.0)
    print(f"\n{len(common)} keys; totals {sum(qs[k] for k in common):.1f} s -> "
          f"{sum(qb[k] for k in common):.1f} s "
          f"({sum(qb[k] for k in common)/max(1e-9,sum(qs[k] for k in common)):.2f}x); "
          f"{n_super} superlinear (> {factor*1.5:.1f}x and > 1 s)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]))
