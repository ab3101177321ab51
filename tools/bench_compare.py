"""Round-over-round bench attribution under host drift.

Usage: python tools/bench_compare.py OLD.json NEW.json [--bar 0.10] [--abs 0.25]

This sandbox's host load varies between run windows: two back-to-back runs
of IDENTICAL code can differ by a uniform multiplicative factor (measured
up to 1.13x across a 9-minute gap). A raw per-query comparison then flags
everything in the same direction -- two rounds in a row that pattern was
misread as per-query drift. The estimator here:

1. global factor = MEDIAN over queries of new/old (robust: real per-query
   regressions are the minority, so they don't move the median);
2. normalize every new number by that factor;
3. flag a query only if the normalized delta exceeds BOTH the relative bar
   (default 10%) and an absolute floor (default 0.25 s -- sub-second
   queries swing +-100 ms on this host regardless of protocol).

Validated on three identical-code back-to-back pairs (see BENCH/NOTES.md
round 6): raw >10% counts of 7/34, 13/34, 19/34 reduce to 2/34, 5/34,
2/34 flagged, with the global factor correctly estimated (1.00, 1.00,
1.13). Accepts both raw bench JSON and the driver's BENCH_r{N}.json
wrapper (with a "parsed" key).
"""

from __future__ import annotations

import argparse
import json
import statistics


def queries_of(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    return {k: v for k, v in d["queries"].items() if isinstance(v, (int, float))}


def compare(old: dict, new: dict, bar: float, abs_floor: float):
    ks = sorted(k for k in old if k in new and old[k] > 0)
    factor = statistics.median(new[k] / old[k] for k in ks)
    rows = []
    for k in ks:
        norm = new[k] / factor
        delta = norm - old[k]
        flagged = abs(delta) > max(bar * old[k], abs_floor)
        rows.append((k, old[k], new[k], norm, delta / old[k], flagged))
    return factor, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--bar", type=float, default=0.10)
    ap.add_argument("--abs", dest="abs_floor", type=float, default=0.25)
    args = ap.parse_args()

    factor, rows = compare(
        queries_of(args.old), queries_of(args.new), args.bar, args.abs_floor
    )
    print(f"global host factor (median new/old): {factor:.3f}")
    print(f"{'query':30s} {'old':>8s} {'new':>8s} {'norm':>8s} {'ndelta':>8s}")
    for k, o, n, nn, d, fl in sorted(rows, key=lambda r: -abs(r[4])):
        mark = "  <-- ATTRIBUTABLE" if fl else ""
        print(f"{k:30s} {o:8.3f} {n:8.3f} {nn:8.3f} {d:+8.1%}{mark}")
    flagged = [r for r in rows if r[5]]
    print(f"\n{len(flagged)}/{len(rows)} queries exceed the attribution bar "
          f"(>{args.bar:.0%} AND >{args.abs_floor}s after normalization)")


if __name__ == "__main__":
    main()
