#!/usr/bin/env python3
"""Per-query ratio between two Bench artifacts (e.g. the sf1-class
10x corpus vs sf0.1): flags queries whose wall-clock grew faster than
the data (ratio > threshold), the fixed-cost-amortization check the
full-suite scale bench exists for.

Usage: bench_ratio.py <base.json> <scaled.json> [threshold=10.0]
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    base, scaled = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    bq, sq = base["queries"], scaled["queries"]
    shared = sorted(set(bq) & set(sq))
    rows = [(k, bq[k], sq[k], sq[k] / max(bq[k], 1e-9)) for k in shared]
    rows.sort(key=lambda r: -r[3])
    over = [r for r in rows if r[3] > threshold]
    print(f"shared={len(shared)} base_total={sum(bq[k] for k in shared):.1f}s "
          f"scaled_total={sum(sq[k] for k in shared):.1f}s "
          f"total_ratio={sum(sq[k] for k in shared)/max(sum(bq[k] for k in shared),1e-9):.2f}")
    print(f"queries over {threshold}x: {len(over)}")
    for k, b, s, r in rows[:25]:
        flag = " <-- OVER" if r > threshold else ""
        print(f"  {k:32s} {b:8.3f}s -> {s:8.3f}s  {r:6.2f}x{flag}")


if __name__ == "__main__":
    main()
