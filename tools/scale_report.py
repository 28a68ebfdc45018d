#!/usr/bin/env python3
"""Per-query scaling report between two graft.Bench JSON lines.

Usage: python3 tools/scale_report.py <bench_sf0.1.json> <bench_sf1.json>

Prints a markdown table of per-query seconds at both SFs and the
ratio (sf1 / sf0.1, i.e. the cost of 10x the data), sorted by ratio
descending, flagging anything super-linear (ratio > 10).
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main(small_path, big_path):
    small, big = load(small_path), load(big_path)
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in sorted(set(qs) & set(qb)):
        # a failed query is {"err": ...} instead of seconds — report it
        if not isinstance(qs[name], (int, float)) or not isinstance(qb[name], (int, float)):
            print(f"FAILED {name}: sf0.1={qs[name]} sf1={qb[name]}", file=sys.stderr)
            continue
        ratio = qb[name] / qs[name] if qs[name] > 0 else float("inf")
        rows.append((ratio, name, qs[name], qb[name]))
    rows.sort(reverse=True)
    print("| query | sf0.1 s | sf1 s | ratio (10x data) |")
    print("|---|---|---|---|")
    for ratio, name, s, b in rows:
        flag = " **SUPER-LINEAR**" if ratio > 10 else ""
        print(f"| {name} | {s:.2f} | {b:.2f} | {ratio:.1f}x{flag} |")
    ts, tb = small["value"], big["value"]
    print(f"\ntotal: {ts:.1f} s -> {tb:.1f} s ({tb / ts:.1f}x for 10x data); "
          f"queries super-linear (>10x): {sum(1 for r in rows if r[0] > 10)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
