#!/usr/bin/env python3
"""Scaling gate: compare two graft.Bench artifacts (per-query MIN times)
at two scale factors and fail if any query's ratio exceeds the bound.

Usage: check_sf1_ratio.py <bench_sf0.1.json> <bench_sf1.json> [max_ratio=12]

Sub-second queries are dominated by Spark's fixed per-job cost, so the
denominator is floored at 0.15 s — a 0.05 s -> 0.6 s move is scheduler
noise, not a scaling defect; a 2 s -> 25 s move is exactly what this
gate exists to catch (round 13 found two real quadratics this way).
"""
import json
import sys

base_f, big_f, = sys.argv[1], sys.argv[2]
max_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0
FLOOR = 0.15

base = json.load(open(base_f))["queries_min"]
big = json.load(open(big_f))["queries_min"]

missing = sorted(set(base) - set(big)) + sorted(set(big) - set(base))
if missing:
    print(f"FAIL: query sets differ: {missing}")
    sys.exit(1)

bad = []
rows = []
for q in sorted(base):
    if base[q] < 0 or big[q] < 0:
        bad.append((q, "errored"))
        continue
    ratio = big[q] / max(base[q], FLOOR)
    rows.append((ratio, q, base[q], big[q]))
    if ratio > max_ratio:
        bad.append((q, f"{ratio:.1f}x"))

rows.sort(reverse=True)
print(f"{'query':28s} {'sf0.1':>7s} {'sf1':>8s} {'ratio':>6s}")
for ratio, q, b, g in rows[:15]:
    print(f"{q:28s} {b:7.2f} {g:8.2f} {ratio:5.1f}x")
print(f"... ({len(rows)} queries; bound {max_ratio}x, floor {FLOOR}s)")

if bad:
    print(f"FAIL: {len(bad)} queries exceed {max_ratio}x for 10x data: {bad}")
    sys.exit(1)
print(f"PASS: all {len(rows)} queries scale at or below {max_ratio}x")
