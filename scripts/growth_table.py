#!/usr/bin/env python3
"""Emit the sf0.1 -> sf1.0 growth table for BENCH.md (round-11
verdict order #3): per-query seconds at both SFs, growth ratio,
sorted by sf1.0 cost. Flags growth against a declared volume class:
~1x fixed-overhead, ~10x linear, ~30x loop/bucket, >100x quadratic.

Usage: python3 scripts/growth_table.py BENCH_LAST.json /tmp/BENCH_SF1.json [topN]
"""
import json, sys

small = json.load(open(sys.argv[1]))["queries"]
big = json.load(open(sys.argv[2]))["queries"]
top = int(sys.argv[3]) if len(sys.argv) > 3 else 30

rows = []
for q, b in big.items():
    s = small.get(q)
    if s is None or s <= 0 or b <= 0:
        continue
    rows.append((q, s, b, b / s))
rows.sort(key=lambda r: -r[2])

total_s = sum(r[1] for r in rows)
total_b = sum(r[2] for r in rows)
print(f"{len(rows)} queries; total {total_s:.1f}s -> {total_b:.1f}s "
      f"({total_b/total_s:.1f}x)\n")
print("| query | sf0.1 s | sf1.0 s | growth |")
print("|---|---|---|---|")
for q, s, b, g in rows[:top]:
    print(f"| {q} | {s:.2f} | {b:.2f} | {g:.1f}x |")

hi = [(q, s, b, g) for q, s, b, g in rows if g > 15]
print(f"\n{len(hi)} queries with growth > 15x:")
for q, s, b, g in sorted(hi, key=lambda r: -r[3]):
    print(f"  {q}: {s:.2f} -> {b:.2f} ({g:.1f}x)")
failed = sorted(q for q, v in big.items() if v < 0)
if failed:
    print(f"\nFAILED at sf1.0: {failed}")
