#!/usr/bin/env python3
"""Round-18 sweep-health report: compare a full-registry 100x sweep
against (a) a prior sweep and (b) standalone quiet-box cells, and
surface the JVM-health columns (gc_sec / cached_mb) the round-18
instrumentation added. The verdict-#1 acceptance is max(in-sweep /
standalone) <= ~1.5 on untouched keys.

Usage: python3 scripts/sweep_tails.py NEW.json OLD.json [key=standalone_sec ...]
"""
import json, sys

new = json.load(open(sys.argv[1]))
old = json.load(open(sys.argv[2]))
standalone = {}
for kv in sys.argv[3:]:
    k, v = kv.split("=")
    standalone[k] = float(v)

nq, oq = new["queries"], old["queries"]
ratios = sorted(
    ((k, nq[k], oq[k], nq[k] / oq[k]) for k in nq
     if k in oq and oq[k] > 1.0 and nq[k] > 0),
    key=lambda r: -r[3])
import statistics
med = statistics.median(r[3] for r in ratios)
print(f"{len(ratios)} shared >1s keys; median new/old = {med:.3f}")
print(f"new total {new['value']:.1f}s vs old total {old['value']:.1f}s")
print("\nworst 15 new/old ratios:")
for k, n, o, r in ratios[:15]:
    gc = new.get("gc_sec", {}).get(k, 0.0)
    cm = new.get("cached_mb", {}).get(k, 0.0)
    print(f"  {k}: {o:.1f} -> {n:.1f} ({r:.2f}x)  gc={gc}s cached={cm}MB")
print("\nbest 15 (improvements):")
for k, n, o, r in ratios[-15:]:
    print(f"  {k}: {o:.1f} -> {n:.1f} ({r:.2f}x)")

if standalone:
    print("\nin-sweep vs standalone (verdict-#1 acceptance <= ~1.5):")
    for k, s in sorted(standalone.items()):
        n = nq.get(k, -1)
        print(f"  {k}: sweep {n:.1f} / standalone {s:.1f} = {n / s:.2f}x")

gs = new.get("gc_sec", {})
if gs:
    tot = sum(gs.values())
    top = sorted(gs.items(), key=lambda kv: -kv[1])[:10]
    print(f"\ntotal sweep gc = {tot:.0f}s; top gc keys:")
    for k, v in top:
        print(f"  {k}: gc={v}s  t={nq.get(k, -1):.1f}s")
cm = new.get("cached_mb", {})
if cm:
    top = sorted(cm.items(), key=lambda kv: -kv[1])[:10]
    print("\ntop cached_mb keys (per-key block residency):")
    for k, v in top:
        print(f"  {k}: {v}MB  t={nq.get(k, -1):.1f}s")
