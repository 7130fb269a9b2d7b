#!/usr/bin/env python3
"""Zero-regression sweep between two quiet bench artifacts.

Compares per-query MEDIANS (dispersion[1]) at the established gate:
flag a query only if new_median > 2x old_median AND the absolute move
exceeds +0.5 s. Prints trips plus the largest moves either way.
Usage: bench_sweep.py OLD.json NEW.json
"""
import json, sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
om = {k: v[1] for k, v in old.get("dispersion", {}).items()}
nm = {k: v[1] for k, v in new.get("dispersion", {}).items()}
shared = sorted(set(om) & set(nm))
trips = [(k, om[k], nm[k]) for k in shared
         if nm[k] > 2 * om[k] and nm[k] - om[k] > 0.5]
moves = sorted(((nm[k] - om[k], k) for k in shared), reverse=True)
print(f"shared queries: {len(shared)}; new-only: {sorted(set(nm)-set(om))}")
print(f"old sum(medians)={sum(om[k] for k in shared):.1f}s  "
      f"new sum(medians)={sum(nm[k] for k in shared):.1f}s (shared only)")
print(f"gate trips (2x AND +0.5s): {len(trips)}")
for k, o, n in trips:
    print(f"  TRIP {k}: {o:.3f} -> {n:.3f}")
print("largest moves (+):")
for d, k in moves[:8]:
    print(f"  {k}: {om[k]:.3f} -> {nm[k]:.3f} ({d:+.3f})")
print("largest moves (-):")
for d, k in moves[-5:]:
    print(f"  {k}: {om[k]:.3f} -> {nm[k]:.3f} ({d:+.3f})")
