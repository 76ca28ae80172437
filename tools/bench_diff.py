#!/usr/bin/env python3
"""Diff two BENCH_FULL json artifacts: per-query min-of-N ratios,
sorted by absolute delta. Usage: bench_diff.py OLD NEW [topN]"""
import json
import sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
top = int(sys.argv[3]) if len(sys.argv) > 3 else 30
om, nm = old.get("queries_min", old["queries"]), new.get("queries_min", new["queries"])
common = sorted(set(om) & set(nm))
rows = [(k, om[k], nm[k], nm[k] - om[k], (nm[k] / om[k]) if om[k] > 0 else float("inf"))
        for k in common]
rows.sort(key=lambda r: r[3])
print(f"{'query':38s} {'old':>8s} {'new':>8s} {'delta':>8s} {'ratio':>6s}")
# head/tail must not overlap when there are fewer than 2*top rows,
# or every middle row would print twice as a phantom second set
head = rows[:top]
tail = rows[len(head):][-top:]
for k, o, n, d, r in head:
    print(f"{k:38s} {o:8.3f} {n:8.3f} {d:+8.3f} {r:6.2f}")
if tail:
    print("...")
for k, o, n, d, r in tail:
    print(f"{k:38s} {o:8.3f} {n:8.3f} {d:+8.3f} {r:6.2f}")
tot_o = sum(om[k] for k in common)
tot_n = sum(nm[k] for k in common)
import statistics
med = statistics.median(nm[k] / om[k] for k in common if om[k] > 0)
print(f"\ncommon={len(common)} total_min old={tot_o:.1f}s new={tot_n:.1f}s "
      f"delta={tot_n - tot_o:+.1f}s median_ratio={med:.3f}")
flag = [k for k, o, n, d, r in rows if r > 1.5 and n > 0.2]
print("ratio>1.5 (and new>0.2s):", flag)
