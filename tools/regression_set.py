#!/usr/bin/env python3
"""Compute the slow-head + regression re-run set from two BENCH_FULL artifacts.

Usage: tools/regression_set.py PREV_BENCH_FULL.json CURR_BENCH_FULL.json

Emits (stdout) the comma-separated query list to pass as
SPARK_GRAFT_BENCH_ONLY for the quiet min-of-5 re-run, plus a human table
on stderr. The set is the union of:
  - the N_SLOW (default 14) slowest queries of the current artifact
    (by min-of-N), and
  - every query whose min-of-N ratio curr/prev exceeds RATIO (default
    1.5x) — the round-10 protocol gap: cm01 regressed 4.9x in a
    contended driver run but was not among the 14 slowest, so no
    adjudication artifact covered it.
Queries new in CURR (no prev value) are listed separately: they have no
round-over-round ratio and are covered by their SCALING.md growth rows.
"""
import json
import sys

N_SLOW = 14
RATIO = 1.5


def mins(path):
    d = json.load(open(path))
    return {k: v for k, v in d["queries_min"].items() if v >= 0}


def main():
    prev, curr = mins(sys.argv[1]), mins(sys.argv[2])
    slow = sorted(curr, key=lambda k: -curr[k])[:N_SLOW]
    regressed = sorted(
        k for k in curr if k in prev and prev[k] > 0
        and curr[k] / prev[k] > RATIO)
    new = sorted(k for k in curr if k not in prev)
    rerun = sorted(set(slow) | set(regressed))
    for k in rerun:
        r = f"{curr[k] / prev[k]:.2f}x" if k in prev and prev[k] > 0 else "new"
        tag = []
        if k in slow:
            tag.append("slow")
        if k in regressed:
            tag.append(f"regressed {r}")
        print(f"  {k:32s} prev={prev.get(k, float('nan')):7.3f} "
              f"curr={curr[k]:7.3f}  [{', '.join(tag)}]", file=sys.stderr)
    if new:
        print(f"  new (no prev, growth-table covered): {', '.join(new)}",
              file=sys.stderr)
    print(",".join(rerun))


if __name__ == "__main__":
    main()
