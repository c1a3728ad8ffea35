#!/usr/bin/env python3
"""Compare two bench_full artifacts: per-query ratios, movers, new rows.

Usage: bench_compare.py OLD.json NEW.json [threshold]
"""
import json
import sys


def main(old_path, new_path, thr=1.3):
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    common = sorted(set(old) & set(new))
    ratios = sorted(((new[q] / old[q], q) for q in common if old[q] > 0))
    med = ratios[len(ratios) // 2][0]
    print(f"common={len(common)} median_ratio={med:.3f} "
          f"old_total={sum(old.values()):.1f}s new_total={sum(new.values()):.1f}s")
    print("-- slower than threshold --")
    for r, q in reversed(ratios):
        if r >= thr and new[q] > 0.3:
            print(f"  {q}: {old[q]:.2f} -> {new[q]:.2f}  (x{r:.2f})")
    print("-- top movers faster --")
    for r, q in ratios[:8]:
        if old[q] > 0.5:
            print(f"  {q}: {old[q]:.2f} -> {new[q]:.2f}  (x{r:.2f})")
    print("-- new queries --")
    for q in sorted(set(new) - set(old)):
        print(f"  {q}: {new[q]:.2f}")
    print("-- heaviest new-run rows --")
    for q in sorted(new, key=lambda q: -new[q])[:12]:
        print(f"  {q}: {new[q]:.2f}")


if __name__ == "__main__":
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    main(sys.argv[1], sys.argv[2], thr)
