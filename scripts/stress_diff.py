#!/usr/bin/env python3
"""Mechanical verdict for 20x-stress regressions.

Compares two STRESS_r*.json artifacts (Bench JSON-line format) and
fails (exit 1) iff any query regressed beyond tolerance. Tolerance is
deliberately two-sided to match the measured noise profile (NOTES.md:
sub-second queries wobble +/-20% and worse on cold page cache): a
regression must be BOTH >2x the old time AND >2s absolute. Crashed
queries (-1) always fail. New queries are listed, never failed, so
adding coverage can't break the gate.

Usage: scripts/stress_diff.py STRESS_r03.json STRESS_r04.json
"""
import json
import sys


def load(path):
    with open(path) as f:
        doc = json.loads(f.read().strip().splitlines()[-1])
    return doc["queries"]


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    old, new = load(old_path), load(new_path)
    crashed = sorted(q for q, t in new.items() if t < 0)
    regressed = sorted(
        q for q, t in new.items()
        if q in old and old[q] >= 0 and t >= 0
        and t > 2 * old[q] and t - old[q] > 2.0)
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    improved = sorted(
        (q for q, t in new.items()
         if q in old and old[q] > 2 * t and old[q] - t > 2.0),
        key=lambda q: new[q] - old[q])

    tot_old = sum(t for q, t in old.items() if t >= 0 and q in new)
    tot_new = sum(t for q, t in new.items() if t >= 0 and q in old)
    print(f"common-query total: {tot_old:.1f}s -> {tot_new:.1f}s")
    for q in improved:
        print(f"IMPROVED  {q}: {old[q]:.2f}s -> {new[q]:.2f}s")
    for q in added:
        print(f"ADDED     {q}: {new[q]:.2f}s")
    for q in removed:
        print(f"REMOVED   {q} (was {old[q]:.2f}s)")
    for q in regressed:
        print(f"REGRESSED {q}: {old[q]:.2f}s -> {new[q]:.2f}s")
    for q in crashed:
        print(f"CRASHED   {q}")
    if regressed or crashed:
        print("VERDICT: FAIL")
        return 1
    print("VERDICT: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
