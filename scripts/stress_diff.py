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
    return doc


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    old_doc, new_doc = load(old_path), load(new_path)
    old, new = old_doc["queries"], new_doc["queries"]
    # standing flip-victim list carried by the artifact itself (queries
    # requalified as execution-flip victims in >=2 rounds): a regression
    # on one of these is classified separately — "recurring victim,
    # requalify before believing" — so it is distinguishable from a
    # fresh plan regression without reading NOTES
    flip_watch = set(new_doc.get("flip_watch", []))
    requalified = {r.split(":")[0] for r in new_doc.get("requalified", [])}
    crashed = sorted(q for q, t in new.items() if t < 0)
    regressed_all = sorted(
        q for q, t in new.items()
        if q in old and old[q] >= 0 and t >= 0
        and t > 2 * old[q] and t - old[q] > 2.0)
    regressed = [q for q in regressed_all if q not in flip_watch]
    flipwatch_hits = [q for q in regressed_all if q in flip_watch]
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
    for q in flipwatch_hits:
        tag = "requalified yet STILL slow" if q in requalified \
            else "NOT requalified this run — re-measure before believing"
        print(f"FLIPWATCH {q}: {old[q]:.2f}s -> {new[q]:.2f}s "
              f"(recurring flip victim; {tag})")
    for q in crashed:
        print(f"CRASHED   {q}")
    if regressed or crashed:
        print("VERDICT: FAIL")
        return 1
    if flipwatch_hits:
        # known recurring victims above gate: fail, but say what it is —
        # the requalification protocol is the resolution path
        print("VERDICT: FAIL (flip-watch victims only — requalify, then re-diff)")
        return 1
    print("VERDICT: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
