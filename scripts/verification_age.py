"""Regenerate the registry verification-age table from artifacts.

Reads every checked-in CORRECTNESS_r0N.json, computes each query's
last full-green driver round (rows+schema+hash, no err), and prints a
markdown table in registry order with the query's membership in the
CURRENT declared window (the `_WINDOW_R{N}` the registry leads with).
This is the single current-state table SURVEY §2 carries; the
per-round historical tables it replaces live in git history.

Usage: python scripts/verification_age.py [--summary]
"""
from __future__ import annotations

import glob
import json
import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def last_green() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        m = re.search(r"_r0*(\d+)\.json$", f)
        if not m:
            continue
        r = int(m.group(1))
        for k, v in json.load(open(f)).items():
            if (v.get("rows_match") and v.get("schema_match")
                    and v.get("hash_match") and not v.get("err")):
                last[k] = max(last.get(k, 0), r)
    return last


def current_window() -> tuple[int, list[str]]:
    rounds = sorted(
        int(n.split("_R")[1]) for n in vars(entrymod)
        if re.fullmatch(r"_WINDOW_R\d+", n))
    n = rounds[-1]
    return n, list(getattr(entrymod, f"_WINDOW_R{n}"))


def main() -> int:
    queries = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    lg = last_green()
    wn, window = current_window()
    head = set(window[:50])
    if "--summary" in sys.argv:
        dist = Counter(lg[q] for q in queries if q in lg)
        print(f"registry: {len(queries)} queries, "
              f"{len([q for q in queries if q in oracles])} oracle-gated")
        print(f"last-green distribution: "
              f"{dict(sorted(dist.items()))}")
        print(f"never driver-checked: "
              f"{[q for q in queries if q not in lg]}")
        return 0
    print(f"| query | last driver-green | r{wn} window |")
    print("|---|---|---|")
    for q in queries:
        g = f"r{lg[q]}" if q in lg else "—"
        w = "head" if q in head else ("tail" if q in window else "")
        gate = "" if q in oracles else " (rows-only)"
        print(f"| {q}{gate} | {g} | {w} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
