#!/usr/bin/env python
"""Compute the recommended next _WINDOW_PRIORITY list.

Reads every CORRECTNESS_r*.json plus the live registry and prints a
50-name window in priority order:
  1. entries whose LATEST driver status is a failure (hash/schema/
     rows mismatch or error) — a failing entry must never sit outside
     the window while green entries get re-confirmed (round-3 lesson);
  2. entries never inside any driver window;
  3. green entries, oldest latest-test round first (re-confirms).

Paste the output over _WINDOW_PRIORITY in queries/__init__.py and
update its comment. This script only recommends — the committed list
stays explicit and reviewable.

Usage: python scripts/rotate_window.py [window_size]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fcs_etl_reactor_spark.queries import QUERIES


def main() -> int:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, tuple[int, bool]] = {}  # name -> (round, green)
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int("".join(ch for ch in os.path.basename(path) if ch.isdigit()))
        for name, rec in json.load(open(path)).items():
            green = bool(
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and not rec.get("err")
            )
            latest[name] = (rnd, green)

    names = list(QUERIES)
    failures = [n for n in names if n in latest and not latest[n][1]]
    never = [n for n in names if n not in latest]
    greens = sorted(
        (n for n in names if n in latest and latest[n][1]),
        key=lambda n: latest[n][0],
    )
    window = (failures + never + greens)[:size]

    print(f"# failures={len(failures)} never-tested={len(never)} "
          f"greens={len(greens)}; window={len(window)}")
    for n in failures:
        print(f"#   FAIL r{latest[n][0]}: {n}")
    print("_WINDOW_PRIORITY = [")
    for n in window:
        tag = ("FAIL" if n in failures
               else "never" if n in never
               else f"green r{latest[n][0]}")
        print(f'    "{n}",  # {tag}')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
