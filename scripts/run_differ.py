#!/usr/bin/env python
"""Run the local oracle differ over all registered queries.

Usage: python scripts/run_differ.py [sf_dir] [query ...]
"""

import sys

sys.path.insert(0, ".")

from fcs_etl_reactor_spark.session import get_spark
from fcs_etl_reactor_spark.testkit import run_all


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    spark = get_spark()
    results = run_all(spark, sf_dir, only=only)
    n_ok = sum(r.ok for r in results)
    for r in results:
        print(r)
        if not r.ok and r.mismatches:
            for s, o in r.mismatches:
                print(f"    spark : {s}")
                print(f"    oracle: {o}")
    print(f"\n{n_ok}/{len(results)} oracle-checked queries match at {sf_dir}")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
