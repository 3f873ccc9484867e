#!/usr/bin/env python
"""Dump .explain("formatted") for named queries into plans/r12/ as
<query>_<suffix>.txt — the optimization round's before/after evidence.

Usage: python scripts/dump_r12_plans.py --suffix before q1_pricing_summary ...
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fcs_etl_reactor_spark.queries import QUERIES
from fcs_etl_reactor_spark.session import get_spark, tune_for_input


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--suffix", required=True, help="before | after")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--outdir", default=os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "plans", "r12"))
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    spark = tune_for_input(get_spark(app_name="dump-r12-plans"), args.sf_dir)
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.queries:
        df = QUERIES[name](spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain(formatted) at {args.sf_dir} [{args.suffix}]\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
