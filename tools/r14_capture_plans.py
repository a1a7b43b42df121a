#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/r14/.

Usage: python tools/r14_capture_plans.py <suffix> <query> [query ...]
Writes plans/r14/<query>_<suffix>.txt relative to the REPO this file
lives in (so a git worktree of the pre-change tree writes its own copy;
copy the files into the main repo's plans/r14/ afterwards).

Plan capture is analysis-only except for operators whose construction
runs eager jobs (the kmeans/dedup_clusters convention) — those still
execute their driver loops, so run this when no bench is in flight.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_schema_builder_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="r14_capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = dict(entrymod.queries())
    try:
        import bench

        queries.update(bench.EXTRA)
    except Exception:
        pass
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
