#!/usr/bin/env python
"""Round-11 isolated A/B for the r10 verdict's two unexplained bench
movers (verdict item #6): q_ivfpq_topk 1.44x and q_bm25_search 1.42x
vs the committed r10-continuation detail, on the slowest-drift host
band ever recorded (1.314). Neither code path changed in r10, so the
expected verdict is drift — this run settles it the only trusted way
(the r4/r9 lesson: bench-diff attribution without isolation fabricates
regressions AND non-regressions).

Discipline (the r3 precedent): interleaved median-of-5 on an idle
host, clearCache + release_caches between samples, warm-up pass at
sf0.001. Record the verdict in BASELINE.md the day it runs.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_schema_builder_spark.session import get_spark, release_caches  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

QUERIES = ["q_ivfpq_topk", "q_bm25_search"]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = 5


def main() -> None:
    spark = get_spark(app_name="r11-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for n in QUERIES:
        qs[n](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        release_caches()
        spark.catalog.clearCache()
    samples: dict[str, list[float]] = {n: [] for n in QUERIES}
    for _ in range(PASSES):
        for n in QUERIES:
            t0 = time.perf_counter()
            qs[n](spark, SF).write.format("noop").mode("overwrite").save()
            samples[n].append(time.perf_counter() - t0)
            release_caches()
            spark.catalog.clearCache()
    for n in QUERIES:
        med = statistics.median(samples[n])
        print(
            f"{n}: median {med:.2f} s over {PASSES} "
            f"(samples {[round(s, 2) for s in samples[n]]})"
        )


if __name__ == "__main__":
    main()
