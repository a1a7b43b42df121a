#!/usr/bin/env python
"""Round-7 isolated A/B for the r6 driver watch-list (verdict item #4):
q_dedup_clusters 3.09->4.65 s, q_kmeans 3.07->4.34 s, q_simhash_near_dup
2.83->3.79 s in the driver's r6 pass — drift or real?

Discipline (the r3 precedent): each query timed in its OWN fresh
subprocess-free session context on an otherwise idle host, interleaved
median-of-5, clearCache + release_caches between samples. Run when the
host is idle; record the verdict in BASELINE.md.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_schema_builder_spark.session import get_spark, release_caches  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

QUERIES = ["q_dedup_clusters", "q_kmeans", "q_simhash_near_dup"]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = 5


def main() -> None:
    spark = get_spark(app_name="r7-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    # warm-up at sf0.001 (JIT/codegen), like bench.py
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
