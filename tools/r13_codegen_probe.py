#!/usr/bin/env python
"""Measure whole-stage-codegen (re)compilation across repeated bench
passes in ONE session.

Hypothesis (OPTIMIZATION_r13.md item 1 follow-up): the janino class
cache (`spark.sql.codegen.cache.maxEntries`, default 100) is far
smaller than the number of distinct codegen units across the 119-entry
bench, so every pass after the first re-compiles (almost) every unit it
already compiled — fixed Java-compilation overhead charged to every
timed sample. If pass 2's compile count stays near pass 1's, eviction
thrash is proven and the fix is a bigger cache; if pass 2 compiles
~nothing, the cache holds and compilation is a warmup-only cost.

Reads the Codahale counters on org.apache.spark.metrics.source
.CodegenMetrics (METRIC_SOURCE_CODE_SIZE count == number of compiled
units; METRIC_COMPILATION_TIME sum in ms... histogram count used here).

Usage: python tools/r13_codegen_probe.py [n_passes]
Env: GAP_EXTRA_CONF="k=v,k=v" applied on top of engine defaults.

OUTCOME (recorded, OPTIMIZATION_r13.md §8): eviction thrash PROVEN —
default cache (100): 2559/2551/2549 units compiled across 3 passes
(~4.2 ms mean ≈ 10.7 s/pass); maxEntries=8192: 1579/44/12 (the suite
has ~1,635 distinct units; even a single default-cache pass wastes
~900 intra-pass recompiles). get_spark now sets 8192 by default.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_schema_builder_spark.session import get_spark, release_caches  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
import bench as benchmod  # noqa: E402


def _codegen_stats(spark):
    jvm = spark.sparkContext._jvm
    m = jvm.org.apache.spark.metrics.source.CodegenMetrics
    hist = m.METRIC_COMPILATION_TIME()
    size = m.METRIC_SOURCE_CODE_SIZE()
    return {
        "units_compiled": int(size.getCount()),
        "compile_ms_mean": round(hist.getSnapshot().getMean(), 1),
    }


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    extra = {}
    for kv in os.environ.get("GAP_EXTRA_CONF", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    spark = get_spark(app_name="codegen-probe", extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")

    queries = dict(entrymod.queries())
    queries.update(benchmod.EXTRA)
    names = [n for n in benchmod.HEADLINE + list(benchmod.EXTRA) if n in queries]

    out = {"extra_conf": extra, "passes": []}
    prev_units = 0
    for p in range(n_passes):
        t0 = time.perf_counter()
        for name in names:
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            release_caches()
            spark.catalog.clearCache()
        dt = time.perf_counter() - t0
        st = _codegen_stats(spark)
        out["passes"].append(
            {
                "pass": p + 1,
                "wall_sec": round(dt, 1),
                "units_compiled_total": st["units_compiled"],
                "units_compiled_this_pass": st["units_compiled"] - prev_units,
                "compile_ms_mean": st["compile_ms_mean"],
            }
        )
        prev_units = st["units_compiled"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
