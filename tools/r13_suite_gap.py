#!/usr/bin/env python
"""Reproduce (or refute) the in-suite vs isolated bench gap in ONE session.

OPTIMIZATION_r13.md item 1: mining-family queries measure ~1.5-2x their
isolated medians inside the 119-query bench pass even with clearCache +
release_caches between queries. This harness measures a probe query's
profile in a fresh session, then drives the session through one full
HEADLINE pass (same hygiene as bench.py), then re-measures the SAME
probe — if the post-suite median is materially higher, the gap is
session STATE (JVM/listener/block-manager accumulation) and bisectable
via confs; if not, it is scheduling/host noise and item 1 closes as
"not reproducible in-session".

Usage: python tools/r13_suite_gap.py [probe] [reps]
Env: GAP_EXTRA_CONF="k=v,k=v" applied on top of engine defaults.

OUTCOME (recorded, OPTIMIZATION_r13.md §8): REFUTED — the probe ran
FASTER after the full suite pass (q_ngram_jaccard median 2.035 s
isolated → 1.811 s post-suite, 2 persistent RDDs left). The apparent
in-suite inflation was cross-day host drift; the real per-pass
session cost was codegen-cache eviction (see r13_codegen_probe.py).
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


def _run(q, spark, sf_dir):
    t0 = time.perf_counter()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    release_caches()
    spark.catalog.clearCache()
    return dt


def main() -> None:
    probe_name = sys.argv[1] if len(sys.argv) > 1 else "q_ngram_jaccard"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    extra = {}
    for kv in os.environ.get("GAP_EXTRA_CONF", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    spark = get_spark(app_name="suite-gap", extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")

    queries = dict(entrymod.queries())
    queries.update(benchmod.EXTRA)
    probe = queries[probe_name]

    # warm like bench.py does
    warm_dir = "/root/testdata/sf0.001"
    for _ in range(2):
        _run(probe, spark, warm_dir)

    iso = [_run(probe, spark, sf_dir) for _ in range(reps)]

    # drive the session through one full headline pass (bench hygiene)
    names = [n for n in benchmod.HEADLINE + list(benchmod.EXTRA) if n in queries]
    t0 = time.perf_counter()
    for name in names:
        _run(queries[name], spark, sf_dir)
    suite_s = time.perf_counter() - t0

    post = [_run(probe, spark, sf_dir) for _ in range(reps)]

    sc = spark.sparkContext
    n_rdd = len(sc._jsc.getPersistentRDDs())
    print(json.dumps({
        "probe": probe_name,
        "iso": [round(x, 3) for x in sorted(iso)],
        "post": [round(x, 3) for x in sorted(post)],
        "iso_median": round(sorted(iso)[len(iso) // 2], 3),
        "post_median": round(sorted(post)[len(post) // 2], 3),
        "suite_pass_sec": round(suite_s, 1),
        "persistent_rdds_at_end": n_rdd,
        "extra_conf": extra,
    }))


if __name__ == "__main__":
    main()
