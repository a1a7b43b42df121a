#!/usr/bin/env python
"""Round-14 item 6: parallelism evidence at 10x for the 5 slowest
bench keys, with plan CONSTRUCTION inside the timer (the r3 rule —
driver-looped operators run jobs at construction; scale_stress's
timed() measures only the final-plan re-execution, which undercounts
exactly these families). Run at SPARK_GRAFT_CPUS=32 and =8 and compare
the 10x columns: sf0.1 is known scheduling-floor (BENCH_r13_c8), the
question is whether cores bind at 10x.

Usage: [SPARK_GRAFT_CPUS=8] python tools/r14_cores10x.py
Requires the staged 10x corpus (/tmp/scale10_r3, built by
tools/scale_stress.py).
"""
from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dbt_schema_builder_spark.operators import (  # noqa: E402
    dedup,
    graph as graph_ops,
    similarity,
)
from dbt_schema_builder_spark.session import (  # noqa: E402
    get_spark,
    read_table,
    release_caches,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STAGE = "/tmp/scale10_r3"

spark = get_spark(app_name="r14-cores10x", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

docs10 = read_table(spark, f"{STAGE}/documents.parquet")
emb10 = read_table(spark, f"{STAGE}/embeddings.parquet")
orders = read_table(spark, f"{SF_DIR}/orders.parquet")
li = read_table(spark, f"{SF_DIR}/lineitem.parquet")
e1 = graph_ops.bipartite_edges(orders, li)
rep = spark.range(10).select(F.col("id").alias("rep"))
e10 = (
    e1.crossJoin(rep)
    .select(
        (F.col("src") * 256 + F.col("rep")).alias("src"),
        (F.col("dst") * 256 + F.col("rep")).alias("dst"),
    )
    .localCheckpoint(eager=True)
)

OPS = {
    "simhash_near_dup(10x)": lambda: dedup.simhash_near_dup(
        docs10, max_bucket=200, max_dropped_mass=None
    ),
    "kmeans(k=8,it=3,10x)": lambda: similarity.kmeans(
        emb10, k=8, iterations=3
    ),
    "cluster_safe_split(10x)": lambda: dedup.cluster_safe_split(
        docs10,
        dedup.ngram_jaccard_pairs(
            docs10, n=3, threshold=0.2, max_df=64, max_dropped_mass=None
        ),
    ),
    "semantic_dedup(lsh,.9,10x)": lambda: similarity.semantic_dedup(
        emb10, threshold=0.9, strategy="lsh"
    ),
    "pagerank_topk(it=3,10x)": lambda: graph_ops.pagerank_topk(
        e10, iterations=3, k=50
    ),
}

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
for name, build in OPS.items():
    vals = []
    for i in range(3):
        spark.sparkContext.setJobDescription(f"r14-cores10x: {name}")
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        vals.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        release_caches()
        spark.catalog.clearCache()
    print(
        f"cpus={cpus} {name:30s} {statistics.median(vals):7.2f} s  "
        f"{[round(v, 2) for v in vals]}",
        flush=True,
    )
