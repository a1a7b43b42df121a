#!/usr/bin/env python
"""Round-14 item 7: phase profiles for the 1.3-2.0 s bench band
(q_ivfpq_topk, q_knn_label_agreement, q_cut_duplicate_spans,
x_embedding_near_dup_lsh08, q_bpe_learn) — guide §1. Whole-key warm
median-of-3 with plan construction inside the timer (driver-looped
operators run jobs during construction — the r3 rule), PLUS the Spark
JOB COUNT per run via job groups: at sf0.1 these keys are suspected
scheduling-floor, and job count is the direct instrument for that
claim. Phase timings per key where the operator decomposes cleanly.

Run on an idle host: python tools/r14_band.py [key-substring ...]
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
    similarity,
    text,
)
from dbt_schema_builder_spark.session import (  # noqa: E402
    get_spark,
    read_table,
    release_caches,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_grp = 0


def timed(spark, label, build, reps=3):
    """Median-of-reps noop-sink wall + job count, construction inside
    the timer. Job count via a per-run job group: every job the run
    schedules (including eager collects at plan construction) lands in
    the group."""
    global _grp
    vals, jobs = [], 0
    for i in range(reps):
        _grp += 1
        g = f"r14band-{_grp}"
        spark.sparkContext.setJobGroup(g, label)
        t0 = time.perf_counter()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        vals.append(time.perf_counter() - t0)
        jobs = len(spark.sparkContext.statusTracker().getJobIdsForGroup(g))
        spark.sparkContext.setJobGroup(None, None)
        release_caches()
        spark.catalog.clearCache()
    med = statistics.median(vals)
    print(
        f"{label:52s} {med:7.3f} s  jobs/run={jobs:3d}  "
        f"{[round(v, 2) for v in vals]}",
        flush=True,
    )
    return med


def ivfpq(spark):
    emb = read_table(spark, f"{SF_DIR}/embeddings.parquet")
    print("--- q_ivfpq_topk (5 queries, 8 cells/3 probe, 16x16 PQ)")
    timed(spark, "ivfpq: pq_codebook only", lambda: (
        similarity.pq_codebook(emb, subspaces=16, codes=16),
        emb.limit(1),
    )[1])
    timed(spark, "ivfpq: full", lambda: similarity.ivfpq_topk(
        emb, n_queries=5, k=10, cells=8, nprobe=3,
        subspaces=16, codes=16, rerank=100,
    ))


def knn(spark):
    emb = read_table(spark, f"{SF_DIR}/embeddings.parquet")
    print("--- q_knn_label_agreement (32 queries, k=10)")
    timed(spark, "knn: query collect only", lambda: (
        emb.orderBy("vec_id").limit(32).select(
            "vec_id", similarity._int_embedding(F.col("embedding")).alias("iv"),
            "label",
        ).collect(),
        emb.limit(1),
    )[1])
    timed(spark, "knn: full", lambda: similarity.knn_label_agreement(
        emb, n_queries=32, k=10,
    ))


def lsh08(spark):
    emb = read_table(spark, f"{SF_DIR}/embeddings.parquet")
    print("--- x_embedding_near_dup_lsh08 (8-bit x 16 tables)")
    planes = similarity._hyperplanes(64, 8 * 16, 42)
    buckets_of = similarity._vectorized_table_buckets(planes, 8, 16)
    par = spark.sparkContext.defaultParallelism

    def sig_only():
        return emb.select(
            "vec_id", F.posexplode(buckets_of("embedding")).alias("tbl", "b")
        )

    timed(spark, "lsh08: signature stage only", sig_only)

    def candidates_only():
        bucketed = sig_only().withColumnRenamed("b", "bucket").repartition(
            par, "tbl", "bucket"
        )
        a, b = bucketed.alias("a"), bucketed.alias("b")
        return (
            a.join(
                b,
                (F.col("a.tbl") == F.col("b.tbl"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
            )
            .dropDuplicates(["vec_a", "vec_b"])
        )

    timed(spark, "lsh08: sig+selfjoin+dedup (candidates)", candidates_only)
    timed(spark, "lsh08: full", lambda: similarity.embedding_near_dup(
        emb, threshold=0.8,
    ))


def cut_spans(spark):
    docs = read_table(spark, f"{SF_DIR}/documents.parquet")
    print("--- q_cut_duplicate_spans (min_len=20)")
    timed(spark, "cut_spans: gram frame only", lambda: (
        dedup._gram_dup_frames(dedup._tokenized(docs), 20, "cross_doc")[0]
    ))
    timed(spark, "cut_spans: full", lambda: dedup.cut_duplicate_spans(
        docs, min_len=20,
    ))


def bpe(spark):
    docs = read_table(spark, f"{SF_DIR}/documents.parquet")
    print("--- q_bpe_learn (slope vs intercept: n_merges 1 / 4 / 8)")

    def learn(n):
        def b():
            counts: list = []
            merges, seg = text.learn_bpe_merges(
                docs, n_merges=n, min_pair_count=2, counts_out=counts
            )
            return spark.createDataFrame(
                [
                    (i + 1, a, bb, c)
                    for i, ((a, bb), c) in enumerate(zip(merges, counts))
                ],
                "step int, a string, b string, cnt bigint",
            )
        return b

    for n in (1, 4, 8):
        timed(spark, f"bpe_learn: n_merges={n}", learn(n))


SECTIONS = {
    "ivfpq": ivfpq,
    "knn": knn,
    "lsh08": lsh08,
    "cut_spans": cut_spans,
    "bpe": bpe,
}

if __name__ == "__main__":
    want = sys.argv[1:] or list(SECTIONS)
    s = get_spark(app_name="r14-band", shuffle_partitions=32)
    s.sparkContext.setLogLevel("ERROR")
    for name, fn in SECTIONS.items():
        if any(w in name for w in want):
            fn(s)
