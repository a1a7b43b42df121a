#!/usr/bin/env python
"""Round-14 phase profiles (guide §1): isolate where the time goes in
the two families the r13 verdict ranks first — the ngram miner under
the 4 cluster keys, and the q_semantic_dedup_ivf envelope. Noop-sink
timing per phase, labeled jobs, warm repeats on one session (the
point is the RELATIVE phase breakdown, not cross-session absolutes).

Run on an idle host: python tools/r14_profile.py [miner|envelope|sizes]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dbt_schema_builder_spark.operators import dedup, similarity  # noqa: E402
from dbt_schema_builder_spark.session import (  # noqa: E402
    get_spark,
    read_table,
    release_caches,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    s = get_spark(app_name="r14-profile", shuffle_partitions=32)
    s.sparkContext.setLogLevel("ERROR")
    return s


def timed(spark, label, build, reps=3):
    """Median-of-reps noop-sink wall, building the plan INSIDE the
    timer (the r3 rule: driver-looped operators and eager guards run
    jobs at plan construction — bench.py times construction too)."""
    vals = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(f"r14-profile: {label}")
        t0 = time.perf_counter()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        vals.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        release_caches()
        spark.catalog.clearCache()
    med = statistics.median(vals)
    print(f"{label:55s} {med:7.3f} s  {[round(v, 2) for v in vals]}",
          flush=True)
    return med


def miner(spark):
    docs = read_table(spark, f"{SF_DIR}/documents.parquet")
    n = 3

    def tokenized():
        return dedup._tokenized(docs)

    def sized():
        return tokenized().select(
            "doc_id", dedup._shingles_from(F.col("toks"), n).alias("sh_arr")
        )

    def index():
        return sized().select(
            "doc_id",
            F.size("sh_arr").alias("set_size"),
            F.explode(
                F.transform("sh_arr", lambda s: F.xxhash64(s))
            ).alias("sh"),
        )

    def df_table():
        return index().groupBy("sh").agg(F.count(F.lit(1)).alias("df"))

    timed(spark, "P0 tokenize (toks materialized)", tokenized)
    timed(spark, "P1 + shingle arrays", sized)
    timed(spark, "P2 + explode + xxhash64 (index)", index)
    timed(spark, "P3 df table (index groupBy sh)", df_table)
    timed(
        spark,
        "P4 miner, guard ON (default)",
        lambda: dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=64),
    )
    timed(
        spark,
        "P5 miner, guard OFF",
        lambda: dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.2, max_df=64, max_dropped_mass=None
        ),
    )
    timed(
        spark,
        "P6 miner + closure (q_dedup_clusters shape)",
        lambda: dedup.dedup_clusters(
            dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=64)
        ),
    )


def envelope(spark):
    emb = read_table(spark, f"{SF_DIR}/embeddings.parquet")

    timed(
        spark,
        "E1 blocked mining only (thr 0.4)",
        lambda: similarity.embedding_near_dup_blocked(emb, threshold=0.4),
    )
    timed(
        spark,
        "E2 ivf_sharded mining only (k32 p8)",
        lambda: similarity.embedding_near_dup_ivf_sharded(
            emb, threshold=0.4, k_cells=32, nprobe=8
        ),
    )
    timed(
        spark,
        "E3 semantic_dedup blocked (mine+closure+action)",
        lambda: similarity.semantic_dedup(
            emb, threshold=0.4, strategy="blocked"
        ),
    )
    timed(
        spark,
        "E4 semantic_dedup ivf_sharded (bounded branch)",
        lambda: similarity.semantic_dedup(
            emb, threshold=0.4, strategy="ivf_sharded", k_cells=32, nprobe=8
        ),
    )

    def full_envelope():
        ivf = similarity.semantic_dedup(
            emb, threshold=0.4, strategy="ivf_sharded", k_cells=32, nprobe=8
        )
        exact = similarity.semantic_dedup(emb, threshold=0.4,
                                          strategy="blocked")
        j = exact.select("vec_id", F.col("action").alias("_ea")).join(
            ivf.select("vec_id", F.col("action").alias("_ia")), "vec_id"
        )
        return j.agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum((F.col("_ea") == F.lit("drop")).cast("long")).alias(
                "n_exact_drop"
            ),
            (
                F.sum((F.col("_ea") == F.col("_ia")).cast("long")) * 20
                >= F.count(F.lit(1)) * 19
            )
            .cast("int")
            .alias("agree_ge_95"),
        )

    timed(spark, "E5 full envelope (q_semantic_dedup_ivf)", full_envelope)


def sizes(spark):
    docs = read_table(spark, f"{SF_DIR}/documents.parquet")
    emb = read_table(spark, f"{SF_DIR}/embeddings.parquet")
    n_docs = docs.count()
    idx = dedup._tokenized(docs).select(
        "doc_id",
        F.explode(
            F.transform(
                dedup._shingles_from(F.col("toks"), 3), lambda s: F.xxhash64(s)
            )
        ).alias("sh"),
    )
    n_idx = idx.count()
    n_sh = idx.select("sh").distinct().count()
    dfq = idx.groupBy("sh").count()
    stats = dfq.agg(
        F.max("count").alias("max_df"),
        F.expr("percentile_approx(count, 0.99)").alias("p99_df"),
        F.sum(F.col("count") * F.col("count")).alias("sum_df2"),
    ).collect()[0]
    print(f"docs={n_docs} index_rows={n_idx} distinct_sh={n_sh} "
          f"max_df={stats['max_df']} p99_df={stats['p99_df']} "
          f"candidate_volume(sum df^2)={stats['sum_df2']}")
    n_emb = emb.count()
    dim = emb.select(F.size("embedding").alias("d")).first()["d"]
    print(f"embeddings={n_emb} dim={dim}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    s = _spark()
    if which in ("sizes", "all"):
        sizes(s)
    if which in ("miner", "all"):
        miner(s)
    if which in ("envelope", "all"):
        envelope(s)
