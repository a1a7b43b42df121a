#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes to completion via the noop sink (no driver collect —
measures the distributed plan, not result transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_schema_builder_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

# Headline set: the shuffle/join/window-heavy queries that dominate at scale.
HEADLINE = [
    "q_hash_agg",
    "q_star_join",
    "q_sort_group_collect",
    "q_window_rank",
    "q_window_running",
    "q_session_window",
    "q_tumbling_window",
    "q_topk",
    "q_set_ops",
    "q_json_extract",
    "q_exact_dedup",
    "q_near_dup",
    "q_ngram_jaccard",
    "q_topk_similarity",
    "q_lsh_topk",
    "q_text_stats",
    "q_quality_score",
    "q_pandas_udf",
    "q_multimodal_features",
    "q_asof_join",
    "q_range_join",
    "q_salted_join",
    "q_winnowing",
    # round 2 additions
    "q_pii_scrub",
    "q_repetition_stats",
    "q_decontaminate",
    "q_pack_sequences",
    "q_embedding_near_dup",
    "q_incremental_dedup",
    "q_hash_split",
    "q_unigram_logprob",
    "q_source_mix",
    "q_percentile_filter",
    "q_cap_per_source",
    "q_merge_latest",
    "q_oov_rate",
    "q_dedup_stats",
    "q_weighted_sample",
    # round 3 additions (newly oracle-backed operators)
    "q_simhash_near_dup",
    "q_dedup_clusters",
    "q_quantize_embeddings",
    "q_quantized_topk",
    "q_kmeans",
    "q_lang_id",
    "q_heavy_hitters",
    "q_audio_features",
    "q_source_overlap",
    "q_bigram_logprob",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or 0.1)
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    timings: dict[str, float] = {}
    # Warm up JVM/codegen on the smallest SF so the timed numbers measure
    # the plans, not first-run JIT: run every headline query once at
    # sf0.001 (sub-second each), then time at the target SF.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in HEADLINE:
            fn = queries.get(name)
            if fn is not None:
                fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
