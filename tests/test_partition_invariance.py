"""Partition-invariance property suite (r10 continuation).

The engine's strongest 100-TB correctness claim is that every emitted
surface is ORDER- and PARTITIONING-independent (integer micro-units,
doc_id tie-breaks, exact rank arithmetic, integral div). The random
differentials prove most of that indirectly — Spark result == a
sequential DuckDB replay — but the differential-coverage audit EXEMPTS
exactly the keys where that proof is impossible (BLAS-order GEMM,
float argmax near-ties, percentile interpolation, HLL sketches). This
suite closes that gap from the other side: for a fixed input, the
result must be IDENTICAL (bit-for-bit, floats included) under

  - one partition (sequential),
  - hash partitioning on the natural key (7 partitions),
  - REVERSED input row order + round-robin repartition(4),

because every mechanism that could diverge at 1000 executors —
partition-local sum order, first()-without-order, windows missing a
tie-break, per-partition block membership — already diverges between
these three layouts. An op that passes here and has a differential is
pinned from both sides; an op that is differential-exempt (GEMM,
argmax, percentiles, HLL) gets its only distributed-determinism check
HERE.
"""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"
EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
EDGE_SCHEMA = "src long, dst long"

_WORDS = [
    "alpha", "beta", "gamma", "delta", "the", "of", "and", "data",
    "dup", "spark", "engine", "token", "scale", "row", "join",
]
_BASE_TS = datetime.datetime(2024, 3, 1)


def _lcg(seed: int):
    """Tiny deterministic generator (no random module state leakage)."""
    x = seed & 0x7FFFFFFF

    def nxt(n: int) -> int:
        nonlocal x
        x = (1103515245 * x + 12345) % (1 << 31)
        return x % n

    return nxt


def _doc_rows() -> list[tuple]:
    nxt = _lcg(7)
    rows = []
    for i in range(120):
        n_tok = 3 + nxt(12)
        toks = [_WORDS[nxt(len(_WORDS))] for _ in range(n_tok)]
        text = " ".join(toks)
        if i % 11 == 0 and i > 0:
            # exact duplicate of an earlier doc (dup clusters, canon picks)
            text = rows[i - 11][1]
        lang = ["en", "fr", "de"][nxt(3)]
        source = ["web", "books", "code"][nxt(3)]
        rows.append((i, text, lang, source, len(text)))
    return rows


def _emb_rows() -> list[tuple]:
    nxt = _lcg(23)
    rows = []
    for i in range(64):
        vec = [(nxt(4001) - 2000) / 1000.0 for _ in range(8)]
        if i % 9 == 0 and i > 0:
            vec = list(rows[i - 9][1])  # exact duplicate vector
        rows.append((i, vec, nxt(4)))
    return rows


def _event_rows() -> list[tuple]:
    nxt = _lcg(41)
    rows = []
    for i in range(240):
        ts = _BASE_TS + datetime.timedelta(minutes=nxt(14400))
        val = (nxt(20001) - 10000) / 100.0
        if i == 17:
            val = 9000.0  # a genuine outlier for the sigma/MAD gates
        rows.append(
            (
                i,
                ts,
                nxt(8),
                ["view", "click", "purchase", "error"][nxt(4)],
                val,
                '{"k": %d}' % nxt(9),
            )
        )
    return rows


def _edge_rows() -> list[tuple]:
    nxt = _lcg(59)
    seen = set()
    for _ in range(80):
        a, b = nxt(20), 20 + nxt(20)
        seen.add((a, b))
        seen.add((b, a))  # bidirected — pagerank's no-dangling contract
    return sorted(seen)


def _tied_doc_rows() -> list[tuple]:
    """Adversarial tie corpus: every doc the same LENGTH, few distinct
    texts, one lang, two sources — every window orderBy lands on its
    tie-break column, which is exactly where a missing doc_id
    tie-break turns rank assignment partition-dependent."""
    texts = ["alpha beta gam", "alpha beta gam", "beta alpha gam", "gam beta alpha"]
    return [
        (i, texts[i % 4], "en", ["web", "books"][i % 2], 14)
        for i in range(60)
    ]


def _tied_event_rows() -> list[tuple]:
    """Same-timestamp, same-value events: session/rank/LOCF orderings
    all tie."""
    return [
        (i, _BASE_TS + datetime.timedelta(minutes=(i // 6) * 10), i % 3,
         ["view", "click"][i % 2], 5.0, "{}")
        for i in range(48)
    ]


_ROWS = {
    "docs": (_doc_rows(), DOC_SCHEMA, "doc_id"),
    "emb": (_emb_rows(), EMB_SCHEMA, "vec_id"),
    "events": (_event_rows(), EV_SCHEMA, "event_id"),
    "edges": (_edge_rows(), EDGE_SCHEMA, "src"),
    "tied_docs": (_tied_doc_rows(), DOC_SCHEMA, "doc_id"),
    "tied_events": (_tied_event_rows(), EV_SCHEMA, "event_id"),
}


def _variants(spark, frame: str):
    rows, schema, key = _ROWS[frame]
    yield "p1", spark.createDataFrame(rows, schema).coalesce(1)
    yield "hash7", spark.createDataFrame(rows, schema).repartition(7, key)
    yield (
        "rev_rr4",
        spark.createDataFrame(list(reversed(rows)), schema).repartition(4),
    )


def _canon(v):
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _sort_key(v):
    # None-safe total order (r11 ADVICE fix): sorted() raises TypeError
    # the moment two rows tie on every column before a None — encode
    # each value (recursively, _canon nests tuples) as
    # (is_none, type_name, value) so None never compares to a value
    if isinstance(v, tuple):
        return (False, "tuple", tuple(_sort_key(x) for x in v))
    return (v is None, type(v).__name__, () if v is None else v)


def _run(op, df) -> list[tuple]:
    out = op(df)
    return sorted(
        (tuple(_canon(v) for v in r) for r in out.collect()), key=_sort_key
    )


def _assert_invariant(spark, frame: str, op):
    results = {}
    for name, df in _variants(spark, frame):
        results[name] = _run(op, df)
    base = results["p1"]
    for name in ("hash7", "rev_rr4"):
        got = results[name]
        assert got == base, (
            f"{name} diverged from p1: "
            f"only_p1={[r for r in base if r not in got][:5]} "
            f"only_{name}={[r for r in got if r not in base][:5]}"
        )


# ---------------------------------------------------------------- docs ops


def _pairs(docs):
    from dbt_schema_builder_spark.operators import dedup

    return dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.3)


def _op_keep_canonical(docs):
    from dbt_schema_builder_spark.operators import dedup

    return dedup.keep_canonical(docs, _pairs(docs))


def _op_cluster_diversity(docs):
    from dbt_schema_builder_spark.operators import dedup

    return dedup.cluster_diversity_sample(docs, _pairs(docs), m=2)


def _op_cluster_safe_split(docs):
    from dbt_schema_builder_spark.operators import dedup

    return dedup.cluster_safe_split(docs, _pairs(docs))


def _op_dedup_clusters(docs):
    from dbt_schema_builder_spark.operators import dedup

    return dedup.dedup_clusters(_pairs(docs))


def _op_decontaminate(docs):
    from dbt_schema_builder_spark.operators import dedup

    bench = docs.sparkSession.createDataFrame(
        [(0, "alpha beta gamma"), (1, "data spark engine")],
        "bench_id bigint, text string",
    )
    return dedup.decontaminate(docs, bench, n=2)


def _op_oov_rate(docs):
    from dbt_schema_builder_spark.operators import text

    return text.oov_rate(docs, text.top_vocab(docs, size=8))


def _op_bpe_learn(docs):
    from dbt_schema_builder_spark.operators import text

    merges, _ = text.learn_bpe_merges(docs, n_merges=4)
    return docs.sparkSession.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "i int, a string, b string",
    )


def _op_fertility(docs):
    from dbt_schema_builder_spark.operators import text

    merges, _ = text.learn_bpe_merges(docs, n_merges=4)
    return text.tokenizer_fertility(docs, merges)


def _op_nb_scores(docs):
    from dbt_schema_builder_spark.operators import classifier

    return classifier.nb_scores(docs, label="text LIKE '%dup%'")


def _op_nb_apply_heldout(docs):
    from dbt_schema_builder_spark.operators import classifier

    return classifier.nb_apply_heldout(docs, label="text LIKE '%dup%'")


def _op_incremental_dedup(docs):
    from dbt_schema_builder_spark.operators import dedup
    from dbt_schema_builder_spark.operators import text

    seen = text.fingerprint(docs.where(F.col("doc_id") % 2 == 0))
    return dedup.incremental_dedup(docs.where(F.col("doc_id") % 2 == 1), seen)


def _op_incremental_bloom(docs):
    from dbt_schema_builder_spark.operators import dedup
    from dbt_schema_builder_spark.operators import text

    seen = text.fingerprint(docs.where(F.col("doc_id") % 2 == 0))
    return dedup.incremental_dedup_bloom(
        docs.where(F.col("doc_id") % 2 == 1), seen
    )


DOC_OPS = {
    "exact_dedup": lambda d: __import__(
        "dbt_schema_builder_spark.operators.dedup", fromlist=["x"]
    ).exact_dedup(d),
    "ngram_jaccard_pairs": _pairs,
    "keep_canonical": _op_keep_canonical,
    "cluster_diversity_sample": _op_cluster_diversity,
    "cluster_safe_split": _op_cluster_safe_split,
    "dedup_clusters": _op_dedup_clusters,
    "decontaminate": _op_decontaminate,
    "minhash_signatures": lambda d: __import__(
        "dbt_schema_builder_spark.operators.dedup", fromlist=["x"]
    ).minhash_signatures(d, num_hashes=16, n=2),
    "simhash_near_dup": lambda d: __import__(
        "dbt_schema_builder_spark.operators.dedup", fromlist=["x"]
    ).simhash_near_dup(d, max_hamming=12),
    "tfidf_ngram_cosine_pairs": lambda d: __import__(
        "dbt_schema_builder_spark.operators.dedup", fromlist=["x"]
    ).tfidf_ngram_cosine_pairs(d, n=2, threshold=0.2),
    "containment_pairs": lambda d: __import__(
        "dbt_schema_builder_spark.operators.dedup", fromlist=["x"]
    ).containment_pairs(d, n=2, threshold_milli=500),
    "shared_ngram_fraction": lambda d: __import__(
        "dbt_schema_builder_spark.operators.dedup", fromlist=["x"]
    ).shared_ngram_fraction(d, n=2),
    "chunk_dedup": lambda d: __import__(
        "dbt_schema_builder_spark.operators.dedup", fromlist=["x"]
    ).chunk_dedup(d, chunk=3, max_docs=2),
    "source_overlap_matrix": lambda d: __import__(
        "dbt_schema_builder_spark.operators.dedup", fromlist=["x"]
    ).source_overlap_matrix(d, n=2),
    "duplicate_span_stats": lambda d: __import__(
        "dbt_schema_builder_spark.operators.dedup", fromlist=["x"]
    ).duplicate_span_stats(d, min_len=3, k=3),
    "cut_duplicate_spans": lambda d: __import__(
        "dbt_schema_builder_spark.operators.dedup", fromlist=["x"]
    ).cut_duplicate_spans(d, min_len=3, k=3),
    "quality_score": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).quality_score(d),
    "winnowing": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).winnowing_fingerprints(d, k=3, window=3),
    "tfidf_top_terms": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).tfidf_top_terms(d, k=3),
    "unigram_logprob": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).unigram_logprob(d),
    "bigram_logprob": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).bigram_logprob(d),
    "dsir_importance": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).dsir_importance(d, d.where(F.col("lang") == "en"), k=20),
    "waterfill": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).source_mix_waterfill(d, budget_tokens=300),
    "temperature_mix": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).source_mix_temperature(d, budget_tokens=300),
    "percentile_filter": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).percentile_filter(d, p=0.25),
    "cap_per_source": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).cap_per_source(d, k=20),
    "weighted_sample": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).weighted_sample_per_group(d, k=10),
    # the explicit-fractions hash path (content-hash draw) and the
    # key-portable md5 path are both partition-invariant BY DESIGN; the
    # fractions=None sampleBy fallback is documented Spark-native
    # per-partition RNG (NOT invariant — measured here before pinning
    # these two modes instead)
    "stratified_sample_hash": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).stratified_sample(d, fractions={"en": 0.5, "fr": 0.2}, default_fraction=0.3),
    "stratified_sample_keyed": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).stratified_sample(
        d, fractions={"en": 0.5}, default_fraction=0.3, key="doc_id"
    ),
    "hash_split": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).hash_split(d),
    "lang_id": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).lang_id(d),
    "zipf_stats": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).lexical_zipf_stats(d),
    "curriculum_bins": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).curriculum_bins(d, n_bins=5),
    "bm25_search": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).bm25_search(d, ("data", "dup"), topk=10),
    "hybrid_search": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).hybrid_search(d, ("data", "dup"), topk=10),
    "pmi_pairs": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).pmi_pairs(d, min_count=3, max_vocab=50),
    "source_kl": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).source_kl(d),
    "gopher_rules": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).gopher_quality_rules(d, min_tokens=2),
    "ccnet_buckets": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).ccnet_buckets(d),
    "bpe_learn": _op_bpe_learn,
    "tokenizer_fertility": _op_fertility,
    "nb_scores": _op_nb_scores,
    "nb_apply_heldout": _op_nb_apply_heldout,
    "pack_sequences": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).pack_sequences(d, budget=32),
    "repetition_stats": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).repetition_stats(d),
    "token_count": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).token_count(d),
    "fingerprint": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).fingerprint(d),
    "redact_pii": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).redact_pii(d),
    "sliding_chunks": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).sliding_chunks(d, size=4, overlap=2),
    "apply_bpe_merges": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).apply_bpe_merges(d, [("t", "h"), ("a", "l")]),
    "source_mix": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).source_mix(d, budget_tokens=300),
    "text_metrics_pandas": lambda d: __import__(
        "dbt_schema_builder_spark.operators.udf", fromlist=["x"]
    ).text_metrics_pandas(d),
    "lang_stats_pandas": lambda d: __import__(
        "dbt_schema_builder_spark.operators.udf", fromlist=["x"]
    ).lang_stats_apply_in_pandas(d),
    "jaccard_prefix_pairs": lambda d: __import__(
        "dbt_schema_builder_spark.operators.dedup", fromlist=["x"]
    ).jaccard_prefix_pairs(d, n=2, threshold=0.5),
    "incremental_dedup": _op_incremental_dedup,
    "incremental_dedup_bloom": _op_incremental_bloom,
    "dedup_stats": lambda d: __import__(
        "dbt_schema_builder_spark.operators.dedup", fromlist=["x"]
    ).dedup_stats(d),
    "duplicate_substring_spans": lambda d: __import__(
        "dbt_schema_builder_spark.operators.dedup", fromlist=["x"]
    ).duplicate_substring_spans(d, min_len=3, k=3),
    # r11 tests-only additions: window-count suppression is partition-
    # invariant by construction (count over the full QI partition);
    # NFC is map-only deterministic
    "k_anonymize": lambda d: __import__(
        "dbt_schema_builder_spark.operators.privacy", fromlist=["x"]
    ).k_anonymize(d, ["lang", "source"], k=3),
    "nfc_normalize": lambda d: __import__(
        "dbt_schema_builder_spark.operators.udf", fromlist=["x"]
    ).normalize_text(d),
    # r13: mojibake repair is a pure per-row function of its input
    "fix_mojibake": lambda d: __import__(
        "dbt_schema_builder_spark.operators.udf", fromlist=["x"]
    ).fix_mojibake(d),
    # r12 tests-only additions: line dedup is map-only deterministic;
    # the l-diversity report is one full-group aggregate
    "dedup_lines": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).dedup_lines(d),
    # r13: the exploded strategy must be bit-identical too (sorted
    # collect re-assembly — position-keyed, partition-order free)
    "dedup_lines_exploded": lambda d: __import__(
        "dbt_schema_builder_spark.operators.text", fromlist=["x"]
    ).dedup_lines(d, strategy="exploded"),
    "l_diversity": lambda d: __import__(
        "dbt_schema_builder_spark.operators.privacy", fromlist=["x"]
    ).l_diversity_report(d, ["lang", "source"], "text", l=2),
    # r13: entropy-l runs integer micro-nat sums -> order-independent
    "entropy_l": lambda d: __import__(
        "dbt_schema_builder_spark.operators.privacy", fromlist=["x"]
    ).entropy_l_diversity_report(d, ["lang", "source"], "text", l=2),
    # urls over arbitrary text: the chain is total + map-only
    "url_canon": lambda d: __import__(
        "dbt_schema_builder_spark.operators.urls", fromlist=["x"]
    ).canonicalize_urls(d, url_col="text"),
    # r13: the idna fold is a pure per-row function of its input
    "idn_fold": lambda d: __import__(
        "dbt_schema_builder_spark.operators.urls", fromlist=["x"]
    ).fold_idn_hosts(d, host_col="text", out_col="host_ascii"),
    "host_report": lambda d: __import__(
        "dbt_schema_builder_spark.operators.urls", fromlist=["x"]
    ).host_report(d, url_col="text"),
    "blocklist_filter": lambda d: __import__(
        "dbt_schema_builder_spark.operators.urls", fromlist=["x"]
    ).blocklist_filter(
        d,
        d.sparkSession.createDataFrame([("example.com",)], "domain string"),
        url_col="text",
    ),
}


@pytest.mark.parametrize("name", sorted(DOC_OPS))
def test_docs_op_partition_invariant(spark, name):
    _assert_invariant(spark, "docs", DOC_OPS[name])


# ----------------------------------------------------------- embedding ops


def _op_brute_topk(emb):
    from dbt_schema_builder_spark.operators import similarity

    return similarity.brute_force_topk(
        emb, similarity.queries_from_corpus(emb, 3), k=5
    )


def _op_lsh_topk(emb):
    from dbt_schema_builder_spark.operators import similarity

    return similarity.lsh_bucketed_topk(
        emb, similarity.queries_from_corpus(emb, 3), k=5, dim=8
    )


def _op_quantized_topk(emb):
    from dbt_schema_builder_spark.operators import similarity

    return similarity.quantized_topk(
        emb, similarity.queries_from_corpus(emb, 3), k=5
    )


EMB_OPS = {
    "brute_force_topk": _op_brute_topk,
    "centroid_by_label": lambda e: __import__(
        "dbt_schema_builder_spark.operators.similarity", fromlist=["x"]
    ).centroid_by_label(e),
    "kmeans": lambda e: __import__(
        "dbt_schema_builder_spark.operators.similarity", fromlist=["x"]
    ).kmeans(e, k=4, iterations=2),
    "quantize_embeddings": lambda e: __import__(
        "dbt_schema_builder_spark.operators.similarity", fromlist=["x"]
    ).quantize_embeddings(e),
    "centroid_outliers": lambda e: __import__(
        "dbt_schema_builder_spark.operators.similarity", fromlist=["x"]
    ).centroid_outliers(e),
    # the differential-EXEMPT keys: their ONLY distributed-determinism
    # check is this suite (BLAS-order GEMM / float argmax classes)
    "embedding_near_dup_blocked": lambda e: __import__(
        "dbt_schema_builder_spark.operators.similarity", fromlist=["x"]
    ).embedding_near_dup_blocked(e, threshold=0.5, blocks=4),
    "lsh_topk": _op_lsh_topk,
    "pq_topk": lambda e: __import__(
        "dbt_schema_builder_spark.operators.similarity", fromlist=["x"]
    ).pq_topk(e, n_queries=3, k=5, subspaces=4, codes=8, rerank=16),
    "knn_label_agreement": lambda e: __import__(
        "dbt_schema_builder_spark.operators.similarity", fromlist=["x"]
    ).knn_label_agreement(e, n_queries=8, k=5),
    "semantic_dedup": lambda e: __import__(
        "dbt_schema_builder_spark.operators.similarity", fromlist=["x"]
    ).semantic_dedup(e, threshold=0.8, strategy="blocked"),
    "quantized_topk": _op_quantized_topk,
    "lsh_quantized_topk": lambda e: __import__(
        "dbt_schema_builder_spark.operators.similarity", fromlist=["x"]
    ).lsh_quantized_topk(e, k=5, dim=8, n_queries=3),
    "ivfpq_topk": lambda e: __import__(
        "dbt_schema_builder_spark.operators.similarity", fromlist=["x"]
    ).ivfpq_topk(e, n_queries=3, k=5, cells=4, nprobe=2, subspaces=4, codes=8, rerank=16),
    # ivf_sharded is the OTHER differential-exempt near-dup branch
    "embedding_near_dup_ivf_sharded": lambda e: __import__(
        "dbt_schema_builder_spark.operators.similarity", fromlist=["x"]
    ).embedding_near_dup_ivf_sharded(e, threshold=0.5, k_cells=8, nprobe=2),
}


@pytest.mark.parametrize("name", sorted(EMB_OPS))
def test_emb_op_partition_invariant(spark, name):
    _assert_invariant(spark, "emb", EMB_OPS[name])


# -------------------------------------------------------------- events ops


def _op_merge_partials(ev):
    from dbt_schema_builder_spark.operators import relational

    # integer micro-units: merge_partial_aggregates sums whatever the
    # caller hands it, and a raw-double sum is order-dependent by IEEE —
    # the engine's convention (and the driver key's) is to integerize
    # BEFORE the fold, which is what makes the fold partition-invariant
    ev = ev.withColumn(
        "value", F.round(F.col("value") * 100).cast("long")
    )
    state = (
        ev.where(F.col("event_id") % 2 == 0)
        .groupBy("user_id")
        .agg(
            F.sum("value").alias("value"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    batch = ev.where(F.col("event_id") % 2 == 1)
    return relational.merge_partial_aggregates(
        state, batch, ["user_id"], ["value"]
    )


def _op_asof(ev):
    from dbt_schema_builder_spark.operators import temporal

    left = ev.where(F.col("event_type") == "view")
    right = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    return temporal.asof_join(left, right, "user_id", "ts", ["click_value"])


def _op_merge_latest(ev):
    from dbt_schema_builder_spark.operators import temporal

    base = ev.where(F.col("event_id") % 2 == 0)
    updates = ev.where(F.col("event_id") % 2 == 1)
    return temporal.merge_latest(base, updates)


def _op_salted_sum(ev):
    from dbt_schema_builder_spark.operators import skew

    # micro-units first: salted partial sums re-associate the addition
    ev = ev.withColumn("v", F.round(F.col("value") * 100).cast("long"))
    return skew.salted_sum(ev, "event_type", "v")


def _op_salted_join(ev):
    from dbt_schema_builder_spark.operators import skew

    small = (
        ev.select("event_type").distinct().withColumn(
            "type_rank", F.length("event_type")
        )
    )
    return skew.salted_join(ev.select("event_id", "event_type"), small, "event_type")


EV_OPS = {
    "heavy_hitters": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.relational", fromlist=["x"]
    ).heavy_hitters(ev, "event_type", support=0.2),
    "sessionize": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.timeseries", fromlist=["x"]
    ).sessionize(ev, gap_minutes=30).drop("session_start", "session_end"),
    "conversion_latency": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.timeseries", fromlist=["x"]
    ).conversion_latency(ev),
    "trend_slope": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.profiling", fromlist=["x"]
    ).trend_slope(ev),
    "value_histogram": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.profiling", fromlist=["x"]
    ).value_histogram(ev),
    "sigma_outliers": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.profiling", fromlist=["x"]
    ).sigma_outliers(ev, k=2),
    # mad_outliers is differential-EXEMPT (ulp-masking ROUND): this is
    # its only distributed-determinism check
    "mad_outliers": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.profiling", fromlist=["x"]
    ).mad_outliers(ev),
    "profile_numeric": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.profiling", fromlist=["x"]
    ).profile_numeric(ev.select("user_id", "value"), exact_distinct=True),
    "merge_partial_aggregates": _op_merge_partials,
    "tumbling_window": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.timeseries", fromlist=["x"]
    ).tumbling_window_stats(ev),
    "sliding_window": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.timeseries", fromlist=["x"]
    ).sliding_window_stats(ev),
    "funnel": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.timeseries", fromlist=["x"]
    ).funnel(ev),
    "cohort_retention": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.timeseries", fromlist=["x"]
    ).cohort_retention(ev),
    "gapfill_locf": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.timeseries", fromlist=["x"]
    ).gapfill_locf(ev),
    "gapfill_interpolate": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.timeseries", fromlist=["x"]
    ).gapfill_interpolate(ev),
    "rolling_active_users": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.timeseries", fromlist=["x"]
    ).rolling_active_users(ev),
    "transition_matrix": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.timeseries", fromlist=["x"]
    ).transition_matrix(ev),
    "cumulative_users": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.timeseries", fromlist=["x"]
    ).cumulative_users(ev),
    "interval_coverage": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.temporal", fromlist=["x"]
    ).interval_coverage(ev),
    "scd2_history": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.temporal", fromlist=["x"]
    ).scd2_history(ev),
    "asof_join": _op_asof,
    "merge_latest": _op_merge_latest,
    "salted_sum": _op_salted_sum,
    "salted_join": _op_salted_join,
    "skew_report": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.skew", fromlist=["x"]
    ).skew_report(ev, "event_type", top_k=3),
    "extract_props": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.json_ops", fromlist=["x"]
    ).extract_props(ev),
    "props_stats_by_type": lambda ev: __import__(
        "dbt_schema_builder_spark.operators.json_ops", fromlist=["x"]
    ).props_stats_by_type(ev),
}


@pytest.mark.parametrize("name", sorted(EV_OPS))
def test_events_op_partition_invariant(spark, name):
    _assert_invariant(spark, "events", EV_OPS[name])


# --------------------------------------------------------------- graph ops


# ------------------------------------------------------- tie-heavy corpora

# rank/window/canon ops where ONLY the tie-break column decides order —
# the exact spot a missing doc_id/event_id tie-break turns
# partition-dependent
_TIED_DOC_KEYS = (
    "exact_dedup",
    "keep_canonical",
    "cluster_diversity_sample",
    "percentile_filter",
    "curriculum_bins",
    "cap_per_source",
    "weighted_sample",
    "stratified_sample_hash",
    "tfidf_top_terms",
    "bm25_search",
    "hybrid_search",
    "winnowing",
    "pack_sequences",
    "chunk_dedup",
)

_TIED_EV_KEYS = (
    "sessionize",
    "conversion_latency",
    "gapfill_locf",
    "gapfill_interpolate",
    "transition_matrix",
    "scd2_history",
    "merge_latest",
    "asof_join",
    "heavy_hitters",
    "mad_outliers",
)


@pytest.mark.parametrize("name", sorted(_TIED_DOC_KEYS))
def test_tied_docs_op_partition_invariant(spark, name):
    _assert_invariant(spark, "tied_docs", DOC_OPS[name])


@pytest.mark.parametrize("name", sorted(_TIED_EV_KEYS))
def test_tied_events_op_partition_invariant(spark, name):
    _assert_invariant(spark, "tied_events", EV_OPS[name])


def test_pagerank_partition_invariant(spark):
    from dbt_schema_builder_spark.operators import graph

    _assert_invariant(spark, "edges", lambda e: graph.pagerank(e, iterations=3))


def test_pagerank_topk_partition_invariant(spark):
    from dbt_schema_builder_spark.operators import graph

    _assert_invariant(
        spark, "edges", lambda e: graph.pagerank_topk(e, iterations=3, k=7)
    )
