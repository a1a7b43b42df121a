"""Property-based tests (hypothesis) for the round-2 LLM-pipeline
operators: invariants that must hold for arbitrary documents, not just
the fixtures. Examples are batched — each hypothesis example builds ONE
DataFrame of many generated docs and runs one job, keeping Spark-job
count proportional to examples, not rows."""

import hashlib

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from dbt_schema_builder_spark.operators import dedup, similarity, text

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

# words with no regex metacharacters plus PII-shaped fragments
words = st.sampled_from(
    ["alpha", "beta", "gamma", "x", "the", "of", "9", "a.b", "-", "@"]
)
pii_bits = st.sampled_from(
    [
        "jo.doe+x@example.co.uk",
        "555-12-3456",
        "123.456.7890",
        "10.0.0.1",
        "not@pii",          # no TLD -> not an email match
        "12-34-56",         # wrong grouping -> not an SSN
    ]
)
texts = st.lists(st.one_of(words, pii_bits), min_size=1, max_size=30).map(
    " ".join
)


def _docs(spark, text_list):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(text_list)],
        DOC_SCHEMA,
    )


@settings(max_examples=10, deadline=None)
@given(text_list=st.lists(texts, min_size=1, max_size=8))
def test_redact_pii_total_and_consistent(spark, text_list):
    """For any text: the scrub never crashes, counts are non-negative,
    and the output hash changes iff something was matched (replacement
    tokens can never equal the span they replace)."""
    out = text.redact_pii(_docs(spark, text_list)).collect()
    assert len(out) == len(text_list)
    for r in out:
        original = text_list[r.doc_id]
        n_hits = r.n_email + r.n_ssn + r.n_phone + r.n_ipv4
        assert n_hits >= 0
        unchanged = r.redacted_md5 == hashlib.md5(
            original.encode()
        ).hexdigest()
        assert unchanged == (n_hits == 0), (original, n_hits)


@settings(max_examples=10, deadline=None)
@given(
    token_counts=st.lists(st.integers(1, 40), min_size=1, max_size=12),
    budget=st.integers(2, 64),
)
def test_pack_sequences_chunk_arithmetic(spark, token_counts, budget):
    """chunk_id is exactly floor(tokens_before/budget) in doc_id order,
    non-decreasing, starting at 0, for any doc sizes and budget."""
    docs = _docs(spark, ["w " * n for n in token_counts])
    rows = sorted(
        (r.doc_id, r.n_tokens, r.chunk_id)
        for r in text.pack_sequences(docs, budget=budget).collect()
    )
    assert len(rows) == len(token_counts)
    cum = 0
    prev = 0
    for doc_id, n_tokens, chunk_id in rows:
        assert n_tokens == token_counts[doc_id]
        assert chunk_id == cum // budget
        assert chunk_id >= prev
        prev = chunk_id
        cum += n_tokens


@settings(max_examples=10, deadline=None)
@given(text_list=st.lists(texts, min_size=1, max_size=8))
def test_repetition_stats_ranges(spark, text_list):
    """Fractions stay in range; docs with >= 2 tokens each yield exactly
    one row; sub-bigram docs are absent (documented semantics)."""
    docs = _docs(spark, text_list)
    out = {r.doc_id: r for r in text.repetition_stats(docs).collect()}
    for i, t in enumerate(text_list):
        n_tok = len(t.split())
        if n_tok < 2:
            assert i not in out
            continue
        r = out[i]
        assert 0.0 <= r.dup_token_fraction < 1.0
        assert 0.0 < r.top_bigram_fraction <= 1.0
        assert r.top_bigram in {
            " ".join(t.split()[j : j + 2]) for j in range(n_tok - 1)
        }


@settings(max_examples=8, deadline=None)
@given(
    text_list=st.lists(texts, min_size=2, max_size=8),
    n_bench=st.integers(1, 3),
)
def test_decontaminate_covers_every_doc(spark, text_list, n_bench):
    """Output doc set == input doc set (no silent drops, even for docs
    too short to shingle), and contaminated iff n_hits > 0."""
    docs = _docs(spark, text_list)
    bench = docs.orderBy("doc_id").limit(n_bench)
    out = dedup.decontaminate(docs, bench, n=3).collect()
    assert {r.doc_id for r in out} == set(range(len(text_list)))
    for r in out:
        assert r.contaminated == (r.n_hits > 0)
        assert r.n_hits >= 0


@settings(max_examples=8, deadline=None)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-10, max_value=10,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=4, max_size=4,
        ),
        min_size=1, max_size=12,
    )
)
def test_quantize_roundtrip_bound_and_norm(spark, vecs):
    """For any embeddings: dequantized values land within half a
    quantization step of the original, every |q| <= 127, and the carried
    squared norm equals the recomputed one."""
    from dbt_schema_builder_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    rows = similarity.quantize_embeddings(df).collect()
    assert len(rows) == len(vecs)
    for r in rows:
        orig = vecs[r.vec_id]
        # reconstruct the exact scale the operator used (float32-cast
        # inputs), not the pre-cast python floats
        import struct

        f32 = [struct.unpack("f", struct.pack("f", x))[0] for x in orig]
        maxabs = max(abs(x) for x in f32)
        scale = 1.0 if maxabs == 0 else 127.0 / maxabs
        assert all(abs(q) <= 127 for q in r.qvec), r
        assert r.q_sqnorm == sum(q * q for q in r.qvec), r
        for q, x in zip(r.qvec, f32):
            assert abs(q / scale - x) <= 0.5 / scale + 1e-9, (q, x, scale)


@settings(max_examples=8, deadline=None)
@given(
    labels=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]), min_size=5, max_size=60
    )
)
def test_heavy_hitters_matches_exact_threshold(spark, labels):
    """Sketch-then-verify must equal the brute-force 'frequency strictly
    above support' answer for any distribution — the sketch can only add
    candidates, never lose a true heavy hitter."""
    from dbt_schema_builder_spark.operators import relational

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(labels)], "id bigint, v string"
    )
    got = {
        (r.v, r.n) for r in relational.heavy_hitters(df, "v", 0.25).collect()
    }
    from collections import Counter

    counts = Counter(labels)
    want = {
        (v, n) for v, n in counts.items() if n > 0.25 * len(labels)
    }
    assert got == want, (got, want, counts)


@settings(max_examples=6, deadline=None)
@given(text_list=st.lists(texts, min_size=2, max_size=8))
def test_minhash_portable_agreement_bounds(spark, text_list):
    """Portable-hash MinHash candidates: n_agree in [0, 32], pairs are
    ordered (doc_a < doc_b), and identical documents always reach full
    agreement when both have shingles."""
    cand = dedup.minhash_lsh_candidates(
        _docs(spark, text_list + [text_list[0]]), shingle_hash="portable"
    ).collect()
    for r in cand:
        assert 0 <= r.n_agree <= 32
        assert r.doc_a < r.doc_b
    dup_id = len(text_list)  # appended copy of doc 0
    n_tokens = len(text_list[0].split())
    if n_tokens >= 3:  # 3-gram shingles exist -> signatures exist
        full = [
            r for r in cand
            if r.doc_a == 0 and r.doc_b == dup_id
        ]
        assert full and full[0].n_agree == 32, cand


@settings(max_examples=8, deadline=None)
@given(text_list=st.lists(texts, min_size=1, max_size=10))
def test_bloom_incremental_dedup_always_equals_plain_anti_join(
    spark, text_list
):
    """For ANY corpus split and even a deliberately saturated filter,
    the Bloom-prefiltered path is pure work-pruning: its output doc set
    is identical to the exact anti-join's."""
    docs = _docs(spark, text_list)
    seen_docs = docs.where("doc_id % 2 = 0")
    new_docs = docs.where("doc_id % 2 = 1")
    seen = text.fingerprint(seen_docs)
    exact = {
        r.doc_id for r in dedup.incremental_dedup(new_docs, seen).collect()
    }
    got = {
        r.doc_id
        for r in dedup.incremental_dedup_bloom(
            new_docs, seen, m_bits=8, k=2
        ).collect()
    }
    assert got == exact


@settings(max_examples=8, deadline=None)
@given(text_list=st.lists(texts, min_size=1, max_size=10))
def test_shared_ngram_fraction_invariants(spark, text_list):
    """0 <= n_shared <= n_grams, ppm in [0, 1e6], one row per doc, and
    an exact duplicate pair forces BOTH docs to 100% shared when they
    have any grams at all."""
    docs = _docs(spark, text_list)
    dup = docs.limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    out = {
        r.doc_id: r
        for r in dedup.shared_ngram_fraction(docs.unionByName(dup)).collect()
    }
    assert len(out) == len(text_list) + 1
    for r in out.values():
        assert 0 <= r.n_shared <= r.n_grams
        assert 0 <= r.shared_ppm <= 1_000_000
    twin_a, twin_b = out[0], out[1_000_000]
    assert twin_a.n_grams == twin_b.n_grams
    if twin_a.n_grams > 0:
        assert twin_a.shared_ppm == twin_b.shared_ppm == 1_000_000


@settings(max_examples=8, deadline=None)
@given(text_list=st.lists(texts, min_size=2, max_size=10))
def test_tfidf_cosine_pairs_bounded_and_symmetric_input_invariant(
    spark, text_list
):
    """Every emitted similarity lies in [threshold, 1] (weights are
    non-negative so cosine cannot be negative; fixed-point quantization
    cannot push it above 1 because both sides use the same integers),
    and pairs are strictly ordered doc_a < doc_b (no self/dup pairs)."""
    out = dedup.tfidf_ngram_cosine_pairs(
        _docs(spark, text_list), n=2, threshold=0.1
    ).collect()
    for r in out:
        assert r.doc_a < r.doc_b
        assert 0.1 <= r.cosine_tfidf <= 1.0 + 1e-9, r


@settings(max_examples=8, deadline=None)
@given(
    text_list=st.lists(texts, min_size=1, max_size=8),
    size=st.integers(min_value=3, max_value=12),
    overlap=st.integers(min_value=0, max_value=2),
)
def test_sliding_chunks_tile_exactly(spark, text_list, size, overlap):
    """For ANY corpus and window geometry: chunk starts advance by
    stride, windows cover every token position exactly once modulo the
    designed overlap, the tail never exceeds the doc, and chunk counts
    match the closed form max(ceil((n - overlap) / stride), 1)."""
    import math

    out = text.sliding_chunks(
        _docs(spark, text_list), size=size, overlap=overlap
    ).collect()
    stride = size - overlap
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(range(len(text_list)))
    for doc_id, rows in by_doc.items():
        n = len(text_list[doc_id].split())
        rows.sort(key=lambda r: r.chunk_idx)
        expect = max(math.ceil(max(n - overlap, 1) / stride), 1)
        assert len(rows) == expect, (n, size, overlap, rows)
        for i, r in enumerate(rows):
            assert r.chunk_idx == i
            assert r.start_tok == i * stride
            assert 1 <= r.n_tok <= size
            assert r.start_tok + r.n_tok <= max(n, 1)
        # full coverage: the last window reaches the end of the doc
        last = rows[-1]
        assert last.start_tok + last.n_tok == max(n, 1)


# BPE-learn differential: corpora built from words long enough that 3
# merge iterations always find a pair (the anchor word alone guarantees
# it), so the unrolled oracle CTEs never hit an empty argmax. The
# vocabulary deliberately includes boundary-fragment shapes ('bca',
# 'bcba', ...) where a merge's left element can end up a SUFFIX of an
# earlier merged symbol — the case where un-anchored single-separator
# replace diverged from the fold (caught by review in r6; the oracle
# now uses boundary-anchored double separators)
bpe_words = st.sampled_from(
    ["abcabc", "bcabca", "cabcab", "aabb", "abab", "baba", "abc",
     "bca", "bcba", "cab", "bcbca", "aaa", "aaaa"]
)
bpe_corpora = st.lists(bpe_words, min_size=3, max_size=20).map(
    lambda ws: ws + ["abcabcabc"]
)


@settings(max_examples=6, deadline=None)
@given(ws=bpe_corpora)
def test_bpe_learn_matches_duckdb_oracle_on_random_corpora(spark, ws):
    """r6 differential: the q_bpe_learn oracle re-derives the training
    trajectory via scalar-subquery-chained per-iteration argmax CTEs —
    here checked against the Spark training loop on ARBITRARY corpora,
    not just the driver fixture. Any divergence in pair counting,
    tie-breaking, or the chained-replace merge identity shows up as a
    step mismatch."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _bpe_learn_oracle_sql

    steps = 3
    docs = _docs(spark, [" ".join(ws)])
    counts: list = []
    merges, _ = text.learn_bpe_merges(
        docs, n_merges=steps, min_pair_count=1, counts_out=counts
    )
    assert len(merges) == steps  # corpus construction guarantees pairs
    got = {
        (i + 1, a, b, c)
        for i, ((a, b), c) in enumerate(zip(merges, counts))
    }
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": [0], "text": [" ".join(ws)]})
    )
    want = {
        tuple(r)
        for r in con.execute(_bpe_learn_oracle_sql(steps)).fetchall()
    }
    assert got == want


jacc_words = st.sampled_from(["a", "b", "c", "d", "e", "f"])
jacc_texts = st.lists(jacc_words, min_size=4, max_size=12).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(texts=st.lists(jacc_texts, min_size=2, max_size=8))
def test_prefix_jaccard_matches_oracle_generator_at_08(spark, texts):
    """r6 differential: the prefix-filter implementation vs the SHARED
    ngram-Jaccard oracle generator at the re-pinned t=0.8 — on random
    corpora where near-identical docs are common (tiny alphabet), so
    the high-threshold branch actually fires. Catches prefix-lemma
    bugs (a dropped true pair) and rounding-boundary drift in either
    direction."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _ngram_jaccard_oracle_sql

    docs = _docs(spark, texts)
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.jaccard_prefix_pairs(
            docs, n=3, threshold=0.8
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(texts)), "text": list(texts)}
        ),
    )
    want = {
        tuple(r)
        for r in con.execute(_ngram_jaccard_oracle_sql(0.8)).fetchall()
    }
    assert got == want


wf_words = st.sampled_from(["tok", "a", "bb"])
wf_doc = st.lists(wf_words, min_size=1, max_size=9).map(" ".join)
wf_sources = st.sampled_from(["s0", "s1", "s2", "s3"])
wf_corpus = st.lists(
    st.tuples(wf_sources, wf_doc), min_size=1, max_size=12
)


@settings(max_examples=8, deadline=None)
@given(rows=wf_corpus, budget=st.integers(min_value=0, max_value=60))
def test_waterfill_matches_sql_oracle_on_random_corpora(
    spark, rows, budget
):
    """r7 promotion staging differential: the driver-side integer
    waterfill vs its closed-form SQL replay (_waterfill_oracle_sql) on
    arbitrary corpora and budgets — first-failure index, level
    division, and remainder distribution all have off-by-one
    opportunities this hunts."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _waterfill_oracle_sql
    from dbt_schema_builder_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [
            (i, t, "en", s, len(t))
            for i, (s, t) in enumerate(rows)
        ],
        DOC_SCHEMA,
    )
    got = {
        tuple(r)
        for r in text_ops.source_mix_waterfill(
            docs, budget_tokens=budget
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "text": [t for _, t in rows],
                "source": [s for s, _ in rows],
            }
        ),
    )
    want = {
        tuple(r)
        for r in con.execute(_waterfill_oracle_sql(budget)).fetchall()
    }
    assert got == want


def test_dsir_matches_sql_oracle_on_fixture_corpus(spark, tables, sf_dir):
    """r7 promotion staging differential: dsir_importance vs
    _dsir_oracle_sql over the real sf0.001 corpus — the ln() last-ulp
    watch. A failure here means a milli rounding flipped between JVM
    Math.log and libm; record the token before loosening anything."""
    import duckdb

    from __spark_entry__ import _dsir_oracle_sql
    from dbt_schema_builder_spark.operators import text as text_ops

    docs = tables["documents"]
    got = {
        tuple(r)
        for r in text_ops.dsir_importance(
            docs, docs.where("lang = 'en'")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = {
        tuple(r)
        for r in con.execute(_dsir_oracle_sql("lang = 'en'")).fetchall()
    }
    assert got == want


def test_bpe_learn_oracle_is_boundary_anchored(spark):
    """The r6 review scenario, pinned deterministically: a corpus that
    learns (b,c) first and then faces (c,a) — the fold keeps symbols
    ['bc','a'] (no merge: 'bc' != 'c'), and the boundary-anchored
    oracle must agree step for step. The un-anchored single-separator
    oracle merged across the symbol boundary here ('bca') and chose a
    different trajectory."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _bpe_learn_oracle_sql

    # bc pairs dominate round 1; then ca/ab compete over words where
    # every 'c' is locked inside the merged 'bc' symbol
    corpus = " ".join(["bc"] * 6 + ["bca"] * 3 + ["abca"] * 2)
    counts: list = []
    merges, _ = text.learn_bpe_merges(
        _docs(spark, [corpus]), n_merges=3, min_pair_count=1,
        counts_out=counts,
    )
    assert merges[0] == ("b", "c")
    got = {
        (i + 1, a, b, c)
        for i, ((a, b), c) in enumerate(zip(merges, counts))
    }
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": [0], "text": [corpus]})
    )
    want = {
        tuple(r)
        for r in con.execute(_bpe_learn_oracle_sql(3)).fetchall()
    }
    assert got == want


ss_words = st.sampled_from(["a", "b", "c"])
ss_texts = st.lists(ss_words, min_size=1, max_size=16).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(ss_texts, min_size=1, max_size=8),
    min_len=st.integers(2, 5),
    cross=st.booleans(),
)
def test_substring_spans_match_oracle_generator(
    spark, texts, min_len, cross
):
    """r7 differential (staged for the r8 promotion): the xxhash64-keyed
    positional-gram run merge vs the string-keyed DuckDB replay, on
    random 3-letter corpora where duplicated grams, island merges,
    within-doc-only repeats, and sub-min_len runs all occur. k = min_len
    (the exact-substring regime) and k < min_len (the approximation
    regime) both exercised via the min_len draw with k fixed at 2."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _substring_spans_oracle_sql

    scope = "cross_doc" if cross else "any"
    docs = _docs(spark, texts)
    got = {
        tuple(r)
        for r in dedup.duplicate_substring_spans(
            docs, min_len=min_len, k=2, scope=scope
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r)
        for r in con.execute(
            _substring_spans_oracle_sql(min_len, k=2, scope=scope)
        ).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------------------
# r7: differential coverage for the r5-promotion oracles (fixed-corpus
# only until now — random shapes exercise ties, empty-ish docs, boundary
# ratios the synthetic corpus lacks)
# ---------------------------------------------------------------------------

gq_words = st.sampled_from(
    ["word", "a", "lengthyworditself", "@@", "#", "x9", "na", "of", ". ."]
)
gq_texts = st.lists(gq_words, min_size=1, max_size=40).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(gq_texts, min_size=1, max_size=8))
def test_gopher_rules_match_inline_oracle_on_random_docs(spark, texts):
    """The q_gopher_rules inline oracle vs text.gopher_quality_rules on
    random corpora mixing symbol-heavy, short, and duplicate-token docs
    — the boundary shapes (alpha ratio at exactly 0.7, dup fraction at
    0.3) the fixed corpus never hits."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import oracle_sql

    docs = _docs(spark, texts)
    got = {
        tuple(r)
        for r in text.gopher_quality_rules(docs).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r)
        for r in con.execute(oracle_sql()["q_gopher_rules"]).fetchall()
    }
    assert got == want


cc_words = st.sampled_from(["aa", "bb", "cc", "dd"])
cc_texts = st.lists(cc_words, min_size=1, max_size=10).map(" ".join)
cc_langs = st.sampled_from(["en", "de"])


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(cc_texts, cc_langs), min_size=2, max_size=10
    )
)
def test_ccnet_buckets_match_inline_oracle_on_random_docs(spark, rows):
    """The q_ccnet_buckets inline oracle vs text.ccnet_buckets on random
    tiny-vocab corpora: identical docs force score TIES (the doc_id
    tie-break), and 1-2 doc languages sit exactly on percent_rank's
    boundary fractions."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import oracle_sql

    docs = spark.createDataFrame(
        [
            (i, t, lang, "s", len(t))
            for i, (t, lang) in enumerate(rows)
        ],
        DOC_SCHEMA,
    )
    got = {tuple(r) for r in text.ccnet_buckets(docs).collect()}
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "text": [t for t, _ in rows],
                "lang": [l for _, l in rows],
            }
        ),
    )
    want = {
        tuple(r)
        for r in con.execute(oracle_sql()["q_ccnet_buckets"]).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    ids=st.lists(
        st.integers(0, 200), min_size=1, max_size=30, unique=True
    ),
    data=st.data(),
)
def test_snapshot_diff_matches_inline_oracle_on_random_events(
    spark, ids, data
):
    """The q_snapshot_diff inline oracle (direct value comparison) vs
    the md5-row-signature operator through the same %5/%7 derivation,
    on random event sets — including ids where the %5 slices leave one
    side empty and values that collide across rows."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import oracle_sql
    from dbt_schema_builder_spark.sources.io import snapshot_diff

    values = [
        data.draw(
            st.floats(
                min_value=0.0,
                max_value=1000.0,
                allow_nan=False,
                allow_infinity=False,
            )
        )
        for _ in ids
    ]
    ev = spark.createDataFrame(
        [
            (i, i % 7, "click", v)
            for i, v in zip(ids, values)
        ],
        "event_id long, user_id long, event_type string, value double",
    )
    old = ev.where("event_id % 5 != 4")
    new = ev.where("event_id % 5 != 0").withColumn(
        "value",
        F.when(
            F.col("event_id") % 7 == 0, F.col("value") + F.lit(1.0)
        ).otherwise(F.col("value")),
    )
    got = {
        tuple(r) for r in snapshot_diff(old, new, ["event_id"]).collect()
    }
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": pd.Series(ids, dtype="int64"),
                "user_id": pd.Series([i % 7 for i in ids], dtype="int64"),
                "event_type": "click",
                "value": pd.Series(values, dtype="float64"),
            }
        ),
    )
    want = {
        tuple(r)
        for r in con.execute(oracle_sql()["q_snapshot_diff"]).fetchall()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(ss_texts, min_size=1, max_size=8),
    min_len=st.integers(2, 5),
    k=st.integers(2, 4),
)
def test_cut_spans_match_oracle_generator(spark, texts, min_len, k):
    """r7 differential (staged for the r8 promotion): the cut/rebuild
    transform vs its SQL replay on random tiny-alphabet corpora —
    fully-cut docs, adjacent islands, docs shorter than k, and (at
    k >= 3) spans whose token extents OVERLAP across islands all
    occur. k varies past 2 on purpose: k=2 is the one geometry where
    extents cannot overlap, so pinning it would leave the overlap
    plumbing untested (r7 review). Beyond operator==oracle this pins
    the invariant the operator exists for: every duplicated k-gram
    survives at its canonical occurrence."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _cut_spans_oracle_sql

    k = min(k, min_len)
    docs = _docs(spark, texts)
    rows = dedup.cut_duplicate_spans(docs, min_len=min_len, k=k).collect()
    got = {tuple(r) for r in rows}
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r)
        for r in con.execute(
            _cut_spans_oracle_sql(min_len, k=k)
        ).fetchall()
    }
    assert got == want
    # survival invariant, independent of the oracle (both sides could
    # share a defect): every k-gram duplicated in the INPUT still
    # occurs in the rebuilt corpus at least once
    def grams(t):
        toks = t.split()
        return [
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        ]

    per_doc = [set(grams(t)) for t in texts]
    # cross-doc duplicated grams (the operator's default scope)
    cross = {
        g
        for d in per_doc
        for g in d
        if sum(g in dd for dd in per_doc) >= 2
    }
    after_grams = set()
    for r in rows:
        after_grams.update(grams(r["text_after"]))
    for g in cross:
        assert g in after_grams, (g, texts, [r["text_after"] for r in rows])


lsh_words = st.sampled_from(["a", "b", "c", "d"])
lsh_texts = st.lists(lsh_words, min_size=3, max_size=10).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(texts=st.lists(lsh_texts, min_size=2, max_size=8))
def test_minhash_candidates_match_oracle_on_random_corpora(
    spark, texts
):
    """r7 differential: the portable MinHash family + banded LSH vs its
    DuckDB replay on random tiny-alphabet corpora — identical docs,
    bands that tie on every slice, and docs with a single shingle all
    occur here but not in the driver fixture. Spark buckets on
    xxhash64 of the band slice while the oracle compares slices
    exactly; equality of the candidate sets is the no-collision
    assumption made explicit."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _minhash_oracle_sql

    docs = _docs(spark, texts)
    got = {
        tuple(r)
        for r in dedup.minhash_lsh_candidates(
            docs, shingle_hash="portable"
        )
        .select("doc_a", "doc_b", "n_agree")
        .collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r) for r in con.execute(_minhash_oracle_sql()).fetchall()
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(texts=st.lists(lsh_texts, min_size=2, max_size=8))
def test_simhash_near_dup_matches_oracle_on_random_corpora(
    spark, texts
):
    """r7 differential: portable 60-bit SimHash (per-bit votes, 16-bit
    bands, windowed bucket cap, XOR-popcount Hamming) vs its DuckDB
    replay on random corpora — zero-vote bit ties (sign of an exactly
    balanced vote) and all-docs-one-bucket shapes occur at tiny
    alphabets and would shift the signature if either engine broke the
    v > 0 convention."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _simhash_oracle_sql

    docs = _docs(spark, texts)
    got = {
        tuple(r)
        for r in dedup.simhash_near_dup(
            docs, max_hamming=16, token_hash="portable", max_bucket=200
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r) for r in con.execute(_simhash_oracle_sql()).fetchall()
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(texts=st.lists(lsh_texts, min_size=2, max_size=8))
def test_dedup_clusters_match_recursive_closure_on_random_corpora(
    spark, texts
):
    """r7 differential: iterative label propagation (Spark) vs the
    recursive-CTE transitive closure (DuckDB) over the same Jaccard
    pair graph — chains longer than the propagation's early-exit
    round count, cycles, and multi-component graphs all arise on
    tiny-alphabet corpora; the driver fixture's pair graph is nearly
    edge-free by comparison."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _dedup_clusters_oracle_sql

    docs = _docs(spark, texts)
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=64)
    got = {
        tuple(r) for r in dedup.dedup_clusters(pairs).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r)
        for r in con.execute(_dedup_clusters_oracle_sql(0.2)).fetchall()
    }
    assert got == want


lang_markers = st.sampled_from(
    # deliberately ambiguous across profiles: "de" hits es+zh, "la"
    # fr+es, "le" fr+zh — argmax ties are the norm, not the exception
    ["the", "der", "le", "la", "de", "el", "y", "und", "shi", "zz"]
)
lang_texts = st.lists(lang_markers, min_size=1, max_size=12).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(texts=st.lists(lang_texts, min_size=1, max_size=10))
def test_lang_id_matches_oracle_on_ambiguous_corpora(spark, texts):
    """r7 differential: the marker-count argmax vs its DuckDB replay on
    corpora built FROM the ambiguous markers — score ties across
    languages (broken by ascending code) and zero-hit docs dominate
    here; the driver fixture rarely ties."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _lang_id_oracle_sql

    docs = _docs(spark, texts)
    got = {tuple(r) for r in text.lang_id(docs).collect()}
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r) for r in con.execute(_lang_id_oracle_sql()).fetchall()
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(texts=st.lists(lsh_texts, min_size=2, max_size=8))
def test_keep_canonical_matches_closure_on_random_corpora(spark, texts):
    """r7 differential: the keep/drop action list vs the recursive-CTE
    closure — singleton fallbacks, whole-corpus single clusters, and
    representatives that are themselves multi-hop from some members
    all arise on tiny-alphabet corpora."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _keep_canonical_oracle_sql

    docs = _docs(spark, texts)
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=64)
    got = {tuple(r) for r in dedup.keep_canonical(docs, pairs).collect()}
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r)
        for r in con.execute(_keep_canonical_oracle_sql(0.2)).fetchall()
    }
    assert got == want


bpe_symbols = st.sampled_from(["a", "b", "c"])
bpe_words = st.lists(bpe_symbols, min_size=1, max_size=6).map("".join)
bpe_texts = st.lists(bpe_words, min_size=1, max_size=8).map(" ".join)
# pairs over base chars AND composites: cascades (('a','b') then
# ('ab','c')) and never-matching composites both occur
bpe_pair = st.tuples(
    st.sampled_from(["a", "b", "c", "ab", "bc", "ca", "aa"]),
    st.sampled_from(["a", "b", "c", "ab", "bc", "ca", "aa"]),
)


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(bpe_texts, min_size=1, max_size=6),
    merges=st.lists(bpe_pair, min_size=1, max_size=4),
)
def test_apply_bpe_matches_oracle_on_random_merge_lists(
    spark, texts, merges
):
    """r7 differential: frozen-merge BPE application vs the iterated
    separator-joined replace replay — on RANDOM merge lists, not just
    the fixture's: cascaded merges, repeated identical merges,
    composite pairs that never match, and same-pair runs (aaa with
    ('a','a')) all occur; the left-to-right non-overlapping identity
    must hold for every one."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _apply_bpe_oracle_sql

    docs = _docs(spark, texts)
    got = {
        tuple(r)
        for r in text.apply_bpe_merges(docs, list(merges))
        .select("doc_id", "n_subwords", "n_words")
        .collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r)
        for r in con.execute(
            _apply_bpe_oracle_sql(list(merges))
        ).fetchall()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(ss_texts, min_size=1, max_size=8),
    min_len=st.integers(2, 5),
    k=st.integers(2, 4),
)
def test_span_stats_match_oracle_generator(spark, texts, min_len, k):
    """r7 differential (staged for the r8 promotion): the per-doc
    duplicated-coverage rollup vs its SQL replay on random
    tiny-alphabet corpora — clean docs (zeros row), fully-covered
    docs (rate 1000), multi-span docs, and (at k >= 3) islands whose
    token extents overlap all occur. k varies past 2 on purpose: k=2
    is the one geometry where extents cannot overlap, so it cannot
    exercise the interval-union merge (r7 review). The rate <= 1000
    bound is asserted independently of the oracle."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _span_stats_oracle_sql

    k = min(k, min_len)
    docs = _docs(spark, texts)
    rows = dedup.duplicate_span_stats(docs, min_len=min_len, k=k).collect()
    got = {tuple(r) for r in rows}
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r)
        for r in con.execute(
            _span_stats_oracle_sql(min_len, k=k)
        ).fetchall()
    }
    assert got == want
    for r in rows:
        assert 0 <= r["dup_rate_milli"] <= 1000
        assert r["dup_tokens"] <= r["n_tokens"]


# eighth-unit grid: x*1000 = 125k exactly, so the Spark HALF_UP milli
# conversion, the DuckDB ROUND half-away, and float32 storage all agree
# bit-for-bit — no representable-tie rounding hazard (CLAUDE.md r3 rule)
eighth = st.integers(-8, 8).map(lambda i: i / 8.0)
vec4 = st.lists(eighth, min_size=4, max_size=4)


def _embeddings(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )


def _duck_embeddings(con, vecs):
    import pandas as pd

    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "embedding": [list(map(float, v)) for v in vecs],
            }
        ),
    )


@settings(max_examples=5, deadline=None)
@given(vecs=st.lists(vec4, min_size=3, max_size=10))
def test_pq_topk_matches_oracle_on_random_vectors(spark, vecs):
    """r7 differential: PQ/ADC + exact rerank vs its bit-identical SQL
    replay on random eighth-unit vectors — duplicate subvectors (argmin
    code ties), zero vectors, and codebooks containing identical
    codewords all occur; every tie must break identically (code index,
    then vec_id) on both engines."""
    import duckdb

    from __spark_entry__ import _pq_topk_oracle_sql

    emb = _embeddings(spark, vecs)
    got = {
        tuple(r)
        for r in similarity.pq_topk(
            emb, n_queries=2, k=3, subspaces=2, codes=2, rerank=50
        ).collect()
    }
    con = duckdb.connect()
    _duck_embeddings(con, vecs)
    want = {
        tuple(r)
        for r in con.execute(
            _pq_topk_oracle_sql(
                subspaces=2, codes=2, sd=2, n_queries=2, k=3, rerank=50
            )
        ).fetchall()
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(vecs=st.lists(vec4, min_size=3, max_size=10))
def test_ivfpq_topk_matches_oracle_on_random_vectors(spark, vecs):
    """r7 differential: the two-level IVF-PQ pipeline vs its SQL replay
    on random eighth-unit vectors — coarse-cell assignment ties and
    probe sets covering the whole corpus both occur at these sizes."""
    import duckdb

    from __spark_entry__ import _ivfpq_topk_oracle_sql

    emb = _embeddings(spark, vecs)
    got = {
        tuple(r)
        for r in similarity.ivfpq_topk(
            emb, n_queries=2, k=3, cells=2, nprobe=2, subspaces=2,
            codes=2, rerank=50,
        ).collect()
    }
    con = duckdb.connect()
    _duck_embeddings(con, vecs)
    want = {
        tuple(r)
        for r in con.execute(
            _ivfpq_topk_oracle_sql(
                cells=2, nprobe=2, subspaces=2, codes=2, sd=2,
                n_queries=2, k=3, rerank=50,
            )
        ).fetchall()
    }
    assert got == want


# 4-dim vectors on the eighth grid — r11: the ZERO vector is legal now
# (guarded cosine scores it 0.0 on both engines, as an input OR as a
# cancelled centroid). No near-tie gate needed: a nonzero dot on this
# grid is >= 1/64, so |cos| >= ~0.004 — computed sims never contend
# with the exact-0.0 guard branch within float noise.
nz_vec4 = vec4  # name kept for the other differentials below


@settings(max_examples=6, deadline=None)
@given(vecs=st.lists(vec4, min_size=3, max_size=8))
def test_kmeans_matches_oracle_on_random_vectors(spark, vecs):
    """r7 differential: the iterative Lloyd trajectory vs its unrolled
    DuckDB replay on random vectors — duplicate vectors (cosine ties
    broken by centroid id), clusters that lose all members mid-run,
    and n barely above k all occur here but never in the driver
    fixture. r11: a zero vector is APPENDED every example (all-zero on
    the 17^4 grid is too rare to arise organically) — it exercises the
    guarded assignment (all sims exactly 0.0 -> lowest centroid id) and,
    as a cluster member, pulls means toward the reachable-zero-centroid
    shape on both engines."""
    import duckdb

    from __spark_entry__ import _kmeans_oracle_sql

    vecs = list(vecs) + [[0.0, 0.0, 0.0, 0.0]]
    emb = _embeddings(spark, vecs)
    got = {
        tuple(r)
        for r in similarity.kmeans(emb, k=2, iterations=2)
        .select("vec_id", "centroid_id")
        .collect()
    }
    con = duckdb.connect()
    _duck_embeddings(con, vecs)
    want = {
        tuple(r)
        for r in con.execute(
            _kmeans_oracle_sql(k=2, iterations=2)
        ).fetchall()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    vecs=st.lists(nz_vec4, min_size=3, max_size=8),
    labels=st.lists(st.integers(0, 1), min_size=8, max_size=8),
)
def test_knn_agreement_matches_oracle_on_random_vectors(
    spark, vecs, labels
):
    """r7 differential: kNN label agreement vs its DuckDB replay —
    exact-duplicate vectors force d2 ties (broken by vec_id), and
    two-label corpora hit both full and zero agreement; the driver
    fixture's organic embeddings have neither. Labels are INTEGER
    (the operator's contract — it collects queries through int())."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _knn_label_agreement_oracle_sql

    labels = labels[: len(vecs)]
    emb = spark.createDataFrame(
        [
            (i, [float(x) for x in v], lab)
            for i, (v, lab) in enumerate(zip(vecs, labels))
        ],
        "vec_id bigint, embedding array<float>, label int",
    )
    got = {
        tuple(r)
        for r in similarity.knn_label_agreement(
            emb, n_queries=3, k=2
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "embedding": [list(map(float, v)) for v in vecs],
                "label": labels,
            }
        ),
    )
    want = {
        tuple(r)
        for r in con.execute(
            _knn_label_agreement_oracle_sql(n_queries=3, k=2)
        ).fetchall()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.integers(1, 6), st.integers(1, 3)),
        min_size=1,
        max_size=6,
    ),
    lines=st.lists(
        st.tuples(st.integers(1, 8), st.integers(1, 3)),
        min_size=1,
        max_size=8,
    ),
)
def test_pagerank_matches_oracle_on_random_graphs(spark, orders, lines):
    """r7 differential: the fixed-point PageRank trajectory vs its
    unrolled-CTE replay on random tiny bipartite graphs — orphan
    orders (no lines), dangling line orderkeys, parallel edges
    (DISTINCT-collapsed), and multi-component graphs all occur; an
    empty join means both sides emit the empty set."""
    import duckdb
    import pandas as pd

    from dbt_schema_builder_spark.operators import graph

    from __spark_entry__ import _pagerank_oracle_sql

    odf = spark.createDataFrame(
        [(ok, ck) for ok, ck in orders], "o_orderkey bigint, o_custkey bigint"
    )
    ldf = spark.createDataFrame(
        [(ok, sk) for ok, sk in lines], "l_orderkey bigint, l_suppkey bigint"
    )
    got = {
        tuple(r)
        for r in graph.pagerank_topk(
            graph.bipartite_edges(odf, ldf), iterations=3, k=50
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": pd.Series([o for o, _ in orders], dtype="int64"),
                "o_custkey": pd.Series([c for _, c in orders], dtype="int64"),
            }
        ),
    )
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": pd.Series([o for o, _ in lines], dtype="int64"),
                "l_suppkey": pd.Series([s for _, s in lines], dtype="int64"),
            }
        ),
    )
    want = {
        tuple(r)
        for r in con.execute(
            _pagerank_oracle_sql(iterations=3, k=50)
        ).fetchall()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(bpe_texts, min_size=1, max_size=6),
    langs=st.lists(st.sampled_from(["en", "de"]), min_size=6, max_size=6),
    merges=st.lists(bpe_pair, min_size=1, max_size=3),
)
def test_tokenizer_fertility_matches_oracle_on_random_corpora(
    spark, texts, langs, merges
):
    """r7 differential: the per-language fertility rollup vs its DuckDB
    replay on random corpora and random merge lists — single-language
    corpora, languages with one tiny doc, and merge cascades all
    occur; truncating-div milli ratios must agree exactly."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _tokenizer_fertility_oracle_sql

    langs = langs[: len(texts)]
    docs = spark.createDataFrame(
        [(i, t, lang) for i, (t, lang) in enumerate(zip(texts, langs))],
        "doc_id bigint, text string, lang string",
    )
    got = {
        tuple(r)
        for r in text.tokenizer_fertility(docs, list(merges)).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": list(texts),
                "lang": langs,
            }
        ),
    )
    want = {
        tuple(r)
        for r in con.execute(
            _tokenizer_fertility_oracle_sql(list(merges))
        ).fetchall()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(texts=st.lists(ss_texts, min_size=2, max_size=8))
def test_cluster_safe_split_matches_oracle_on_random_corpora(
    spark, texts
):
    """r7 differential: the leakage-safe split vs its DuckDB replay —
    singleton docs (self-keyed), multi-doc chains needing transitive
    closure, and all-duplicate corpora occur on random tiny-alphabet
    inputs; the md5 split arithmetic on the representative must agree
    bit-for-bit."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _cluster_safe_split_oracle_sql

    docs = _docs(spark, texts)
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=64)
    got = {
        tuple(r) for r in dedup.cluster_safe_split(docs, pairs).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r)
        for r in con.execute(
            _cluster_safe_split_oracle_sql(0.2)
        ).fetchall()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(vecs=st.lists(nz_vec4, min_size=3, max_size=8))
def test_lsh_topk_matches_oracle_on_random_vectors(spark, vecs):
    """r7 differential: the quantize -> hyperplane-bucket -> rerank ANN
    pipeline vs its DuckDB replay at a narrow geometry (dim=4, 3-bit
    buckets) — duplicate vectors (quantized-cosine ties), queries
    whose bucket holds nothing else, and saturating quantization all
    occur; every stage is integer so agreement is exact."""
    import duckdb

    from __spark_entry__ import _lsh_topk_oracle_sql

    emb = _embeddings(spark, vecs)
    got = {
        tuple(r)
        for r in similarity.lsh_quantized_topk(
            emb, k=2, bits=3, dim=4, n_queries=2
        ).collect()
    }
    con = duckdb.connect()
    _duck_embeddings(con, vecs)
    want = {
        tuple(r)
        for r in con.execute(
            _lsh_topk_oracle_sql(k=2, bits=3, dim=4, n_queries=2)
        ).fetchall()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(vecs=st.lists(nz_vec4, min_size=2, max_size=7))
def test_semantic_dedup_matches_oracle_on_random_vectors(spark, vecs):
    """r7 differential: SemDeDup's exact branch (all-pairs cosine +
    transitive closure + keep/drop actions) vs its recursive-CTE
    replay — duplicate vectors (cos exactly 1), chains needing real
    closure, and all-singleton corpora occur. Precondition: no pair's
    cosine sits within 1e-9 of the threshold — the operator computes
    dot/sqrt(sqa*sqb) in numpy and the oracle dot/(|a||b|) in DuckDB,
    which can differ by ulps AT the boundary (the organic corpus
    satisfies the same margin; boundary behavior is not part of the
    contract, CLAUDE.md r5 float-threshold rule)."""
    import math

    import duckdb

    from hypothesis import assume

    from __spark_entry__ import _semantic_dedup_oracle_sql

    t = 0.4
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            dot = sum(a * b for a, b in zip(vecs[i], vecs[j]))
            na = math.sqrt(sum(a * a for a in vecs[i]))
            nb = math.sqrt(sum(b * b for b in vecs[j]))
            # r11: zero-norm pairs score 0.0 under the guard (both
            # engines exclude them at thr 0.4) — never boundary-gated
            cos = 0.0 if na == 0 or nb == 0 else dot / (na * nb)
            assume(abs(cos - t) > 1e-9)
    emb = _embeddings(spark, vecs)
    got = {
        tuple(r)
        for r in similarity.semantic_dedup(
            emb, threshold=t, strategy="blocked"
        ).collect()
    }
    con = duckdb.connect()
    _duck_embeddings(con, vecs)
    want = {
        tuple(r)
        for r in con.execute(_semantic_dedup_oracle_sql(t)).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    rows=wf_corpus, budget=st.integers(min_value=0, max_value=5000)
)
def test_temperature_mix_matches_sql_oracle_on_random_corpora(
    spark, rows, budget
):
    """r8 promotion staging differential: the driver-side integer
    temperature (alpha=0.5) solve vs its SQL replay
    (_temperature_mix_oracle_sql) on arbitrary corpora and budgets —
    isqrt correction boundaries (perfect squares, square-minus-one),
    remainder-rank ties, and leftover == 0 all arise here and never on
    the fixture."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _temperature_mix_oracle_sql
    from dbt_schema_builder_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
        DOC_SCHEMA,
    )
    got = {
        tuple(r)
        for r in text_ops.source_mix_temperature(
            docs, budget_tokens=budget
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "text": [t for _, t in rows],
                "source": [s for s, _ in rows],
            }
        ),
    )
    want = {
        tuple(r)
        for r in con.execute(
            _temperature_mix_oracle_sql(budget)
        ).fetchall()
    }
    assert got == want
    # allocation spends the budget exactly whenever any source has tokens
    if any(len(t.split()) > 0 and t.strip() for _, t in rows):
        assert sum(r[4] for r in got) == budget


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(lsh_texts, min_size=2, max_size=8),
    m=st.integers(min_value=1, max_value=3),
)
def test_cluster_diversity_matches_closure_on_random_corpora(
    spark, texts, m
):
    """r8 promotion staging differential: top-m-per-cluster retention
    vs the recursive-CTE closure + rank replay — multi-doc clusters,
    token-count ties (broken by doc_id), and m >= cluster size all
    arise on tiny-alphabet corpora."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _cluster_diversity_oracle_sql

    docs = _docs(spark, texts)
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=64)
    got = {
        tuple(r)
        for r in dedup.cluster_diversity_sample(docs, pairs, m=m).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r)
        for r in con.execute(
            _cluster_diversity_oracle_sql(0.2, m)
        ).fetchall()
    }
    assert got == want


def test_nb_scores_matches_sql_oracle_on_fixture_corpus(
    spark, tables, sf_dir
):
    """r8 promotion staging differential: the Naive Bayes quality
    filter vs _nb_scores_oracle_sql over the real sf0.001 corpus — the
    ln() last-ulp watch, same policy as the dsir differential (floats
    are confined to one rounded log per distinct token; a failure here
    means a milli rounding flipped between JVM Math.log and libm)."""
    import duckdb

    from __spark_entry__ import _nb_scores_oracle_sql
    from dbt_schema_builder_spark.operators import classifier

    docs = tables["documents"]
    label = "text LIKE '%dup%'"
    got = {
        tuple(r) for r in classifier.nb_scores(docs, label=label).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = {
        tuple(r)
        for r in con.execute(_nb_scores_oracle_sql(label)).fetchall()
    }
    assert got == want


nb_label = st.sampled_from(
    [
        "text LIKE '%a%'",        # text-derived, mixed classes
        "length(text) > 10",      # length label (NB can't learn it —
                                  # exactness still must hold)
        "lang = 'en'",            # metadata label
        "1 = 1",                  # single-class corpus: all positive
        "1 = 0",                  # single-class corpus: all negative
    ]
)
nb_word = st.sampled_from(["a", "b", "ab", "ba", "x", "dup"])
nb_text = st.one_of(
    st.just(""),                  # token-less doc
    st.just("   "),               # whitespace-only doc
    st.lists(nb_word, min_size=1, max_size=6).map(" ".join),
)
nb_corpus = st.lists(nb_text, min_size=1, max_size=10)


@settings(max_examples=10, deadline=None)
@given(texts=nb_corpus, label=nb_label)
def test_nb_scores_matches_sql_oracle_on_random_corpora(
    spark, texts, label
):
    """r8 ADVICE: the fixture-only NB differential never exercised
    single-class corpora (empty-class smoothing), all-token-less docs,
    or labels uncorrelated with text — the shapes where
    generator/operator drift historically hides. Hypothesis varies the
    corpus AND the label predicate; both engines must agree exactly
    (the only float is one rounded log per distinct token + the
    prior)."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _nb_scores_oracle_sql
    from dbt_schema_builder_spark.operators import classifier

    docs = _docs(spark, texts)
    got = {
        tuple(r) for r in classifier.nb_scores(docs, label=label).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": list(texts),
                "lang": ["en"] * len(texts),
            }
        ),
    )
    want = {
        tuple(r)
        for r in con.execute(_nb_scores_oracle_sql(label)).fetchall()
    }
    assert got == want


# ----------------------------------------------- streaming oracle replays

_stream_seq_counter = __import__("itertools").count()

ev_event = st.tuples(
    st.integers(min_value=0, max_value=6),        # user_id
    st.integers(min_value=0, max_value=3000),     # minute offset — random
                                                  # order = late arrivals
    st.sampled_from(["view", "click", "purchase", "other"]),
    st.integers(min_value=-(10**6), max_value=10**6),  # value micro-units
)
ev_stream = st.lists(ev_event, min_size=1, max_size=30)


def _drop_stream_dir(d):
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def _stage_random_stream(spark, rows):
    """Write a hypothesis-generated event list as ONE parquet drop dir
    (single-batch availableNow intake — the closed-form regime the
    streaming oracles replay) and return (dir, data, duckdb events df)."""
    import datetime
    import tempfile

    import pandas as pd

    from dbt_schema_builder_spark.streaming.windows import EVENTS_SCHEMA

    base = datetime.datetime(2024, 1, 1)
    data = [
        (
            i,
            base + datetime.timedelta(minutes=mins),
            uid,
            etype,
            micros / 1e6,
            "{}",
        )
        for i, (uid, mins, etype, micros) in enumerate(rows)
    ]
    d = tempfile.mkdtemp(prefix="st_prop_")
    spark.createDataFrame(data, EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    # caller must _drop_stream_dir(d) once the drain has finished —
    # hypothesis runs dozens of examples and mkdtemp litter adds up
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in data],
            "ts": pd.Series([r[1] for r in data], dtype="datetime64[us]"),
            "user_id": [r[2] for r in data],
            "event_type": [r[3] for r in data],
            "value": [r[4] for r in data],
        }
    )
    return d, pdf


@settings(max_examples=5, deadline=None)
@given(rows=ev_stream)
def test_stream_tumbling_oracle_replays_random_streams(spark, rows):
    """r7 verdict #6: the 6 streaming oracles rested on the fixed
    corpus only. Random out-of-order (late) event streams exercise the
    watermark-withhold boundary (windows ending within 10 min of max
    ts), empty buckets, and negative value sums — the closed-form
    emitted set (end <= max ts - delay) must match the DuckDB replay
    exactly on every stream shape."""
    import duckdb

    import __spark_entry__ as entry
    from dbt_schema_builder_spark.session import epoch_millis
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_tumbling_counts,
    )

    d, pdf = _stage_random_stream(spark, rows)
    name = f"t_prop_tumbling_{next(_stream_seq_counter)}"
    out = run_stream_to_memory(
        streaming_tumbling_counts(stream_events(spark, d)), name, "append"
    )
    _drop_stream_dir(d)
    got = {
        tuple(r)
        for r in out.select(
            epoch_millis("bucket").alias("bucket_ms"),
            "n_events",
            "sum_value",
        ).collect()
    }
    con = duckdb.connect()
    con.register("events", pdf)
    want = {
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["q_stream_tumbling"]
        ).fetchall()
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(rows=ev_stream)
def test_stream_funnel_oracle_replays_random_streams(spark, rows):
    """The funnel's greedy strictly-after chain (t1 = min view; t2 =
    min click > t1; t3 = min purchase > t2) vs the correlated-MIN SQL
    replay on random streams: equal-timestamp boundaries, users with
    only non-funnel events, and chains broken at every stage arise
    here and never on the fixture."""
    import duckdb

    import __spark_entry__ as entry
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_funnel,
    )

    d, pdf = _stage_random_stream(spark, rows)
    name = f"t_prop_funnel_{next(_stream_seq_counter)}"
    out = run_stream_to_memory(
        streaming_funnel(stream_events(spark, d)), name, "update"
    )
    _drop_stream_dir(d)
    got = {tuple(r) for r in out.collect()}
    con = duckdb.connect()
    con.register("events", pdf)
    want = {
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["q_stream_funnel"]
        ).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(texts=nb_corpus, label=nb_label)
def test_nb_apply_matches_sql_oracle_on_random_corpora(
    spark, texts, label
):
    """r9 promotion staging differential: the full train/apply split —
    md5 hash_split train slice -> frozen model + prior -> held-out
    scoring — vs _nb_apply_oracle_sql. Random corpora reach the shapes
    the fixture can't: empty train or held slices, all-OOV held docs,
    single-class training."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _nb_apply_oracle_sql
    from dbt_schema_builder_spark.operators import classifier
    from dbt_schema_builder_spark.operators import text as text_ops

    docs = _docs(spark, texts)
    split = text_ops.hash_split(docs)
    train = docs.join(
        split.where("split = 'train'").select("doc_id"), "doc_id"
    )
    held = docs.join(
        split.where("split != 'train'").select("doc_id"), "doc_id"
    )
    model = classifier.nb_token_logodds(train, label)
    prior = classifier.nb_prior_milli(train, label)
    got = {
        tuple(r)
        for r in classifier.nb_apply(
            model, held, prior_milli=prior
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": list(texts),
                "lang": ["en"] * len(texts),
            }
        ),
    )
    want = {
        tuple(r)
        for r in con.execute(_nb_apply_oracle_sql(label)).fetchall()
    }
    assert got == want


hybrid_word = st.sampled_from(["data", "dup", "pad", "x", "the"])
hybrid_text = st.lists(hybrid_word, min_size=1, max_size=12).map(" ".join)
hybrid_corpus = st.lists(hybrid_text, min_size=1, max_size=12)


@settings(max_examples=8, deadline=None)
@given(texts=hybrid_corpus, topk=st.integers(min_value=1, max_value=6))
def test_hybrid_search_matches_sql_oracle_on_random_corpora(
    spark, texts, topk
):
    """r9 promotion staging differential: BM25 + raw-tf RRF fusion vs
    _hybrid_oracle_sql on random corpora — rank-boundary ties (equal
    scores broken by doc_id), docs in one list but not the other, and
    query terms missing entirely all arise here."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _hybrid_oracle_sql
    from dbt_schema_builder_spark.operators import text as text_ops

    docs = _docs(spark, texts)
    got = {
        tuple(r)
        for r in text_ops.hybrid_search(
            docs, ("data", "dup"), topk=topk
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r)
        for r in con.execute(
            _hybrid_oracle_sql(("data", "dup"), topk=topk)
        ).fetchall()
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(rows=ev_stream)
def test_stream_session_oracle_replays_random_streams(spark, rows):
    """Session windows: gap merges, the end <= max ts - 1h withhold
    boundary, and single-event sessions on random late streams vs the
    sessionize + filter replay."""
    import duckdb

    import __spark_entry__ as entry
    from dbt_schema_builder_spark.session import epoch_millis
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_session_window,
    )

    d, pdf = _stage_random_stream(spark, rows)
    name = f"t_prop_session_{next(_stream_seq_counter)}"
    out = run_stream_to_memory(
        streaming_session_window(stream_events(spark, d)), name, "append"
    )
    _drop_stream_dir(d)
    got = {
        tuple(r)
        for r in out.select(
            "user_id",
            epoch_millis("session_start").alias("session_start_ms"),
            epoch_millis("session_end").alias("session_end_ms"),
            "n_events",
        ).collect()
    }
    con = duckdb.connect()
    con.register("events", pdf)
    want = {
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["q_stream_session"]
        ).fetchall()
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(rows=ev_stream)
def test_stream_user_state_oracle_replays_random_streams(spark, rows):
    """applyInPandasWithState running totals: integer micro-unit state
    sums (batch-order independent) and the latest-ts-lives-in-state
    rule (the r5 bug class) vs the per-user batch aggregate replay."""
    import duckdb

    import __spark_entry__ as entry
    from dbt_schema_builder_spark.session import epoch_millis
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_user_state,
    )

    d, pdf = _stage_random_stream(spark, rows)
    name = f"t_prop_ustate_{next(_stream_seq_counter)}"
    out = run_stream_to_memory(
        streaming_user_state(stream_events(spark, d)), name, "update"
    )
    _drop_stream_dir(d)
    got = {
        tuple(r)
        for r in out.select(
            "user_id",
            "n_events",
            "total_value",
            epoch_millis("last_ts").alias("last_ts_ms"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("events", pdf)
    want = {
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["q_stream_user_state"]
        ).fetchall()
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(rows=ev_stream)
def test_stream_dedup_oracle_replays_random_streams(spark, rows):
    """dropDuplicatesWithinWatermark over already-unique event_ids is an
    exact pass-through under single-batch intake — pinned against the
    trivial SELECT replay so a future watermark/keying change that
    starts dropping rows turns a silent semantics shift into a red
    differential."""
    import duckdb

    import __spark_entry__ as entry
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_dedup,
    )

    d, pdf = _stage_random_stream(spark, rows)
    name = f"t_prop_sdedup_{next(_stream_seq_counter)}"
    out = run_stream_to_memory(
        streaming_dedup(stream_events(spark, d)).select(
            "event_id", "user_id", "event_type"
        ),
        name,
        "append",
    )
    _drop_stream_dir(d)
    got = {tuple(r) for r in out.collect()}
    con = duckdb.connect()
    con.register("events", pdf)
    want = {
        tuple(r)
        for r in con.execute(entry.oracle_sql()["q_stream_dedup"]).fetchall()
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(rows=ev_stream)
def test_stream_join_oracle_replays_random_streams(spark, rows):
    """Watermarked stream-stream click->purchase join under single-batch
    intake == the batch range join: random streams reach the 60-minute
    boundary (inclusive both ends), same-timestamp click/purchase, and
    multi-match fan-out."""
    import duckdb

    import __spark_entry__ as entry
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_click_purchase_join,
    )

    d, pdf = _stage_random_stream(spark, rows)
    name = f"t_prop_sjoin_{next(_stream_seq_counter)}"
    out = run_stream_to_memory(
        streaming_click_purchase_join(stream_events(spark, d)),
        name,
        "append",
    )
    _drop_stream_dir(d)
    got = {tuple(r) for r in out.collect()}
    con = duckdb.connect()
    con.register("events", pdf)
    want = {
        tuple(r)
        for r in con.execute(entry.oracle_sql()["q_stream_join"]).fetchall()
    }
    assert got == want


# ------------------------------------------- inline-oracle random replays
# (r8: the generator-based oracles all carry random-corpus differentials;
# these extend the pattern to three complex INLINE oracles whose edge
# geometry the fixture corpus can't reach)


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(lsh_texts, min_size=2, max_size=8))
def test_containment_inline_oracle_on_random_corpora(spark, texts):
    """Integer containment boundary (n_inter*1000 >= 500*min(|A|,|B|))
    hits exact ties on tiny-alphabet corpora that the organic fixture
    never produces; the capped branch is opted out (the oracle omits
    max_df — a no-op at df <= corpus size here)."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    docs = _docs(spark, texts)
    got = {
        tuple(r)
        for r in dedup.containment_pairs(
            docs, n=3, threshold_milli=500, max_df=64,
            max_dropped_mass=None,
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["q_containment"]
        ).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(lsh_texts, min_size=1, max_size=8))
def test_winnowing_inline_oracle_on_random_corpora(spark, texts):
    """Winnowing window minima over md5-portable gram hashes: docs with
    fewer than k grams (empty fingerprint set) and repeated grams
    (duplicate minima collapsing under DISTINCT) arise here."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    docs = _docs(spark, texts)
    got = {
        tuple(r)
        for r in text.winnowing_fingerprints(docs, portable=True).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r)
        for r in con.execute(entry.oracle_sql()["q_winnowing"]).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(lsh_texts, min_size=1, max_size=8))
def test_chunk_dedup_inline_oracle_on_random_corpora(spark, texts):
    """Fixed-stride chunk dedup: ragged final chunks, fully-removed
    docs (absent from BOTH sides), and chunk-boundary duplication all
    arise on random corpora."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    docs = _docs(spark, texts)
    got = {
        tuple(r)
        for r in dedup.chunk_dedup(docs, chunk=8, max_docs=2).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r)
        for r in con.execute(entry.oracle_sql()["q_chunk_dedup"]).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(lsh_texts, min_size=2, max_size=10))
def test_decontaminate_inline_oracle_on_random_corpora(spark, texts):
    """Decontamination vs the smallest-5-doc_ids bench set: corpora
    smaller than the bench slice, docs with < n tokens (no shingles,
    never contaminated), and bench docs flagging themselves."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    docs = _docs(spark, texts)
    bench = docs.orderBy("doc_id").limit(5)
    got = {
        tuple(r) for r in dedup.decontaminate(docs, bench, n=3).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["q_decontaminate"]
        ).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(lsh_texts, min_size=1, max_size=10))
def test_shared_ngram_fraction_inline_oracle_on_random_corpora(
    spark, texts
):
    """Positional (not set) gram duplication with the min_df=2 boundary
    and the floored-ppm surface — repeated grams WITHIN one doc count
    every occurrence, a shape the organic corpus rarely produces."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    docs = _docs(spark, texts)
    got = {
        tuple(r)
        for r in dedup.shared_ngram_fraction(docs, n=3, min_df=2).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    want = {
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["q_shared_ngram_fraction"]
        ).fetchall()
    }
    assert got == want


pack_sizes = st.sampled_from([1, 7, 100, 1024, 2047, 2048, 2049, 4096])
pack_corpus = st.lists(
    st.tuples(st.sampled_from(["en", "fr"]), pack_sizes),
    min_size=1,
    max_size=8,
)


@settings(max_examples=8, deadline=None)
@given(rows=pack_corpus)
def test_pack_sequences_inline_oracle_on_random_corpora(spark, rows):
    """Running-sum chunk assignment at exact budget multiples: docs of
    2047/2048/2049/4096 tokens place tokens_before exactly on, just
    below, and just past the 2048 boundary per language."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    texts = ["w " * n for _, n in rows]
    docs = spark.createDataFrame(
        [
            (i, t.strip(), lang, "s", len(t))
            for i, (t, (lang, _)) in enumerate(zip(texts, rows))
        ],
        DOC_SCHEMA,
    )
    got = {
        tuple(r) for r in text.pack_sequences(docs, budget=2048).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "text": [t.strip() for t in texts],
                "lang": [lang for lang, _ in rows],
            }
        ),
    )
    want = {
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["q_pack_sequences"]
        ).fetchall()
    }
    assert got == want


chunk_sizes = st.sampled_from([1, 15, 16, 17, 48, 63, 64, 65, 112, 113])


@settings(max_examples=8, deadline=None)
@given(sizes=st.lists(chunk_sizes, min_size=1, max_size=6))
def test_sliding_chunks_inline_oracle_on_random_corpora(spark, sizes):
    """Sliding 64/16 chunking at the stride boundaries: docs shorter
    than the overlap, exactly one window, and one-token remainders."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    texts = [("w " * n).strip() for n in sizes]
    docs = _docs(spark, texts)
    got = {
        tuple(r)
        for r in text.sliding_chunks(docs, size=64, overlap=16).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(sizes)), "text": list(texts)}),
    )
    want = {
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["q_sliding_chunks"]
        ).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(rows=wf_corpus)
def test_curriculum_bins_inline_oracle_on_random_corpora(spark, rows):
    """NTILE bin assignment with groups SMALLER than the bin count and
    massed n_chars ties (broken by doc_id) — both unreachable on the
    organic fixture where every source holds hundreds of docs."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    docs = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
        DOC_SCHEMA,
    )
    got = {
        tuple(r) for r in text.curriculum_bins(docs, n_bins=10).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "source": [s for s, _ in rows],
                "n_chars": [len(t) for _, t in rows],
            }
        ),
    )
    want = {
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["q_curriculum_bins"]
        ).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(rows=st.lists(
    st.tuples(st.sampled_from(["s0", "s1", "s2"]), lsh_texts),
    min_size=2,
    max_size=10,
))
def test_source_overlap_inline_oracle_on_random_corpora(spark, rows):
    """Cross-source gram overlap with the 60-bit md5-prefix key:
    single-source corpora (empty matrix), full-overlap pairs (jaccard
    1.0), and sources with zero shingles."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    docs = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
        DOC_SCHEMA,
    )
    got = {
        tuple(r) for r in dedup.source_overlap_matrix(docs, n=3).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "source": [s for s, _ in rows],
                "text": [t for _, t in rows],
            }
        ),
    )
    want = {
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["q_source_overlap"]
        ).fetchall()
    }
    assert got == want


def test_det_avg_round4_exact_tie_regression(spark):
    """r8 regression pin — the corpus hypothesis found where the
    micro-unit average lands EXACTLY on a 4-decimal half: doc 4's lp
    micros sum to -10503500 over 10 tokens (avg -1.05035). The old
    F.round(double, 4) path diverged between engines (Spark HALF_UP on
    the shortest decimal string -> -1.0504; DuckDB rounding the binary
    double just below the tie -> -1.0503); _det_avg_round4's integer
    half-away arithmetic gives -1.0504 on BOTH. Deterministic twin of
    the hypothesis differential so the example survives example-DB
    loss."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    texts = [
        "aa",
        "aa dd",
        "aa aa aa",
        "aa aa bb dd",
        "aa aa aa aa aa aa cc cc dd dd",
        "aa aa aa cc cc cc cc dd dd",
        "bb",
        "cc",
    ]
    docs = _docs(spark, texts)
    got = {
        r.doc_id: r.avg_logprob
        for r in text.unigram_logprob(docs).collect()
    }
    # integer half-away of -1.05035 at 4 decimals = -1.0504
    assert got[4] == -1.0504
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    want = {
        r[0]: r[1]
        for r in con.execute(
            entry.oracle_sql()["q_unigram_logprob"]
        ).fetchall()
    }
    assert want[4] == -1.0504
    assert got == {k: want[k] for k in got}


def test_det_avg_round4_big_sum_exact_division(spark):
    """r9 ADVICE fix pin — the r8 _det_avg_round4 computed its final
    quotient as ((n2 - n2 % d2) / d2).cast('long'): a DOUBLE division
    of longs, exact only while the numerator ~2|s| stays below 2^53.
    These two values sum to 99_271_258_142_401_088 micros (~2^56.5);
    the old form lands one BELOW the true quotient while the DuckDB
    oracle's exact integer `//` does not — the same divergence class as
    the r8 tie bug, one magnitude up. The integral `div`
    (F.call_function) has no such bound. Values are integer-valued
    doubles at this magnitude, so F.round(val*1e6) is deterministic."""
    from pyspark.sql import functions as SF

    vals = [53168173654.421135, 46103084487.97995]
    # replicate the unit derivation in exact Python to get the target
    u = [int(v * 1e6) for v in vals]
    assert all(float(x) == v * 1e6 for x, v in zip(u, vals))
    s, d = sum(u), len(u) * 100
    expected = ((2 * abs(s) + d) // (2 * d)) / 10000.0
    # the retired double-division form is off by one here
    n2, d2 = 2 * abs(s) + d, 2 * d
    assert int(float(n2 - n2 % d2) / d2) != (2 * abs(s) + d) // (2 * d)
    df = spark.createDataFrame([(v,) for v in vals], "val double")
    got = df.agg(
        similarity._det_avg_round4(SF.col("val")).alias("r")
    ).collect()[0]["r"]
    assert got == expected


def test_jaccard_unrounded_surface_tie_divergence(spark):
    """r9 regression pin for the emitted-jaccard tie class (r8 ADVICE):
    a pair with 57 shared trigrams and union 800 has jaccard exactly
    57/800 = 0.07125, one of 84 measured rationals with denominator
    <= 4000 where ROUND(x, 4) diverges between engines (Spark HALF_UP
    on the shortest decimal string -> 0.0713; DuckDB re-rounds x*1e4
    -> 0.0712). The surface is now the raw IEEE quotient of the same
    int64s — identical in both engines at every input. This test FAILS
    under the old rounded surface."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    shared = [f"s{i}" for i in range(59)]  # 57 shared trigrams
    doc_a = " ".join(shared + [f"a{i}" for i in range(371)])
    doc_b = " ".join(shared + [f"b{i}" for i in range(372)])
    docs = _docs(spark, [doc_a, doc_b])
    got = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.05).collect()
    assert len(got) == 1
    assert got[0]["jaccard"] == 57 / 800  # == 0.07125 as a double
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": [0, 1], "text": [doc_a, doc_b]}),
    )
    want = con.execute(entry._ngram_jaccard_oracle_sql(0.05)).fetchall()
    assert len(want) == 1
    assert want[0][2] == got[0]["jaccard"]
    # the prefix twin must agree bit-for-bit (shared driver oracle)
    pp = dedup.jaccard_prefix_pairs(docs, n=3, threshold=0.05).collect()
    assert [tuple(r) for r in pp] == [tuple(r) for r in got]


# ---------------------------------------------------------------------------
# r10: inline oracle differentials for the ROUND(int/int) retirement batch —
# the raw-quotient surfaces must match DuckDB bit-for-bit on corpora the
# fixture never shows (tie-prone rationals, single-token docs, tiny groups)
# ---------------------------------------------------------------------------


def _duck_docs(rows):
    """duckdb connection with a documents view shaped like DOC_SCHEMA."""
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
                "source": [r[3] for r in rows],
                "n_chars": [r[4] for r in rows],
            }
        ),
    )
    return con


def _full_docs(spark, pairs):
    rows = [
        (i, t, "en", s, len(t)) for i, (s, t) in enumerate(pairs)
    ]
    return rows, spark.createDataFrame(rows, DOC_SCHEMA)


@settings(max_examples=8, deadline=None)
@given(text_list=st.lists(texts, min_size=1, max_size=10))
def test_quality_score_inline_oracle_on_random_corpora(spark, text_list):
    """avg_token_len / stopword_ratio as raw IEEE quotients: any n/d the
    corpus produces must match DuckDB exactly (the retired ROUND form
    diverged at 4-decimal-half rationals like 57/800)."""
    import __spark_entry__ as entry

    pairs = [("s", t) for t in text_list]
    rows, docs = _full_docs(spark, pairs)
    got = {tuple(r) for r in text.quality_score(docs).collect()}
    con = _duck_docs(rows)
    want = {
        tuple(r)
        for r in con.execute(entry.oracle_sql()["q_quality_score"]).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(text_list=st.lists(texts, min_size=1, max_size=10))
def test_oov_rate_inline_oracle_on_random_corpora(spark, text_list):
    """oov_rate raw quotient + the derived top-20 vocab: corpora with
    fewer than 20 distinct tokens exercise the LIMIT underflow, heavy
    stopword mass exercises count ties in the vocab ranking."""
    import __spark_entry__ as entry

    pairs = [("s", t) for t in text_list]
    rows, docs = _full_docs(spark, pairs)
    got = {
        tuple(r)
        for r in text.oov_rate(docs, text.top_vocab(docs, size=20)).collect()
    }
    con = _duck_docs(rows)
    want = {
        tuple(r)
        for r in con.execute(entry.oracle_sql()["q_oov_rate"]).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(pairs=st.lists(
    st.tuples(st.sampled_from(["s0", "s1"]), lsh_texts),
    min_size=1,
    max_size=12,
))
def test_dedup_stats_inline_oracle_on_random_corpora(spark, pairs):
    """dup_rate raw quotient over md5-keyed distinct counts: the
    lsh vocabulary forces verbatim collisions, tiny groups force
    denominators the fixture never has (1, 2, 3...)."""
    import __spark_entry__ as entry

    rows, docs = _full_docs(spark, pairs)
    got = {tuple(r) for r in dedup.dedup_stats(docs).collect()}
    con = _duck_docs(rows)
    want = {
        tuple(r)
        for r in con.execute(entry.oracle_sql()["q_dedup_stats"]).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(pairs=st.lists(
    st.tuples(st.sampled_from(["s0", "s1"]), lsh_texts),
    min_size=1,
    max_size=12,
))
def test_zipf_stats_inline_oracle_on_random_corpora(spark, pairs):
    """ttr and the OLS slope as raw quotients of exact int64 micro
    sums: degenerate single-type sources hit the den==0 branch, tiny
    vocabularies hit every tie-prone small denominator."""
    import __spark_entry__ as entry

    rows, docs = _full_docs(spark, pairs)
    got = {tuple(r) for r in text.lexical_zipf_stats(docs).collect()}
    con = _duck_docs(rows)
    want = {
        tuple(r)
        for r in con.execute(entry.oracle_sql()["q_zipf_stats"]).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(text_list=st.lists(texts, min_size=1, max_size=10))
def test_repetition_stats_inline_oracle_on_random_corpora(
    spark, text_list
):
    """dup_token_fraction / top_bigram_fraction raw quotients plus the
    lexicographic bigram tie-break, including sub-bigram docs (absent
    from both sides)."""
    import __spark_entry__ as entry

    pairs = [("s", t) for t in text_list]
    rows, docs = _full_docs(spark, pairs)
    got = {tuple(r) for r in text.repetition_stats(docs).collect()}
    con = _duck_docs(rows)
    want = {
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["q_repetition_stats"]
        ).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(pairs=st.lists(
    st.tuples(st.sampled_from(["s0", "s1", "s2"]), texts),
    min_size=1,
    max_size=10,
))
def test_source_mix_inline_oracle_on_random_corpora(spark, pairs):
    """sample_rate = min(1, budget/(n_sources*n_tokens)) as a raw
    quotient: token products near/above the budget exercise both the
    clamp and tie-prone small denominators."""
    import __spark_entry__ as entry

    rows, docs = _full_docs(spark, pairs)
    got = {
        tuple(r)
        for r in text.source_mix(docs, budget_tokens=100_000).collect()
    }
    con = _duck_docs(rows)
    want = {
        tuple(r)
        for r in con.execute(entry.oracle_sql()["q_source_mix"]).fetchall()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(pairs=st.lists(
    st.tuples(st.sampled_from(["en", "fr"]), texts),
    min_size=1,
    max_size=10,
))
def test_prep_pipeline_inline_oracle_on_random_corpora(spark, pairs):
    """The composite prep pipeline end-to-end, most importantly the
    UNROUNDED stop_ratio <= 0.5 FILTER boundary: a ratio that rounds to
    0.5 but exceeds it raw must be rejected by BOTH engines (the r10
    surface change altered row membership, not just emitted values)."""
    import __spark_entry__ as entry

    rows = [
        (i, t, lang, "s", len(t)) for i, (lang, t) in enumerate(pairs)
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    # q_prep_pipeline takes (spark, sf_dir); replicate its composed body
    # on the random frame (kept in lockstep with __spark_entry__)
    from pyspark.sql import functions as FF

    quality = text.quality_score(docs).where(
        (FF.col("n_tokens") >= 30) & (FF.col("stopword_ratio") <= 0.5)
    )
    norm = FF.lower(FF.regexp_replace(FF.col("text"), r"\s+", " "))
    keyed = docs.join(
        quality.select("doc_id", "n_tokens"), "doc_id"
    ).select("doc_id", "lang", "n_tokens", FF.md5(norm).alias("content_md5"))
    deduped = keyed.groupBy("content_md5").agg(
        FF.min("doc_id").alias("doc_id"),
        FF.min_by("lang", "doc_id").alias("lang"),
        FF.min_by("n_tokens", "doc_id").alias("n_tokens"),
    )
    out = deduped.groupBy("lang").agg(
        FF.count(FF.lit(1)).alias("n_docs"),
        FF.sum("n_tokens").alias("token_budget"),
    )
    got = {tuple(r) for r in out.collect()}
    con = _duck_docs(rows)
    want = {
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["q_prep_pipeline"]
        ).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(pairs=st.lists(
    st.tuples(st.sampled_from(["en", "fr"]), texts),
    min_size=1,
    max_size=10,
))
def test_text_stats_inline_oracle_on_random_corpora(spark, pairs):
    """avg_chars / avg_tokens as raw quotients of exact int64 sums:
    tiny per-lang groups hit every small tie-prone denominator."""
    import __spark_entry__ as entry

    rows = [
        (i, t, lang, "s", len(t)) for i, (lang, t) in enumerate(pairs)
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {tuple(r) for r in text.text_stats_by_lang(docs).collect()}
    con = _duck_docs(rows)
    want = {
        tuple(r)
        for r in con.execute(entry.oracle_sql()["q_text_stats"]).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------------------
# r10: PARAMETER-SWEEP differentials over the dedup generators (carried
# r8 verdict #8): the fixed-parameter differentials under-test exactly
# the knobs users turn — and the r7 lesson says some widths (k=2 extent
# geometry) are the ONE shape where a bug class is invisible. Sweep gram
# width, band count/width, caps, and thresholds at boundary ratios.
# ---------------------------------------------------------------------------


def _duck_texts(texts):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)}),
    )
    return con


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(jacc_texts, min_size=2, max_size=8),
    n=st.sampled_from([2, 3, 4]),
    threshold=st.sampled_from([0.0, 0.2, 0.5, 2 / 3, 0.8]),
)
def test_ngram_jaccard_sweep_matches_generator(spark, texts, n, threshold):
    """Gram width x threshold sweep, including 2/3 (a boundary the
    4-token alphabet actually produces: j == 2/3 must PASS a >= 2/3
    filter on both engines — the unrounded-filter contract)."""
    from __spark_entry__ import _ngram_jaccard_oracle_sql

    docs = _docs(spark, texts)
    got = {
        tuple(r)
        for r in dedup.ngram_jaccard_pairs(
            docs, n=n, threshold=threshold
        ).collect()
    }
    con = _duck_texts(texts)
    want = {
        tuple(r)
        for r in con.execute(
            _ngram_jaccard_oracle_sql(threshold, n=n)
        ).fetchall()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(jacc_texts, min_size=2, max_size=8),
    n=st.sampled_from([2, 3]),
    threshold=st.sampled_from([0.5, 2 / 3, 0.8, 1.0]),
)
def test_prefix_jaccard_sweep_matches_generator(spark, texts, n, threshold):
    """The lossless prefix branch must equal the generator at EVERY
    (width, threshold), not just the pinned t=0.8/n=3: the prefix
    length depends on both knobs, so an off-by-one in ceil(t*|set|)
    shows up only off the pinned point."""
    from __spark_entry__ import _ngram_jaccard_oracle_sql

    docs = _docs(spark, texts)
    got = {
        tuple(r)
        for r in dedup.jaccard_prefix_pairs(
            docs, n=n, threshold=threshold
        ).collect()
    }
    con = _duck_texts(texts)
    want = {
        tuple(r)
        for r in con.execute(
            _ngram_jaccard_oracle_sql(threshold, n=n)
        ).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(lsh_texts, min_size=2, max_size=8),
    shape=st.sampled_from([(8, 2), (16, 4), (32, 8), (32, 4), (16, 16)]),
    max_bucket=st.sampled_from([None, 2]),
)
def test_minhash_sweep_matches_generator(spark, texts, shape, max_bucket):
    """num_hashes x bands x cap sweep (powers of two only — enforced at
    construction since r10): the r8 lesson says table WIDTH, not count,
    controls collisions, so (32,4)'s 8-row bands and (16,16)'s 1-row
    bands exercise both extremes; max_bucket=2 replays the capped
    bandkeys CTE on corpora where cells actually overflow."""
    from __spark_entry__ import _minhash_oracle_sql

    num_hashes, bands = shape
    docs = _docs(spark, texts)
    got = {
        tuple(r)
        for r in dedup.minhash_lsh_candidates(
            docs,
            num_hashes=num_hashes,
            bands=bands,
            shingle_hash="portable",
            max_bucket=max_bucket,
            max_dropped_mass=None,
        )
        .select("doc_a", "doc_b", "n_agree")
        .collect()
    }
    con = _duck_texts(texts)
    want = {
        tuple(r)
        for r in con.execute(
            _minhash_oracle_sql(
                num_hashes=num_hashes, bands=bands, max_bucket=max_bucket
            )
        ).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(lsh_texts, min_size=2, max_size=8),
    max_hamming=st.sampled_from([4, 16, 32]),
    max_bucket=st.sampled_from([3, 200]),
)
def test_simhash_sweep_matches_generator(spark, texts, max_hamming, max_bucket):
    """Hamming radius x cap sweep: tight radii cut verified pairs, a
    tight cap drops whole cells pre-join — both paths must replay."""
    from __spark_entry__ import _simhash_oracle_sql

    docs = _docs(spark, texts)
    got = {
        tuple(r)
        for r in dedup.simhash_near_dup(
            docs,
            max_hamming=max_hamming,
            token_hash="portable",
            max_bucket=max_bucket,
            max_dropped_mass=None,
        ).collect()
    }
    con = _duck_texts(texts)
    want = {
        tuple(r)
        for r in con.execute(
            _simhash_oracle_sql(
                max_hamming=max_hamming, max_bucket=max_bucket
            )
        ).fetchall()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(jacc_texts, min_size=2, max_size=8),
    n=st.sampled_from([2, 3]),
    threshold_milli=st.sampled_from([0, 200, 500, 800, 1000]),
)
def test_containment_sweep_matches_generator(
    spark, texts, n, threshold_milli
):
    """Width x milli-threshold sweep incl. 1000 (full containment —
    only exact subsets survive) and 0 (every intersecting pair): the
    integer >= comparison must agree with DuckDB's at every boundary."""
    from __spark_entry__ import _containment_oracle_sql

    docs = _docs(spark, texts)
    got = {
        tuple(r)
        for r in dedup.containment_pairs(
            docs, n=n, threshold_milli=threshold_milli
        ).collect()
    }
    con = _duck_texts(texts)
    want = {
        tuple(r)
        for r in con.execute(
            _containment_oracle_sql(threshold_milli=threshold_milli, n=n)
        ).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------------------
# r10 late batch: documents-frame differentials for the text-kernel keys
# (shrinking _TEXT_KERNEL_PINNED in the coverage audit). Each runs the
# exact driver operator call vs the key's LIVE oracle string on random
# corpora. Word pool includes the driver's bm25 query terms so retrieval
# postings are non-trivially exercised.
# ---------------------------------------------------------------------------

kernel_words = st.sampled_from(
    ["alpha", "beta", "dup", "join", "vector", "the", "a", "x9"]
)
kernel_texts = st.lists(kernel_words, min_size=1, max_size=20).map(" ".join)
kernel_pairs = st.lists(
    st.tuples(st.sampled_from(["en", "fr", "de"]),
              st.sampled_from(["s0", "s1"]),
              kernel_texts),
    min_size=1,
    max_size=10,
)


def _kernel_frames(spark, pairs):
    rows = [
        (i, t, lang, src, len(t))
        for i, (lang, src, t) in enumerate(pairs)
    ]
    return rows, spark.createDataFrame(rows, DOC_SCHEMA)


def _kernel_check(spark, pairs, oracle, op):
    import __spark_entry__ as entry  # noqa: F401  (callers pass its strings)

    rows, docs = _kernel_frames(spark, pairs)
    got = {tuple(r) for r in op(docs).collect()}
    con = _duck_docs(rows)
    want = {tuple(r) for r in con.execute(oracle).fetchall()}
    assert got == want, got ^ want


def _entry_oracle(key):
    import __spark_entry__ as entry

    return entry.oracle_sql()[key]


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs)
def test_token_count_oracle_on_random_corpora(spark, pairs):
    _kernel_check(
        spark, pairs, _entry_oracle("q_token_count"), text.token_count
    )


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs)
def test_doc_fingerprint_oracle_on_random_corpora(spark, pairs):
    _kernel_check(
        spark,
        pairs,
        _entry_oracle("q_doc_fingerprint"),
        lambda d: text.fingerprint(d).select("doc_id", "content_md5"),
    )


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs)
def test_bpe_tokens_oracle_on_random_corpora(spark, pairs):
    _kernel_check(
        spark, pairs, _entry_oracle("q_bpe_tokens"), text.bpe_ish_tokens
    )


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs)
def test_exact_dedup_oracle_on_random_corpora(spark, pairs):
    _kernel_check(
        spark, pairs, _entry_oracle("q_exact_dedup"), dedup.exact_dedup
    )


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs)
def test_hash_split_oracle_on_random_corpora(spark, pairs):
    _kernel_check(
        spark, pairs, _entry_oracle("q_hash_split"), text.hash_split
    )


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs)
def test_percentile_filter_oracle_on_random_corpora(spark, pairs):
    """Tiny per-lang groups exercise FLOOR(0.1*n) == 0 (keep all) and
    rank ties on equal n_chars broken by doc_id."""
    _kernel_check(
        spark,
        pairs,
        _entry_oracle("q_percentile_filter"),
        lambda d: text.percentile_filter(d, p=0.1),
    )


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs)
def test_cap_per_source_oracle_on_random_corpora(spark, pairs):
    _kernel_check(
        spark,
        pairs,
        _entry_oracle("q_cap_per_source"),
        lambda d: text.cap_per_source(d, k=100),
    )


@settings(max_examples=8, deadline=None)
@given(pairs=st.lists(
    st.tuples(st.sampled_from(["en", "fr"]), st.sampled_from(["s0"]),
              st.lists(jacc_words, min_size=1, max_size=20).map(" ".join)),
    min_size=1,
    max_size=10,
))
def test_pii_scrub_noop_oracle_on_random_clean_corpora(spark, pairs):
    """The oracle pins the exact no-op on PII-free text: the four
    regexes must not over-fire on arbitrary clean tokens (planted-PII
    behavior is unit-pinned separately)."""
    _kernel_check(
        spark, pairs, _entry_oracle("q_pii_scrub"), text.redact_pii
    )


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs)
def test_bm25_search_oracle_on_random_corpora(spark, pairs):
    _kernel_check(
        spark,
        pairs,
        _entry_oracle("q_bm25_search"),
        lambda d: text.bm25_search(d, ("dup", "join", "vector")),
    )


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs)
def test_pmi_pairs_oracle_on_random_corpora(spark, pairs):
    """min_count=5 on <=10-doc corpora exercises the empty result AND
    (with the tiny alphabet) genuinely co-occurring pairs."""
    _kernel_check(
        spark,
        pairs,
        _entry_oracle("q_pmi_pairs"),
        lambda d: text.pmi_pairs(d, min_count=5),
    )


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs)
def test_source_kl_oracle_on_random_corpora(spark, pairs):
    _kernel_check(
        spark, pairs, _entry_oracle("q_source_kl"), text.source_kl
    )


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs)
def test_tfidf_terms_oracle_on_random_corpora(spark, pairs):
    _kernel_check(
        spark,
        pairs,
        _entry_oracle("q_tfidf_terms"),
        lambda d: text.tfidf_top_terms(d, k=3),
    )


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs)
def test_weighted_sample_oracle_on_random_corpora(spark, pairs):
    _kernel_check(
        spark,
        pairs,
        _entry_oracle("q_weighted_sample"),
        lambda d: text.weighted_sample_per_group(d, k=100),
    )


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs, n_zero=st.integers(min_value=1, max_value=4))
def test_weighted_sample_oracle_with_zero_weight_docs(spark, pairs, n_zero):
    """r11: the weight>0 filter boundary — kernel_texts never produces
    an empty doc, so the shared-corpus differential above cannot reach
    the shape the r10 probe crashed on. Interleave n_zero empty-text
    (n_chars=0) docs among the organic rows: both engines must exclude
    them BEFORE the A-Res draw (Spark's cast-double > 0.0 filter vs the
    oracle's WHERE n_chars > 0 — equivalent for every bigint)."""
    rows = [
        (i, t, lang, src, len(t))
        for i, (lang, src, t) in enumerate(pairs)
    ]
    base = len(rows)
    rows += [
        (base + j, "", ["en", "fr", "de"][j % 3], "s0", 0)
        for j in range(n_zero)
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {
        tuple(r)
        for r in text.weighted_sample_per_group(docs, k=100).collect()
    }
    con = _duck_docs(rows)
    want = {
        tuple(r)
        for r in con.execute(_entry_oracle("q_weighted_sample")).fetchall()
    }
    assert got == want, got ^ want
    assert all(doc_id < base for doc_id, _ in got)


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs)
def test_stratified_sample_oracle_on_random_corpora(spark, pairs):
    _kernel_check(
        spark,
        pairs,
        _entry_oracle("q_stratified_sample"),
        lambda d: text.stratified_sample(
            d,
            fractions={"en": 0.1, "de": 0.3, "es": 0.3,
                       "fr": 0.3, "zh": 0.3},
            key="doc_id",
        ).select("doc_id", "lang"),
    )


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs)
def test_bigram_logprob_oracle_on_random_corpora(spark, pairs):
    """Covers the r8 tie-fix oracle (det_avg_round4 surfaces) on
    random corpora — incl. single-token docs (no bigrams)."""
    _kernel_check(
        spark,
        pairs,
        _entry_oracle("q_bigram_logprob"),
        text.bigram_logprob,
    )


@settings(max_examples=6, deadline=None)
@given(pairs=st.lists(
    st.tuples(st.sampled_from(["en"]), st.sampled_from(["s0"]),
              st.lists(jacc_words, min_size=4, max_size=12).map(" ".join)),
    min_size=2,
    max_size=8,
))
def test_tfidf_cosine_pairs_oracle_on_random_corpora(spark, pairs):
    """The r9 unrounded-cosine surface at the driver params (n=3,
    t=0.3, max_df=64 — never saturating on <=8-doc corpora)."""
    _kernel_check(
        spark,
        pairs,
        _entry_oracle("q_tfidf_cosine_pairs"),
        lambda d: dedup.tfidf_ngram_cosine_pairs(
            d, n=3, threshold=0.3, max_df=64
        ),
    )


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs)
def test_pandas_udf_oracle_on_random_corpora(spark, pairs):
    """The r10 raw-quotient vowel_ratio computed IN PYTHON (numpy
    float64 division) must equal DuckDB's CAST-AS-DOUBLE quotient."""
    from dbt_schema_builder_spark.operators import udf

    _kernel_check(
        spark,
        pairs,
        _entry_oracle("q_pandas_udf"),
        udf.text_metrics_pandas,
    )


@settings(max_examples=8, deadline=None)
@given(pairs=kernel_pairs)
def test_lang_stats_pandas_oracle_on_random_corpora(spark, pairs):
    """The applyInPandas group stats: raw-quotient mean (pandas float64
    sum/n vs DuckDB SUM/COUNT) and the ulp-masked rounded p90 on tiny
    per-lang groups."""
    from dbt_schema_builder_spark.operators import udf

    _kernel_check(
        spark,
        pairs,
        _entry_oracle("q_lang_stats_pandas"),
        udf.lang_stats_apply_in_pandas,
    )


inc_pairs = st.lists(
    st.tuples(st.sampled_from(["en", "fr"]),
              st.sampled_from(["src1", "src2"]),
              st.lists(lsh_words, min_size=1, max_size=8).map(" ".join)),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(pairs=inc_pairs)
def test_incremental_dedup_oracle_on_random_corpora(spark, pairs):
    """src1/src2 split with a tiny duplicate-heavy alphabet: the seen
    side is sometimes empty, sometimes swallows the whole batch."""
    _kernel_check(
        spark,
        pairs,
        _entry_oracle("q_incremental_dedup"),
        lambda d: dedup.incremental_dedup(
            d.where(~F.col("source").rlike("^src1.*$")),
            text.fingerprint(d.where(F.col("source").rlike("^src1.*$"))),
            broadcast_seen=True,
        ).select("doc_id", "lang", "source"),
    )


@settings(max_examples=8, deadline=None)
@given(pairs=inc_pairs)
def test_incremental_dedup_bloom_oracle_on_random_corpora(spark, pairs):
    """The Bloom prefilter must be EXACTLY output-neutral on every
    split shape (no false negatives; verify join removes positives) —
    the oracle is the plain anti-join by design."""
    _kernel_check(
        spark,
        pairs,
        _entry_oracle("q_incremental_dedup_bloom"),
        lambda d: dedup.incremental_dedup_bloom(
            d.where(~F.col("source").rlike("^src1.*$")),
            text.fingerprint(d.where(F.col("source").rlike("^src1.*$"))),
            k=3,
        ).select("doc_id", "lang", "source"),
    )


@settings(max_examples=8, deadline=None)
@given(pairs=st.lists(
    st.tuples(st.sampled_from(["en"]), st.sampled_from(["s0", "s1"]),
              st.lists(jacc_words, min_size=1, max_size=30).map(" ".join)),
    min_size=1,
    max_size=10,
))
def test_frame_sample_oracle_on_random_corpora(spark, pairs):
    """Fixed-stride frame sampling over the fake binary payloads: the
    ASCII word pool keeps DuckDB's character slicing == byte slicing
    (the oracle's documented value-safety precondition)."""
    from pyspark.sql import functions as F

    from dbt_schema_builder_spark.multimodal import (
        attach_fake_image_bytes,
        sample_frames,
    )

    _kernel_check(
        spark,
        pairs,
        _entry_oracle("q_frame_sample"),
        lambda d: sample_frames(
            attach_fake_image_bytes(d), every=256
        ).select(
            "doc_id", "frame_idx", F.length("frame_bytes").alias("frame_len")
        ),
    )


@settings(max_examples=8, deadline=None)
@given(pairs=st.lists(
    st.tuples(st.sampled_from(["en"]), st.sampled_from(["s0", "s1"]),
              st.lists(lsh_words, min_size=1, max_size=30).map(" ".join)),
    min_size=2,
    max_size=10,
))
def test_frame_dedup_oracle_on_random_corpora(spark, pairs):
    """Cross-asset duplicate frames on a duplicate-heavy word pool —
    identical payloads guarantee shared frames; ASCII-only per the
    oracle precondition."""
    from dbt_schema_builder_spark.multimodal import (
        attach_fake_image_bytes,
        frame_dedup,
    )

    _kernel_check(
        spark,
        pairs,
        _entry_oracle("q_frame_dedup"),
        lambda d: frame_dedup(attach_fake_image_bytes(d), every=256),
    )


@settings(max_examples=5, deadline=None)
@given(rows=ev_stream)
def test_stream_dedup_history_oracle_replays_random_streams(spark, rows):
    """The stateless stream-static anti-join wrapper: streamed events
    minus the event_id%3==0 history slice must equal the plain filter
    oracle on any stream — empty histories and all-history streams
    both arise here."""
    import duckdb

    import __spark_entry__ as entry
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_dedup_against_history,
    )

    d, pdf = _stage_random_stream(spark, rows)
    src = stream_events(spark, d).select(
        "event_id", "user_id", "event_type"
    )
    seen = (
        spark.createDataFrame(pdf[["event_id"]])
        .where("event_id % 3 = 0")
        .distinct()
    )
    name = f"t_prop_dedup_hist_{next(_stream_seq_counter)}"
    out = run_stream_to_memory(
        streaming_dedup_against_history(src, seen, on="event_id"),
        name,
        "append",
    )
    _drop_stream_dir(d)
    got = {tuple(r) for r in out.collect()}
    con = duckdb.connect()
    con.register("events", pdf)
    want = {
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["q_stream_dedup_history"]
        ).fetchall()
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(rows=ev_stream)
def test_stream_enrich_oracle_replays_random_streams(spark, rows):
    """Stream-static broadcast enrichment: random user ids hit both
    matched and unmatched dimension rows (LEFT join NULL segment)."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_static_enrich,
    )

    d, pdf = _stage_random_stream(spark, rows)
    # dimension covers only the even user ids: odd ids exercise the
    # unmatched LEFT-join branch
    dim_rows = [(u, f"SEG{u % 3}") for u in range(0, 12, 2)]
    dim = spark.createDataFrame(dim_rows, "user_id long, segment string")
    src = stream_events(spark, d).select(
        "event_id", "user_id", "event_type"
    )
    name = f"t_prop_enrich_{next(_stream_seq_counter)}"
    out = run_stream_to_memory(
        streaming_static_enrich(src, dim, on="user_id"), name, "append"
    )
    _drop_stream_dir(d)
    # positional tuple compare: align to the oracle's column order (the
    # join hoists user_id first; the driver sorts by NAME so never sees
    # this)
    got = {
        tuple(r)
        for r in out.select(
            "event_id", "user_id", "event_type", "segment"
        ).collect()
    }
    con = duckdb.connect()
    con.register("events", pdf)
    con.register(
        "customer",
        pd.DataFrame(
            {
                "c_custkey": [r[0] for r in dim_rows],
                "c_mktsegment": [r[1] for r in dim_rows],
            }
        ),
    )
    want = {
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["q_stream_enrich"]
        ).fetchall()
    }
    assert got == want


def test_det_avg_round4_overflow_regression(spark):
    """r10 regression pin — the r9 integral-div form computed
    floor((2|s| + d) / 2d) LITERALLY, and 2|s| overflows int64 once the
    micro sum passes 2^62 (conversion_latency at the 10x events replica
    crashed under ANSI; found by the round-end scale gate r9 skipped).
    The quotient+remainder form (q + [2*rem >= d]) is identical
    mathematically and cannot overflow (rem < d <= 100*count). One
    5e12 value: micro sum 5e18, 2|s| = 1e19 > int64 max."""
    from pyspark.sql import functions as SF

    val = 5e12
    u = int(val * 1e6)
    assert float(u) == val * 1e6 and 2 * u > 2**63 - 1
    expected = ((2 * u + 100) // 200) / 10000.0  # exact in Python ints
    df = spark.createDataFrame([(val,)], "val double")
    got = df.agg(
        similarity._det_avg_round4(SF.col("val")).alias("r")
    ).collect()[0]["r"]
    assert got == expected == val


def test_cosine_zero_norm_guard(spark):
    """r11: the staged cosine_safe guard IS now cosine() — zero-norm
    operands score 0.0 (the r10 embedding-differential find: a zero
    CENTROID is reachable from opposite nonzero vectors under one
    label) instead of crashing an ANSI-mode job, and the alias stays
    equal to the canonical name."""
    from pyspark.sql import functions as SF

    assert similarity.cosine_safe is similarity.cosine

    rows = [
        (1, [1.0, 2.0, -3.0], [0.5, -1.0, 2.0]),   # ordinary pair
        (2, [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]),     # identical -> 1.0
        (3, [0.0, 0.0, 0.0], [1.0, 2.0, 3.0]),     # zero left
        (4, [1.0, 2.0, 3.0], [0.0, 0.0, 0.0]),     # zero right
        (5, [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]),     # both zero
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    )
    got = {
        r.id: r.s
        for r in df.select(
            "id", similarity.cosine(SF.col("a"), SF.col("b")).alias("s")
        ).collect()
    }
    assert got[2] == 1.0
    assert got[3] == got[4] == got[5] == 0.0
    assert abs(got[1]) < 1.0


# ---------------------------------------------------------------------------
# r10 continuation: the percentile exemptions converted on GRID arguments —
# quantile positions are tenths (q=0.5/0.9 over integer inputs), so the
# exact interpolated value lives on a 1/10 rational grid that can NEVER sit
# on a ROUND-4 half-boundary (boundaries are odd multiples of 0.5e-4; the
# grid hits only even ones). Engine float noise is ~1e-12, five orders
# below the 5e-5 gap, so the rounded surfaces must agree bit-for-bit.
# ---------------------------------------------------------------------------

_gq_rows = st.lists(
    st.tuples(
        st.sampled_from(["en", "fr"]),
        st.integers(min_value=1, max_value=5000),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=20, deadline=None)
@given(rows=_gq_rows)
def test_group_quantiles_oracle_on_random_lengths(spark, rows):
    import __spark_entry__ as entry

    data = [(i, "x", lang, "web", n) for i, (lang, n) in enumerate(rows)]
    docs = spark.createDataFrame(data, DOC_SCHEMA)
    con = _duck_docs(data)
    got = {
        tuple(r)
        for r in docs.groupBy("lang")
        .agg(
            F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias(
                "median_chars"
            ),
            F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias(
                "p90_chars"
            ),
        )
        .collect()
    }
    want = {
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["q_group_quantiles"]
        ).fetchall()
    }
    assert got == want, got ^ want
