"""Behavioral tests for the LLM-pipeline operators: planted duplicates must
be found, approximate paths must agree with their exact counterparts."""

import pytest

from pyspark.sql import functions as F

from dbt_schema_builder_spark.multimodal import (
    attach_fake_image_bytes,
    decode_image_stub,
    image_features,
    sample_frames,
)
from dbt_schema_builder_spark.operators import dedup, similarity, text


@pytest.fixture(scope="module")
def docs_with_dupes(spark, tables):
    """documents plus planted exact + near duplicates of doc 0."""
    base = tables["documents"]
    first_text = base.orderBy("doc_id").first()["text"]
    near = " ".join(first_text.split()[:-1]) + " zzz"  # drop last word, add one
    extra = spark.createDataFrame(
        [
            (100001, first_text, "en", "srcX", len(first_text)),
            (100002, near, "en", "srcX", len(near)),
        ],
        schema=base.schema,
    )
    return base.unionByName(extra)


def test_exact_dedup_finds_planted_copy(docs_with_dupes):
    out = dedup.exact_dedup(docs_with_dupes)
    dupes = out.where("n_copies > 1").collect()
    assert any(r.n_copies == 2 for r in dupes)
    # keeps the smallest doc_id deterministically
    assert min(r.keep_doc_id for r in dupes) < 100001


def test_ngram_jaccard_finds_planted_near_dup(docs_with_dupes):
    pairs = dedup.ngram_jaccard_pairs(docs_with_dupes, n=3, threshold=0.5)
    hits = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (0, 100001) in hits  # exact copy: jaccard 1.0
    assert (0, 100002) in hits or (100001, 100002) in hits  # near dup


def test_minhash_lsh_finds_planted_near_dup(docs_with_dupes):
    cand = dedup.minhash_lsh_candidates(docs_with_dupes)
    hits = {(r.doc_a, r.doc_b): r.est_jaccard for r in cand.collect()}
    assert hits.get((0, 100001)) == 1.0  # identical signatures
    assert (0, 100002) in hits  # near dup lands in a shared band


def test_simhash_finds_exact_copy_and_respects_threshold(docs_with_dupes):
    pairs = dedup.simhash_near_dup(docs_with_dupes, max_hamming=8)
    hits = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
    assert hits.get((0, 100001)) == 0  # identical simhash, hamming 0
    # the banding guarantee: every reported pair respects the threshold
    assert all(h <= 8 for h in hits.values())
    # pairs at hamming <= 3 are *guaranteed* found (pigeonhole over 4 bands)
    assert all(h <= 3 for (a, b), h in hits.items() if h <= 3)


def test_dedup_clusters_transitive_closure(spark):
    # chain 1-2, 2-3 plus isolated pair 10-11: {1,2,3} and {10,11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    out = {r.doc_id: r.cluster_id for r in dedup.dedup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dedup_clusters_long_chain_converges(spark):
    n = 20
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a bigint, doc_b bigint"
    )
    out = dedup.dedup_clusters(pairs, max_iterations=30).collect()
    assert {r.cluster_id for r in out} == {0}
    assert len(out) == n + 1


def test_dedup_clusters_scattered_deep_chain_multi_partition(spark):
    """r13 contraction internals: a long path whose edges are scattered
    round-robin across many partitions forces the cross-partition merge
    machinery (functional mapping + residual edges). The prototype bug
    this pins against: a node seen by several partitions emitted several
    (node, root) rows, and the remap join fanned out combinatorially
    (measured 4,999 edges -> 60M 'remaining' edges before the fix)."""
    n = 500
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a bigint, doc_b bigint"
    ).repartition(16)
    # driver_closure_max_edges=0 forces the DISTRIBUTED contraction:
    # since r14 a 500-edge graph would otherwise take the driver-side
    # union-find fast path and never touch the residual machinery
    out = dedup.dedup_clusters(
        pairs, max_iterations=30, driver_closure_max_edges=0
    ).collect()
    assert {r.cluster_id for r in out} == {0}
    assert len(out) == n + 1


def test_dedup_clusters_driver_path_matches_distributed(spark):
    """r14 fast path: the driver-side union-find (small graphs) must be
    bit-identical to the distributed star contraction on the same graph
    — chains, a star, duplicate/reversed edges and two components in
    one input."""
    raw = (
        [(i, i + 1) for i in range(40)]          # path 0..40
        + [(1000, 1000 + i) for i in range(1, 30)]  # star at 1000
        + [(2, 1), (1, 2), (1, 2)]               # dup/reversed edges
        + [(5000, 4999)]                          # 2-node component
    )
    pairs = spark.createDataFrame(raw, "doc_a bigint, doc_b bigint")
    fast = {
        (r.doc_id, r.cluster_id)
        for r in dedup.dedup_clusters(pairs).collect()
    }
    dist = {
        (r.doc_id, r.cluster_id)
        for r in dedup.dedup_clusters(
            pairs.repartition(8), driver_closure_max_edges=0
        ).collect()
    }
    assert fast == dist
    assert {c for _, c in fast} == {0, 1000, 4999}


def test_dedup_clusters_hub_degree_guard_trips(spark):
    """r14 hub-skew hardening (the r13 verdict's watch item): every edge
    incident to a mega-hub hashes to the hub's partition under
    repartition(p, "src"), so that partition's union-find node set grows
    with the hub's DEGREE regardless of the edge-count-derived partition
    count. Exceeding uf_max_partition_nodes must raise loudly (with the
    upstream-cap remediation), never silently OOM the Python worker."""
    deg = 5000
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, deg + 1)], "doc_a bigint, doc_b bigint"
    ).repartition(8)
    with pytest.raises(Exception) as exc:
        dedup.dedup_clusters(
            pairs,
            driver_closure_max_edges=0,  # force the distributed path
            uf_max_partition_nodes=2000,
        ).collect()
    # executor-side guard ValueErrors arrive wrapped in PythonException
    # (the r10c degenerate-probe convention): grep the terminal message
    assert "union-find holds" in str(exc.value)
    assert "max_df" in str(exc.value)


def test_dedup_clusters_hub_within_bound_distributed(spark):
    """Same hub star under the default bound: the distributed path (the
    streaming per-batch union-find) must close it exactly — one star is
    one component rooted at the minimum id."""
    deg = 5000
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, deg + 1)], "doc_a bigint, doc_b bigint"
    ).repartition(8)
    out = dedup.dedup_clusters(pairs, driver_closure_max_edges=0).collect()
    assert len(out) == deg + 1
    assert {r.cluster_id for r in out} == {0}


def test_dedup_clusters_duplicate_and_reversed_pairs(spark):
    """The contraction loop no longer runs an upfront distinct over the
    oriented edge list, so duplicate and reversed pair rows must not
    change the closure (or crash the union-find kernel)."""
    pairs = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1), (2, 3), (10, 11), (11, 10)],
        "doc_a bigint, doc_b bigint",
    )
    out = {r.doc_id: r.cluster_id for r in dedup.dedup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_embedding_near_dup_lsh_matches_exact(spark, tables):
    """The shipped LSH-candidate + exact-verify path must reproduce the
    quadratic all-pairs oracle exactly at the shipped threshold (recall
    pinned; precision is guaranteed by the exact verify)."""
    emb = tables["embeddings"]
    # 0.45 rather than the wired 0.5: sf0.001's max pair sim is 0.479, so
    # this exercises a non-empty result (7 pairs) at an even weaker angle
    # (harder for LSH recall) than the driver-checked threshold
    lsh = sorted(
        map(tuple, similarity.embedding_near_dup(emb, threshold=0.45).collect())
    )
    exact = sorted(
        map(
            tuple,
            similarity.embedding_near_dup_exact(emb, threshold=0.45).collect(),
        )
    )
    assert lsh == exact
    assert len(lsh) >= 1  # the data plants qualifying pairs
    # the auto strategy (blocked GEMM at weak thresholds) agrees too
    blocked = sorted(
        map(
            tuple,
            similarity.embedding_near_dup(emb, threshold=0.45).collect(),
        )
    )
    assert blocked == exact


def test_embedding_near_dup_guard_refuses_unbounded_gemm(spark, tables):
    """The weak-threshold blocked-GEMM path is O(n^2) compute; beyond
    max_gemm_rows it must refuse loudly (naming the recall trade) rather
    than launch an unbounded job on a 100-TB corpus."""
    emb = tables["embeddings"]
    with pytest.raises(ValueError, match="ivf_sharded"):
        similarity.embedding_near_dup(emb, threshold=0.5, max_gemm_rows=10)
    # the high-threshold LSH path is sub-quadratic and never guarded
    similarity.embedding_near_dup(emb, threshold=0.9, max_gemm_rows=10)


def test_embedding_near_dup_ivf_sharded_recall(spark, tables):
    """The bounded-work weak-threshold strategy: every emitted pair must
    be a true pair with the exact cosine (precision 1 — the in-cell
    verify is exact), and recall vs the quadratic oracle is pinned at
    the documented ~0.8 level. Deterministic: centroids are the first k
    corpus vectors and probing is argmax-cosine, so recall is a fixed
    function of the data, not a seed."""
    emb = tables["embeddings"]
    exact = {
        (r.vec_a, r.vec_b): r.sim
        for r in similarity.embedding_near_dup_exact(emb, 0.45).collect()
    }
    got = {
        (r.vec_a, r.vec_b): r.sim
        for r in similarity.embedding_near_dup_ivf_sharded(
            emb, 0.45, k_cells=32, nprobe=5
        ).collect()
    }
    assert set(got) <= set(exact)  # no false positives
    assert all(got[p] == exact[p] for p in got)  # exact sims
    assert len(got) / len(exact) >= 0.8  # measured 6/7 on this corpus
    # dispatcher route
    routed = similarity.embedding_near_dup(
        emb, threshold=0.45, strategy="ivf_sharded"
    )
    assert {(r.vec_a, r.vec_b) for r in routed.collect()} <= set(exact)
    # r5 (verdict ask #5): the pinned >=0.95-recall configuration from
    # the SCALE.md recall-vs-cost curve — nprobe=8 of k_cells=32 probes
    # a quarter of the coarse cells and measured recall 1.0 at sf0.1
    # (14/14) and sf0.01; the knob a caller turns when 0.8 isn't enough
    high = {
        (r.vec_a, r.vec_b)
        for r in similarity.embedding_near_dup_ivf_sharded(
            emb, 0.45, k_cells=32, nprobe=8
        ).collect()
    }
    assert high <= set(exact)
    assert len(high) / len(exact) >= 0.95


def test_embedding_near_dup_lsh_finds_planted_duplicate(spark, tables):
    """High-threshold regime: an identical planted vector has identical
    hyperplane signs, so the LSH path finds it deterministically (every
    table collides), not probabilistically."""
    emb = tables["embeddings"]
    first_id = emb.agg(F.min("vec_id")).first()[0]
    planted = (
        emb.where(F.col("vec_id") == first_id)
        .select(
            F.lit(999999).cast("long").alias("vec_id"),
            *[c for c in emb.columns if c != "vec_id"],
        )
        .select(*emb.columns)
    )
    out = similarity.embedding_near_dup(
        emb.unionByName(planted), threshold=0.9, strategy="lsh"
    )
    pairs = {(r.vec_a, r.vec_b): r.sim for r in out.collect()}
    assert pairs.get((first_id, 999999)) == 1.0


def test_ngram_jaccard_max_df_prunes_hot_shingles(spark, tables):
    """The df-cap skew lever: a stop-phrase shingle shared by 50 docs
    would fan out ~1225 candidate pairs; with max_df below its df those
    candidates vanish, while rare-shingle pairs keep their exact Jaccard
    (denominators always come from the uncapped sets)."""
    schema = tables["documents"].schema
    rows = [
        (i, f"x y z unique{i} a{i} b{i} c{i}", "en", "src", 20) for i in range(50)
    ] + [
        (100, "p q r s t u", "en", "src", 11),
        (101, "p q r s t zz", "en", "src", 12),
    ]
    docs = spark.createDataFrame(rows, schema=schema)
    uncapped = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.05)
    capped = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.05, max_df=10)
    hot_pairs = uncapped.where("doc_a < 100 AND doc_b < 100").count()
    assert hot_pairs == 50 * 49 // 2  # every hot-shingle pair materialized
    got = {(r.doc_a, r.doc_b): r.jaccard for r in capped.collect()}
    # only the rare-shingle pair survives, with its exact Jaccard 3/5
    assert got == {(100, 101): 0.6}


def test_ngram_jaccard_max_df_saturation_guard_trips_on_duplication(
    spark, tables
):
    """SCALE.md r7b measured the blindness this guard encodes: at 100x
    duplication EVERY gram's df exceeds the cap, the capped index drops
    all gram mass, and the miner silently returned 0 pairs. The guard
    turns that silence into a loud error; the opt-out keeps the old
    behaviour as an explicit caller choice."""
    schema = tables["documents"].schema
    # 12 verbatim replicas: every 3-gram has df 12 > max_df 4
    rows = [
        (i, "alpha beta gamma delta epsilon zeta", "en", "src", 34)
        for i in range(12)
    ]
    docs = spark.createDataFrame(rows, schema=schema)
    with pytest.raises(ValueError, match="saturated"):
        dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=4)
    # the dispatcher forwards the knob (r6 swallowed-kwarg audit)
    with pytest.raises(ValueError, match="saturated"):
        dedup.jaccard_pairs(
            docs, n=3, threshold=0.2, strategy="inverted", max_df=4
        )
    # explicit opt-out: proceeds and exhibits exactly the measured
    # blindness (0 pairs from 12 identical docs)
    blind = dedup.ngram_jaccard_pairs(
        docs, n=3, threshold=0.2, max_df=4, max_dropped_mass=None
    )
    assert blind.count() == 0
    # a cap above the replica multiplicity passes the guard and finds
    # every pair
    ok = dedup.ngram_jaccard_pairs(
        docs, n=3, threshold=0.2, max_df=16
    )
    assert ok.count() == 12 * 11 // 2
    # the remediation the error message names must actually work: on
    # the SAME corpus where the capped index is blind, MinHash banding
    # (collision volume bounded by band math, not df) finds every
    # replica pair — verbatim copies share all shingles, so signatures
    # are identical and every band collides
    minhash_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_candidates(
            docs, shingle_hash="portable"
        ).collect()
    }
    assert len(minhash_pairs) == 12 * 11 // 2
    # bad knob value is rejected at construction — even WITHOUT max_df
    # (r8 review: a mistyped knob must fail now, not when max_df is
    # later added expecting the configured level)
    with pytest.raises(ValueError, match="max_dropped_mass"):
        dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.2, max_df=4, max_dropped_mass=1.5
        )
    with pytest.raises(ValueError, match="max_dropped_mass"):
        dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.2, max_dropped_mass=-0.1
        )
    with pytest.raises(ValueError, match="max_dropped_mass"):
        dedup.jaccard_pairs(
            docs, threshold=0.9, strategy="prefix", max_dropped_mass=5.0
        )


def test_simhash_max_bucket_saturation_guard_trips_on_duplication(
    spark, tables
):
    """r9 (r8 verdict #3): simhash's max_bucket dropped whole
    over-populated cells with no dropped-mass measurement — and a
    duplicate group bigger than the cap saturates ALL four bands at
    once (identical signatures land in the same cell of every band),
    so recall collapses to zero, not gracefully. The guard turns that
    into a loud error; explicit opt-out keeps the degraded branch as a
    caller choice."""
    schema = tables["documents"].schema
    # 12 verbatim replicas: one signature, so each band has one cell of
    # population 12 > max_bucket 4 — 100% of the banded mass dropped
    rows = [
        (i, "alpha beta gamma delta epsilon zeta", "en", "src", 34)
        for i in range(12)
    ]
    docs = spark.createDataFrame(rows, schema=schema)
    with pytest.raises(ValueError, match="banded index"):
        dedup.simhash_near_dup(docs, token_hash="portable", max_bucket=4)
    # explicit opt-out: proceeds and exhibits exactly the measured
    # blindness (0 pairs from 12 identical docs)
    blind = dedup.simhash_near_dup(
        docs, token_hash="portable", max_bucket=4, max_dropped_mass=None
    )
    assert blind.count() == 0
    # a cap above the duplicate-group size passes the guard and finds
    # every replica pair
    ok = dedup.simhash_near_dup(docs, token_hash="portable", max_bucket=16)
    assert ok.count() == 12 * 11 // 2
    # bad knob value rejected at construction even without max_bucket
    with pytest.raises(ValueError, match="max_dropped_mass"):
        dedup.simhash_near_dup(docs, max_dropped_mass=1.5)
    # r10 (r9 ADVICE): a VALID non-default max_dropped_mass without the
    # cap it guards is the validated-but-unused-knob class — reject,
    # don't silently ignore (both LSH miners)
    with pytest.raises(ValueError, match="max_bucket"):
        dedup.simhash_near_dup(docs, max_dropped_mass=0.1)
    with pytest.raises(ValueError, match="max_bucket"):
        dedup.minhash_lsh_candidates(docs, max_dropped_mass=0.1)
    # defaults (0.5) and explicit None stay legal without a cap
    dedup.simhash_near_dup(docs, max_dropped_mass=None)
    dedup.minhash_lsh_candidates(docs)


def test_minhash_rejects_non_power_of_two_num_hashes(spark, tables):
    """r10: est_jaccard = ROUND(n_agree/num_hashes, 4) is tie-safe only
    for dyadic denominators (k/2^m is binary-exact, both engines round
    the true tie half-away); any other num_hashes re-opens the r9
    rounded-ratio tie class, so it is rejected at construction."""
    docs = tables["documents"]
    with pytest.raises(ValueError, match="power of two"):
        dedup.minhash_lsh_candidates(docs, num_hashes=24, bands=8)
    with pytest.raises(ValueError, match="power of two"):
        dedup.minhash_lsh_candidates(docs, num_hashes=0, bands=1)
    # powers of two construct fine
    dedup.minhash_lsh_candidates(docs, num_hashes=16, bands=4)


def test_lsh_topk_results_are_subset_of_brute_force_candidates(spark, tables):
    emb = tables["embeddings"]
    qs = similarity.queries_from_corpus(emb, 3)
    exact = similarity.brute_force_topk(emb, qs, k=5)
    approx = similarity.lsh_bucketed_topk(emb, qs, k=5, bits=4)
    # every query's own vector hashes to its own bucket -> rank 1 is itself
    top1 = {r.query_id: r.vec_id for r in approx.where("rank = 1").collect()}
    assert all(q == v for q, v in top1.items())
    assert {r.query_id for r in exact.where("rank = 1").collect()} == set(top1)


def test_ivf_assign_puts_centroids_in_their_own_cell(spark, tables):
    emb = tables["embeddings"]
    centroids = emb.limit(8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    assigned = similarity.ivf_assign(emb, centroids)
    own = assigned.where(F.col("vec_id") == F.col("centroid_id"))
    assert own.count() == 8  # each centroid's nearest centroid is itself


def test_pq_encode_shape_determinism_and_self_assignment(spark, tables):
    """Codes are (subspaces) ints in [0, codes); encoding is bit-stable
    across runs; each SAMPLED vector's codeword reproduces its own
    subvector exactly (distance 0 — the codebook is its subvectors)."""
    emb = tables["embeddings"]
    cb = similarity.pq_codebook(emb, subspaces=8, codes=16)
    enc = {r.vec_id: list(r.codes) for r in similarity.pq_encode(emb, cb).collect()}
    assert all(
        len(c) == 8 and all(0 <= x < 16 for x in c) for c in enc.values()
    )
    enc2 = {
        r.vec_id: list(r.codes) for r in similarity.pq_encode(emb, cb).collect()
    }
    assert enc == enc2
    sampled = [
        (i, r)
        for i, r in enumerate(
            emb.orderBy("vec_id").limit(16).select("vec_id").collect()
        )
    ]
    import numpy as np

    for c_idx, row in sampled:
        codes = enc[row.vec_id]
        for s in range(8):
            # the assigned codeword must be at distance 0 (ties can pick
            # an EARLIER identical codeword, so compare vectors not ids)
            assert np.array_equal(
                np.asarray(cb[s][codes[s]]), np.asarray(cb[s][c_idx])
            ) or codes[s] == c_idx


def test_pq_topk_full_rerank_equals_exact_l2(spark, tables):
    """With a shortlist covering the corpus, pq_topk degenerates to the
    exact integer-L2 top-k — pinned against an independent numpy
    computation of the same fixed-point distances."""
    import numpy as np

    emb = tables["embeddings"]
    n = emb.count()
    out = similarity.pq_topk(
        emb, n_queries=3, k=5, subspaces=8, codes=16, rerank=n
    ).collect()
    rows = emb.orderBy("vec_id").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.round(
        np.vstack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
        * 1000.0
    ).astype(np.int64)
    for qi in range(3):
        d2 = ((V - V[qi]) ** 2).sum(axis=1)
        order = np.lexsort((ids, d2))
        expect = [
            (int(ids[qi]), int(ids[j]), int(d2[j]), r + 1)
            for r, j in enumerate(order[:5])
        ]
        got = sorted(
            [
                (r.query_id, r.vec_id, r.d2, r.rank)
                for r in out
                if r.query_id == ids[qi]
            ],
            key=lambda t: t[3],
        )
        assert got == expect


def test_pq_trained_codebook_never_worse_on_training_sample(spark, tables):
    """Lloyd refinement initialized from the sampled codebook cannot
    increase quantization error on its training sample (k-means descent
    is monotone) — the guarantee that makes `pq_codebook_trained` a
    strict recall lever. Encoded codes stay in range."""
    import numpy as np

    emb = tables["embeddings"]
    S, K = 8, 16
    sampled = similarity.pq_codebook(emb, subspaces=S, codes=K)
    trained = similarity.pq_codebook_trained(
        emb, subspaces=S, codes=K, iterations=5, sample=1 << 20
    )
    rows = (
        emb.orderBy("vec_id")
        .select(similarity._int_embedding(F.col("embedding")).alias("iv"))
        .collect()
    )
    X = np.array([list(r["iv"]) for r in rows], dtype=np.int64)
    sd = X.shape[1] // S

    def mse(cb):
        tot = 0
        for s in range(S):
            sub = X[:, s * sd : (s + 1) * sd]
            C = np.asarray(cb[s], dtype=np.int64)
            d2 = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2 * (sub @ C.T)
                + (C * C).sum(axis=1)
            )
            tot += int(d2.min(axis=1).sum())
        return tot

    assert mse(trained) <= mse(sampled)
    enc = similarity.pq_encode(emb, trained).collect()
    assert all(
        len(r.codes) == S and all(0 <= c < K for c in r.codes) for r in enc
    )


def test_ivfpq_full_probe_full_rerank_equals_exact_l2(spark, tables):
    """Probing every cell with a corpus-covering shortlist degenerates
    IVF-PQ to the exact integer-L2 top-k (pinned against numpy) — the
    losses come ONLY from the two explicit knobs (nprobe, rerank)."""
    import numpy as np

    emb = tables["embeddings"]
    n = emb.count()
    out = similarity.ivfpq_topk(
        emb, n_queries=3, k=5, cells=4, nprobe=4, subspaces=8, rerank=n
    ).collect()
    rows = emb.orderBy("vec_id").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.round(
        np.vstack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
        * 1000.0
    ).astype(np.int64)
    for qi in range(3):
        d2 = ((V - V[qi]) ** 2).sum(axis=1)
        order = np.lexsort((ids, d2))
        expect = [
            (int(ids[qi]), int(ids[j]), int(d2[j]), r + 1)
            for r, j in enumerate(order[:5])
        ]
        got = sorted(
            [
                (r.query_id, r.vec_id, r.d2, r.rank)
                for r in out
                if r.query_id == ids[qi]
            ],
            key=lambda t: t[3],
        )
        assert got == expect


def test_ivfpq_narrow_probe_is_subset_of_probed_cells(spark, tables):
    """With nprobe=1, every returned vector must live in the query's own
    nearest cell — the pruning contract."""
    emb = tables["embeddings"]
    out = similarity.ivfpq_topk(
        emb, n_queries=2, k=5, cells=4, nprobe=1, subspaces=8
    ).collect()
    cb_rows = (
        emb.orderBy("vec_id")
        .limit(4)
        .select(similarity._int_embedding(F.col("embedding")).alias("iv"))
        .collect()
    )
    import numpy as np

    cents = np.array([list(r["iv"]) for r in cb_rows], dtype=np.int64)
    all_rows = emb.orderBy("vec_id").select(
        "vec_id", similarity._int_embedding(F.col("embedding")).alias("iv")
    ).collect()
    cell_of = {}
    for r in all_rows:
        v = np.asarray(list(r["iv"]), dtype=np.int64)
        cell_of[r.vec_id] = int(np.argmin(((cents - v) ** 2).sum(axis=1)))
    for r in out:
        assert cell_of[r.vec_id] == cell_of[r.query_id], r


def test_pq_encode_catalyst_fallback_matches_arrow(spark, tables):
    """The pure-Catalyst encode (no Python anywhere) must produce
    bit-identical codes to the Arrow GEMM path — both are exact integer
    argmins over the same codebook."""
    emb = tables["embeddings"]
    cb = similarity.pq_codebook(emb, subspaces=8, codes=16)
    fast = {
        r.vec_id: list(r.codes)
        for r in similarity.pq_encode(emb, cb, vectorized=True).collect()
    }
    slow = {
        r.vec_id: list(r.codes)
        for r in similarity.pq_encode(emb, cb, vectorized=False).collect()
    }
    assert fast == slow


def test_ivf_cell_layout_partition_prunes(spark, tables, tmp_path):
    """The 100-TB probe story end to end: encode cells, write the code
    table partitioned by cell, and a probe filter must appear as a
    PartitionFilter on the scan — the ANN probe becomes pruned I/O."""
    import re as re_

    from dbt_schema_builder_spark.sources import write_partitioned

    emb = tables["embeddings"]
    cents = similarity.pq_codebook(emb, subspaces=1, codes=4)
    cells = similarity.pq_encode(emb, cents).select(
        "vec_id", F.element_at("codes", 1).alias("cell")
    )
    out = str(tmp_path / "by_cell")
    write_partitioned(cells, out, ["cell"])
    probe = spark.read.parquet(out).where(F.col("cell") == 1)
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    m = re_.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan
    assert probe.count() == cells.where("cell = 1").count()


def test_pq_and_ivfpq_survive_corpus_smaller_than_codebook(spark, tables):
    """A corpus with fewer vectors than `codes` (or `cells`) yields a
    shorter sampled codebook — both ANN paths must run on it, not
    IndexError on the driver-side ADC table build."""
    tiny = tables["embeddings"].orderBy("vec_id").limit(6)
    out = similarity.pq_topk(
        tiny, n_queries=2, k=3, subspaces=8, codes=16, rerank=10
    ).collect()
    assert {r.query_id for r in out} and all(r.rank <= 3 for r in out)
    out2 = similarity.ivfpq_topk(
        tiny, n_queries=2, k=3, cells=8, nprobe=3, subspaces=8, codes=16
    ).collect()
    assert {r.query_id for r in out2}


def test_pq_topk_adc_only_mode(spark, tables):
    """rerank=None surfaces raw ADC distances: k rows per query, ranks
    dense, distances non-decreasing within a query."""
    out = similarity.pq_topk(
        tables["embeddings"], n_queries=2, k=5, rerank=None
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 2
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        assert all(
            rows[i].d2 <= rows[i + 1].d2 for i in range(len(rows) - 1)
        )
        assert rows[0].d2 == 0  # the query is its own nearest code point


def test_stratified_sample_proportions_and_determinism(spark, tables):
    docs = tables["documents"]
    s1 = text.stratified_sample(docs, default_fraction=0.5)
    s2 = text.stratified_sample(docs, default_fraction=0.5)
    assert sorted(r.doc_id for r in s1.collect()) == sorted(
        r.doc_id for r in s2.collect()
    )  # seeded => reproducible
    n, total = s1.count(), docs.count()
    assert 0.3 * total < n < 0.7 * total  # Bernoulli around 50%
    # per-stratum fractions respected loosely
    by_lang = {r.lang: r.n for r in s1.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    src = {r.lang: r.n for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for lang, cnt in by_lang.items():
        assert cnt <= src[lang]


def test_lang_id_is_deterministic(spark, tables):
    a = sorted(map(tuple, text.lang_id(tables["documents"]).collect()))
    b = sorted(map(tuple, text.lang_id(tables["documents"]).collect()))
    assert a == b


def test_multimodal_features_plumbing(spark, tables):
    media = attach_fake_image_bytes(tables["documents"].limit(20))
    feats = image_features(media).collect()
    assert len(feats) == 20
    assert all(r.header_ok == 1 for r in feats)
    assert all(r.n_bytes > 8 for r in feats)
    assert all(0.0 < r.byte_entropy < 8.0 for r in feats)


def test_audio_features_chunks(spark, tables):
    from dbt_schema_builder_spark.multimodal import audio_features

    media = attach_fake_image_bytes(tables["documents"].limit(5))
    feats = audio_features(media, chunk=128).collect()
    sizes = {r.doc_id: r.n_bytes for r in media.collect()}
    by_doc = {}
    for r in feats:
        by_doc.setdefault(r.doc_id, []).append(r)
        assert 0 < r.rms <= 255 and 0 < r.peak <= 255
    for doc_id, rows in by_doc.items():
        expected_chunks = -(-sizes[doc_id] // 128)  # ceil div
        assert len(rows) == expected_chunks


def test_resize_images_fixed_output(spark, tables):
    from dbt_schema_builder_spark.multimodal import resize_images

    media = attach_fake_image_bytes(tables["documents"].limit(10))
    out = resize_images(media, target_bytes=128).collect()
    assert len(out) == 10
    assert all(r.n_bytes == 128 and len(bytes(r.payload)) == 128 for r in out)
    # deterministic
    again = resize_images(media, target_bytes=128).collect()
    assert sorted((r.doc_id, bytes(r.payload)) for r in out) == sorted(
        (r.doc_id, bytes(r.payload)) for r in again
    )


def test_decode_stub_raises():
    # the seam is REAL since r10 (PPM/BMP parse for real); unsupported
    # payloads fail loudly as DATA errors, not NotImplementedError —
    # full decoder coverage lives in tests/test_multimodal_codecs.py
    with pytest.raises(ValueError, match="unsupported format"):
        decode_image_stub(b"anything")


def test_frame_sample_reassembles(spark, tables):
    media = attach_fake_image_bytes(tables["documents"].limit(5))
    frames = sample_frames(media, every=64)
    total = (
        frames.groupBy("doc_id")
        .agg(F.sum(F.length("frame_bytes")).alias("n"))
        .collect()
    )
    sizes = {r.doc_id: r.n_bytes for r in media.collect()}
    assert all(sizes[r.doc_id] == r.n for r in total)


def test_stratified_sample_explicit_fractions_skips_discovery(spark, tables):
    """With explicit fractions the sampler is a pure filter expression —
    no distinct().collect() strata-enumeration job, no Sample operator —
    and it is deterministic across calls and partitionings."""
    docs = tables["documents"]
    out = text.stratified_sample(
        docs, fractions={"en": 0.5}, default_fraction=0.1
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Sample" not in plan  # hash-filter, not per-partition RNG
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in text.stratified_sample(
            docs, fractions={"en": 0.5}, default_fraction=0.1
        ).collect()
    )
    assert a == b and len(a) > 0
    # repartitioning must not change the sample (hash of row content,
    # not task-local RNG) — the property sampleBy does NOT have
    c = sorted(
        r.doc_id
        for r in text.stratified_sample(
            docs.repartition(7), fractions={"en": 0.5}, default_fraction=0.1
        ).collect()
    )
    assert a == c
    # loose proportion check per stratum
    n_en = sum(1 for r in out.where("lang = 'en'").collect())
    total_en = docs.where("lang = 'en'").count()
    assert 0.3 * total_en < n_en < 0.7 * total_en


def test_redact_pii_planted_patterns(spark, tables):
    """Planted emails/SSNs/phones/IPs are counted and scrubbed; the
    synthetic corpus (no PII) round-trips as an exact no-op."""
    schema = tables["documents"].schema
    docs = spark.createDataFrame(
        [
            (1, "contact me at jo.doe+x@example.co.uk or 555-12-3456 now", "en", "s", 50),
            (2, "call 123.456.7890 and 123-456-7890 from 10.0.0.1 today", "en", "s", 50),
            (3, "nothing sensitive here at all", "en", "s", 29),
        ],
        schema=schema,
    )
    out = {r.doc_id: r for r in text.redact_pii(docs).collect()}
    assert (out[1].n_email, out[1].n_ssn) == (1, 1)
    assert (out[2].n_phone, out[2].n_ipv4) == (2, 1)
    assert (out[3].n_email, out[3].n_ssn, out[3].n_phone, out[3].n_ipv4) == (0, 0, 0, 0)
    # doc 3 is untouched: scrubbed md5 == original md5
    import hashlib

    assert out[3].redacted_md5 == hashlib.md5(b"nothing sensitive here at all").hexdigest()
    # docs 1-2 changed
    assert out[1].redacted_md5 != hashlib.md5(
        b"contact me at jo.doe+x@example.co.uk or 555-12-3456 now"
    ).hexdigest()


def test_repetition_stats_known_values(spark, tables):
    schema = tables["documents"].schema
    docs = spark.createDataFrame(
        [
            (1, "a a a a", "en", "s", 7),          # all dup; top bigram "a a" 3/3
            (2, "w x y z w", "en", "s", 9),        # 1 dup of 5; all bigrams unique
        ],
        schema=schema,
    )
    out = {r.doc_id: r for r in text.repetition_stats(docs).collect()}
    assert out[1].dup_token_fraction == 0.75 and out[1].top_bigram == "a a"
    assert out[1].top_bigram_fraction == 1.0
    assert out[2].dup_token_fraction == 0.2
    # deterministic tie-break: lexicographically smallest bigram wins
    assert out[2].top_bigram == "w x" and out[2].top_bigram_fraction == 0.25


def test_decontaminate_planted_overlap(spark, tables):
    schema = tables["documents"].schema
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps", "en", "b", 25)], schema=schema
    )
    docs = spark.createDataFrame(
        [
            (1, "totally clean text with no overlap here", "en", "s", 40),
            (2, "contains the quick brown fox somewhere inside", "en", "s", 46),
            (3, "short doc", "en", "s", 9),  # too short for any 3-gram
        ],
        schema=schema,
    )
    out = {r.doc_id: (r.n_hits, r.contaminated) for r in
           dedup.decontaminate(docs, bench, n=3).collect()}
    assert out[1] == (0, False)
    assert out[2] == (2, True)  # "the quick brown", "quick brown fox"
    assert out[3] == (0, False)


def test_pack_sequences_invariants(spark, tables):
    docs = tables["documents"]
    out = text.pack_sequences(docs, budget=512)
    rows = sorted(
        ((r.lang, r.doc_id, r.n_tokens, r.chunk_id) for r in out.collect())
    )
    assert len(rows) == docs.count()  # every doc assigned
    # within each lang, chunk_id is non-decreasing in doc_id order and
    # equals floor(tokens_before/budget)
    from itertools import groupby

    for lang, grp in groupby(rows, key=lambda r: r[0]):
        cum = 0
        prev_chunk = -1
        for _, _, n_tokens, chunk_id in grp:
            assert chunk_id == cum // 512
            assert chunk_id >= prev_chunk
            prev_chunk = chunk_id
            cum += n_tokens


def test_incremental_dedup_planted(spark, tables):
    """A new-batch doc whose normalized content (case/whitespace folded)
    matches the seen corpus is dropped; genuinely new content survives."""
    schema = tables["documents"].schema
    seen_docs = spark.createDataFrame(
        [(1, "Already Ingested   Content here", "en", "old", 31)], schema=schema
    )
    new_docs = spark.createDataFrame(
        [
            (10, "already ingested content here", "en", "new", 29),  # dup
            (11, "completely fresh material", "en", "new", 25),
        ],
        schema=schema,
    )
    seen = text.fingerprint(seen_docs)
    out = dedup.incremental_dedup(new_docs, seen, broadcast_seen=True)
    assert [r.doc_id for r in out.collect()] == [11]
    assert set(out.columns) == set(new_docs.columns)  # fingerprint not leaked


def test_incremental_dedup_bloom_exact_under_forced_false_positives(
    spark, tables
):
    """With a deliberately tiny filter (m_bits=16) nearly every batch doc
    collides into 'maybe seen' — the verify join must still remove every
    Bloom false positive, so the output is IDENTICAL to the plain
    anti-join at any filter setting. This is the operator's contract:
    the knob moves work volume, never results."""
    docs = tables["documents"]
    seen = text.fingerprint(docs.where(F.col("source").rlike("^src1.*$")))
    new = docs.where(~F.col("source").rlike("^src1.*$"))
    exact = {r.doc_id for r in dedup.incremental_dedup(new, seen).collect()}
    for m_bits, k in [(16, 2), (2048, 3)]:
        out = dedup.incremental_dedup_bloom(new, seen, m_bits=m_bits, k=k)
        assert {r.doc_id for r in out.collect()} == exact, (m_bits, k)
        assert set(out.columns) == set(new.columns)


def test_bloom_bits_bounded_and_monotone(spark, tables):
    """The packed word relation never exceeds m_bits/64 rows no matter
    the corpus size, and a superset corpus only ever ADDS bits (each
    half-corpus word is a bitwise subset of the full-corpus word — the
    monotonicity that makes the artifact incrementally maintainable)."""
    docs = tables["documents"]
    half = text.fingerprint(docs.where("doc_id % 2 = 0"))
    full = text.fingerprint(docs)
    m = 256
    w_half = {
        r.word_idx: r.word
        for r in dedup.bloom_bits(half, m_bits=m, k=3).collect()
    }
    w_full = {
        r.word_idx: r.word
        for r in dedup.bloom_bits(full, m_bits=m, k=3).collect()
    }
    assert len(w_full) <= m // 64
    assert set(w_half) <= set(w_full)
    for idx, w in w_half.items():
        assert w & ~w_full[idx] == 0  # half's bits all present in full
    assert all(0 <= idx < m // 64 for idx in w_full)


def test_bloom_bits_update_matches_full_rebuild(spark, tables):
    """Incremental maintenance: bits(half) updated with the other half
    equals a full rebuild — the artifact never needs the history
    rescanned."""
    docs = tables["documents"]
    a = text.fingerprint(docs.where("doc_id % 2 = 0"))
    b = text.fingerprint(docs.where("doc_id % 2 = 1"))
    full = {
        (r.word_idx, r.word)
        for r in dedup.bloom_bits(
            text.fingerprint(docs), m_bits=256, k=3
        ).collect()
    }
    incr = {
        (r.word_idx, r.word)
        for r in dedup.bloom_bits_update(
            dedup.bloom_bits(a, m_bits=256, k=3), b, m_bits=256, k=3
        ).collect()
    }
    assert incr == full


def test_shared_ngram_fraction_planted(spark, tables):
    """Two docs sharing a 3-gram span mark exactly those positions as
    shared; a doc shorter than n grams reports 0/0 with ppm 0."""
    schema = tables["documents"].schema
    docs = spark.createDataFrame(
        [
            (1, "a b c d e", "en", "s", 9),  # grams: abc bcd cde
            (2, "a b c x y", "en", "s", 9),  # grams: abc bcx cxy
            (3, "p q r s t", "en", "s", 9),  # grams: pqr qrs rst (unique)
            (4, "x y", "en", "s", 3),  # shorter than n: zero grams
        ],
        schema=schema,
    )
    out = {r.doc_id: r for r in dedup.shared_ngram_fraction(docs).collect()}
    assert (out[1].n_grams, out[1].n_shared) == (3, 1)  # only "a b c"
    assert out[1].shared_ppm == 333333
    assert (out[2].n_grams, out[2].n_shared) == (3, 1)
    assert (out[3].n_grams, out[3].n_shared) == (3, 0)
    assert (out[4].n_grams, out[4].n_shared, out[4].shared_ppm) == (0, 0, 0)


def test_tfidf_cosine_identical_docs_score_one(spark, tables):
    """Exact copies have cosine 1.0; a doc sharing no gram never pairs;
    max_df drops hot-gram contributions from candidate generation."""
    schema = tables["documents"].schema
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon", "en", "s", 30),
            (2, "alpha beta gamma delta epsilon", "en", "s", 30),
            (3, "one two three four five six", "en", "s", 27),
        ],
        schema=schema,
    )
    out = dedup.tfidf_ngram_cosine_pairs(docs, n=3, threshold=0.1).collect()
    pairs = {(r.doc_a, r.doc_b): r.cosine_tfidf for r in out}
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert not any(3 in p for p in pairs)
    # every gram of docs 1/2 has df=2, so max_df=1 drops 6 of 10 gram
    # occurrences — past the 0.5 default, the r8 saturation guard now
    # raises instead of silently returning 0 pairs
    with pytest.raises(ValueError, match="saturated"):
        dedup.tfidf_ngram_cosine_pairs(docs, n=3, threshold=0.1, max_df=1)
    # explicit opt-out keeps the old kill-all-candidates behaviour
    assert (
        dedup.tfidf_ngram_cosine_pairs(
            docs, n=3, threshold=0.1, max_df=1, max_dropped_mass=None
        )
        .count()
        == 0
    )


def test_hash_split_proportions_stability_and_independence(spark, tables):
    docs = tables["documents"]
    out = text.hash_split(docs)
    counts = {r.split: r.n for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    total = docs.count()
    assert 0.8 * total < counts["train"] < 0.97 * total
    assert counts.get("val", 0) + counts.get("test", 0) == total - counts["train"]
    # stability: a doc's split is unchanged when computed over a subset
    # (the property orderBy+ntile splits do NOT have)
    sub = text.hash_split(docs.limit(50))
    full = {r.doc_id: r.split for r in out.collect()}
    assert all(full[r.doc_id] == r.split for r in sub.collect())
    # a different salt draws a different (but still deterministic) split
    other = {r.doc_id: r.split for r in text.hash_split(docs, salt="v2").collect()}
    assert other != full
    assert sum(weights_must_differ := [full[k] != other[k] for k in full]) > 0
    # invalid weights rejected at construction
    import pytest as _pytest

    with _pytest.raises(ValueError):
        text.hash_split(docs, weights={"train": 0.5, "val": 0.2})


def test_unigram_logprob_rare_tokens_score_lower(spark, tables):
    """A doc made of corpus-frequent tokens must out-score a doc of
    tokens that appear nowhere else, and every score is negative."""
    base = tables["documents"]
    schema = base.schema
    extra = spark.createDataFrame(
        [
            (200001, "the the the the", "en", "srcX", 15),
            (200002, "qqxyzzy fnordlike blorptastic wunk", "en", "srcX", 34),
        ],
        schema=schema,
    )
    out = text.unigram_logprob(base.unionByName(extra))
    scores = {r.doc_id: r.avg_logprob for r in out.collect()}
    assert scores[200001] > scores[200002]
    assert all(v < 0 for v in scores.values())


def test_source_mix_rates(spark, tables):
    out = text.source_mix(tables["documents"], budget_tokens=100_000)
    rows = out.collect()
    assert all(0 < r.sample_rate <= 1.0 for r in rows)
    # a tiny budget forces every source below 1.0 and keeps ordering by size
    tiny = {r.source: r.sample_rate
            for r in text.source_mix(tables["documents"], budget_tokens=10).collect()}
    toks = {r.source: r.n_tokens for r in rows}
    big, small = max(toks, key=toks.get), min(toks, key=toks.get)
    assert tiny[big] <= tiny[small] < 1.0


def test_percentile_filter_drops_shortest_fraction(spark, tables):
    docs = tables["documents"]
    out = text.percentile_filter(docs, p=0.2)
    per_lang_in = {r.lang: r.n for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    per_lang_out = {r.lang: r.n for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in per_lang_in.items():
        assert per_lang_out[lang] == n - int(0.2 * n)
    # survivors are never shorter than any dropped doc (per stratum)
    joined = docs.join(out.select("doc_id"), "doc_id", "left_anti")
    for lang in per_lang_in:
        dropped_max = joined.where(F.col("lang") == lang).agg(
            F.max("n_chars")).first()[0]
        kept_min = out.where(F.col("lang") == lang).agg(
            F.min("n_chars")).first()[0]
        assert dropped_max <= kept_min


def test_cap_per_source_stable_subset(spark, tables):
    docs = tables["documents"]
    out = text.cap_per_source(docs, k=10)
    per = {r.source: r.n for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert all(n == 10 for n in per.values())
    # determinism: same kept set on a re-run and under a different
    # partitioning (hash rank, not rand())
    again = text.cap_per_source(docs.repartition(7), k=10)
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}
    # capping at a higher k is a superset of the lower-k choice
    wider = text.cap_per_source(docs, k=20)
    assert {r.doc_id for r in out.collect()} <= {r.doc_id for r in wider.collect()}


def test_oov_rate_planted(spark, tables):
    """Docs made entirely of vocab tokens score 0; unknown-token docs
    score 1; the rate is the exact token fraction."""
    schema = tables["documents"].schema
    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha", "en", "s", 16),
            (2, "alpha zzz", "en", "s", 9),
            (3, "qqq zzz www", "en", "s", 11),
        ],
        schema=schema,
    )
    vocab = spark.createDataFrame([("alpha",), ("beta",)], "token string")
    out = {r.doc_id: r for r in text.oov_rate(docs, vocab).collect()}
    assert out[1].oov_rate == 0.0 and out[1].n_oov == 0
    assert out[2].oov_rate == 0.5
    assert out[3].oov_rate == 1.0 and out[3].n_tokens == 3


def test_top_vocab_deterministic_tiebreak(spark, tables):
    v1 = [r.token for r in text.top_vocab(tables["documents"], 20).collect()]
    v2 = [r.token for r in text.top_vocab(
        tables["documents"].repartition(13), 20).collect()]
    assert set(v1) == set(v2) and len(v1) == 20


def test_dedup_stats_counts_planted_dupes(spark, tables):
    schema = tables["documents"].schema
    docs = spark.createDataFrame(
        [
            (1, "same text", "en", "a", 9),
            (2, "Same   TEXT", "en", "a", 11),  # normalized dup of 1
            (3, "other", "en", "a", 5),
            (4, "unique", "en", "b", 6),
        ],
        schema=schema,
    )
    out = {r.source: r for r in dedup.dedup_stats(docs).collect()}
    assert out["a"].n_docs == 3 and out["a"].n_distinct == 2
    assert out["a"].dup_rate == 1 / 3  # raw IEEE quotient since r10
    assert out["b"].dup_rate == 0.0


def test_weighted_sample_properties(spark, tables):
    """Heavier docs are over-represented; scaling all weights by a
    constant changes nothing; selection is stable under repartitioning."""
    schema = tables["documents"].schema
    rows = [(i, "t", "en", "s", 10 if i < 200 else 1) for i in range(400)]
    docs = spark.createDataFrame(rows, schema=schema)
    sel = {r.doc_id for r in text.weighted_sample_per_group(
        docs, k=100, weight="n_chars").collect()}
    heavy = sum(1 for d in sel if d < 200)
    assert len(sel) == 100
    assert heavy > 70  # w=10 class dominates a fair sample
    # weight scale-invariance
    scaled = docs.withColumn("n_chars", F.col("n_chars") * 37)
    sel_scaled = {r.doc_id for r in text.weighted_sample_per_group(
        scaled, k=100, weight="n_chars").collect()}
    assert sel_scaled == sel
    # partition-layout invariance
    sel_re = {r.doc_id for r in text.weighted_sample_per_group(
        docs.repartition(11), k=100, weight="n_chars").collect()}
    assert sel_re == sel


# ---------------------------------------------------------------- round 2b


def test_chunk_dedup_removes_planted_boilerplate(spark, tables):
    """A chunk shared by >max_docs docs is removed from all of them; a
    doc that is pure boilerplate drops out entirely."""
    boiler = "this license header repeats in every scraped page verbatim"  # 9 toks
    docs = spark.createDataFrame(
        [
            (1, boiler + " alpha beta gamma delta epsilon zeta eta theta", "en", "s", 1),
            (2, boiler + " one two three four five six seven eight", "en", "s", 1),
            (3, boiler + " red orange yellow green blue indigo violet pink", "en", "s", 1),
            (4, "a completely unique document with its own eight words", "en", "s", 1),
        ],
        schema=tables["documents"].schema,
    )
    # chunk=9 puts the 9-token boilerplate exactly in chunk 0 of docs 1-3
    out = {
        r["doc_id"]: r
        for r in dedup.chunk_dedup(docs, chunk=9, max_docs=2).collect()
    }
    assert boiler not in out[1]["clean_text"]
    assert out[1]["clean_text"].startswith("alpha")
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 1
    assert out[4]["clean_text"].startswith("a completely")
    # raising the cap keeps everything
    kept_all = dedup.chunk_dedup(docs, chunk=9, max_docs=3).collect()
    assert all(r["n_kept"] == r["n_chunks"] for r in kept_all)


def test_chunk_dedup_drops_pure_duplicate_docs(spark, tables):
    same = "identical spam page body repeated across the whole crawl"
    docs = spark.createDataFrame(
        [(i, same, "en", "s", 1) for i in range(5)],
        schema=tables["documents"].schema,
    )
    out = dedup.chunk_dedup(docs, chunk=16, max_docs=2)
    assert out.count() == 0


def test_winnowing_portable_shares_fingerprints_on_shared_substrings(
    spark, tables
):
    """Winnowing guarantee: a shared run of >= k + window - 1 tokens
    yields at least one shared fingerprint — in the portable md5 variant
    too, where fingerprints are hex strings."""
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"  # 8 >= 5 + 4 - 1
    docs = spark.createDataFrame(
        [
            (1, "prefix tokens here " + shared, "en", "s", 1),
            (2, shared + " totally different suffix words", "en", "s", 1),
            (3, "no overlap with the others at all whatsoever", "en", "s", 1),
        ],
        schema=tables["documents"].schema,
    )
    out = text.winnowing_fingerprints(docs, k=5, window=4, portable=True)
    rows = out.collect()
    assert all(isinstance(r["fingerprint"], str) for r in rows)
    by_doc = {
        d: {r["fingerprint"] for r in rows if r["doc_id"] == d} for d in (1, 2, 3)
    }
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3])


def test_zipf_stats_known_values(spark, tables):
    """Hand-computable corpus: freqs 4/2/1 over one source."""
    import math

    docs = spark.createDataFrame(
        [(1, "a a b c", "en", "s1", 1), (2, "a a b", "en", "s1", 1)],
        schema=tables["documents"].schema,
    )
    row = text.lexical_zipf_stats(docs).collect()[0]
    assert row["n_tokens"] == 7 and row["n_types"] == 3
    assert row["ttr"] == 3 / 7  # raw IEEE quotient since r10
    xs = [round(math.log(r) * 1e6) for r in (1, 2, 3)]
    ys = [round(math.log(f) * 1e6) for f in (4, 2, 1)]
    n = 3
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = n * sum(x * x for x in xs) - sum(xs) ** 2
    # raw quotient since r10, cast-each-then-divide like the operator
    assert row["zipf_slope"] == float(num) / float(den)


def test_curriculum_bins_ordered_and_complete(tables):
    out = text.curriculum_bins(tables["documents"], n_bins=10).collect()
    assert {r["bin"] for r in out} == set(range(1, 11))
    by_source = {}
    for r in sorted(out, key=lambda r: (r["source"], r["n_chars"], r["doc_id"])):
        prev = by_source.get(r["source"], 0)
        assert r["bin"] >= prev  # bins monotone in the difficulty key
        by_source[r["source"]] = r["bin"]


def test_quantize_embeddings_bounds_and_reconstruction(tables):
    out = similarity.quantize_embeddings(tables["embeddings"])
    joined = out.join(tables["embeddings"], "vec_id").collect()
    for r in joined[:50]:
        qs, scale = r["qvec"], r["q_scale"]
        assert max(abs(q) for q in qs) <= 127
        # nonzero vectors hit the full int8 range
        if any(v != 0 for v in r["embedding"]):
            assert max(abs(q) for q in qs) == 127
        assert r["q_sqnorm"] == sum(q * q for q in qs)
        # reconstruction error bounded by half a quantization step
        for x, q in zip(r["embedding"], qs):
            assert abs(x - q / scale) <= 0.5 / scale + 1e-4


def test_quantized_topk_recall_vs_exact(tables):
    """Int8 quantization must barely perturb the ranking: top-5 overlap
    with exact float cosine >= 4/5 per query, and rank-1 always agrees
    (the nearest neighbor survives quantization)."""
    emb = tables["embeddings"]
    qs = similarity.queries_from_corpus(emb, 5)
    exact = similarity.brute_force_topk(emb, qs, k=5).collect()
    quant = similarity.quantized_topk(emb, qs, k=5).collect()
    by_q_exact = {}
    by_q_quant = {}
    for r in exact:
        by_q_exact.setdefault(r["query_id"], {})[r["rank"]] = r["vec_id"]
    for r in quant:
        by_q_quant.setdefault(r["query_id"], {})[r["rank"]] = r["vec_id"]
    for q in by_q_exact:
        assert by_q_quant[q][1] == by_q_exact[q][1]
        overlap = set(by_q_exact[q].values()) & set(by_q_quant[q].values())
        assert len(overlap) >= 4


def test_source_overlap_matrix_planted(spark, tables):
    """Two sources sharing a 5-token run share exactly 3 tri-gram
    shingles; an unrelated source shares none and has no row."""
    shared = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            (1, shared + " one two", "en", "sA", 1),
            (2, shared + " three four", "en", "sB", 1),
            (3, "totally different words everywhere here now", "en", "sC", 1),
        ],
        schema=tables["documents"].schema,
    )
    rows = dedup.source_overlap_matrix(docs, n=3).collect()
    pairs = {(r["source_a"], r["source_b"]): r for r in rows}
    assert set(pairs) == {("sA", "sB")}
    r = pairs[("sA", "sB")]
    assert r["n_shared"] == 3  # the 3 tri-grams inside the shared run
    # each source has 5 distinct tri-grams (7 tokens)
    assert r["jaccard"] == 3 / (5 + 5 - 3)  # raw quotient since r10


def test_bigram_logprob_invariants(spark, tables):
    """Scores are log-probabilities (< 0), bigram counts equal token
    count - 1 per doc, and sub-2-token docs drop out."""
    docs = tables["documents"]
    out = text.bigram_logprob(docs).collect()
    n_tok = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
    }
    assert len(out) == sum(1 for n in n_tok.values() if n >= 2)
    for r in out:
        assert r.avg_logprob < 0
        assert r.n_bigrams == n_tok[r.doc_id] - 1


def test_embedding_near_dup_lsh_finds_planted_near_identical(spark, tables):
    """Realistic-recall pin for the 8-bit x 16-table LSH shape: a
    PERTURBED copy (cos ~0.96, not 1.0) must still collide in >= 1
    table and verify. Identical vectors collide at any table width, so
    only a near-identical plant actually exercises the recall math
    (p_bit ~= 0.91, per-table ~0.48, >= 1 of 16 ~= 1 - 3e-5); with
    seeded hyperplanes the outcome is deterministic. Guards against a
    future 'optimization' that narrows tables into recall collapse."""
    import math

    emb = tables["embeddings"]
    first = emb.orderBy("vec_id").first()
    v = list(first.embedding)
    w = list(v)
    w[0] = w[0] + 0.55 * math.sqrt(sum(x * x for x in v)) * 0.5
    cos = sum(a * b for a, b in zip(v, w)) / math.sqrt(
        sum(x * x for x in v) * sum(x * x for x in w)
    )
    assert 0.9 < cos < 0.99  # genuinely non-identical, above threshold
    planted = spark.createDataFrame(
        [(999999, [float(x) for x in w], first.label)], emb.schema
    )
    out = similarity.embedding_near_dup(
        emb.unionByName(planted), threshold=0.9, strategy="lsh"
    )
    pairs = {(r.vec_a, r.vec_b): r.sim for r in out.collect()}
    got = pairs.get((first.vec_id, 999999))
    assert got is not None and got == round(cos, 4)


def test_cluster_safe_split_keeps_near_dups_together(spark, docs_with_dupes):
    """The leakage guarantee: doc 0 and its planted exact + near copies
    form one pair-graph cluster and must land in the SAME split, while
    documents in no pair keep exactly their plain hash_split assignment
    (adopting the safe split only changes the docs that were leaking)."""
    pairs = dedup.ngram_jaccard_pairs(docs_with_dupes, n=3, threshold=0.2)
    out = {
        r.doc_id: (r.cluster_id, r.split)
        for r in dedup.cluster_safe_split(docs_with_dupes, pairs).collect()
    }
    # the planted family is one cluster with one split
    fam = {out[0], out[100001], out[100002]}
    assert len(fam) == 1, fam
    # singletons (docs in no pair) match plain hash_split exactly
    paired = set()
    for r in pairs.collect():
        paired.add(r.doc_a)
        paired.add(r.doc_b)
    plain = {
        r.doc_id: r.split
        for r in text.hash_split(docs_with_dupes).collect()
    }
    for doc_id, (cluster_id, split) in out.items():
        if doc_id not in paired:
            assert cluster_id == doc_id
            assert split == plain[doc_id], doc_id


def test_centroid_outliers_flags_anti_aligned_vector(spark, tables):
    """A planted copy of some label-0 vector stays inlier-ish while its
    NEGATION (cosine -1 to whatever direction the original had) must be
    flagged: sign of the centroid cosine flips exactly with the vector."""
    emb = tables["embeddings"]
    probe = emb.where(F.col("label") == 0).orderBy("vec_id").first()
    planted = spark.createDataFrame(
        [
            (888801, [float(x) for x in probe.embedding], 0),
            (888802, [float(-x) for x in probe.embedding], 0),
        ],
        emb.schema,
    )
    out = {
        r.vec_id: (r.sim_centroid, r.is_outlier)
        for r in similarity.centroid_outliers(
            emb.unionByName(planted)
        ).collect()
    }
    sim_pos, flag_pos = out[888801]
    sim_neg, flag_neg = out[888802]
    assert sim_neg == -sim_pos  # exact negation of the same dot product
    assert flag_pos + flag_neg == 1  # exactly one side of the 0 boundary
    # every row carries the flag consistent with its unrounded sign
    # (spot-check via the rounded surface away from the boundary)
    for vid, (s, f) in out.items():
        if abs(s) > 0.001:
            assert f == (1 if s < 0 else 0), (vid, s, f)


def test_sliding_chunks_coverage_and_overlap(spark, tables):
    """Chunk arithmetic: stride = size - overlap, consecutive chunks
    share exactly `overlap` token positions, every token is covered,
    the tail partial chunk is kept, and a doc shorter than `size`
    yields exactly one chunk of its own length."""
    schema = tables["documents"].schema
    long_text = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, long_text, "en", "s", len(long_text)), (2, "a b c", "en", "s", 5)],
        schema=schema,
    )
    out = text.sliding_chunks(docs, size=10, overlap=2).collect()
    one = sorted(
        [r for r in out if r.doc_id == 1], key=lambda r: r.chunk_idx
    )
    # n_chunks = ceil((100 - 2) / 8) = 13
    assert [r.chunk_idx for r in one] == list(range(13))
    assert all(r.start_tok == i * 8 for i, r in enumerate(one))
    assert all(r.n_tok == 10 for r in one[:-1])
    assert one[-1].n_tok == 100 - 12 * 8  # tail partial = 4 tokens
    # consecutive windows overlap by exactly 2 positions
    for a, b in zip(one, one[1:]):
        assert a.start_tok + a.n_tok - b.start_tok == 2
    short = [r for r in out if r.doc_id == 2]
    assert len(short) == 1
    assert (short[0].start_tok, short[0].n_tok) == (0, 3)
    with pytest.raises(ValueError):
        text.sliding_chunks(docs, size=8, overlap=8)


def test_keep_canonical_actions(spark, tables):
    """A chain cluster keeps exactly its minimum doc_id and drops the
    rest, all pointing at the same keeper; docs outside any pair keep
    themselves."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    docs = tables["documents"].limit(0).sparkSession.createDataFrame(
        [(i, f"t{i}", "en", "s", 2) for i in (1, 2, 3, 10, 11, 99)],
        tables["documents"].schema,
    )
    out = {r.doc_id: r for r in dedup.keep_canonical(docs, pairs).collect()}
    assert {d: out[d].action for d in (1, 2, 3)} == {
        1: "keep", 2: "drop", 3: "drop"
    }
    assert all(out[d].keep_doc_id == 1 for d in (1, 2, 3))
    assert (out[10].action, out[11].action) == ("keep", "drop")
    assert out[99].action == "keep" and out[99].keep_doc_id == 99


def test_ppjoin_equals_inverted_index_jaccard(docs_with_dupes):
    """Prefix filtering is LOSSLESS: on a corpus with planted exact and
    near duplicates, the prefix-filtered join returns exactly the same
    (pair, jaccard) set as the full inverted-index formulation, at
    every threshold tried."""
    for t in (0.2, 0.5, 0.8):
        full = sorted(
            map(
                tuple,
                dedup.ngram_jaccard_pairs(
                    docs_with_dupes, n=3, threshold=t
                ).collect(),
            )
        )
        pref = sorted(
            map(
                tuple,
                dedup.jaccard_prefix_pairs(
                    docs_with_dupes, n=3, threshold=t
                ).collect(),
            )
        )
        assert pref == full, t
        assert len(full) >= 1  # planted dupes guarantee pairs exist


def test_jaccard_pairs_auto_dispatch(docs_with_dupes):
    """r5 (verdict ask #7): the strategy dispatcher picks the measured
    crossover — prefix filtering at threshold >= 0.8, the inverted
    index below — and both branches stay output-identical. max_df on
    the lossless prefix branch must refuse loudly."""
    import pytest

    # crossover: high threshold -> prefix plan (has the df-rank agg +
    # sorted rebuild); weak threshold -> inverted plan (no Sort agg)
    hi = dedup.jaccard_pairs(docs_with_dupes, threshold=0.8)
    lo = dedup.jaccard_pairs(docs_with_dupes, threshold=0.2)
    hi_plan = hi._jdf.queryExecution().optimizedPlan().toString()
    lo_plan = lo._jdf.queryExecution().optimizedPlan().toString()
    # prefix branch marker: the array_intersect verify (r14: the
    # rarest-first sort_array rebuild is now hidden behind the persisted
    # prefix index's InMemoryRelation in the optimized-plan string)
    assert "array_intersect" in hi_plan
    assert "array_intersect" not in lo_plan
    # dispatch preserves output equality on both sides of the crossover
    assert sorted(map(tuple, hi.collect())) == sorted(
        map(
            tuple,
            dedup.ngram_jaccard_pairs(docs_with_dupes, threshold=0.8).collect(),
        )
    )
    assert sorted(map(tuple, lo.collect())) == sorted(
        map(
            tuple,
            dedup.jaccard_prefix_pairs(docs_with_dupes, threshold=0.2).collect(),
        )
    )
    with pytest.raises(ValueError, match="lossless"):
        dedup.jaccard_pairs(docs_with_dupes, threshold=0.9, max_df=64)
    with pytest.raises(ValueError, match="unknown strategy"):
        dedup.jaccard_pairs(docs_with_dupes, strategy="bogus")
    # r9 (r8 ADVICE): a non-default max_dropped_mass on the prefix
    # branch (explicit or auto-resolved at threshold >= 0.8) must be
    # rejected, not silently dropped — the caller asked for a tighter
    # guard and the lossless branch has none to tighten
    with pytest.raises(ValueError, match="no df cap"):
        dedup.jaccard_pairs(
            docs_with_dupes, threshold=0.9, max_dropped_mass=0.1
        )
    with pytest.raises(ValueError, match="no df cap"):
        dedup.jaccard_pairs(
            docs_with_dupes,
            threshold=0.2,
            strategy="prefix",
            max_dropped_mass=None,
        )
    # the signature default rides along silently (indistinguishable
    # from not passing it) — the documented carve-out
    assert dedup.jaccard_pairs(
        docs_with_dupes, threshold=0.9, max_dropped_mass=0.5
    ).columns == ["doc_a", "doc_b", "jaccard"]


def test_frame_dedup_finds_shared_frames(docs_with_dupes):
    """An exact duplicate asset shares EVERY frame with its source; the
    shared-frame report must surface them with n_docs >= 2."""
    from dbt_schema_builder_spark.multimodal import frame_dedup

    media = attach_fake_image_bytes(docs_with_dupes)
    out = frame_dedup(media, every=64).collect()
    assert len(out) >= 1
    assert all(r.n_docs >= 2 and r.n_frames >= r.n_docs for r in out)
    # the planted exact copy (doc 0 == doc 100001) shares its first
    # frame: count frames of doc 0's payload and check at least that
    # many shared hashes exist involving >= 2 docs
    assert any(r.n_docs >= 2 for r in out)


def test_tokenizer_fertility_consistent_with_apply(spark, tables):
    """r5: the per-language fertility rollup must agree exactly with
    the per-doc segmentation it is derived from, and each merge can
    only reduce (or keep) the subword total vs raw characters."""
    docs = tables["documents"]
    merges = [("e", "r"), ("i", "n")]
    fert = {
        r.lang: r for r in text.tokenizer_fertility(docs, merges).collect()
    }
    want = (
        text.apply_bpe_merges(docs, merges)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("d"),
            F.sum("n_subwords").alias("s"),
            F.sum("n_words").alias("w"),
        )
        .collect()
    )
    assert len(want) > 1
    for r in want:
        fr = fert[r.lang]
        assert (fr.n_docs, fr.n_subwords, fr.n_words) == (r.d, r.s, r.w)
        assert fr.fertility_milli == (1000 * r.s) // r.w
        # subwords never exceed characters-in-words, never fall below words
        assert fr.n_words <= fr.n_subwords


def test_apply_bpe_agrees_with_learning_symbol_table(spark, tables):
    """r6: the two BPE implementations must agree — learning segments
    via the per-word aggregate-HOF fold (its syms table), application
    via chained string replaces (the r5 rewrite). Learn on the real
    corpus, then apply the learned merges: the corpus-total subword
    count from apply_bpe_merges must equal the symbol counts the
    TRAINING loop itself ended with, word by word."""
    docs = tables["documents"]
    merges, syms = text.learn_bpe_merges(docs, n_merges=4)
    assert len(merges) == 4
    total_apply = (
        text.apply_bpe_merges(docs, merges)
        .agg(F.sum("n_subwords"))
        .collect()[0][0]
    )
    expected = (
        docs.select(F.explode(text.tokens()).alias("w"))
        .join(syms, "w")
        .agg(F.sum(F.size("syms")))
        .collect()[0][0]
    )
    assert total_apply == expected


def test_dsir_importance_exact_weights_and_direction(spark):
    """r6: DSIR importance weights — exact milli arithmetic checked
    against an independent Python replay, and the directional
    property that makes the operator useful: documents made of
    target-domain tokens outweigh off-domain ones."""
    import math

    def _mk(rows):
        return spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )

    raw = _mk(
        [
            (1, "aaa bbb aaa"),
            (2, "zzz yyy zzz yyy"),
            (3, "aaa bbb"),
            (4, "zzz zzz"),
        ]
    )
    target = _mk([(100, "aaa bbb aaa bbb aaa")])
    out = {
        r.doc_id: r
        for r in text.dsir_importance(raw, target).collect()
    }
    # independent replay
    raw_toks = {1: ["aaa", "bbb", "aaa"], 2: ["zzz", "yyy", "zzz", "yyy"],
                3: ["aaa", "bbb"], 4: ["zzz", "zzz"]}
    c_raw: dict = {}
    for ts in raw_toks.values():
        for t in ts:
            c_raw[t] = c_raw.get(t, 0) + 1
    c_tgt = {"aaa": 3, "bbb": 2}
    vocab = set(c_raw) | set(c_tgt)
    v, n_raw, n_tgt = len(vocab), sum(c_raw.values()), sum(c_tgt.values())

    def w_milli(t):
        lr = math.log((c_tgt.get(t, 0) + 1) / (n_tgt + v)) - math.log(
            (c_raw.get(t, 0) + 1) / (n_raw + v)
        )
        return round(lr * 1000)

    for did, ts in raw_toks.items():
        expect = sum(w_milli(t) for t in ts)
        # +-1 milli per token: JVM log vs libm log may differ in the
        # last ulp, which can flip a .5-boundary milli rounding
        assert abs(out[did].weight_milli - expect) <= len(ts)
        assert out[did].n_tokens == len(ts)
    # direction: pure-target docs above off-domain docs
    assert out[1].weight_milli > 0 > out[2].weight_milli
    assert out[3].weight_milli > 0 > out[4].weight_milli
    # top-k selection: deterministic rank, k rows
    top = text.dsir_importance(raw, target, k=2).collect()
    assert [r.doc_id for r in sorted(top, key=lambda r: r.rank)] == [1, 3]


def test_source_mix_waterfill_exact_allocation(spark):
    """r6: waterfilling source allocation — small sources taken whole,
    the remainder flows to large ones, budget spent exactly."""

    def _mk(rows):
        return spark.createDataFrame(
            [
                (i, " ".join(["tok"] * n), "en", s, 3 * n)
                for i, (s, n) in enumerate(rows)
            ],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )

    # totals: tiny=10, small=50, big=200, huge=400 tokens
    docs = _mk(
        [("tiny", 10), ("small", 50), ("big", 100), ("big", 100),
         ("huge", 400)]
    )
    out = {
        r.source: r
        for r in text.source_mix_waterfill(docs, budget_tokens=300).collect()
    }
    # waterfill by hand: tiny=10 whole, small=50 whole; remaining 240
    # over {big, huge} -> level 120 each
    assert out["tiny"].alloc_tokens == 10
    assert out["small"].alloc_tokens == 50
    assert out["big"].alloc_tokens == 120
    assert out["huge"].alloc_tokens == 120
    assert sum(r.alloc_tokens for r in out.values()) == 300
    assert out["tiny"].rate_milli == 1000 and out["big"].rate_milli == 600
    # budget >= corpus: everyone taken whole
    full = {
        r.source: r.alloc_tokens
        for r in text.source_mix_waterfill(docs, budget_tokens=10_000).collect()
    }
    assert full == {"tiny": 10, "small": 50, "big": 200, "huge": 400}
    # remainder distribution is deterministic and exact
    out2 = {
        r.source: r.alloc_tokens
        for r in text.source_mix_waterfill(docs, budget_tokens=301).collect()
    }
    assert sum(out2.values()) == 301


def test_source_mix_waterfill_rejects_null_source(spark):
    """A NULL source group would be debited budget in the solve and
    silently zeroed by the fold-back — refuse loudly instead."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "a b c", "en", None, 5), (2, "d e", "en", "web", 3)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    with pytest.raises(ValueError, match="NULL source"):
        text.source_mix_waterfill(docs, budget_tokens=4)


# ---------------------------------------------------------------------------
# duplicate_substring_spans (r7: the suffix-array modality)
# ---------------------------------------------------------------------------


def test_substring_spans_finds_cross_doc_span_at_arbitrary_offsets(spark):
    """A 25-token span shared by two docs at DIFFERENT offsets is
    surfaced in both, with exact start positions and length — the case
    chunk_dedup (fixed stride) structurally misses."""
    span = " ".join(f"w{i}" for i in range(25))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + span + " gamma"),
            (2, "x y z " + span),
            (3, "totally unrelated words only here"),
        ],
        "doc_id int, text string",
    )
    out = {
        (r.doc_id, r.start_pos, r.span_tokens, r.n_grams)
        for r in dedup.duplicate_substring_spans(docs, min_len=20).collect()
    }
    assert out == {(1, 3, 25, 6), (2, 4, 25, 6)}


def test_substring_spans_scope_gates_within_doc_repeats(spark):
    """A doc that repeats a phrase only WITHIN itself is invisible to
    scope='cross_doc' and flagged by scope='any' (the Lee et al.
    count)."""
    docs = spark.createDataFrame(
        [(1, ("rep " * 22).strip()), (2, "other words entirely")],
        "doc_id int, text string",
    )
    assert (
        dedup.duplicate_substring_spans(docs, min_len=20).count() == 0
    )
    out = dedup.duplicate_substring_spans(
        docs, min_len=20, scope="any"
    ).collect()
    assert [(r.doc_id, r.start_pos, r.span_tokens) for r in out] == [
        (1, 1, 22)
    ]


def test_substring_spans_min_len_filters_short_runs(spark):
    """With k < min_len, merged spans shorter than min_len are dropped
    even though their k-grams are duplicated."""
    shared = "a b c d e f g h"  # 8 tokens shared
    docs = spark.createDataFrame(
        [(1, shared + " tail1 one"), (2, shared + " tail2 two")],
        "doc_id int, text string",
    )
    # k=5: the shared 8 tokens give a 4-gram run -> span of 8 tokens
    assert (
        dedup.duplicate_substring_spans(docs, min_len=10, k=5).count()
        == 0
    )
    out = dedup.duplicate_substring_spans(docs, min_len=8, k=5).collect()
    assert sorted((r.doc_id, r.span_tokens) for r in out) == [
        (1, 8),
        (2, 8),
    ]


def test_substring_spans_rejects_bad_params(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError, match="scope"):
        dedup.duplicate_substring_spans(docs, scope="nope")
    with pytest.raises(ValueError, match="k <= min_len"):
        dedup.duplicate_substring_spans(docs, min_len=5, k=9)


def test_duplicate_span_stats_total_and_exact(spark):
    """Stats cover EVERY doc (zeros for clean ones); dup_tokens is the
    interval union of span token extents (here a single span per doc,
    so union == sum); rate is integer milli."""
    span = " ".join(f"w{i}" for i in range(25))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + span + " gamma"),  # 28 tokens, 25 dup
            (2, "x y z " + span),
            (3, "clean words only"),
        ],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans, r.dup_rate_milli)
        for r in dedup.duplicate_span_stats(docs, min_len=20).collect()
    }
    assert out == {
        1: (28, 25, 1, 892),
        2: (28, 25, 1, 892),
        3: (3, 0, 0, 0),
    }


def test_cut_duplicate_spans_keeps_one_canonical_occurrence(spark):
    """The removal transform: every duplicated gram's canonical
    occurrence (lexicographic min (doc_id, pos)) is protected; every
    other flagged position is excised; clean docs survive verbatim in
    token space."""
    span = " ".join(f"w{i}" for i in range(25))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + span + " gamma"),
            (2, "x y z " + span),
            (3, "clean words only"),
        ],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: (
            r.n_tokens_before,
            r.n_tokens_after,
            r.n_cut_spans,
            r.text_after,
        )
        for r in dedup.cut_duplicate_spans(docs, min_len=20).collect()
    }
    assert out[1][1] == 28 and out[1][2] == 0  # canonical: untouched
    assert out[2] == (28, 3, 1, "x y z")  # span excised
    assert out[3] == (3, 3, 0, "clean words only")
    # corpus-level invariant: each duplicated span's tokens survive
    # exactly once across the corpus
    total_after = sum(v[1] for v in out.values())
    assert total_after == 28 + 3 + 3


def test_cut_duplicate_spans_never_destroys_all_occurrences(spark):
    """Regression (r7 review): a span-LEVEL keep rule keyed on the
    span's first gram can cut EVERY occurrence of a substring — doc 2's
    span 'c a b' gets cut because its first gram's canon is doc 1,
    while doc 3's 'a b' gets cut because its canon is doc 2, so 'a b'
    survives nowhere. The position-level protection rule keeps each
    duplicated gram's canonical occurrence intact."""
    docs = spark.createDataFrame(
        [(1, "c a x"), (2, "c a b"), (3, "y a b")],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: (r.n_tokens_after, r.n_cut_spans, r.text_after)
        for r in dedup.cut_duplicate_spans(docs, min_len=2, k=2).collect()
    }
    # canon of 'c a' is (1,1): doc 1 untouched; canon of 'a b' is
    # (2,2): doc 2 keeps 'a b' and cuts only the now-redundant 'c';
    # doc 3's 'a b' is cut entirely
    assert out[1] == (3, 0, "c a x")
    assert out[2] == (2, 1, "a b")
    assert out[3] == (1, 1, "y")
    # the guarantee: every duplicated gram survives exactly once
    texts = [out[d][2] for d in sorted(out)]
    assert sum(t.count("c a") for t in texts) == 1
    assert sum(t.count("a b") for t in texts) == 1


def test_duplicate_span_stats_interval_union_not_sum(spark):
    """Regression (r7 review): two islands with a gap of <= k-2 gram
    positions overlap in TOKEN space; summing span_tokens would report
    dup_tokens=6 > n_tokens=5 (a 120% rate). The interval union caps
    coverage at the true count."""
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c x c d e")],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans, r.dup_rate_milli)
        for r in dedup.duplicate_span_stats(docs, min_len=3, k=3).collect()
    }
    # doc 1: islands at gram-pos {1} ('a b c') and {3} ('c d e') —
    # extents [1,3] and [3,5] overlap at token 3: union = 5, not 6
    assert out[1] == (5, 5, 2, 1000)
    assert out[2] == (7, 6, 2, 857)


def test_cut_duplicate_spans_fully_cut_doc_surfaces_empty(spark):
    """A doc that is one big duplicated span (and not canonical) comes
    back empty rather than disappearing."""
    span = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, span), (2, span)], "doc_id int, text string"
    )
    out = {
        r.doc_id: (r.n_tokens_after, r.text_after)
        for r in dedup.cut_duplicate_spans(docs, min_len=20).collect()
    }
    assert out[1][0] == 20
    assert out[2] == (0, "")
