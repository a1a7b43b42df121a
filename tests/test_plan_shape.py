"""Physical-plan assertions (SURVEY.md section 5: SQL-substring tests
become plan-shape checks). These pin the properties that matter at scale:
filters reach the parquet scan, projections prune the read schema,
dimensions broadcast, top-k avoids global sorts, and the hot paths stay
inside whole-stage codegen (no Python UDFs)."""

import re

from pyspark.sql import functions as F

from dbt_schema_builder_spark.operators import relational
from dbt_schema_builder_spark.policy.redaction import (
    safe_projection,
    soft_delete_filter,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_soft_delete_predicate_pushes_to_scan(tables):
    df = soft_delete_filter(tables["lineitem"], "l_shipdate", "IS NOT NULL")
    plan = _plan(df)
    assert re.search(r"PushedFilters: \[.*IsNotNull\(l_shipdate\)", plan), plan


def test_projection_prunes_read_schema(tables):
    df = tables["lineitem"].select("l_orderkey", "l_quantity")
    plan = _plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(m.group(1).split(",")) == {
        "l_orderkey:bigint", "l_quantity:double"
    }, plan


def test_redaction_does_not_widen_scan(tables):
    # redacted columns are literals - they must NOT be read from parquet
    df = safe_projection(
        tables["customer"], {"c_name": "x", "c_acctbal": 0}
    ).select("c_custkey", "c_name")
    plan = _plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and m.group(1) == "c_custkey:bigint", plan


def test_star_join_broadcasts_dimensions(tables):
    df = relational.star_join_revenue(
        tables["lineitem"], tables["orders"], tables["customer"],
        tables["nation"], tables["region"],
    )
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_topk_plans_take_ordered_not_global_sort(tables):
    df = relational.top_k_orders(tables["orders"], k=10)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_hash_agg_has_partial_aggregation(tables):
    df = relational.pricing_summary(tables["lineitem"])
    plan = _plan(df)
    # two HashAggregate nodes: partial (map-side) + final after exchange
    assert plan.count("HashAggregate") >= 2, plan


def test_semi_anti_use_join_not_materialization(tables):
    df = relational.semi_anti_customers(tables["customer"], tables["orders"])
    plan = _plan(df)
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan


def test_text_ops_stay_in_codegen(tables):
    # no BatchEvalPython / ArrowEvalPython in built-in text analysis
    from dbt_schema_builder_spark.operators import text

    for op in (text.token_count, text.quality_score, text.lang_id):
        plan = _plan(op(tables["documents"]))
        # the claim that matters: no Python workers in the hot path
        # (higher-order lambdas may individually fall back to interpreted
        # eval, but they stay JVM-side)
        assert "EvalPython" not in plan, (op.__name__, plan)
        assert "Batched: true" in plan, (op.__name__, plan)  # vectorized scan


def test_window_rank_single_shuffle(tables):
    df = relational.top_orders_per_customer(tables["orders"], k=3)
    plan = _plan(df)
    # one exchange for the window partition; AQE may add reads but only
    # one hashpartitioning on o_custkey may exist
    assert len(re.findall(r"hashpartitioning\(o_custkey", plan)) == 1, plan


def test_embedding_near_dup_has_no_cartesian(tables):
    # neither shipped strategy may plan a cartesian: the weak-threshold
    # path is block-GEMM (applyInPandas over block-pair keys), the
    # high-threshold path is bucket-join + equi-join; the all-pairs join
    # form is reserved for the recall oracle
    from dbt_schema_builder_spark.operators import similarity

    for strategy in ("blocked", "lsh"):
        plan = _plan(
            similarity.embedding_near_dup(
                tables["embeddings"], threshold=0.5, strategy=strategy
            )
        )
        assert "CartesianProduct" not in plan, (strategy, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (strategy, plan)
    blocked = _plan(similarity.embedding_near_dup(tables["embeddings"], 0.5))
    assert "FlatMapGroupsInPandas" in blocked, blocked  # GEMM stage present


def test_include_filter_pushes_isin(tables):
    df = tables["events"].where(
        F.col("event_type").isin("click", "view")
    ).select("event_id")
    plan = _plan(df)
    assert re.search(r"PushedFilters: \[.*In\(event_type", plan), plan


def test_ngram_jaccard_no_cartesian_and_no_string_join_key(tables):
    """The rewritten jaccard: candidate join on the hashed 8-byte key,
    never a cartesian; set sizes carried through the explode (no second
    aggregation-join for denominators)."""
    from dbt_schema_builder_spark.operators import dedup

    df = dedup.ngram_jaccard_pairs(tables["documents"], max_df=50)
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    # exactly one join in the whole plan: the hashed-shingle self-join
    assert len(re.findall(
        r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan
    )) == 1, plan
    # join key is the xxhash64 long, not the shingle string
    assert "xxhash64" in plan, plan


def test_merge_latest_single_shuffle(tables):
    from dbt_schema_builder_spark.operators import temporal

    ev = tables["events"].select("event_id", "ts", "user_id", "event_type")
    out = temporal.merge_latest(
        ev.where(F.col("event_id") % 3 != 0),
        ev.where(F.col("event_id") % 3 == 0),
        key="user_id",
    )
    plan = _plan(out)
    # union + one window: exactly one exchange, no join; WindowGroupLimit
    # prunes to the per-key top row map-side before the shuffle
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "Join type" not in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_hash_split_is_pure_projection(tables):
    from dbt_schema_builder_spark.operators import text

    plan = _plan(text.hash_split(tables["documents"]))
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_source_mix_broadcasts_totals(tables):
    from dbt_schema_builder_spark.operators import text

    plan = _plan(text.source_mix(tables["documents"]))
    # the 1-row totals side must broadcast, never shuffle the corpus twice
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_lsh_vectorized_signature_is_arrow_batched(tables):
    """The GEMM signature runs as ArrowEvalPython (vectorized batch
    transfer), never row-at-a-time BatchEvalPython."""
    from dbt_schema_builder_spark.operators import similarity

    emb = tables["embeddings"]
    df = similarity.lsh_bucketed_topk(
        emb, similarity.queries_from_corpus(emb, 3), k=3
    )
    plan = _plan(df)
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_quantize_is_shuffle_free_with_explode_let(tables):
    """quantize_embeddings is a pure map: no Exchange, no Python, and the
    explode-let Generate nodes pin scale/qvec to one eval per row (the
    collapsed form re-evaluated array_max per element — O(dim^2))."""
    from dbt_schema_builder_spark.operators import similarity

    df = similarity.quantize_embeddings(tables["embeddings"])
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("Generate") >= 2, plan
    # the per-element lambda must reference the Generate output, not an
    # inlined array_max: exactly one array_max evaluation site
    assert plan.count("array_max") <= 2, plan


def test_gemm_prep_normalizations_materialize_guarded_inverse(tables):
    """r12 A/B find: a when()-guarded expression consumed inside a
    per-element transform lambda is excluded from codegen subexpression
    elimination, so the O(dim) norm aggregate re-ran per ELEMENT
    (measured 1.38x/1.31x at sf0.1). Pin the fix: both GEMM-prep
    normalizations materialize the guarded inverse behind an
    explode-let Generate and the transform lambda multiplies by the
    materialized _inv attribute — no conditional, no aggregate inside
    any lambda body."""
    import re

    from dbt_schema_builder_spark.operators import similarity

    for name, df, min_gen in [
        (
            "blocked",
            similarity.embedding_near_dup_blocked(
                tables["embeddings"], threshold=0.5, blocks=2
            ),
            2,  # the _inv explode-let + the _n explode-let downstream
        ),
        (
            "ivf_sharded",
            similarity.embedding_near_dup_ivf_sharded(
                tables["embeddings"], threshold=0.5, k_cells=2, nprobe=2
            ),
            1,
        ),
    ]:
        plan = _plan(df)
        assert "_inv" in plan, (name, plan)
        assert plan.count("Generate") >= min_gen, (name, plan)
        # every normalization transform over the embedding must multiply
        # by a materialized attribute: no conditional and no norm
        # aggregate inside ITS lambda body (the Generate's own explode
        # arguments legitimately contain the guarded norm — once)
        tx = [
            plan[m.end():m.end() + 150]
            for m in re.finditer(r"transform\(embedding#\d+, ", plan)
        ]
        assert tx, (name, plan)
        for body in tx:
            assert "CASE WHEN" not in body, (name, body)
            assert "aggregate(" not in body, (name, body)


def test_brute_force_topk_precomputes_norms_per_side(tables):
    """r12: cosine() inlined into the joined projection re-evaluated
    each norm per join PARTNER (the ivf_assign trap), and the zero-norm
    when() excluded them from codegen CSE — 4 norm aggregates per pair.
    Pin the per-side explode-let precompute: exactly the two Generate
    norms' SQRTs in the whole plan (an inline-cosine revert prints 4,
    inside the join projection)."""
    from dbt_schema_builder_spark.operators import similarity

    df = similarity.brute_force_topk(
        tables["embeddings"],
        similarity.queries_from_corpus(tables["embeddings"], 3),
        k=2,
    )
    plan = _plan(df)
    assert plan.count("SQRT") == 2, plan
    assert plan.count("Generate") >= 2, plan


def test_lsh_quantized_topk_broadcasts_queries_only(tables):
    """The corpus flows through one scan into a broadcast bucket join;
    Python appears only as the Arrow-batched signature GEMM."""
    from dbt_schema_builder_spark.operators import similarity

    df = similarity.lsh_quantized_topk(tables["embeddings"])
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan  # no row-at-a-time Python


def test_heavy_hitters_verify_pass_is_candidate_filtered(tables):
    """The exact pass scans with an isin pushdown on the bounded
    candidate set and broadcasts the single-row total."""
    from dbt_schema_builder_spark.operators import relational as rel

    df = rel.heavy_hitters(tables["events"], "event_type", support=0.1)
    plan = _plan(df)
    assert re.search(r"PushedFilters: \[.*In\(event_type", plan), plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_simhash_signature_stage_is_one_zero_shuffle_arrow_pass(tables):
    """r14 signature stage: ONE MapInPandas vote kernel with NO
    exchange between the round-robin doc repartition and the kernel
    (exploded token rows are doc-local by construction — the zero-
    shuffle claim), no row-at-a-time Python, and the pipeline still
    repartitions before the explode so one input file cannot serialize
    the CPU-heavy stage onto one core. The only hashpartitioning
    exchanges left are the banding repartition and the pair
    dropDuplicates."""
    from dbt_schema_builder_spark.operators import dedup

    df = dedup.simhash_near_dup(
        tables["documents"], max_hamming=16, token_hash="portable"
    )
    plan = _plan(df)
    assert "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "RoundRobinPartitioning" in plan, plan
    # THE zero-shuffle claim: the old groupBy(doc_id).agg(60 sums)
    # exchange is gone — no hashpartitioning on doc_id anywhere in the
    # signature pipeline (the remaining hash exchanges are banding on
    # (band, bucket) and the pair dropDuplicates on (doc_a, doc_b))
    assert "hashpartitioning(doc_id" not in plan, plan


def test_bloom_dedup_probe_is_broadcast_only(tables):
    """The Bloom bit table must reach the probe as a broadcast join —
    the batch never shuffles to test membership (that is the operator's
    whole point); the seen corpus appears only in the verify anti-join."""
    from dbt_schema_builder_spark.operators import dedup, text

    docs = tables["documents"]
    seen = text.fingerprint(docs.where(F.col("source").rlike("^src1.*$")))
    new = docs.where(~F.col("source").rlike("^src1.*$"))
    plan = _plan(dedup.incremental_dedup_bloom(new, seen, m_bits=1024))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pq_encode_is_map_only(tables):
    """PQ encode must be a single map pass: Arrow-batched codes over the
    scan with NO exchange — at 100 TB any shuffle here would dominate
    the whole index build."""
    from dbt_schema_builder_spark.operators import similarity

    emb = tables["embeddings"]
    cb = similarity.pq_codebook(emb, subspaces=8, codes=16)
    plan = _plan(similarity.pq_encode(emb, cb))
    assert "ArrowEvalPython" in plan, plan
    assert "Exchange" not in plan, plan


def test_tfidf_pairs_repartitions_on_gram_key_and_broadcasts_dfs(tables):
    """The self-join input must be explicitly hash-partitioned on the
    gram hash (AQE cannot see the quadratic post-join fan-out), and no
    cartesian node may appear."""
    from dbt_schema_builder_spark.operators import dedup

    plan = _plan(dedup.tfidf_ngram_cosine_pairs(tables["documents"]))
    assert re.search(r"hashpartitioning\(gh#", plan), plan
    assert "CartesianProduct" not in plan, plan


def test_ivfpq_single_arrow_pass_no_sort_merge(tables):
    """IVF-PQ's corpus contact: the Arrow encode pass emits
    [cell, codes...] and every join (probes, ADC table, shortlist,
    query vectors) broadcasts — no sort-merge join, no cartesian."""
    from dbt_schema_builder_spark.operators import similarity

    plan = _plan(similarity.ivfpq_topk(tables["embeddings"], n_queries=2, k=3))
    assert "ArrowEvalPython" in plan, plan  # the combined encode pass
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_bm25_single_tokenize_and_no_corpus_window(tables):
    """The posting branches (tf + df) share one tokenize subtree (df is
    a rollup of tf, not a second explode), and the only Window in the
    plan runs AFTER the top-k limit (GlobalLimit above it in the tree,
    never a corpus-sized window partition)."""
    from dbt_schema_builder_spark.operators.text import bm25_search

    df = bm25_search(tables["documents"], ("dup", "join"))
    plan = _plan(df)
    # one Generate (explode) for the posting stream — df derived from tf
    assert len(re.findall(r"\(\d+\) Generate\b", plan)) == 1, plan
    # the global top-k compiles to TakeOrderedAndProject (distributed
    # partial top-k), never a global sort
    assert "TakeOrderedAndProject" in plan, plan
    assert not re.search(r"\(\d+\) Sort\b.*global=true", plan), plan


def test_gapfill_interp_single_window_operator(tables):
    """Both bracketing frame directions (preceding LOCF + following
    next-obs) evaluate in ONE Window operator over one sort — the
    bracket needs no self-join and no second exchange."""
    from dbt_schema_builder_spark.operators.timeseries import (
        gapfill_interpolate,
    )

    plan = _plan(gapfill_interpolate(tables["events"]))
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan
    assert "Join Inner" not in plan.replace("Join LeftOuter", ""), plan


def test_fuzzy_match_joins_signatures_not_records(tables):
    """The levenshtein join input is the distinct-name aggregate (a
    HashAggregate below the join), never the raw part table — the
    signature-first contract."""
    from dbt_schema_builder_spark.operators.relational import (
        fuzzy_match_names,
    )

    plan = _plan(fuzzy_match_names(tables["part"]))
    join_pos = plan.index("SortMergeJoin") if "SortMergeJoin" in plan else plan.index("Join")
    assert "HashAggregate" in plan[:join_pos] or plan.count("HashAggregate") >= 2, plan


def test_knn_broadcasts_queries_not_corpus(tables):
    """The sampled query frame broadcasts; the corpus is never on the
    broadcast side (one corpus scan). r14: the scorer is ONE Arrow
    GEMM pass (ArrowEvalPython + posexplode), not a crossJoin over the
    query list with an interpreted zip_with fold."""
    from dbt_schema_builder_spark.operators.similarity import (
        knn_label_agreement,
    )

    plan = _plan(knn_label_agreement(tables["embeddings"], n_queries=4, k=3))
    assert "BroadcastExchange" in plan, plan
    assert plan.count("Scan parquet") <= 2, plan  # corpus read once (+0 for local rel)
    # formatted plans print each operator in the tree AND the detail
    # section — one ArrowEvalPython node appears twice
    assert plan.count("ArrowEvalPython") == 2, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_transition_matrix_single_user_exchange(tables):
    """Session flag, numbering, and lead all ride one (user_id) hash
    exchange — adding the lead must not re-shuffle."""
    from dbt_schema_builder_spark.operators.timeseries import (
        transition_matrix,
    )

    plan = _plan(transition_matrix(tables["events"]))
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_value_histogram_single_exchange_and_pruned_scan(tables):
    """r5: the histogram is one (group, bin) hash aggregate — exactly
    one Exchange (map-side partials below it), and the scan reads only
    the two columns involved."""
    from dbt_schema_builder_spark.operators.profiling import value_histogram

    plan = _plan(value_histogram(tables["events"]))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    m = re.search(r"ReadSchema: (.*)", plan)
    assert m and "value" in m.group(1) and "event_type" in m.group(1), plan
    assert "props" not in m.group(1), plan  # wide column pruned


def test_gopher_rules_zero_shuffle(tables):
    """The rule battery is pure map-side HOF work: no Exchange, no
    Python, whole-stage codegen."""
    from dbt_schema_builder_spark.operators.text import gopher_quality_rules

    plan = _plan(gopher_quality_rules(tables["documents"]))
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_sigma_outliers_no_python_and_pruned_scan(tables):
    """r5: the k-sigma gate stays JVM-side (integer expressions only)
    and the group aggregate is the only shuffle producer besides the
    join it feeds."""
    from dbt_schema_builder_spark.operators.profiling import sigma_outliers

    plan = _plan(sigma_outliers(tables["events"]))
    assert "Python" not in plan, plan
    m = re.search(r"ReadSchema: (.*)", plan)
    assert m and "props" not in m.group(1), plan


def test_dsir_lm_table_is_cached_not_recomputed(tables):
    """r6: dsir_importance's union-vocab LM table feeds BOTH the totals
    aggregate and the scoring join; unpersisted, the whole count
    pipeline (including the target tokenize) re-ran per consumer —
    one extra parquet scan and Generate in the plan. Pin the persist:
    the final plan reads the LM through InMemoryTableScan and the scan
    count stays at the cached level."""
    from dbt_schema_builder_spark.operators import text

    docs = tables["documents"]
    # hermetic plan: cache entries left by earlier tests substitute
    # InMemoryRelations into matching subtrees and shift every node
    # count (measured: 7 scans isolated, 11 in-suite)
    docs.sparkSession.catalog.clearCache()
    df = text.dsir_importance(docs, docs.where("lang = 'en'"))
    plan = _plan(df)
    assert "InMemoryTableScan" in plan, plan
    # regression level was 8 scans (one full pipeline re-run)
    assert plan.count("Scan parquet") <= 7, plan
    # the 1-row totals fold must not become a shuffled join
    assert "CartesianProduct" not in plan, plan


def test_nb_scores_single_tokenize_and_no_cartesian(tables):
    """r7b: nb_scores' labeled-token frame feeds BOTH the log-odds
    aggregation and the per-doc scoring join; unpersisted, the tokenize
    (Generate) pipeline would re-run per consumer. Pin the persist
    (InMemoryTableScan present) and the textual scan ceiling; the two
    remaining direct parquet reads (labeled + prior) are column-pruned
    doc_id/label scans, not tokenizes. The 1-row prior fold must stay a
    broadcast, never a shuffled/cartesian join."""
    from dbt_schema_builder_spark.operators import classifier

    docs = tables["documents"]
    docs.sparkSession.catalog.clearCache()
    plan = _plan(classifier.nb_scores(docs, label="text LIKE '%dup%'"))
    assert "InMemoryTableScan" in plan, plan
    assert plan.count("Scan parquet") <= 8, plan
    assert "CartesianProduct" not in plan, plan


def test_temperature_mix_broadcasts_solve_back(tables):
    """r7b: the driver-side allocation folds back via a BROADCAST join
    (the waterfill convention — a when-chain would be O(#sources)
    expression depth); the per-source rollup is persisted, not
    recomputed per consumer."""
    from dbt_schema_builder_spark.operators import text

    docs = tables["documents"]
    docs.sparkSession.catalog.clearCache()
    plan = _plan(text.source_mix_temperature(docs, budget_tokens=1000))
    assert "BroadcastHashJoin" in plan, plan
    assert "InMemoryTableScan" in plan, plan
    assert plan.count("Scan parquet") <= 3, plan
    assert "CartesianProduct" not in plan, plan


def test_cluster_diversity_window_is_per_cluster(tables):
    """r7b: the retention rank must run in a window partitioned BY
    CLUSTER (bounded groups), never a corpus-wide single-partition
    sort — pin the hashpartitioning(cluster_id) exchange feeding the
    Window."""
    import re as _re

    from dbt_schema_builder_spark.operators import dedup

    docs = tables["documents"]
    docs.sparkSession.catalog.clearCache()
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=64)
    plan = _plan(dedup.cluster_diversity_sample(docs, pairs, m=2))
    assert _re.search(r"hashpartitioning\(cluster_id", plan), plan
    assert "Window" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_span_stats_shares_one_gram_scan(tables):
    """r8 promotion pin: duplicate_span_stats rolls up the spans frame,
    which itself reads the family's ONE persisted gram scan (the r7
    shared-frame-helper lesson) — pin the persist and the Generate
    (tokenize/posexplode) ceiling, and that the interval-union windows
    stay doc_id-partitioned (never corpus-wide)."""
    import re as _re

    from dbt_schema_builder_spark.operators import dedup

    docs = tables["documents"]
    docs.sparkSession.catalog.clearCache()
    plan = _plan(dedup.duplicate_span_stats(docs, min_len=20))
    assert "InMemoryTableScan" in plan, plan
    assert _re.search(r"hashpartitioning\(doc_id", plan), plan
    assert "CartesianProduct" not in plan, plan
    # measured r8 levels: 5 Generates / 7 scans (the spans frame is
    # read through the persist; a regression to per-consumer tokenize
    # re-runs showed up as +2 of each in the pre-share r7 prototype)
    assert plan.count("Generate") <= 5, plan
    assert plan.count("Scan parquet") <= 7, plan


def test_cut_spans_shares_one_gram_scan(tables):
    import re as _re

    from dbt_schema_builder_spark.operators import dedup

    docs = tables["documents"]
    docs.sparkSession.catalog.clearCache()
    plan = _plan(dedup.cut_duplicate_spans(docs, min_len=20))
    assert "InMemoryTableScan" in plan, plan
    assert _re.search(r"hashpartitioning\(doc_id", plan), plan
    assert "CartesianProduct" not in plan, plan
    # measured r8 levels: 14 Generates / 16 scans across the three
    # stages (spans, protection, cut) — high absolute counts are the
    # operator's documented shape; the pin catches multi-eval creep
    assert plan.count("Generate") <= 14, plan
    assert plan.count("Scan parquet") <= 16, plan


def test_nb_apply_single_tokenize_and_broadcast_model(tables):
    from dbt_schema_builder_spark.operators import classifier

    docs = tables["documents"]
    docs.sparkSession.catalog.clearCache()
    model = classifier.nb_token_logodds(docs, "text LIKE '%dup%'")
    plan = _plan(classifier.nb_apply(model, docs, prior_milli=100))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # 1 tokenize on the scoring side; the other Generates live in the
    # broadcast (vocab-bounded) model subtree
    assert plan.count("Generate") <= 5, plan


def test_hybrid_search_global_topk_and_pruned_postings(tables):
    """r10 (carried r8 #6): the q_hybrid_search plan pin every earlier
    promotion shipped with. Both rankers must reach their top-k via
    TakeOrderedAndProject (distributed top-k, never a single-partition
    corpus window), the raw-tf ranker's query-term filter must sit
    under its aggregation (postings pruned before the shuffle), and the
    1-row corpus stats fold back by broadcast, never a cartesian."""
    from dbt_schema_builder_spark.operators import text

    docs = tables["documents"]
    docs.sparkSession.catalog.clearCache()
    plan = _plan(text.hybrid_search(docs, ("data", "dup"), topk=20))
    # one distributed top-k per ranker (formatted plans print each op
    # twice: tree + detail section, hence the 2x counts)
    assert plan.count("TakeOrderedAndProject") == 4, plan
    assert "CartesianProduct" not in plan, plan
    # row_number windows run over the <=topk TakeOrdered survivors:
    # 3 windows total — 2 per-ranker ranks + 1 fused rank
    assert plan.count("+- Window") == 3, plan
    # tokenize passes stay bounded (2 real + broadcast-subtree reprints)
    assert plan.count("Generate") <= 8, plan
