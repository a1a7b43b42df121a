"""Unit tests for the learned quality filter (classifier.nb_*) and the
r8-staged mixing/sampling operators (source_mix_temperature,
cluster_diversity_sample). Differential tests against the SQL oracle
generators live in test_llm_ops_properties.py; these pin behaviour and
edge semantics."""

import math

import pytest

from pyspark.sql import functions as F

from dbt_schema_builder_spark.operators import classifier, dedup, text

DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [
            (i, t, lang, src, len(t))
            for i, (t, lang, src) in enumerate(rows)
        ],
        DOC_SCHEMA,
    )


# ---------------------------------------------------------------- NB filter


def test_nb_learns_text_derived_label_on_fixture(tables):
    """The one text-derived signal the synthetic corpus has: docs
    containing 'dup'. NB must separate it essentially perfectly (the
    'dup' token's log-odds dwarfs the shared-vocabulary noise); lang
    and source are text-independent there, so they are NOT used."""
    scored = classifier.nb_scores(
        tables["documents"], label="text LIKE '%dup%'"
    )
    agg = scored.agg(
        F.sum("correct").alias("ok"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert agg["n"] > 0
    assert agg["ok"] / agg["n"] >= 0.99


def test_nb_scores_every_doc_and_tokenless_docs_score_the_prior(spark):
    rows = [
        ("good doc with signal", "en", "s"),
        ("plain filler text here", "en", "s"),
        ("", "en", "s"),
        ("   ", "en", "s"),
    ]
    docs = _docs(spark, rows)
    out = {
        r.doc_id: r
        for r in classifier.nb_scores(
            docs, label="text LIKE '%signal%'"
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    # token-less docs: n_tokens 0, score == prior (identical for both)
    assert out[2].n_tokens == 0 and out[3].n_tokens == 0
    assert out[2].score_milli == out[3].score_milli
    # prior here is ln(2) - ln(4) < 0 -> predict negative
    assert out[2].pred == -1
    # the labeled doc must outscore the token-less ones
    assert out[0].score_milli > out[2].score_milli


def test_nb_pred_and_correct_are_consistent_with_score(tables):
    rows = classifier.nb_scores(
        tables["documents"], label="text LIKE '%dup%'"
    ).collect()
    for r in rows:
        assert r.pred == (1 if r.score_milli > 0 else -1)
        assert r.correct == (1 if r.y == r.pred else 0)
        assert r.y in (1, -1)


def test_nb_scores_are_partitioning_independent(tables):
    docs = tables["documents"]
    base = {
        tuple(r)
        for r in classifier.nb_scores(
            docs, label="text LIKE '%dup%'"
        ).collect()
    }
    shuffled = {
        tuple(r)
        for r in classifier.nb_scores(
            docs.repartition(7), label="text LIKE '%dup%'"
        ).collect()
    }
    assert base == shuffled


def test_nb_logodds_table_is_vocab_sized_and_integer(tables):
    lm = classifier.nb_token_logodds(
        tables["documents"], label="text LIKE '%dup%'"
    ).collect()
    toks = {r.token for r in lm}
    assert len(lm) == len(toks)  # one row per distinct token
    dup_row = [r for r in lm if r.token == "dup"]
    assert dup_row and dup_row[0].c_neg == 0  # label is derived from it
    assert dup_row[0].logodds_milli > 0
    for r in lm:
        assert r.c_pos >= 0 and r.c_neg >= 0


# ------------------------------------------------- nb_apply (train/apply)


def test_nb_apply_on_training_frame_reproduces_nb_scores(tables):
    """The exactness pin for the apply half: scoring the TRAINING frame
    against its own frozen model + prior must reproduce nb_scores'
    surfaces exactly (and every training token is in-vocab)."""
    docs = tables["documents"]
    label = "text LIKE '%dup%'"
    model = classifier.nb_token_logodds(docs, label)
    prior = classifier.nb_prior_milli(docs, label)
    applied = {
        r.doc_id: r
        for r in classifier.nb_apply(model, docs, prior_milli=prior)
        .collect()
    }
    trained = {
        r.doc_id: r for r in classifier.nb_scores(docs, label).collect()
    }
    assert set(applied) == set(trained)
    for doc_id, t in trained.items():
        a = applied[doc_id]
        assert a.score_milli == t.score_milli
        assert a.pred == t.pred
        assert a.n_tokens == t.n_tokens
        assert a.n_in_vocab == a.n_tokens  # self-apply: no OOV possible


def test_nb_apply_heldout_split_scores_all_docs_and_oov_is_neutral(spark):
    """Train on the md5 hash_split train slice, score the held-out
    slice: every held-out doc gets a row, OOV tokens contribute 0
    (n_in_vocab < n_tokens when the held-out doc has unseen tokens),
    and a fully-OOV doc scores exactly the training prior."""
    rows = (
        [("signal common words here", "en", "s")] * 6
        + [("plain common words here", "en", "s")] * 6
        + [("zzz qqq xxx", "en", "s")]  # tokens absent from any model
    )
    docs = _docs(spark, rows)
    label = "text LIKE '%signal%'"
    split = text.hash_split(docs)
    train_ids = {
        r.doc_id for r in split.where("split = 'train'").collect()
    }
    train = docs.where(F.col("doc_id").isin(*train_ids))
    held = docs.where(~F.col("doc_id").isin(*train_ids))
    model = classifier.nb_token_logodds(train, label)
    prior = classifier.nb_prior_milli(train, label)
    out = {
        r.doc_id: r
        for r in classifier.nb_apply(
            model, held, prior_milli=prior
        ).collect()
    }
    held_ids = {r.doc_id for r in held.select("doc_id").collect()}
    assert set(out) == held_ids and held_ids
    for r in out.values():
        assert r.n_in_vocab <= r.n_tokens
        assert r.pred == (1 if r.score_milli > 0 else -1)
    if 12 in out:  # the all-OOV doc, when the md5 split holds it out
        vocab = {r.token for r in model.collect()}
        assert "zzz" not in vocab
        assert out[12].n_in_vocab == 0
        assert out[12].score_milli == prior


def test_nb_apply_default_prior_is_pure_evidence(spark):
    docs = _docs(spark, [("signal a", "en", "s"), ("b c", "en", "s")])
    model = classifier.nb_token_logodds(docs, "text LIKE '%signal%'")
    out = {
        r.doc_id: r for r in classifier.nb_apply(model, docs).collect()
    }
    # doc 1 shares no token with doc 0; with prior 0 its score is the
    # sum of its own tokens' log-odds only
    lm = {r.token: r.logodds_milli for r in model.collect()}
    assert out[1].score_milli == lm["b"] + lm["c"]


# ------------------------------------------------- temperature source mix


def test_temperature_mix_spends_budget_exactly(tables):
    out = text.source_mix_temperature(
        tables["documents"], budget_tokens=99_991
    ).collect()
    assert sum(r.alloc_tokens for r in out) == 99_991
    for r in out:
        assert r.weight_isqrt == math.isqrt(r.n_tokens)


def test_temperature_mix_flattens_relative_to_proportional(spark):
    """The point of temperature sampling: the small source's share of
    the budget must EXCEED its share of the corpus (and the large
    source's must shrink)."""
    rows = [("w " * 400, "en", "big")] * 10 + [("w " * 10, "en", "small")]
    docs = _docs(spark, rows)
    out = {
        r.source: r
        for r in text.source_mix_temperature(
            docs, budget_tokens=10_000
        ).collect()
    }
    total = sum(r.n_tokens for r in out.values())
    small = out["small"]
    assert small.alloc_tokens / 10_000 > small.n_tokens / total
    big = out["big"]
    assert big.alloc_tokens / 10_000 < big.n_tokens / total


def test_temperature_mix_rejects_negative_budget_and_null_group(spark):
    docs = _docs(spark, [("a b", "en", "s")])
    with pytest.raises(ValueError, match="budget_tokens"):
        text.source_mix_temperature(docs, budget_tokens=-1)
    nulled = docs.withColumn(
        "source", F.lit(None).cast("string")
    )
    with pytest.raises(ValueError, match="NULL"):
        text.source_mix_temperature(nulled, budget_tokens=10)


def test_temperature_mix_upsamples_past_holdings(spark):
    """Unlike waterfill, quotas may exceed a source's tokens — that is
    the multilingual upsampling semantics, surfaced in
    upsample_milli > 1000."""
    rows = [("w " * 1000, "en", "big"), ("tiny doc", "en", "small")]
    out = {
        r.source: r
        for r in text.source_mix_temperature(
            _docs(spark, rows), budget_tokens=100_000
        ).collect()
    }
    assert out["small"].alloc_tokens > out["small"].n_tokens
    assert out["small"].upsample_milli > 1000


# ------------------------------------------------ cluster diversity sample


def test_cluster_diversity_m1_matches_keep_canonical(tables):
    docs = tables["documents"]
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=64)
    kept_m1 = {
        r.doc_id
        for r in dedup.cluster_diversity_sample(docs, pairs, m=1)
        .where("kept = 1")
        .collect()
    }
    canon = {
        r.doc_id
        for r in dedup.keep_canonical(docs, pairs)
        .where("action = 'keep'")
        .collect()
    }
    # same cluster structure; m=1 keeps the LONGEST member while
    # keep_canonical keeps the MIN doc_id — counts must agree even
    # when the chosen representative differs
    assert len(kept_m1) == len(canon)


def test_cluster_diversity_rank_and_kept_invariants(tables):
    docs = tables["documents"]
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=64)
    rows = dedup.cluster_diversity_sample(docs, pairs, m=2).collect()
    assert len(rows) == docs.count()  # every doc is ranked
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
        assert r.kept == (1 if r.rank_in_cluster <= 2 else 0)
    for members in by_cluster.values():
        ranks = sorted(m.rank_in_cluster for m in members)
        assert ranks == list(range(1, len(members) + 1))
        # longest-first within the cluster
        ordered = sorted(
            members, key=lambda m: (-m.n_tokens, m.doc_id)
        )
        for want_rank, m in enumerate(ordered, start=1):
            assert m.rank_in_cluster == want_rank


def test_cluster_diversity_rejects_bad_m(tables):
    docs = tables["documents"]
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=64)
    with pytest.raises(ValueError, match="m must be >= 1"):
        dedup.cluster_diversity_sample(docs, pairs, m=0)
