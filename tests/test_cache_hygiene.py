"""Operator cache-hygiene contract (r6 verdict "what's wrong" #1).

Operators persist() subtrees their returned (lazy) plan consumes more
than once, so they cannot unpersist before returning — the session
contract is that every such persist is registered via
``session.track_persist`` and the consumer calls
``session.release_caches`` after materializing. These tests pin both
halves: representative operators DO leave tracked blocks behind (the
registration isn't silently bypassed), and release_caches() returns the
session to zero cached blocks without touching anything else.
"""

from pyspark.sql import functions as F

from dbt_schema_builder_spark.operators import dedup, similarity, text
from dbt_schema_builder_spark.session import release_caches, track_persist


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_release_caches_clears_operator_persists(spark, tables):
    spark.catalog.clearCache()
    release_caches()
    assert _n_cached(spark) == 0
    docs = tables["documents"]
    # three representative multi-consumer operators, materialized
    dedup.jaccard_prefix_pairs(docs, n=3, threshold=0.8).collect()
    text.dsir_importance(docs, docs.where("lang = 'en'")).collect()
    dedup.minhash_lsh_candidates(docs).collect()
    assert _n_cached(spark) > 0, (
        "expected tracked persisted blocks after operator runs — "
        "did a refactor bypass track_persist?"
    )
    released = release_caches()
    assert released > 0
    assert _n_cached(spark) == 0, "release_caches left cached blocks"


def test_release_caches_leaves_caller_caches_alone(spark, tables):
    spark.catalog.clearCache()
    release_caches()
    mine = tables["region"].select("r_regionkey").persist()
    mine.count()
    assert _n_cached(spark) == 1
    docs = tables["documents"]
    dedup.jaccard_prefix_pairs(docs, n=3, threshold=0.8).collect()
    release_caches()
    # the operator's blocks are gone, the caller's survive
    assert _n_cached(spark) == 1
    mine.unpersist()
    assert _n_cached(spark) == 0


def test_track_persist_is_idempotent_after_session_reuse(spark, tables):
    """Double release is a no-op (the registry clears on release)."""
    docs = tables["documents"]
    df = track_persist(docs.select("doc_id"))
    df.count()
    assert release_caches() >= 1
    assert release_caches() == 0
