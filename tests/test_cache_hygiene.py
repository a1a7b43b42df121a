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


def _baseline(spark) -> int:
    """Cached-block count after clearing everything clearable.

    NOT asserted to be zero: ``localCheckpoint(eager=True)`` blocks
    from earlier tests in the session (pagerank, dedup_clusters, ...)
    sit in getPersistentRDDs() until the JVM's ContextCleaner GCs the
    lineage that holds them — neither clearCache() nor
    release_caches() can touch blocks backing a live plan, so an
    absolute ==0 assertion is GC-timing flaky (it failed only when the
    pagerank property test ran first). The r6-verdict contract is "no
    NET-new cached blocks after operators release", so every assertion
    below is baseline-relative.
    """
    spark.catalog.clearCache()
    release_caches()
    # settle the floor: drop Python refs, ask the JVM to GC so the
    # ContextCleaner enqueues any now-unreferenced checkpoint blocks,
    # and give its async drain a moment — otherwise a lingering block
    # could vanish MID-test and shift a relative count
    import gc
    import time

    gc.collect()
    spark.sparkContext._jvm.System.gc()
    for _ in range(20):
        n = _n_cached(spark)
        time.sleep(0.25)
        if _n_cached(spark) == n:
            break
    return _n_cached(spark)


def test_release_caches_clears_operator_persists(spark, tables):
    before = _baseline(spark)
    docs = tables["documents"]
    # three representative multi-consumer operators, materialized
    dedup.jaccard_prefix_pairs(docs, n=3, threshold=0.8).collect()
    text.dsir_importance(docs, docs.where("lang = 'en'")).collect()
    dedup.minhash_lsh_candidates(docs).collect()
    assert _n_cached(spark) > before, (
        "expected tracked persisted blocks after operator runs — "
        "did a refactor bypass track_persist?"
    )
    released = release_caches()
    assert released > 0
    assert _n_cached(spark) <= before, "release_caches left cached blocks"


def test_release_caches_leaves_caller_caches_alone(spark, tables):
    before = _baseline(spark)
    mine = tables["region"].select("r_regionkey").persist()
    mine.count()
    assert _n_cached(spark) == before + 1
    docs = tables["documents"]
    dedup.jaccard_prefix_pairs(docs, n=3, threshold=0.8).collect()
    release_caches()
    # the operator's blocks are gone, the caller's survive
    assert _n_cached(spark) == before + 1
    mine.unpersist()
    assert _n_cached(spark) == before


def test_track_persist_is_idempotent_after_session_reuse(spark, tables):
    """Double release is a no-op (the registry clears on release)."""
    docs = tables["documents"]
    df = track_persist(docs.select("doc_id"))
    df.count()
    assert release_caches() >= 1
    assert release_caches() == 0
