"""Edge-input robustness: operators must handle empty inputs and
degenerate documents (shorter than the shingle size) without crashing or
fabricating rows — guards the sequence(1,0)-counts-down pitfall."""

from pyspark.sql import functions as F

from dbt_schema_builder_spark.operators import dedup, similarity, text, timeseries


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )


def test_short_docs_produce_no_shingles(spark):
    docs = _docs(spark, [(1, "one two", "en", "s", 7), (2, "one", "en", "s", 3)])
    assert dedup.shingle_sets(docs, n=3).count() == 0
    assert dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.0).count() == 0


def test_winnowing_short_doc_empty(spark):
    docs = _docs(spark, [(1, "a b c", "en", "s", 5)])  # < k+window-1 tokens
    assert text.winnowing_fingerprints(docs, k=5, window=4).count() == 0


def test_winnowing_shared_substring_shares_fingerprint(spark, tables):
    base = tables["documents"].limit(1).collect()[0]
    # two docs sharing a long substring must share >= 1 fingerprint
    shared = " ".join(base.text.split()[:12])
    docs = _docs(
        spark,
        [
            (1, shared + " tail one two", "en", "s", 1),
            (2, "head zero " + shared, "en", "s", 1),
        ],
    )
    fp = text.winnowing_fingerprints(docs, k=5, window=4)
    a = {r.fingerprint for r in fp.where("doc_id = 1").collect()}
    b = {r.fingerprint for r in fp.where("doc_id = 2").collect()}
    assert a & b


def test_empty_input_through_operators(spark, tables):
    empty_docs = tables["documents"].where("doc_id < 0")
    assert dedup.exact_dedup(empty_docs).count() == 0
    assert dedup.minhash_lsh_candidates(empty_docs).count() == 0
    assert text.quality_score(empty_docs).count() == 0
    empty_events = tables["events"].where("event_id < 0")
    assert timeseries.sessionize(empty_events).count() == 0
    assert timeseries.tumbling_window_stats(empty_events).count() == 0


def test_kmeans_converges_to_stable_assignment(spark, tables):
    emb = tables["embeddings"]
    out = similarity.kmeans(emb, k=4, iterations=2)
    assert out.count() == emb.count()  # every vector assigned
    assert out.select("centroid_id").distinct().count() <= 4
    # deterministic across runs
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, similarity.kmeans(emb, k=4, iterations=2).collect()))
    assert a == b


def test_centroid_by_label_shape(spark, tables):
    emb = tables["embeddings"]
    dim = len(emb.first().embedding)
    n_labels = emb.select("label").distinct().count()
    out = similarity.centroid_by_label(emb)
    assert out.count() == dim * n_labels
    assert out.groupBy("label").count().select(F.min("count")).first()[0] == dim
