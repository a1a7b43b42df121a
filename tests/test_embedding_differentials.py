"""r10: random EMBEDDINGS-frame differentials — shrinking the coverage
audit's embedding category. Vector components are dyadic grid values
(k/1024: exact in BOTH float32 — the fixture's storage type — and
float64), so Spark's float->double casts and DuckDB's doubles see the
same numbers; everything downstream is either integer-exact (the
quantization/centroid fixed-point kernels) or the identical sequential
float ops the fixture's full-precision driver hash already pins.

The frame (binary payload) keys ride the documents table with the
ASCII word pool their oracle's value-safety note requires."""

import __spark_entry__ as entry
from hypothesis import given, settings, strategies as st

from dbt_schema_builder_spark.operators import similarity

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"
DIM = 8

components = st.integers(min_value=-2048, max_value=2048)
# r11: zero-norm shapes UN-GATED (the guard swap landed) — vectors may
# be all-zero, and mirrored pairs under one label cancel the
# fixed-point centroid mean exactly (the zero-CENTROID shape the r10
# run of this harness found). The zero branch is explicit so
# hypothesis hits it every run, not once per 2048^8.
nonzero_vectors = st.tuples(
    st.integers(min_value=1, max_value=2048),
    st.lists(components, min_size=DIM - 1, max_size=DIM - 1),
).map(lambda t: [t[0]] + t[1])
vectors = st.one_of(
    nonzero_vectors,
    st.just([0] * DIM),
    st.lists(components, min_size=DIM, max_size=DIM),
)
_base_rows = st.lists(
    st.tuples(vectors, st.integers(min_value=0, max_value=2)),
    min_size=2,
    max_size=10,
)
# optionally append the exact NEGATION of row 0 under row 0's label:
# the two cancel to a zero centroid when they are the label's only
# members — reachable-zero-centroid coverage on demand
emb_rows = st.tuples(_base_rows, st.booleans()).map(
    lambda t: t[0] + [([-c for c in t[0][0][0]], t[0][0][1])]
    if t[1]
    else t[0]
)


def _emb_frames(spark, rows):
    import duckdb
    import pandas as pd

    data = [
        (i, [k / 1024 for k in vec], lab)
        for i, (vec, lab) in enumerate(rows)
    ]
    emb = spark.createDataFrame(data, EMB_SCHEMA)
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": [r[0] for r in data],
                "embedding": [r[1] for r in data],
                "label": [r[2] for r in data],
            }
        ),
    )
    return emb, con


def _emb_check(spark, rows, oracle, op):
    emb, con = _emb_frames(spark, rows)
    got = {tuple(r) for r in op(emb).collect()}
    want = {tuple(r) for r in con.execute(oracle).fetchall()}
    assert got == want, got ^ want


@settings(max_examples=8, deadline=None)
@given(rows=emb_rows)
def test_topk_similarity_oracle_on_random_embeddings(spark, rows):
    """Brute-force cosine top-k incl. corpora smaller than the query
    set (LIMIT 5 of 2)."""
    _emb_check(
        spark,
        rows,
        entry.oracle_sql()["q_topk_similarity"],
        lambda emb: similarity.brute_force_topk(
            emb, similarity.queries_from_corpus(emb, 5), k=5
        ),
    )


@settings(max_examples=8, deadline=None)
@given(rows=emb_rows)
def test_quantize_embeddings_oracle_on_random_embeddings(spark, rows):
    """Int8 scalar quantization: dyadic components make the 127/maxabs
    scale and every rounded element engine-exact."""
    from pyspark.sql import functions as F

    def op(emb):
        q = similarity.quantize_embeddings(emb)
        return q.select(
            "vec_id",
            F.md5(
                F.array_join(F.col("qvec").cast("array<string>"), ",")
            ).alias("qvec_md5"),
            "q_scale",
            "q_sqnorm",
        )

    _emb_check(
        spark, rows, entry.oracle_sql()["q_quantize_embeddings"], op
    )


@settings(max_examples=8, deadline=None)
@given(rows=emb_rows)
def test_quantized_topk_oracle_on_random_embeddings(spark, rows):
    _emb_check(
        spark,
        rows,
        entry.oracle_sql()["q_quantized_topk"],
        lambda emb: similarity.quantized_topk(
            emb, similarity.queries_from_corpus(emb, 5), k=5
        ),
    )


@settings(max_examples=8, deadline=None)
@given(rows=emb_rows)
def test_centroid_by_label_oracle_on_random_embeddings(spark, rows):
    """Fixed-point centroid means on tiny label groups (n=1 centroids
    equal their vector; tie-prone small denominators)."""
    from pyspark.sql import functions as F

    _emb_check(
        spark,
        rows,
        entry.oracle_sql()["q_centroid_by_label"],
        lambda emb: similarity.centroid_by_label(emb).select(
            "label", (F.col("pos") + 1).alias("pos"), "avg_val"
        ),
    )


@settings(max_examples=8, deadline=None)
@given(rows=emb_rows)
def test_centroid_outliers_oracle_on_random_embeddings(spark, rows):
    """The r8 tie-fix surface (_det_avg_round4 family) at random
    label groups, incl. singleton groups (self-centroid, sim 1)."""
    _emb_check(
        spark,
        rows,
        entry.oracle_sql()["q_centroid_outliers"],
        similarity.centroid_outliers,
    )


@settings(max_examples=10, deadline=None)
@given(rows=emb_rows)
def test_embedding_near_dup_oracle_on_margin_gated_embeddings(spark, rows):
    """The blocked-GEMM near-dup was differential-EXEMPT: BLAS-order
    sums can flip a >=threshold compare or a ROUND(.,4) digit when the
    exact cosine sits ON a boundary. Gate the examples instead of
    skipping the key: discard corpora where ANY pair's float64 cosine
    is within 1e-6 of the 0.5 threshold or of a 4-decimal rounding
    boundary. Reassociation differences are ~1e-15 — nine orders below
    the gate — so every surviving example must match the all-pairs
    DuckDB oracle EXACTLY, ROUND surface included."""
    import numpy as np
    from hypothesis import assume

    X = np.array(
        [[k / 1024 for k in vec] for vec, _ in rows], dtype=np.float64
    )
    # zero-norm rows normalize to the zero vector (sims exactly 0.0 on
    # both engines after the r11 guard) instead of NaN-poisoning the
    # gate — zero shapes stay UN-gated
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    nrm = X / np.where(norms == 0, 1.0, norms)
    sims = (nrm @ nrm.T)[np.triu_indices(len(rows), 1)]
    assume(np.all(np.abs(sims - 0.5) > 1e-6))
    d = sims * 1e4
    assume(np.all(np.abs(d - np.floor(d) - 0.5) > 1e-2))
    _emb_check(
        spark,
        rows,
        entry.oracle_sql()["q_embedding_near_dup"],
        lambda emb: similarity.embedding_near_dup(emb, threshold=0.5),
    )


@settings(max_examples=10, deadline=None)
@given(rows=emb_rows)
def test_ivf_assign_oracle_on_margin_gated_embeddings(spark, rows):
    """The IVF coarse-assignment key was differential-EXEMPT: the
    oracle ranks by DuckDB's list_cosine_similarity while Spark ranks
    by the Catalyst HOF cosine (different float expression forms), so
    they can disagree only at near-ties between centroids. Gate the
    examples: every vector's best-vs-second centroid cosine gap must
    exceed 1e-6 (expression-form noise is ~1e-15). Surviving examples
    have a unique argmax both engines must agree on — the surface is
    pure integer ids."""
    import numpy as np
    from hypothesis import assume

    from pyspark.sql import functions as F

    X = np.array(
        [[k / 1024 for k in vec] for vec, _ in rows], dtype=np.float64
    )
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    n_all = X / np.where(norms == 0, 1.0, norms)  # zero rows -> zero vecs
    # centroids = the 16 largest vec_ids (enumeration order = vec_id)
    cent = n_all[max(0, len(rows) - 16):]
    sims = n_all @ cent.T
    # zero-norm entries are EXACT 0.0 literals on both engines (the
    # guard branch), immune to expression-form noise — so the argmax
    # gap gate applies only when a COMPUTED sim is in contention:
    # accept if the winner's margin exceeds 1e-6, or if every entry
    # within 1e-6 of the winner is a guarded-exact zero
    zrow = norms.flatten() == 0
    zcent = zrow[max(0, len(rows) - 16):]
    exact = zrow[:, None] | zcent[None, :]
    if sims.shape[1] > 1:
        for i in range(sims.shape[0]):
            v1 = sims[i].max()
            near = sims[i] >= v1 - 1e-6
            assume(near.sum() == 1 or bool(np.all(exact[i][near])))

    def op(emb):
        from dbt_schema_builder_spark.operators import similarity as sim

        centroids = (
            emb.orderBy(F.col("vec_id").desc())
            .limit(16)
            .select(
                F.col("vec_id").alias("centroid_id"),
                F.col("embedding").alias("centroid_vec"),
            )
        )
        return sim.ivf_assign(emb, centroids).select("vec_id", "centroid_id")

    _emb_check(spark, rows, entry.oracle_sql()["q_ivf_topk"], op)
