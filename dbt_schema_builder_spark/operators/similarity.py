"""Similarity search over the embeddings table (SURVEY.md B3 and the
north-star ANN ops): brute-force cosine top-k as the exact baseline, plus
two scale paths — random-hyperplane LSH bucketing and an IVF-style
coarse-quantizer partition.

Scale design:

- the dot product / norm math is `zip_with` + `aggregate` over the array
  column — JVM-side, no Python, no UDF
- brute force broadcasts the (small) query set against the corpus: one
  scan, no shuffle of the corpus; per-query top-k via window over the
  query id. Exact, O(n_queries * n_corpus) — the correctness oracle
- hyperplane LSH gives each vector a b-bit sign signature from fixed
  (seeded, driver-generated) hyperplanes; candidate pairs share a
  signature bucket, so the join is bucket-local. Recall is tunable with
  multiple tables/bands
- IVF assigns each vector to its nearest coarse centroid; queries probe
  only their own cell (nprobe=1 here). At 100 TB the corpus would be
  written bucketed/partitioned by cell id so a probe is partition-pruned
  to one partition — the Spark-native layout for ANN
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import track_persist
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float/double> columns,
    entirely in Catalyst expressions. Zero-norm operands score 0.0 (a
    zero vector has no direction — neither similar nor dissimilar, the
    convention ANN libraries use) instead of crashing an ANSI-mode job
    with DIVIDE_BY_ZERO — the r10 embedding-differential find, swapped
    in r11: a zero CENTROID is reachable from nonzero inputs (opposite
    vectors under one label cancel the fixed-point mean exactly).

    Oracle note: DuckDB's list_cosine_similarity CLAMPS zero-norm
    results to -1.0 (measured r11, any shape incl. zero-zero), so
    threshold-filtered consumers (near-dup pair miners at thr > 0)
    agree with unguarded oracles by exclusion on both sides, while
    consumers that EMIT or RANK the value carry an explicit
    CASE WHEN list_sum(squares) = 0 guard — that predicate is exactly
    this ``na == 0`` (same float squares, nonneg sum)."""
    na, nb = _norm(a), _norm(b)
    return F.when((na == F.lit(0.0)) | (nb == F.lit(0.0)), F.lit(0.0)).otherwise(
        _dot(a, b) / (na * nb)
    )


# r11: the staged guarded twin became the one definition; the alias
# stays for callers/tests that adopted the explicit name during staging.
cosine_safe = cosine


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    round_to: int | None = 4,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query vectors against the corpus,
    rank per query with a deterministic tie-break on vec_id.

    ``queries`` needs columns (query_id, query_vec). The corpus is scanned
    once; no corpus shuffle — only the per-query top-k window, whose input
    is already reduced to scored rows.

    Norms are materialized PER SIDE behind explode-let Generates before
    the join (r12): inlining cosine() into the joined projection
    re-evaluated each norm per join PARTNER (the ivf_assign trap), and
    the r11 zero-norm when() additionally excluded them from codegen CSE
    — up to 4 norm aggregates per pair instead of 0. The float sequence
    is unchanged (dot, then qn*en, then divide — the same order
    cosine() uses), so every emitted sim is bit-identical and the green
    oracles replay untouched.
    """
    emb_n = embeddings.select(
        "vec_id",
        "embedding",
        F.explode(F.array(_norm(F.col("embedding")))).alias("_en"),
    )
    q_n = queries.select(
        "query_id",
        "query_vec",
        F.explode(F.array(_norm(F.col("query_vec")))).alias("_qn"),
    )
    scored = emb_n.join(F.broadcast(q_n)).select(
        "query_id",
        "vec_id",
        F.when(
            (F.col("_qn") == F.lit(0.0)) | (F.col("_en") == F.lit(0.0)),
            F.lit(0.0),
        )
        .otherwise(
            _dot(F.col("query_vec"), F.col("embedding"))
            / (F.col("_qn") * F.col("_en"))
        )
        .alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    out = scored.select(
        "query_id", "vec_id", "sim", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= k)
    if round_to is not None:
        out = out.select(
            "query_id",
            "vec_id",
            # + 0.0 folds IEEE -0.0 from rounding tiny negative sims.
            # Tie-class bound (r10 sweep): sim is a sqrt-normalized
            # float cosine, so a cross-engine ROUND divergence needs
            # its shortest decimal repr to be an exact 4-decimal half
            # — a <=5-digit repr, measure ~0 for transcendental-derived
            # doubles (unlike int/int rationals, which were retired).
            # Both engines round the SAME double (oracles replay the
            # identical sequential float ops), so this is the only
            # residual mechanism.
            (F.round("sim", round_to) + F.lit(0.0)).alias("sim"),
            "rank",
        )
    return out


def queries_from_corpus(embeddings: DataFrame, n: int = 5) -> DataFrame:
    """Deterministic query set: the n smallest vec_ids from the corpus."""
    return (
        embeddings.orderBy("vec_id")
        .limit(n)
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Fixed random hyperplanes, generated driver-side with a seeded RNG
    and baked into the plan as literals (deterministic across runs)."""
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).tolist()


def hyperplane_signature(
    vec: Column, planes: list[list[float]]
) -> Column:
    """b-bit sign signature: bit i = sign(<v, h_i>). Returns a long.

    Each plane is ONE array-literal expression node (F.lit(list)), not
    dim separate literals — with many planes/tables the difference is
    thousands of plan nodes, which showed up as whole seconds of
    Catalyst analysis time per query build."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = _dot(vec, F.lit([float(x) for x in plane]))
        sig = sig.bitwiseOR(
            F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    # Dim-mismatch guard: zip_with pads the shorter side with NULLs, so
    # a wrong `dim` would NULL every dot and silently collapse ALL rows
    # into bucket 0 (quadratic candidates, wrong neighbors). The error
    # must live in its OWN branch — when(c, sig).otherwise(sig) gets
    # collapsed by SimplifyConditionals, deleting the check entirely.
    # A NULL embedding propagates a NULL signature (r11 ADVICE fix:
    # F.size(NULL) previously fell through to raise_error with a
    # NULL-concat message, losing the remediation text AND violating
    # the pure-Catalyst-paths-propagate-SQL-NULLs convention; NULL
    # buckets join nothing, so NULL rows drop from candidate gen the
    # same way they drop from every other Catalyst expression here).
    d = len(planes[0]) if planes else 0
    return (
        F.when(vec.isNull(), F.lit(None).cast("long"))
        .when(F.size(vec) == F.lit(d), sig)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("hyperplane_signature: embedding dim "),
                    F.size(vec).cast("string"),
                    F.lit(f" != plane dim {d} — pass dim=<your embedding dim>"),
                )
            ).cast("long")
        )
    )


def _check_gemm_dim(M, P, op: str) -> None:
    """Executor-side dim guard for the Arrow GEMM kernels: a mismatched
    `dim` otherwise dies in a cryptic gufunc core-dimension error (and
    the Catalyst fallback would silently bucket everything together —
    see hyperplane_signature's guard)."""
    if M.shape[1] != P.shape[0]:
        raise ValueError(
            f"{op}: embedding dim {M.shape[1]} != configured dim "
            f"{P.shape[0]} — pass dim={M.shape[1]}"
        )


def _reject_null_vectors(s, op: str) -> None:
    """Arrow kernels cannot propagate SQL NULLs the way the Catalyst
    twins do — np.vstack over a None entry dies in a cryptic NoneType
    error deep in the executor. Reject loudly with the remediation
    instead (r10 degenerate-probe find)."""
    if s.isna().any():
        raise ValueError(
            f"{op}: NULL embedding in batch — filter nulls upstream, "
            'e.g. .where("embedding IS NOT NULL")'
        )


def _require_non_null(rows, cols, op: str):
    """Driver-side sampling (codebooks, query sets) indexes collected
    rows directly; a NULL embedding/label there raised bare NoneType
    TypeErrors (r10 degenerate-probe find)."""
    for r in rows:
        for c in cols:
            if r[c] is None:
                raise ValueError(
                    f"{op}: NULL {c} among the sampled rows — filter "
                    "nulls upstream before sampling queries/codebooks"
                )
    return rows


def _vectorized_signature(planes: list[list[float]]):
    """Arrow-batched hyperplane signature: one numpy GEMM per batch
    ((N x dim) @ (dim x bits)), sign bits packed into a long. Semantically
    identical to ``hyperplane_signature`` (same float64 dots; a flip would
    need a dot within GEMM-reassociation distance of exactly 0) but ~3x
    faster — the Catalyst HOF form pays interpreted-lambda cost per
    element, which for signature math (bits x dim ops per row) dominates
    the whole query. This is the embedding_near_dup_blocked precedent:
    dense linear algebra is the one place pandas beats codegen."""
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype="float64").T  # dim x bits
    weights = (1 << np.arange(P.shape[1])).astype("int64")

    @pandas_udf("long")
    def sig(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int64")
        _reject_null_vectors(v, "hyperplane signature")
        M = np.vstack(v.to_numpy()).astype("float64")
        _check_gemm_dim(M, P, "hyperplane signature")
        return pd.Series(((M @ P) > 0) @ weights)

    return sig


def _vectorized_table_buckets(
    planes: list[list[float]], bits: int, tables: int
):
    """Per-table LSH buckets for all tables from one Arrow-batched GEMM:
    (N x dim) @ (dim x bits*tables) sign bits, reshaped (N, tables, bits)
    and bit-packed per table. Same float64 dots as the per-table
    ``hyperplane_signature`` composition, ~an order of magnitude cheaper
    than bits*tables interpreted HOF dot products per row."""
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype="float64").T  # dim x (bits*tables)
    weights = (1 << np.arange(bits)).astype("int64")

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        _reject_null_vectors(v, "LSH table buckets")
        M = np.vstack(v.to_numpy()).astype("float64")
        _check_gemm_dim(M, P, "LSH table buckets")
        signs = (M @ P) > 0  # N x (bits*tables)
        packed = signs.reshape(len(M), tables, bits) @ weights  # N x tables
        return pd.Series(list(packed))

    return buckets


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    vectorized: bool = True,
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's hyperplane
    bucket are scored. The bucket join replaces the cross product — at
    scale, with the corpus written partitioned by bucket, a query touches
    one partition. ``vectorized=False`` falls back to the pure-Catalyst
    signature (no Python anywhere) at ~3x the signature cost."""
    planes = _hyperplanes(dim, bits, seed)
    sig_of = (
        _vectorized_signature(planes)
        if vectorized
        else lambda c: hyperplane_signature(F.col(c), planes)
    )
    corpus = embeddings.select(
        "vec_id",
        "embedding",
        sig_of("embedding").alias("bucket"),
    )
    qs = queries.select(
        "query_id",
        "query_vec",
        sig_of("query_vec").alias("bucket"),
    )
    scored = corpus.join(F.broadcast(qs), "bucket").select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("query_vec"), F.col("embedding")), 4).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return scored.select(
        "query_id", "vec_id", "sim", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= k)


def ivf_assign(
    embeddings: DataFrame, centroids: DataFrame
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (max cosine). ``centroids`` needs (centroid_id, centroid_vec); it is
    broadcast — the corpus never shuffles for assignment.

    Norms are precomputed once per side before the k-way fan-out: inlining
    ``cosine()`` into the joined projection recomputes the row norm per
    CENTROID (k × dim redundant interpreted ops per row — the same
    CollapseProject trap as quantize_embeddings, fixed the same way with
    an explode-let). Same doubles, so rankings and the DuckDB oracle are
    unchanged."""
    emb_n = embeddings.select(
        "vec_id",
        "embedding",
        F.explode(F.array(_norm(F.col("embedding")))).alias("_vn"),
    )
    cent_n = centroids.select(
        "centroid_id",
        "centroid_vec",
        _norm(F.col("centroid_vec")).alias("_cn"),
    )
    scored = emb_n.join(F.broadcast(cent_n)).select(
        "vec_id",
        "embedding",
        "centroid_id",
        # zero-norm vector OR centroid scores 0.0 (the cosine() r11
        # convention) — a zero centroid is reachable from nonzero
        # inputs via exact fixed-point cancellation in kmeans' means
        F.when(
            (F.col("_vn") == F.lit(0.0)) | (F.col("_cn") == F.lit(0.0)),
            F.lit(0.0),
        )
        .otherwise(
            _dot(F.col("embedding"), F.col("centroid_vec"))
            / (F.col("_vn") * F.col("_cn"))
        )
        .alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("centroid_id"))
    return (
        scored.select(
            "vec_id", "embedding", "centroid_id", F.row_number().over(w).alias("rn")
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def _det_avg(val: Column, scale: float = 1e6) -> Column:
    """Order-independent average: round each input to fixed-point
    micro-units (a deterministic per-row op), sum exactly as integers,
    divide once. Floating sums depend on partial-aggregation order, so a
    plain avg() can differ in the last bits between runs/engines and flip
    a downstream rounding — this does not."""
    units = F.round(val.cast("double") * scale).cast("long")
    return F.sum(units) / (F.count(F.lit(1)) * F.lit(scale))


def _det_avg_round4(val: Column) -> Column:
    """``_det_avg`` with the trailing 4-decimal round computed EXACTLY
    in integer arithmetic (half-away on the rational micro_sum /
    (count * 100), sign restored) — r8 fix: the old
    ``F.round(_det_avg(x), 4)`` rounded a DOUBLE, and hypothesis found
    a corpus where the micro-unit average lands exactly on a 4-decimal
    half (-10503500 micros over 10 tokens = -1.05035): Spark's
    HALF_UP rounds the shortest decimal string (a true tie, away ->
    -1.0504) while DuckDB rounds the binary double (just below the
    tie -> -1.0503). The r4b rule — a ratio of integers is rounded
    half-away exactly as floor((2|s| + d) / 2d) with the sign restored
    — applied to the average itself; both engines replay it verbatim.

    Exactness: the quotient is computed with Spark's INTEGRAL `div`
    (IntegralDivide via F.call_function — the rrf_fuse idiom), so no
    float enters the division at all. The r8 form
    ((n2 - n2 % d2) / d2).cast("long") was exact only while the
    NUMERATOR q*d2 ~ 2|s| stayed below 2^53 (double division of longs
    lossily converts the numerator, and the truncating cast could then
    land one below the true quotient while the DuckDB oracle's exact
    integer `//` did not — the same divergence class the tie fix
    closed, one magnitude up; r8 ADVICE).

    r10 overflow fix (found by the round-end scale gate the r9 session
    skipped): the r9 form computed floor((2|s| + d) / 2d) LITERALLY,
    and 2|s| overflows int64 once the micro sum passes 2^62 —
    conversion_latency at the 10x events replica crashed there under
    ANSI. Half-away rounding is now quotient + remainder:
    mag = (|s| div d) + (2*rem >= d), which equals floor((2|s|+d)/2d)
    identically (|s| = q*d + rem => (2rem+d) div 2d = [2rem >= d]) —
    the SIX oracle strings replaying the 2|s| formula in DuckDB HUGEINT
    stay byte-valid and every non-overflow value is unchanged. The
    remaining bound is _det_avg's own int64 micro-SUM headroom (~9.2e18
    micro-units — drop the input to milli-units past that). Emits
    DOUBLE r/1e4 (exact for |r| < 2^52); + 0.0 canonicalizes -0.0."""
    units = F.round(val.cast("double") * 1e6).cast("long")
    s = F.sum(units)
    d = F.count(F.lit(1)) * F.lit(100)  # micro -> 4-decimal scale
    sa = F.abs(s)
    q = F.call_function("div", sa, d)
    rem = sa % d  # < d <= 100*count: 2*rem can never overflow
    mag = q + (F.lit(2) * rem >= d).cast("long")
    r = F.when(s < 0, -mag).otherwise(mag)
    return r.cast("double") / F.lit(10000.0) + F.lit(0.0)


def centroid_by_label(embeddings: DataFrame) -> DataFrame:
    """Per-label mean vector, as flat (label, pos, avg_val) rows.

    posexplode + groupBy(label, pos) — the shuffle carries scalars, not
    vectors, and partial aggregation combines map-side. The flat shape is
    also what an ANSI oracle can check (UNNEST + generate_subscripts).
    Fixed-point accumulation keeps the result bit-identical regardless of
    partitioning."""
    return (
        embeddings.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        # + 0.0 canonicalizes IEEE negative zero (ROUND can yield -0.0,
        # which engines format differently)
        .agg(_det_avg_round4(F.col("val")).alias("avg_val"))
    )


def kmeans(
    embeddings: DataFrame, k: int = 8, iterations: int = 3
) -> DataFrame:
    """Lloyd's k-means over the embedding column — the iterative-algorithm
    shape: per round, assign via broadcast centroids (``ivf_assign``),
    recompute centroids as per-cluster means, loop on the driver. Only
    the k centroid vectors ever reach the driver; the corpus stays
    distributed and is persisted across iterations (each round's assign +
    means both scan it — without the persist that is 2 parquet scans per
    iteration). Deterministic init (first k vec_ids). Returns the final
    (vec_id, centroid_id)."""
    spark = embeddings.sparkSession
    embeddings = embeddings.transform(track_persist)
    centroids = (
        embeddings.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
    )
    assigned = None
    for _ in range(iterations):
        assigned = ivf_assign(embeddings, centroids)
        means = (
            assigned.select(
                "centroid_id", F.posexplode("embedding").alias("pos", "val")
            )
            .groupBy("centroid_id", "pos")
            .agg(_det_avg(F.col("val")).alias("m"))  # run-to-run determinism
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"].cast("float"),
                ).alias("centroid_vec")
            )
        )
        # k rows to the driver, re-broadcast next round
        centroids = spark.createDataFrame(
            means.collect(), schema=means.schema
        )
    return assigned.select("vec_id", "centroid_id")


def embedding_near_dup_blocked(
    embeddings: DataFrame,
    threshold: float = 0.5,
    blocks: int = 8,
    round_to: int = 4,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold via a distributed block matrix
    product — the scale path for thresholds too weak for LSH/IVF pruning
    (see ``embedding_near_dup``). The FAISS-flat idea expressed in Spark:

    - each vector is L2-normalized once (JVM-side) and assigned a block
      by hashing vec_id into ``blocks`` buckets;
    - every unordered block pair (i <= j) is one task key; a vector in
      block b is replicated to the ``blocks`` keys containing b — total
      shuffle volume O(n * blocks), NOT O(n^2);
    - per key, applyInPandas runs one numpy GEMM over the two blocks
      (Arrow-batched, vectorized) and emits only qualifying pairs. A
      pair's two blocks determine exactly one key, so no dedup pass.

    Compute is O(n^2 * dim) — unavoidable for exact completeness at weak
    thresholds — but GEMM does it at memory bandwidth instead of
    interpreted per-pair expression eval (measured 16.4 s -> ~1 s at
    sf0.1). ``blocks`` tunes task size vs replication: shuffle is
    n*blocks rows while each task holds 2n/blocks vectors, so grow
    ``blocks`` ~ sqrt(cluster cores) as the corpus grows. No driver
    collect, no broadcast of the corpus, no cartesian join node.
    """
    import pandas as pd

    # zero-norm vectors normalize to the zero vector (guard, r11): all
    # their GEMM dots are 0.0 == cosine()'s zero-norm score, so they
    # pair with nothing at any positive threshold instead of crashing.
    # The guarded inverse MUST be materialized behind an explode-let
    # before the transform consumes it (r12 A/B find): a when() branch
    # is excluded from codegen subexpression elimination, so the inline
    # form re-evaluated the O(dim) norm aggregate once per ELEMENT —
    # O(dim^2)/row, measured 1.38x on q_embedding_near_dup at sf0.1.
    nrm = _norm(F.col("embedding"))
    inv_norm = F.when(nrm == F.lit(0.0), F.lit(0.0)).otherwise(F.lit(1.0) / nrm)
    normed = embeddings.select(
        "vec_id",
        "embedding",
        F.explode(F.array(inv_norm)).alias("_inv"),
    ).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") * F.col("_inv")
        ).alias("nvec"),
        F.pmod(F.xxhash64("vec_id"), F.lit(blocks)).cast("int").alias("blk"),
    )
    # replicate each vector to every block-pair key that includes its
    # block: key = (lo, hi) with lo <= hi
    partnered = normed.select(
        "vec_id",
        "nvec",
        "blk",
        F.explode(F.sequence(F.lit(0), F.lit(blocks - 1))).alias("partner"),
    ).select(
        "vec_id",
        "nvec",
        "blk",
        F.least("blk", "partner").alias("lo"),
        F.greatest("blk", "partner").alias("hi"),
    )
    thr = float(threshold)

    def _gemm(key, pdf):
        # no type hints: pyspark infers the applyInPandas eval type from
        # them when present, and partial hints trip the inference
        import numpy as np

        empty = pd.DataFrame({"vec_a": [], "vec_b": [], "sim": []})
        lo, hi = int(key[0]), int(key[1])
        a = pdf[pdf.blk == lo]
        b = pdf[pdf.blk == hi] if hi != lo else a
        if len(a) == 0 or len(b) == 0:
            return empty
        ids_a = a.vec_id.to_numpy()
        ids_b = b.vec_id.to_numpy()
        _reject_null_vectors(a.nvec, "blocked GEMM")
        _reject_null_vectors(b.nvec, "blocked GEMM")
        va = np.vstack(a.nvec.to_numpy())
        vb = np.vstack(b.nvec.to_numpy())
        sims = va @ vb.T
        ia, ib = np.nonzero(sims >= thr)
        if len(ia) == 0:
            return empty
        pa, pb, s = ids_a[ia], ids_b[ib], sims[ia, ib]
        if hi == lo:
            # self block: full matrix contains (i,j) and (j,i) plus the
            # diagonal — keep the ordered half
            keep = pa < pb
            pa, pb, s = pa[keep], pb[keep], s[keep]
        else:
            # cross block: each unordered pair appears once; order by id
            pa, pb = np.minimum(pa, pb), np.maximum(pa, pb)
        return pd.DataFrame({"vec_a": pa, "vec_b": pb, "sim": s})

    pairs = partnered.groupBy("lo", "hi").applyInPandas(
        _gemm, "vec_a long, vec_b long, sim double"
    )
    return pairs.select(
        "vec_a", "vec_b", (F.round("sim", round_to) + F.lit(0.0)).alias("sim")
    )


def embedding_near_dup_ivf_sharded(
    embeddings: DataFrame,
    threshold: float = 0.5,
    k_cells: int = 32,
    nprobe: int = 3,
    round_to: int = 4,
    max_cell: int = 100_000,
) -> DataFrame:
    """Bounded-work near-dup pairs for weak thresholds: GEMM *within IVF
    cells* instead of across all block pairs. Each vector is replicated
    to its ``nprobe`` nearest coarse cells (multi-probe); a pair is
    emitted iff the two vectors share >= 1 cell and their exact cosine
    clears the threshold. Work is O(sum cell_pop^2) ~= O(n^2 * nprobe /
    k_cells) with balanced cells — k_cells scales with the corpus, so
    per-task work stays fixed where the blocked-GEMM path grows
    quadratically.

    The price is RECALL < 1: a qualifying pair whose members share no
    probed cell is silently missed, and weak-similarity pairs (cos 0.5 =
    60 degrees) are exactly the ones that straddle cell boundaries —
    measured ~0.8 recall vs ``embedding_near_dup_exact`` on this corpus
    (pinned in tests/test_llm_ops.py). That trade is the POINT: it is
    the only way to cap the work at weak thresholds, and callers who
    need completeness must pay for ``strategy="blocked"`` explicitly.

    ``max_cell`` caps any one cell's population (keep the lowest vec_ids
    — deterministic) so one mega-cluster cannot recreate the quadratic
    blow-up inside a single task; the simhash max_bucket lesson, one
    level up. Centroids are the first ``k_cells`` corpus vectors
    (deterministic, the ivf_topk convention)."""
    centroids = (
        embeddings.orderBy("vec_id")
        .limit(k_cells)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
    )
    # normalize once; GEMM then needs only dot products. Zero-norm
    # vectors map to the zero vector (guard, r11) — dots of 0.0 match
    # cosine()'s zero-norm score and clear no positive threshold.
    # Explode-let materializes the guarded inverse BEFORE the transform
    # (r12 A/B find, same as embedding_near_dup_blocked: a when()
    # branch is excluded from codegen subexpression elimination, so the
    # inline form re-ran the norm aggregate per element — measured
    # 1.31x on x_embedding_near_dup_ivf05 at sf0.1).
    nrm = _norm(F.col("embedding"))
    inv_norm = F.when(nrm == F.lit(0.0), F.lit(0.0)).otherwise(F.lit(1.0) / nrm)
    normed = embeddings.select(
        "vec_id",
        "embedding",
        F.explode(F.array(inv_norm)).alias("_inv"),
    ).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") * F.col("_inv")
        ).alias("nvec"),
    )
    cent_n = centroids.select(
        "centroid_id",
        "centroid_vec",
        _norm(F.col("centroid_vec")).alias("_cn"),
    )
    # multi-probe assignment: top-nprobe cells per vector (nvec is unit,
    # so cosine = dot / centroid norm)
    scored = normed.join(F.broadcast(cent_n)).select(
        "vec_id",
        "nvec",
        "centroid_id",
        # zero-norm centroid: csim 0.0 (cosine() r11 convention); a
        # zero nvec already dots to 0.0 against everything
        F.when(F.col("_cn") == F.lit(0.0), F.lit(0.0))
        .otherwise(_dot(F.col("nvec"), F.col("centroid_vec")) / F.col("_cn"))
        .alias("csim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("centroid_id")
    )
    probed = (
        scored.select(
            "vec_id", "nvec", "centroid_id",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= nprobe)
        .drop("rn")
    )
    # per-cell population cap on the join's own partitioning (keep the
    # lowest vec_ids): bounds the worst single task at (max_cell)^2
    wc = Window.partitionBy("centroid_id").orderBy("vec_id")
    capped = (
        probed.select(
            "vec_id", "nvec", "centroid_id",
            F.row_number().over(wc).alias("pos"),
        )
        .where(F.col("pos") <= max_cell)
        .drop("pos")
    )
    thr = float(threshold)

    def _cell_gemm(key, pdf):
        # no type hints (partial hints break applyInPandas inference)
        import numpy as np

        empty = pd.DataFrame({"vec_a": [], "vec_b": [], "sim": []})
        if len(pdf) < 2:
            return empty
        ids = pdf.vec_id.to_numpy()
        _reject_null_vectors(pdf.nvec, "IVF-sharded GEMM")
        M = np.vstack(pdf.nvec.to_numpy())
        sims = M @ M.T
        ia, ib = np.nonzero(sims >= thr)
        keep = ids[ia] < ids[ib]
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "vec_a": ids[ia][keep],
                "vec_b": ids[ib][keep],
                "sim": sims[ia, ib][keep],
            }
        )

    pairs = capped.groupBy("centroid_id").applyInPandas(
        _cell_gemm, "vec_a long, vec_b long, sim double"
    )
    # a pair co-probing several cells is computed in each; dedup on ids
    return (
        pairs.dropDuplicates(["vec_a", "vec_b"])
        .select(
            "vec_a",
            "vec_b",
            (F.round("sim", round_to) + F.lit(0.0)).alias("sim"),
        )
    )


def embedding_near_dup_exact(
    embeddings: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """Exact embedding near-dup pairs (cosine >= threshold). Quadratic —
    the small-corpus recall oracle for ``embedding_near_dup``; never the
    shipped path. The threshold is applied to the UNROUNDED cosine (like
    any ANSI oracle would), then rounded for output."""
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    raw = cosine(F.col("emb_a"), F.col("emb_b"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .where(raw >= threshold)
        .select("vec_a", "vec_b", F.round(raw, 4).alias("sim"))
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    strategy: str = "auto",
    bits: int = 8,
    tables: int = 16,
    dim: int = 64,
    seed: int = 42,
    blocks: int = 8,
    max_gemm_rows: int = 5_000_000,
    k_cells: int = 32,
    nprobe: int = 3,
    max_cell: int = 100_000,
) -> DataFrame:
    """Embedding near-dup pairs (cosine >= threshold), strategy chosen by
    the similarity regime — measured on this corpus, not assumed:

    - ``"lsh"``: multi-table hyperplane-LSH candidates + exact verify.
      Sublinear ONLY for high thresholds: a pair at angle theta collides
      per table with (1-theta/pi)**bits. Table WIDTH is the selectivity
      lever: the original 4-bit x 32-table defaults let 87% of RANDOM
      pairs (theta ~= 90deg, p_bit = 0.5) collide in >= 1 table, which
      made candidate generation near-quadratic at ANY threshold — first
      surfaced when round 4 benched this branch at sf0.1: 39 s, 24x
      slower than the all-pairs block GEMM. 8-bit x 16-table defaults
      collide only ~6% of random pairs (1 - (1 - 2^-8)^16) while a true
      pair at cos 0.9 (p_bit = 0.856) still lands in >= 1 table with
      ~99.6% probability; at the 0.8 dispatch boundary recall is ~94%
      (measured 39 s -> 1.7 s at sf0.1, planted-dup recall unchanged —
      identical vectors collide in EVERY table at any width). At weak
      thresholds the gap still collapses (theta ~= 60deg: p_bit = 0.67,
      random-pair table collision only ~25x rarer than true-pair), so
      "candidates" ~= all pairs and the verify stage is quadratic
      anyway (measured 16.4 s at sf0.1). IVF multi-probe is no better
      here: top-3-of-32 cells capture only 11/14 qualifying pairs at
      sf0.1 — weak-similarity pairs are not clusterable.
    - ``"blocked"``: exact distributed block-GEMM (``
      embedding_near_dup_blocked``) — the right answer when the
      threshold is too weak for any sketch to filter: O(n^2) work is
      information-theoretically unavoidable, so spend it in vectorized
      matrix math instead of per-pair expression eval.
    - ``"ivf_sharded"``: bounded-work GEMM within multi-probed IVF cells
      (``embedding_near_dup_ivf_sharded``) — sub-quadratic at weak
      thresholds at the price of documented recall loss (~0.8 measured).
    - ``"auto"``: "lsh" at threshold >= 0.8, else "blocked" — but the
      blocked dispatch is guarded: exact completeness at a weak
      threshold is O(n^2) compute, so corpora beyond ``max_gemm_rows``
      refuse loudly instead of launching an unbounded job. The caller
      then chooses: "ivf_sharded" (bounded, lossy) or a bigger
      ``max_gemm_rows`` (they know their cluster budget).
    """
    if strategy not in ("auto", "lsh", "blocked", "ivf_sharded"):
        # validate at plan construction (the r6 rule) — an unknown
        # strategy previously fell through to the LSH branch silently
        raise ValueError(
            f"embedding_near_dup: unknown strategy {strategy!r}; "
            "one of 'auto', 'lsh', 'blocked', 'ivf_sharded'"
        )
    if strategy == "auto":
        strategy = "lsh" if threshold >= 0.8 else "blocked"
    if strategy == "ivf_sharded":
        return embedding_near_dup_ivf_sharded(
            embeddings,
            threshold=threshold,
            k_cells=k_cells,
            nprobe=nprobe,
            max_cell=max_cell,
        )
    if strategy == "blocked":
        n = embeddings.count()
        if n > max_gemm_rows:
            raise ValueError(
                f"embedding_near_dup: exact blocked-GEMM at threshold "
                f"{threshold} over {n} rows is O(n^2) compute "
                f"(> max_gemm_rows={max_gemm_rows}). No sketch can "
                "prune weak-similarity pairs (cos 0.5 is 60 degrees — "
                "87% of RANDOM pairs collide in >=1 LSH table), so "
                "either accept recall loss with strategy='ivf_sharded' "
                "or raise max_gemm_rows to pay the quadratic cost "
                "knowingly."
            )
        return embedding_near_dup_blocked(
            embeddings, threshold=threshold, blocks=blocks
        )
    all_planes = _hyperplanes(dim, bits * tables, seed)
    # all tables' buckets from ONE Arrow GEMM per batch (the
    # _vectorized_signature precedent: bits*tables plane dots per row is
    # dense linear algebra, the one place pandas beats codegen);
    # posexplode turns the per-table bucket array into (tbl, bucket) rows
    buckets_of = _vectorized_table_buckets(all_planes, bits, tables)
    parallelism = embeddings.sparkSession.sparkContext.defaultParallelism
    bucketed = (
        embeddings.select(
            "vec_id", F.posexplode(buckets_of("embedding")).alias("tbl", "bucket")
        )
        .repartition(parallelism, "tbl", "bucket")
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        # dedupe across tables BEFORE the exact verify: pairs are narrow
        # (two ids), vectors are wide — verify each candidate once
        .dropDuplicates(["vec_a", "vec_b"])
    )
    # verify on pre-normalized vectors: the naive cosine(emb_a, emb_b)
    # form recomputes BOTH norms per candidate pair (the ivf_assign
    # trap); normalizing once per vector behind an explode-let Generate
    # leaves one dot product per pair — same blocked-GEMM math, same
    # 4-decimal rounded sims
    normed = (
        embeddings.select(
            "vec_id",
            "embedding",
            F.explode(F.array(_norm(F.col("embedding")))).alias("_n"),
        )
        .select(
            "vec_id",
            # zero-norm -> zero vector (guard, r11); nonzero path keeps
            # the exact x / n division the green oracles replay
            F.transform(
                "embedding",
                lambda x: F.when(F.col("_n") == F.lit(0.0), F.lit(0.0)).otherwise(
                    x.cast("double") / F.col("_n")
                ),
            ).alias("nvec"),
        )
    )
    ea = normed.select(
        F.col("vec_id").alias("vec_a"), F.col("nvec").alias("nvec_a")
    )
    eb = normed.select(
        F.col("vec_id").alias("vec_b"), F.col("nvec").alias("nvec_b")
    )
    raw = _dot(F.col("nvec_a"), F.col("nvec_b"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .where(raw >= threshold)
        .select(
            "vec_a",
            "vec_b",
            (F.round(raw, 4) + F.lit(0.0)).alias("sim"),
        )
    )


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column — the
    standard memory/bandwidth lever for ANN at corpus scale (4x smaller
    than float32, and int8 dot products SIMD-vectorize). Per-vector
    scale = 127 / max|x|; q_i = round(x_i * scale). Emits the quantized
    vector, the rounded scale (for dequantization q/scale) and the exact
    integer squared norm (the ||q||^2 term every quantized-cosine
    computation needs — carrying it beats recomputing per candidate
    pair).

    Pure projection over the scan: no shuffle, no UDF — transform /
    array_max / aggregate all run in whole-stage codegen. Every float op
    is per-element (max is order-independent, the norm is an integer
    sum), so results are bit-reproducible across engines and partition
    layouts — the quantized vectors are oracle-checkable value by value.
    """
    maxabs = F.array_max(F.transform("embedding", lambda x: F.abs(x))).cast(
        "double"
    )
    scale = F.when(maxabs == 0, F.lit(1.0)).otherwise(F.lit(127.0) / maxabs)
    # explode-let bindings: CollapseProject inlines aliased expressions
    # into HOF lambdas, so a naive `transform(e, x -> round(x*scale))`
    # re-evaluates the array_max PER ELEMENT — O(dim^2) interpreted ops
    # per row (measured 3.3x slower at sf0.1). A 1-element explode is a
    # Generate node the optimizer cannot collapse through, pinning scale
    # (and then qvec) to exactly one evaluation per row — no shuffle.
    with_scale = embeddings.select(
        "vec_id", "embedding", F.explode(F.array(scale)).alias("_scale")
    )
    qvec = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * F.col("_scale")).cast("int"),
    )
    with_qvec = with_scale.select(
        "vec_id", "_scale", F.explode(F.array(qvec)).alias("_qvec")
    )
    q_sqnorm = F.aggregate(
        F.col("_qvec"),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + (v.cast("bigint") * v.cast("bigint")),
    )
    return with_qvec.select(
        "vec_id",
        F.col("_qvec").alias("qvec"),
        (F.round(F.col("_scale"), 6) + F.lit(0.0)).alias("q_scale"),
        q_sqnorm.alias("q_sqnorm"),
    )


def quantized_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Cosine top-k over int8-quantized vectors — the memory/bandwidth
    scale path for brute-force similarity: the broadcast query side and
    the scanned corpus both shrink 4x, and the inner loop is an integer
    dot product. sim = dot_int / sqrt(||qa||^2 * ||qb||^2) using the
    integer norms carried by ``quantize_embeddings`` — every arithmetic
    step up to the final scalar division is exact integer math, so the
    ranking (and the rounded sims) reproduce bit-for-bit on any engine.

    Same plan shape as ``brute_force_topk``: corpus scanned once, query
    side broadcast, per-query top-k window over already-reduced scored
    rows. Zero-norm vectors score 0 against everything (guarded, no
    NaN)."""
    qc = quantize_embeddings(embeddings)
    qq = quantize_embeddings(
        queries.select(
            F.col("query_id").alias("vec_id"),
            F.col("query_vec").alias("embedding"),
        )
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("qqvec"),
        F.col("q_sqnorm").alias("qq_sqnorm"),
    )
    dot = F.aggregate(
        F.zip_with("qvec", "qqvec", lambda a, b: a.cast("bigint") * b.cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    norm_prod = F.col("q_sqnorm") * F.col("qq_sqnorm")
    sim = F.when(norm_prod == 0, F.lit(0.0)).otherwise(
        dot.cast("double") / F.sqrt(norm_prod.cast("double"))
    )
    scored = qc.join(F.broadcast(qq)).select(
        "query_id", "vec_id", sim.alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.select(
            "query_id", "vec_id", "sim", F.row_number().over(w).alias("rank")
        )
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            (F.round("sim", 4) + F.lit(0.0)).alias("sim"),
            "rank",
        )
    )


def _int_hyperplanes(dim: int, bits: int) -> list[list[int]]:
    """Integer hyperplane weights derived from md5 — the portable twin of
    ``_hyperplanes``: w(bit, pos) = (first-32-bits(md5("bit:pos")) mod 15)
    - 7, i.e. small ints in [-7, 7] any ANSI engine regenerates exactly
    (``CAST('0x'||substr(md5(b||':'||p),1,8) AS BIGINT) % 15 - 7``)."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{b}:{p}".encode()).hexdigest()[:8], 16) % 15)
            - 7
            for p in range(dim)
        ]
        for b in range(bits)
    ]


def _int_signature(planes: list[list[int]]):
    """Arrow-batched integer hyperplane signature over int8-quantized
    vectors: one int64 numpy GEMM per batch — EXACT (no float
    reassociation), so the resulting buckets are engine-reproducible,
    unlike float sign bits which can flip within GEMM rounding distance
    of zero."""
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype="int64").T  # dim x bits
    weights = (1 << np.arange(P.shape[1])).astype("int64")

    @pandas_udf("long")
    def sig(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int64")
        _reject_null_vectors(v, "int hyperplane signature")
        M = np.vstack(v.to_numpy()).astype("int64")
        _check_gemm_dim(M, P, "int hyperplane signature")
        return pd.Series(((M @ P) > 0) @ weights)

    return sig


def lsh_quantized_topk(
    embeddings: DataFrame,
    k: int = 5,
    bits: int = 8,
    dim: int = 64,
    n_queries: int = 5,
) -> DataFrame:
    """Approximate top-k with every stage integer-exact: int8 scalar
    quantization (``quantize_embeddings``), md5-derived integer
    hyperplane sign buckets, and a quantized-cosine rerank of the
    query's bucket only. The composition is the production ANN shape —
    4x smaller vectors, bucket-pruned candidate set, SIMD integer dots —
    AND fully value-oracle-checkable, because no step depends on float
    summation order (the one final sqrt/divide consumes exact integers).

    At 100 TB: corpus written partitioned by bucket => a query scans one
    partition; the signature pass is a pure map (no shuffle)."""
    planes = _int_hyperplanes(dim, bits)
    sig = _int_signature(planes)
    corpus = quantize_embeddings(embeddings).select(
        "vec_id", "qvec", "q_sqnorm", sig(F.col("qvec")).alias("bucket")
    )
    # quantize the n query rows independently (per-vector scale, so the
    # 5-row result is identical to slicing the corpus) — the corpus then
    # flows through exactly ONE scan into the bucket join, no persist
    qry = quantize_embeddings(
        embeddings.orderBy("vec_id").limit(n_queries)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("query_qvec"),
        F.col("q_sqnorm").alias("query_sqnorm"),
        sig(F.col("qvec")).alias("bucket"),
    )
    dot = F.aggregate(
        F.zip_with(
            "qvec",
            "query_qvec",
            lambda x, y: x.cast("bigint") * y.cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    raw = F.when(
        (F.col("q_sqnorm") == 0) | (F.col("query_sqnorm") == 0), F.lit(0.0)
    ).otherwise(
        dot / F.sqrt(F.col("q_sqnorm").cast("double") * F.col("query_sqnorm"))
    )
    scored = corpus.join(F.broadcast(qry), "bucket").select(
        "query_id",
        "vec_id",
        (F.round(raw, 4) + F.lit(0.0)).alias("sim"),
        raw.alias("_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_raw").desc(), F.col("vec_id")
    )
    return (
        scored.select(
            "query_id",
            "vec_id",
            "sim",
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def centroid_outliers(
    embeddings: DataFrame, threshold: float = 0.0
) -> DataFrame:
    """Per-label centroid-cosine quality gate — the embedding-corpus
    hygiene pass every training pipeline runs before contrastive /
    retrieval training: a vector whose cosine to its OWN label centroid
    falls below ``threshold`` is flagged as an outlier (mislabeled,
    degenerate, or embedding-version drift). Default 0.0 flags vectors
    negatively correlated with their label's mean direction.

    Shape: one ``centroid_by_label`` pass (fixed-point means, so the
    centroid is byte-reproducible across engines), centroids assembled
    label-wise and broadcast (#labels rows), one corpus scan scoring
    each vector against its own label's centroid — no corpus shuffle at
    all. The cosine is materialized once per row behind an explode-let
    (two consumers: the rounded surface and the flag — CollapseProject
    would otherwise evaluate it twice).

    Returns (vec_id, label, sim_centroid, is_outlier).
    """
    cent = centroid_by_label(embeddings)
    cvec = cent.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "avg_val"))),
            lambda s: s["avg_val"],
        ).alias("centroid_vec")
    )
    scored = embeddings.join(F.broadcast(cvec), "label").select(
        "vec_id",
        "label",
        F.explode(
            F.array(cosine(F.col("embedding"), F.col("centroid_vec")))
        ).alias("_sim"),
    )
    return scored.select(
        "vec_id",
        "label",
        (F.round("_sim", 4) + F.lit(0.0)).alias("sim_centroid"),
        (F.col("_sim") < threshold).cast("int").alias("is_outlier"),
    )


def _int_embedding(col: Column, scale: int = 1000) -> Column:
    """Fixed-point milli-unit integerization of an embedding column:
    round(x * scale) as bigint per position. Spark HALF_UP and DuckDB
    ROUND both round halves away from zero, so the surface is
    engine-portable; every distance derived from it is an exact integer
    (the `_det_avg` micro-unit pattern applied to vectors)."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * float(scale)).cast("bigint")
    )


def _prefix_int_rows(embeddings: DataFrame, n: int, op: str) -> list:
    """The deterministic sampling prefix every PQ/IVF operator draws
    from: the ``n`` smallest-vec_id rows as (vec_id, iv milli-unit
    ints). r14: pq_topk / ivfpq_topk used to run this TakeOrdered
    corpus scan once per sample (codebook + cells + queries = up to
    three jobs); they now share ONE collect and slice it (guide §1.2 —
    the samples are nested prefixes of the same ordering)."""
    rows = (
        embeddings.orderBy("vec_id")
        .limit(n)
        .select("vec_id", _int_embedding(F.col("embedding")).alias("iv"))
        .collect()
    )
    _require_non_null(rows, ["iv"], op)
    return rows


def _codebook_from_rows(rows: list, subspaces: int) -> list:
    """Build the PQ codebook from already-collected prefix rows —
    codeword c of subspace s is the s-th subvector of the c-th row
    (pq_codebook's exact construction, shared so the prefix collect
    can be reused)."""
    if not rows:
        return []
    dim = len(rows[0]["iv"])
    if dim % subspaces:
        raise ValueError(
            f"embedding dim {dim} not divisible into {subspaces} subspaces"
        )
    sd = dim // subspaces
    return [
        [list(r["iv"][s * sd : (s + 1) * sd]) for r in rows]
        for s in range(subspaces)
    ]


def pq_codebook(
    embeddings: DataFrame, subspaces: int = 8, codes: int = 16
) -> list:
    """Product-quantization codebook by deterministic sampling: codeword
    ``c`` of subspace ``s`` is the s-th subvector of the vector with the
    c-th smallest vec_id, in milli-unit integers. Returned as a nested
    Python list ``cb[s][c] = [ints]`` — ``subspaces * codes`` tiny rows
    to the driver (the kmeans-style bounded collect), broadcast into the
    encode closure. Sampling (k-means|0 iterations) keeps the codebook
    replayable by any ANSI engine; pass the result of a per-subspace
    Lloyd refinement instead when recall matters more than oracle
    checkability — ``pq_encode``/``pq_topk`` only see the list."""
    return _codebook_from_rows(
        _prefix_int_rows(embeddings, codes, "pq_codebook"), subspaces
    )


def pq_encode(
    embeddings: DataFrame, codebook: list, vectorized: bool = True
) -> DataFrame:
    """PQ-encode the corpus: per subspace, the code of the nearest
    codeword by integer L2 (tie-break: smallest code). One map-only pass
    — no join, no shuffle; the codebook rides inside an Arrow-batched
    pandas_udf closure and the distance math is one numpy integer GEMM
    per batch (exact: int64 all the way, so the argmin is bit-stable
    and replayable). Returns (vec_id, codes array<int>) — 1 byte/code
    of information per subspace instead of 4*subdim bytes of float: the
    64x memory cut that makes billion-vector ANN fit a cluster's RAM.

    ``vectorized=False`` is the pure-Catalyst form (repo convention for
    every Arrow path): per subspace, an array of the K integer distances
    via aggregate(zip_with(...)) HOFs over codeword literals, argmin as
    array_position(min) — identical integers, zero Python, ~the usual
    3x interpreted-HOF cost. Still map-only.
    """
    if not vectorized:
        # explode-let pins the integerization to ONE eval per row —
        # inlined, CollapseProject would re-run the transform once per
        # codeword distance (the round-3 quantize lesson)
        base = embeddings.select(
            "vec_id",
            F.explode(
                F.array(_int_embedding(F.col("embedding")))
            ).alias("_iv"),
        )
        sd0 = len(codebook[0][0])
        cols = []
        for s, words in enumerate(codebook):
            sub = F.slice(F.col("_iv"), s * sd0 + 1, sd0)
            dists = F.array(
                *[
                    F.aggregate(
                        F.zip_with(
                            sub,
                            F.lit([int(x) for x in w]),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0).cast("bigint"),
                        lambda acc, v: acc + v,
                    )
                    for w in words
                ]
            )
            # array_position returns the FIRST match: lowest-code tie-break
            cols.append(
                (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
            )
        return base.select("vec_id", F.array(*cols).alias("codes"))
    cb = [np.asarray(c, dtype=np.int64) for c in codebook]
    subspaces = len(cb)
    sd = cb[0].shape[1]

    @F.pandas_udf("array<int>")
    def _codes(iv: pd.Series) -> pd.Series:
        if len(iv) == 0:
            return pd.Series([], dtype=object)
        _reject_null_vectors(iv, "PQ encode")
        v = np.vstack(iv.to_numpy()).astype(np.int64)  # (n, dim)
        out = np.empty((v.shape[0], subspaces), dtype=np.int32)
        for s in range(subspaces):
            sub = v[:, s * sd : (s + 1) * sd]  # (n, sd)
            # exact integer squared L2 to each codeword: |a|^2 - 2ab + |b|^2
            d2 = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2 * (sub @ cb[s].T)
                + (cb[s] * cb[s]).sum(axis=1)
            )
            out[:, s] = np.argmin(d2, axis=1)  # first occurrence = lowest code
        return pd.Series(list(out))

    return embeddings.select(
        "vec_id", _codes(_int_embedding(F.col("embedding"))).alias("codes")
    )


def pq_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    subspaces: int = 8,
    codes: int = 16,
    rerank: int | None = 100,
) -> DataFrame:
    """Approximate nearest neighbors by product quantization with
    asymmetric distance computation (ADC) — the memory-bound scale path
    beyond IVF: the corpus is held as 1-byte codes per subspace, and a
    query scores a vector by summing precomputed query-to-codeword
    distances looked up by the vector's codes. Compute per (query,
    vector) drops from O(dim) float ops to O(subspaces) integer adds,
    and the scan reads codes, not vectors.

    Shape: codebook = bounded driver sample (``pq_codebook``); encode =
    one map-only Arrow pass (``pq_encode``); the Q x subspaces x codes
    ADC table is computed on the driver in exact integer arithmetic and
    joined BROADCAST against the exploded code stream; per-(query, vec)
    ADC sums are map-side-combined before the single top-k window
    shuffle. Everything through ``adc_dist`` is int64-exact, so results
    are bit-identical under any partitioning and fully oracle-
    replayable.

    ``rerank`` is the standard FAISS-style accuracy lever: keep the top
    ``rerank`` ADC candidates per query, then re-score ONLY those with
    the exact integer L2 distance on the full fixed-point vectors (a
    broadcast of Q*rerank shortlist rows against the corpus — constant
    per query regardless of corpus size) and emit the exact-distance
    top-k. ADC alone on unstructured embeddings is coarse (measured
    recall@10 0.36-0.52 at sf0.01); shortlist-100 + rerank measures
    0.92 while still scanning codes, not vectors, for the corpus-sized
    pass. ``rerank=None`` returns raw ADC ranks.

    Returns (query_id, vec_id, d2, rank) with d2 = exact integer L2 on
    milli-unit vectors when reranking, else the ADC distance; queries
    are the ``n_queries`` smallest vec_ids, matching
    ``brute_force_topk``'s convention so recall is directly measurable.
    """
    spark = embeddings.sparkSession
    # one TakeOrdered scan serves BOTH deterministic samples (r14):
    # the codebook rows and the query rows are nested prefixes of the
    # same vec_id ordering
    prefix = _prefix_int_rows(
        embeddings, max(codes, n_queries), "pq_topk"
    )
    cb = _codebook_from_rows(prefix[:codes], subspaces)
    if not cb:  # empty corpus
        return spark.createDataFrame(
            [], "query_id bigint, vec_id bigint, d2 bigint, rank int"
        )
    qrows = prefix[:n_queries]
    sd = len(cb[0][0])
    table_rows = []
    for qr in qrows:
        qv = np.asarray(qr["iv"], dtype=np.int64)
        for s in range(subspaces):
            qs = qv[s * sd : (s + 1) * sd]
            # a corpus smaller than `codes` yields a shorter codebook
            for c, word in enumerate(cb[s]):
                d = qs - np.asarray(word, dtype=np.int64)
                table_rows.append(
                    (int(qr["vec_id"]), s, c, int((d * d).sum()))
                )
    table = spark.createDataFrame(
        table_rows, "query_id bigint, s int, code int, d2 bigint"
    )
    enc = pq_encode(embeddings, cb).select(
        "vec_id", F.posexplode("codes").alias("s", "code")
    )
    adc = (
        enc.join(F.broadcast(table), ["s", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    if rerank is None:
        return (
            adc.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                "query_id",
                "vec_id",
                F.col("adc_dist").alias("d2"),
                "rank",
            )
        )
    shortlist = (
        adc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= rerank)
        .select("query_id", "vec_id")
    )
    return _exact_rerank(embeddings, shortlist, qrows, k)


def _exact_rerank(
    embeddings: DataFrame, shortlist: DataFrame, qrows: list, k: int
) -> DataFrame:
    """Exact integer-L2 re-score of an ADC shortlist (shared tail of
    ``pq_topk`` and ``ivfpq_topk``): broadcast the Q*rerank shortlist
    rows and the query vectors, join the corpus once map-side, fold the
    squared-diff integer distance, rank per query with vec_id
    tie-break. Returns (query_id, vec_id, d2, rank)."""
    spark = embeddings.sparkSession
    qdf = spark.createDataFrame(
        [(int(r["vec_id"]), list(r["iv"])) for r in qrows],
        "query_id bigint, qiv array<bigint>",
    )
    rescored = (
        embeddings.select(
            "vec_id", _int_embedding(F.col("embedding")).alias("iv")
        )
        .join(F.broadcast(shortlist), "vec_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.aggregate(
                F.zip_with(
                    "iv", "qiv", lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("d2"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "d2", "rank")
    )


def pq_codebook_trained(
    embeddings: DataFrame,
    subspaces: int = 8,
    codes: int = 16,
    iterations: int = 5,
    sample: int = 4096,
) -> list:
    """Lloyd-refined PQ codebook — the recall lever over the sampled
    codebook, following standard ANN practice: train on a BOUNDED
    deterministic sample (the ``sample`` smallest vec_ids — one bounded
    driver collect, never the corpus), initialize from the sampled
    codebook, and run per-subspace k-means in integer arithmetic
    (centroids re-rounded to milli-unit ints each round, so the result
    honors the same int64-exact ADC contract as ``pq_codebook``). Lloyd
    from the sampled init never increases training quantization error,
    which `tests/test_llm_ops.py` pins. Empty clusters keep their old
    codeword. Encoding and search stay fully distributed — only
    training is driver-side, on a sample whose size is a constant."""
    rows = (
        embeddings.orderBy("vec_id")
        .limit(sample)
        .select(_int_embedding(F.col("embedding")).alias("iv"))
        .collect()
    )
    if not rows:
        return []
    _require_non_null(rows, ["iv"], "pq_codebook_trained")
    X = np.array([list(r["iv"]) for r in rows], dtype=np.int64)
    dim = X.shape[1]
    if dim % subspaces:
        raise ValueError(
            f"embedding dim {dim} not divisible into {subspaces} subspaces"
        )
    sd = dim // subspaces
    k = min(codes, X.shape[0])
    out = []
    for s in range(subspaces):
        sub = X[:, s * sd : (s + 1) * sd]
        cent = sub[:k].copy()
        for _ in range(iterations):
            d2 = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2 * (sub @ cent.T)
                + (cent * cent).sum(axis=1)
            )
            assign = np.argmin(d2, axis=1)
            new = cent.copy()
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    # half-AWAY rounding of sum/count done entirely in
                    # integers: floor((2|sum| + n) / 2n) with the sign
                    # restored. No float ever — np.round is banker's
                    # and floor(x+0.5) mis-rounds doubles just below a
                    # representable half, both of which would break the
                    # Spark/DuckDB half-away contract
                    ssum = members.sum(axis=0)
                    cnt = len(members)
                    mag = (2 * np.abs(ssum) + cnt) // (2 * cnt)
                    new[c] = (np.sign(ssum) * mag).astype(np.int64)
            if np.array_equal(new, cent):
                break
            cent = new
        out.append([list(map(int, c)) for c in cent])
    return out


def ivfpq_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    cells: int = 8,
    nprobe: int = 3,
    subspaces: int = 16,
    codes: int = 16,
    rerank: int = 100,
) -> DataFrame:
    """IVF-PQ — the two-level billion-scale ANN composite: a coarse
    quantizer (``cells`` sampled centroids) prunes the corpus to the
    query's ``nprobe`` nearest cells, and PQ/ADC scores only the
    survivors from their one-byte codes, followed by the exact
    integer-L2 rerank of the shortlist. Per query the scan cost drops
    to ~``nprobe/cells`` of the PQ-only path, and with the corpus
    written partitioned by cell id (``sources.write_partitioned``) the
    probe is partition-pruned I/O, not just compute.

    Everything is milli-unit integer arithmetic end to end (cell
    assignment, ADC table, rerank — ties broken by index/vec_id), so
    the whole pipeline is bit-replayable by the SQL oracle. Codes are
    raw-vector PQ (FAISS ``by_residual=False``): cell assignment prunes,
    codes score — the residual-encoding variant trades oracle
    replayability for accuracy and belongs behind trained codebooks.

    One combined Arrow pass emits ``[cell, code_0..code_{S-1}]`` per
    vector — the corpus is scanned once, map-only. Returns
    (query_id, vec_id, d2, rank).
    """
    spark = embeddings.sparkSession
    # one TakeOrdered scan serves all THREE deterministic samples
    # (r14): codebook, coarse cells and queries are nested prefixes of
    # the same vec_id ordering — this was three corpus-scan collect
    # jobs per invocation
    prefix = _prefix_int_rows(
        embeddings, max(codes, cells, n_queries), "ivfpq_topk"
    )
    cb = _codebook_from_rows(prefix[:codes], subspaces)
    if not cb:
        return spark.createDataFrame(
            [], "query_id bigint, vec_id bigint, d2 bigint, rank int"
        )
    crows = prefix[:cells]
    cents = np.array([list(r["iv"]) for r in crows], dtype=np.int64)
    pq = [np.asarray(c, dtype=np.int64) for c in cb]
    S = len(pq)
    sd = pq[0].shape[1]

    @F.pandas_udf("array<int>")
    def _cell_and_codes(iv: pd.Series) -> pd.Series:
        if len(iv) == 0:
            return pd.Series([], dtype=object)
        _reject_null_vectors(iv, "IVF-PQ cell/codes")
        v = np.vstack(iv.to_numpy()).astype(np.int64)
        d2c = (
            (v * v).sum(axis=1, keepdims=True)
            - 2 * (v @ cents.T)
            + (cents * cents).sum(axis=1)
        )
        out = np.empty((v.shape[0], S + 1), dtype=np.int32)
        out[:, 0] = np.argmin(d2c, axis=1)
        for s in range(S):
            sub = v[:, s * sd : (s + 1) * sd]
            d2 = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2 * (sub @ pq[s].T)
                + (pq[s] * pq[s]).sum(axis=1)
            )
            out[:, s + 1] = np.argmin(d2, axis=1)
        return pd.Series(list(out))

    qrows = prefix[:n_queries]
    probe_rows, table_rows = [], []
    for qr in qrows:
        qv = np.asarray(qr["iv"], dtype=np.int64)
        dc = ((cents - qv) ** 2).sum(axis=1)
        for cell in np.argsort(dc, kind="stable")[:nprobe]:
            probe_rows.append((int(qr["vec_id"]), int(cell)))
        for s in range(S):
            qs = qv[s * sd : (s + 1) * sd]
            t = ((pq[s] - qs) ** 2).sum(axis=1)
            # a corpus smaller than `codes` yields a shorter codebook
            for c in range(len(t)):
                table_rows.append((int(qr["vec_id"]), s, c, int(t[c])))
    probes = spark.createDataFrame(probe_rows, "query_id bigint, cell int")
    table = spark.createDataFrame(
        table_rows, "query_id bigint, s int, code int, d2 bigint"
    )
    enc = embeddings.select(
        "vec_id",
        _cell_and_codes(_int_embedding(F.col("embedding"))).alias("cc"),
    ).select(
        "vec_id",
        F.element_at("cc", 1).alias("cell"),
        F.posexplode(F.slice("cc", 2, S)).alias("s0", "code"),
    )
    table_r = table.select(
        F.col("query_id").alias("t_qid"),
        "s",
        F.col("code").alias("t_code"),
        "d2",
    )
    adc = (
        enc.join(F.broadcast(probes), "cell")  # cell pruning assigns queries
        .join(
            F.broadcast(table_r),
            # posexplode positions are 0-based, matching subspace ids
            (F.col("s0") == F.col("s"))
            & (F.col("code") == F.col("t_code"))
            & (F.col("query_id") == F.col("t_qid")),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    shortlist = (
        adc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= rerank)
        .select("query_id", "vec_id")
    )
    return _exact_rerank(embeddings, shortlist, qrows, k)


def _knn_d2_kernel(q_mat: list):
    """Arrow-batched exact integer-L2 scorer for knn_label_agreement:
    one (batch x dim) @ (dim x n_queries) int64 GEMM per Arrow batch
    emits every query's squared distance for each corpus row as an
    array (position = query index). Module-level factory so reused
    Python workers keep the code object (guide §4.5)."""
    Q = np.asarray(q_mat, dtype=np.int64)
    qq = (Q * Q).sum(axis=1)

    @F.pandas_udf("array<bigint>")
    def d2_all(iv: pd.Series) -> pd.Series:
        if len(iv) == 0:
            return pd.Series([], dtype=object)
        _reject_null_vectors(iv, "knn_label_agreement scorer")
        v = np.vstack(iv.to_numpy()).astype(np.int64)
        d2 = (v * v).sum(axis=1, keepdims=True) - 2 * (v @ Q.T) + qq
        return pd.Series(list(d2))

    return d2_all


def knn_label_agreement(
    embeddings: DataFrame, n_queries: int = 32, k: int = 10
) -> DataFrame:
    """Label-noise probe: for each of ``n_queries`` sampled vectors, the
    number of its k nearest neighbors (exact integer L2, self excluded)
    sharing its label — the standard kNN-agreement signal for finding
    mislabeled examples in a curated set (low agreement = candidate
    noise; cf. Confident Learning / deep-kNN filtering practice).

    Exact and integer end to end: milli-unit vectors, squared-L2 as
    bigint folds, (distance, vec_id) tie-break, integer agreement
    counts — fully SQL-replayable. The sampled queries broadcast and
    the corpus is scanned ONCE map-side; the per-query top-k window
    sorts a corpus-sized partition, which is the honest cost of exact
    kNN — at billion-row scale swap the scorer for ``ivfpq_topk``'s
    shortlist (same output columns) and keep the agreement rollup; this
    exact form is the oracle-checkable gate (the rerank-equality
    pattern: with nprobe = cells and shortlist >= corpus the swap MUST
    equal this).
    """
    spark = embeddings.sparkSession
    qrows = (
        embeddings.orderBy("vec_id")
        .limit(n_queries)
        .select(
            "vec_id",
            _int_embedding(F.col("embedding")).alias("iv"),
            "label",
        )
        .collect()
    )
    if not qrows:
        return spark.createDataFrame(
            [], "query_id bigint, qlabel int, n_neighbors bigint, n_agree bigint"
        )
    _require_non_null(qrows, ["iv", "label"], "knn_label_agreement")
    # r14 (guide §4.2): score every query against a corpus row in ONE
    # Arrow GEMM instead of a crossJoin + interpreted zip_with/aggregate
    # fold (the fold re-evaluated 64 element lambdas per (row, query)
    # pair — measured 1.4 s of the key's 1.66 s at sf0.1). Exact int64
    # arithmetic end to end, so d2 is bit-identical to the Catalyst
    # fold (integer adds are order-independent — the float-GEMM
    # argmax-tie rejection from r13 does not apply). Overflow headroom:
    # milli-unit coords |x| <= ~2^21 give per-term (a-b)^2 <= 2^44 and
    # 64-dim sums <= 2^50.
    qidx = spark.createDataFrame(
        [
            (i, int(r["vec_id"]), int(r["label"]))
            for i, r in enumerate(qrows)
        ],
        "qi int, query_id bigint, qlabel int",
    )
    d2_all = _knn_d2_kernel([list(r["iv"]) for r in qrows])
    scored = (
        embeddings.select(
            "vec_id",
            "label",
            F.posexplode(
                d2_all(_int_embedding(F.col("embedding")))
            ).alias("qi", "d2"),
        )
        .join(F.broadcast(qidx), "qi")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qlabel", "vec_id", "label", "d2")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy("query_id", "qlabel")
        .agg(
            F.count(F.lit(1)).alias("n_neighbors"),
            F.sum(
                F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0)
            ).cast("bigint").alias("n_agree"),
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    strategy: str = "auto",
    **near_dup_kwargs,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): drop semantic near-duplicates by
    embedding similarity — the embedding-space member of the dedup
    action family, composed end-to-end from proven pieces: mine pairs
    with ``embedding_near_dup`` (strategy-dispatched: LSH at tight
    thresholds, bounded IVF-sharded GEMM at weak ones), collapse the
    pair graph to transitive clusters, keep the minimum vec_id per
    cluster (the deterministic representative every dedup path in this
    engine uses). Returns one row per vector:
    (vec_id, cluster_id, keep_vec_id, action) — the action list a
    curation run joins against the corpus to rewrite it.

    Scale: inherits its miner's bounds (banded LSH / per-cell caps);
    label propagation runs on the pair graph only; the corpus joins on
    nothing wider than vec_id. The famous SemDeDup result — ~4x
    training-data reduction at equal quality on web corpora — comes
    from exactly this pipeline at threshold ~0.95 within k-means
    clusters; ``strategy="ivf_sharded"`` is that shape.
    """
    from .dedup import dedup_clusters

    pairs = embedding_near_dup(
        embeddings, threshold=threshold, strategy=strategy, **near_dup_kwargs
    ).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    labels = dedup_clusters(pairs)
    keyed = (
        embeddings.select("vec_id")
        .join(
            labels.select(
                F.col("doc_id").alias("vec_id"), "cluster_id"
            ),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.coalesce("cluster_id", F.col("vec_id")).alias("cluster_id"),
        )
    )
    return keyed.select(
        "vec_id",
        "cluster_id",
        F.col("cluster_id").alias("keep_vec_id"),
        F.when(F.col("vec_id") == F.col("cluster_id"), F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("action"),
    )
