"""Deduplication operators over the documents table (SURVEY.md B1/B2 and
the north-star training-data ops): exact, n-gram Jaccard, MinHash+LSH,
SimHash.

Scale design (the part that matters at 100 TB):

- exact dedup is a single hash aggregation on a fingerprint — map-side
  partial combine, one shuffle on the 16-byte key, never on raw text
- n-gram Jaccard uses an inverted shingle index (explode -> self-join on
  shingle -> count) so only documents *sharing at least one shingle* are
  ever paired — no O(n^2) cross join; hot shingles are droppable like
  stopwords via a document-frequency cap
- MinHash banding buckets candidates so the join key is (band, signature
  slice); true Jaccard is verified only on bucket collisions
- SimHash reduces each doc to 64 bits; near-dup pairs join on 16-bit
  bands (Hamming-LSH), verified by popcount on the XOR
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import track_persist

from .text import tokens

# Prime just above 2^32 for the universal-hash family
# h_i(x) = (a_i*x + b_i) mod p. Keeping x < 2^32 and a_i small bounds the
# product well under 2^63 — no silent int64 overflow in the executors.
_HASH_P = 4294967311


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact dedup keyed on normalized content: keep the smallest doc_id
    per distinct text, report the multiplicity. Deterministic (unlike
    dropDuplicates, which keeps an arbitrary row)."""
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return (
        documents.select(F.md5(norm).alias("content_md5"), "doc_id")
        .groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _position_grams(toks, n: int = 3):
    """Positional (non-distinct) word n-grams from a token-array column:
    slide with transform + slice. Documents shorter than n tokens
    produce an empty array (guarded: sequence(1, 0) counts *down*).

    Pass a MATERIALIZED column (one that crossed an exchange), not the
    raw ``tokens()`` expression: CollapseProject inlines expression
    aliases, so an inlined split() re-runs once per transform position —
    measured 3x slower on the shingle stage."""
    k = F.size(toks) - (n - 1)
    return F.when(k < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def _shingles_from(toks, n: int = 3):
    """Distinct n-gram shingle array (set semantics) — see
    ``_position_grams`` for the construction and its caveats."""
    return F.array_distinct(_position_grams(toks, n))


def _shingles(n: int = 3):
    """Shingle array straight off the text column (convenience for
    broadcast-small inputs; prefer ``_tokenized`` + ``_shingles_from``
    on corpus-sized inputs)."""
    return _shingles_from(tokens(), n)


def _tokenized(documents: DataFrame) -> DataFrame:
    """(doc_id, toks) with the token array materialized across a
    repartition exchange. Two birds: the shingle derivation is CPU-heavy
    per row, so parallelism must not be inherited from the file layout (a
    single small parquet file means a single scan task doing all the
    work), and the exchange pins the split() to exactly one evaluation
    per row (see ``_shingles_from``)."""
    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    return documents.select(
        "doc_id", tokens().alias("toks")
    ).repartition(parallelism)


def shingle_sets(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) inverted-index rows; distinct per doc."""
    return _tokenized(documents).select(
        "doc_id", F.explode(_shingles_from(F.col("toks"), n)).alias("shingle")
    )


def _validate_dropped_mass(max_dropped_mass, op: str) -> None:
    """Unconditional knob validation (r8 review): a mistyped value must
    fail at construction even when max_df is absent."""
    if max_dropped_mass is not None and not (
        0.0 <= float(max_dropped_mass) <= 1.0
    ):
        raise ValueError(
            f"{op}: max_dropped_mass must be in [0, 1] or None, "
            f"got {max_dropped_mass}"
        )


def _guard_df_saturation(df_table, max_df, max_dropped_mass, op: str):
    """Shared saturation guard for every df-capped inverted-index miner
    (r8; SCALE.md r7b measured the failure mode this encodes): given the
    (key, df) table the miner already derives, measure the fraction of
    OCCURRENCE mass (sum of df) the cap would drop and raise past
    ``max_dropped_mass``. One bounded-output eager aggregate — the
    kmeans/waterfill collect convention. The index is deliberately NOT
    persisted across guard + main plan: measured slower than recompute
    (isolated A/B in ngram_jaccard_pairs' comment)."""
    if max_dropped_mass is None or max_df is None:
        return
    sat = df_table.agg(
        F.coalesce(F.sum("df"), F.lit(0)).alias("total"),
        F.coalesce(
            F.sum(F.when(F.col("df") > max_df, F.col("df"))), F.lit(0)
        ).alias("dropped"),
    ).collect()[0]
    if sat["total"] > 0 and (
        sat["dropped"] > float(max_dropped_mass) * sat["total"]
    ):
        raise ValueError(
            f"{op}: max_df={max_df} would drop "
            f"{sat['dropped']}/{sat['total']} "
            f"({sat['dropped'] / sat['total']:.0%}) of the gram "
            "occurrence mass — the capped index is saturated and "
            "recall collapses toward 0 (SCALE.md r7b measured this at "
            "100x duplication). Raise max_df above the per-gram "
            "replica multiplicity, use minhash_lsh_candidates (its "
            "band buckets stay recall-robust under duplication — at "
            "the cost of quadratic per-group candidate volume, "
            "measured 25.8x wall at 100x replication, SCALE.md r9), "
            "or pass max_dropped_mass=None to proceed anyway"
        )


def _guard_bucket_saturation(cell_table, max_bucket, max_dropped_mass, op: str):
    """Bucket-population twin of ``_guard_df_saturation`` (r9, r8
    verdict #3 — the last silent lossy cap): given the (cell,
    population) table an LSH-family self-join derives anyway, measure
    the fraction of banded-index row mass the ``max_bucket`` cell cap
    would drop and raise past ``max_dropped_mass``. A saturated cap
    silently deletes whole mega-buckets — and when duplication is dense
    enough, the SAME doc group saturates ALL bands, so recall collapses
    to zero exactly like the df cap one level down. One bounded-output
    eager aggregate (the kmeans collect convention)."""
    if max_dropped_mass is None or max_bucket is None:
        return
    sat = cell_table.agg(
        F.coalesce(F.sum("df"), F.lit(0)).alias("total"),
        F.coalesce(
            F.sum(F.when(F.col("df") > max_bucket, F.col("df"))), F.lit(0)
        ).alias("dropped"),
    ).collect()[0]
    if sat["total"] > 0 and (
        sat["dropped"] > float(max_dropped_mass) * sat["total"]
    ):
        raise ValueError(
            f"{op}: max_bucket={max_bucket} would drop "
            f"{sat['dropped']}/{sat['total']} "
            f"({sat['dropped'] / sat['total']:.0%}) of the banded index "
            "mass — duplication is dense enough that the cap deletes "
            "the very buckets holding the duplicates, and a group too "
            "big for one band is too big for all of them (recall -> 0, "
            "not graceful). Raise max_bucket above the duplicate-group "
            "size, pre-collapse exact duplicates (exact_dedup) before "
            "mining, or pass max_dropped_mass=None to proceed anyway"
        )


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    max_dropped_mass: float | None = 0.5,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard, via the inverted shingle
    index: |A ∩ B| from the self-join, |A ∪ B| = |A| + |B| - |A ∩ B|.
    Only docs sharing a shingle are paired — the join, not a cross
    product, bounds the work.

    The self-join fans out quadratically in each shingle's document
    frequency, and AQE coalesces the small pre-join shuffle into too few
    tasks to absorb that fan-out — so the index is explicitly hash-
    partitioned on the join key (user repartitions are not coalesced).
    ``max_df`` drops shingles appearing in more than that many documents
    (stopword-like; they contribute candidates, not discrimination) —
    the scale path for skewed corpora; leave None for exact Jaccard.

    max_df is a RECALL knob, and it can go BLIND (SCALE.md r7b, measured):
    at 100x duplication every gram's df exceeds the cap, the capped
    index drops ALL gram mass, and the miner silently returns 0 pairs.
    When ``max_df`` is set, the guard below measures the fraction of
    gram OCCURRENCE mass the cap removes (one bounded-output aggregate
    over the index the operator builds anyway — the kmeans eager-check
    convention) and raises once it exceeds ``max_dropped_mass``
    (default 0.5; pass None to skip the check and its job). On organic
    corpora the dropped fraction is ~0 (sf0.1 max gram df is 25); a
    trip means the corpus is duplication-heavy — raise max_df above the
    replica multiplicity, or switch to `minhash_lsh_candidates`, which
    buckets on signature bands instead of raw gram df and stays
    recall-robust under duplication.
    """
    from pyspark.sql.window import Window

    # Per-doc set sizes are computed map-side from the shingle ARRAY and
    # carried through the explode on every index row — no separate sizes
    # aggregation, no persist, no back-joins. Sizes therefore come from
    # the *uncapped* sets, so Jaccard denominators stay exact even when
    # max_df prunes the candidate-generation side. The join key is
    # xxhash64(shingle): an 8-byte long instead of a ~25-byte string
    # (smaller shuffle, cheaper comparisons); a 64-bit collision would
    # merge two shingles, with probability ~k^2/2^64 — immaterial even at
    # 10^12 corpus shingles, and the sf oracle verifies exactness on real
    # data. Measured at sf0.1: 2.9 s -> 1.7 s vs the persist+back-join
    # string-keyed form.
    _validate_dropped_mass(max_dropped_mass, "ngram_jaccard_pairs")
    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    sized = _tokenized(documents).select(
        "doc_id", _shingles_from(F.col("toks"), n).alias("sh_arr")
    )
    index = sized.select(
        "doc_id",
        F.size("sh_arr").alias("set_size"),
        F.explode(F.transform("sh_arr", lambda s: F.xxhash64(s))).alias("sh"),
    )
    # guard NOT persisted across guard + main plan: measured (isolated
    # median-of-3, sf0.1) the persist made the pair +0.91 s vs +0.44 s
    # recomputed — materializing the exploded index costs more than the
    # second tokenize pass and breaks the whole-stage pipeline into the
    # repartition (r8 review suggestion, rejected on measurement).
    _guard_df_saturation(
        index.groupBy("sh").agg(F.count(F.lit(1)).alias("df")),
        max_df,
        max_dropped_mass,
        "ngram_jaccard_pairs",
    )
    # explicit hash partitioning on the join key: the quadratic post-join
    # fan-out is invisible to AQE's pre-join coalescing
    capped = index.repartition(parallelism, "sh")
    if max_df is not None:
        # df cap as a whole-partition window count over the partitioning
        # the self-join needs anyway: one exchange serves the cap AND both
        # join inputs (an agg+join formulation costs an extra shuffle)
        capped = (
            capped.withColumn(
                "df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
            )
            .where(F.col("df") <= max_df)
            .drop("df")
        )
    a, b = capped.alias("a"), capped.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.min(F.col("a.set_size")).alias("size_a"),
            F.min(F.col("b.set_size")).alias("size_b"),
        )
    )
    jac = F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter"))
    # Filter AND emit the UNROUNDED jaccard (r9; the filter went
    # unrounded in r8). The emitted ROUND(jac, 4) was the last rounding
    # of a double ratio of integers on this surface — the exact r8
    # _det_avg tie mechanism: 84 rationals with denominator <= 4000
    # (measured; e.g. 57/800 = 0.07125 -> Spark 0.0713, DuckDB 0.0712)
    # round differently because Spark HALF_UPs the shortest decimal
    # string while DuckDB re-rounds the product x*1e4. The raw quotient
    # of the same int64s is the same correctly-rounded IEEE double in
    # both engines at EVERY input — deterministic too, because n_inter
    # and the sizes are exact integer aggregates.
    return inter.where(jac >= threshold).select(
        "doc_a", "doc_b", jac.alias("jaccard")
    )


def jaccard_prefix_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard pairs via PREFIX FILTERING (the AllPairs /
    PPJoin family) — the lossless alternative to ``max_df``: under a
    global rarest-first shingle order, a pair with Jaccard >= t must
    share a shingle within each side's first |x| - ceil(t*|x|) + 1
    shingles (prefix-filter lemma with alpha = ceil(t*max(|x|,|y|))),
    so only PREFIXES are indexed and joined. Hot stopword-like shingles
    sort LAST and rarely enter any prefix, so the candidate fan-out
    collapses without dropping a single true pair — where ``max_df``
    trades recall for the same effect.

    Shape: one df aggregation (rarest-first rank), one sorted-array
    rebuild per doc, prefix explode + hash self-join on the explicit
    repartition (the quadratic-fan-out rule), candidate pairs verified
    by one array_intersect per pair against the full sorted sets joined
    back by doc_id. Output is IDENTICAL to ``ngram_jaccard_pairs`` at
    the same threshold — the driver oracle for both is the same SQL.

    Measured regime (SCALE.md round-4b): the prefix keeps ~(1-t) of
    each doc's shingles, so the win scales with the threshold AND with
    index heat. On the dup-dense 10x corpus at t=0.8 it is 2.7x FASTER
    than the full inverted index (9.0 s vs 24.4 s — candidates collapse
    ~25x); at t=0.2 the prefix retains 80% of the index and the extra
    stages (df rank, sorted rebuild, verify back-joins) make it slower.
    Use it for high-threshold near-dup mining on duplication-heavy
    corpora; use ``ngram_jaccard_pairs`` (optionally df-capped) for
    weak-threshold sweeps on organic data.

    The final filter compares the UNROUNDED jaccard (r8 — the r6 ADVICE
    boundary retired): the prefix lemma prunes on TRUE j >= t, so the
    retained-pair filter uses the same exact quotient, and `jaccard` is
    rounded only for the emitted surface. The identity with
    ``ngram_jaccard_pairs`` is now exact at every union size, not just
    below the ~1e4-shingle rounding-granularity bound.
    """
    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    # persist: the sized sets feed the prefix index AND both verify joins
    sized = (
        _tokenized(documents)
        .select(
            "doc_id",
            F.transform(
                _shingles_from(F.col("toks"), n), lambda s: F.xxhash64(s)
            ).alias("sh_arr"),
        )
        .transform(track_persist)
    )
    dfs = (
        sized.select("doc_id", F.explode("sh_arr").alias("sh"))
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    # global rarest-first order: sort each doc's set by (df, sh); the
    # dfs join broadcasts (shingle-vocab bounded) under AQE
    ordered = (
        sized.select("doc_id", F.explode("sh_arr").alias("sh"))
        .join(dfs, "sh")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("df", "sh"))),
                lambda s: s["sh"],
            ).alias("sorted_sh")
        )
    )
    t = float(threshold)
    prefix_len = (
        F.size("sorted_sh")
        - F.ceil(F.size("sorted_sh") * F.lit(t)).cast("int")
        + 1
    )
    # persist: the self-join's two sides cannot share an exchange when
    # the planner broadcasts one of them (a BroadcastExchange never
    # reuses a shuffle Exchange), so without the persist the whole
    # df-rank + sorted-rebuild pipeline ran TWICE (r14 plan audit; the
    # r2 "persist self-join inputs" lesson applied one operator up)
    index = ordered.select(
        "doc_id",
        F.explode(
            F.slice("sorted_sh", 1, F.greatest(prefix_len, F.lit(0)))
        ).alias("sh"),
    ).repartition(parallelism, "sh").transform(track_persist)
    a, b = index.alias("a"), index.alias("b")
    # broadcast the CANDIDATE side of the verify joins (r14, measured
    # 3.0 -> 1.8 s at sf0.1 with every A/B pass separated): without the
    # hint the planner broadcasts the full corpus ARRAY frame into both
    # verify joins — two driver round-trips shipping every document's
    # shingle array — while the prefix-pruned candidate list is orders
    # smaller in this operator's design regime (high thresholds, where
    # the prefix keeps ~(1-t) of each set). Both choices are broadcast
    # gambles on a size-unknown frame; this one picks the structurally
    # smaller side, and a pathological candidate explosion fails LOUD
    # at the 8 GB broadcast cap instead of silently shuffling the
    # corpus (the repo's loud-guard convention).
    cand = F.broadcast(
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    arr = sized.select("doc_id", "sh_arr")
    verified = (
        cand.join(arr.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("sh_arr", "arr_a")
        .join(arr.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("sh_arr", "arr_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("arr_a", "arr_b")).alias("n_inter"),
            F.size("arr_a").alias("size_a"),
            F.size("arr_b").alias("size_b"),
        )
    )
    jac = F.col("n_inter") / (
        F.col("size_a") + F.col("size_b") - F.col("n_inter")
    )
    # unrounded filter AND surface (r9) — must mirror ngram_jaccard_pairs
    # exactly (the two share the driver oracle); see the tie-class note
    # there for why the 4-decimal round was retired from the surface
    return verified.where(jac >= threshold).select(
        "doc_a", "doc_b", jac.alias("jaccard")
    )


def jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    strategy: str = "auto",
    max_df: int | None = None,
    max_dropped_mass: float | None = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard pairs with strategy dispatch (r5, the
    embedding_near_dup pattern): ``ngram_jaccard_pairs`` (inverted
    index, optional lossy ``max_df``) and ``jaccard_prefix_pairs``
    (PPJoin prefix filter, lossless) produce IDENTICAL output at the
    same threshold, so the choice is purely a cost call — and the
    crossover is measured, not guessed (SCALE.md round-4b): the prefix
    filter keeps ~(1-t) of each doc's shingles and pays ~2 s of fixed
    stages (df rank, sorted rebuild, verify back-joins), so it wins
    only at HIGH thresholds on duplication-heavy indexes (2.7x at
    t=0.8 on the dup-dense 10x corpus) and loses everywhere else.

    - ``"auto"``: ``"prefix"`` at threshold >= 0.8, else
      ``"inverted"`` — the measured crossover.
    - ``"inverted"`` / ``"prefix"``: force a branch (the caller knows
      their corpus's duplication profile better than a heuristic).

    ``max_df`` applies only to the inverted branch (the prefix filter
    is the lossless alternative to it); passing both raises so a
    recall cap can't silently ride along with a lossless strategy.
    ``max_dropped_mass`` forwards to the inverted branch's saturation
    guard (the r6 swallowed-kwarg audit: dispatchers must forward every
    strategy-specific tuning knob). A NON-DEFAULT ``max_dropped_mass``
    with the prefix branch (explicit or auto-resolved) raises too —
    the prefix filter has no df cap, so there is no saturation to
    guard, and a caller tightening the guard to e.g. 0.1 must not
    silently get no guard at all (r8 ADVICE; the streaming_funnel
    timeout_minutes rule: validated-but-unused knob combinations are
    rejected, never dropped).
    """
    if max_dropped_mass is not None and not (
        0.0 <= float(max_dropped_mass) <= 1.0
    ):
        raise ValueError(
            "jaccard_pairs: max_dropped_mass must be in [0, 1] or "
            f"None, got {max_dropped_mass}"
        )
    if strategy == "auto":
        strategy = "prefix" if threshold >= 0.8 else "inverted"
    if strategy == "prefix":
        if max_df is not None:
            raise ValueError(
                "jaccard_pairs: max_df is an inverted-index recall cap; "
                "the prefix strategy is lossless and ignores it — drop "
                "max_df or use strategy='inverted'"
            )
        if max_dropped_mass != 0.5:  # the signature default
            raise ValueError(
                "jaccard_pairs: max_dropped_mass tunes the inverted "
                "branch's df-saturation guard; the prefix strategy has "
                "no df cap and therefore no guard — drop the non-default "
                f"max_dropped_mass={max_dropped_mass!r} or use "
                "strategy='inverted'"
            )
        return jaccard_prefix_pairs(documents, n=n, threshold=threshold)
    if strategy == "inverted":
        return ngram_jaccard_pairs(
            documents,
            n=n,
            threshold=threshold,
            max_df=max_df,
            max_dropped_mass=max_dropped_mass,
        )
    raise ValueError(
        f"jaccard_pairs: unknown strategy {strategy!r} "
        "(auto | inverted | prefix)"
    )


def incremental_dedup(
    new_docs: DataFrame, seen: DataFrame, broadcast_seen: bool = False
) -> DataFrame:
    """Dedup a new batch against the already-ingested corpus by content
    fingerprint: keep only new docs whose normalized content never
    appeared before. ``seen`` needs a ``content_md5`` column — the
    16-byte/doc artifact ``text.fingerprint`` writes once per ingest, so
    the 100 TB history is never re-read, only its fingerprint table.

    Scale: a left_anti join on the 16-byte key. With a small seen set
    (early corpus) pass ``broadcast_seen=True`` for a shuffle-free probe;
    at steady state the anti-join shuffles new-batch fingerprints only
    (the batch is the small side at 100 TB history). Compose with
    ``exact_dedup`` first to also collapse duplicates *within* the batch.
    """
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    keyed = new_docs.withColumn("content_md5", F.md5(norm))
    seen_keys = seen.select("content_md5").distinct()
    if broadcast_seen:
        seen_keys = F.broadcast(seen_keys)
    return keyed.join(seen_keys, "content_md5", "left_anti").drop("content_md5")


def _bloom_positions(key, m_bits: int, k: int):
    """k Bloom bit positions for a key, from the portable md5-derived
    hash family (replayable in any ANSI engine): position_i =
    int(md5(key || '#i')[:8 hex]) mod m_bits. 8 hex digits < 2^32, so
    the conv result fits a long with no sign trouble."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat(key, F.lit(f"#{i}"))), 1, 8),
                    16,
                    10,
                ).cast("bigint")
                % m_bits
            )
            for i in range(k)
        ]
    )


def _bloom_word_rows(docs: DataFrame, m_bits: int, k: int, key: str):
    """(word_idx, w) single-bit rows for every position of every key —
    the pre-aggregation form shared by build and update."""
    return docs.select(
        F.explode(_bloom_positions(F.col(key), m_bits, k)).alias("pos")
    ).select(
        F.shiftright("pos", 6).alias("word_idx"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))"
        ).alias("w"),
    )


def bloom_bits(
    seen: DataFrame, m_bits: int = 4096, k: int = 3, key: str = "content_md5"
) -> DataFrame:
    """The Bloom filter as a PACKED relation: (word_idx, word) rows
    where ``word`` ORs the 64 bits of that index range — at most
    ``m_bits / 64`` rows no matter how large the seen corpus is (a
    billion-key history at 10 bits/key packs into ~2.6 GB of longs,
    where the naive one-row-per-set-bit form would be 64x that and
    unbroadcastable). This is the artifact a 100 TB ingest maintains
    incrementally (monotone — see ``bloom_bits_update``) and broadcasts
    to probe new data, instead of shuffling every new batch against the
    full fingerprint history. Built with one bit_or aggregation —
    map-side partial combine, shuffle bounded by the word count."""
    return (
        _bloom_word_rows(seen, m_bits, k, key)
        .groupBy("word_idx")
        .agg(F.bit_or("w").alias("word"))
    )


def bloom_bits_update(
    bits: DataFrame,
    ingested: DataFrame,
    m_bits: int = 4096,
    k: int = 3,
    key: str = "content_md5",
) -> DataFrame:
    """Incremental maintenance of the packed Bloom relation: bit_or the
    newly ingested batch's words into the existing table. The bit set
    is monotone and bounded by ``m_bits / 64`` rows, so the artifact an
    ingest pipeline persists is this table, re-written per batch at a
    cost proportional to the BATCH (plus a word-count-bounded
    aggregation) — the 100 TB history is never rescanned. ``m_bits`` /
    ``k`` must match the values the table was built with."""
    new_words = _bloom_word_rows(ingested, m_bits, k, key).unionByName(
        bits.select("word_idx", F.col("word").alias("w"))
    )
    return new_words.groupBy("word_idx").agg(F.bit_or("w").alias("word"))


def incremental_dedup_bloom(
    new_docs: DataFrame,
    seen: DataFrame,
    m_bits: int | None = None,
    k: int = 3,
) -> DataFrame:
    """``incremental_dedup`` with a Bloom prefilter — EXACT semantics,
    sub-linear contact with the seen corpus. A new doc whose k bit
    positions are not ALL set in the seen filter is definitely unseen
    (Bloom filters have no false negatives) and passes through without
    ever joining the history; only the "maybe seen" sliver (true dups +
    the false-positive rate) is verified by the exact fingerprint
    anti-join, which removes Bloom false positives.

    Scale: the 100 TB fingerprint history is touched by (a) the bounded
    ``bloom_bits`` build — one pass, reusable/monotone across ingests —
    and (b) the verify anti-join restricted to maybe-seen candidates.
    At steady state (most new docs genuinely new) the expensive join
    processes dup_rate + FPR of the batch instead of all of it. The
    packed word table (m_bits/64 rows of longs) broadcasts while
    m_bits <= 2^30 (~16M rows / ~130 MB — up to ~100M-key histories at
    10 bits/key), making the probe shuffle-free; beyond that the probe
    degrades to a word_idx-keyed join of k*|batch| probe rows against
    the word-bounded table — still never rescanning the history. The
    only batch-sized shuffle is the doc_id distinct.
    FPR ~= (1 - exp(-k*n/m))^k — the default auto-sizes m_bits to ~10
    bits per seen key (FPR ~1% at k=3; one count() scalar to the
    driver), because an undersized filter saturates and every batch doc
    degrades to the verify join. The output is exact at ANY setting,
    the knob only moves the verify-join volume.
    """
    if m_bits is None:
        # ~10 bits/key, power of two, floor 1024 so tiny corpora do not
        # produce a degenerate modulus
        m_bits = max(1024, 1 << (10 * max(seen.count(), 1)).bit_length())
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    # persist: the keyed batch feeds the probe AND both output branches
    keyed = new_docs.withColumn("content_md5", F.md5(norm)).transform(track_persist)
    words = bloom_bits(seen, m_bits=m_bits, k=k)
    if m_bits <= (1 << 30):
        # packed words: <=16M long rows even at a 2^30-bit filter —
        # broadcasts comfortably; beyond that the probe degrades to a
        # word_idx-keyed shuffle join of k*|batch| probe rows against
        # the word-bounded table, still never rescanning the history
        words = F.broadcast(words)
    probe = keyed.select(
        "doc_id",
        F.explode(
            _bloom_positions(F.col("content_md5"), m_bits, k)
        ).alias("pos"),
    ).select(
        "doc_id",
        F.shiftright("pos", 6).alias("word_idx"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))"
        ).alias("mask"),
    )
    # >=1 unset bit => definitely new; the left join against the
    # broadcast word table never shuffles the batch
    definite_new = (
        probe.join(words, "word_idx", "left")
        .where(
            F.col("word").isNull()
            | (F.col("word").bitwiseAND(F.col("mask")) == 0)
        )
        .select("doc_id")
        .distinct()
        .transform(track_persist)
    )
    maybe_seen = keyed.join(definite_new, "doc_id", "left_anti")
    seen_keys = seen.select("content_md5").distinct()
    verified_new = maybe_seen.join(seen_keys, "content_md5", "left_anti")
    passed = keyed.join(definite_new, "doc_id", "left_semi")
    return passed.unionByName(verified_new).drop("content_md5")


def shared_ngram_fraction(
    documents: DataFrame, n: int = 3, min_df: int = 2
) -> DataFrame:
    """Cross-document duplicated n-gram fraction — the RefinedWeb/Gopher
    dup-quality signal: for each document, what share of its n-gram
    positions is covered by grams that also appear in at least
    ``min_df`` distinct documents. High fractions flag boilerplate and
    template text that exact/near dedup keeps (the doc as a whole is
    unique) but that still teaches a model to repeat itself.

    Distinct from ``repetition_stats`` (WITHIN-doc repetition) and
    ``ngram_jaccard_pairs`` (pairwise overlap): this is a per-doc
    corpus-level signal with no self-join at all — one explode, one
    gram-frequency shuffle, one join back (AQE broadcasts the gram
    count table when it is vocab-bounded, the common case), one doc
    rollup. The per-doc gram total is carried map-side from the array,
    not re-aggregated. Emits integer surfaces plus a floored
    parts-per-million fraction (no float rounding ties possible).
    """
    grams_arr = _tokenized(documents).select(
        "doc_id", _position_grams(F.col("toks"), n).alias("grams")
    )
    # positions, NOT distinct grams — the fraction weights by occurrence.
    # persist: the explode pipeline has three consumers (gram frequency,
    # the hit join, per-doc totals); without it the tokenize+gram stage
    # re-runs per consumer (the bigram_logprob/source_overlap lesson)
    exploded = grams_arr.select(
        "doc_id",
        F.size("grams").alias("n_grams"),
        F.explode_outer(
            F.transform("grams", lambda g: F.xxhash64(g))
        ).alias("gh"),
    ).transform(track_persist)
    dfs = (
        exploded.where(F.col("gh").isNotNull())
        .select("doc_id", "gh")
        .distinct()
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
        .select("gh")
    )
    hits = exploded.join(dfs, "gh", "left_semi")
    shared = hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shared"))
    totals = exploded.select("doc_id", "n_grams").distinct()
    out = totals.join(shared, "doc_id", "left").select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
    )
    ppm = F.when(F.col("n_grams") == 0, F.lit(0)).otherwise(
        F.floor(F.col("n_shared") * F.lit(1000000.0) / F.col("n_grams"))
    )
    return out.withColumn("shared_ppm", ppm.cast("bigint"))


def keep_canonical(documents: DataFrame, pairs: DataFrame) -> DataFrame:
    """Turn a near-dup pair graph into the ACTION list a curation run
    executes: every member of a transitive cluster maps to one
    deterministic keeper (the minimum doc_id — the same representative
    ``dedup_clusters`` and ``cluster_safe_split`` use), and each doc is
    labeled keep/drop. Singletons keep themselves. This is the step
    between pair MINING (Jaccard/MinHash/SimHash/embedding) and the
    actual corpus rewrite; composing it with any miner gives end-to-end
    fuzzy dedup with one join against the corpus.

    Scale: label propagation on the (tiny) pair graph, then one
    broadcast-or-hash join of the corpus against the cluster labels —
    the corpus shuffles on nothing wider than doc_id. Returns
    (doc_id, cluster_id, keep_doc_id, action)."""
    labels = dedup_clusters(pairs)
    keyed = documents.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
    )
    return keyed.select(
        "doc_id",
        "cluster_id",
        # the representative IS the min reachable doc_id by construction
        F.col("cluster_id").alias("keep_doc_id"),
        F.when(F.col("doc_id") == F.col("cluster_id"), F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("action"),
    )


def cluster_diversity_sample(
    documents: DataFrame, pairs: DataFrame, m: int = 2
) -> DataFrame:
    """Soft dedup: keep up to ``m`` members of every near-dup cluster
    instead of collapsing to one canonical doc — the curation middle
    ground between ``keep_canonical`` (m=1, maximal reduction) and no
    dedup at all. Production mixes use it to preserve legitimate
    variation (boilerplate-sharing pages, translations, template
    families) while still capping the memorization mass any one cluster
    contributes.

    Retention rank is INTEGER-deterministic: within a cluster, docs are
    ranked by (token count DESC, doc_id ASC) — longest-first, the
    "keep the most complete variant" heuristic — so both engines rank
    identically with no float tie anywhere. Singletons are their own
    cluster and always survive (rank 1).

    Scale: label propagation over the (tiny) pair graph, one join of
    the corpus against the labels, and a window partitioned BY CLUSTER
    (bounded groups — never a corpus-wide single-partition sort).
    Returns (doc_id, cluster_id, n_tokens, rank_in_cluster, kept).
    """
    if m < 1:
        raise ValueError(f"cluster_diversity_sample: m must be >= 1, got {m}")
    labels = dedup_clusters(pairs)
    sized = documents.select(
        "doc_id", F.size(tokens()).cast("bigint").alias("n_tokens")
    )
    keyed = sized.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        "n_tokens",
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id")
    )
    return keyed.select(
        "doc_id",
        "cluster_id",
        "n_tokens",
        F.row_number().over(w).cast("bigint").alias("rank_in_cluster"),
    ).withColumn(
        "kept",
        (F.col("rank_in_cluster") <= m).cast("bigint"),
    )


def tfidf_ngram_cosine_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.3,
    max_df: int | None = None,
    max_dropped_mass: float | None = 0.5,
) -> DataFrame:
    """Near-dup pairs by cosine over TF-IDF-weighted n-gram vectors —
    the weighted refinement of ``ngram_jaccard_pairs``: a shared RARE
    shingle (high IDF) counts for much more than a shared boilerplate
    one, so template-heavy corpora stop producing false near-dups on
    their shared chrome. Same inverted-index shape as Jaccard (only
    docs sharing a shingle are ever paired; ``max_df`` drops
    stopword-like hot shingles), so the scale properties carry over.

    Determinism: weights are fixed-point milli-units
    (``round(tf * ln(N/df) * 1000)`` as bigint), so dot products and
    norms are exact integer sums — order-independent under any
    partitioning, and replayable by any ANSI engine (the ``_det_avg``
    pattern applied to a bilinear form). Bounds: |w| < 2^31 holds while
    tf * ln(N/df) < 2.1e6, and the norm sum stays in int64 while
    sum(tf^2) * ln(N)^2 * 1e6 < 9e18 per doc — generous at any real
    document size. ``sim`` is computed from the exact integers, so the
    threshold cut is reproducible too.
    """
    from pyspark.sql.window import Window

    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    grams = _tokenized(documents).select(
        "doc_id",
        F.explode(_position_grams(F.col("toks"), n)).alias("gram"),
    ).select("doc_id", F.xxhash64("gram").alias("gh"))
    # persist: the tf table feeds the df aggregation AND the weighted
    # index (two consumers of the tokenize+gram+count pipeline)
    tf = grams.groupBy("doc_id", "gh").agg(
        F.count(F.lit(1)).alias("tf")
    ).transform(track_persist)
    dfs = tf.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
    # saturation guard (r8, shared with the Jaccard family): here the
    # df table reads the PERSISTED tf, so the check costs one cached agg
    _validate_dropped_mass(max_dropped_mass, "tfidf_ngram_cosine_pairs")
    _guard_df_saturation(
        dfs, max_df, max_dropped_mass, "tfidf_ngram_cosine_pairs"
    )
    n_docs = documents.count()  # one scalar to the driver
    weighted = tf.join(dfs, "gh")  # AQE broadcasts the vocab-bounded dfs
    if max_df is not None:
        weighted = weighted.where(F.col("df") <= max_df)
    wi = F.round(
        F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")) * 1000.0
    ).cast("bigint")
    # per-doc norm as a window over doc_id: one exchange, no agg+back-join
    wnorm = Window.partitionBy("doc_id")
    index = (
        weighted.select("doc_id", "gh", wi.alias("wi"))
        .withColumn("nrm", F.sum(F.col("wi") * F.col("wi")).over(wnorm))
        .where(F.col("wi") != 0)  # df == n_docs terms contribute nothing
    )
    # explicit hash partitioning on the join key: quadratic post-join
    # fan-out is invisible to AQE's pre-join coalescing (repo convention)
    capped = index.repartition(parallelism, "gh")
    a, b = capped.alias("a"), capped.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.gh") == F.col("b.gh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.sum(F.col("a.wi") * F.col("b.wi")).alias("dot"),
            F.min(F.col("a.nrm")).alias("na"),
            F.min(F.col("b.nrm")).alias("nb"),
        )
    )
    sim = F.col("dot") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    # unrounded surface (r9, the jaccard tie-class fix): dot/na/nb are
    # exact int64 aggregates, so cast->multiply->sqrt->divide is the
    # same correctly-rounded IEEE double sequence in both engines —
    # deterministic and hash-safe with no 4-decimal tie class at all.
    # sim > 0 always (tf-idf weights are non-negative and paired grams
    # have wi != 0 on both sides), so no -0.0 canonicalization needed.
    return (
        pairs.where(sim >= threshold)
        .select("doc_a", "doc_b", sim.alias("cosine_tfidf"))
    )


def dedup_stats(documents: DataFrame, by: str = "source") -> DataFrame:
    """Per-group duplication report: how much of each source is exact-
    duplicate content (the go/no-go number a curation run reports before
    spending GPU time). distinct-fingerprint counting reuses the exact-
    dedup key; one grouped agg with map-side partials — count(DISTINCT)
    over the 16-byte md5, never raw text."""
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return (
        documents.select(by, F.md5(norm).alias("content_md5"))
        .groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("content_md5").alias("n_distinct"),
            # raw IEEE quotient of exact ints (r10 tie-class retirement)
            (
                (F.count(F.lit(1)) - F.countDistinct("content_md5")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("dup_rate"),
        )
    )


def decontaminate(
    documents: DataFrame, benchmark: DataFrame, n: int = 3
) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing at
    least one word n-gram with a benchmark/eval set — the standard
    pre-training hygiene step (eval questions must not leak into the
    corpus). Returns (doc_id, n_hits, contaminated).

    Shape: the benchmark's distinct shingles are the SMALL side (eval
    suites are thousands of rows, the corpus is the 100 TB side), so the
    probe is a broadcast semi-ish join against the corpus's exploded
    shingle index — the corpus never shuffles; the per-doc hit count is
    a partial-aggregated groupBy on doc_id scalars.
    ``benchmark`` needs a ``text`` column."""
    bench_shingles = (
        benchmark.select(F.explode(_shingles(n)).alias("shingle")).distinct()
    )
    hits = (
        shingle_sets(documents, n)
        .join(F.broadcast(bench_shingles), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        documents.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def minhash_signatures(
    documents: DataFrame,
    num_hashes: int = 32,
    n: int = 3,
    shingle_hash: str = "xxhash64",
) -> DataFrame:
    """MinHash signatures: per permutation i, min over shingles of
    h_i(base(shingle)) with h_i(x) = (a_i*x + b_i) mod p. Fixed (a, b)
    per index — fully deterministic, no RNG at plan time. One explode +
    one groupBy; the signature is an array column.

    ``shingle_hash`` picks the base hash: ``xxhash64`` (JVM codegen, the
    production default) or ``portable`` — the first 32 bits of
    md5(shingle), which any ANSI engine reproduces exactly
    (``CAST('0x'||substr(md5(s),1,8) AS BIGINT)`` in DuckDB), making the
    whole signature — and therefore LSH candidates and agreement counts —
    oracle-checkable value by value. Both stay below p, so the h_i
    arithmetic never overflows int64."""
    if shingle_hash == "portable":
        # 8 hex chars -> 32-bit value; 2^32 < _HASH_P so no pmod needed
        base = F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast(
            "bigint"
        )
    else:
        base = F.pmod(F.xxhash64("shingle"), F.lit(_HASH_P))
    hashed = shingle_sets(documents, n).select(
        "doc_id",
        base.alias("h"),
    )
    mins = [
        F.min(((2 * i + 1) * F.col("h") + (7919 * i + 1)) % _HASH_P)
        .alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    sig = hashed.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id",
        F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("signature"),
    )


def minhash_lsh_candidates(
    documents: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    shingle_hash: str = "xxhash64",
    max_bucket: int | None = None,
    max_dropped_mass: float | None = 0.5,
) -> DataFrame:
    """Banded-LSH candidate pairs: slice each signature into ``bands``
    rows, hash the slice, self-join on (band, slice-hash). Candidates come
    out with their raw signature agreement count (``n_agree``, exact
    integer — the oracle-safe surface) and the estimated Jaccard
    (``est_jaccard`` = n_agree / num_hashes, the API convenience —
    tie-safe under 4-decimal ROUND only because num_hashes is a power
    of two, making every value k/num_hashes binary-exact; a non-power-
    of-two num_hashes would re-open the r9 rounded-ratio tie class).

    Candidate volume under duplication (measured r9, SCALE.md): a
    duplicate GROUP of g docs has near-identical signatures, so every
    band collides and the group alone yields C(g,2) candidates — all
    TRUE near-dup pairs, i.e. inherent output volume, not an index
    artifact. At 100x replication that is 25.8x wall (41 s at 500k
    docs): minhash pays for its duplication-robust recall with
    quadratic per-group candidates. ``max_bucket`` (r9) bounds the
    per-(band, bucket) cell population like simhash's cap, BUT unlike
    a df cap it drops true pairs — so the dropped-mass guard
    (``max_dropped_mass``, loud by default, explicit ``None`` opt-out)
    refuses a blinding cap, and the honest scale remediations are
    collapsing verbatim copies first (exact_dedup) or consuming the
    capped output as cluster seeds rather than an exhaustive pair
    list."""
    _validate_dropped_mass(max_dropped_mass, "minhash_lsh_candidates")
    if max_bucket is None and max_dropped_mass not in (None, 0.5):
        # r9 ADVICE: a caller tightening the guard without setting the
        # cap it guards would get no guard and no error — the same
        # validated-but-unused-knob class jaccard_pairs' prefix branch
        # rejects (r7 streaming_funnel rule)
        raise ValueError(
            "minhash_lsh_candidates: max_dropped_mass guards the "
            "max_bucket cell cap; with max_bucket=None there is no cap "
            "and no guard — drop the non-default "
            f"max_dropped_mass={max_dropped_mass!r} or set max_bucket"
        )
    if num_hashes < 1 or num_hashes & (num_hashes - 1):
        # est_jaccard = ROUND(n_agree / num_hashes, 4) is tie-safe ONLY
        # for power-of-two num_hashes (k/2^m is binary-exact, so both
        # engines see the true decimal tie and both round half-away);
        # any other denominator re-opens the r9 rounded-ratio tie class.
        # Construction-time raise per the r3 hypothesis lesson: bad
        # config must never become a silent cross-engine divergence.
        raise ValueError(
            "minhash_lsh_candidates: num_hashes must be a power of two "
            f"(got {num_hashes}) — the emitted est_jaccard rounds "
            "n_agree/num_hashes and only dyadic denominators are "
            "tie-safe across engines"
        )
    rows_per_band = num_hashes // bands
    # persist: the signature pipeline (explode + 32-way min agg) feeds
    # both sides of the self-join and would otherwise run twice
    sig = minhash_signatures(documents, num_hashes, n, shingle_hash).transform(track_persist)
    banded = sig.select(
        "doc_id",
        "signature",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.slice("signature", i * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "signature", "bb.band", "bb.bucket")
    # explicit partitioning on the bucket key: the post-join fan-out is
    # quadratic per bucket, which AQE's pre-join coalescing can't see
    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    banded = banded.repartition(parallelism, "band", "bucket")
    if max_bucket is not None:
        from pyspark.sql.window import Window

        if max_dropped_mass is not None:
            _guard_bucket_saturation(
                banded.groupBy("band", "bucket").agg(
                    F.count(F.lit(1)).alias("df")
                ),
                max_bucket,
                max_dropped_mass,
                "minhash_lsh_candidates",
            )
        bw = Window.partitionBy("band", "bucket")
        banded = (
            banded.withColumn("_bsz", F.count(F.lit(1)).over(bw))
            .where(F.col("_bsz") <= max_bucket)
            .drop("_bsz")
        )
    a, b = banded.alias("a"), banded.alias("b")
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    # compute the signature agreement BEFORE deduping band collisions:
    # the est_jaccard is band-independent, so the dedupe then shuffles
    # three narrow columns instead of two 32-long signatures per pair
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .select(
            "doc_a",
            "doc_b",
            agree.cast("bigint").alias("n_agree"),
            F.round(agree / F.lit(num_hashes), 4).alias("est_jaccard"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def _closure_uf(batches, max_nodes: int | None = None):
    """Partition-local union-find over an edge batch iterator: emits one
    (node, root) row per node the partition saw, root = minimum node id
    of its partition-local connected component. Union keeps the smaller
    root as the class representative, so roots are always reachable
    node ids and never invent values. Module-level so reused Python
    workers keep the code object across tasks (guide §4.5 shape).

    r14 hardening (the r13 verdict's hub-skew watch item): batches are
    consumed STREAMING — the edge list is never materialized, so task
    memory is O(distinct nodes in the partition), not O(edges) — and
    ``max_nodes`` bounds that irreducible node set. The distributed
    caller partitions both edge orientations by ``src``, so every edge
    incident to a mega-hub hashes to one partition and that partition's
    node set grows with the hub's DEGREE no matter how many partitions
    the edge-count derivation asked for. Exceeding the bound raises
    with remediation instead of silently OOM-ing the Python worker."""
    import pandas as pd

    parent: dict = {}
    nodes: set = set()

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for b in batches:
        src = b["src"].tolist()
        dst = b["dst"].tolist()
        nodes.update(src)
        nodes.update(dst)
        if max_nodes is not None and len(nodes) > max_nodes:
            raise ValueError(
                "dedup_clusters: a single partition's union-find holds "
                f"over {max_nodes} distinct nodes — a hub node whose "
                "degree exceeds the per-task bound (every edge incident "
                "to one node hashes to that node's partition). Cap hub "
                "degree upstream (the miners' max_df / max_bucket / "
                "max_cell population caps exist for exactly this), or "
                "raise uf_max_partition_nodes if the workers genuinely "
                "have the memory"
            )
        for a, b_ in zip(src, dst):
            ra, rb = find(a), find(b_)
            if ra == rb:
                continue
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    if not nodes:
        return
    out_n = list(nodes)
    out_r = [find(v) for v in out_n]
    yield pd.DataFrame({"node": out_n, "root": out_r})


def _closure_uf_bounded(max_nodes: int):
    """mapInPandas adapter binding the per-partition node bound — a
    module-level factory, not a lambda, so reused Python workers keep
    the code object (guide §4.5)."""

    def kernel(batches):
        yield from _closure_uf(batches, max_nodes)

    return kernel


def dedup_clusters(
    pairs: DataFrame,
    max_iterations: int = 50,
    driver_closure_max_edges: int = 100_000,
    uf_max_partition_nodes: int = 4_000_000,
) -> DataFrame:
    """Transitive closure of near-dup pairs into clusters: each doc gets
    the minimum doc_id reachable through the pair graph (the canonical
    representative to keep). Returns (doc_id, cluster_id); ``pairs``
    needs (doc_a, doc_b). The output is the exact closure (identical to
    the recursive-CTE oracle) and partition-invariant — intermediates
    depend on partitioning, the fixed point does not.

    Algorithm (r13 optimization): iterated star contraction with a
    partition-local union-find, replacing one-hop min-label
    propagation. The r13 profile measured the semantic pair graph at
    DIAMETER 17, so the old loop paid 17 rounds x ~0.33 s of fixed
    per-round job overhead (~5.6 s of pure scheduling on a 1,840-edge
    graph) in every consuming query. Per round here:

    - both edge orientations are hash-repartitioned by ``src`` with the
      partition count derived from the measured edge count (never a
      constant: small graphs get 1 partition so one union-find pass
      closes them outright; huge graphs get enough partitions to bound
      the per-task dict at ~1M edges);
    - an Arrow-batched union-find per partition (``_closure_uf``) emits
      node -> partition-local component min — every node merges with at
      least its full neighborhood, so progress per round is >= the old
      one-hop propagation and typically the whole component;
    - the mapping is made FUNCTIONAL (min root per node); links between
      a node's several partition-local roots are re-emitted as residual
      edges so no connectivity is ever lost;
    - edges are remapped through the mapping, self-loops dropped,
      canonicalized (least, greatest) and deduped; the loop ends when no
      edges remain — for real dup graphs that is ONE round (~4 Spark
      jobs total vs 2 jobs x diameter before; measured 6.4 s -> 3.6 s
      for the sf0.1 semantic closure incl. the miner).

    Correctness invariants: roots are always reachable node ids <= the
    node, the remapped graph is the quotient of the previous one (so
    component structure is preserved, residuals included), and an empty
    remainder means every component was fully collapsed to its min.
    """
    # the union-find kernel's output schema is pinned to long (every
    # miner in this engine emits bigint ids — the repo convention is
    # "join on xxhash64 longs, not strings"); fail loudly at plan
    # construction instead of deep inside an Arrow cast
    integral = {"tinyint", "smallint", "int", "bigint"}
    dt = dict(pairs.dtypes)
    bad = {c: dt[c] for c in ("doc_a", "doc_b") if dt.get(c) not in integral}
    if bad:
        raise ValueError(
            f"dedup_clusters: pair id columns must be integral, got {bad} "
            "— hash string ids to longs (xxhash64) before clustering"
        )
    # one evaluation of `pairs`: the persisted canonical edge list is the
    # only time the caller's pair pipeline (often a full shingle
    # self-join) runs; the count below both materializes it and sizes
    # the first round's partitioning
    edges = pairs.select(
        F.col("doc_a").cast("long").alias("src"),
        F.col("doc_b").cast("long").alias("dst"),
    ).transform(track_persist)
    n = edges.count()
    # r14 small-graph fast path (guide §1.2: the distributed loop's
    # per-round cost is FIXED JOB OVERHEAD, not data — profiled at
    # ~1.0-1.4 s per consuming query on graphs of a few hundred edges,
    # across ~5 jobs of scheduling floor). Below the bound, run the
    # same min-root union-find once on the driver: one bounded collect
    # (the kmeans/bpe convention — 100k edges is 1.6 MB over Arrow,
    # ~0.1 s of driver CPU) and the labels come back as a LocalRelation
    # whose exactly-known tiny size keeps every consumer join a
    # BroadcastHashJoin (the r13 plan shape). Output is bit-identical:
    # _closure_uf IS the per-partition kernel of the distributed path,
    # applied to the whole graph as one partition, and min-root
    # union-find yields component minima regardless of edge order.
    # Above the bound — real dup graphs at 100 TB — the r13 star
    # contraction below runs unchanged; the choice is made from the
    # measured edge count, never from a local[32] constant.
    if 0 < n <= driver_closure_max_edges:
        pdf = edges.toPandas()
        edges.unpersist()
        (local,) = _closure_uf(iter([pdf]))
        local = local.sort_values("node", kind="mergesort", ignore_index=True)
        return pairs.sparkSession.createDataFrame(
            local.rename(columns={"node": "doc_id", "root": "cluster_id"}),
            schema="doc_id long, cluster_id long",
        )
    parallelism = pairs.sparkSession.sparkContext.defaultParallelism
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .unionByName(edges.select(F.col("dst").alias("doc_id")))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    E = edges
    mappings = []
    rounds = 0
    while n > 0:
        if rounds >= max_iterations:
            # the q_dedup_clusters oracle is the FULL transitive closure
            # (recursive CTE); silently returning unconverged labels
            # would be a wrong answer, not a slow one. Contraction
            # merges every node with at least its neighborhood per
            # round (>= the old one-hop propagation), so 50 rounds
            # cover anything the old loop covered.
            raise RuntimeError(
                "dedup_clusters did not converge within "
                f"{max_iterations} contraction rounds; raise "
                "max_iterations (components this deep suggest the pair "
                "threshold is admitting non-duplicates)"
            )
        rounds += 1
        # scale-adaptive partitioning: ~4k edges/partition lower bound
        # (tiny graphs -> 1 partition -> one-pass closure), ~1M
        # edges/partition upper bound (union-find dict memory), local
        # parallelism in between
        p = max(
            1,
            min(
                max(parallelism, n // 1_000_000 + 1),
                n // 4096 + 1,
            ),
        )
        both = E.unionByName(
            E.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).repartition(p, "src")
        # M has two consumers in this round (the functional rollup and
        # the residual join): persist it or the union-find pass runs
        # twice (the r4c multi-consumer re-evaluation class); scoped —
        # unpersisted right after the count materializes the round.
        # The node bound (r14): ~4M-node Python set+dict is a few
        # hundred MB per task — the memory envelope the ~1M-edges/
        # partition derivation above already implied; a mega-hub that
        # concentrates more than that in one partition raises with
        # remediation instead of OOM-ing the worker (the r13 verdict's
        # watch item).
        M = both.mapInPandas(
            _closure_uf_bounded(uf_max_partition_nodes),
            "node long, root long",
        ).persist()
        Mf = (
            M.groupBy("node")
            .agg(F.min("root").alias("root"))
            .transform(track_persist)
        )
        # a node seen by several partitions has several local roots; the
        # links between them carry cross-partition connectivity forward
        residual = (
            M.join(Mf.select("node", F.col("root").alias("_mr")), "node")
            .where(F.col("root") != F.col("_mr"))
            .select(F.col("_mr").alias("src"), F.col("root").alias("dst"))
        )
        ms = Mf.select(F.col("node").alias("src"), F.col("root").alias("_rs"))
        md = Mf.select(F.col("node").alias("dst"), F.col("root").alias("_rd"))
        remapped = (
            E.join(ms, "src")
            .join(md, "dst")
            .where(F.col("_rs") != F.col("_rd"))
            .select(F.col("_rs").alias("src"), F.col("_rd").alias("dst"))
        )
        E2 = (
            remapped.unionByName(residual)
            .select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .distinct()
            # lazy: the count below materializes it in the same job
            .localCheckpoint(eager=False)
        )
        n = E2.count()
        M.unpersist()
        mappings.append(Mf)
        E = E2
    # resolve every doc through the (few) round mappings in one plan;
    # the eager checkpoint materializes the final tiny label table so
    # consumers (and the mappings' unpersist below) never re-derive it
    for Mf in mappings:
        mk = Mf.select(F.col("node").alias("cluster_id"), "root")
        labels = labels.join(mk, "cluster_id", "left").select(
            "doc_id",
            F.coalesce("root", "cluster_id").alias("cluster_id"),
        )
    labels = labels.localCheckpoint(eager=True)
    for Mf in mappings:
        Mf.unpersist()
    edges.unpersist()
    return labels


def _simhash_vote_kernel(n_bits: int):
    """Arrow-batched per-partition SimHash vote: consumes (doc_id, h)
    token rows and emits one (doc_id, simhash) row per doc — the
    sign-of-vote signature computed vectorized (np.unpackbits bit
    matrix + pandas groupby sum) instead of 60 Catalyst conditional
    SUM aggregates (guide §4.2; isolated A/B at sf0.1: 1.74 s -> 0.46 s
    for the signature stage, bit-identical output).

    CORRECTNESS PRECONDITION (why this may run with NO exchange): every
    row of one doc must sit in one partition. simhash_near_dup
    guarantees it structurally — the token rows come from an explode of
    per-doc arrays after a row-level repartition of ``documents``, and
    nothing re-shuffles between; a split doc would emit two partial
    signatures and corrupt the banding. Keep the kernel adjacent to
    that pipeline, never expose it on arbitrary row sets.

    Per-batch partial counts bound memory at O(batch x 64 bytes +
    docs-per-partition x 65 ints): the bit matrix is built per Arrow
    batch (<= maxRecordsPerBatch rows), never for the whole partition.
    Integer vote counts are associative, so batch partials sum exactly.
    Module-level so reused Python workers keep the code object (guide
    §4.5)."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        partials = []
        for b in batches:
            if not len(b):
                continue
            # int64 -> uint64 bit view; little-endian byte expansion +
            # unpackbits gives the rows x 64 bit matrix in C speed
            h = b["h"].to_numpy().astype(np.int64).view(np.uint64)
            bytes_ = h.view(np.uint8).reshape(len(h), 8)
            bits = np.unpackbits(bytes_, axis=1, bitorder="little")
            g = pd.DataFrame(bits[:, :n_bits].astype(np.int64))
            g["n"] = 1
            g["doc_id"] = b["doc_id"].to_numpy()
            partials.append(g.groupby("doc_id", sort=False).sum())
        if not partials:
            return
        tot = (
            pd.concat(partials)
            .groupby(level=0, sort=False)
            .sum()
        )
        counts = tot.iloc[:, :n_bits].to_numpy()
        n = tot["n"].to_numpy()
        # vote_i = sum(+/-1) > 0  <=>  2 * count_of_set_bit > n_tokens
        vote = (counts * 2) > n[:, None]
        weights = np.array(
            [(1 << i) if i < 63 else -(1 << 63) for i in range(n_bits)],
            dtype=np.int64,
        ).view(np.uint64)
        sig = (vote * weights[None, :]).sum(axis=1, dtype=np.uint64)
        yield pd.DataFrame(
            {
                "doc_id": tot.index.to_numpy(),
                "simhash": sig.view(np.int64),
            }
        )

    return kernel


def simhash_near_dup(
    documents: DataFrame,
    max_hamming: int = 8,
    token_hash: str = "xxhash64",
    max_bucket: int | None = None,
    max_dropped_mass: float | None = 0.5,
) -> DataFrame:
    """SimHash near-dup: 64-bit signature = sign of per-bit vote over token
    hashes; candidate pairs via 16-bit band equality (a pair within
    Hamming distance 3 shares at least one of 4 bands; wider distances
    trade recall), verified by popcount of the XOR. All JVM-side bit
    arithmetic.

    ``token_hash='portable'`` swaps xxhash64 for the first 60 bits of
    md5(token) (15 hex chars — stays positive in int64), which an ANSI
    oracle reproduces exactly; bits 60-63 then vote -1 for every doc, a
    constant the Hamming distance cancels.

    ``max_bucket`` is the scale lever: self-join fan-out is quadratic
    per (band, bucket) cell, so a corpus with dense near-duplicate
    clusters explodes hot buckets (measured 16.7x runtime on a 10x
    corpus where every doc has 9 near-copies). Capping drops cells with
    more than ``max_bucket`` members before the join — the SimHash twin
    of n-gram Jaccard's ``max_df`` stop-shingle cap, with the same
    recall trade: pairs confined to dropped mega-buckets are found by
    the other 3 bands or not at all. The count rides the join's own
    (band, bucket) partitioning — no extra shuffle.

    ``max_dropped_mass`` (r9, the r8 verdict's last silent-cap edge):
    when ``max_bucket`` is set, one eager aggregate measures the
    fraction of banded-index mass the cap drops and raises past the
    threshold — a duplicate group bigger than ``max_bucket`` saturates
    ALL four of its bands at once (near-identical signatures land in
    the same cell in every band), so unlike organic skew the loss is
    not graceful. Explicit ``None`` opts out (scale harnesses that
    time the degraded branch do). When the guard is active the narrow
    (doc_id, simhash) frame is persisted across guard + main plan: the
    signature vote is the expensive stage here, the opposite trade
    from the gram index's recompute-wins A/B."""
    _validate_dropped_mass(max_dropped_mass, "simhash_near_dup")
    if max_bucket is None and max_dropped_mass not in (None, 0.5):
        # r9 ADVICE: same validated-but-unused-knob rejection as
        # minhash_lsh_candidates / jaccard_pairs' prefix branch
        raise ValueError(
            "simhash_near_dup: max_dropped_mass guards the max_bucket "
            "cell cap; with max_bucket=None there is no cap and no "
            "guard — drop the non-default "
            f"max_dropped_mass={max_dropped_mass!r} or set max_bucket"
        )
    n_bits = 60 if token_hash == "portable" else 64
    if token_hash == "portable":
        h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast(
            "bigint"
        )
    else:
        h = F.xxhash64("tok")
    toks_hashed = (
        documents.repartition(
            documents.sparkSession.sparkContext.defaultParallelism
        )
        .select("doc_id", F.explode(F.array_distinct(tokens())).alias("tok"))
        .select("doc_id", h.alias("h"))
    )
    # r14 (guide §2.4 + §4.2): the exploded token rows of one doc are
    # partition-local by construction (row-level repartition of docs,
    # then explode — nothing re-shuffles between), so the signature
    # needs NO exchange at all: one Arrow pass computes every per-bit
    # vote vectorized. Replaces groupBy(doc_id).agg(60 conditional
    # SUMs) — which shuffled partial-agg rows of 61 longs AND paid the
    # 60-column hash-agg machinery — with a zero-shuffle mapInPandas.
    # Isolated A/B at sf0.1: signature stage 1.74 s -> 0.46 s,
    # bit-identical signatures (equivalence pinned in tests).
    sigs = toks_hashed.mapInPandas(
        _simhash_vote_kernel(n_bits), "doc_id long, simhash long"
    )
    run_guard = max_bucket is not None and max_dropped_mass is not None
    if run_guard:
        # one narrow row per doc — cheap to cache, expensive to recompute
        # (the per-bit vote aggregation is the heavy stage)
        sigs = sigs.transform(track_persist)
    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bucket")
    banded = banded.repartition(parallelism, "band", "bucket")
    if run_guard:
        _guard_bucket_saturation(
            banded.groupBy("band", "bucket").agg(
                F.count(F.lit(1)).alias("df")
            ),
            max_bucket,
            max_dropped_mass,
            "simhash_near_dup",
        )
    if max_bucket is not None:
        from pyspark.sql.window import Window as _W

        bw = _W.partitionBy("band", "bucket")
        banded = (
            banded.withColumn("_bsz", F.count(F.lit(1)).over(bw))
            .where(F.col("_bsz") <= max_bucket)
            .drop("_bsz")
        )
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def chunk_dedup(
    documents: DataFrame, chunk: int = 8, max_docs: int = 2
) -> DataFrame:
    """Corpus-level duplicated-span removal: the C4/RefinedWeb "line
    dedup" generalized to fixed-size token chunks (the synthetic corpus
    is single-line, so newline splitting would degenerate to exact
    dedup). Every document is cut into consecutive ``chunk``-token
    spans; any span whose text occurs in more than ``max_docs`` distinct
    documents is removed from ALL of them (boilerplate headers, license
    blocks, navigation chrome); survivors are stitched back in order.

    Shape: chunks are derived by slicing the token array in one
    projection (no explode-regroup for chunking), then exploded once.
    Span frequency is a hash aggregation on xxhash64(span) — one shuffle
    on an 8-byte key, never raw text — joined back on the same long key
    (second shuffle, AQE-skew-safe; a boilerplate span hot enough to
    skew is exactly what the filter drops). Reassembly is one shuffle on
    doc_id with an array_sort on (chunk_id) structs. Documents whose
    every span was removed drop out (pure duplicates).

    Returns (doc_id, clean_text, n_chunks, n_kept)."""
    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    toks_df = documents.repartition(parallelism).select(
        "doc_id", tokens().alias("toks")
    )
    n_chunks = F.ceil(F.size("toks") / F.lit(chunk)).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice("toks", i * chunk + 1, chunk), " "),
    )
    # sequence(0, -1) counts DOWN; empty token lists need the guard
    chunked = toks_df.select(
        "doc_id",
        n_chunks.cast("bigint").alias("n_chunks"),
        F.posexplode(
            F.when(n_chunks < 1, F.array().cast("array<string>")).otherwise(chunk_arr)
        ).alias("chunk_id", "chunk_text"),
    ).withColumn("h", F.xxhash64("chunk_text"))
    span_df = chunked.groupBy("h").agg(
        F.countDistinct("doc_id").alias("span_df")
    )
    kept = chunked.join(
        span_df.where(F.col("span_df") <= max_docs).select("h"), "h", "inner"
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text"))),
        lambda s: s.chunk_text,
    )
    return kept.groupBy("doc_id").agg(
        F.array_join(ordered, " ").alias("clean_text"),
        F.first("n_chunks").alias("n_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    )


def source_overlap_matrix(documents: DataFrame, n: int = 3) -> DataFrame:
    """Cross-source contamination matrix: for every pair of sources, the
    number of distinct word n-gram shingles they share and the Jaccard
    of their shingle sets. Corpus forensics — a crawl snapshot that
    plagiarizes another source, or two dumps of the same site, light up
    as an off-diagonal hot cell long before document-level dedup runs.

    Scale: fan-out is bounded by the number of SOURCES sharing a
    shingle (s sources -> s(s-1)/2 pairs), never by document count —
    unlike document-pair Jaccard there is no per-doc quadratic term.
    One shuffle for distinct (source, shingle-hash), a self-join on a
    60-bit integer key, then a broadcast of per-source set sizes (one
    row per source). Shingles are keyed by the md5-prefix bigint both
    engines share: identical hash => identical collision behavior, so
    counts match the DuckDB oracle exactly even in the (2^-60) collision
    case."""
    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    toks = documents.select("source", tokens().alias("toks")).repartition(
        parallelism
    )
    sh = (
        toks.select(
            "source",
            F.explode(_shingles_from(F.col("toks"), n)).alias("shingle"),
        )
        .select(
            "source",
            F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
        .distinct()
        # feeds the per-source sizes AND both self-join sides: without a
        # persist the tokenize+shingle+md5 pipeline runs three times
        # (measured 3x the query cost; same persist-beats-ReuseExchange
        # finding as the MinHash banded self-join)
        .transform(track_persist)
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("sz").alias("sz_b"))
    union_sz = F.col("sz_a") + F.col("sz_b") - F.col("n_shared")
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            # raw IEEE quotient of exact int64s (r10: same tie-class
            # retirement as the r9 ngram/ppjoin/tfidf surfaces — ROUND
            # of n/d diverges engines on 4-decimal-half rationals, and
            # this union is a shingle-set-size sum that reaches large
            # denominators at scale)
            (F.col("n_shared").cast("double") / union_sz).alias("jaccard"),
        )
    )


def cluster_safe_split(
    documents: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float] | None = None,
    salt: str = "v1",
) -> DataFrame:
    """Leakage-safe train/val/test split: every member of a near-dup
    cluster receives the SAME split, closing the contamination channel a
    plain identity-hash split leaves open — two near-identical documents
    hash to independent buckets, so one lands in train and its twin in
    eval, and the eval set silently measures memorization.

    The split key is the cluster representative (min doc_id reachable in
    the ``pairs`` graph, via ``dedup_clusters``); documents in no pair
    key on themselves, so their assignment is IDENTICAL to
    ``text.hash_split`` — adopting the safe split changes only the docs
    that were leaking. Same md5 bucket arithmetic, so any ANSI engine
    replays it and assignments stay stable under reruns and corpus
    growth. Cost over hash_split: the label propagation on the (tiny)
    pair graph plus one join of the corpus against the cluster labels —
    the corpus never shuffles on anything wider than doc_id.

    Returns (doc_id, cluster_id, bucket, split).
    """
    from .text import hash_split

    labels = dedup_clusters(pairs)
    keyed = (
        documents.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    )
    return hash_split(
        keyed, weights=weights, salt=salt, key="cluster_id", keep=("doc_id",)
    )


def containment_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold_milli: int = 800,
    max_df: int | None = None,
    max_dropped_mass: float | None = 0.5,
) -> DataFrame:
    """ASYMMETRIC near-dup pairs by n-gram containment |A∩B| / |A| —
    catches what Jaccard misses: a short document wholly quoted inside a
    much longer one has low Jaccard (the union is large) but containment
    ~1 from the short side. The standard signal for sub-document
    plagiarism / quote mining (Broder's containment, the other half of
    the resemblance paper that gave us MinHash).

    Same inverted-index shape as ``ngram_jaccard_pairs`` (shared
    machinery: set-semantic shingles, sizes carried through the explode,
    explicit hash partitioning on the 8-byte shingle key, optional
    ``max_df`` population cap). The threshold filter is EXACT INTEGER
    arithmetic — ``n_inter * 1000 >= threshold_milli * size_small`` —
    so there is no float rounding anywhere in the operator and the
    oracle replays it verbatim. Emits the containment of the SMALLER set
    (the max of the two directed containments) plus the raw integers.

    ``max_dropped_mass`` (r8): the same saturation guard as
    ``ngram_jaccard_pairs`` — the df cap goes blind at high duplication
    (SCALE.md r7b) and containment shares the capped-index machinery.
    """
    _validate_dropped_mass(max_dropped_mass, "containment_pairs")
    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    sized = _tokenized(documents).select(
        "doc_id", _shingles_from(F.col("toks"), n).alias("sh_arr")
    )
    index = sized.select(
        "doc_id",
        F.size("sh_arr").alias("set_size"),
        F.explode(F.transform("sh_arr", lambda s: F.xxhash64(s))).alias("sh"),
    )
    _guard_df_saturation(
        index.groupBy("sh").agg(F.count(F.lit(1)).alias("df")),
        max_df,
        max_dropped_mass,
        "containment_pairs",
    )
    capped = index.repartition(parallelism, "sh")
    if max_df is not None:
        from pyspark.sql.window import Window

        capped = (
            capped.withColumn(
                "df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
            )
            .where(F.col("df") <= max_df)
            .drop("df")
        )
    a, b = capped.alias("a"), capped.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.min(F.col("a.set_size")).alias("size_a"),
            F.min(F.col("b.set_size")).alias("size_b"),
        )
    )
    size_small = F.least("size_a", "size_b")
    return inter.where(
        F.col("n_inter") * 1000 >= F.lit(threshold_milli) * size_small
    ).select(
        "doc_a",
        "doc_b",
        "n_inter",
        "size_a",
        "size_b",
        # milli-containment of the smaller side, floored — integer output
        F.expr("(n_inter * 1000) div least(size_a, size_b)").alias(
            "containment_milli"
        ),
    )


def _validated_gram_len(
    min_len: int, k: int | None, scope: str, op: str
) -> int:
    """Shared argument validation for the substring-dedup family."""
    if scope not in ("cross_doc", "any"):
        raise ValueError(
            f"{op}: scope must be 'cross_doc' or 'any', got {scope!r}"
        )
    kk = int(min_len if k is None else k)
    if kk < 1 or int(min_len) < kk:
        raise ValueError(
            f"{op}: need 1 <= k <= min_len, got k={kk}, min_len={min_len}"
        )
    return kk


def _gram_dup_frames(
    toks: DataFrame, kk: int, scope: str
) -> tuple[DataFrame, DataFrame]:
    """Shared stage-1 of the substring-dedup family, over a
    ``_tokenized`` (doc_id, toks) frame: the positional gram frame
    (doc_id, pos, gh), persisted (every caller scans it at least
    twice — and it is the COMPACT thing to persist, 3 longs/row, vs
    corpus-sized token arrays), and the duplicated-gram aggregate
    (gh, c, d0, d1): ONE map-side-combined aggregation on the 8-byte
    xxhash64 key where cross-doc duplication is min_doc != max_doc
    (no count-distinct shuffle)."""
    grams = (
        toks
        .select(
            "doc_id",
            F.posexplode(_position_grams(F.col("toks"), kk)).alias(
                "pos0", "gram"
            ),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("bigint").alias("pos"),
            F.xxhash64("gram").alias("gh"),
        )
        .transform(track_persist)
    )
    stats = grams.groupBy("gh").agg(
        F.count(F.lit(1)).alias("c"),
        F.min("doc_id").alias("d0"),
        F.max("doc_id").alias("d1"),
    )
    dup = stats.where(
        (F.col("d0") != F.col("d1"))
        if scope == "cross_doc"
        else (F.col("c") >= 2)
    )
    return grams, dup


def duplicate_substring_spans(
    documents: DataFrame,
    min_len: int = 20,
    k: int | None = None,
    scope: str = "cross_doc",
) -> DataFrame:
    """Exact substring-level dedup (the suffix-array modality of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): surface, per document, every maximal token span covered
    by duplicated length-``k`` windows — the memorization-risk spans a
    curation pipeline cuts OUT of documents rather than dropping the
    documents whole. This is the operator ``chunk_dedup`` (fixed-stride
    chunks) and winnowing (whole-doc near-dup) both miss: repeated
    spans at ARBITRARY offsets across documents.

    Semantics, stated exactly: position ``i`` of a doc is *duplicated*
    when its positional ``k``-token gram also occurs elsewhere —
    ``scope="cross_doc"``: in at least one OTHER document;
    ``scope="any"``: anywhere else including the same document (the
    paper's count). Maximal runs of consecutive duplicated positions
    merge into spans of ``n_grams + k - 1`` tokens; spans shorter than
    ``min_len`` are dropped. With ``k == min_len`` (the default) every
    emitted length-k window is an EXACT duplicated substring and the
    span is their union — the paper's removal set. With ``k < min_len``
    the span guarantee weakens to "every k-window duplicated"
    (different windows may match different partners); cheaper index,
    standard approximation — the docstring contract makes that the
    caller's explicit choice, like ``max_df``.

    Spark shape, not a suffix array: a distributed suffix array over
    100 TB is a research project; positional-gram run-merging gives the
    same removal set for span length >= k with only hash aggregations
    and one bounded window. Pipeline: tokenize once behind a
    repartition exchange (``_tokenized`` — the CPU-per-row rule), one
    posexplode to (doc_id, pos, gram-hash) rows, ONE map-side-combined
    aggregation on the 8-byte gram hash computing (count, min_doc,
    max_doc) — cross-doc duplication is min != max, no count-distinct
    shuffle — a semi join of positions against the duplicated hashes
    (AQE-planned; no fan-out, output <= positions), then the
    pos - row_number island trick per doc. The island window partitions
    by doc_id: per-doc sort, doc-bounded, never corpus-wide. Gram keys
    are xxhash64 longs (the join-on-longs rule); a collision would need
    ~2^32 distinct grams per false pair (negligible; same equivalence
    the Jaccard family already accepts vs its string-keyed oracle).

    Returns (doc_id, start_pos, span_tokens, n_grams), one row per
    maximal span, all integers — exactly replayable in SQL (the r7
    oracle replays gram STRINGS, pos - ROW_NUMBER islands, and the
    same HAVING on min/max doc_id).
    """
    kk = _validated_gram_len(min_len, k, scope, "duplicate_substring_spans")
    grams, dup = _gram_dup_frames(_tokenized(documents), kk, scope)
    return _qualifying_spans(grams, dup, kk, int(min_len))


def _qualifying_spans(
    grams: DataFrame, dup: DataFrame, kk: int, min_len: int
) -> DataFrame:
    """Islands stage of the substring-dedup family, shared by the spans
    report and the cut transform (one gram scan feeds both): semi-join
    positions against the duplicated hashes, pos - row_number islands
    per doc, roll up to (doc_id, start_pos, span_tokens, n_grams),
    keep spans of >= min_len tokens."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = grams.join(dup.select("gh"), "gh", "left_semi").select(
        "doc_id",
        "pos",
        (F.col("pos") - F.row_number().over(w)).alias("grp"),
    )
    return (
        islands.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("bigint").alias("start_pos"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(
            "doc_id",
            "start_pos",
            (F.col("n_grams") + F.lit(kk - 1))
            .cast("bigint")
            .alias("span_tokens"),
            F.col("n_grams").cast("bigint").alias("n_grams"),
        )
        .where(F.col("span_tokens") >= min_len)
    )


def duplicate_span_stats(
    documents: DataFrame,
    min_len: int = 20,
    k: int | None = None,
    scope: str = "cross_doc",
) -> DataFrame:
    """Per-document rollup of ``duplicate_substring_spans``: how much of
    each document is covered by duplicated spans — the number a curation
    dashboard actually plots, and the threshold a cut/keep policy gates
    on (docs that are mostly duplicated spans get dropped whole; docs
    with a small flagged fraction get the spans excised).

    Spans are disjoint in GRAM-position space (maximal islands), but
    their TOKEN extents each carry ``k - 1`` trailing tokens, so two
    islands separated by a gap of <= k-2 gram positions overlap in
    token space — summing span_tokens would double-count the overlap
    (and could push dup_rate_milli past 1000). ``dup_tokens`` is
    therefore the INTERVAL UNION of the token extents: one doc-bounded
    window pass (running max of end over start order — gaps-and-islands
    over intervals), then max(end) - min(start) + 1 per merged group.
    ``n_spans`` stays the raw qualifying-span count. dup_rate_milli =
    (1000 * dup_tokens) div n_tokens: integer, truncating,
    engine-agnostic, and now provably <= 1000. Docs with no qualifying
    span are INCLUDED with zeros (left join against
    ``token_count``-style totals) so the output is a total function of
    the corpus — rate histograms don't silently drop the clean mass.

    Returns (doc_id, n_tokens, dup_tokens, n_spans, dup_rate_milli).
    """
    from pyspark.sql.window import Window

    spans = duplicate_substring_spans(
        documents, min_len=min_len, k=k, scope=scope
    ).transform(track_persist)
    w = Window.partitionBy("doc_id").orderBy("start_pos")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    iv = spans.select(
        "doc_id",
        "start_pos",
        (F.col("start_pos") + F.col("span_tokens") - 1).alias("end_pos"),
    ).withColumn("prev_max", F.max("end_pos").over(wprev))
    merged = (
        iv.withColumn(
            "igrp",
            F.sum(
                F.when(
                    F.col("prev_max").isNull()
                    | (F.col("start_pos") > F.col("prev_max")),
                    1,
                ).otherwise(0)
            ).over(w),
        )
        .groupBy("doc_id", "igrp")
        .agg(
            (F.max("end_pos") - F.min("start_pos") + 1).alias("cov")
        )
        .groupBy("doc_id")
        .agg(F.sum("cov").alias("dup_tokens"))
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
    ).join(merged, "doc_id")
    totals = documents.select(
        "doc_id", F.size(tokens()).cast("bigint").alias("n_tokens")
    )
    return totals.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias(
            "dup_tokens"
        ),
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.expr(
            "CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) "
            "ELSE (1000 * COALESCE(dup_tokens, 0)) div n_tokens END"
        ).alias("dup_rate_milli"),
    )


def cut_duplicate_spans(
    documents: DataFrame,
    min_len: int = 20,
    k: int | None = None,
    scope: str = "cross_doc",
) -> DataFrame:
    """The removal half of the substring-dedup modality: rebuild each
    document with its duplicated spans (``duplicate_substring_spans``)
    EXCISED, keeping one canonical occurrence per duplicated k-gram so
    the corpus retains every flagged substring at least once — Lee et
    al. 2022's actual training-set transform, not just the report.

    The keep/cut decision is POSITION-level, not span-level (a
    span-level rule keyed on any single representative gram can cut
    EVERY occurrence of a substring — the canon doc's span may itself
    be cut because its representative points at yet another doc). The
    rule, deterministic and pure-function-of-the-data:

    - a token position is FLAGGED when it lies inside the token extent
      of a qualifying span (``span_tokens >= min_len``) — in any doc,
      including the canonical one;
    - for every duplicated k-gram, its CANONICAL occurrence is the
      lexicographic minimum (doc_id, pos) over all its occurrences
      (ties impossible: one gram per position), and that occurrence's
      k token positions are PROTECTED;
    - a position is CUT iff flagged and not protected.

    Guarantee: every duplicated k-gram survives verbatim at its
    canonical occurrence (all k tokens protected), every clean token is
    untouched, and duplicated mass outside the canonical occurrences is
    excised. A substring longer than k survives at least as its
    overlapping k-windows (each in its own canon doc) — the per-gram
    guarantee, which is the honest one (a single contiguous canonical
    copy of arbitrarily-long spans does not exist in general: two docs
    can each hold half of a chain).

    Shape: the shared gram/dup stage, two range joins of exploded token
    positions against (doc-local) span extents and protected extents —
    both doc_id-equi joins with a band residual, flagged output <=
    positions — one equi anti-join back, and the island trick over cut
    positions for ``n_cut_spans`` (count of maximal cut RUNS after
    protection). Token order is rebuilt with an array_agg over (pos)
    struct sort — per-doc bounded, no corpus window.

    Returns (doc_id, n_tokens_before, n_tokens_after, n_cut_spans,
    text_after) — integers plus the rebuilt text, exactly replayable
    in SQL (the staged oracle replays the same flag/protect/cut
    position sets and rebuilds with string_agg over kept positions).

    Caveat, shared with the paper's transform: excision splices
    previously-distant tokens next to each other, which can create NEW
    duplicated k-grams; the transform is one-pass by design (iterate
    to a fixed point if that matters downstream).
    """
    from pyspark.sql.window import Window

    kk = _validated_gram_len(min_len, k, scope, "cut_duplicate_spans")
    # tokenize runs twice (grams pipeline + position explode) ON
    # PURPOSE: persisting the tokenized corpus would cache
    # corpus-sized string arrays — at 100 TB that is far costlier
    # than recomputing a split(); the compact 3-long gram frame is
    # the right thing to persist, and _gram_dup_frames does
    grams, dup = _gram_dup_frames(_tokenized(documents), kk, scope)
    spans = _qualifying_spans(grams, dup, kk, int(min_len))
    toks = _tokenized(documents)
    extents = spans.select(
        F.col("doc_id").alias("s_doc"),
        F.col("start_pos").alias("cs"),
        (F.col("start_pos") + F.col("span_tokens") - 1).alias("ce"),
    )
    # canonical occurrence per duplicated gram: lexicographic min
    # (doc_id, pos); its k tokens are protected from cutting
    protected = (
        grams.join(dup.select("gh"), "gh", "left_semi")
        .groupBy("gh")
        .agg(F.min(F.struct("doc_id", "pos")).alias("mn"))
        .select(
            F.col("mn.doc_id").alias("p_doc"),
            F.col("mn.pos").alias("ps"),
            (F.col("mn.pos") + F.lit(kk - 1)).alias("pe"),
        )
    )
    pos_tokens = toks.select(
        "doc_id",
        F.size("toks").alias("n_tokens_before"),
        F.posexplode("toks").alias("pos0", "token"),
    ).select(
        "doc_id",
        "n_tokens_before",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        "token",
    )
    # r14 (guide §2.3 — shuffle/scan fewer bytes): flagged positions
    # derive from the span extents ALONE. Extents are clamped to valid
    # token positions by construction (islands are contiguous gram
    # runs, max gram pos <= n_tokens - k + 1, so ce = start + n_grams
    # + k - 2 <= n_tokens), so exploding each extent's integer range
    # yields EXACTLY the positions the previous corpus-wide range
    # semi-join selected — without shipping every token row (string
    # included) through that join, and without the second
    # tokenize+posexplode pass the old flagged branch forced
    # (pos_tokens now has one consumer: the kept-token rebuild).
    # Neighboring islands' token extents can overlap (gap <= k-2, the
    # r7 interval-union lesson) — dedupe positions.
    flagged = extents.select(
        F.col("s_doc").alias("doc_id"),
        F.explode(F.sequence("cs", "ce")).alias("pos"),
    ).dropDuplicates(["doc_id", "pos"])
    cut_pos = flagged.join(
        protected,
        (flagged["doc_id"] == protected["p_doc"])
        & (F.col("pos") >= F.col("ps"))
        & (F.col("pos") <= F.col("pe")),
        "left_anti",
    ).select("doc_id", "pos").transform(track_persist)
    kept = pos_tokens.join(cut_pos, ["doc_id", "pos"], "left_anti")
    w = Window.partitionBy("doc_id").orderBy("pos")
    n_cut = (
        cut_pos.select(
            "doc_id", (F.col("pos") - F.row_number().over(w)).alias("grp")
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("grp").alias("n_cut_spans"))
    )
    rebuilt = kept.groupBy("doc_id", "n_tokens_before").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens_after"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "token"))),
                lambda s: s["token"],
            ),
            " ",
        ).alias("text_after"),
    )
    # left join from the full doc list: a doc whose EVERY token was cut
    # still appears (empty text), and clean docs appear verbatim
    base = documents.select("doc_id", "text")
    return (
        base.join(rebuilt, "doc_id", "left")
        .join(n_cut, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                "n_tokens_before", F.size(tokens())
            ).cast("bigint").alias("n_tokens_before"),
            F.coalesce("n_tokens_after", F.lit(0))
            .cast("bigint")
            .alias("n_tokens_after"),
            F.coalesce("n_cut_spans", F.lit(0))
            .cast("bigint")
            .alias("n_cut_spans"),
            F.coalesce("text_after", F.lit("")).alias("text_after"),
        )
    )
