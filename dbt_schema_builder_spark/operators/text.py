"""Text-analysis operators over the documents table (SURVEY.md B4 and the
north-star training-data pipeline ops: language-ID, quality scoring, token
counting, document fingerprinting).

Everything here is built from ``pyspark.sql.functions`` (split / filter /
aggregate / md5 / higher-order lambdas) so it runs inside whole-stage
codegen — no Python in the hot path. These operators process one row at a
time with no shuffle at all until the final aggregate, so they scale
linearly: at 100 TB they are pure map-side work over the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import track_persist
from pyspark.sql.window import Window

# Tiny high-frequency stopword set used for quality scoring and the
# stopword-ratio feature of language ID.
STOPWORDS = ("the", "a", "and", "of", "to")

# Per-language marker-token profiles for the n-gram/token heuristic
# language-ID. Real pipelines learn these from labeled data; the operator
# is the Spark-side scoring machinery (argmax over per-language scores).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "y", "los", "de"),
    "zh": ("de", "le", "shi", "zai", "he"),
}


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(documents: DataFrame) -> DataFrame:
    """Per-document whitespace token count (BPE-ish subword estimate comes
    from chars/4, the common rule of thumb)."""
    return documents.select(
        "doc_id",
        F.size(tokens()).alias("n_tokens"),
        F.floor(F.length("text") / F.lit(4)).cast("bigint").alias("approx_bpe_tokens"),
    )


BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def bpe_ish_tokens(documents: DataFrame) -> DataFrame:
    """Subword-style tokenization via regexp_extract_all with a GPT-like
    pattern (letter runs, single digits, punctuation runs): the
    pre-tokenizer shape of a BPE pipeline, JVM-side. Counts per doc."""
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), 0)
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


def stratified_sample(
    documents: DataFrame,
    strata_col: str = "lang",
    fractions: dict | None = None,
    default_fraction: float = 0.2,
    seed: int = 42,
    exhaustive: bool = False,
    key: str | None = None,
) -> DataFrame:
    """Per-stratum Bernoulli sampling: the standard way to rebalance a
    training corpus by language/source. Seeded and therefore reproducible;
    executes as a per-row filter, no shuffle.

    With explicit ``fractions`` (and ``exhaustive=False``) no strata-
    discovery job runs: strata absent from the dict get
    ``default_fraction`` via a pure hash expression — at 100 TB an
    unbounded ``distinct().collect()`` over the strata column is a driver
    bottleneck. ``exhaustive=True`` restores sampleBy's enumerate-first
    behavior for when you want to fail on unknown strata instead.

    The hash expression mirrors Bernoulli sampleBy semantics (a seeded
    uniform draw per row compared to the stratum's fraction) but draws
    from xxhash64(strata, id-independent salt) — deterministic across
    runs AND cluster layouts, which sampleBy's per-partition RNG is not
    when the partitioning changes.

    With ``key`` set (a unique id column), the uniform comes from the
    md5 prefix of (key, seed) instead of xxhash64 — the same
    ANSI-portable draw as ``weighted_sample_per_group``, so any SQL
    engine replays the exact sample (the DuckDB oracle does)."""
    if fractions is not None and not exhaustive:
        fr_col = F.col(strata_col)
        frac_expr = F.lit(float(default_fraction))
        for k, v in sorted(fractions.items()):
            frac_expr = F.when(fr_col == k, F.lit(float(v))).otherwise(frac_expr)
        # uniform in [0,1) from a 64-bit hash of (row identity, seed):
        # monotonically-assigned doc ids would bias a modulo draw, the
        # full-width hash does not
        if key is not None:
            bucket = F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col(key).cast("string"), F.lit(f":{seed}")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            draw = bucket.cast("double") / F.lit(float(1 << 32))
        else:
            draw = (
                F.pmod(F.xxhash64(F.struct(*documents.columns), F.lit(seed)), F.lit(1 << 32))
                / F.lit(float(1 << 32))
            )
        return documents.where(draw < frac_expr)
    keys = [
        r[0] for r in documents.select(strata_col).distinct().collect()
    ]
    if any(k is None for k in keys):
        # sampleBy rejects None dict keys (DISALLOWED_TYPE_FOR_CONTAINER)
        # and would silently DROP null-strata rows even if it didn't —
        # route the caller to the paths that handle unknown strata
        # (r10 degenerate-probe find)
        raise ValueError(
            f"stratified_sample: NULL values in strata column "
            f"{strata_col!r} — coalesce the column first, or use the "
            "explicit-fractions hash path (fractions=..., "
            "exhaustive=False), which draws default_fraction for any "
            "stratum absent from the dict"
        )
    fr = {k: (fractions or {}).get(k, default_fraction) for k in keys}
    return documents.sampleBy(strata_col, fractions=fr, seed=seed)


def quality_score(documents: DataFrame) -> DataFrame:
    """Per-document quality features: length, token count, mean token
    length, stopword ratio. All computed in one projection — single scan,
    no shuffle."""
    toks = tokens()
    n_toks = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    total_tok_chars = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_toks.alias("n_tokens"),
        # raw IEEE quotients of exact integers (r10 tie-class
        # retirement: ROUND(int/int, 4) diverges engines on 4-decimal
        # halves; the raw double quotient is bit-identical everywhere)
        (total_tok_chars.cast("double") / n_toks).alias("avg_token_len"),
        (stop_hits.cast("double") / n_toks).alias("stopword_ratio"),
    )


def text_stats_by_lang(documents: DataFrame) -> DataFrame:
    """Corpus-level stats per language: doc count, avg chars, avg tokens."""
    return (
        documents.select("lang", F.col("n_chars"), F.size(tokens()).alias("nt"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # exact int64 sum / count as a raw double quotient (r10
            # tie-class retirement — AVG+ROUND of ints is the
            # ROUND(int/int, 4) class)
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
                "avg_chars"
            ),
            (F.sum("nt").cast("double") / F.count(F.lit(1))).alias(
                "avg_tokens"
            ),
        )
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Deterministic content fingerprints: md5 of whitespace-normalized
    lowercased text (exact-dup key), plus a 64-bit xxhash for cheap
    joins/bucketing. The md5 matches any ANSI engine's md5, so it is
    oracle-checkable; xxhash64 is Spark-native."""
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return documents.select(
        "doc_id",
        F.md5(norm).alias("content_md5"),
        F.xxhash64(norm).alias("content_hash64"),
    )


def winnowing_fingerprints(
    documents: DataFrame, k: int = 5, window: int = 4, portable: bool = False
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme): hash every
    k-gram, keep the minimum hash in each sliding window of ``window``
    consecutive k-grams, dedupe. Guarantees any shared substring of
    length >= k + window - 1 yields a shared fingerprint — the local
    substring-match analog of MinHash's whole-document similarity.

    Formulated relationally: explode k-gram hashes to rows, sliding
    minimum via a rows-frame window over (doc_id, position). The nested
    array formulation (array_min over slices of a transform) is
    quadratic once Catalyst collapses the projections — the gram array
    is re-derived for every window index (measured 168 s at sf0.1 vs
    ~1 s for this shape).

    ``portable=True`` hashes grams with md5 (lowercase hex string) and
    takes the window minimum lexicographically instead of using Spark's
    xxhash64. Winnowing only needs *a* deterministic total order on gram
    hashes, so any hash works — md5 is the one every ANSI engine shares,
    which makes the portable variant oracle-checkable end to end (the
    driver's DuckDB twin computes bit-identical fingerprints). Default
    stays xxhash64: a long comparison beats a 32-char string comparison
    in the window min, and 8-byte fingerprints shuffle 4x less than hex
    strings at corpus scale."""
    from pyspark.sql.window import Window

    def _safe_seq(n: Column) -> Column:
        # sequence(1, 0) counts DOWN to [1, 0]; short docs need []
        return F.when(n < 1, F.array().cast("array<int>")).otherwise(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1)))
        )

    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    toks_df = documents.repartition(parallelism).select(
        "doc_id", tokens().alias("toks")
    )
    n_grams = F.size(F.col("toks")) - (k - 1)
    gram_hash = (
        (lambda g: F.md5(g)) if portable else (lambda g: F.xxhash64(g))
    )
    grams = toks_df.select(
        "doc_id",
        F.posexplode(
            F.transform(
                _safe_seq(n_grams),
                lambda i: gram_hash(F.array_join(F.slice("toks", i, k), " ")),
            )
        ).alias("pos", "gram_hash"),
    )
    ahead = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    whole = Window.partitionBy("doc_id")
    mins = grams.select(
        "doc_id",
        "pos",
        F.min("gram_hash").over(ahead).alias("fingerprint"),
        F.count(F.lit(1)).over(whole).alias("n"),
    ).where(F.col("pos") <= F.col("n") - window)
    return mins.select("doc_id", "fingerprint").distinct()


def tfidf_top_terms(documents: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k terms by TF-IDF, fully relational: explode
    tokens -> term frequencies (groupBy doc, term) -> document
    frequencies (groupBy term) -> tf * ln(N/df) -> per-doc top-k window
    with deterministic tie-break on the term. Two shuffles (tf, df) and
    a broadcast-sized df join; no ML pipeline objects, so the same plan
    runs at any corpus size."""
    from pyspark.sql.window import Window

    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    terms = (
        documents.repartition(parallelism)
        .select("doc_id", F.explode(tokens()).alias("term"))
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = (
        terms.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = documents.count()  # one scalar to the driver
    scored = tf.join(df_counts, "term").select(
        "doc_id",
        "term",
        # KEPT rounded (r10 sweep): tf*ln(n/df) is transcendental
        # except df == n_docs, where it is exactly 0.0 on both engines
        # — a log-derived double's shortest repr is never a 4-decimal
        # half, so the int/int tie class does not apply
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.select("doc_id", "term", "tfidf", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
    )


# PII patterns for free-text scrubbing. Kept to a regex subset (literal
# classes, \d/\w escapes, bounded repetition, \b anchors) that Java
# (Spark) and RE2 (DuckDB) interpret identically, so the operator stays
# oracle-checkable. Order matters: longer/more-specific first.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(documents: DataFrame) -> DataFrame:
    """Free-text PII scrubbing — the document-level analog of the
    reference's column-level redaction (reference relation.py redactions;
    columns get literal replacement, prose gets pattern replacement).
    Chained regexp_replace, one per pattern class, plus per-class hit
    counts. Pure projection: no shuffle, no UDF — at 100 TB this is
    map-side work fused into the scan."""
    scrubbed = F.col("text")
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0)).alias(
                f"n_{name}"
            )
        )
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return documents.select(
        "doc_id",
        *counts,
        F.md5(scrubbed).alias("redacted_md5"),
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher/C4-style repetition quality signals: duplicate-token
    fraction per document and the share of the most frequent bigram
    (ties broken by lexicographic bigram for determinism).

    Documents with fewer than 2 tokens carry no bigram signal and are
    absent from the output (pinned in tests) — callers filtering a
    corpus should left-join this onto the corpus, not inner-join.

    Shape: the per-doc fractions are map-only HOFs; the top-bigram needs
    one explode + count + per-doc window. The shuffle carries (doc_id,
    bigram, count) — scalars, never the text."""
    from pyspark.sql.window import Window

    toks = tokens()
    base = documents.repartition(
        documents.sparkSession.sparkContext.defaultParallelism
    ).select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).alias("n_tokens"),
        # raw IEEE quotient of exact ints (r10 tie-class retirement)
        (
            (F.size(toks) - F.size(F.array_distinct(toks))).cast("double")
            / F.size(toks)
        ).alias("dup_token_fraction"),
    )
    n_bi = F.size(F.col("toks")) - 1
    bigrams = base.select(
        "doc_id",
        "n_tokens",
        "dup_token_fraction",
        F.explode(
            F.when(n_bi < 1, F.array().cast("array<string>")).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(n_bi, F.lit(1))),
                    lambda i: F.array_join(F.slice("toks", i, 2), " "),
                )
            )
        ).alias("bigram"),
    )
    counted = bigrams.groupBy(
        "doc_id", "n_tokens", "dup_token_fraction", "bigram"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("bigram"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "n_tokens",
            "dup_token_fraction",
            F.col("bigram").alias("top_bigram"),
            (F.col("cnt").cast("double") / (F.col("n_tokens") - 1)).alias(
                "top_bigram_fraction"
            ),
        )
    )


def dedup_lines(documents: DataFrame, strategy: str = "inline") -> DataFrame:
    """Within-document repeated-line removal — the RefinedWeb /
    MassiveText hygiene step that collapses boilerplate (nav menus,
    cookie banners, repeated headers) to a single copy: keep the FIRST
    occurrence of each distinct '\\n'-separated line, preserving line
    order. Complements corpus-level dedup (dedup.py operates ACROSS
    documents; this operates WITHIN one) and ``repetition_stats``
    (which measures token repetition but removes nothing).

    Two EXACT strategies with identical output (the r4 rule: the
    regime choice belongs to the caller; both replay against the same
    DuckDB oracle in tests/test_line_dedup.py):

    - ``strategy="inline"`` (default): all-Catalyst with NO
      data-dependent shuffle (the one Exchange is the round-robin
      repartition for scan parallelism — the repo's single-file-scan
      rule): an explode-let barrier pins split() to one evaluation per
      row (the r3 lesson — Generate blocks CollapseProject), then one
      indexed ``filter()`` keeps a line iff its ``array_position``
      (first occurrence, 1-based) equals its own index, and a SECOND
      explode-let materializes the filtered array before its two
      consumers (r12 review find: higher-order functions are
      CodegenFallback, excluded from codegen subexpression
      elimination — the collapsed form ran the O(L^2) filter twice per
      row). Per-doc cost is O(L^2) JVM line comparisons (L = line
      count).
    - ``strategy="exploded"``: posexplode to one row per line, keep
      rows whose position equals the window MIN position of their
      (doc, line) group, re-assemble with a sorted collect — O(L log L)
      per doc at the price of two data-dependent exchanges (the window
      on (doc_id, line) and the groupBy re-assembly). Per-doc scalars
      (n_lines) ride the explode instead of a join-back (the r2 rule).

    Measured crossover (SCALE.md r13, 64 docs/size, local[32],
    dup-heavy 50%-distinct lines, min-of-2 interleaved): inline wins
    below ~2-3k lines/doc (L=1k: 0.43 s vs 0.76 s; L=2k: 0.80 vs
    0.92) and degrades quadratically past it (L=8k: 5.7 s vs 1.0 s;
    L=32k: 89.6 s vs 1.45 s — 62x); exploded is FLAT in L (~1 s for
    every size measured, shuffle-floor dominated). Web corpora sit
    far below the crossover (RefinedWeb median is tens of lines), so
    inline is the right default; switch to "exploded" when a corpus
    can carry pathological multi-k-line documents (crawler dumps,
    logs, minified HTML).

    NULL text propagates (NULL clean_text / NULL counts, computed
    explicitly so the surface is session-independent — ANSI size(NULL)
    is NULL but legacy is -1). Empty text is one empty line, kept.
    Returns (doc_id, clean_text, n_lines, n_dupe_lines).
    """
    if strategy not in ("inline", "exploded"):
        raise ValueError(
            f"dedup_lines: unknown strategy {strategy!r} "
            "(expected 'inline' or 'exploded')"
        )
    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    staged = documents.repartition(parallelism).select(
        "doc_id",
        # explode-let: array(split(..)) is non-null even when text is
        # NULL, so NULL-text rows survive the Generate with _lines NULL
        F.explode(F.array(F.split(F.col("text"), "\n"))).alias("_lines"),
    )
    if strategy == "exploded":
        return _dedup_lines_exploded(staged)
    kept = F.filter(
        "_lines",
        lambda x, i: F.array_position(F.col("_lines"), x) == i + F.lit(1),
    )
    staged = staged.select(
        "doc_id", "_lines", F.explode(F.array(kept)).alias("_kept")
    )
    n_lines = F.size("_lines").cast("bigint")
    return staged.select(
        "doc_id",
        F.array_join("_kept", "\n").alias("clean_text"),
        F.when(F.col("_lines").isNotNull(), n_lines).alias("n_lines"),
        F.when(
            F.col("_lines").isNotNull(),
            (F.size("_lines") - F.size("_kept")).cast("bigint"),
        ).alias("n_dupe_lines"),
    )


def _dedup_lines_exploded(staged: DataFrame) -> DataFrame:
    """The O(L log L) strategy over the materialized `_lines` array:
    posexplode_outer (NULL-text rows survive as a NULL pos/line row),
    window-MIN first-occurrence filter, sorted-collect re-assembly.
    n_lines rides the explode as a per-doc scalar; positions are
    unique per row, so the struct sort is deterministic.

    The explode is keyed by an INTERNAL unique row id, not doc_id:
    the operator is per-ROW like the inline strategy, and duplicate
    doc_ids are legal input (wet_text_corpus emits content-addressed
    ids — identical extractions share one) — grouping by doc_id would
    merge such rows into one garbage row (r13 review find: duplicated
    clean_text, negative n_dupe_lines). monotonically_increasing_id's
    partition-dependence is harmless here: the id is consumed only as
    a grouping key inside this one plan and never emitted, so the
    OUTPUT is partition-invariant (pinned in
    tests/test_partition_invariance.py)."""
    from pyspark.sql.window import Window

    keyed = staged.select(
        F.monotonically_increasing_id().alias("_rid"), "doc_id", "_lines"
    )
    ex = keyed.select(
        "_rid",
        "doc_id",
        F.when(
            F.col("_lines").isNotNull(), F.size("_lines").cast("bigint")
        ).alias("n_lines"),
        F.posexplode_outer("_lines").alias("_pos", "_line"),
    )
    w = Window.partitionBy("_rid", "_line")
    firsts = ex.withColumn("_minpos", F.min("_pos").over(w)).where(
        F.col("_pos").isNull() | (F.col("_pos") == F.col("_minpos"))
    )
    agg = firsts.groupBy("_rid").agg(
        F.max("doc_id").alias("doc_id"),
        F.max("n_lines").alias("n_lines"),
        F.count("_pos").cast("bigint").alias("_n_kept"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("_pos").isNotNull(),
                    F.struct(F.col("_pos"), F.col("_line")),
                )
            )
        ).alias("_sorted"),
    )
    return agg.select(
        "doc_id",
        F.when(
            F.col("n_lines").isNotNull(),
            F.array_join(
                F.transform(F.col("_sorted"), lambda s: s["_line"]), "\n"
            ),
        ).alias("clean_text"),
        "n_lines",
        F.when(
            F.col("n_lines").isNotNull(),
            F.col("n_lines") - F.col("_n_kept"),
        ).alias("n_dupe_lines"),
    )


def pack_sequences(
    documents: DataFrame, budget: int = 2048, by: str = "lang"
) -> DataFrame:
    """Greedy sequence packing for training batches: within each stratum,
    documents (in doc_id order) fill fixed token-budget chunks; a chunk
    closes when the next document would not have started inside it.
    chunk_id = floor(tokens_before_this_doc / budget) — the deterministic
    streaming-pack rule (documents longer than the budget still advance
    the cursor, they just own several chunk-spans).

    One shuffle (window over the stratum); the running total is the only
    state, so skewed strata degrade to a single sorted partition — at
    100 TB, pack within finer strata (lang, shard) to bound partition
    size."""
    from pyspark.sql.window import Window

    n_toks = F.size(tokens())
    w = (
        Window.partitionBy(by)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    withcum = documents.select(
        "doc_id", by, n_toks.alias("n_tokens")
    ).select(
        "doc_id",
        by,
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("tokens_before"),
    )
    return withcum.select(
        "doc_id",
        by,
        "n_tokens",
        F.floor(F.col("tokens_before") / F.lit(budget))
        .cast("bigint")
        .alias("chunk_id"),
    )


def hash_split(
    documents: DataFrame,
    weights: dict[str, float] | None = None,
    salt: str = "v1",
    key: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic train/val/test assignment by identity hash — the
    split every training pipeline needs: stable under reruns, re-shards,
    and corpus growth (a doc's split never changes when other docs are
    added, unlike orderBy+ntile). bucket = first 8 hex digits of
    md5(key || salt) mod 10000, mapped to splits by cumulative weight
    ranges. md5-based so any ANSI engine reproduces it bit-for-bit;
    change ``salt`` to draw a fresh independent split. Pure projection:
    no shuffle, no RNG, no driver state."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {weights}")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col(key).cast("string"), F.lit(salt)).cast(
                        "binary"
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 10000
    )
    split_col = None
    edge = 0.0
    # deterministic range order: dict insertion order is the contract
    for name, w in weights.items():
        hi = edge + w * 10000
        cond = bucket < F.lit(int(round(hi)))
        split_col = (
            F.when(cond, F.lit(name))
            if split_col is None
            else split_col.when(cond, F.lit(name))
        )
        edge = hi
    return documents.select(
        *keep, key, bucket.alias("bucket"), split_col.alias("split")
    )


def unigram_logprob(documents: DataFrame) -> DataFrame:
    """CCNet-style unigram language-model quality score: build the corpus
    unigram distribution, then score each document by its mean smoothed
    token log-probability ln((c_t + 1) / (N + V)). Low scores flag
    gibberish / boilerplate; real pipelines threshold on this the way
    CCNet thresholds KenLM perplexity.

    Shape: explode -> count (one shuffle with map-side combine) -> join
    exploded tokens back on the token key (second shuffle) -> per-doc agg.
    The corpus totals (N, V) are a 1-row broadcast. At 100 TB the token
    join is the cost; the vocabulary side is Zipf-skewed but the count
    table is tiny relative to the corpus, so AQE broadcasts it in
    practice. Mean is the fixed-point ``_det_avg`` so the rounded result
    is reproducible across partitionings and engines.
    """
    from .similarity import _det_avg_round4

    # persist: the exploded token stream feeds both the count shuffle and
    # the scoring join — without it the tokenize re-runs per consumer
    toks = documents.select(
        "doc_id", F.explode(tokens()).alias("token")
    ).transform(track_persist)
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("v")
    )
    lp = F.log(
        (F.col("c") + F.lit(1)).cast("double")
        / (F.col("n_total") + F.col("v")).cast("double")
    )
    return (
        toks.join(counts, "token")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            _det_avg_round4(lp).alias("avg_logprob"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def bigram_logprob(documents: DataFrame) -> DataFrame:
    """Bigram language-model quality score — the KenLM-shaped upgrade of
    ``unigram_logprob``: each document's mean smoothed conditional token
    log-probability ln((c(w_prev, w) + 1) / (c_ctx(w_prev) + V)), where
    c_ctx is the count of bigrams starting with w_prev (derivable from
    the bigram table itself — no second corpus pass) and V the unigram
    vocabulary. Word-salad whose unigrams are common but transitions are
    not scores low; repeated boilerplate scores high — the signal CCNet
    thresholds KenLM perplexity on.

    Shape: one tokenize pass (repartitioned before the explode),
    zip_with over shifted slices for the bigram stream, one (w1, w2)
    count shuffle, a context roll-up of that count table, one join of
    the bigram stream back on its key (the cost center; the count side
    is Zipf-small and AQE broadcasts it in practice), fixed-point
    ``_det_avg`` per doc. Documents with fewer than two tokens have no
    bigrams and drop out, same as the oracle.
    """
    from .similarity import _det_avg_round4

    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    # persist: the tokenize pipeline has three consumers (the bigram
    # stream, the context roll-up's parent, and the vocab scan) — without
    # it each re-runs the regex split per consumer (the multi-evaluation
    # trap measured 3x cost on source_overlap_matrix)
    t = (
        documents.select("doc_id", tokens().alias("toks"))
        .repartition(parallelism)
        .transform(track_persist)
    )
    n1 = F.greatest(F.size("toks") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("toks", 1, n1),
        F.slice("toks", 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = t.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )
    # the Zipf-small count table also has two consumers (context roll-up
    # + the scoring join); persisting it avoids a second explode+shuffle
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb")).transform(track_persist)
    cc = bc.groupBy("w1").agg(F.sum("cb").alias("cctx"))
    vocab = t.select(F.explode("toks").alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    lp = F.log(
        (F.col("cb") + F.lit(1)).cast("double")
        / (F.col("cctx") + F.col("v")).cast("double")
    )
    return (
        big.join(bc, ["w1", "w2"])
        .join(cc, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            _det_avg_round4(lp).alias("avg_logprob"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


def source_mix(
    documents: DataFrame, budget_tokens: int = 100_000, by: str = "source"
) -> DataFrame:
    """Source-mixing rates: given a total token budget split equally
    across sources, the per-source sampling rate that hits it —
    rate = min(1, share / source_tokens). The knob every pretraining mix
    uses (up-weight small clean sources, down-sample the crawl).

    One agg shuffle on the source key; the per-source table is tiny, so
    the share division happens against a 1-row broadcast of the source
    count. Token totals are integer sums (exact, order-independent);
    the rate is the RAW IEEE quotient of the exact budget by the exact
    int64 token product (r10 tie-class retirement: ROUND of an
    exact-int rational diverges engines on decimal-half ties) —
    bit-identical on any engine."""
    per = documents.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens())).alias("n_tokens"),
    )
    n_sources = per.agg(F.count(F.lit(1)).alias("n_sources"))
    rate = F.least(
        F.lit(1.0),
        F.lit(float(budget_tokens))
        / (F.col("n_sources") * F.col("n_tokens")).cast("double"),
    )
    return (
        per.crossJoin(F.broadcast(n_sources))
        .select(
            by,
            "n_docs",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            rate.alias("sample_rate"),
        )
    )


def source_mix_waterfill(
    documents: DataFrame, budget_tokens: int = 100_000, by: str = "source"
) -> DataFrame:
    """Waterfilling source allocation — the fix for ``source_mix``'s
    blind spot: equal shares WASTE budget on sources smaller than their
    share (their surplus evaporates instead of flowing to the big
    sources). Classic max-min fair allocation: every source gets
    min(its total, the water level L), with L the unique level that
    spends the whole budget — small clean sources are taken whole, the
    crawl absorbs exactly the remainder. This is how real pretraining
    mixes express "all of Wikipedia, the rest from CommonCrawl" without
    hand-tuning per-source rates.

    Pure integer arithmetic: sort sources ascending by token total;
    after the k smallest are taken whole, the candidate level is
    (budget - cum_k) div (m - k); the final level is the candidate at
    the largest k whose next total still exceeds it. The solve runs
    driver-side over the per-source rollup (<= #sources rows — the
    kmeans bounded-collect convention; a corpus has thousands of
    sources, not billions), and is closed-form replayable in SQL via a
    cum-sum window over the sorted totals — the promotion path.

    Returns (source, n_docs, n_tokens, alloc_tokens, rate_milli) with
    sum(alloc) == min(budget, corpus total) exactly; rate_milli =
    (1000 * alloc) div total (truncating, positive operands — the
    engine-agreement regime).
    """
    if int(budget_tokens) < 0:
        # a negative budget makes Python floor-division (toward -inf)
        # diverge from the oracle's truncating `//` — and is meaningless
        raise ValueError(
            f"source_mix_waterfill: budget_tokens must be >= 0, "
            f"got {budget_tokens}"
        )
    per = (
        documents.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens())).cast("bigint").alias("n_tokens"),
        )
        .transform(track_persist)
    )
    collected = per.select(by, "n_tokens").collect()
    if any(r[0] is None or r[1] is None for r in collected):
        # a NULL group would be debited budget in the solve and then
        # silently dropped by the join-back (sum(alloc) != budget with
        # no error) — refuse loudly, like the z-order null guard. This
        # check must run BEFORE the sort: Python's None-vs-str/int
        # tuple compare crashed there first, masking the guard
        # (r10 degenerate-probe find)
        raise ValueError(
            f"source_mix_waterfill: NULL {by} group (or all-NULL "
            "texts) — coalesce or filter before allocating"
        )
    rows = sorted(collected, key=lambda r: (r[1], r[0]))
    m = len(rows)
    remaining, level = int(budget_tokens), 0
    allocs: dict = {}
    for i, r in enumerate(rows):
        total = int(r[1])
        fair = remaining // (m - i)
        if total <= fair:
            allocs[r[0]] = total
            remaining -= total
        else:
            # water level reached: everyone left gets `fair` (the first
            # few also absorb the division remainder, largest-first
            # would be arbitrary — keep the deterministic sorted order)
            rem = remaining - fair * (m - i)
            for j, rr in enumerate(rows[i:]):
                allocs[rr[0]] = fair + (1 if j < rem else 0)
            remaining = 0
            break
    # fold the solve back via a broadcast join, NOT a when-chain: a
    # chain is O(#sources) expression depth and stalls analysis at
    # thousands of sources (the realistic corpus shape)
    spark = documents.sparkSession
    from pyspark.sql.types import LongType, StructField, StructType

    # schema for the fold-back join derives from the grouping column's
    # actual type — a hard-coded STRING failed non-string `by` columns
    # at createDataFrame with an unhelpful error (r6 ADVICE)
    by_field = per.schema[by]
    alloc_df = spark.createDataFrame(
        [(s, a) for s, a in allocs.items()],
        StructType(
            [
                StructField(by, by_field.dataType, by_field.nullable),
                StructField("alloc_tokens", LongType(), False),
            ]
        ),
    )
    return per.join(F.broadcast(alloc_df), by, "left").select(
        by,
        "n_docs",
        "n_tokens",
        F.coalesce("alloc_tokens", F.lit(0))
        .cast("bigint")
        .alias("alloc_tokens"),
    ).select(
        by,
        "n_docs",
        "n_tokens",
        "alloc_tokens",
        F.expr(
            "CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) "
            "ELSE (1000 * alloc_tokens) div n_tokens END"
        ).alias("rate_milli"),
    )


def source_mix_temperature(
    documents: DataFrame, budget_tokens: int = 100_000, by: str = "source"
) -> DataFrame:
    """Temperature-based source allocation — the other standard mixing
    rule next to waterfilling: sample source i proportionally to
    n_i^(1/T), flattening the natural distribution so small
    sources/languages are over-represented (the multilingual-pretraining
    recipe from mBERT/XLM-R; T=2 i.e. alpha=0.5 is the common setting
    and the one implemented, because sqrt is the one power exactly
    computable in integers). Unlike waterfill, quotas may EXCEED a
    source's holdings — that is the point (small sources get multiple
    epochs); ``upsample_milli`` surfaces the per-source repeat factor.

    Exactness engineering: weight_i = isqrt(n_i) (exact integer sqrt —
    math.isqrt here, floor(sqrt(x)) with a +-1 integer correction in the
    SQL oracle, so no float ever decides an allocation); quota_i =
    budget * w_i div W plus largest-remainder top-up (+1 to the
    `leftover` sources with the largest `(budget*w_i) mod W`, ties by
    source ascending — fully deterministic), so sum(alloc) == budget
    EXACTLY whenever any source is non-empty. int64 headroom: budget *
    max(w_i) must stay < 2^63 — with w = isqrt(tokens) <= ~3e9 even a
    1e9-token source leaves room for a ~3e8-token budget per unit
    weight; the guard below refuses loudly past the bound.

    The solve is driver-side over the per-source rollup (<= #sources
    rows — the kmeans/waterfill bounded-collect convention) and folds
    back via a broadcast join. Returns (source, n_docs, n_tokens,
    weight_isqrt, alloc_tokens, upsample_milli) with upsample_milli =
    (1000 * alloc) div n_tokens (0 for empty sources).
    """
    import math

    if int(budget_tokens) < 0:
        raise ValueError(
            f"source_mix_temperature: budget_tokens must be >= 0, "
            f"got {budget_tokens}"
        )
    per = (
        documents.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens())).cast("bigint").alias("n_tokens"),
        )
        .transform(track_persist)
    )
    rows = per.select(by, "n_tokens").collect()
    if any(r[0] is None or r[1] is None for r in rows):
        raise ValueError(
            f"source_mix_temperature: NULL {by} group (or all-NULL "
            "texts) — coalesce or filter before allocating"
        )
    weights = {r[0]: math.isqrt(int(r[1])) for r in rows}
    total_w = sum(weights.values())
    budget = int(budget_tokens)
    if total_w > 0 and budget > (2**63 - 1) // max(weights.values()):
        raise ValueError(
            "source_mix_temperature: budget * max(weight) would "
            "overflow int64 — split the budget or pre-scale"
        )
    if total_w == 0:
        allocs = {s: 0 for s in weights}
    else:
        base = {s: budget * w // total_w for s, w in weights.items()}
        rem = {s: budget * w % total_w for s, w in weights.items()}
        leftover = budget - sum(base.values())
        topped = sorted(weights, key=lambda s: (-rem[s], s))[:leftover]
        allocs = {
            s: base[s] + (1 if s in set(topped) else 0) for s in weights
        }
    spark = documents.sparkSession
    from pyspark.sql.types import LongType, StructField, StructType

    by_field = per.schema[by]
    alloc_df = spark.createDataFrame(
        [(s, weights[s], allocs[s]) for s in weights],
        StructType(
            [
                StructField(by, by_field.dataType, by_field.nullable),
                StructField("weight_isqrt", LongType(), False),
                StructField("alloc_tokens", LongType(), False),
            ]
        ),
    )
    return per.join(F.broadcast(alloc_df), by, "left").select(
        by,
        "n_docs",
        "n_tokens",
        F.coalesce("weight_isqrt", F.lit(0)).cast("bigint").alias(
            "weight_isqrt"
        ),
        F.coalesce("alloc_tokens", F.lit(0)).cast("bigint").alias(
            "alloc_tokens"
        ),
        F.expr(
            "CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) "
            "ELSE (1000 * coalesce(alloc_tokens, 0)) div n_tokens END"
        ).alias("upsample_milli"),
    )


def percentile_filter(
    documents: DataFrame, p: float = 0.1, by: str = "lang"
) -> DataFrame:
    """Drop each stratum's shortest p-fraction of documents (the classic
    too-short filter, but with a per-language floor instead of one global
    constant). Exact rank arithmetic — keep rows with
    row_number > floor(p * n) ordered by (n_chars, doc_id) — so every
    engine agrees bit-for-bit; no percentile interpolation.

    One window shuffle per stratum. The within-stratum sort is the cost
    at 100 TB — for a skewed mega-stratum, compute the cutoff with
    approx_percentile and broadcast it instead; this exact form is the
    correctness oracle for that."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(by).orderBy("n_chars", "doc_id")
    ranked = documents.select(
        "doc_id",
        by,
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy(by)).alias("n"),
    )
    return ranked.where(
        F.col("rk") > F.floor(F.lit(p) * F.col("n"))
    ).select("doc_id", by, "n_chars")


def cap_per_source(
    documents: DataFrame, k: int = 100, salt: str = "cap"
) -> DataFrame:
    """Cap each source at k documents, chosen by deterministic hash rank
    (md5 of doc_id + salt) — the per-domain cap crawl pipelines apply so
    no single site dominates the mix. Hash order makes the kept set a
    uniform pseudo-random sample that is stable across reruns and
    re-shards, unlike rand()-based sampling.

    One window shuffle on source. A mega-source makes one hot partition;
    at 100 TB pre-filter with a per-partition local top-k (sort within
    parquet partitions, keep k per source per partition, then the global
    window over the <= k * n_partitions survivors)."""
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt)))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        documents.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= F.lit(k))
        .select("doc_id", "source")
    )


def top_vocab(documents: DataFrame, size: int = 1000) -> DataFrame:
    """The corpus's ``size`` most frequent tokens (deterministic
    tie-break on the token itself) — a stand-in for a tokenizer
    vocabulary. Count agg with map-side combine, then a global top-k
    (TakeOrderedAndProject — per-partition heaps, never a full sort)."""
    return (
        documents.select(F.explode(tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "token")
        .limit(size)
        .select("token")
    )


def oov_rate(documents: DataFrame, vocab: DataFrame) -> DataFrame:
    """Per-document out-of-vocabulary rate against a reference vocabulary
    (the tokenizer-coverage check run before training: a high OOV rate
    flags encoding damage, wrong language, or a vocab mismatch).
    ``vocab`` needs a ``token`` column and is broadcast — tokenizer
    vocabularies are tiny next to the corpus, so the membership probe
    never shuffles corpus rows; the only shuffle is the per-doc re-agg
    on doc_id. Integer counts -> exact rational rate, deterministic."""
    ex = documents.select("doc_id", F.explode(tokens()).alias("token"))
    marked = ex.join(
        F.broadcast(vocab.select("token").withColumn("in_vocab", F.lit(1))),
        "token",
        "left",
    )
    n_oov = F.sum(
        F.when(F.col("in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0))
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        n_oov.alias("n_oov"),
        # raw IEEE quotient of exact ints (r10 tie-class retirement)
        (n_oov.cast("double") / F.count(F.lit(1))).alias("oov_rate"),
    )


def weighted_sample_per_group(
    documents: DataFrame,
    k: int = 100,
    weight: Column | str = "n_chars",
    by: str = "lang",
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sample of k docs per stratum — Efraimidis-
    Spirakis A-Res with the uniform drawn from an identity hash instead
    of an RNG: priority = ln(u) / w, keep the top-k priorities (largest
    ln(u)/w, i.e. u^(1/w) order). Inclusion probability scales with the
    weight (sample quality-scored docs proportionally) while staying
    reproducible across reruns and re-shards, which rand()-based
    sampling is not. u = (bucket + 0.5) / 2^32 from the first 8 md5 hex
    digits of (doc_id, salt) — any ANSI engine replays it bit-for-bit.

    One window shuffle per stratum; WindowGroupLimit prunes to k per
    partition map-side before the exchange, so the shuffle carries
    ~k * n_partitions rows, not the corpus.

    Rows with weight <= 0 (or NULL) are excluded BEFORE the draw (r11,
    the degenerate-probe find): ln(u)/0 is a non-finite priority, and
    A-Res semantics give zero-weight items inclusion probability 0
    anyway — while DuckDB sorts the resulting NULLs first on DESC and
    Spark sorts them last, so filtering is the only replayable form.
    The q_weighted_sample oracle carries the same WHERE."""
    from pyspark.sql.window import Window

    w_col = F.col(weight) if isinstance(weight, str) else weight
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    u = (bucket.cast("double") + F.lit(0.5)) / F.lit(float(1 << 32))
    priority = F.log(u) / w_col.cast("double")
    win = Window.partitionBy(by).orderBy(F.col("priority").desc(), "doc_id")
    return (
        documents.where(w_col.cast("double") > F.lit(0.0))
        .select("doc_id", by, priority.alias("priority"))
        .withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") <= F.lit(k))
        .select("doc_id", by)
    )


def _lang_score(toks: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*markers)))


def lang_id(documents: DataFrame) -> DataFrame:
    """Heuristic language ID: score each language profile by marker-token
    hits, take the argmax (ties broken by language code for determinism).
    Entirely JVM-side, no UDF, no shuffle.

    Two explode-lets (zero-shuffle optimizer barriers) pin the expensive
    subtrees to one evaluation per row: the token array feeds FIVE
    profile filters, and the sorted score array is read by TWO getFields
    — inlined, CollapseProject re-runs the split per filter and the
    whole sort per field (measured 1.4x at the 100x corpus)."""
    scored = F.array(
        *[
            F.struct(
                (-_lang_score(F.col("toks"), markers)).alias("neg_score"),
                F.lit(lang).alias("lang"),
            )
            for lang, markers in sorted(LANG_PROFILES.items())
        ]
    )
    return (
        documents.select(
            "doc_id", F.explode(F.array(tokens())).alias("toks")
        )
        .select(
            "doc_id",
            F.explode(F.array(F.sort_array(scored).getItem(0))).alias("best"),
        )
        .select(
            "doc_id",
            F.col("best.lang").alias("pred_lang"),
            (-F.col("best.neg_score")).alias("marker_hits"),
        )
    )


def lexical_zipf_stats(documents: DataFrame) -> DataFrame:
    """Per-source lexical-diversity and Zipf-law statistics: token count,
    type count, type-token ratio, and the slope of ln(freq) ~ ln(rank)
    over the source's term-frequency distribution (Zipf's law predicts
    ~ -1 for natural language; corpus-quality pipelines use the deviation
    to flag boilerplate/spam sources).

    Two shuffles: (source, token) term frequencies, then a per-source
    rank window + final aggregate. The slope is least-squares computed
    from EXACT integer sums: ln(rank), ln(freq) are rounded to 1e-6
    micro-units per row (deterministic map-side op), the sums
    n*Sxy - Sx*Sy / n*Sxx - Sx^2 run in bigint, and only the final
    division touches floats — so the rounded result is reproducible
    across engines and partition orders (the repo's fixed-point
    convention, see similarity._det_avg). Overflow headroom: micro-unit
    ln values are < 4e7 for any realistic vocabulary, so Sxy terms stay
    ~1e17 < 2^63 up to ~50M distinct terms per source.
    """
    from pyspark.sql.window import Window

    tf = (
        documents.select("source", F.explode(tokens()).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("freq"), F.asc("tok"))
    ranked = tf.select(
        "source",
        "freq",
        F.row_number().over(w).alias("rnk"),
    )
    x = F.round(F.log(F.col("rnk").cast("double")) * 1e6).cast("long")
    y = F.round(F.log(F.col("freq").cast("double")) * 1e6).cast("long")
    agg = ranked.groupBy("source").agg(
        F.sum("freq").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    n = F.col("n_types")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    # raw IEEE quotients of exact int64s (r10 tie-class retirement).
    # Casting an int64 above 2^53 to double rounds, but both engines
    # cast the SAME exact integer identically (IEEE round-to-nearest),
    # so the quotient stays bit-identical cross-engine. den >= 0 by
    # Cauchy-Schwarz, so a zero numerator cannot produce -0.0.
    slope = F.when(den == 0, F.lit(0.0)).otherwise(
        num.cast("double") / den.cast("double")
    )
    return agg.select(
        "source",
        "n_tokens",
        "n_types",
        (n.cast("double") / F.col("n_tokens")).alias("ttr"),
        slope.alias("zipf_slope"),
    )


def curriculum_bins(documents: DataFrame, n_bins: int = 10) -> DataFrame:
    """Curriculum binning: NTILE the corpus into difficulty buckets per
    source, ordered by a deterministic difficulty key (document length,
    doc_id tie-break). Training pipelines feed bins in order (short/easy
    first) or sample bin-stratified batches.

    The window partitions by source, so each source sorts independently —
    the scale unit is one source, not the corpus. A single skewed source
    still total-orders on one reducer; NTILE semantics require that. For
    a truly unbounded single source, swap the exact NTILE for range
    binning on pre-agreed length boundaries (no global sort)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return documents.select(
        "doc_id",
        "source",
        "n_chars",
        F.ntile(n_bins).over(w).alias("bin"),
    )


def sliding_chunks(
    documents: DataFrame, size: int = 64, overlap: int = 16
) -> DataFrame:
    """Sliding-window document chunking — the RAG/pretraining prep step
    between whole-document packing (``pack_sequences``) and span dedup
    (``dedup.chunk_dedup``): split each document into token windows of
    ``size`` with ``overlap`` tokens of context carried across window
    boundaries (stride = size - overlap). The final partial window is
    kept (it holds the document tail); a doc shorter than ``size``
    yields exactly one chunk.

    All Catalyst: one round-robin exchange for parallelism (the repo's
    single-file-scan rule), then a map-only sequence() over chunk
    starts, explode, array_join of the token slice — no data-dependent
    shuffle, which is what a 100 TB chunking pass must be. Emits the
    chunk md5 rather
    than the text so downstream dedup joins move 16-byte keys, plus
    (start_tok, n_tok) so the caller can slice the original lazily.
    Returns (doc_id, chunk_idx, start_tok, n_tok, chunk_md5).
    """
    if overlap >= size:
        raise ValueError(f"overlap {overlap} must be < size {size}")
    stride = size - overlap
    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    toks = documents.select("doc_id", tokens().alias("toks")).repartition(
        parallelism
    )
    n = F.size("toks")
    # number of chunks: ceil(max(n - overlap, 1) / stride), minimum 1
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)),
        F.lit(1),
    ).cast("int")
    chunks = toks.select(
        "doc_id",
        "toks",
        n.alias("n_toks"),
        F.explode(
            F.sequence(F.lit(0), n_chunks - 1)
        ).alias("chunk_idx"),
    ).select(
        "doc_id",
        "chunk_idx",
        (F.col("chunk_idx") * stride).alias("start_tok"),
        F.least(
            F.lit(size), F.col("n_toks") - F.col("chunk_idx") * stride
        ).alias("n_tok"),
        F.md5(
            F.array_join(
                F.slice(
                    "toks", F.col("chunk_idx") * stride + 1, F.lit(size)
                ),
                " ",
            )
        ).alias("chunk_md5"),
    )
    return chunks


def bm25_search(
    documents: DataFrame,
    query_terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
) -> DataFrame:
    """BM25 ranked retrieval (the Okapi/Lucene scoring function): top-k
    documents for a bag of query terms, idf * tf*(k1+1) / (tf + k1*(1-b
    + b*|d|/avgdl)) summed over matched terms, with Lucene's
    non-negative idf = ln(1 + (N-df+0.5)/(df+0.5)).

    Shape: the term filter lands BEFORE any shuffle (predicate on the
    exploded token stream — at 100 TB only postings for the query terms
    ever move), tf is one (doc, term) aggregate over that sliver, df and
    the corpus stats (N, total length) are tiny broadcast sides. Scores
    are summed as integer micro-units per doc (the `_det_avg`
    convention; term scores are non-negative so HALF_UP == half-away),
    the global top-k runs as a distributed TakeOrdered with a (score,
    doc_id) tie-break, and rank is assigned AFTER the limit so no
    single-partition window ever sees more than `topk` rows.
    """
    if not query_terms:
        raise ValueError("bm25_search: at least one query term required")
    d = documents.select("doc_id", F.size(tokens()).alias("dl"))
    stats = d.agg(
        F.sum("dl").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    q = documents.select(
        "doc_id", F.explode(tokens()).alias("token")
    ).where(F.col("token").isin(*query_terms))
    # persist: tf is bounded by matched-docs x |query terms| and has two
    # consumers (the scoring join and the df rollup) — without it Spark
    # re-evaluates the tokenize+explode pipeline for each (plan showed
    # two Generate operators)
    tf = (
        q.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(track_persist)
    )
    # df rolls up from the tf table (tf rows are distinct (doc, term)) —
    # one corpus tokenize pass serves both, instead of two scans
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    avgdl = F.col("tot") / F.col("n")
    den = F.col("tf") + F.lit(k1) * (
        F.lit(1 - b) + F.lit(b) * F.col("dl") / avgdl
    )
    score = idf * (F.col("tf") * F.lit(k1 + 1)) / den * F.lit(1e6)
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(d, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(F.round(score).cast("long")).alias("score_micro"),
            F.count(F.lit(1)).alias("n_hit_terms"),
        )
    )
    top = scored.orderBy(
        F.col("score_micro").desc(), F.col("doc_id")
    ).limit(topk)
    rk = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    return top.select(
        F.row_number().over(rk).alias("rnk"),
        "doc_id",
        "score_micro",
        "n_hit_terms",
    )


def rrf_fuse(rankings: list, k: int = 60) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009) — the
    standard way to combine heterogeneous retrieval rankings (sparse
    lexical + dense, or any N rankers) without score calibration:

        rrf(doc) = sum over lists of 1 / (k + rank)

    surfaced here in EXACT integer micro-units, 1_000_000 div (k+rank)
    — integer division on positive operands, identical in Spark `div`
    and any ANSI `//`, so fusion is oracle-replayable with no float
    anywhere. k=60 is the paper's constant.

    Each input must be a RANKED TOP-K LIST with (doc_id, rnk) columns —
    bounded by contract, which is why the fused row_number window
    (ordered by rrf_micro DESC, doc_id) is legal: it sorts the union of
    k-bounded lists, never a corpus. A doc_id repeated WITHIN one list
    contributes once, at its best (minimum) rank — the per-list dedup
    below makes duplicate postings inflate neither n_lists nor
    rrf_micro (r7 ADVICE). k >= 1 is required so k + rnk can never be
    0 on rank-1 rows: integer `div` by zero returns NULL, which F.sum
    would silently SKIP — a vanished contribution, not an error
    (the validate-at-plan-construction rule). Returns (fused_rank,
    doc_id, n_lists, rrf_micro)."""
    if not rankings:
        raise ValueError("rrf_fuse: at least one ranking required")
    if k < 1:
        raise ValueError(f"rrf_fuse: k must be >= 1, got {k}")
    parts = [
        r.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .groupBy("doc_id")
        .agg(F.min("rnk").alias("rnk"))
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        F.sum(F.expr(f"1000000 div ({int(k)} + rnk)"))
        .cast("bigint")
        .alias("rrf_micro"),
    )
    w = Window.orderBy(F.col("rrf_micro").desc(), F.col("doc_id"))
    return fused.select(
        F.row_number().over(w).cast("bigint").alias("fused_rank"),
        "doc_id",
        "n_lists",
        "rrf_micro",
    )


def hybrid_search(
    documents: DataFrame,
    query_terms: tuple[str, ...],
    topk: int = 20,
    k: int = 60,
) -> DataFrame:
    """Hybrid retrieval over the corpus: BM25 (idf- and
    length-normalized) fused with a raw term-frequency ranking by RRF.
    The second ranker deliberately OMITS idf and length normalization,
    so the two lists genuinely disagree on term-stuffed long documents
    — the disagreement RRF exists to arbitrate. Swap either list for an
    embedding ranker (similarity.brute_force_topk / pq_topk emit ranked
    lists too) for dense+sparse hybrid; rrf_fuse only needs (doc_id,
    rnk).

    Scale profile: both rankers filter to query-term postings BEFORE
    any shuffle (the bm25_search shape); the fusion itself touches
    2*topk rows."""
    if not query_terms:
        raise ValueError(
            "hybrid_search: at least one query term required"
        )
    bm = bm25_search(documents, query_terms, topk=topk).select(
        "doc_id", "rnk"
    )
    tfq = (
        documents.select("doc_id", F.explode(tokens()).alias("token"))
        .where(F.col("token").isin(*query_terms))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tftop = tfq.orderBy(F.col("tf").desc(), F.col("doc_id")).limit(topk)
    wt = Window.orderBy(F.col("tf").desc(), F.col("doc_id"))
    tfr = tftop.select(
        F.row_number().over(wt).cast("bigint").alias("rnk"), "doc_id"
    )
    return rrf_fuse([bm, tfr], k=k)


def pmi_pairs(
    documents: DataFrame, min_count: int = 5, max_vocab: int = 1000
) -> DataFrame:
    """Document-level co-occurrence PMI: for token pairs appearing in at
    least ``min_count`` common documents, ln(c_ab * N / (c_a * c_b)) over
    document frequencies — the collocation / embedding-preprocessing
    signal (word2vec's SGNS is implicit shifted-PMI factorization).

    Shape: distinct tokens per doc (array_distinct, map-side), document
    frequencies carried THROUGH the pair join rather than re-joined
    after (repo convention for per-group scalars), and the quadratic
    per-doc pair fan-out bounded by a top-``max_vocab``-by-df vocabulary
    cap — the same population-cap lever as ngram max_df / simhash
    max_bucket: pairs per doc <= C(min(doclen, max_vocab), 2) and the
    long Zipf tail never enters the self-join. The vocab ranking window
    runs over the (bounded) vocabulary table, not the corpus. PMI is a
    per-row float from exact integers (no order-dependent sums); the
    rounded surface rides on integer counts.
    """
    d = documents.select(
        "doc_id", F.explode(F.array_distinct(tokens())).alias("token")
    ).transform(track_persist)
    dfreq = d.groupBy("token").agg(F.count(F.lit(1)).alias("dfc"))
    vr = Window.orderBy(F.col("dfc").desc(), F.col("token"))
    vocab = (
        dfreq.select("token", "dfc", F.row_number().over(vr).alias("r"))
        .where(F.col("r") <= max_vocab)
        .drop("r")
    )
    dv = d.join(F.broadcast(vocab), "token")
    left = dv.select(
        "doc_id", F.col("token").alias("w1"), F.col("dfc").alias("c_a")
    )
    right = dv.select(
        "doc_id", F.col("token").alias("w2"), F.col("dfc").alias("c_b")
    )
    nd = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    pairs = (
        left.join(right, "doc_id")
        .where(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(
            F.count(F.lit(1)).alias("c_ab"),
            F.first("c_a").alias("c_a"),
            F.first("c_b").alias("c_b"),
        )
        .where(F.col("c_ab") >= min_count)
    )
    pmi = F.log(
        (F.col("c_ab") * F.col("n_docs")) / (F.col("c_a") * F.col("c_b"))
    )
    return pairs.crossJoin(F.broadcast(nd)).select(
        "w1",
        "w2",
        "c_ab",
        # KEPT rounded (r10 sweep): log-derived double — never a
        # 4-decimal-half shortest repr except log(1)=0.0 exactly, which
        # both engines emit identically
        (F.round(pmi, 4) + F.lit(0.0)).alias("pmi_r4"),
    )


def source_kl(documents: DataFrame) -> DataFrame:
    """Per-source KL divergence from the corpus token distribution —
    the domain-shift / contamination dashboard number: KL(P_source ||
    P_corpus) = sum_t p_st * ln(p_st / p_ct). A source whose unigram
    mix diverges from the corpus (different language register, spam,
    template boilerplate) scores high and gets a human look before the
    next training mix.

    Shape: ONE tokenize+count pass — the (source, token) count table is
    the root, and per-source totals, corpus totals, and the corpus
    vocabulary all roll up from it (no second corpus scan); the rollups
    are vocab-x-sources bounded, broadcast back. Per-token terms are
    deterministic floats from exact integers, summed in micro-units
    (the `_det_avg` convention) so the per-source sum is
    partition-order independent. Integer products c_st * n must fit
    int64 — fine to ~3e9 tokens per cell; beyond that pre-divide into
    doubles and accept last-bit drift.
    """
    # persist: the count table is sources x vocab bounded (tiny relative
    # to the corpus) and has FOUR consumers (itself, both rollups, the
    # grand total) — without it each re-runs the tokenize+count scan
    # (the multi-evaluation trap; measured 8 corpus scans in the plan)
    st = (
        documents.select("source", F.explode(tokens()).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c_st"))
        .transform(track_persist)
    )
    s_tot = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    g_tot = st.groupBy("token").agg(F.sum("c_st").alias("c_t"))
    n = st.agg(F.sum("c_st").alias("n"))
    term = (F.col("c_st") / F.col("n_s")) * F.log(
        (F.col("c_st") * F.col("n")) / (F.col("n_s") * F.col("c_t"))
    )
    return (
        st.join(F.broadcast(s_tot), "source")
        .join(F.broadcast(g_tot), "token")
        .crossJoin(F.broadcast(n))
        .groupBy("source")
        .agg(
            F.sum(F.round(term * F.lit(1e6)).cast("long")).alias("kl_micro"),
            F.first("n_s").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab_used"),
        )
    )


def gopher_quality_rules(
    documents: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 100000,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_token_ratio: float = 0.7,
    max_dup_token_fraction: float = 0.3,
) -> DataFrame:
    """Gopher-style rule battery (Rae et al. 2021, table A1 shape): the
    named heuristic filters production curation runs apply before any
    model-based scoring — length bounds, mean-token-length window,
    symbol ratio, alphabetic-token ratio, duplicate-token fraction.
    Emits one row per document with an integer flag PER RULE plus the
    conjunction, so a curation dashboard can see which rule fires
    instead of a single opaque boolean (the reason real pipelines log
    per-rule pass rates).

    All signals are single-pass map-side HOFs over the token array —
    zero shuffle, whole-stage codegen; integer flags are the hashed
    surface (ratios never leave the row). Thresholds are the
    published-ballpark defaults; tune per corpus.
    """
    toks = tokens()
    n = F.size(toks)
    total_chars = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
    )
    avg_len = total_chars / n
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$")))
    n_symbolish = F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", ""))
    dup_frac = (n - F.size(F.array_distinct(toks))) / n
    rules = {
        "ok_n_tokens": (n >= min_tokens) & (n <= max_tokens),
        "ok_avg_token_len": (avg_len >= min_avg_token_len)
        & (avg_len <= max_avg_token_len),
        "ok_symbol_ratio": n_symbolish
        <= F.length("text") * F.lit(max_symbol_ratio),
        "ok_alpha_ratio": n_alpha >= n * F.lit(min_alpha_token_ratio),
        "ok_dup_tokens": dup_frac <= F.lit(max_dup_token_fraction),
    }
    cols = [c.cast("int").alias(name) for name, c in rules.items()]
    passed = None
    for name, c in rules.items():
        passed = c if passed is None else (passed & c)
    return documents.select(
        "doc_id", *cols, passed.cast("int").alias("passes_all")
    )


def _bpe_fold(syms: list, a: str, b: str) -> list:
    """Left-to-right non-overlapping merge of the pair (a, b) — the
    exact pending-symbol fold semantics of the Catalyst aggregate-HOF
    the distributed path runs (and of string replace over
    separator-joined symbols, the apply_bpe_merges identity)."""
    out: list = []
    pending = None
    for x in syms:
        if pending == a and x == b:
            out.append(a + b)
            pending = None
        else:
            if pending is not None:
                out.append(pending)
            pending = x
    if pending is not None:
        out.append(pending)
    return out


def learn_bpe_merges(
    documents: DataFrame,
    n_merges: int = 10,
    min_pair_count: int = 2,
    counts_out: list | None = None,
    driver_vocab_max_words: int = 65_536,
) -> tuple[list, DataFrame]:
    """Distributed BPE merge learning (Sennrich et al. 2016) — actually
    TRAIN the subword vocabulary, not just apply one: iteratively merge
    the most frequent adjacent symbol pair, ties broken
    lexicographically for determinism.

    The scale insight is the classic one: BPE learning never touches the
    corpus after ONE word-count pass — every iteration operates on the
    WORD FREQUENCY table (vocabulary-bounded, millions of rows at web
    scale, not billions), so per merge the cost is one map-side
    sequential fold over short symbol arrays plus one small pair-count
    shuffle. Only the single argmax row reaches the driver per iteration
    (the kmeans convention), and `localCheckpoint` keeps the iteration
    lineage flat. The merge application is a pure Catalyst aggregate-HOF
    fold (state = (output array, pending symbol)) — left-to-right,
    non-overlapping, exactly the reference algorithm's semantics.

    Returns (ordered merge list [(a, b), ...], final symbol table
    (word, n, syms)). ``counts_out``, if given, receives the winning
    pair count per merge (parallel to the merge list) — the surface
    the driver-gated ``q_bpe_learn`` hashes so the oracle verifies not
    just WHICH pair won each argmax but its exact weighted count.
    """
    words = (
        documents.select(F.explode(tokens()).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # char split: substring(w, i, 1) per position (guarded sequence —
    # F.sequence counts DOWN for n < 1, the empty-token case)
    chars = F.when(F.length("w") < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        )
    )
    syms = words.select("w", "n", chars.alias("syms")).localCheckpoint(
        eager=True
    )
    merges: list = []
    # r14 fast path (guide §1.2 — the union-find precedent): the loop
    # state is the VOCABULARY table, and the measured per-merge cost at
    # bench scale is 3 Spark jobs of fixed overhead (argmax collect +
    # checkpointed re-segment; 27 jobs / 2.5 s for 8 merges over a
    # 31-token vocab). When the checkpointed vocab fits the driver
    # bound (65,536 words is a few MB over Arrow — the kmeans/bpe
    # bounded-collect convention), collect it once and run the SAME
    # weighted-pair-count / (cnt DESC, a, b)-argmax / pending-symbol
    # fold loop in Python. Bit-identical: counts are exact integer
    # sums, Python tuple-of-str comparison equals Spark's string
    # ordering (UTF-8 byte order preserves code-point order), and
    # `_bpe_fold` IS the Catalyst fold's semantics (pinned by the
    # textbook/left-to-right tests and the random-corpus DuckDB
    # differential, which now exercises this path). Web-scale vocabs
    # (millions of words) keep the distributed loop below — the choice
    # derives from the measured vocab count, never a local[32]
    # constant.
    if syms.count() <= driver_vocab_max_words:
        vocab = [
            (r["w"], int(r["n"]), list(r["syms"]))
            for r in syms.collect()
        ]
        for _ in range(n_merges):
            cnts: dict = {}
            for _w, wn, ws in vocab:
                for i in range(len(ws) - 1):
                    p = (ws[i], ws[i + 1])
                    cnts[p] = cnts.get(p, 0) + wn
            if not cnts:
                break
            (a, b), cnt = min(
                cnts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if cnt < min_pair_count:
                break
            merges.append((a, b))
            if counts_out is not None:
                counts_out.append(int(cnt))
            vocab = [
                (w, wn, _bpe_fold(ws, a, b)) for w, wn, ws in vocab
            ]
        seg = documents.sparkSession.createDataFrame(
            sorted(vocab), "w string, n bigint, syms array<string>"
        )
        return merges, seg
    n1 = F.greatest(F.size("syms") - 1, F.lit(0))
    pair_struct = F.zip_with(
        F.slice("syms", 1, n1),
        F.slice("syms", 2, n1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    for _ in range(n_merges):
        top = (
            syms.select("n", F.explode(pair_struct).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        if counts_out is not None:
            counts_out.append(int(top[0]["cnt"]))
        merged = F.lit(a + b)
        # left-to-right non-overlapping merge as a sequential fold:
        # state.pending holds the previous unmerged symbol
        init = F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(None).cast("string").alias("pending"),
        )
        step = lambda acc, x: F.when(  # noqa: E731
            (acc["pending"] == F.lit(a)) & (x == F.lit(b)),
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit(None).cast("string").alias("pending"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["pending"].isNull(), acc["out"]
                ).otherwise(
                    F.concat(acc["out"], F.array(acc["pending"]))
                ).alias("out"),
                x.alias("pending"),
            )
        )
        fin = lambda acc: F.when(  # noqa: E731
            acc["pending"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pending"])))
        syms = syms.select(
            "w", "n", F.aggregate("syms", init, step, fin).alias("syms")
        ).localCheckpoint(eager=True)
    return merges, syms


def apply_bpe_merges(
    documents: DataFrame, merges: list
) -> DataFrame:
    """Apply a learned BPE merge list (from ``learn_bpe_merges``) to the
    corpus and count subword tokens per document — the other half of the
    tokenizer story: learn on the word table, SEGMENT on the corpus.

    Replays the merges in learned order, entirely map-side (zero
    shuffle, the merge list folds into the expression tree as
    literals), so segmentation is a pure scan at any scale. Emits
    (doc_id, n_subwords, n_words); pipe the exploded subwords into any
    downstream counting/packing operator.

    Implementation (r5 rewrite): a left-to-right non-overlapping merge
    over a symbol array is IDENTICAL to literal string ``replace`` over
    the unit-separator-joined symbol string — replace scans left to
    right, never re-matches inside a replacement, and continues after
    it, which is exactly the pending-symbol fold semantics (the DuckDB
    oracle has always used this identity; now both engines run the
    same algorithm). Chained JVM string replaces stay in whole-stage
    codegen and measured 26x faster than the previous per-word
    aggregate-HOF fold with struct state (14.9 s -> 0.6 s at sf0.1,
    which was interpreted per symbol). chr(31) is safe as the
    separator because the corpus is pinned printable-ASCII at every sf
    (tests/test_robustness.py::
    test_documents_corpus_is_printable_ascii_across_sfs) — whitespace
    splitting alone would NOT justify this, \\x1f is not regex
    whitespace — and merged symbols never contain it.
    """
    sep = "\x1f"
    words = tokens()

    def _segment_count(w):
        # every char followed by sep ('.' can't match whitespace, and
        # tokens contain none): "ab" -> "a\x1fb\x1f"; merging the pair
        # (a,b) is replace("a\x1fb" -> "ab"), trailing sep survives, so
        # n_symbols = size(split(s, sep)) - 1 (empty word -> '' -> 0)
        s = F.regexp_replace(w, "(.)", "$1" + sep)
        for a, b in merges:
            s = F.replace(s, F.lit(a + sep + b), F.lit(a + b))
        return F.size(F.split(s, sep)) - F.lit(1)

    n_sub = F.aggregate(
        F.transform(words, _segment_count),
        F.lit(0),
        lambda acc, s: acc + s,
    )
    return documents.select(
        "doc_id",
        n_sub.alias("n_subwords"),
        F.size(words).alias("n_words"),
    )


def dsir_importance(
    documents: DataFrame,
    target: DataFrame,
    k: int | None = None,
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how much more likely its tokens are under a TARGET
    domain's language model than under the raw corpus's — the
    importance weight ln(p_tgt(doc)/p_raw(doc)) that made
    domain-matched pretraining subsets standard practice. ``target``
    is a DataFrame with a ``text`` column (the exemplar corpus:
    Wikipedia, textbooks, an eval domain); any slice of ``documents``
    works.

    Estimator shape (the hashed-ngram variant of the paper collapses
    to this under whitespace features): two add-one-smoothed unigram
    LMs — p(t) = (c_t + 1)/(N + V) with V = the union vocabulary — and
    w(doc) = sum_t n_t(doc) * [ln p_tgt(t) - ln p_raw(t)].

    Determinism engineering (the _det_avg discipline, one level up):
    the per-TOKEN log-ratio is rounded to integer milli-units in the
    vocab-bounded LM table — ONE double log per distinct token, not
    per occurrence — and each document's weight is then an exact int64
    dot product of token counts with those integers, so the surfaced
    ``weight_milli`` is identical across partitionings. Headroom:
    |log-ratio| < ln(N+V) (~30 milli-thousands at 1e13 tokens), so a
    doc needs > ~3e14 tokens to overflow int64 — unreachable.

    ``k`` selects the top-k weights deterministically ((weight DESC,
    doc_id) — the reproducible variant of the paper's Gumbel
    resampling) via TakeOrdered + a window over the <=k survivors
    (never a corpus-wide single-partition window). At 100 TB: one
    tokenize pass over each corpus (map-side count combine), the
    scoring join carries the Zipf-bounded LM table which AQE
    broadcasts — the unigram_logprob profile exactly.

    Returns (doc_id, n_tokens, weight_milli[, rank]) — rank only when
    ``k`` is given.
    """
    toks = documents.select(
        "doc_id", F.explode(tokens()).alias("token")
    ).transform(track_persist)
    raw_counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt_counts = (
        target.select(F.explode(tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    # union vocabulary: smoothing must share V or the two LMs are not
    # comparable (a raw-only token would get p_tgt over a smaller V).
    # persist: the vocab-bounded LM table feeds BOTH the totals agg and
    # the scoring join — unpersisted, the whole count pipeline (incl.
    # the target tokenize) re-ran per consumer (plan-pinned)
    lm = (
        raw_counts.join(tgt_counts, "token", "full_outer")
        .select(
            "token",
            F.coalesce("c_raw", F.lit(0)).alias("c_raw"),
            F.coalesce("c_tgt", F.lit(0)).alias("c_tgt"),
        )
        .transform(track_persist)
    )
    totals = lm.agg(
        F.sum("c_raw").alias("n_raw"),
        F.sum("c_tgt").alias("n_tgt"),
        F.count(F.lit(1)).alias("v"),
    )
    ratio_milli = F.round(
        (
            F.log((F.col("c_tgt") + 1).cast("double"))
            - F.log((F.col("n_tgt") + F.col("v")).cast("double"))
            - F.log((F.col("c_raw") + 1).cast("double"))
            + F.log((F.col("n_raw") + F.col("v")).cast("double"))
        )
        * 1000
    ).cast("long")
    weighted = (
        lm.crossJoin(F.broadcast(totals))
        .select("token", ratio_milli.alias("w_milli"))
    )
    scored = (
        toks.join(weighted, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w_milli").alias("weight_milli"),
        )
    )
    if k is None:
        return scored
    topk = scored.orderBy(
        F.col("weight_milli").desc(), F.col("doc_id")
    ).limit(k)
    w = Window.orderBy(F.col("weight_milli").desc(), F.col("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w))


def ccnet_buckets(
    documents: DataFrame, head: float = 1 / 3, middle: float = 2 / 3
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): rank each
    document by its language-model score WITHIN its language and label
    the best ``head`` fraction head, the next band middle, the rest
    tail — the standard three-way split LLM corpora ship with (train on
    head+middle, hold tail for ablations). Uses the engine's
    ``unigram_logprob`` as the scorer (swap in ``bigram_logprob`` for
    the KenLM-shaped upgrade); higher mean log-prob = less perplex =
    better, exactly CCNet's ordering.

    One scoring pass (the scorer's own shuffles), one per-language
    percent_rank window with a doc_id tie-break — the window partitions
    by language, so at 100 TB the per-partition sort is the cost; for
    very large monolingual corpora switch the rank to approx-quantile
    thresholds (B19's sketch) and keep the same labels.
    """
    scored = unigram_logprob(documents).join(
        documents.select("doc_id", "lang"), "doc_id"
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("avg_logprob").desc(), F.col("doc_id")
    )
    pr = F.percent_rank().over(w)
    bucket = (
        F.when(pr <= F.lit(head), F.lit("head"))
        .when(pr <= F.lit(middle), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.select(
        "doc_id", "lang", "avg_logprob", bucket.alias("bucket")
    )


def tokenizer_fertility(
    documents: DataFrame, merges: list
) -> DataFrame:
    """Tokenizer fertility report per language — the go/no-go metric
    for a subword vocabulary (fertility = subwords per word; chars per
    subword = compression): a tokenizer trained on English web text
    shows fertility blow-up on underrepresented languages, and THIS
    table is how that gets caught before training. Builds on
    ``apply_bpe_merges`` (zero-shuffle segmentation with the frozen
    merge list folded into the expression tree); one groupBy(lang)
    aggregation after a doc_id join to the lang column.

    Integer surfaces: summed word/subword/char counts plus milli
    ratios via truncating div — engine-exact, no float division.
    """
    seg = apply_bpe_merges(documents, merges)
    per_doc = seg.join(
        documents.select(
            "doc_id", "lang", F.length("text").alias("n_chars_txt")
        ),
        "doc_id",
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_subwords").cast("bigint").alias("n_subwords"),
            F.sum("n_chars_txt").cast("bigint").alias("n_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_subwords",
            # NULL on a zero denominator (a language whose docs carry no
            # words — whitespace/punctuation-only slices DO occur at
            # corpus scale): matches the oracle's DuckDB `//`, which
            # yields NULL on zero; Spark's `div` would raise under ANSI
            F.expr(
                "CASE WHEN n_words = 0 THEN CAST(NULL AS BIGINT) "
                "ELSE (1000 * n_subwords) div n_words END"
            ).alias("fertility_milli"),
            F.expr(
                "CASE WHEN n_subwords = 0 THEN CAST(NULL AS BIGINT) "
                "ELSE (1000 * n_chars) div n_subwords END"
            ).alias("chars_per_subword_milli"),
        )
    )
