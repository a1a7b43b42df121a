"""Source/sink helpers.

The reference's only "source" is the Snowflake information schema and its
only sinks are SQL/YAML files (reference queries.py, relation.py:251-288);
the engine generalizes to the formats a Spark deployment actually uses.
Parquet is the primary format (columnar, predicate/projection pushdown);
CSV/JSON readers take explicit schemas so a 100 TB read never pays
inference, and partitioned writes give partition-pruned scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..session import read_table


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read with the engine's nanos-timestamp normalization."""
    return read_table(spark, path)


def list_data_files(
    spark: SparkSession, path: str, suffix: str = ".parquet"
) -> list:
    """Recursive data-file listing through the Hadoop FileSystem API —
    the one listing seam every driver-side maintenance op goes through
    (r6 verdict: ``compact_files``/``zorder_layout_report`` used POSIX
    ``glob``, correct locally but dead on an object store). The
    FileSystem resolves from the path's scheme, so ``s3a://``/
    ``abfss://``/``gs://`` listings ride the same connector the
    executors use; a bare local path lists through ``file:``.
    Hidden/metadata files (``_SUCCESS``, ``.crc``, streaming metadata)
    are skipped by the same rule Spark's own readers apply
    (``InMemoryFileIndex.shouldFilterOutPathName``): a component is
    hidden when it starts with ``.``, or starts with ``_`` WITHOUT
    containing ``=`` — the ``=`` exemption is what keeps
    ``_file_id=K``-style partition directories visible. Applied to
    EVERY path component below the listed root, not just the leaf, so
    in-flight commit-protocol files under ``_temporary/`` or
    ``.hive-staging*/`` never leak into compaction byte counts or
    layout reports (the root directory's own name is exempt, like
    Spark's readers).

    Returns sorted [(uri, size_bytes)]. Driver-side and eager by
    design: callers are maintenance ops whose file counts are bounded
    (compaction batches, n_files report buckets). For listings that
    are themselves 100 TB-scale (millions of objects), push the
    listing into a job instead — this helper is the seam where that
    swap happens.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    root = fs.makeQualified(hpath).toString().rstrip("/")
    out = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        uri = st.getPath().toString()
        rel = uri[len(root):].lstrip("/") if uri.startswith(root) else (
            st.getPath().getName()
        )
        if uri.endswith(suffix) and not any(
            part.startswith(".")
            or (part.startswith("_") and "=" not in part)
            for part in rel.split("/")
        ):
            out.append((uri, int(st.getLen())))
    return sorted(out)


def _as_local_path(uri: str) -> str:
    """file:-scheme URI -> local path (for bounded driver-side footer
    reads via pyarrow); non-local URIs pass through unchanged so the
    caller's failure mode is an explicit 'no such file' rather than a
    silently skipped footer."""
    if uri.startswith("file:"):
        from urllib.parse import urlparse

        return urlparse(uri).path
    return uri


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV with an explicit schema — schema inference reads the data
    twice, which is never acceptable at scale."""
    return spark.read.options(header=header, **options).schema(schema).csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType, **options: str
) -> DataFrame:
    """JSON-lines with an explicit schema (same no-inference rule)."""
    return spark.read.options(**options).schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC read — the other columnar format Spark ships natively; gets
    the same predicate/projection pushdown as parquet from the v2 scan."""
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw-asset ingestion via the built-in ``binaryFile`` source — the
    front door for the multimodal pipeline: each matched file becomes
    one row (doc_id, asset_path, payload, n_bytes, modified_ms) whose
    ``payload`` is exactly the opaque binary column
    ``multimodal.binary_ops`` consumes (select doc_id, payload and go).
    ``glob`` maps to pathGlobFilter (e.g. ``*.jpg``) so format
    selection happens at LISTING time, before any byte is read.

    doc_id is ``xxhash64(asset_path)`` — stable across runs and
    clusters (monotonically_increasing_id is partition-dependent and
    would re-key every re-ingest). Scale note: binaryFile is NOT
    splittable — one file never spans tasks, so partition count tracks
    file count and a directory of millions of thumbnails wants
    compaction into archives upstream, while multi-GB videos want
    ``sample_frames``-style chunking AFTER ingest; also mind
    ``spark.sql.files.maxPartitionBytes`` only PACKS small files, it
    cannot split big ones here."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    return raw.select(
        F.xxhash64(F.col("path")).alias("doc_id"),
        F.col("path").alias("asset_path"),
        F.col("content").alias("payload"),
        F.col("length").alias("n_bytes"),
        # unix_millis keeps sub-second precision (unix_timestamp
        # truncates to seconds, which breaks latest-wins merges on
        # same-second rewrites); modificationTime is a regular LTZ
        # timestamp, so the NTZ epoch-math restriction does not apply
        F.unix_millis("modificationTime").alias("modified_ms"),
    )


def read_text_corpus(
    spark: SparkSession,
    path: str,
    whole_files: bool = False,
    source: str = "ingest",
) -> DataFrame:
    """Raw-text ingestion into the engine's documents shape
    (doc_id, text, lang, source, n_chars) — the missing first step of
    the curation pipeline for corpora that arrive as .txt, one document
    per LINE (``whole_files=False``, the JSONL-adjacent web-corpus
    layout; splittable, scales to any file size) or per FILE
    (``whole_files=True`` — wholetext mode; like binaryFile, one file
    per task, so mind file sizes).

    doc_id is ``xxhash64(text)`` (the repo's long-key convention) —
    content-addressed, so re-ingesting identical text re-keys
    identically and exact dedup upstream is a free side effect (two
    identical documents WILL collide by design; run ``dedup.
    exact_dedup`` semantics or keep both via a (doc_id, asset) pair).
    lang ships as 'und' — compose with ``text.lang_id`` downstream.
    """
    if whole_files:
        df = spark.read.text(path, wholetext=True)
    else:
        df = spark.read.text(path)
    return text_corpus_rows(df, source)


def text_corpus_rows(raw: DataFrame, source: str) -> DataFrame:
    """Shared projection turning a raw text reader's ``value`` column
    into the documents shape. ONE definition, consumed by both
    ``read_text_corpus`` and ``streaming.stream_text_corpus`` — the
    content-addressed doc_id identity across the batch/stream boundary
    is load-bearing for history-backed dedup, so the keying must not
    be able to drift between the two readers."""
    txt = F.col("value")
    return (
        raw.where(F.length(F.trim(txt)) > 0)
        .select(
            F.xxhash64(txt).alias("doc_id"),
            txt.alias("text"),
            F.lit("und").alias("lang"),
            F.lit(source).alias("source"),
            F.length(txt).alias("n_chars"),
        )
    )


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro read — gated: the spark-avro module is external since
    Spark 2.4 and is not on this build's classpath; raise an actionable
    error instead of Spark's generic one. Only the missing-module
    failure is translated — a missing path or corrupt file on a
    cluster that HAS the module must surface as itself, not as a bogus
    packaging hint."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:
        if "Failed to find data source" not in str(e):
            raise
        raise RuntimeError(
            "Avro support needs the external spark-avro package on the "
            "classpath (--packages org.apache.spark:spark-avro_2.13:<ver>); "
            f"underlying error: {e}"
        ) from e


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Hive-style partitioned parquet write. Readers filtering on the
    partition columns scan only matching directories (partition pruning —
    visible as PartitionFilters in the scan node). ``maxRecordsPerFile``
    caps file size so a skewed partition doesn't produce one giant file."""
    writer = df.write.mode(mode).partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 8
) -> "tuple[DataFrame, str]":
    """Attach a Z-order (Morton) key over ``cols``: each column is
    equi-depth bucketed into 2^bits cells via approxQuantile boundaries
    (one bounded driver list per column — equi-depth, so skewed
    distributions still spread across cells), and the cell coordinates
    are bit-interleaved so that rows close in the Z key are close in
    EVERY dimension at once. Bucketing + interleave are pure Catalyst
    bit arithmetic (an aggregate-HOF scan over the literal boundary
    array, then shift/or folds) — no UDF, no shuffle.

    Timestamp / date columns are supported by bucketing their epoch-
    micros surface (the repo's NTZ-safe ``session.epoch_micros``), so
    the natural event layout ``(user_id, ts)`` works out of the box.

    Returns (df_with_key, key_column_name)."""
    from ..session import epoch_micros

    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a long z-key")
    probs = [i / float(2**bits) for i in range(1, 2**bits)]
    # timestamps bucket on their epoch-micros surface (approxQuantile
    # only accepts numeric columns); ordering — all z-order needs — is
    # preserved exactly
    numeric = {}
    tmp = df
    for idx, c in enumerate(cols):
        dt = dict(df.dtypes)[c]
        if dt.startswith("timestamp") or dt == "date":
            numeric[c] = f"_znum{idx}"
            tmp = tmp.withColumn(numeric[c], epoch_micros(F.col(c)))
        else:
            numeric[c] = c
    # one job for ALL columns' boundaries, not one full scan per column
    bounds = tmp.stat.approxQuantile(
        [numeric[c] for c in cols], probs, 0.001
    )
    keyed = tmp
    for idx, c in enumerate(cols):
        nc = numeric[c]
        arr = F.array(*[F.lit(float(b)) for b in bounds[idx]])
        cell = F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col(nc).cast("double") >= b, 1).otherwise(0),
        )
        # explode-let pins the 2^bits-element boundary fold to ONE eval
        # per row — inlined, the bit extraction below would re-run it
        # `bits` times per row (CollapseProject)
        keyed = keyed.withColumn(f"_zcell{idx}", F.explode(F.array(cell)))
    z = F.lit(0).cast("long")
    for idx in range(k):
        cell_col = F.col(f"_zcell{idx}")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cell_col, i)
                    .bitwiseAND(F.lit(1))
                    .cast("long"),
                    i * k + idx,
                )
            )
    keyed = keyed.withColumn("_zorder", z).drop(
        *[numeric[c] for c in cols if numeric[c] != c],
        *[f"_zcell{idx}" for idx in range(k)]
    )
    return keyed, "_zorder"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write — the multi-dimensional layout
    lever: a range partition + in-partition sort on the interleaved key
    makes every output file (and every parquet row group inside it)
    cover a NARROW min/max range on ALL clustered columns
    simultaneously, so scans filtering on any of them skip whole row
    groups from footer statistics alone. A linear sort gives that
    pruning only on its leading column; at 100 TB the difference is
    reading one file stripe vs the whole table for the second
    dimension. One range shuffle, one local sort — the standard
    one-time layout cost, amortized over every subsequent scan.
    (Pinned by `tests/test_sources.py`: footer min/max widths on BOTH
    dimensions shrink vs a linear layout.)"""
    keyed, zcol = zorder_value(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_value_exact(
    df: DataFrame,
    cols: list[str],
    bits: int = 4,
    n_rows: int | None = None,
) -> "tuple[DataFrame, str]":
    """Exact-quantile twin of ``zorder_value`` — same Morton interleave,
    but the equi-depth cells come from the exact VALUE HISTOGRAM
    instead of approxQuantile: cell(v) = (#rows with value < v) * 2^bits
    div n, so ties share a cell and the whole assignment is pure
    integer arithmetic an external engine can replay bit-for-bit
    (approxQuantile's GK sketch is partitioning-dependent and not
    replayable — fine for the layout itself, useless for an oracle).

    Cost model vs the approx variant: one count() scalar plus, per
    column, a groupBy(value) rollup and a cumulative-sum window over
    the DISTINCT values (single-partition, but |distinct|-sized — the
    rollup, not the corpus, pays the sort) and one broadcast join back.
    Use ``zorder_value`` for routine 100 TB layout runs; use this when
    the assignment itself must be verifiable (the driver-gated
    ``q_zorder_layout``).

    NULLs in a clustered column are rejected up front: the cell-map
    equality join would silently DROP those rows (a layout op must be
    row-count-preserving) — callers coalesce or filter first.

    Returns (df_with_key, key_column_name)."""
    from pyspark.sql import Window

    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a long z-key")
    null_counts = df.select(
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(c)
            for c in cols
        ]
    ).collect()[0]
    bad = {c: int(null_counts[c] or 0) for c in cols if null_counts[c]}
    if bad:
        raise ValueError(
            f"zorder_value_exact: NULLs in clustered columns {bad} — "
            "the cell-map join would silently drop those rows; "
            "coalesce or filter them first"
        )
    cells = 2 ** bits
    n = df.count() if n_rows is None else int(n_rows)
    if n == 0:
        # (_cb * cells) div 0 would yield silent NULL cells
        raise ValueError("zorder_value_exact: empty input")
    keyed = df
    for idx, c in enumerate(cols):
        w = Window.orderBy("_v").rowsBetween(
            Window.unboundedPreceding, -1
        )
        cellmap = (
            df.groupBy(F.col(c).alias("_v"))
            .agg(F.count(F.lit(1)).alias("_c"))
            .select(
                "_v",
                F.coalesce(F.sum("_c").over(w), F.lit(0)).alias("_cb"),
            )
            # truncating integer div — positive operands, so Spark
            # `div` and DuckDB `//` agree (CLAUDE.md r4c rule)
            .select(
                "_v",
                F.expr(f"(_cb * {cells}) div {n}").alias(f"_zcell{idx}"),
            )
        )
        keyed = keyed.join(
            F.broadcast(cellmap), keyed[c] == cellmap["_v"]
        ).drop("_v")
    z = F.lit(0).cast("long")
    for idx in range(k):
        cell_col = F.col(f"_zcell{idx}")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cell_col, i)
                    .bitwiseAND(F.lit(1))
                    .cast("long"),
                    i * k + idx,
                )
            )
    keyed = keyed.withColumn("_zorder", z).drop(
        *[f"_zcell{idx}" for idx in range(k)]
    )
    return keyed, "_zorder"


def zorder_layout_report(
    spark: SparkSession,
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 4,
    n_files: int = 8,
) -> DataFrame:
    """Write a z-order-clustered copy of ``df[cols]`` and report the
    PHYSICAL layout from the parquet footers: one row per output file
    bucket with its row count and the min/max of every clustered
    column, read back via pyarrow column statistics — the evidence a
    scan planner actually uses for row-group skipping.

    The whole pipeline is replayable: exact-histogram cells
    (``zorder_value_exact``), Morton interleave, then file assignment
    by the same cum-count arithmetic over the DISTINCT z values
    (file(z) = (#rows with z' < z) * n_files div n — z has at most
    2^(bits*k) distinct values, so the assignment map broadcasts).
    Files land as ``_file_id=K`` partition directories, so an oracle
    that replays the integer assignment in SQL predicts every surfaced
    (file_id, n_rows, min, max) EXACTLY — a green hash proves the
    bytes on disk match the logical layout, end to end.

    The report read is driver-side pyarrow over footers only (bounded:
    n_files directories, stats per column chunk — no data pages); the
    listing goes through ``list_data_files`` (the FileSystem-API seam),
    so on an object store only the pyarrow footer open itself would
    need a distributed upgrade."""
    import re as _re

    import pyarrow.parquet as _pq

    from pyspark.sql import Window

    n = df.count()
    keyed, zcol = zorder_value_exact(
        df.select(*cols), cols, bits=bits, n_rows=n
    )
    # persist: the keyed frame feeds the filemap aggregation AND the
    # partitioned write (whose join re-derives filemap's lineage too) —
    # unpersisted, the cell-assignment subtree executed ~3x (review r6)
    keyed = keyed.persist()
    w = Window.orderBy("_z").rowsBetween(Window.unboundedPreceding, -1)
    filemap = (
        keyed.groupBy(F.col(zcol).alias("_z"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .select(
            "_z", F.coalesce(F.sum("_c").over(w), F.lit(0)).alias("_cb")
        )
        .select(
            "_z", F.expr(f"(_cb * {n_files}) div {n}").alias("_file_id")
        )
    )
    (
        keyed.join(F.broadcast(filemap), keyed[zcol] == filemap["_z"])
        .drop("_z", zcol)
        .repartition(n_files, "_file_id")
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .partitionBy("_file_id")
        .parquet(path)
    )
    keyed.unpersist()
    agg: dict = {}
    for uri, _sz in list_data_files(spark, path):
        m = _re.search(r"_file_id=(\d+)/[^/]+$", uri)
        if not m:
            continue
        fid = int(m.group(1))
        md = _pq.ParquetFile(_as_local_path(uri)).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        cur = agg.setdefault(
            fid, {"n_rows": 0, **{c: [None, None] for c in cols}}
        )
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            cur["n_rows"] += g.num_rows
            for c in cols:
                st = g.column(names.index(c)).statistics
                lo, hi = cur[c]
                cur[c] = [
                    st.min if lo is None else min(lo, st.min),
                    st.max if hi is None else max(hi, st.max),
                ]
    rows = [
        (
            fid,
            v["n_rows"],
            *[x for c in cols for x in v[c]],
        )
        for fid, v in sorted(agg.items())
    ]
    schema = "file_id INT, n_rows BIGINT, " + ", ".join(
        f"min_{c} BIGINT, max_{c} BIGINT" for c in cols
    )
    return spark.createDataFrame(rows, schema)


def compact_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_mb: int = 128,
    sort_within_by: list[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_mb`` — the table-maintenance chore every long-lived 100 TB
    deployment runs (streaming sinks and over-parallel writers leave
    thousands of KB-scale files; each costs a task + a footer read +
    an open per scan, and the NameNode/object-store metadata grows
    unbounded).

    File count derives from the directory's actual byte size (one
    listing, no data read), rows stay identical, and
    ``sort_within_by`` optionally re-sorts within output files so
    min/max footer stats stay tight after compaction (compacting UNDOES
    clustering otherwise — pair with ``write_zordered`` for the full
    layout story). Returns {files_before, files_after, bytes}.

    Both listings (sizing before, verification after) go through
    ``list_data_files`` — the FileSystem-API seam — so the op works
    against any Hadoop-connected store, not just POSIX paths.
    """
    parts = list_data_files(spark, path)
    total_bytes = sum(sz for _p, sz in parts)
    n_out = max(1, -(-total_bytes // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if sort_within_by:
        out = df.repartition(int(n_out)).sortWithinPartitions(*sort_within_by)
    else:
        out = df.coalesce(int(n_out))
    out.write.mode("overwrite").parquet(out_path)
    after = list_data_files(spark, out_path)
    return {
        "files_before": len(parts),
        "files_after": len(after),
        "bytes": total_bytes,
    }


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Keyed table diff — the reconciliation operator behind CDC
    backfills and migration sign-offs: one row per key present in
    either snapshot, classified ``added`` / ``removed`` / ``changed`` /
    (unchanged keys are dropped — at 100 TB the interesting set is the
    delta, not the match). Change detection hashes the full row
    (md5 of the concatenated non-key columns, null-tagged so NULL vs
    'null' can't collide) so wide tables compare with one 16-byte
    value per side instead of N column equalities carried through the
    join.

    One full-outer join on the key — co-partitioned if both sides are
    bucketed by it (``sources.bucketing``), else one shuffle per side.
    """
    non_key = [c for c in old.columns if c not in key_cols]

    def _sig(df: DataFrame) -> Column:
        tagged = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in non_key
        ]
        return F.md5(F.concat_ws("\x01", *tagged))

    o = old.select(*key_cols, _sig(old).alias("_sig_old"))
    n = new.select(*key_cols, _sig(new).alias("_sig_new"))
    j = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("_sig_old").isNull(), F.lit("added"))
        .when(F.col("_sig_new").isNull(), F.lit("removed"))
        .when(F.col("_sig_old") != F.col("_sig_new"), F.lit("changed"))
    )
    return (
        j.select(*key_cols, status.alias("status"))
        .where(F.col("status").isNotNull())
    )


def read_parquet_evolving(
    spark: SparkSession,
    path: "str | list[str]",
    defaults: dict | None = None,
) -> DataFrame:
    """Schema-evolution-tolerant parquet reader: ``mergeSchema`` unions
    the footers of every file (a long-lived 100 TB table accretes
    columns over years; the default reader takes one random footer and
    silently drops columns added later), and ``defaults`` fills the
    NULLs that pre-evolution files surface for post-evolution columns
    with typed constants — so downstream aggregates see a total column,
    not a null-riddled one.

    mergeSchema costs a footer read per file at planning time — pair
    with ``compact_files`` to keep the file count sane.
    """
    paths = [path] if isinstance(path, str) else list(path)
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    for col, default in (defaults or {}).items():
        if col in df.columns:
            df = df.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
    return df
