"""WARC / WET ingestion — the web-pipeline front door (r13,
tests-only; no driver table exists for it, same as the r6 raw-asset
sources).

CommonCrawl — the corpus every large web-scale training pipeline
starts from — ships WARC (ISO 28500) containers: crawl responses in
`.warc.gz`, pre-extracted plain text in `.wet.gz` ("conversion"
records). The container format is deliberately simple (header lines +
a Content-Length-delimited block per record; gzip with one member per
record so readers can seek), so a pure-stdlib parser is both feasible
and honest — the same decode-seam philosophy as multimodal/codecs.py
(REAL parser, no third-party dependency, oracle = the generator's
ground-truth table in tests/test_warc.py: a wrong parse cannot hide).

Record grammar parsed here (version line, CRLF or bare-LF tolerant,
as emitted by real crawlers):

    WARC/1.0<CRLF>
    <Header-Name>: <value><CRLF>      (repeated; first wins on dups)
    <CRLF>
    <Content-Length bytes of block>
    <CRLF><CRLF>                      (record separator)

Scale design (100 TB): one WARC file = one `binaryFile` row = one
task — CommonCrawl segments are ~1 GB compressed, and the format is
NOT splittable mid-file without an index, so per-FILE parallelism is
the honest unit (a crawl dump is tens of thousands of segments — far
more files than executors). The parse runs in `mapInPandas` (one
Python pass per file, rows stream out per record); the corpus-side
repartition before the parse follows the single-file-scan rule (r4).
Block bytes stay an opaque `binary` column; `wet_text_corpus`
projects conversion records into the engine's documents shape so the
whole curation pipeline (URL canonicalization, dedup, quality gates)
composes directly on crawl input.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("asset_path", StringType(), False),
        StructField("record_idx", LongType(), False),
        StructField("warc_type", StringType(), True),
        StructField("record_id", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("content_length", LongType(), False),
        StructField("block", BinaryType(), True),
    ]
)

_GZIP_MAGIC = b"\x1f\x8b"


def _gunzip_members(data: bytes, strict: bool) -> bytes:
    """Member-wise gzip decompression: a truncated or corrupt member
    keeps every byte decompressed BEFORE it (r13 review find: the
    whole-stream gzip.decompress turned one partial trailing member —
    an interrupted segment download — into ZERO records, violating the
    tolerant contract; member-per-record is exactly the CommonCrawl
    layout, so earlier members are independently recoverable). A
    truncated final member's partial bytes are kept too — the record
    parser stops at the truncated record they become."""
    out = bytearray()
    view = data
    while view:
        d = zlib.decompressobj(zlib.MAX_WBITS | 16)
        try:
            out += d.decompress(view)
            out += d.flush()
        except zlib.error:
            if strict:
                raise ValueError("warc: corrupt gzip member")
            break
        if not d.eof:
            if strict:
                raise ValueError("warc: truncated gzip member")
            break
        view = d.unused_data
    return bytes(out)


def parse_warc_records(data: bytes, strict: bool = False):
    """Pure-Python WARC parser: yield
    (record_idx, headers_dict, block_bytes) per record.

    Tolerant by default: a malformed record boundary (bad version
    line, unparseable or missing Content-Length, truncated block)
    STOPS the file there — WARC cannot be re-synchronized without
    trusting the very length field that just failed — and the records
    already parsed are kept. ``strict=True`` raises instead (the
    ingest-audit mode). Gzip input (single- or multi-member, the
    CommonCrawl member-per-record layout) is detected by magic and
    decompressed MEMBER-WISE first: a truncated or corrupt member
    keeps every intact earlier member's records under the same
    tolerant/strict contract (see ``_gunzip_members``)."""
    if data[:2] == _GZIP_MAGIC:
        data = _gunzip_members(data, strict)
    pos = 0
    idx = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines (the two CRLFs after a block,
        # or trailing newlines at EOF)
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        # whichever terminator occurs FIRST positionally wins: a
        # preference for CRLF would mis-split an LF-headers record
        # whose BLOCK contains '\r\n\r\n' (any captured HTTP response
        # does) — headers precede the block, so min() is the truth
        i_crlf = data.find(b"\r\n\r\n", pos)
        i_lf = data.find(b"\n\n", pos)
        if i_crlf != -1 and (i_lf == -1 or i_crlf < i_lf):
            hdr_end, sep = i_crlf, 4
        else:
            hdr_end, sep = i_lf, 2
        if hdr_end == -1:
            if strict:
                raise ValueError(
                    f"warc: record {idx}: no header terminator"
                )
            return
        head = data[pos:hdr_end]
        lines = head.replace(b"\r\n", b"\n").split(b"\n")
        if not lines[0].startswith(b"WARC/"):
            if strict:
                raise ValueError(
                    f"warc: record {idx}: bad version line "
                    f"{lines[0][:40]!r}"
                )
            return
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            if not _:
                continue  # ill-formed header line: skip the line only
            key = k.strip().decode("utf-8", "replace").lower()
            # first occurrence wins (the spec says fields SHALL NOT
            # repeat; real crawlers occasionally do — keep it
            # deterministic)
            headers.setdefault(
                key, v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers["content-length"])
            if length < 0:
                raise ValueError
        except (KeyError, ValueError):
            if strict:
                raise ValueError(
                    f"warc: record {idx}: missing or invalid "
                    "Content-Length"
                )
            return
        block_start = hdr_end + sep
        block_end = block_start + length
        if block_end > n:
            if strict:
                raise ValueError(
                    f"warc: record {idx}: truncated block "
                    f"(need {length} bytes, have {n - block_start})"
                )
            return
        yield idx, headers, data[block_start:block_end]
        idx += 1
        pos = block_end


def read_warc(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """Ingest WARC/WET container files into one row per record:
    (asset_path, record_idx, warc_type, record_id, target_uri,
    warc_date, content_type, content_length, block). Header fields
    absent from a record surface as NULL; ``warc_date`` stays the raw
    header string (ISO-8601 — parse downstream if needed, the
    TIMESTAMP_NANOS lesson says never eagerly). ``strict=True`` turns
    malformed files into task errors instead of silent truncation —
    see ``parse_warc_records`` for the exact contract."""
    raw = spark.read.format("binaryFile")
    if glob:
        raw = raw.option("pathGlobFilter", glob)
    files = raw.load(path).select("path", "content")
    # per-FILE parallelism: binaryFile PACKS small files into few
    # partitions, so a directory of tiny test segments would parse on
    # one core (r4 rule) — but real ~1 GB segments already own a
    # partition each, and an unconditional repartition would shuffle
    # the entire raw corpus for zero gain (r13 review find). Only
    # spread when the listing is under-parallel.
    parallelism = spark.sparkContext.defaultParallelism
    if files.rdd.getNumPartitions() < parallelism:
        files = files.repartition(parallelism)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows = []
                for idx, headers, block in parse_warc_records(
                    bytes(content), strict=strict
                ):
                    rows.append(
                        (
                            path_,
                            idx,
                            headers.get("warc-type"),
                            headers.get("warc-record-id"),
                            headers.get("warc-target-uri"),
                            headers.get("warc-date"),
                            headers.get("content-type"),
                            len(block),
                            block,
                        )
                    )
                if rows:
                    yield pd.DataFrame(
                        rows, columns=[f.name for f in WARC_SCHEMA.fields]
                    )

    return files.mapInPandas(parse, WARC_SCHEMA)


@F.pandas_udf(StringType())
def _utf8_lossy(blocks: pd.Series) -> pd.Series:
    """UTF-8 decode with U+FFFD replacement: Spark 4's built-in
    ``decode`` RAISES on malformed bytes (MALFORMED_CHARACTER_CODING),
    and real WET segments carry stray bytes — a crashed ingest task is
    the wrong failure mode for a tolerant reader."""
    return blocks.map(
        lambda b: None if b is None else bytes(b).decode("utf-8", "replace")
    )


def wet_text_corpus(records: DataFrame) -> DataFrame:
    """Project WET "conversion" records into the engine's documents
    shape (doc_id, text, lang, source, n_chars) + (url, warc_date), so
    the whole curation stack (canonicalize_urls, dedup, gopher/ccnet,
    pack) composes directly on crawl input. Blocks decode as UTF-8
    with U+FFFD replacement (CommonCrawl WET is UTF-8 by contract;
    real segments still carry stray bytes, and Spark 4's built-in
    decode raises on them — compose with ``udf.fix_mojibake`` for the
    cp1252 class). The decode is one Arrow kernel whose output is
    MATERIALIZED before its three consumers (the normalize_text
    single-ArrowEvalPython pattern). doc_id is ``xxhash64(text)``, the
    content-addressed convention shared with ``read_text_corpus`` —
    identical extracted text re-keys identically across crawls. Empty
    blocks are dropped (the read_text_corpus empty-line rule); lang
    ships 'und' for ``text.lang_id`` downstream."""
    staged = (
        records.where(F.lower(F.col("warc_type")) == "conversion")
        .where(F.length(F.col("block")) > 0)
        .select(
            "target_uri", "warc_date", _utf8_lossy(F.col("block")).alias("_txt")
        )
    )
    return staged.select(
        F.xxhash64(F.col("_txt")).alias("doc_id"),
        F.col("_txt").alias("text"),
        F.lit("und").alias("lang"),
        F.lit("commoncrawl_wet").alias("source"),
        F.length(F.col("_txt")).cast("bigint").alias("n_chars"),
        F.col("target_uri").alias("url"),
        "warc_date",
    )
