"""r13 tests-only ingestion source: WARC/WET container parsing
(sources/warc.py). Like the r6 raw-asset sources there is no driver
table for crawl containers, so the source carries its oracle HERE via
the generator-is-ground-truth pattern (multimodal/codecs r10): tests
SERIALIZE a known record table with an independent writer, parse with
the operator, and compare — a wrong parse cannot hide behind its own
serializer. Hypothesis round-trips run the pure parser directly (no
Spark session needed), plus Spark-path fixtures over real temp files.
"""

from __future__ import annotations

import gzip

import pytest
from hypothesis import given, settings, strategies as st

from dbt_schema_builder_spark.sources import warc


def _serialize(records, newline=b"\r\n"):
    """Independent WARC writer: version line, headers, Content-Length,
    blank line, block, two record separators."""
    out = bytearray()
    for headers, block in records:
        out += b"WARC/1.0" + newline
        for k, v in headers.items():
            out += k.encode() + b": " + v.encode() + newline
        out += b"Content-Length: " + str(len(block)).encode() + newline
        out += newline
        out += block
        out += newline + newline
    return bytes(out)


_R1 = (
    {
        "WARC-Type": "response",
        "WARC-Record-ID": "<urn:uuid:1>",
        "WARC-Target-URI": "http://example.com/a",
        "WARC-Date": "2026-01-02T03:04:05Z",
        "Content-Type": "application/http",
    },
    b"HTTP/1.1 200 OK\r\n\r\n<html>hi</html>",
)
_R2 = (
    {
        "WARC-Type": "conversion",
        "WARC-Record-ID": "<urn:uuid:2>",
        "WARC-Target-URI": "http://example.com/a",
        "WARC-Date": "2026-01-02T03:04:05Z",
        "Content-Type": "text/plain",
    },
    "extracted text body\nsecond line caf\u00e9".encode("utf-8"),
)
_R3 = ({"WARC-Type": "warcinfo"}, b"")  # headerless-URI, empty block


def test_parse_warc_records_fixed_shapes():
    data = _serialize([_R1, _R2, _R3])
    got = list(warc.parse_warc_records(data))
    assert [g[0] for g in got] == [0, 1, 2]
    assert got[0][1]["warc-type"] == "response"
    assert got[0][2] == _R1[1]
    assert got[1][1]["warc-target-uri"] == "http://example.com/a"
    assert got[1][2] == _R2[1]
    assert got[2][1].get("warc-target-uri") is None
    assert got[2][2] == b""
    # bare-LF emitter parses identically
    got_lf = list(warc.parse_warc_records(_serialize([_R1, _R2], b"\n")))
    assert [(g[0], g[2]) for g in got_lf] == [(0, _R1[1]), (1, _R2[1])]
    # member-per-record gzip (the CommonCrawl layout) and whole-stream
    # gzip both decode
    members = b"".join(gzip.compress(_serialize([r])) for r in (_R1, _R2))
    assert len(list(warc.parse_warc_records(members))) == 2
    whole = gzip.compress(_serialize([_R1, _R2]))
    assert len(list(warc.parse_warc_records(whole))) == 2


def test_parse_warc_tolerant_vs_strict():
    # truncated second block: tolerant keeps record 0, strict raises
    good = _serialize([_R1])
    bad = good + b"WARC/1.0\r\nContent-Length: 100\r\n\r\nshort"
    assert [g[0] for g in warc.parse_warc_records(bad)] == [0]
    with pytest.raises(ValueError, match="truncated block"):
        list(warc.parse_warc_records(bad, strict=True))
    # missing Content-Length
    nolen = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nxx"
    assert list(warc.parse_warc_records(nolen)) == []
    with pytest.raises(ValueError, match="Content-Length"):
        list(warc.parse_warc_records(nolen, strict=True))
    # bad version line
    noversion = b"HTTP/1.1 200 OK\r\n\r\n"
    assert list(warc.parse_warc_records(noversion)) == []
    with pytest.raises(ValueError, match="bad version line"):
        list(warc.parse_warc_records(noversion, strict=True))
    # trailer-only truncation: the deflate stream is intact, so
    # member-wise tolerant decompression RECOVERS the record (the
    # whole-stream gzip.decompress used to lose it); strict still
    # treats the unterminated member as an error
    trailer_cut = gzip.compress(good)[:-5]
    assert [g[0] for g in warc.parse_warc_records(trailer_cut)] == [0]
    with pytest.raises(ValueError, match="gzip"):
        list(warc.parse_warc_records(trailer_cut, strict=True))
    # mid-deflate truncation: nothing recoverable
    deep_cut = gzip.compress(good)[:25]
    assert list(warc.parse_warc_records(deep_cut)) == []
    with pytest.raises(ValueError, match="gzip"):
        list(warc.parse_warc_records(deep_cut, strict=True))
    # truncated MULTI-member gzip (an interrupted segment download):
    # the intact earlier members' records survive in tolerant mode
    # (r13 review find: whole-stream decompress lost all of them)
    members = (
        gzip.compress(_serialize([_R1]))
        + gzip.compress(_serialize([_R2]))
        # cut mid-deflate (not just the trailer — the full plaintext
        # could still inflate): 25 bytes = 10-byte gzip header + a
        # partial deflate block
        + gzip.compress(_serialize([_R3]))[:25]
    )
    got = list(warc.parse_warc_records(members))
    assert [(g[0], g[2]) for g in got] == [(0, _R1[1]), (1, _R2[1])]
    with pytest.raises(ValueError, match="gzip member"):
        list(warc.parse_warc_records(members, strict=True))
    # garbage BETWEEN members: tolerant keeps the prefix, strict raises
    garbage = gzip.compress(_serialize([_R1])) + b"not gzip at all"
    assert len(list(warc.parse_warc_records(garbage))) == 1
    with pytest.raises(ValueError, match="corrupt gzip member"):
        list(warc.parse_warc_records(garbage, strict=True))
    # duplicate header: first occurrence wins, deterministically
    dup = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Type: conversion\r\n"
        b"Content-Length: 2\r\n\r\nok\r\n\r\n"
    )
    (rec,) = warc.parse_warc_records(dup)
    assert rec[1]["warc-type"] == "response"


def test_read_warc_spark_path(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg-0.warc").write_bytes(_serialize([_R1, _R2, _R3]))
    (d / "seg-1.warc.gz").write_bytes(
        b"".join(gzip.compress(_serialize([r])) for r in (_R2, _R2))
    )
    rows = warc.read_warc(spark, str(d)).collect()
    assert len(rows) == 5
    by_file = {}
    for r in rows:
        by_file.setdefault(r.asset_path.rsplit("/", 1)[-1], []).append(r)
    seg0 = sorted(by_file["seg-0.warc"], key=lambda r: r.record_idx)
    assert [r.warc_type for r in seg0] == ["response", "conversion", "warcinfo"]
    assert seg0[1].target_uri == "http://example.com/a"
    assert bytes(seg0[1].block) == _R2[1]
    assert seg0[2].target_uri is None and seg0[2].content_length == 0
    assert len(by_file["seg-1.warc.gz"]) == 2
    # glob filters at listing time
    only_gz = warc.read_warc(spark, str(d), glob="*.gz").collect()
    assert {r.asset_path.rsplit("/", 1)[-1] for r in only_gz} == {
        "seg-1.warc.gz"
    }


def test_wet_text_corpus_shape(spark, tmp_path):
    stray = ({"WARC-Type": "conversion",
              "WARC-Target-URI": "http://b.io/x"}, b"bad\xffbyte")
    empty = ({"WARC-Type": "conversion"}, b"")
    f = tmp_path / "seg.wet"
    f.write_bytes(_serialize([_R1, _R2, _R2, stray, empty]))
    docs = warc.wet_text_corpus(warc.read_warc(spark, str(f))).collect()
    # response + empty-block conversion dropped; 2 identical WET texts
    # + the stray-byte one survive
    assert len(docs) == 3
    assert {r.source for r in docs} == {"commoncrawl_wet"}
    same = [r for r in docs if r.url == "http://example.com/a"]
    assert len(same) == 2
    # content-addressed doc_id: identical extracted text re-keys
    # identically (the read_text_corpus convention)
    assert same[0].doc_id == same[1].doc_id
    assert same[0].text == _R2[1].decode("utf-8")
    assert same[0].n_chars == len(same[0].text)
    (bad,) = [r for r in docs if r.url == "http://b.io/x"]
    # malformed byte -> U+FFFD replacement, never a crashed task
    # (Spark 4's built-in decode raises MALFORMED_CHARACTER_CODING)
    assert bad.text == "bad\ufffdbyte"


def test_read_warc_strict_surfaces_task_error(spark, tmp_path):
    f = tmp_path / "bad.warc"
    f.write_bytes(b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort")
    assert warc.read_warc(spark, str(f)).count() == 0  # tolerant default
    with pytest.raises(Exception, match="truncated block"):
        warc.read_warc(spark, str(f), strict=True).count()


def test_wet_pipeline_composes(spark, tmp_path):
    """The point of the source: crawl input composes directly with the
    curation stack — canonicalize the WET url column, then collapse
    content-identical extractions by their content-addressed doc_id."""
    from dbt_schema_builder_spark.operators import urls

    r_dup = (
        {"WARC-Type": "conversion",
         "WARC-Target-URI": "HTTP://Example.COM:80/a?utm_source=f"},
        b"same extracted text",
    )
    r_dup2 = (
        {"WARC-Type": "conversion",
         "WARC-Target-URI": "http://example.com/a"},
        b"same extracted text",
    )
    r_other = (
        {"WARC-Type": "conversion", "WARC-Target-URI": "http://b.io/"},
        b"different text",
    )
    f = tmp_path / "seg.wet.gz"
    f.write_bytes(gzip.compress(_serialize([r_dup, r_dup2, r_other])))
    docs = warc.wet_text_corpus(warc.read_warc(spark, str(f)))
    canon = urls.canonicalize_urls(docs, url_col="url")
    rows = canon.collect()
    assert len(rows) == 3
    # the two spellings of the same page canonicalize identically AND
    # their extractions share one content-addressed doc_id
    dup_rows = [r for r in rows if r.text == "same extracted text"]
    assert {r.canon_url for r in dup_rows} == {"http://example.com/a"}
    assert len({r.doc_id for r in dup_rows}) == 1
    deduped = canon.dropDuplicates(["doc_id"]).count()
    assert deduped == 2


# Round-trip property: serialize -> parse over random record tables.
# Header values exclude CR/LF (header-line grammar) and surrounding
# whitespace (stripped on parse, so a padded value would round-trip
# normalized, not equal).
_HDR_VAL = st.text(
    alphabet=st.characters(
        blacklist_characters="\r\n", blacklist_categories=("Cs",)
    ),
    min_size=1,
    max_size=20,
).map(lambda s: s.strip()).filter(lambda s: s)
_RECORD = st.tuples(
    st.fixed_dictionaries(
        {"WARC-Type": st.sampled_from(["response", "conversion", "request"])},
        optional={
            "WARC-Target-URI": _HDR_VAL,
            "WARC-Date": _HDR_VAL,
            "Content-Type": _HDR_VAL,
        },
    ),
    st.binary(min_size=0, max_size=64),
)


@settings(max_examples=40, deadline=None)
@given(
    records=st.lists(_RECORD, min_size=0, max_size=6),
    newline=st.sampled_from([b"\r\n", b"\n"]),
    gz=st.sampled_from(["none", "whole", "members"]),
)
def test_parse_roundtrip_random_records(records, newline, gz):
    """Generator-is-ground-truth: arbitrary header subsets, unicode
    header values, empty/binary blocks (including blocks that LOOK like
    record separators or version lines — Content-Length delimits, so
    they must not resync), every newline/gzip layout."""
    data = _serialize(records, newline)
    if gz == "whole":
        data = gzip.compress(data)
    elif gz == "members":
        data = b"".join(
            gzip.compress(_serialize([r], newline)) for r in records
        )
    got = list(warc.parse_warc_records(data, strict=True))
    assert len(got) == len(records)
    for (idx, headers, block), (want_h, want_b) in zip(got, records):
        assert block == want_b
        for k, v in want_h.items():
            assert headers[k.lower()] == v
