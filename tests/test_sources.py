"""Source/sink layer tests: partition pruning and shuffle-free bucketed
joins — the two storage-layout levers that matter at 100 TB."""

import os
import re

import pytest

from pyspark.sql import functions as F

from dbt_schema_builder_spark.sources import (
    bucketed_join_ready,
    read_csv,
    read_json,
    write_bucketed,
    write_partitioned,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partitioned_write_prunes_partitions(spark, tables, tmp_path):
    out = str(tmp_path / "orders_by_status")
    write_partitioned(tables["orders"], out, ["o_orderstatus"])
    # hive-style layout on disk
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(out))
    df = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    plan = _plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderstatus" in m.group(1), plan
    got = df.count()
    want = tables["orders"].where("o_orderstatus = 'F'").count()
    assert got == want


def test_bucketed_join_has_no_exchange(spark, tables, tmp_path):
    write_bucketed(
        tables["orders"].select("o_orderkey", "o_totalprice"),
        "orders_b", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"],
    )
    write_bucketed(
        tables["lineitem"].select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        ),
        "lineitem_b", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"],
    )
    # at test scale Catalyst would broadcast (bypassing bucketing); force
    # the sort-merge path to demonstrate the co-located large-large join
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join_ready(spark, "lineitem_b", "orders_b", "o_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffle
        # correctness: same result as the plain join
        want = (
            tables["lineitem"]
            .join(
                tables["orders"],
                tables["lineitem"].l_orderkey == tables["orders"].o_orderkey,
            )
            .count()
        )
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_dynamic_partition_overwrite_rewrites_only_touched(
    spark, tables, tmp_path
):
    """Incremental refresh: with dynamic partitionOverwriteMode, an
    overwrite touching one partition leaves the others intact — the
    100 TB pattern for refreshing a day/status slice in place."""
    out = str(tmp_path / "orders_dyn")
    write_partitioned(tables["orders"], out, ["o_orderstatus"])
    before_f = spark.read.parquet(out).where("o_orderstatus = 'F'").count()
    before_o = spark.read.parquet(out).where("o_orderstatus = 'O'").count()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "DYNAMIC")
    try:
        patch = (
            tables["orders"].where("o_orderstatus = 'F'").limit(10)
        )
        patch.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    after = spark.read.parquet(out)
    assert after.where("o_orderstatus = 'F'").count() == 10  # replaced
    assert after.where("o_orderstatus = 'O'").count() == before_o  # intact
    assert before_f > 10


def test_csv_json_roundtrip_with_explicit_schema(spark, tables, tmp_path):
    nation = tables["nation"]
    csv_path = str(tmp_path / "nation_csv")
    json_path = str(tmp_path / "nation_json")
    nation.write.mode("overwrite").option("header", True).csv(csv_path)
    nation.write.mode("overwrite").json(json_path)
    got_csv = read_csv(spark, csv_path, nation.schema)
    got_json = read_json(spark, json_path, nation.schema)
    src = {tuple(r) for r in nation.collect()}
    assert {tuple(r) for r in got_csv.collect()} == src
    assert {tuple(r) for r in got_json.collect()} == src
    assert got_csv.schema == nation.schema


def test_zorder_write_narrows_nonleading_dim_row_groups(
    spark, tables, tmp_path
):
    """Z-order clustering is the multi-dimensional pruning lever: after
    write_zordered on (user_id, value), every parquet row group's
    min/max footer range on the NON-leading column is a fraction of the
    global range (measured 0.28 vs 0.77 for a linear user_id sort at
    sf0.001), so scans filtering on value skip row groups from footer
    stats alone — a linear layout only ever prunes its leading column.
    Integrity: the clustered copy contains exactly the original rows."""
    import glob as globmod

    import pyarrow.parquet as pq

    from dbt_schema_builder_spark.sources import write_zordered

    ev = tables["events"].select("event_id", "user_id", "value")
    zp = str(tmp_path / "z_ev")
    lp = str(tmp_path / "l_ev")
    write_zordered(ev, zp, ["user_id", "value"], bits=6, n_files=8)
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lp)
    )

    def avg_frac_width(path, col):
        glo = ev.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
        span = float(glo.hi) - float(glo.lo)
        widths = []
        for f in globmod.glob(path + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            ci = names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                widths.append((float(st.max) - float(st.min)) / span)
        return sum(widths) / len(widths)

    z_w = avg_frac_width(zp, "value")
    l_w = avg_frac_width(lp, "value")
    assert z_w < l_w * 0.6, (z_w, l_w)
    back = spark.read.parquet(zp)
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0 and ev.exceptAll(back).count() == 0


def test_zorder_value_rejects_too_many_bits(spark, tables):
    from dbt_schema_builder_spark.sources import zorder_value

    with pytest.raises(ValueError):
        zorder_value(tables["events"], ["user_id", "value"], bits=32)


def test_orc_roundtrip_with_pushdown(spark, tables, tmp_path):
    """ORC write/read roundtrip with filters reaching the scan — the
    second columnar format gets the same pushdown contract as parquet."""
    from dbt_schema_builder_spark.sources import read_orc

    src = tables["orders"].select("o_orderkey", "o_custkey", "o_orderstatus")
    path = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").orc(path)
    back = read_orc(spark, path)
    assert back.count() == src.count()
    filtered = back.where(F.col("o_orderstatus") == "F")
    plan = _plan(filtered)
    assert re.search(r"PushedFilters: \[.*o_orderstatus", plan), plan
    assert filtered.count() == src.where("o_orderstatus = 'F'").count()


def test_zorder_supports_timestamp_columns(spark, tables, tmp_path):
    """The natural event layout (user_id, ts): timestamp columns bucket
    on their NTZ epoch-micros surface; the write round-trips exactly and
    the ts row-group ranges narrow vs a linear user_id sort."""
    import glob as globmod

    import pyarrow.parquet as pq

    from dbt_schema_builder_spark.sources import write_zordered

    ev = tables["events"].select("event_id", "user_id", "ts")
    zp = str(tmp_path / "z_ts")
    lp = str(tmp_path / "l_ts")
    write_zordered(ev, zp, ["user_id", "ts"], bits=6, n_files=8)
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lp)
    )
    back = spark.read.parquet(zp)
    assert back.count() == ev.count()
    assert set(back.columns) == {"event_id", "user_id", "ts"}
    assert back.exceptAll(ev).count() == 0 and ev.exceptAll(back).count() == 0

    def avg_ts_width(path):
        widths = []
        lo_hi = []
        for f in globmod.glob(path + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            ci = names.index("ts")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                lo_hi.append((st.min, st.max))
        glo = min(a for a, _ in lo_hi), max(b for _, b in lo_hi)
        span = (glo[1] - glo[0]).total_seconds()
        return sum(
            (b - a).total_seconds() / span for a, b in lo_hi
        ) / len(lo_hi)

    assert avg_ts_width(zp) < avg_ts_width(lp) * 0.7


def test_zorder_exact_layout_report_matches_logical_assignment(
    spark, tables, tmp_path
):
    """The q_zorder_layout end-to-end pin, in miniature: the pyarrow
    footer report must equal an independent pure-Python replay of the
    exact-histogram cell / Morton interleave / cum-count file
    assignment — proving the bytes on disk realize the logical
    layout."""
    from collections import Counter

    from dbt_schema_builder_spark.sources.io import zorder_layout_report

    bits, n_files = 3, 4
    ev = (
        tables["events"]
        .where("event_id % 5 = 0")
        .select("user_id", "event_id")
    )
    rows = [(r.user_id, r.event_id) for r in ev.collect()]
    report = zorder_layout_report(
        spark,
        ev,
        ["user_id", "event_id"],
        str(tmp_path / "z"),
        bits=bits,
        n_files=n_files,
    ).collect()

    # independent replay
    n, cells = len(rows), 2 ** bits

    def cell_map(vals):
        cnt = Counter(vals)
        out, cb = {}, 0
        for v in sorted(cnt):
            out[v] = (cb * cells) // n
            cb += cnt[v]
        return out

    ca = cell_map([r[0] for r in rows])
    cb_ = cell_map([r[1] for r in rows])

    def interleave(c0, c1):
        z = 0
        for i in range(bits):
            z |= ((c0 >> i) & 1) << (2 * i)
            z |= ((c1 >> i) & 1) << (2 * i + 1)
        return z

    zs = [interleave(ca[a], cb_[b]) for a, b in rows]
    zcnt = Counter(zs)
    fmap, cum = {}, 0
    for z in sorted(zcnt):
        fmap[z] = (cum * n_files) // n
        cum += zcnt[z]
    expect: dict = {}
    for (a, b), z in zip(rows, zs):
        e = expect.setdefault(
            fmap[z], [0, a, a, b, b]
        )
        e[0] += 1
        e[1], e[2] = min(e[1], a), max(e[2], a)
        e[3], e[4] = min(e[3], b), max(e[4], b)
    got = {
        r.file_id: [
            r.n_rows, r.min_user_id, r.max_user_id,
            r.min_event_id, r.max_event_id,
        ]
        for r in report
    }
    assert got == expect


def test_read_parquet_evolving_accepts_path_list(spark, tables, tmp_path):
    """Multi-path evolving read (the q_evolving_read shape): two
    batches with different schemas merge; the typed default fills only
    the pre-evolution rows."""
    from dbt_schema_builder_spark.sources.io import read_parquet_evolving

    nation = tables["nation"]
    nation.select("n_nationkey", "n_name").write.mode("overwrite").parquet(
        str(tmp_path / "b1")
    )
    nation.select("n_nationkey", "n_name", "n_regionkey").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "b2"))
    df = read_parquet_evolving(
        spark,
        [str(tmp_path / "b1"), str(tmp_path / "b2")],
        defaults={"n_regionkey": -1},
    )
    n = nation.count()
    assert df.count() == 2 * n
    assert df.where("n_regionkey = -1").count() == n
    assert df.where("n_regionkey IS NULL").count() == 0


def test_zorder_exact_rejects_null_clustered_values(spark):
    """r6: a layout op must be row-count-preserving — NULLs in a
    clustered column would vanish through the cell-map equality join,
    so the exact variant refuses loudly instead."""
    import pytest

    from dbt_schema_builder_spark.sources.io import zorder_value_exact

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "a int, b int"
    )
    with pytest.raises(ValueError, match="NULLs in clustered columns"):
        zorder_value_exact(df, ["a", "b"], bits=3)


def test_binary_file_ingestion_feeds_multimodal_ops(spark, tmp_path):
    """r6: binaryFile source -> (doc_id, payload) is exactly the
    multimodal operators' input contract — ingest fake image files and
    run real feature extraction over them."""
    from dbt_schema_builder_spark.multimodal import image_features
    from dbt_schema_builder_spark.sources.io import read_binary_files

    (tmp_path / "x.img").write_bytes(b"FAKEIMG1" + bytes(range(64)))
    (tmp_path / "y.img").write_bytes(b"notahead" + b"\x00" * 32)
    (tmp_path / "skip.txt").write_text("not an asset")
    media = read_binary_files(spark, str(tmp_path), glob="*.img")
    rows = media.collect()
    assert len(rows) == 2
    assert {r.n_bytes for r in rows} == {72, 40}
    assert len({r.doc_id for r in rows}) == 2  # path-hash keyed
    feats = {
        r.doc_id: r
        for r in image_features(
            media.select("doc_id", "payload")
        ).collect()
    }
    by_path = {r.asset_path.rsplit("/", 1)[-1]: r.doc_id for r in rows}
    assert feats[by_path["x.img"]].header_ok == 1
    assert feats[by_path["y.img"]].header_ok == 0


def test_text_corpus_ingestion_line_and_whole_file(spark, tmp_path):
    """r6: raw-text ingestion lands in the documents shape and runs
    through the curation operators; content-addressed doc_ids re-key
    identically on re-ingest."""
    from dbt_schema_builder_spark.operators import text as text_ops
    from dbt_schema_builder_spark.sources.io import read_text_corpus

    (tmp_path / "a.txt").write_text("the quick brown fox\n\nsecond doc here\n")
    (tmp_path / "b.txt").write_text("third document line\n")
    lines = read_text_corpus(spark, str(tmp_path))
    got = {r.text for r in lines.collect()}
    assert got == {
        "the quick brown fox", "second doc here", "third document line"
    }
    # empty line dropped; schema matches the documents contract
    assert lines.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    # content-addressed: re-ingest keys identically
    again = {r.text: r.doc_id for r in read_text_corpus(
        spark, str(tmp_path)).collect()}
    first = {r.text: r.doc_id for r in lines.collect()}
    assert first == again
    # composes with the curation surface
    assert text_ops.quality_score(lines).count() == 3
    whole = read_text_corpus(spark, str(tmp_path), whole_files=True)
    assert whole.count() == 2
    assert {r.n_chars for r in whole.collect()} == {37, 20}


def test_read_avro_raises_actionable_error(spark, tmp_path):
    """The avro module is external; the wrapper must say how to add
    it, not die with the generic source-not-found error."""
    import pytest

    from dbt_schema_builder_spark.sources.io import read_avro

    with pytest.raises(RuntimeError, match="spark-avro"):
        read_avro(spark, str(tmp_path))


def test_raw_files_to_packed_sequences_end_to_end(spark, tmp_path):
    """r6 integration: the full curation path from RAW TEXT FILES to
    packed training chunks — ingest (content-addressed), language-id,
    quality gate, exact dedup (the ingest keying makes it a groupBy),
    sequence packing. Every stage is an existing operator; this pins
    that their contracts actually compose."""
    from dbt_schema_builder_spark.operators import dedup, text as text_ops
    from dbt_schema_builder_spark.sources.io import read_text_corpus

    body = (
        "the quick brown fox jumps over the lazy dog and keeps running\n"
        "a second document with enough words to pass simple gates here\n"
        "the quick brown fox jumps over the lazy dog and keeps running\n"
        "short\n"
    )
    (tmp_path / "shard0.txt").write_text(body)
    (tmp_path / "shard1.txt").write_text(
        "third unique document line with a healthy number of words too\n"
    )
    docs = read_text_corpus(spark, str(tmp_path))
    # identical lines collapse at ingest (content-addressed keys) —
    # 5 raw lines, 4 distinct texts
    assert docs.count() == 5
    deduped = dedup.exact_dedup(docs)
    assert deduped.count() == 4
    keep = docs.join(
        deduped.select(F.col("keep_doc_id").alias("doc_id")), "doc_id"
    ).dropDuplicates(["doc_id"])
    labeled = keep.drop("lang").join(
        text_ops.lang_id(keep).select(
            "doc_id", F.col("pred_lang").alias("lang")
        ),
        "doc_id",
    )
    gated = labeled.where(F.size(F.split(F.trim("text"), r"\s+")) >= 8)
    assert gated.count() == 3  # 'short' dropped
    packed = text_ops.pack_sequences(gated, budget=16, by="lang")
    rows = packed.collect()
    assert len(rows) == 3
    # deterministic chunk ids, tokens conserved within each stratum
    assert all(r.chunk_id >= 0 for r in rows)


def test_zorder_exact_rejects_empty_input(spark):
    import pytest

    from dbt_schema_builder_spark.sources.io import zorder_value_exact

    empty = spark.createDataFrame([], "a int, b int")
    with pytest.raises(ValueError, match="empty input"):
        zorder_value_exact(empty, ["a", "b"], bits=3)
