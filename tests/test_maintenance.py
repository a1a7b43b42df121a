"""Table-maintenance operators: small-file compaction, snapshot diff,
incremental aggregate maintenance. Tests-only verification (no driver
window slot): each is pinned against a from-scratch recompute or
physical file evidence."""

import glob
import os

from pyspark.sql import functions as F

from dbt_schema_builder_spark.operators.relational import (
    merge_partial_aggregates,
)
from dbt_schema_builder_spark.sources.io import compact_files, snapshot_diff


def _files(path):
    return [
        p
        for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(p)
    ]


def test_compact_files_reduces_count_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    df.repartition(64).write.parquet(src)  # 64 tiny files
    assert len(_files(src)) >= 64
    stats = compact_files(spark, src, dst, target_mb=128)
    assert stats["files_before"] >= 64
    assert stats["files_after"] == 1  # well under one 128 MB target
    back = spark.read.parquet(dst)
    assert back.count() == 10000
    assert back.agg(F.sum("id")).collect()[0][0] == 10000 * 9999 // 2


def test_compact_files_sorted_keeps_footer_stats_tight(spark, tmp_path):
    import pyarrow.parquet as pq

    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "sorted")
    spark.range(50000).select(
        F.col("id"), F.pmod(F.xxhash64("id"), F.lit(1000)).alias("k")
    ).repartition(32).write.parquet(src)
    compact_files(spark, src, dst, target_mb=1, sort_within_by=["k"])
    # every row group's k-range must be narrow relative to the domain
    widths = []
    for f in _files(dst):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(1)
            widths.append(col.statistics.max - col.statistics.min)
    domain = 1000
    assert max(widths) < domain  # unsorted would span ~the whole domain


def test_snapshot_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 0.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "CHANGED", 30.0), (5, "e", 50.0), (4, "null", 0.0)],
        "k long, s string, v double",
    )
    out = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    # 1 removed, 2 unchanged (absent), 3 changed, 5 added,
    # 4: NULL vs the string 'null' must register as changed (null-tag)
    assert out == {1: "removed", 3: "changed", 5: "added", 4: "changed"}


def test_snapshot_diff_empty_delta(spark, tables):
    same = tables["customer"]
    assert snapshot_diff(same, same, ["c_custkey"]).count() == 0


def test_merge_partial_aggregates_equals_recompute(spark):
    """Three incremental folds == one full recompute, exactly (integer
    micro-unit sums), including keys that appear only in later batches."""
    def mk(rows):
        return spark.createDataFrame(rows, "k string, v long")

    batches = [
        mk([("a", 1), ("a", 2), ("b", 10)]),
        mk([("b", 5), ("c", 100)]),
        mk([("a", 7), ("c", 1), ("d", 3)]),
    ]
    state = spark.createDataFrame([], "k string, v long, n long")
    for b in batches:
        state = merge_partial_aggregates(state, b, ["k"], ["v"])
    full = batches[0].unionByName(batches[1]).unionByName(batches[2])
    expect = {
        r["k"]: (r["v"], r["n"])
        for r in full.groupBy("k")
        .agg(F.sum("v").alias("v"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r["k"]: (r["v"], r["n"]) for r in state.collect()}
    assert got == expect


def test_read_parquet_evolving_merges_and_defaults(spark, tmp_path):
    from dbt_schema_builder_spark.sources.io import read_parquet_evolving

    d = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, s string").write.mode(
        "append"
    ).parquet(d)
    # schema evolves: a new column appears in later files
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, s string, score double"
    ).write.mode("append").parquet(d)
    out = read_parquet_evolving(spark, d, defaults={"score": 0.0})
    assert set(out.columns) == {"id", "s", "score"}
    rows = {r["id"]: r["score"] for r in out.collect()}
    assert rows == {1: 0.0, 2: 9.5}  # pre-evolution file filled, not null


def test_skew_report_flags_hot_key(spark):
    from dbt_schema_builder_spark.operators.skew import skew_report

    rows = [(i, "hot" if i < 600 else f"k{i}") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, k string")
    out = {r["key_value"]: r for r in skew_report(df, "k").collect()}
    assert out["hot"]["share_milli"] == 600
    assert out["hot"]["needs_salt"] == 1
    cold = [r for v, r in out.items() if v != "hot"]
    assert all(r["needs_salt"] == 0 for r in cold)
    assert all(r["n_keys"] == 401 for r in out.values())


def test_list_data_files_skips_hidden_ancestors_keeps_partition_dirs(
    spark, tmp_path
):
    """r7 review: the hidden-name rule must apply to every path
    component below the root (a commit-protocol file under
    _temporary/ must not count toward compaction byte totals), while
    _name=value partition directories stay visible — the exact
    InMemoryFileIndex.shouldFilterOutPathName semantics Spark's own
    readers use."""
    import os

    from dbt_schema_builder_spark.sources.io import list_data_files

    root = str(tmp_path / "ds")
    df = spark.range(10)
    df.write.mode("overwrite").parquet(root)
    # partition-style dir with a leading underscore: must stay visible
    part = os.path.join(root, "_file_id=3")
    df.write.mode("overwrite").parquet(part)
    # in-flight commit dir: must be invisible at any depth
    stage = os.path.join(root, "_temporary", "0", "attempt_1")
    df.write.mode("overwrite").parquet(stage)
    hidden = os.path.join(root, ".hive-staging_x")
    df.write.mode("overwrite").parquet(hidden)
    uris = [u for u, _ in list_data_files(spark, root)]
    assert uris, "listing came back empty"
    assert any("_file_id=3/" in u for u in uris)
    assert all("_temporary" not in u for u in uris)
    assert all(".hive-staging" not in u for u in uris)
    # leaf rule still applies (parquet writers drop _SUCCESS markers)
    assert all(not u.rsplit("/", 1)[1].startswith(("_", ".")) for u in uris)
