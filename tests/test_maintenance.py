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
