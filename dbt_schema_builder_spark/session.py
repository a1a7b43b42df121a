"""SparkSession construction tuned for the engine.

Single place that encodes the scale-oriented defaults: AQE on (runtime
re-planning, skew-join handling, partition coalescing), a broadcast threshold
sized for dimension tables, and Arrow for the pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def get_spark(
    app_name: str = "dbt-schema-builder-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the same entry points run under the driver harness and under pytest.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Dimension tables (region/nation/customer/supplier/part at test SF)
        # should broadcast; 64 MiB leaves headroom at larger SF while the
        # 100 TB fact side never broadcasts.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas UDF / applyInPandas / mapInPandas paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet TIMESTAMP(NANOS) is rejected by default; read as long and
        # convert in read_table (Spark has no nanosecond timestamp type).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Parquet scans: vectorized reader + pushdown are on by default;
        # keep split size default (128 MiB) — right for wide fact scans.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) (from the footer).

    Spark has no nanosecond timestamp; with
    ``spark.sql.legacy.parquet.nanosAsLong`` they surface as epoch-nanos
    longs, which ``read_table`` converts to microsecond timestamps
    (truncation — the same conversion DuckDB applies when comparing).
    """
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            inner = [f for f in os.listdir(path) if f.endswith(".parquet")]
            if not inner:
                return []
            path = os.path.join(path, inner[0])
        schema = pq.ParquetFile(path).schema_arrow
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read one parquet table, normalizing nanosecond timestamps to Spark's
    microsecond TimestampType. Safe under any session: the legacy conf is
    dynamic, so set it here too (the driver harness builds its own session)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(path)
    for c in _nanos_timestamp_columns(path):
        # integer `div` keeps full int64 precision (a double division would
        # lose bits above 2^53 on epoch-nanos values)
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES):
    """Load the driver's parquet tables as a dict of DataFrames."""
    return {name: read_table(spark, f"{sf_dir}/{name}.parquet") for name in names}
