"""Source/sink helpers.

The reference's only "source" is the Snowflake information schema and its
only sinks are SQL/YAML files (reference queries.py, relation.py:251-288);
the engine generalizes to the formats a Spark deployment actually uses.
Parquet is the primary format (columnar, predicate/projection pushdown);
CSV/JSON readers take explicit schemas so a 100 TB read never pays
inference, and partitioned writes give partition-pruned scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..session import read_table


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read with the engine's nanos-timestamp normalization."""
    return read_table(spark, path)


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
