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
        # Whole-stage-codegen class cache: the default (100 entries)
        # thrashes on any session running more than a handful of
        # distinct queries — measured on the 119-query bench: ~1,600
        # distinct codegen units, 2,550 Janino recompiles PER PASS at
        # ~4 ms each under the default, ~0 recompiles on warm passes at
        # 8192 (tools/r13_codegen_probe.py; OPTIMIZATION_r13.md).
        # Driver-side JVM memory only (~1.6k small generated classes),
        # independent of core count / data scale.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "8192"),
        )
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

    Spark has no nanosecond timestamp. How a NANOS column surfaces depends
    on the runtime: Spark 4.1 truncates it to TIMESTAMP_NTZ micros (the
    ``nanosAsLong`` legacy conf is accepted but ignored); older runtimes
    honoring the conf surface an epoch-nanos long. ``read_table``
    normalizes every case to TIMESTAMP_NTZ micros — the same floor
    DuckDB applies at its fetch layer, and timezone-independent.
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


_EPOCH_NTZ = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def epoch_millis(col) -> F.Column:
    """Epoch milliseconds of a timestamp column, NTZ-safe.

    ``unix_millis`` rejects TIMESTAMP_NTZ (the type every nanos parquet
    column surfaces as under Spark 4.1); ``timestamp_diff`` against an NTZ
    epoch literal computes the same floor-to-ms value without a timezone
    dependency. LTZ inputs are first cast to NTZ (identity under the UTC
    session this engine pins)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MILLISECOND",
        F.expr(_EPOCH_NTZ),
        c.cast("timestamp_ntz"),
    )


def epoch_micros(col) -> F.Column:
    """Epoch microseconds, NTZ-safe twin of ``unix_micros``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND",
        F.expr(_EPOCH_NTZ),
        c.cast("timestamp_ntz"),
    )


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read one parquet table, normalizing nanosecond timestamps to
    TIMESTAMP_NTZ microseconds regardless of runtime.

    This is the one seam where timestamp representation is decided: every
    consumer sees TIMESTAMP_NTZ micros and derives epoch math through
    ``epoch_millis``/``epoch_micros`` (never ``unix_millis``, which
    rejects NTZ). Safe under any session — vanilla Spark 4.1 already
    surfaces NANOS as truncated NTZ; older runtimes honoring
    ``nanosAsLong`` surface a long, converted here."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(path)
    for c in _nanos_timestamp_columns(path):
        dt = df.schema[c].dataType.typeName()
        if dt == "long":
            # integer `div` keeps full int64 precision; timestampadd from
            # the NTZ epoch is timezone-independent
            df = df.withColumn(
                c,
                F.expr(
                    f"timestampadd(MICROSECOND, `{c}` div 1000, {_EPOCH_NTZ})"
                ),
            )
        elif dt == "timestamp":
            # LTZ surfacing (conf honored differently): pin to NTZ; the
            # engine session runs UTC so the cast is an identity
            df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
        # timestamp_ntz: already the normalized form (micros truncation
        # applied by the parquet reader)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES):
    """Load the driver's parquet tables as a dict of DataFrames."""
    return {name: read_table(spark, f"{sf_dir}/{name}.parquet") for name in names}


# ---------------------------------------------------------------------------
# Operator cache hygiene (r6 verdict "what's wrong" #1)
#
# Operators persist() subtrees their returned plan consumes more than once
# (self-join inputs, LM tables, signature frames). The persist must OUTLIVE
# the function — the consumer materializes the returned DataFrame later —
# so the operator cannot unpersist before returning, and a library user
# composing many operators in one session accumulates cached blocks until
# LRU eviction (the pollution mechanism that fabricated three past bench
# "regressions"). The contract: operators register every persist here via
# ``track_persist``; the consumer calls ``release_caches()`` after
# materializing results (bench.py and tools/driver_sim.py do — between
# queries). ``spark.catalog.clearCache()`` also works but nukes the
# caller's OWN cached frames too; this release is scoped to what the
# operators pinned.
# ---------------------------------------------------------------------------

_TRACKED_PERSISTS: list = []


def track_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() + register for scoped release. STRONG references by
    design: the JVM-side cache outlives the operator's Python locals
    (persist is cluster state, not object state — a weakref registry
    would silently forget every block the moment the operator
    returned); what's held is a plan wrapper, a few KB each, cleared
    on every release."""
    out = df.persist(storage_level) if storage_level is not None else df.persist()
    _TRACKED_PERSISTS.append(out)
    return out


def release_caches() -> int:
    """Unpersist every operator-tracked cached frame; returns how many
    were released. Blocking=False (Spark's default): the JVM frees the
    blocks asynchronously. Takes no session argument on purpose: the
    persist registry is process-global (one tracked list regardless of
    how many sessions exist), and a parameter would wrongly suggest
    per-session scoping."""
    n = 0
    for df in _TRACKED_PERSISTS:
        try:
            df.unpersist()
            n += 1
        except Exception:
            # session already stopped — nothing to free
            pass
    _TRACKED_PERSISTS.clear()
    return n
