"""10x/100x stress for the round-6 operators (SCALE.md evidence).

Covers what scale_stress.py and streaming_scale.py don't: the
oracle-replayable z-order layout (whose one non-distributed stage is
the cum-count window over each dimension's DISTINCT values — key
cardinality is the stress axis, so the replica multiplies it), BPE
merge learning (vocab-bounded by construction — should stay flat), and
the bounded SemDeDup branch.

Harness discipline (the r4 bench lesson): warmup pass first, clearCache
per run, interleaved samples, median-of-3.

Run:  STRESS_FACTOR=10 python tools/r6_scale.py
      STRESS_FACTOR=100 R6_OPS=zorder,bpe python tools/r6_scale.py
(R6_OPS filters {zorder,bpe,semdedup}; semdedup at 100x on the
dup-dense replica is quadratic OUTPUT by construction — see SCALE.md —
so the 100x pass runs only the first two.)
"""
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbt_schema_builder_spark.session import get_spark, read_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("STRESS_FACTOR", "10"))
OPS = set(
    os.environ.get("R6_OPS", "zorder,bpe,semdedup").split(",")
)

spark = get_spark(app_name="r6-scale")
spark.sparkContext.setLogLevel("ERROR")


def timed(fn):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def interleaved(name, mk1, mkN):
    mk1(), mkN()  # warmup both
    s1, sN = [], []
    for _ in range(3):
        s1.append(timed(mk1))
        sN.append(timed(mkN))
    m1, mN = statistics.median(s1), statistics.median(sN)
    print(
        f"{name}: 1x {m1:.2f}s {FACTOR}x {mN:.2f}s "
        f"ratio {mN / m1:.2f} per-row {mN / m1 / FACTOR:.3f}",
        flush=True,
    )


def staged(df, tag):
    p = f"/tmp/r6_scale_{tag}_{FACTOR}"
    if not os.path.exists(os.path.join(p, "_SUCCESS")):
        df.write.mode("overwrite").parquet(p)
    return spark.read.parquet(p)


reps = spark.range(FACTOR).select(F.col("id").alias("rep"))

ev = read_table(spark, f"{SF_DIR}/events.parquet").select("user_id", "event_id")
e1 = staged(ev, "ev1")
eN = staged(
    ev.crossJoin(reps).select(
        (F.col("user_id") * FACTOR + F.col("rep")).alias("user_id"),
        (F.col("event_id") * FACTOR + F.col("rep")).alias("event_id"),
    ),
    "evN",
)


def zo(df):
    from dbt_schema_builder_spark.sources.io import zorder_layout_report

    return lambda: zorder_layout_report(
        spark, df, ["user_id", "event_id"],
        tempfile.mkdtemp(prefix="r6zo_"), bits=4, n_files=8,
    ).collect()


if "zorder" in OPS:
    interleaved("zorder_layout_report", zo(e1), zo(eN))

docs = read_table(spark, f"{SF_DIR}/documents.parquet")
dN = staged(
    docs.crossJoin(reps).select(
        (F.col("doc_id") * FACTOR + F.col("rep")).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    ),
    "docsN",
)


def bpe(df):
    from dbt_schema_builder_spark.operators import text

    return lambda: text.learn_bpe_merges(df, n_merges=6, min_pair_count=2)


if "bpe" in OPS:
    interleaved("learn_bpe_merges", bpe(docs), bpe(dN))

emb = read_table(spark, f"{SF_DIR}/embeddings.parquet")
embN = staged(
    emb.crossJoin(reps).select(
        (F.col("vec_id") * FACTOR + F.col("rep")).alias("vec_id"),
        "embedding", "label",
    ),
    "embN",
)


def sdi(df):
    from dbt_schema_builder_spark.operators import similarity

    return lambda: similarity.semantic_dedup(
        df, threshold=0.4, strategy="ivf_sharded", k_cells=32, nprobe=8
    ).groupBy("action").count().collect()


if "semdedup" in OPS:
    interleaved("semantic_dedup(ivf_sharded)", sdi(emb), sdi(embN))
