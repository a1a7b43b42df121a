"""10x state-size stress for the applyInPandasWithState operators
(SCALE.md streaming-section evidence; the r5 verdict's task #5).

scale_stress.py covers the batch operators; this measures the stateful
STREAMING pair (streaming_user_state, streaming_funnel) whose cost
driver is the state store, not the shuffle: rows of per-user state held
across micro-batches. The 10x replica multiplies USER-KEY CARDINALITY
at constant per-key volume (user_id*10 + rep — the r4c recipe: the
shape a larger deployment actually has), so state rows grow 10x while
per-group work stays fixed.

Each operator runs two drain shapes over the same staged directory:
  - availableNow single-batch (the oracle-checked shape): one intake
    batch + the trailing no-data batch;
  - max_files_per_trigger=1 (the production incremental shape): one
    micro-batch per staged file, so state survives across 8 batches
    and every batch pays the state-store read-modify-write.

Reported per run: wall seconds, state rows (numRowsTotal from the last
progress event), emitted rows. Run:  python tools/streaming_scale.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbt_schema_builder_spark.session import get_spark, read_table  # noqa: E402
from dbt_schema_builder_spark.streaming import (  # noqa: E402
    stream_events,
    streaming_funnel,
    streaming_user_state,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# r10: replica factor for state-row cardinality (10 = the r6 rows,
# 100 = the r10 verdict-#8 evidence run)
FACTOR = int(os.environ.get("STREAM_FACTOR", "10"))
N_FILES = 8

spark = get_spark(app_name="streaming-scale")
spark.sparkContext.setLogLevel("ERROR")


def stage(df, tag):
    d = f"/tmp/streaming_scale_{tag}"
    marker = os.path.join(d, "_STAGED")
    if not os.path.exists(marker):
        df.repartitionByRange(N_FILES, "ts").write.mode("overwrite").parquet(d)
        open(marker, "w").write(tag)
    return d


base = read_table(spark, f"{SF_DIR}/events.parquet")
# 10x distinct users, same per-user event volume; event_id re-keyed unique
reps = spark.range(FACTOR).select(F.col("id").alias("rep"))
ev10 = base.crossJoin(reps).select(
    (F.col("event_id") * FACTOR + F.col("rep")).alias("event_id"),
    "ts",
    (F.col("user_id") * FACTOR + F.col("rep")).alias("user_id"),
    "event_type",
    "value",
)
dirs = {"1x": stage(base, "1x"), f"{FACTOR}x": stage(ev10, f"{FACTOR}x")}

OPS = {
    "user_state": lambda src: streaming_user_state(src),
    "funnel": lambda src: streaming_funnel(src),
}


def drain(op_name, events_dir, mft):
    src = stream_events(spark, events_dir, max_files_per_trigger=mft)
    df = OPS[op_name](src)
    name = f"sink_{op_name}_{os.path.basename(events_dir)}_{mft or 0}"
    t0 = time.perf_counter()
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    prog = q.lastProgress or {}
    state_rows = sum(
        so.get("numRowsTotal", 0) for so in prog.get("stateOperators", [])
    )
    emitted = spark.table(name).count()
    spark.catalog.clearCache()
    return {
        "wall_s": round(wall, 2),
        "state_rows": state_rows,
        "emitted": emitted,
    }


out = {}
for op in OPS:
    for scale, d in dirs.items():
        for label, mft in (("availableNow", None), ("mft1", 1)):
            key = f"{op}_{scale}_{label}"
            out[key] = drain(op, d, mft)
            print(key, out[key], flush=True)

# scaling ratios: 10x wall / 1x wall per drain shape
for op in OPS:
    for label in ("availableNow", "mft1"):
        a, b = out[f"{op}_1x_{label}"], out[f"{op}_{FACTOR}x_{label}"]
        out[f"ratio_{op}_{label}"] = round(b["wall_s"] / max(a["wall_s"], 1e-9), 2)
print(json.dumps(out, indent=1))

# ---------------------------------------------------------------------------
# r7: emit-on-timer emission-volume collapse (the r6 SCALE.md lever,
# verdict item #3). Same mft=1 incremental drain, but the stateful pair
# emits only when a user's quiet period (1.2 s) ends — emitted rows
# should collapse from users x touching-batches toward one per user.
# ---------------------------------------------------------------------------
from dbt_schema_builder_spark.streaming import (  # noqa: E402
    run_stream_upsert_to_memory,
)

TIMER_OPS = {
    "user_state": lambda src: streaming_user_state(
        src, timeout_minutes=0.02, emit="timer"
    ),
    "funnel": lambda src: streaming_funnel(
        src, timeout_minutes=0.02, emit="timer"
    ),
}
FUNNEL_STEPS = ("view", "click", "purchase")


def drain_timer(op_name, events_dir):
    df0 = spark.read.parquet(events_dir)
    if op_name == "funnel":
        df0 = df0.where(F.col("event_type").isin(*FUNNEL_STEPS))
    n_users = df0.select("user_id").distinct().count()
    src = stream_events(spark, events_dir, max_files_per_trigger=1)
    df = TIMER_OPS[op_name](src)
    t0 = time.perf_counter()
    upserts, log = run_stream_upsert_to_memory(
        df,
        ["user_id"],
        stop_when=lambda u, l: len(u) >= n_users,
        timeout_sec=600.0,
    )
    wall = time.perf_counter() - t0
    spark.catalog.clearCache()
    return {
        "wall_s": round(wall, 2),
        "users": n_users,
        "upserted": len(upserts),
        "emitted": len(log),
    }


for op in TIMER_OPS:
    for scale, d in dirs.items():
        key = f"{op}_{scale}_timer"
        out[key] = drain_timer(op, d)
        upd = out[f"{op}_{scale}_mft1"]["emitted"]
        out[key]["collapse_vs_mft1_update"] = round(
            out[key]["emitted"] / max(upd, 1), 3
        )
        print(key, out[key], flush=True)
print(json.dumps(out, indent=1))
