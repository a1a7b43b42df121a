"""Structured Streaming operators (SURVEY.md B14).

The reference has no streaming surface at all (SURVEY.md section 1.3); this
is the north-star extension, built the Spark-native way:

- file-source ``readStream`` over the same parquet tables (so batch and
  stream share one schema and the batch operators in
  ``operators/timeseries.py`` are the verification oracle)
- event-time watermarks bound state; late rows beyond the watermark drop
- ``F.window`` / ``F.session_window`` aggregations — the streaming twins of
  the batch tumbling/sessionize operators
- ``dropDuplicatesWithinWatermark`` for streaming dedup with bounded state
- ``applyInPandasWithState`` for custom per-key state machines

At scale these run identically on a real cluster: state lives in the state
store (RocksDB-backed), partitioned by grouping key; watermarks cap its
size. Tests drive everything with ``trigger(availableNow=True)`` so a
stream run is deterministic and finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

# Spark 4.1 surfaces parquet TIMESTAMP(NANOS) as TIMESTAMP_NTZ truncated to
# micros (the nanosAsLong legacy conf is ignored) — declaring LongType here
# silently reads NULL ts, which is exactly how round 2's streaming queries
# emitted zero rows. Same normalization seam as session.read_table.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampNTZType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def stream_events(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over the events parquet (directory).

    The nanos timestamp surfaces as TIMESTAMP_NTZ micros and is cast to
    TIMESTAMP (LTZ) because event-time watermarks require it
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise). The engine session
    pins UTC, so the cast is an identity on the wall-clock value and
    collected rows compare equal to the NTZ batch twins.

    ``max_files_per_trigger`` is a SOURCE option (setting it on
    writeStream is silently ignored — the r5 multi-batch tests learned
    this the hard way). Leave None for finite oracle-checked runs: the
    file source does not guarantee listing order, so one-file-per-
    trigger can process a late-timestamp file first and silently DROP
    earlier files' rows as late data (measured: 278 of 530 windows
    emitted, order-dependent). Single-batch intake has no cross-batch
    lateness; the trailing no-data micro-batch then advances the
    watermark to max(ts) - delay and append mode flushes every closed
    window deterministically — which is what makes the streaming
    queries value-oracle-checkable. Set it for production-shaped
    incremental drains and for tests that exercise cross-batch state."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(events_dir)
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def streaming_tumbling_counts(
    events: DataFrame, watermark: str = "10 minutes", width: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling-window aggregate — the streaming twin of
    ``operators.timeseries.tumbling_window_stats``. State per open window;
    windows finalize once the watermark passes their end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # micro-unit fixed point (not ROUND(SUM,4)): the partial-agg
            # order of a distributed double sum is nondeterministic and a
            # trailing round can flip — integer micro-unit sums are exact
            (
                F.sum(F.round(F.col("value") * 1e6).cast("long")) / F.lit(1e6)
            ).alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket"), "n_events", "sum_value")
    )


def streaming_session_window(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based session windows via ``F.session_window`` — the streaming
    twin of ``operators.timeseries.sessionize``. Sessions close when the
    watermark passes last_event + gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state:
    ``dropDuplicatesWithinWatermark`` expires keys once they age past the
    watermark — the streaming analog of ``operators.dedup.exact_dedup``."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


USER_STATE_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
        StructField("last_ts", TimestampType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        # total value in integer micro-units: accumulating a double across
        # micro-batches is order dependent and Python round() is banker's
        # (unlike Spark/DuckDB half-away) — exact long arithmetic instead
        StructField("total_micro", LongType(), True),
        # last event-time in epoch micros: the r5 multi-batch test caught
        # that a per-batch max is NOT the running max when the file
        # source lists out of ts order — last_ts must live in the state
        StructField("last_ts_us", LongType(), True),
    ]
)


def streaming_user_state(
    events: DataFrame,
    timeout_minutes: float | None = None,
    emit: str = "updates",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, total value). The shape for any bespoke state
    machine (fraud scoring, session enrichment) Spark lacks natively.

    ``emit`` is the 100 TB emission-volume lever (SCALE.md r6: update-
    mode volume = users x touching batches is the real cost of the
    stateful pair, not state size):

    - ``"updates"`` (default): one row per user per touching batch —
      maximal freshness, maximal volume. ``timeout_minutes`` then opts
      into silent state EXPIRY (remove on timer, nothing emitted).
    - ``"timer"``: emit NOTHING on data; when the processing-time timer
      fires after ``timeout_minutes`` of per-user quiet, emit ONE row
      with the running aggregate and keep the state (the timer re-arms
      only when new data arrives, so an idle user emits exactly once
      per quiet period, not once per batch). Emissions collapse from
      users x batches to users x quiet-periods; pair with an upsert
      sink (``run_stream_upsert_to_memory`` is the foreachBatch
      template) since each row supersedes the user's previous one.
      Requires ``timeout_minutes``; state expiry would need a separate
      tombstone pass (deliberately not conflated with the flush timer).

    The r3 rule stands: ProcessingTimeTimeout (both the expiry and the
    ``"timer"`` mode) must NEVER run under trigger(availableNow) — the
    query keeps servicing timers and never terminates. Finite tests
    drive it with maxFilesPerTrigger drains + an explicit stop
    (tests/test_streaming.py::test_user_state_emit_on_timer).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if emit not in ("updates", "timer"):
        raise ValueError(
            f"streaming_user_state: emit must be 'updates' or 'timer', "
            f"got {emit!r}"
        )
    if emit == "timer" and timeout_minutes is None:
        raise ValueError(
            "streaming_user_state: emit='timer' needs timeout_minutes "
            "(the quiet period after which the aggregate flushes)"
        )
    timeout_ms = (
        max(1, int(timeout_minutes * 60 * 1000))
        if timeout_minutes is not None
        else None
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        def row(n, total_micro, last_us):
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total_micro / 1e6],
                    "last_ts": [pd.Timestamp(last_us * 1000)],
                }
            )

        if state.hasTimedOut:
            if emit == "timer":
                # quiet period over: flush the running aggregate once.
                # State is kept and the timer NOT re-armed — the next
                # data batch re-arms it, so an idle user emits exactly
                # once, not once per timer tick.
                n, total_micro, last_us = state.get
                yield row(n, total_micro, last_us)
            else:
                state.remove()
            return
        n, total_micro, last_us = (
            state.get if state.exists else (0, 0, None)
        )
        for pdf in pdfs:
            n += len(pdf)
            # value_micro is derived Spark-side (F.round half-away), so
            # the state update is exact integer arithmetic — reproducible
            # regardless of batch/partition order
            total_micro += int(pdf["value_micro"].sum())
            batch_us = pdf["ts"].max().value // 1000
            last_us = batch_us if last_us is None else max(last_us, batch_us)
        state.update((n, total_micro, last_us))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if emit == "updates":
            yield row(n, total_micro, last_us)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.withColumn(
            "value_micro", F.round(F.col("value") * 1e6).cast("long")
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=USER_STATE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def streaming_click_purchase_join(
    events: DataFrame,
    gap_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: purchases within ``gap_minutes`` after a
    click by the same user — the streaming twin of
    ``operators.temporal.range_join``. Both sides carry watermarks and
    the join condition bounds event-time distance, so each side's state
    store retains only the rows still joinable (state is bounded by
    watermark + gap, not by history)."""
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("cu"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("pu"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    gap = f"INTERVAL {gap_minutes} MINUTES"
    return clicks.join(
        purchases,
        F.expr(
            f"cu = pu AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + {gap}"
        ),
    ).select("click_id", "purchase_id")


def run_stream_to_files(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Finite stream run into an exactly-once parquet file sink with a
    checkpoint. Re-running after new source files appear resumes from the
    checkpoint and processes only the delta — the production shape for
    incremental 100 TB ingestion (restart-safe, no reprocessing)."""
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_to_memory(
    df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Execute a finite stream run (availableNow trigger) into a memory
    sink and return the materialized result table."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def run_stream_upsert_to_memory(
    df: DataFrame,
    key_cols: list,
    stop_when,
    poll_sec: float = 0.2,
    timeout_sec: float = 60.0,
    checkpoint_dir: str | None = None,
):
    """foreachBatch UPSERT sink under a continuous micro-batch trigger —
    the consumption template for ``emit="timer"`` stateful operators,
    which can never run under availableNow (the r3 rule: timers keep
    the query alive). Each batch's rows overwrite the sink entry for
    their key, exactly what update-mode emission semantics mean; the
    returned log additionally keeps every (epoch_id, row) so tests can
    assert emission VOLUME, not just final values.

    Local-mode shape: the closure runs in the driver (the r4c
    foreachBatch lesson), a dict is the store. At scale the same
    foreachBatch body becomes MERGE INTO / a key-value store PUT — the
    sink contract (idempotent per-key overwrite, batch_id for dedup on
    retry) is identical.

    Polls ``stop_when(upserts, log)`` until true or ``timeout_sec``,
    then stops the query. Returns (upserts, log).
    """
    import time as _time

    upserts: dict = {}
    log: list = []

    def sink(batch_df, epoch_id):
        for r in batch_df.collect():
            upserts[tuple(r[c] for c in key_cols)] = r
            log.append((epoch_id, r))

    writer = df.writeStream.outputMode("update").foreachBatch(sink)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(processingTime="0 seconds").start()
    try:
        deadline = _time.monotonic() + timeout_sec
        while _time.monotonic() < deadline:
            if stop_when(upserts, log):
                break
            _time.sleep(poll_sec)
    finally:
        q.stop()
    return upserts, log


def streaming_static_enrich(
    events: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static join: enrich each streamed event with a slowly-
    changing batch dimension. The static side is re-read every
    micro-batch (so dimension updates are picked up between batches) and
    broadcast — unlike a stream-stream join this keeps NO state and
    needs no watermark, which makes it the cheapest enrichment shape at
    scale: the stream never shuffles, each executor probes the broadcast
    map. Deterministic output (same rows as the batch join), so this is
    the one streaming operator with a full value-hash oracle."""
    return events.join(F.broadcast(dim), on, how)


def streaming_dedup_against_history(
    events: DataFrame, seen_keys: DataFrame, on: str = "event_id"
) -> DataFrame:
    """Streaming twin of ``dedup.incremental_dedup``: drop streamed rows
    whose key already exists in the ingested history, via a stream-
    static LEFT ANTI join against the (broadcast) key table. Like
    ``streaming_static_enrich`` this is STATELESS — no watermark, no
    state store; the static side is re-read per micro-batch, so a
    history append between batches is picked up automatically. At scale
    the static side is the bounded fingerprint/key table (or its Bloom
    prefilter — compose ``dedup.bloom_bits`` upstream), never the raw
    history. Deterministic (same rows as the batch anti-join), so it
    carries a full value-hash oracle."""
    return events.join(F.broadcast(seen_keys), on, "left_anti")


def streaming_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    max_per_step: int = 256,
    timeout_minutes: float | None = None,
    emit: str = "updates",
) -> DataFrame:
    """Streaming twin of ``timeseries.funnel``: per-user conversion
    state machine via ``applyInPandasWithState``, emitting on every
    update the furthest funnel stage reached (strictly-after chaining on
    the earliest qualifying timestamps) and when.

    Exactness contract: a late event can retroactively change the whole
    chain (an earlier 'view' can re-qualify a 'click' that previously
    didn't count), so the state keeps, per step, the sorted list of the
    ``max_per_step`` EARLIEST timestamps seen and re-derives the greedy
    chain from scratch on every update — exact whenever no more than
    ``max_per_step`` events per (user, step) exist, and always exact
    under the repo's single-batch availableNow runs (all data present
    when the chain is derived). State is O(steps * max_per_step) longs
    per user — bounded, unlike keeping raw history.

    The greedy chain (t_k = min{ts of step k > t_{k-1}}) matches the
    batch operator exactly; the parity test pins the aggregated stage
    counts against ``timeseries.funnel`` on the same files.

    ``emit="timer"`` (with ``timeout_minutes``) is the same emission-
    volume lever as ``streaming_user_state``: nothing per update, one
    row with the CURRENT chain when a user's quiet period ends, state
    kept, timer re-armed only by new data. A funnel cannot flush-and-
    remove (the chain needs full history — a late early-step event
    re-qualifies later steps), so unlike a session aggregate the state
    outlives the flush by design. Never under availableNow (r3 rule).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..session import epoch_millis

    if emit not in ("updates", "timer"):
        raise ValueError(
            f"streaming_funnel: emit must be 'updates' or 'timer', "
            f"got {emit!r}"
        )
    if emit == "timer" and timeout_minutes is None:
        raise ValueError(
            "streaming_funnel: emit='timer' needs timeout_minutes"
        )
    if emit == "updates" and timeout_minutes is not None:
        # refuse rather than silently ignore (the swallowed-kwarg class):
        # unlike streaming_user_state, a funnel cannot expire state (the
        # chain needs full history), so updates-mode has no timeout role
        raise ValueError(
            "streaming_funnel: timeout_minutes only applies with "
            "emit='timer' (the quiet-period flush); a funnel cannot "
            "expire state — with emit='updates' the argument would be "
            "silently ignored, so it is rejected instead"
        )
    timeout_ms = (
        max(1, int(timeout_minutes * 60 * 1000))
        if timeout_minutes is not None
        else None
    )
    n_steps = len(steps)
    state_schema = ", ".join(f"s{i} array<bigint>" for i in range(n_steps))
    out_schema = "user_id long, stage int, t_ms long"
    step_index = {s: i for i, s in enumerate(steps)}

    def _chain(lists):
        # greedy strictly-after chain over the retained minima
        t = None
        stage = 0
        for lst in lists:
            cand = [x for x in lst if t is None or x > t]
            if not cand:
                break
            t = cand[0]
            stage += 1
        return stage, t

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        def row(stage, t):
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "stage": [stage],
                    "t_ms": [t if t is not None else -1],
                }
            )

        if state.hasTimedOut:
            # timer mode only (updates mode never arms a timer): flush
            # the current chain once; keep state (a funnel can't drop
            # history), don't re-arm — next data batch re-arms
            stage, t = _chain([list(x) for x in state.get])
            yield row(stage, t)
            return
        lists = (
            [list(x) for x in state.get]
            if state.exists
            else [[] for _ in range(n_steps)]
        )
        for pdf in pdfs:
            for et, ms in zip(pdf["event_type"], pdf["ms"]):
                lists[step_index[et]].append(int(ms))
        lists = [sorted(l)[:max_per_step] for l in lists]
        state.update(tuple(lists))
        if emit == "timer":
            state.setTimeoutDuration(timeout_ms)
            return
        stage, t = _chain(lists)
        yield row(stage, t)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if emit == "timer"
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.where(F.col("event_type").isin(*steps))
        .withColumn("ms", epoch_millis(F.col("ts")))
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def stream_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of ``sources.read_text_corpus`` (line mode): a
    readStream.text over a drop directory, each non-empty line becoming
    a documents-shaped row with the same content-addressed xxhash64
    key — so a continuously-landing raw corpus flows straight into the
    streaming dedup/enrich operators (``streaming_dedup_against_
    history`` keyed on doc_id gives incremental exact dedup for free).
    Batch and streaming ingestion key IDENTICALLY, which is what makes
    the history-backed dedup correct across the batch/stream boundary.

    File-source semantics apply: files must land atomically (write to
    a temp name, rename in), and at 100 TB the listing cost says use
    fewer, bigger files per trigger (or a notification-based source)
    — the same trade documented on ``stream_events``."""
    from ..sources.io import text_corpus_rows

    return text_corpus_rows(spark.readStream.text(path), "stream")
