"""Structured Streaming tests: finite availableNow runs into memory sinks,
verified against the batch twins (batch/stream parity is the oracle)."""

import os
import shutil

import pytest

from pyspark.sql import functions as F

from dbt_schema_builder_spark.operators import timeseries
from dbt_schema_builder_spark.streaming import (
    run_stream_to_memory,
    stream_events,
    streaming_dedup,
    streaming_session_window,
    streaming_tumbling_counts,
    streaming_user_state,
)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    """File-source streams want a directory; stage the events parquet."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def test_streaming_tumbling_matches_batch(spark, tables, events_dir):
    stream = streaming_tumbling_counts(stream_events(spark, events_dir))
    got = run_stream_to_memory(stream, "t_tumbling", "append")
    batch = timeseries.tumbling_window_stats(tables["events"]).select(
        "bucket", "n_events", "sum_value"
    )
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    # append mode withholds windows the final watermark hasn't passed:
    # emitted set == batch set minus windows still open at max_ts - 10min
    assert g <= b
    max_ts = tables["events"].agg(F.max("ts")).collect()[0][0]
    import datetime

    wm = max_ts - datetime.timedelta(minutes=10)
    withheld = b - g
    assert all(bucket + datetime.timedelta(hours=1) > wm for bucket, _, _ in withheld)
    assert len(withheld) <= 2


def test_streaming_session_matches_batch_sessionize(spark, tables, events_dir):
    stream = streaming_session_window(stream_events(spark, events_dir))
    got = run_stream_to_memory(stream, "t_session", "append")
    batch = timeseries.sessionize(tables["events"], gap_minutes=30)
    # session_window end = last_ts + gap, so compare (user, start, n);
    # append mode withholds sessions the final watermark hasn't closed
    g = {(r.user_id, r.session_start, r.n_events) for r in got.collect()}
    b = {(r.user_id, r.session_start, r.n_events) for r in batch.collect()}
    assert g <= b
    import datetime

    max_ts = tables["events"].agg(F.max("ts")).collect()[0][0]
    wm = max_ts - datetime.timedelta(hours=1)
    # every withheld session must still be open (started near the end)
    assert all(start + datetime.timedelta(minutes=30) > wm - datetime.timedelta(hours=24)
               for _, start, _ in (b - g))
    assert len(b - g) < len(b) * 0.05  # at most a sliver withheld


def test_streaming_dedup_bounded_state(spark, events_dir):
    stream = streaming_dedup(stream_events(spark, events_dir))
    got = run_stream_to_memory(stream, "t_dedup", "append")
    n_src = spark.read.parquet(os.path.join(events_dir, "events.parquet")).count()
    n_distinct = (
        spark.read.parquet(os.path.join(events_dir, "events.parquet"))
        .select("event_id")
        .distinct()
        .count()
    )
    assert got.count() == n_distinct <= n_src


def test_file_sink_checkpoint_resumes_incrementally(spark, sf_dir, tmp_path):
    """Restart-safety: after a second source file lands, re-running the
    same checkpointed query processes only the delta (no duplicates)."""
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    t = pq.read_table(f"{sf_dir}/events.parquet")
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), src / "part1.parquet")

    from dbt_schema_builder_spark.streaming import (
        run_stream_to_files,
        stream_events,
    )

    def run():
        df = stream_events(spark, str(src)).select("event_id", "user_id")
        run_stream_to_files(df, out, ckpt)

    run()
    n1 = spark.read.parquet(out).count()
    assert n1 == half

    pq.write_table(t.slice(half), src / "part2.parquet")
    run()  # resumes from checkpoint, processes only part2
    result = spark.read.parquet(out)
    assert result.count() == t.num_rows
    # exactly-once: no duplicated event_ids across the two runs
    assert result.select("event_id").distinct().count() == t.num_rows


def test_stream_stream_join_matches_batch_range_join(
    spark, tables, events_dir
):
    from dbt_schema_builder_spark.operators import temporal
    from dbt_schema_builder_spark.streaming import (
        streaming_click_purchase_join,
    )

    stream = streaming_click_purchase_join(stream_events(spark, events_dir))
    got = run_stream_to_memory(stream, "t_ssjoin", "append")

    events = tables["events"]
    clicks = events.where("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("cu"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.where("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("pu"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = temporal.range_join(
        clicks, purchases, "cu", "pu", "click_ts", "purchase_ts", 3600
    ).select("click_id", "purchase_id")
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    # inner stream-stream join with availableNow emits all joinable pairs
    assert g == b


def test_streaming_user_state(spark, tables, events_dir):
    stream = streaming_user_state(stream_events(spark, events_dir))
    got = run_stream_to_memory(stream, "t_state", "update")
    # with availableNow + update mode the last emit per user carries the
    # final running totals; compare against the batch aggregate
    latest = (
        got.groupBy("user_id").agg(F.max("n_events").alias("n_events")).collect()
    )
    batch = {
        r.user_id: r.n
        for r in tables["events"].groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r.user_id: r.n_events for r in latest} == batch


def test_stream_static_enrich_matches_batch_join(spark, tables, events_dir):
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_static_enrich,
    )

    dim = tables["customer"].select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    src = stream_events(spark, events_dir).select(
        "event_id", "user_id", "event_type"
    )
    streamed = run_stream_to_memory(
        streaming_static_enrich(src, dim, on="user_id"),
        "t_enrich_sink", "append",
    )
    from dbt_schema_builder_spark.session import read_table
    batch = (
        tables["events"].select("event_id", "user_id", "event_type")
        .join(F.broadcast(dim), "user_id", "left")
    )
    got = {tuple(r) for r in streamed.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stream_dedup_against_history_matches_batch_anti(
    spark, tables, events_dir
):
    """The streaming incremental dedup (stream-static left_anti) emits
    exactly the batch anti-join's rows — stateless, no watermark."""
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_dedup_against_history,
    )

    seen = (
        tables["events"]
        .where("event_id % 3 = 0")
        .select("event_id")
        .distinct()
    )
    src = stream_events(spark, events_dir).select(
        "event_id", "user_id", "event_type"
    )
    streamed = run_stream_to_memory(
        streaming_dedup_against_history(src, seen, on="event_id"),
        "t_dedup_hist_sink",
        "append",
    )
    batch = (
        tables["events"]
        .select("event_id", "user_id", "event_type")
        .join(F.broadcast(seen), "event_id", "left_anti")
    )
    got = {tuple(r) for r in streamed.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) > 0


@pytest.fixture(scope="module")
def events_dir_multifile(sf_dir, tmp_path_factory, spark):
    """Four ts-range files so a maxFilesPerTrigger drain is genuinely
    multi-micro-batch (the single-file fixture is always one batch)."""
    from dbt_schema_builder_spark.session import read_table

    d = str(tmp_path_factory.mktemp("events_stream_parts"))
    read_table(spark, f"{sf_dir}/events.parquet").repartitionByRange(
        4, "ts"
    ).write.mode("overwrite").parquet(d)
    return d


def test_streaming_tumbling_processing_time_multibatch(
    spark, tables, events_dir_multifile
):
    """Multi-micro-batch state eviction, which availableNow's single-batch
    intake can't exercise: drain 4 ts-range files 2-per-trigger under a
    ProcessingTime trigger. Per-batch watermark advancement may DROP
    late-listed rows (file listing order is unguaranteed) but must never
    invent or double-count a window — so the emitted set is an
    eventual SUBSET of the deterministic availableNow set, with equality
    on every window both runs emit."""
    stream = streaming_tumbling_counts(
        stream_events(spark, events_dir_multifile, max_files_per_trigger=2)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_tumbling_pt")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.bucket, r.n_events, r.sum_value)
        for r in spark.table("t_tumbling_pt").collect()
    }
    oracle_run = run_stream_to_memory(
        streaming_tumbling_counts(stream_events(spark, events_dir_multifile)),
        "t_tumbling_pt_oracle",
        "append",
    )
    oracle = {
        (r.bucket, r.n_events, r.sum_value) for r in oracle_run.collect()
    }
    # a window the PT run emitted must exist with identical counts in the
    # availableNow set (state closed once, correctly, per window)...
    assert got <= oracle
    # ...and the drain made real progress (not everything dropped as late)
    assert len(got) >= len(oracle) // 2 > 0


def test_streaming_session_processing_time_multibatch(
    spark, events_dir_multifile
):
    """r5 (verdict ask #4): multi-micro-batch session eviction. Sessions
    closed mid-drain cannot lose later events (ts-range files: anything
    past the per-batch watermark is >= 1h+gap away from any closable
    session), so every emitted session must appear with IDENTICAL
    bounds+count in the availableNow oracle set; late-file drops may
    only shrink the set."""
    stream = streaming_session_window(
        stream_events(spark, events_dir_multifile, max_files_per_trigger=2)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_session_pt")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("t_session_pt").collect()
    }
    oracle_run = run_stream_to_memory(
        streaming_session_window(stream_events(spark, events_dir_multifile)),
        "t_session_pt_oracle",
        "append",
    )
    oracle = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in oracle_run.collect()
    }
    assert got <= oracle
    assert len(got) >= len(oracle) // 2 > 0


def test_streaming_user_state_processing_time_multibatch(
    spark, tables, events_dir_multifile
):
    """r5 (verdict ask #4): the applyInPandasWithState path across a
    genuine multi-batch drain. No watermark => no late drops, so the
    final per-user state must EQUAL the batch aggregate exactly
    (integer micro-unit sums are batch-order independent); and update
    mode re-emits a user per batch touching them, so the sink holding
    more rows than users proves the drain really was multi-batch with
    state carried across batches."""
    stream = streaming_user_state(
        stream_events(spark, events_dir_multifile, max_files_per_trigger=1)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_user_state_pt")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("t_user_state_pt").collect()
    final = {}
    for r in rows:
        cur = final.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            final[r.user_id] = (r.n_events, r.total_value, r.last_ts)
    batch = {
        r.user_id: (r.n, r.tv, r.lt)
        for r in tables["events"]
        .withColumn("vm", F.round(F.col("value") * 1e6).cast("long"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("vm") / 1e6).alias("tv"),
            F.max("ts").alias("lt"),
        )
        .collect()
    }
    assert final == batch
    # ts-range split puts most users in several files => several updates
    assert len(rows) > len(final)


def test_streaming_funnel_processing_time_multibatch(
    spark, tables, events_dir_multifile
):
    """r5 (verdict ask #4): the streaming funnel's stage is monotone in
    the event set (more events can only extend the greedy chain), and
    with no watermark nothing is dropped — so after a multi-batch drain
    the max emitted stage per user must reproduce the batch funnel
    exactly, with intermediate emissions proving cross-batch state."""
    from dbt_schema_builder_spark.streaming import streaming_funnel

    stream = streaming_funnel(
        stream_events(spark, events_dir_multifile, max_files_per_trigger=1)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_funnel_pt")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("t_funnel_pt").collect()
    furthest = {}
    for r in rows:
        furthest[r.user_id] = max(furthest.get(r.user_id, 0), r.stage)
    batch = {
        r["stage"]: r["n_users"]
        for r in timeseries.funnel(tables["events"]).collect()
    }
    for i in (1, 2, 3):
        assert batch[i] == sum(1 for s in furthest.values() if s >= i)
    assert len(rows) > len(furthest)  # genuinely multi-batch updates


def test_streaming_funnel_matches_batch_funnel(spark, tables, events_dir):
    """Single-batch availableNow run: the streaming per-user furthest
    stage must reproduce timeseries.funnel's aggregated stage counts
    exactly (n_users at stage i == users with furthest >= i)."""
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_funnel,
    )
    from dbt_schema_builder_spark.operators.timeseries import funnel

    stream = streaming_funnel(stream_events(spark, events_dir))
    got = run_stream_to_memory(stream, "t_funnel", "update")
    # availableNow single batch -> one emit per user; take max stage to
    # be robust to re-runs of the memory sink
    furthest = {
        r["user_id"]: r["stage"]
        for r in got.groupBy("user_id")
        .agg(F.max("stage").alias("stage"))
        .collect()
    }
    batch = {
        r["stage"]: r["n_users"]
        for r in funnel(tables["events"]).collect()
    }
    for i in (1, 2, 3):
        assert batch[i] == sum(1 for s in furthest.values() if s >= i)


def test_streaming_funnel_late_view_requalifies(spark, tmp_path):
    """Cross-batch retroactivity: a click arrives in batch 1 with no
    view; the view arrives EARLIER-timestamped in batch 2 — the state
    machine must re-derive the chain and report stage 2."""
    import datetime

    from dbt_schema_builder_spark.streaming import streaming_funnel
    from dbt_schema_builder_spark.streaming.windows import EVENTS_SCHEMA

    d = str(tmp_path / "late")
    base = datetime.datetime(2024, 1, 1)

    def write(name, rows):
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    write("b1", [(1, base + datetime.timedelta(minutes=5), 1, "click", 0.0, "{}")])
    ckpt = str(tmp_path / "ckpt")  # SHARED: run 2 resumes run 1's state

    def run(name):
        # memory sink refuses checkpoint recovery; foreachBatch supports
        # stateful update mode AND restart-from-checkpoint (local mode:
        # the closure runs in the driver process, the list is shared)
        emitted: list = []
        raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(d)
        q = (
            streaming_funnel(
                raw.withColumn("ts", F.col("ts").cast("timestamp"))
            )
            .writeStream.foreachBatch(
                lambda df, _id: emitted.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["user_id"]: r["stage"] for r in emitted}

    assert run("t_late_funnel") == {1: 0}  # click alone converts nothing
    # batch 2: the earlier-timestamped view arrives late; the restarted
    # query reads ONLY the new file (checkpointed offsets) and must
    # re-derive the chain from restored state, not from re-reading b1
    write("b2", [(2, base, 1, "view", 0.0, "{}")])
    assert run("t_late_funnel2") == {1: 2}  # view@0 then click@5


def test_stream_text_corpus_keys_match_batch_ingest(spark, tmp_path):
    """r6: streaming text ingestion must key IDENTICALLY to the batch
    reader (content-addressed xxhash64) — that identity is what makes
    history-backed dedup correct across the batch/stream boundary —
    and compose with streaming_dedup_against_history: a line already
    in the batch-ingested history must not be re-emitted."""
    from dbt_schema_builder_spark.sources.io import read_text_corpus
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_text_corpus,
        streaming_dedup_against_history,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "old.txt").write_text("seen before line\nfresh line one\n")
    # batch history holds one of the incoming lines
    hist_dir = tmp_path / "hist"
    hist_dir.mkdir()
    (hist_dir / "h.txt").write_text("seen before line\n")
    hist = read_text_corpus(spark, str(hist_dir)).select("doc_id")
    src = stream_text_corpus(spark, str(drop))
    out = run_stream_to_memory(
        streaming_dedup_against_history(src, hist, on="doc_id"),
        "text_corpus_dedup_sink",
    )
    texts = {r.text for r in out.collect()}
    assert texts == {"fresh line one"}


# ---------------------------------------------------------------------------
# emit-on-timer (r7: the emission-volume lever, SCALE.md r6's named gap)
# ---------------------------------------------------------------------------


def _per_user_file_touches(spark, events_dir_multifile, where=None):
    """How many (user, file) pairs the staged drain contains = the exact
    update-mode emission count for a 1-file-per-trigger drain."""
    from dbt_schema_builder_spark.sources.io import list_data_files

    touches = 0
    for uri, _sz in list_data_files(spark, events_dir_multifile):
        df = spark.read.parquet(uri)
        if where is not None:
            df = df.where(where)
        touches += df.select("user_id").distinct().count()
    return touches


def test_user_state_emit_on_timer_collapses_volume(
    spark, tables, events_dir_multifile, tmp_path
):
    """emit='timer': nothing per update; one row per user per quiet
    period, running totals kept in state. After the drain goes quiet
    every user's timer fires once, so the upsert sink must converge to
    EXACTLY the batch aggregate — and the emission log must be smaller
    than update mode's users x touching-files volume (the lever this
    mode exists for)."""
    from dbt_schema_builder_spark.streaming import (
        run_stream_upsert_to_memory,
    )

    batch = {
        r.user_id: (r.n, round(r.tv, 6))
        for r in tables["events"]
        .withColumn("vm", F.round(F.col("value") * 1e6).cast("long"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), (F.sum("vm") / 1e6).alias("tv"))
        .collect()
    }

    stream = streaming_user_state(
        stream_events(spark, events_dir_multifile, max_files_per_trigger=1),
        timeout_minutes=0.02,  # 1.2 s quiet period
        emit="timer",
    )

    def done(upserts, log):
        return len(upserts) == len(batch) and all(
            (r.n_events, round(r.total_value, 6)) == batch[u]
            for (u,), r in upserts.items()
        )

    upserts, log = run_stream_upsert_to_memory(
        stream,
        ["user_id"],
        stop_when=done,
        timeout_sec=120.0,
        checkpoint_dir=str(tmp_path / "ckpt_user_timer"),
    )
    got = {
        u: (r.n_events, round(r.total_value, 6))
        for (u,), r in upserts.items()
    }
    assert got == batch
    update_mode_volume = _per_user_file_touches(
        spark, events_dir_multifile
    )
    assert len(batch) <= len(log) < update_mode_volume, (
        f"timer emissions {len(log)} should sit in "
        f"[{len(batch)}, {update_mode_volume})"
    )


def test_funnel_emit_on_timer_matches_batch_chain(
    spark, tables, events_dir_multifile, tmp_path
):
    """Funnel emit='timer': state is kept across flushes (a chain needs
    full history), so the final upsert per user equals the batch
    funnel's furthest stage; emission volume again collapses below the
    update-mode touches."""
    from dbt_schema_builder_spark.streaming import (
        run_stream_upsert_to_memory,
        streaming_funnel,
    )

    batch_counts = {
        r["stage"]: r["n_users"]
        for r in timeseries.funnel(tables["events"]).collect()
    }
    n_funnel_users = (
        tables["events"]
        .where(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id")
        .distinct()
        .count()
    )

    stream = streaming_funnel(
        stream_events(spark, events_dir_multifile, max_files_per_trigger=1),
        timeout_minutes=0.02,
        emit="timer",
    )

    def done(upserts, log):
        if len(upserts) < n_funnel_users:
            return False
        stages = [r.stage for r in upserts.values()]
        return all(
            batch_counts[i] == sum(1 for s in stages if s >= i)
            for i in (1, 2, 3)
        )

    upserts, log = run_stream_upsert_to_memory(
        stream,
        ["user_id"],
        stop_when=done,
        timeout_sec=120.0,
        checkpoint_dir=str(tmp_path / "ckpt_funnel_timer"),
    )
    stages = [r.stage for r in upserts.values()]
    for i in (1, 2, 3):
        assert batch_counts[i] == sum(1 for s in stages if s >= i)
    update_mode_volume = _per_user_file_touches(
        spark,
        events_dir_multifile,
        where=F.col("event_type").isin("view", "click", "purchase"),
    )
    assert n_funnel_users <= len(log) < update_mode_volume


def test_emit_timer_parameter_validation(spark, tables):
    from dbt_schema_builder_spark.streaming import streaming_funnel

    ev = tables["events"]
    with pytest.raises(ValueError, match="timeout_minutes"):
        streaming_user_state(ev, emit="timer")
    with pytest.raises(ValueError, match="emit must be"):
        streaming_user_state(ev, emit="nope")
    with pytest.raises(ValueError, match="timeout_minutes"):
        streaming_funnel(ev, emit="timer")
    with pytest.raises(ValueError, match="emit must be"):
        streaming_funnel(ev, emit="nope")
    # r7 review: unlike streaming_user_state (where updates+timeout
    # means state expiry), a funnel cannot expire state — the kwarg
    # must be rejected, not silently swallowed
    with pytest.raises(ValueError, match="cannot"):
        streaming_funnel(ev, timeout_minutes=30.0)
