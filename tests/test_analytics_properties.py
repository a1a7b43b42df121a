"""Property-based tests (hypothesis) for the round-4c analytics
operators: invariants that must hold for arbitrary event streams and
graphs, not just the fixtures. Examples are batched — one DataFrame per
example, one job per assertion set."""

import datetime

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from dbt_schema_builder_spark.operators import graph, temporal, timeseries

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)

_BASE = datetime.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),          # user
        st.integers(min_value=0, max_value=3000),       # minutes offset
        st.sampled_from(["view", "click", "purchase", "error"]),
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, _BASE + datetime.timedelta(minutes=m), u, t, v)
            for i, (u, m, t, v) in enumerate(rows)
        ],
        EV_SCHEMA,
    )


@settings(max_examples=8, deadline=None)
@given(rows=events_strategy)
def test_funnel_stages_are_monotone(spark, rows):
    """Stage counts never increase down the funnel, and stage 1 equals
    the distinct users with that event type."""
    ev = _events(spark, rows)
    out = sorted(
        timeseries.funnel(ev).collect(), key=lambda r: r["stage"]
    )
    counts = [r["n_users"] for r in out]
    assert counts == sorted(counts, reverse=True)
    viewers = (
        ev.where(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .count()
    )
    assert counts[0] == viewers


@settings(max_examples=8, deadline=None)
@given(rows=events_strategy)
def test_interval_coverage_bounds(spark, rows):
    """Covered time is at most n_intervals * duration and at least one
    duration; islands never exceed intervals."""
    ev = _events(spark, rows)
    dur = 5 * 60000
    for r in temporal.interval_coverage(ev, duration_minutes=5).collect():
        assert 1 <= r["n_islands"] <= r["n_intervals"]
        assert dur <= r["covered_ms"] <= r["n_intervals"] * dur


@settings(max_examples=8, deadline=None)
@given(rows=events_strategy)
def test_gapfill_axis_is_dense_and_anchored(spark, rows):
    """Per series: buckets form a contiguous range, first/last buckets
    are observations (never gaps), and LOCF never emits a gap with a
    different sum than its predecessor."""
    ev = _events(spark, rows)
    out = timeseries.gapfill_locf(ev, bucket_minutes=15).collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r["bucket_ms"])
        buckets = [r["bucket_ms"] for r in rs]
        assert buckets == list(
            range(buckets[0], buckets[-1] + 900000, 900000)
        )
        assert rs[0]["is_gap"] == 0 and rs[-1]["is_gap"] == 0
        for prev, cur in zip(rs, rs[1:]):
            if cur["is_gap"]:
                assert cur["locf_sum_micro"] == prev["locf_sum_micro"]


@settings(max_examples=8, deadline=None)
@given(rows=events_strategy)
def test_transition_matrix_rows_sum_consistently(spark, rows):
    """Per from_type: counts sum to the row total implied by the milli
    probabilities (sum of prob_milli within [1000 - n_outgoing, 1000]
    because each floor loses < 1 milli), and every probability is
    positive."""
    ev = _events(spark, rows)
    out = timeseries.transition_matrix(ev).collect()
    by_from = {}
    for r in out:
        assert 0 < r["prob_milli"] <= 1000
        by_from.setdefault(r["from_type"], []).append(r["prob_milli"])
    for probs in by_from.values():
        assert 1000 - len(probs) < sum(probs) <= 1000


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=20,
    )
)
def test_pagerank_mass_is_conserved_up_to_floor_loss(spark, edges):
    """On a bidirected graph, total rank stays within n * floor-loss of
    the initial mass (0.15 + 0.85 = 1 exactly; each node's update can
    lose < 1 micro-unit per contributing edge to the two floors), and
    every rank is at least the teleport floor 150000."""
    df = spark.createDataFrame(list(set(edges)), "src long, dst long")
    bidir = df.unionByName(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    n_nodes = bidir.select("src").distinct().count()
    n_edges = bidir.count()
    out = graph.pagerank(bidir, iterations=3).collect()
    assert len(out) == n_nodes
    total = sum(r["r"] for r in out)
    assert total <= n_nodes * 1_000_000
    # floors lose < 1 unit per edge contribution + 1 per node per round
    assert total >= n_nodes * 1_000_000 - 3 * (n_edges + n_nodes)
    assert all(r["r"] >= 150_000 for r in out)


@settings(max_examples=8, deadline=None)
@given(rows=events_strategy)
def test_sigma_outliers_matches_float_ztest(spark, rows):
    """r5: the integer cross-multiplied inequality must equal the naive
    float z-test on arbitrary values (after milli quantization — the
    operator's declared unit), and flags are invariant to row order."""
    import statistics

    from dbt_schema_builder_spark.operators import profiling

    ev = _events(spark, rows)
    out = profiling.sigma_outliers(ev).collect()
    # take v_milli from the operator itself (re-deriving it with Python
    # round() would disagree with Spark's HALF_UP on exact .5 ties) and
    # replay the inequality in Python BIGINTS — arbitrary precision, so
    # this reference also catches a silent int64 wrap in the Spark
    # expression, and the float z-test equivalence is checked where the
    # float computation is unambiguous

    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(
            (r.event_id, r.v_milli, r.is_outlier)
        )
    for u, triples in by_user.items():
        vs = [x for _, x, _f in triples]
        n, s, ssq = len(vs), sum(vs), sum(x * x for x in vs)
        mu = statistics.fmean(vs)
        var = statistics.pvariance(vs)
        for i, x, flag in triples:
            want = int(n >= 2 and (n * x - s) ** 2 > 9 * (n * ssq - s * s))
            assert flag == want, (u, i, x)
            # the integer form is the float z-test, away from float ties
            lhs, rhs = (x - mu) ** 2, 9 * var
            if var and abs(lhs - rhs) > 1e-6 * rhs:
                assert want == int(lhs > rhs), (u, i, x)


@settings(max_examples=8, deadline=None)
@given(rows=events_strategy)
def test_value_histogram_is_a_partition(spark, rows):
    """r5: bins tile the domain — counts sum to the row count per group,
    every row's value lies within [bin_lo, bin_hi) except the clamped
    top bin, and bins never overlap."""
    from dbt_schema_builder_spark.operators import profiling

    ev = _events(spark, rows)
    hist = profiling.value_histogram(ev).collect()
    per_group_n = {}
    for r in hist:
        per_group_n[r.group_key] = per_group_n.get(r.group_key, 0) + r.n
        assert r.bin_hi - r.bin_lo == 50.0
        assert 0 <= r.bin <= 9
    want = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert per_group_n == want
    # bin identity: every value's computed bin exists in the histogram
    for _u, _m, t, v in rows:
        b = min(int(v // 50.0), 9)
        assert any(r.group_key == t and r.bin == b for r in hist), (t, v)


pairs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(rows=pairs_strategy)
def test_zorder_exact_assignment_invariants(spark, rows):
    """r6: the oracle-replayable z-order assignment must satisfy, for
    ARBITRARY integer data (ties, negatives, skew): cells within
    [0, 2^bits); cell assignment monotone in the value; equal values
    share a cell; and equi-depth — the rows strictly below any
    occupied cell are fewer than cell * ceil(n / 2^bits) would allow
    only if ties force it, expressed exactly as: the cum-count-before
    of a value determines its cell as (cb * B) div n."""
    from collections import Counter

    from dbt_schema_builder_spark.sources.io import zorder_value_exact

    bits = 3
    cells = 2 ** bits
    df = spark.createDataFrame(rows, "a int, b int")
    keyed, zcol = zorder_value_exact(df, ["a", "b"], bits=bits)
    got = keyed.collect()
    assert len(got) == len(rows)
    # replay cell arithmetic per dimension
    n = len(rows)

    def cell_map(vals):
        cnt = Counter(vals)
        out, cb = {}, 0
        for v in sorted(cnt):
            out[v] = (cb * cells) // n
            cb += cnt[v]
        return out

    ca = cell_map([r[0] for r in rows])
    cb_ = cell_map([r[1] for r in rows])
    for r in got:
        c0, c1 = ca[r.a], cb_[r.b]
        assert 0 <= c0 < cells and 0 <= c1 < cells
        z = 0
        for i in range(bits):
            z |= ((c0 >> i) & 1) << (2 * i)
            z |= ((c1 >> i) & 1) << (2 * i + 1)
        assert r[zcol] == z
    # monotone: sorted values get non-decreasing cells
    for m in (ca, cb_):
        ks = sorted(m)
        assert all(m[x] <= m[y] for x, y in zip(ks, ks[1:]))


@settings(max_examples=5, deadline=None)
@given(rows=pairs_strategy)
def test_zorder_layout_report_matches_sql_oracle_on_random_events(
    spark, rows, tmp_path_factory
):
    """r6 differential, end to end THROUGH THE FOOTERS: the
    q_zorder_layout SQL oracle replayed by DuckDB over arbitrary
    (user_id, event_id) tables must equal what pyarrow reads back from
    the files Spark wrote — ties, negatives, skew and near-empty
    buckets included."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _zorder_layout_oracle_sql
    from dbt_schema_builder_spark.sources.io import zorder_layout_report

    df = spark.createDataFrame(
        [(a, b) for a, b in rows], "user_id long, event_id long"
    )
    out = tmp_path_factory.mktemp("zdiff")
    got = {
        tuple(r)
        for r in zorder_layout_report(
            spark, df, ["user_id", "event_id"], str(out),
            bits=3, n_files=4,
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(rows, columns=["user_id", "event_id"]),
    )
    want = {
        tuple(r)
        for r in con.execute(_zorder_layout_oracle_sql(3, 4)).fetchall()
    }
    assert got == want
