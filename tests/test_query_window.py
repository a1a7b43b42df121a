"""Audit of the driver's 50-key verification window.

The driver records CORRECTNESS rows for only the first 50 queries()
keys per round, so declaration order is load-bearing: a query rotated
past position 50 keeps whatever row it earned in an earlier round, and
a query that never sat inside the window has no row at all. This pins
the window arithmetic so a refactor can't silently rotate an
unverified query out of sight.
"""

import glob
import json
import os

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WINDOW = 50


def _recorded_keys():
    keys = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        keys.update(json.load(open(path)).keys())
    return keys


def test_every_rotated_out_query_has_a_recorded_row():
    qs = list(entry.queries())
    recorded = _recorded_keys()
    missing = [k for k in qs[WINDOW:] if k not in recorded]
    assert not missing, (
        f"queries past position {WINDOW} with no CORRECTNESS row ever: "
        f"{missing} — move them inside the window"
    )


def test_oracle_keys_are_query_keys():
    qs = set(entry.queries())
    stray = [k for k in entry.oracle_sql() if k not in qs]
    assert not stray, f"oracle_sql keys missing from queries(): {stray}"


def test_oracle_backed_queries_without_green_row_sit_inside_window():
    """Any oracle-backed query that has never produced a green row must
    be inside the verification window, or it can never turn green."""
    qs = list(entry.queries())
    oracles = set(entry.oracle_sql())
    green = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        for k, v in json.load(open(path)).items():
            if (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
            ):
                green.add(k)
    out_of_window = [
        k for k in qs[WINDOW:] if k in oracles and k not in green
    ]
    assert not out_of_window, (
        f"oracle-backed, never-green queries outside the window: "
        f"{out_of_window}"
    )


def test_bench_names_are_query_keys():
    """Bench-subset membership pin (r5 verdict task #6): bench is the
    headline SUBSET of queries(), and that membership was previously
    unpinned — a renamed key would silently drop out of benching (and
    out of every BASELINE.md comparison). Assert every benched name
    and every frozen comparable-subtotal name resolves to a real
    queries() key."""
    import bench

    qs = set(entry.queries())
    stray = [n for n in bench.HEADLINE if n not in qs]
    assert not stray, f"bench.HEADLINE names not in queries(): {stray}"
    stray_cmp = [n for n in bench.R2_COMPARABLE if n not in bench.HEADLINE]
    assert not stray_cmp, (
        f"comparable-subtotal names missing from HEADLINE: {stray_cmp}"
    )
    assert list(bench.R1_COMPARABLE) == list(bench.R2_COMPARABLE[:23])
