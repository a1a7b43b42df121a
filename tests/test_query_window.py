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
