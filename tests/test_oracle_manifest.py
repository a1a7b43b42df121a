"""Oracle-string manifest pin (r8 verdict #2).

The r5 rule — a key whose oracle string changes must re-earn its green
CORRECTNESS row inside the driver's 50-slot window — was enforced by
hand-audit until r9. This test makes it mechanical: every oracle_sql()
string is sha256-pinned in ORACLE_MANIFEST.json, and a BELOW-window key
whose current string differs from the manifest fails loudly (its banked
row was earned under a different oracle). In-window keys may differ
freely (they re-earn rows this round); regenerate the manifest with
``python tools/oracle_manifest.py --update`` (a deliberate act — the
tool prints the diff it records) before round end.
"""

import json
import os
import sys

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import oracle_manifest  # noqa: E402

WINDOW = 50


def test_manifest_exists_and_covers_every_oracle_key():
    assert os.path.exists(oracle_manifest.MANIFEST), (
        "ORACLE_MANIFEST.json missing — run "
        "`python tools/oracle_manifest.py --update`"
    )
    recorded = oracle_manifest.load_manifest()
    missing = sorted(set(entry.oracle_sql()) - set(recorded))
    assert not missing, (
        f"oracle keys not pinned in the manifest: {missing} — "
        "`python tools/oracle_manifest.py --update` (review the diff)"
    )


def test_below_window_oracle_strings_match_manifest():
    """A below-window key with a drifted oracle string holds a STALE
    banked row the driver can't see — the exact class the r8 tie fix
    exercised by hand. Move the key inside the window or revert."""
    cur = oracle_manifest.current_hashes()
    rec = oracle_manifest.load_manifest()
    window = set(list(entry.queries())[:WINDOW])
    drifted = sorted(
        k
        for k in cur
        if k in rec and cur[k] != rec[k] and k not in window
    )
    assert not drifted, (
        f"below-window keys with changed oracle strings: {drifted} — "
        "their banked CORRECTNESS rows are stale (r5 rule). Move them "
        "into the first 50 queries() slots to re-earn, or revert the "
        "generator edit; then regenerate the manifest."
    )


def test_manifest_has_no_phantom_keys():
    """Keys removed from oracle_sql() must leave the manifest too —
    otherwise the manifest rots into recording oracles that no longer
    exist (and a future re-add would silently 'match' an old string)."""
    rec = oracle_manifest.load_manifest()
    phantom = sorted(set(rec) - set(entry.oracle_sql()))
    assert not phantom, (
        f"manifest records keys that no longer exist: {phantom} — "
        "`python tools/oracle_manifest.py --update`"
    )


def test_manifest_json_is_normalized():
    """The checked-in file must be exactly what --update writes (sorted
    keys, indent=1) so diffs in review are content diffs, not
    formatting noise."""
    raw = json.load(open(oracle_manifest.MANIFEST))
    assert list(raw["oracles"]) == sorted(raw["oracles"])
    assert set(raw) == {"_note", "oracles"}
