#!/usr/bin/env python
"""Oracle-string manifest: sha256 of every ``oracle_sql()`` string.

Why this exists (r8 verdict #2): the driver records CORRECTNESS rows for
only the first 50 ``queries()`` keys per round, and the repo's own r5
rule says a key whose oracle STRING changes must re-earn its green row
inside that window. The r8 tie fix changed six oracle strings, three of
them belonging to BELOW-window keys — and detecting that took a hand
audit. Nothing mechanical pinned oracle strings, so a generator edit
that silently changed a below-window key's oracle would leave a stale
banked row no gate could catch until the key rotated back in. The
manifest + tests/test_oracle_manifest.py close that class permanently:

- ``ORACLE_MANIFEST.json`` records ``{key: sha256(oracle_sql()[key])}``
  for every key, plus the tool's own provenance note.
- The test fails when a key OUTSIDE the current 50-slot window has a
  string that differs from the manifest (its banked row is stale), or
  when any key is missing from the manifest entirely.
- Keys INSIDE the window may differ freely — they re-earn rows this
  round by construction — but the manifest must then be regenerated
  (``python tools/oracle_manifest.py --update``) before round end so
  the next round starts consistent. Regeneration is deliberate: the
  tool always PRINTS the diff it is about to record.

Run modes:
    python tools/oracle_manifest.py            # diff only, exit 1 if drift
    python tools/oracle_manifest.py --update   # print diff, rewrite manifest
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MANIFEST = os.path.join(REPO, "ORACLE_MANIFEST.json")
WINDOW = 50


def current_hashes() -> dict[str, str]:
    import __spark_entry__ as entry

    return {
        k: hashlib.sha256(v.encode("utf-8")).hexdigest()
        for k, v in entry.oracle_sql().items()
    }


def load_manifest() -> dict[str, str]:
    if not os.path.exists(MANIFEST):
        return {}
    return json.load(open(MANIFEST))["oracles"]


def diff(cur: dict[str, str], rec: dict[str, str]):
    import __spark_entry__ as entry

    window = set(list(entry.queries())[:WINDOW])
    added = sorted(k for k in cur if k not in rec)
    removed = sorted(k for k in rec if k not in cur)
    changed = sorted(k for k in cur if k in rec and cur[k] != rec[k])
    return {
        "added": added,
        "removed": removed,
        "changed_in_window": [k for k in changed if k in window],
        "changed_below_window": [k for k in changed if k not in window],
    }


def main() -> int:
    cur = current_hashes()
    rec = load_manifest()
    d = diff(cur, rec)
    for k, v in d.items():
        if v:
            print(f"{k}: {v}")
    if "--update" in sys.argv:
        json.dump(
            {
                "_note": (
                    "sha256 of every oracle_sql() string. Regenerate ONLY "
                    "via tools/oracle_manifest.py --update (it prints the "
                    "diff); a below-window key whose hash drifts from this "
                    "manifest has a STALE banked CORRECTNESS row (r5 rule: "
                    "changed oracles re-earn rows inside the 50-slot "
                    "window). tests/test_oracle_manifest.py enforces."
                ),
                "oracles": dict(sorted(cur.items())),
            },
            open(MANIFEST, "w"),
            indent=1,
        )
        print(f"manifest rewritten: {len(cur)} keys")
        return 0
    drift = d["changed_below_window"] or d["removed"]
    if not rec:
        print("no manifest recorded — run with --update")
        return 1
    if drift:
        print(
            "DRIFT: below-window oracle strings changed or keys removed — "
            "either move the keys into the window (they must re-earn "
            "rows) or revert the generator edit; then --update"
        )
        return 1
    if d["changed_in_window"] or d["added"]:
        # r9 ADVICE: printing "consistent" here let a pending --update
        # survive round end (q_heavy_hitters). In-window changes are
        # legal but the manifest is stale until regenerated.
        print(
            "in-window changes pending — run --update before round end "
            f"({len(d['changed_in_window'])} changed, {len(d['added'])} added)"
        )
        return 2
    print(f"manifest consistent: {len(cur)} keys")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
