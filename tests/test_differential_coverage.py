"""Differential-coverage audit (r10, carried from the r8 verdict #4).

Every real cross-engine bug this repo has found — the _det_avg
4-decimal tie (r8), the 2^53 integral-div headroom (r9), the 57/800
ROUND divergence (r9) — came from RANDOM-CORPUS DIFFERENTIALS: running
the oracle SQL (the exact string or its generator) against DuckDB on
hypothesis-generated inputs and comparing with the Spark operator. The
driver only ever sees one fixture corpus, so generator/operator drift
on shapes the fixture lacks is visible ONLY to this machinery. This
audit makes its coverage a checked invariant:

- A key counts as COVERED when a test file references its oracle
  string (``oracle_sql()["q_x"]``) or its generator function by name.
- Every other key must carry an explicit exemption with a reason.
- A key that is both covered and exempted fails the audit (stale
  exemption — delete it so the ratchet only tightens).
- A new oracle key that is neither covered nor exempted fails the
  audit (classify it when you add it).
"""

from __future__ import annotations

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Exemptions, grouped by reason. Shrink these lists by adding inline
# differentials (tests that execute the key's oracle string / generator
# against DuckDB on random frames); never grow a list without a reason
# that names what ALREADY pins the key's semantics.

_STATIC_CONFIG = {
    # (r10 late: ALL 17 static-config keys moved to covered —
    # tests/test_config_differentials.py drives the exact driver
    # callables over random frames, including shapes the fixture never
    # shows: NULL shipdates through the soft-delete predicate,
    # boundary-straddling sources through the anchored regex,
    # leading/trailing/multiple-'#' names through the scalar kernel,
    # and — since q_catalog_scan's output is schema-derived — random
    # SCHEMAS through columns_catalog vs INFORMATION_SCHEMA. The
    # category stays as the landing spot for future config keys.)
}

_RELATIONAL_SHAPE = {
    # (r10 late: ALL 25 TPC-H/relational keys covered —
    # tests/test_tpch_differentials.py drives the exact driver
    # callables over random TPC-H frames with exact-in-float64 money
    # values; first run immediately found an engine divergence the
    # fixture can't reach: ROLLUP/CUBE on EMPTY input emits the
    # grand-total row in DuckDB but zero rows in Spark — pinned in that
    # file's comment. q_group_quantiles converted last via the GRID
    # argument: quantile positions are tenths over integer inputs, so
    # the exact value can never sit on a ROUND-4 half-boundary and the
    # lerp-vs-midpoint ulp noise is five orders below the 5e-5 gap.)
}

_EVENTS_FRAME_GAP = {
    # (r10 late: 24 of 25 events/orders keys now covered by
    # tests/test_events_differentials.py — q_mad_outliers converted
    # last on GRID values: integer-valued doubles make median/adev/MAD
    # land on the half/quarter grid, binary-exact in both engines and
    # never on a ROUND-4 half-boundary.) The one that stays out,
    # deliberately:
    # - q_approx_distinct: the HLL envelope key — exact facts hash, the
    #   sketch estimate is rows-only by design.
    "q_approx_distinct",
}

_STREAMING_WRAPPER = {
    # (r10 late: both wrappers moved to covered — staged-drain
    # differentials in test_llm_ops_properties.py. All EIGHT q_stream_*
    # keys now carry random-stream replays.)
}

_TEXT_KERNEL_PINNED = {
    # (r10 late batch: ALL 20 documents-frame text-kernel keys moved to
    # covered — inline differentials in test_llm_ops_properties.py run
    # each driver operator call against its live oracle string on
    # random corpora. The category stays as the landing spot for future
    # text keys awaiting a differential.)
}

_EMBEDDING_FRAME_GAP = {
    # (r10 late: 7 keys moved to covered via
    # test_embedding_differentials.py + the frame differentials.)
    # Remaining one (q_embedding_near_dup and q_ivf_topk left this list
    # in late r10: MARGIN-GATED differentials in
    # test_embedding_differentials.py discard hypothesis examples
    # within 1e-6 of a threshold/ROUND boundary or of a best-vs-second
    # argmax tie — nine orders above float expression-form noise — so
    # both float surfaces became exact-checkable on random frames):
    # - q_semantic_dedup_ivf: the dual-branch envelope (exact facts +
    #   integer agreement flag) — on tiny random frames the lossy
    #   branch's agreement genuinely varies, which is the envelope
    #   working as designed, not a replayable equality.
    "q_semantic_dedup_ivf",
}

EXEMPT = {}
for _group in (
    _STATIC_CONFIG,
    _RELATIONAL_SHAPE,
    _EVENTS_FRAME_GAP,
    _STREAMING_WRAPPER,
    _TEXT_KERNEL_PINNED,
    _EMBEDDING_FRAME_GAP,
):
    for _k in _group:
        assert _k not in EXEMPT, f"duplicate exemption {_k}"
        EXEMPT[_k] = True


def _generator_key_map(entry_src: str) -> dict[str, set[str]]:
    """generator function name -> oracle keys it produces, from both
    direct dict entries and _with_shared_oracles assignments."""
    gen2keys: dict[str, set[str]] = {}
    for pat in (
        r'"(q_\w+)":\s*(_\w+_oracle_sql)\(',
        r'\[\s*"(q_\w+)"\s*\]\s*=\s*(_\w+_oracle_sql)\(',
    ):
        for k, g in re.findall(pat, entry_src):
            gen2keys.setdefault(g, set()).add(k)
    return gen2keys


def _covered_keys() -> set[str]:
    entry_src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    gen2keys = _generator_key_map(entry_src)
    test_src = ""
    for f in glob.glob(os.path.join(REPO, "tests", "*.py")):
        if os.path.basename(f) == os.path.basename(__file__):
            continue
        test_src += open(f).read()
    # two greppable access conventions: direct subscript and the
    # property files' _entry_oracle("q_x") helper
    covered = set(re.findall(r'oracle_sql\(\)\[\s*"(q_\w+)"\s*\]', test_src))
    covered |= set(re.findall(r'_entry_oracle\(\s*"(q_\w+)"\s*\)', test_src))
    for g, keys in gen2keys.items():
        if g in test_src:
            covered |= keys
    return covered


def test_every_oracle_key_is_differential_covered_or_exempt():
    import __spark_entry__ as entry

    all_keys = set(entry.oracle_sql())
    covered = _covered_keys() & all_keys
    exempt = set(EXEMPT)

    phantom = exempt - all_keys
    assert not phantom, f"exemptions for nonexistent keys: {sorted(phantom)}"

    stale = covered & exempt
    assert not stale, (
        "stale exemptions — these keys now have differentials, delete "
        f"them from EXEMPT so the ratchet tightens: {sorted(stale)}"
    )

    unclassified = all_keys - covered - exempt
    assert not unclassified, (
        "oracle keys with neither a random-corpus differential nor a "
        f"documented exemption: {sorted(unclassified)} — add an inline "
        "differential (preferred) or classify in EXEMPT with a reason"
    )


def test_coverage_ratchet_floor():
    """The covered set must not shrink: the r10 TPC-H harness raised
    the floor from 110 to 134 covered keys of 157, the margin-gated
    GEMM/argmax differentials to 136, the grid-argument percentile
    differentials to 138, and the config-key random-frame/random-schema
    harness to 155. Deleting a differential (or renaming a generator
    without updating tests) trips this before the coverage silently
    erodes."""
    import __spark_entry__ as entry

    covered = _covered_keys() & set(entry.oracle_sql())
    assert len(covered) >= 155, sorted(covered)
