"""Degenerate-input probe: drive every batch operator over adversarial
but VALID inputs — empty frames, empty strings, single rows, all-equal
corpora, zero vectors, k > n — and report which ops CRASH with an
engine error (Py4J/Arithmetic/Analysis) rather than returning a frame
or raising a deliberate ValueError. The cosine zero-norm ANSI crash
(staged r11) and the r8 nb_prior empty-train crash are both from this
class; this sweeps the whole surface instead of finding them one
harness at a time.

Run: python tools/degenerate_probe.py  (prints one line per finding)

Since r11 this probe is a ROUND-END GATE (rc != 0 on any engine-crash
finding; wrapped for pytest in tests/test_degenerate_gate.py): the r10
staged zero-division batch — the cosine zero-norm family and
weighted_sample's ln(u)/0 — landed in r11 (guarded cosine everywhere,
WHERE weight > 0 on operator + oracle), which emptied the findings
list. A new operator with an unguarded degenerate shape now fails the
round the same way scale_stress catches magnitude bugs. Everything the
r10 sweep found earlier (LSH dim-mismatch corruption, silent strategy
fall-through, fertility zero-word div, NoneType crashes on NULL
embeddings/labels in the Arrow kernels and driver-side sampling,
waterfill/sampleBy NULL group keys) was fixed the session it was
found, with clear ValueErrors or SQL-NULL alignment.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_schema_builder_spark.session import get_spark  # noqa: E402

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"
EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

import datetime  # noqa: E402

_TS = datetime.datetime(2024, 1, 1)


def doc_frames(spark):
    mk = lambda rows: spark.createDataFrame(rows, DOC_SCHEMA)  # noqa: E731
    return {
        "empty": mk([]),
        "one_row": mk([(0, "alpha beta", "en", "web", 10)]),
        "empty_text": mk(
            [(0, "", "en", "web", 0), (1, "alpha", "en", "web", 5)]
        ),
        "all_equal": mk(
            [(i, "same same same", "en", "web", 14) for i in range(6)]
        ),
        "one_token": mk([(0, "x", "en", "web", 1), (1, "x", "fr", "b", 1)]),
        "whitespace": mk([(0, "   ", "en", "web", 3)]),
        "null_text": mk(
            [(0, None, "en", "web", 0), (1, "alpha beta", "en", "web", 10)]
        ),
        "null_meta": mk(
            [(0, "alpha beta", None, None, 10), (1, "beta x", "en", "web", 6)]
        ),
        # r11: non-ASCII sweep — combining marks, C0/DEL controls,
        # Hangul jamo, an astral-plane emoji (surrogate-pair handling
        # in every tokenizer/regex/hash path). Escapes only: literal
        # unicode in source can be re-normalized by tooling.
        # r12: line-heavy docs — one doc of 400 identical lines (the
        # dedup_lines O(L^2) worst case: every line scans to position
        # 1), one of 400 distinct lines (every line scans its full
        # prefix), one all-newlines (401 empty lines). Also the regime
        # where per-line kernels (split/array HOFs) see arrays far
        # wider than the fixture corpus ever produces.
        "line_heavy": mk(
            [
                (i, t, lang, src, len(t))
                for i, (t, lang, src) in enumerate(
                    [
                        ("\n".join(["same line"] * 400), "en", "web"),
                        (
                            "\n".join(f"line {i}" for i in range(400)),
                            "en",
                            "b",
                        ),
                        ("\n" * 400, "en", "web"),
                    ]
                )
            ]
        ),
        # n_chars computed, never hand-counted (r11 ADVICE: two of the
        # original literals were off by one vs the codepoint count)
        "unicode": mk(
            [
                (i, t, lang, src, len(t))
                for i, (t, lang, src) in enumerate(
                    [
                        ("caf\u00e9 na\u0308ive mix", "fr", "web"),
                        ("ctl\x01text\x7f end", "en", "web"),
                        ("\uac00 \u1100\u1161 jamo", "zh", "b"),
                        ("emoji \U0001f600 astral", "en", "web"),
                    ]
                )
            ]
        ),
    }


def emb_frames(spark):
    mk = lambda rows: spark.createDataFrame(rows, EMB_SCHEMA)  # noqa: E731
    return {
        "empty": mk([]),
        "one_vec": mk([(0, [1.0, 0.0, 0.0, 0.0], 0)]),
        "zero_vec": mk(
            [(0, [0.0, 0.0, 0.0, 0.0], 0), (1, [1.0, 0.0, 0.0, 0.0], 1)]
        ),
        "all_equal": mk([(i, [1.0, 2.0, -1.0, 0.5], i % 2) for i in range(5)]),
        "opposite": mk(
            # zero centroid from nonzero inputs (the staged r11 class)
            [(0, [1.0, -1.0, 2.0, 0.0], 0), (1, [-1.0, 1.0, -2.0, 0.0], 0)]
        ),
        "null_vec": mk(
            [(0, None, 0), (1, [1.0, 0.0, 0.0, 0.0], 1)]
        ),
        "null_label": mk(
            [(0, [1.0, 0.0, 0.0, 0.0], None), (1, [0.0, 1.0, 0.0, 0.0], 1)]
        ),
    }


def ev_frames(spark):
    mk = lambda rows: spark.createDataFrame(rows, EV_SCHEMA)  # noqa: E731
    return {
        "empty": mk([]),
        "one_event": mk([(0, _TS, 1, "view", 1.0, "{}")]),
        "same_ts": mk(
            [(i, _TS, 1, "view", 0.0, "{}") for i in range(4)]
        ),
        "zero_values": mk(
            [(i, _TS + datetime.timedelta(minutes=i), 1, "view", 0.0, "{}")
             for i in range(4)]
        ),
        "null_value": mk(
            [(0, _TS, 1, "view", None, "{}"),
             (1, _TS + datetime.timedelta(minutes=2), 1, "click", 1.5, "{}")]
        ),
        "null_type_props": mk(
            [(0, _TS, 1, None, 1.0, None),
             (1, _TS + datetime.timedelta(minutes=2), 1, "view", 1.0, "{}")]
        ),
        "null_ts": mk(
            [(0, None, 1, "view", 1.0, "{}"),
             (1, _TS, 1, "click", 1.0, "{}")]
        ),
    }


def probe(kind, frames, ops):
    findings = []
    for fname, df in frames.items():
        for opname, op in ops.items():
            try:
                out = op(df)
                out.collect()
                status = "ok"
            except ValueError as e:
                status = f"VALUERROR(deliberate?): {str(e)[:110]}"
            except Exception as e:  # noqa: BLE001
                # executor-side guard ValueErrors arrive wrapped in
                # PythonException; classify as deliberate ONLY when the
                # wrapped Python traceback's TERMINAL exception line is
                # a ValueError. The terminal line is the LAST non-blank,
                # non-indented 'Xxx: msg' line — traceback frames are
                # indented, JVM stack lines are tab-indented ('\tat ...'),
                # and 'Driver stacktrace:' has no message after the
                # colon, so none of those can win the scan. (r12 ADVICE
                # fix: the previous any-of-last-3-lines window both
                # swallowed crashes whose tail QUOTED a ValueError and
                # misclassified genuine guards followed by >3 trailing
                # wrapper lines.)
                import re as _re

                terminal = None
                for ln in reversed(str(e).splitlines()):
                    if ln.strip() and not ln[0].isspace() and _re.match(
                        r"[A-Za-z_][\w.]*: \S", ln
                    ):
                        terminal = ln
                        break
                if terminal is not None and _re.match(
                    r"(?:[\w.]*\.)?ValueError: ", terminal
                ):
                    msg = terminal.split("ValueError:", 1)[1]
                    status = f"VALUERROR(executor-side): {msg[:110]}"
                else:
                    tb = traceback.format_exc()
                    status = (
                        f"CRASH {type(e).__name__}: "
                        f"{str(e).splitlines()[0][:160]}"
                    )
                    findings.append((kind, fname, opname, status, tb))
            if status != "ok":
                print(f"[{kind}/{fname}] {opname}: {status}", flush=True)
    return findings


def main():
    spark = get_spark(
        app_name="degenerate-probe", master="local[4]", shuffle_partitions=4
    )
    from pyspark.sql import functions as F

    from dbt_schema_builder_spark.operators import (
        classifier,
        dedup,
        graph,  # noqa: F401
        privacy,
        profiling,
        relational,
        similarity,
        text,
        timeseries,
        udf,
        urls,
    )

    doc_ops = {
        "exact_dedup": dedup.exact_dedup,
        "ngram_jaccard_pairs": lambda d: dedup.ngram_jaccard_pairs(d, n=2, threshold=0.3),
        "tfidf_cosine_pairs": lambda d: dedup.tfidf_ngram_cosine_pairs(d, n=2, threshold=0.2),
        "containment_pairs": lambda d: dedup.containment_pairs(d, n=2, threshold_milli=500),
        "shared_ngram_fraction": lambda d: dedup.shared_ngram_fraction(d, n=2),
        "minhash_signatures": lambda d: dedup.minhash_signatures(d, num_hashes=16, n=2),
        "minhash_lsh": lambda d: dedup.minhash_lsh_candidates(d, num_hashes=16, n=2),
        "simhash": lambda d: dedup.simhash_near_dup(d, max_hamming=12),
        "chunk_dedup": lambda d: dedup.chunk_dedup(d, chunk=3, max_docs=2),
        "source_overlap": lambda d: dedup.source_overlap_matrix(d, n=2),
        "span_stats": lambda d: dedup.duplicate_span_stats(d, min_len=3, k=3),
        "cut_spans": lambda d: dedup.cut_duplicate_spans(d, min_len=3, k=3),
        "dedup_stats": lambda d: dedup.dedup_stats(d),
        "keep_canonical": lambda d: dedup.keep_canonical(
            d, dedup.ngram_jaccard_pairs(d, n=2, threshold=0.3)
        ),
        "cluster_diversity": lambda d: dedup.cluster_diversity_sample(
            d, dedup.ngram_jaccard_pairs(d, n=2, threshold=0.3), m=1
        ),
        "quality_score": text.quality_score,
        "text_stats": text.text_stats_by_lang,
        "winnowing": lambda d: text.winnowing_fingerprints(d, k=3, window=3),
        "tfidf_top_terms": lambda d: text.tfidf_top_terms(d, k=2),
        "unigram_logprob": text.unigram_logprob,
        "bigram_logprob": text.bigram_logprob,
        "dsir": lambda d: text.dsir_importance(d, d.where(F.col("lang") == "en"), k=5),
        "waterfill": lambda d: text.source_mix_waterfill(d, budget_tokens=10),
        "temperature_mix": lambda d: text.source_mix_temperature(d, budget_tokens=10),
        "percentile_filter": lambda d: text.percentile_filter(d, p=0.25),
        "cap_per_source": lambda d: text.cap_per_source(d, k=2),
        "weighted_sample": lambda d: text.weighted_sample_per_group(d, k=2),
        "top_vocab": lambda d: text.top_vocab(d, size=5),
        "oov_rate": lambda d: text.oov_rate(d, text.top_vocab(d, size=5)),
        "lang_id": text.lang_id,
        "zipf": text.lexical_zipf_stats,
        "curriculum_bins": lambda d: text.curriculum_bins(d, n_bins=3),
        "sliding_chunks": lambda d: text.sliding_chunks(d),
        "bm25": lambda d: text.bm25_search(d, ("alpha", "x"), topk=5),
        "hybrid": lambda d: text.hybrid_search(d, ("alpha", "x"), topk=5),
        "pmi": lambda d: text.pmi_pairs(d, min_count=1, max_vocab=10),
        "source_kl": text.source_kl,
        "gopher": lambda d: text.gopher_quality_rules(d, min_tokens=1),
        "ccnet": text.ccnet_buckets,
        "bpe_learn": lambda d: text.learn_bpe_merges(d, n_merges=2)[1],
        "apply_bpe": lambda d: text.apply_bpe_merges(d, [("t", "h")]),
        "fertility": lambda d: text.tokenizer_fertility(d, [("t", "h")]),
        "repetition": text.repetition_stats,
        "pack_sequences": lambda d: text.pack_sequences(d, budget=8),
        "hash_split": text.hash_split,
        "stratified": lambda d: text.stratified_sample(d, default_fraction=0.5),
        "nb_scores": lambda d: classifier.nb_scores(d, label="text LIKE '%a%'"),
        "nb_apply_heldout": lambda d: classifier.nb_apply_heldout(
            d, label="text LIKE '%a%'"
        ),
        "fingerprint": text.fingerprint,
        "token_count": text.token_count,
        "decontaminate": lambda d: dedup.decontaminate(
            d,
            d.sparkSession.createDataFrame(
                [(0, "alpha beta")], "bench_id bigint, text string"
            ),
            n=2,
        ),
        # r11 gate-widening batch: the dedup families the original
        # sweep reached only indirectly (small caps so the all-equal /
        # dup-dense frames exercise the saturation guards too — a
        # deliberate ValueError is a classified non-finding)
        "exact_dedup": dedup.exact_dedup,
        "minhash_candidates": lambda d: dedup.minhash_lsh_candidates(
            d, shingle_hash="portable"
        ),
        "simhash": lambda d: dedup.simhash_near_dup(
            d, max_hamming=16, max_bucket=10
        ),
        "ngram_jaccard": lambda d: dedup.ngram_jaccard_pairs(
            d, n=2, threshold=0.2
        ),
        "ppjoin": lambda d: dedup.jaccard_prefix_pairs(
            d, n=2, threshold=0.8
        ),
        "tfidf_pairs": lambda d: dedup.tfidf_ngram_cosine_pairs(
            d, n=2, threshold=0.1
        ),
        "containment": lambda d: dedup.containment_pairs(d, n=2),
        "shared_ngram": lambda d: dedup.shared_ngram_fraction(d, n=2),
        "chunk_dedup": lambda d: dedup.chunk_dedup(d, chunk=2, max_docs=1),
        "span_stats": lambda d: dedup.duplicate_span_stats(d, min_len=2),
        "cut_spans": lambda d: dedup.cut_duplicate_spans(d, min_len=2),
        "source_overlap": lambda d: dedup.source_overlap_matrix(d, n=2),
        "keep_canonical": lambda d: dedup.keep_canonical(
            d, dedup.ngram_jaccard_pairs(d, n=2, threshold=0.3)
        ),
        "cluster_safe_split": lambda d: dedup.cluster_safe_split(
            d, dedup.ngram_jaccard_pairs(d, n=2, threshold=0.3)
        ),
        # seen = a fingerprint table (content_md5), per the documented
        # contract — the first probe draft passed raw docs and "found"
        # its own API misuse
        "incremental_bloom": lambda d: dedup.incremental_dedup_bloom(
            d, text.fingerprint(d.limit(1))
        ),
        # r11 tests-only additions
        "k_anonymize": lambda d: privacy.k_anonymize(
            d, ["lang", "source"], k=2
        ),
        "k_anon_report": lambda d: privacy.k_anonymity_report(
            d, ["lang", "source"], k=2
        ),
        "nfc_normalize": udf.normalize_text,
        "fix_mojibake": udf.fix_mojibake,
        # r12 tests-only additions (urls probed over arbitrary TEXT —
        # the regex chain is total, it must never crash on non-URLs)
        "dedup_lines": text.dedup_lines,
        "dedup_lines_exploded": lambda d: text.dedup_lines(
            d, strategy="exploded"
        ),
        "l_diversity": lambda d: privacy.l_diversity_report(
            d, ["lang", "source"], "text", l=2
        ),
        "entropy_l": lambda d: privacy.entropy_l_diversity_report(
            d, ["lang", "source"], "text", l=2
        ),
        "url_canon": lambda d: urls.canonicalize_urls(d, url_col="text"),
        # r13: the idna kernel over arbitrary text — codec rejections
        # must pass through, never crash the executor
        "idn_fold": lambda d: urls.fold_idn_hosts(
            d, host_col="text", out_col="host_ascii"
        ),
        "host_report": lambda d: urls.host_report(d, url_col="text"),
        "blocklist_filter": lambda d: urls.blocklist_filter(
            d,
            d.sparkSession.createDataFrame(
                [("example.com",)], "domain string"
            ),
            url_col="text",
        ),
    }

    emb_ops = {
        "brute_topk": lambda e: similarity.brute_force_topk(
            e, similarity.queries_from_corpus(e, 2), k=3
        ),
        "centroid_by_label": similarity.centroid_by_label,
        "kmeans_k4": lambda e: similarity.kmeans(e, k=4, iterations=2),
        "quantize": similarity.quantize_embeddings,
        "centroid_outliers": similarity.centroid_outliers,
        "near_dup_blocked": lambda e: similarity.embedding_near_dup_blocked(
            e, threshold=0.5, blocks=2
        ),
        "lsh_topk": lambda e: similarity.lsh_bucketed_topk(
            e, similarity.queries_from_corpus(e, 2), k=3, dim=4
        ),
        "pq_topk": lambda e: similarity.pq_topk(
            e, n_queries=2, k=3, subspaces=2, codes=4, rerank=8
        ),
        "knn_agreement": lambda e: similarity.knn_label_agreement(
            e, n_queries=2, k=2
        ),
        "semantic_blocked": lambda e: similarity.semantic_dedup(
            e, threshold=0.8, strategy="blocked"
        ),
        # r11 gate-widening batch: the ANN variants the original sweep
        # missed (ivf assignment direct, the integer/quantized paths,
        # the LSH and IVF-sharded near-dup branches, two-level IVF-PQ)
        "ivf_assign2": lambda e: similarity.ivf_assign(
            e,
            e.orderBy("vec_id")
            .limit(2)
            .select(
                F.col("vec_id").alias("centroid_id"),
                F.col("embedding").alias("centroid_vec"),
            ),
        ),
        "quantized_topk": lambda e: similarity.quantized_topk(
            e, similarity.queries_from_corpus(e, 2), k=3
        ),
        "lsh_quant_topk": lambda e: similarity.lsh_quantized_topk(
            e, k=3, bits=3, dim=4, n_queries=2
        ),
        "near_dup_lsh": lambda e: similarity.embedding_near_dup(
            e, threshold=0.9, strategy="lsh", dim=4
        ),
        "near_dup_ivf_sharded": lambda e: similarity.embedding_near_dup_ivf_sharded(
            e, threshold=0.5, k_cells=2, nprobe=2
        ),
        "ivfpq_topk": lambda e: similarity.ivfpq_topk(
            e, n_queries=2, k=3, cells=2, nprobe=2, subspaces=2,
            codes=2, rerank=8,
        ),
        "semantic_ivf": lambda e: similarity.semantic_dedup(
            e, threshold=0.5, strategy="ivf_sharded", k_cells=2, nprobe=2
        ),
    }

    ev_ops = {
        "tumbling": timeseries.tumbling_window_stats,
        "sliding": timeseries.sliding_window_stats,
        "sessionize": lambda ev: timeseries.sessionize(ev, gap_minutes=30),
        "funnel": timeseries.funnel,
        "cohort": timeseries.cohort_retention,
        "locf": timeseries.gapfill_locf,
        "interp": timeseries.gapfill_interpolate,
        "rolling_active": timeseries.rolling_active_users,
        "transition": timeseries.transition_matrix,
        "conversion": timeseries.conversion_latency,
        "cumulative": timeseries.cumulative_users,
        "heavy_hitters": lambda ev: relational.heavy_hitters(ev, "event_type", support=0.2),
        "trend_slope": profiling.trend_slope,
        "histogram": profiling.value_histogram,
        "sigma_outliers": lambda ev: profiling.sigma_outliers(ev, k=2),
        "mad_outliers": profiling.mad_outliers,
        "profile": lambda ev: profiling.profile_numeric(
            ev.select("user_id", "value"), exact_distinct=True
        ),
    }

    findings = []
    findings += probe("docs", doc_frames(spark), doc_ops)
    findings += probe("emb", emb_frames(spark), emb_ops)
    findings += probe("events", ev_frames(spark), ev_ops)

    print(f"\n=== {len(findings)} engine-crash findings ===")
    for kind, fname, opname, status, _ in findings:
        print(f"  {kind}/{fname} {opname}: {status}")
    return 0 if not findings else 1


if __name__ == "__main__":
    sys.exit(main())
