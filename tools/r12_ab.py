#!/usr/bin/env python
"""Round-12 isolated A/B for the r11 verdict's two guard-touched bench
movers (verdict item #2): q_embedding_near_dup 1.71->2.12 s (1.24x) and
x_embedding_near_dup_ivf05 2.50->3.42 s (1.37x) against a 0.836 drift
median — the only r11 entries that moved AGAINST drift on paths the r11
zero-norm cosine guard actually changed (the when(nrm==0) inverse-norm
branches in similarity.py's GEMM prep projections).

Unlike the r7/r11 drift A/Bs this one compares two CODE VERSIONS:
A = HEAD (guard on), B = the guard commit's parent (40314b2, guard off),
checked out via `git worktree`. Interleaved A/B/A/B subprocess passes
(each worker pays its own fresh JVM, timing is query-only), median-of-N
per side, warm-up at sf0.001, clearCache + release_caches between
queries inside a worker — the discipline every prior A/B used, plus
process isolation so neither module version can contaminate the other.

Run on an idle host: python tools/r12_ab.py [passes-per-side]
Record the verdict in BASELINE.md the day it runs (the r9 rule).
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GUARD_PARENT = "40314b25c1a863bd0460a8b981a34bfd8fe04391"
PARENT_TREE = "/tmp/r12_ab_parent"
TARGETS = ["q_embedding_near_dup(blocked05)", "x_embedding_near_dup_ivf05"]


def worker(tree: str) -> None:
    """One timing pass of both targets against the given source tree.
    Prints a single RESULT json line; everything else goes to stderr."""
    sys.path.insert(0, tree)
    import time

    from dbt_schema_builder_spark.operators import similarity
    from dbt_schema_builder_spark.session import (
        get_spark,
        read_table,
        release_caches,
    )

    spark = get_spark(app_name="r12-ab", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def one_pass(sf_dir: str) -> dict[str, float]:
        emb = read_table(spark, f"{sf_dir}/embeddings.parquet")
        out: dict[str, float] = {}
        for name in TARGETS:
            if name.startswith("q_embedding_near_dup"):
                df = similarity.embedding_near_dup(emb, threshold=0.5)
            else:
                df = similarity.embedding_near_dup_ivf_sharded(
                    emb, threshold=0.5
                )
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            out[name] = time.perf_counter() - t0
            release_caches()
            spark.catalog.clearCache()
        return out

    one_pass("/root/testdata/sf0.001")  # warm-up (JIT/codegen)
    print("RESULT " + json.dumps(one_pass(sf)), flush=True)


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    if not os.path.isdir(PARENT_TREE):
        subprocess.run(
            ["git", "worktree", "add", "--detach", PARENT_TREE, GUARD_PARENT],
            cwd=REPO,
            check=True,
        )
    sides = {"A(head,guard-on)": REPO, "B(parent,guard-off)": PARENT_TREE}
    samples: dict[str, dict[str, list[float]]] = {
        s: {t: [] for t in TARGETS} for s in sides
    }
    for i in range(passes):
        for side, tree in sides.items():
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", tree],
                capture_output=True,
                text=True,
                check=True,
                cwd=tree,
            )
            line = [
                ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")
            ][-1]
            result = json.loads(line[len("RESULT "):])
            for t, v in result.items():
                samples[side][t].append(v)
            print(f"pass {i + 1} {side}: "
                  + ", ".join(f"{t}={v:.2f}s" for t, v in result.items()),
                  flush=True)
    print()
    for t in TARGETS:
        meds = {
            s: statistics.median(samples[s][t]) for s in sides
        }
        a, b = meds["A(head,guard-on)"], meds["B(parent,guard-off)"]
        print(
            f"{t}: A(guard-on) median {a:.2f} s vs "
            f"B(guard-off) median {b:.2f} s -> ratio {a / b:.2f}x "
            f"(A samples {[round(x, 2) for x in samples['A(head,guard-on)'][t]]}, "
            f"B samples {[round(x, 2) for x in samples['B(parent,guard-off)'][t]]})"
        )


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
    else:
        main()
