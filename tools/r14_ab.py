#!/usr/bin/env python
"""Round-14 isolated code-version A/B (the r12_ab pattern): interleaved
A/B subprocess passes between the working tree (A) and a git worktree
at a given commit (B), median-of-N per side, fresh JVM per worker,
bench.py's exact per-query discipline (construction inside the timer,
noop sink, release_caches + clearCache between queries, sf0.001
warm-up pass first).

Usage:
  python tools/r14_ab.py <commit-for-B> <query> [query ...] [--passes N]
Queries are __spark_entry__.queries() keys, or bench.py extra-entry
names (x_*).
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(tree: str, targets: list[str]) -> None:
    sys.path.insert(0, tree)
    import time

    import __spark_entry__ as entrymod
    from dbt_schema_builder_spark.session import get_spark, release_caches

    spark = get_spark(app_name="r14-ab", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = entrymod.queries()
    try:
        import bench as benchmod

        extras = dict(getattr(benchmod, "EXTRA", {}))
    except Exception:
        extras = {}

    def build(name: str, sf_dir: str):
        if name in queries:
            return queries[name](spark, sf_dir)
        if name in extras:
            return extras[name](spark, sf_dir)
        raise KeyError(name)

    def one_pass(sf_dir: str) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in targets:
            spark.sparkContext.setJobDescription(f"r14-ab: {name}")
            t0 = time.perf_counter()
            build(name, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name] = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            release_caches()
            spark.catalog.clearCache()
        return out

    one_pass("/root/testdata/sf0.001")  # warm-up (JIT/codegen)
    # bench.py's methodology: median-of-3 warm in-session samples
    import statistics as _st

    reps = [one_pass(sf) for _ in range(3)]
    med = {
        t: _st.median([r[t] for r in reps]) for t in targets
    }
    print("RESULT " + json.dumps(med), flush=True)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    passes = 3
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    commit, targets = args[0], args[1:]
    tree_b = f"/tmp/r14_ab_{commit[:8]}"
    if not os.path.isdir(tree_b):
        subprocess.run(
            ["git", "worktree", "add", "--detach", tree_b, commit],
            cwd=REPO,
            check=True,
        )
    sides = {"A(worktree)": REPO, f"B({commit[:8]})": tree_b}
    samples = {s: {t: [] for t in targets} for s in sides}
    for i in range(passes):
        for side, tree in sides.items():
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", tree]
                + targets,
                capture_output=True,
                text=True,
                check=True,
                cwd=tree,
            )
            line = [
                ln
                for ln in proc.stdout.splitlines()
                if ln.startswith("RESULT ")
            ][-1]
            for t, v in json.loads(line[len("RESULT "):]).items():
                samples[side][t].append(v)
            print(
                f"pass {i + 1} {side}: "
                + ", ".join(
                    f"{t}={samples[side][t][-1]:.2f}s" for t in targets
                ),
                flush=True,
            )
    print()
    for t in targets:
        meds = {s: statistics.median(samples[s][t]) for s in sides}
        (sa, a), (sb, b) = meds.items()
        print(
            f"{t}: A median {a:.2f} s vs B median {b:.2f} s -> "
            f"A/B {a / b:.2f}x  "
            f"(A {[round(x, 2) for x in samples[sa][t]]}, "
            f"B {[round(x, 2) for x in samples[sb][t]]})"
        )


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(sys.argv[2], sys.argv[3:])
    else:
        main()
