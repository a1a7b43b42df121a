"""Simulate the driver harness: vanilla SparkSession (no engine configs),
entry() smoke at sf0.001, queries() vs oracle_sql() via DuckDB at sf0.01.

Fidelity notes (round-1 lesson): the real driver's value hash is
*type-sensitive* — a DuckDB integer SUM comes back as HUGEINT (int128)
and hashes differently from Spark's BIGINT even when every value is
equal. The sim therefore (a) DESCRIBEs each oracle and fails on any
HUGEINT/DECIMAL output column, and (b) compares floats at full
precision (repr), not %.6g — so the sim turns red exactly when the
driver does.

Env: SIM_SF_DIR (default /root/testdata/sf0.01), SIM_ONLY=q_a,q_b to
run a subset.
"""
import sys, math, os, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
import duckdb

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .appName("driver-sim").getOrCreate())

import __spark_entry__ as m

only = {s for s in os.environ.get("SIM_ONLY", "").split(",") if s}

# t1 smoke
if not only:
    df = m.entry(spark)
    rows = df.collect()
    print(f"t1 smoke: entry() -> {len(rows)} rows, schema: {df.columns}")
    assert len(rows) > 0

# t2 correctness at sf0.01
SF = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

# Types whose pandas/Arrow conversion diverges from Spark's (HUGEINT ->
# float64/decimal, DECIMAL -> object) — any oracle emitting one is a
# latent driver hash failure even if Python-level values compare equal.
_BAD_TYPE_MARKERS = ("HUGEINT", "DECIMAL", "UINTEGER", "UBIGINT", "UTINYINT", "USMALLINT")

def canon(v):
    if v is None: return "None"
    if isinstance(v, bool): return str(v)
    if isinstance(v, float):
        # full precision: the driver hashes exact values, not %.6g
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, (list, tuple)): return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

qs, oracles = m.queries(), m.oracle_sql()
ok = fail = 0
for name, fn in sorted(qs.items()):
    if only and name not in only:
        continue
    try:
        sdf = fn(spark, SF)
        scols = [c.lower() for c in sdf.columns]
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  rows-only {name}: {len(srows)} rows"); ok += 1; continue
        desc = con.execute(f"DESCRIBE ({oracles[name]})").fetchall()
        bad = [(d[0], d[1]) for d in desc
               if any(mark in d[1].upper() for mark in _BAD_TYPE_MARKERS)]
        assert not bad, f"oracle output types would fail the driver hash: {bad}"
        res = con.execute(oracles[name])
        dcols = [d[0].lower() for d in res.description]
        drows = res.fetchall()
        sidx = sorted(range(len(scols)), key=lambda i: scols[i])
        didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
        assert sorted(scols) == sorted(dcols), f"cols {scols} vs {dcols}"
        assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
        s = sorted(tuple(canon(r[i]) for i in sidx) for r in srows)
        d = sorted(tuple(canon(r[i]) for i in didx) for r in drows)
        assert s == d, f"values differ, first: {next(((a,b) for a,b in zip(s,d) if a!=b), None)}"
        print(f"  MATCH {name}: {len(srows)} rows"); ok += 1
    except Exception as e:
        print(f"  FAIL {name}: {e}"); traceback.print_exc(limit=2); fail += 1
    finally:
        # scoped operator-cache release (the r7 session contract):
        # 149 queries back-to-back would otherwise accumulate every
        # operator's persisted subtree for the whole run
        from dbt_schema_builder_spark.session import release_caches
        release_caches()
print(f"t2: {ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
