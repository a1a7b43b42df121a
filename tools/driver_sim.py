"""Simulate the driver harness: vanilla SparkSession (no engine configs),
entry() smoke at sf0.001, queries() vs oracle_sql() via DuckDB at sf0.01."""
import sys, math, traceback
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from pyspark.sql import SparkSession
import duckdb

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .appName("driver-sim").getOrCreate())

import __spark_entry__ as m

# t1 smoke
df = m.entry(spark)
rows = df.collect()
print(f"t1 smoke: entry() -> {len(rows)} rows, schema: {df.columns}")
assert len(rows) > 0

# t2 correctness at sf0.01
SF = __import__("os").environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def canon(v):
    if v is None: return "None"
    if isinstance(v, bool): return str(v)
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6g}"
    if isinstance(v, (list, tuple)): return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

qs, oracles = m.queries(), m.oracle_sql()
ok = fail = 0
for name, fn in sorted(qs.items()):
    try:
        sdf = fn(spark, SF)
        scols = [c.lower() for c in sdf.columns]
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  rows-only {name}: {len(srows)} rows"); ok += 1; continue
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
print(f"t2: {ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
