#!/usr/bin/env python
"""Full-registry hostile-TZ oracle sweep (driver simulation)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as e
qs, osql = e.queries(), e.oracle_sql()
import duckdb
con = duckdb.connect(); con.execute("SET TimeZone='UTC'")
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"/root/testdata/sf0.01/{t}.parquet"
    if os.path.exists(p): con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
t0=time.time()
ok=bad=rows_only=0
for name in sorted(qs):
    try:
        s = sorted(tuple(str(v) for v in r) for r in qs[name](spark, "/root/testdata/sf0.01").collect())
        if name in osql:
            d = sorted(tuple(str(v) for v in r) for r in con.execute(osql[name]).fetchall())
            if s == d: ok+=1
            else:
                bad+=1; print("MISMATCH", name, len(s), len(d), flush=True)
        else:
            rows_only+=1
            print("rows-only", name, len(s), flush=True)
    except Exception as ex:
        bad+=1; print("ERROR", name, repr(ex)[:200], flush=True)
print(f"SWEEP DONE: {ok} hash-green, {rows_only} rows-only, {bad} bad, {time.time()-t0:.0f}s over {len(qs)} queries", flush=True)
