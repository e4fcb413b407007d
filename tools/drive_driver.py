"""Driver-contract simulation: entry() smoke + every catalog query
hash-compared against its DuckDB oracle.

Usage: python tools/drive_driver.py           (sf0.01, ~4 min)
       DRIVE_SF=/root/testdata/sf0.001 python tools/drive_driver.py  (~2 min)
       DRIVE_ONLY=name1,name2 python tools/drive_driver.py  (subset)

Exit 0 + "RESULT: ALL MATCH" is the bar every commit must hold.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("DRIVE_SF", "/root/testdata/sf0.01")

import __spark_entry__ as e
from ecs_ecommerce_data_pipeline_spark.session import get_spark
from tests.oracle_utils import compare, duckdb_con

spark = get_spark(app_name="drive-driver")

t0 = time.time()
df = e.entry(spark)
n = df.count()
assert n >= 0 and df.columns, "entry() must return rows with a schema"
print(f"entry(): {n} rows, schema {df.columns} [{time.time()-t0:.1f}s]")

qs = e.queries()
only = {s for s in os.environ.get("DRIVE_ONLY", "").split(",") if s}
if only:
    qs = {n: f for n, f in qs.items() if n in only}
oracles = e.oracle_sql()
con = duckdb_con(SF)
fails = []
for name, fn in qs.items():
    t0 = time.time()
    try:
        if name in oracles:
            compare(fn(spark, SF), oracles[name], con, name)
            status = "match"
        else:
            rows = fn(spark, SF).count()
            status = f"rows-only ({rows})"
    except Exception as ex:
        status = f"FAIL: {str(ex)[:300]}"
        fails.append(name)
    print(f"{name}: {status} [{time.time()-t0:.1f}s]", flush=True)

print(f"\n{len(qs)} queries, {len(fails)} failures: {fails}")
print("RESULT: ALL MATCH" if not fails else "RESULT: FAILURES")
sys.exit(1 if fails else 0)
