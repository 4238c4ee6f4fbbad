"""Simulate the driver's verify: plain SparkSession (driver's own, untuned),
import __spark_entry__, smoke entry(), run every queries() entry at sf0.01
(override with SPARK_GRAFT_SF_DIR), compare with oracle_sql() via DuckDB.

Positional args restrict the sweep to the named queries (targeted
re-verification after editing a handful); no args = the full registry."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
import duckdb
from etl_showcase_spark.caching import release_all
import __spark_entry__ as ent
from etl_showcase_spark.testing import compare_frames

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .appName("driver-sim").getOrCreate())

df = ent.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

qs, osql = ent.queries(), ent.oracle_sql()

def fresh_duck():
    # spill instead of OOM on the big-SF spot-checks; a fresh
    # connection is also the recovery path after any oracle error
    # (DuckDB can wedge its allocator after an OOM)
    c = duckdb.connect()
    c.execute("PRAGMA temp_directory='/tmp/duck_spill'")
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c

con = fresh_duck()

only = set(sys.argv[1:])
unknown = only - set(qs)
assert not unknown, f"unknown query names: {sorted(unknown)}"

fails = 0
for name, fn in sorted(qs.items()):
    if only and name not in only:
        continue
    try:
        actual = fn(spark, SF_DIR).toPandas()
        if name in osql:
            expected = con.execute(osql[name]).fetchdf()
            problems = compare_frames(actual, expected)
            status = "MATCH" if not problems else f"MISMATCH: {problems}"
            fails += bool(problems)
        else:
            status = f"rows-only ({len(actual)} rows)"
        print(f"  {name}: {status}")
    except Exception as e:
        fails += 1
        print(f"  {name}: ERROR {type(e).__name__}: {str(e)[:200]}")
        try:
            con.close()
        except Exception:
            pass
        con = fresh_duck()  # don't let one wedged oracle poison the rest
    release_all()
print("RESULT:", "ALL-MATCH" if fails == 0 else f"{fails} FAILURES")
