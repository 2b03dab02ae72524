"""Driver-style correctness harness: run each queries() entry on Spark and
its oracle_sql() twin on DuckDB at sf0.01; compare row counts and values."""
import math
import sys

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs = E.queries()
oracles = E.oracle_sql()
only = sys.argv[1:] if len(sys.argv) > 1 else None


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


for name, fn in qs.items():
    if only and name not in only:
        continue
    try:
        sdf = fn(spark, SF)
        srows = sdf.collect()
        scols = sorted(sdf.columns)
        sset = sorted(tuple(canon(r[c]) for c in scols) for r in srows)
    except Exception as ex:
        print(f"{name}: SPARK FAIL {type(ex).__name__}: {str(ex)[:300]}")
        continue
    sql = oracles.get(name)
    if sql is None:
        print(f"{name}: rows={len(srows)} (no oracle)")
        continue
    try:
        ddf = con.execute(sql).fetch_df()
    except Exception as ex:
        print(f"{name}: DUCKDB FAIL {type(ex).__name__}: {str(ex)[:300]}")
        continue
    dcols = sorted(ddf.columns)
    if dcols != scols:
        print(f"{name}: SCHEMA MISMATCH spark={scols} duck={dcols}")
        continue
    drows = sorted(
        tuple(canon(v) for v in row) for row in ddf[scols].itertuples(index=False, name=None)
    )
    if len(drows) != len(sset):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(sset)} duck={len(drows)}")
        continue
    bad = [i for i, (a, b) in enumerate(zip(sset, drows)) if a != b]
    if bad:
        i = bad[0]
        print(f"{name}: VALUE MISMATCH at {len(bad)}/{len(sset)} rows; first: spark={sset[i]} duck={drows[i]}")
    else:
        print(f"{name}: OK rows={len(sset)}")
spark.stop()
