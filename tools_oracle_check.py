"""Driver-style correctness harness: run each queries() entry on Spark and
its oracle_sql() twin on DuckDB at sf0.01; compare row counts, values, AND
dtypes.

The dtype check exists because canonicalized-value comparison alone let a
DuckDB HUGEINT leak slip through in round 4: ``sum(BIGINT) OVER (...)``
returns HUGEINT, pandas materializes it as float64, and the driver's hash
split ``0.0`` from Spark's ``0`` even though ``canon()`` collapsed them.
``dtype_flag`` catches that class before the driver does.
"""
import math
import sys

_INT_SPARK = {"tinyint", "smallint", "int", "bigint"}
_FLOAT_SPARK = {"float", "double"}


def dtype_flag(spark_type: str, dseries) -> str | None:
    """Return a description of a dtype-parity violation between a Spark
    column type string (from ``DataFrame.dtypes``) and the pandas Series the
    DuckDB oracle materialized for the same column, or None if compatible.

    Allowed mappings: Spark int types <-> any pandas integer dtype (or
    float64 *only when the column actually contains nulls* — pandas widens
    nullable ints); Spark float/double <-> pandas float; everything else is
    unchecked (strings, arrays, timestamps land as object/datetime64 and the
    value comparison covers them).
    """
    kind = dseries.dtype.kind  # i,u,f,O,b,M,m
    if spark_type in _INT_SPARK:
        if kind in ("i", "u"):
            return None
        if kind == "f":
            if dseries.isna().any():
                return None  # null-driven widening, not a type leak
            return (
                f"spark says {spark_type} but oracle came back {dseries.dtype} "
                "with no nulls - HUGEINT/DECIMAL leak? CAST(... AS BIGINT) in the oracle SQL"
            )
        if kind == "O":
            nonnull = dseries.dropna()
            if len(nonnull) and not isinstance(nonnull.iloc[0], int):
                return (
                    f"spark says {spark_type} but oracle came back "
                    f"object[{type(nonnull.iloc[0]).__name__}]"
                )
            return None
        return f"spark says {spark_type} but oracle came back {dseries.dtype}"
    if spark_type in _FLOAT_SPARK:
        if kind == "f":
            return None
        if kind in ("i", "u"):
            return f"spark says {spark_type} but oracle came back {dseries.dtype}"
        if kind == "O":
            nonnull = dseries.dropna()
            if len(nonnull) and not isinstance(nonnull.iloc[0], float):
                return (
                    f"spark says {spark_type} but oracle came back "
                    f"object[{type(nonnull.iloc[0]).__name__}]"
                )
    return None


def dtype_report(spark_dtypes, ddf) -> list[str]:
    """All dtype-parity violations between Spark ``df.dtypes`` pairs and a
    DuckDB ``fetch_df()`` frame. Empty list == clean."""
    out = []
    for col, styp in spark_dtypes:
        if col not in ddf.columns:
            continue
        flag = dtype_flag(styp, ddf[col])
        if flag:
            out.append(f"{col}: {flag}")
    return out


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def main(argv):
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.01"
    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    only = argv if argv else None
    failures = 0

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf)
            srows = sdf.collect()
            sdtypes = sdf.dtypes
            scols = sorted(sdf.columns)
            sset = sorted(tuple(canon(r[c]) for c in scols) for r in srows)
        except Exception as ex:
            print(f"{name}: SPARK FAIL {type(ex).__name__}: {str(ex)[:300]}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}: rows={len(srows)} (no oracle)")
            continue
        try:
            ddf = con.execute(sql).fetch_df()
        except Exception as ex:
            print(f"{name}: DUCKDB FAIL {type(ex).__name__}: {str(ex)[:300]}")
            failures += 1
            continue
        dcols = sorted(ddf.columns)
        if dcols != scols:
            print(f"{name}: SCHEMA MISMATCH spark={scols} duck={dcols}")
            failures += 1
            continue
        dflags = dtype_report(sdtypes, ddf)
        if dflags:
            print(f"{name}: DTYPE MISMATCH {'; '.join(dflags)}")
            failures += 1
            continue
        drows = sorted(
            tuple(canon(v) for v in row) for row in ddf[scols].itertuples(index=False, name=None)
        )
        if len(drows) != len(sset):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(sset)} duck={len(drows)}")
            failures += 1
            continue
        bad = [i for i, (a, b) in enumerate(zip(sset, drows)) if a != b]
        if bad:
            i = bad[0]
            print(
                f"{name}: VALUE MISMATCH at {len(bad)}/{len(sset)} rows; first: spark={sset[i]} duck={drows[i]}"
            )
            failures += 1
        else:
            print(f"{name}: OK rows={len(sset)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
