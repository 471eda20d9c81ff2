"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same sf dir, compare row count, sorted column names, and
order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(norm_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from py_sema_spark.session import build_session

    spark = build_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {t1-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        scols, srows = canon(sdf)
        ocols, orows = canon(odf)
        status = []
        if scols != ocols:
            status.append(f"schema spark={scols} duck={ocols}")
        if len(srows) != len(orows):
            status.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        elif srows != orows:
            diffs = [
                (a, b) for a, b in zip(srows, orows) if a != b
            ][:3]
            status.append(f"values differ, e.g. {diffs}")
        if status:
            print(f"FAIL {name}: " + "; ".join(status))
            failed.append(name)
        else:
            print(f"ok   {name}: {len(srows)} rows match ({t1-t0:.1f}s spark)")
    print()
    if failed:
        print("FAILED:", ", ".join(failed))
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
