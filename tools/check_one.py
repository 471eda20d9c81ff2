"""Side-by-side Spark vs DuckDB check for named driver queries:

    python tools/check_one.py [--sf DIR] name [name ...]

Mirrors the driver's compare (sorted columns, stringified values,
row-order-insensitive)."""

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as e
    from py_sema_spark.session import build_session

    spark = build_session(master="local[8]")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )
    qs, osql = e.queries(), e.oracle_sql()
    rc = 0
    for name in args.names:
        sdf = qs[name](spark, args.sf).toPandas()
        if name not in osql:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        odf = con.execute(osql[name]).df()
        cols = sorted(sdf.columns)
        ok_cols = cols == sorted(odf.columns)
        a = sdf[cols].astype(str).sort_values(cols, ignore_index=True)
        b = odf[sorted(odf.columns)].astype(str)
        b.columns = sorted(odf.columns)
        b = b.sort_values(sorted(odf.columns), ignore_index=True)
        ok = ok_cols and len(a) == len(b) and a.equals(b)
        print(f"{name}: rows {len(a)}/{len(b)} cols_match={ok_cols} "
              f"values_match={ok}")
        if not ok:
            rc = 1
            if ok_cols and len(a) == len(b):
                diff = (a != b).any(axis=1)
                print("spark:\n", a[diff].head(5))
                print("oracle:\n", b[diff].head(5))
            else:
                print("spark cols:", list(sdf.columns))
                print("oracle cols:", list(odf.columns))
                print(a.head(3)); print(b.head(3))
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
