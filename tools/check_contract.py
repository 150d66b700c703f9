"""Local replica of the driver's CORRECTNESS gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() in DuckDB
at sf0.01, compare row count + column names + order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    # dtype-STRICT, matching the driver's hash: int64 1234 and float64
    # 1234.0 must NOT compare equal. Only object→str (string canon) and
    # nullable-Float→float64 (same kind) normalizations are applied.
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif "Float" in str(pdf[c].dtype):
            pdf[c] = pdf[c].astype("float64")
        elif "Int" in str(pdf[c].dtype):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind != bv.dtype.kind:
            return False  # driver hashes raw values — int vs float differs
        if av.dtype == float or bv.dtype == float:
            ok = [
                (pd.isna(x) and pd.isna(y))
                or (not pd.isna(x) and not pd.isna(y) and math.isclose(float(x), float(y), rel_tol=0, abs_tol=0))
                for x, y in zip(av, bv)
            ]
            if not all(ok):
                return False
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from sparkgrep.session import get_spark

    spark = get_spark("contract-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(fn(spark, sf_dir).toPandas())
        except Exception as e:
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in osql:
            print(f"~ {name}: no oracle (rows-only) → {len(got)} rows")
            continue
        try:
            want = canon(con.sql(osql[name]).df())
        except Exception as e:
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        schema_ok = list(got.columns) == list(want.columns)
        rows_ok = len(got) == len(want)
        vals_ok = schema_ok and rows_ok and values_match(got, want)
        status = "✓" if (schema_ok and rows_ok and vals_ok) else "✗"
        print(
            f"{status} {name}: rows {len(got)}/{len(want)} schema={schema_ok} values={vals_ok}"
        )
        if status == "✗":
            failures.append(name)
            print("  spark cols:", dict(got.dtypes.astype(str)))
            print("  duck  cols:", dict(want.dtypes.astype(str)))
            if schema_ok and rows_ok:
                for c in got.columns:
                    if not values_match(got[[c]], want[[c]]):
                        diff = got[c].astype(str) != want[c].astype(str)
                        i = diff.idxmax()
                        print(f"  first diff col={c} row={i}: spark={got[c][i]!r} duck={want[c][i]!r}")
                        break
            else:
                print("  spark head:", got.head(3).to_dict("records"))
                print("  duck  head:", want.head(3).to_dict("records"))

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
