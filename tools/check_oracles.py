"""Local replica of the driver's oracle check: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at the given sf, compare
row count, schema (sorted column names), and an order-insensitive
value hash. Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from dedupe_algo_spark.session import get_spark  # noqa: E402
from dedupe_algo_spark.sources.tables import TPCH_TABLES  # noqa: E402


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        d[c] = d[c].astype(str)
    rows = sorted(d.apply(lambda r: "|".join(r.values), axis=1))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    qs, oq = e.queries(), e.oracle_sql()
    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, sql in oq.items():
        if only and name not in only:
            continue
        sdf = qs[name](spark, sf_dir).toPandas()
        odf = con.execute(sql).df()
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(odf)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(f"{status:4} {name:28} rows {len(sdf)}/{len(odf)} cols={ok_cols} hash={ok_hash}")
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print("   spark:", sorted(sdf.columns), " oracle:", sorted(odf.columns))
            elif ok_rows:
                m = sdf.merge(odf, how="outer", indicator=True)
                diff = m[m["_merge"] != "both"]
                print(diff.head(6).to_string())
    print("FAILURES:", failures or "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
