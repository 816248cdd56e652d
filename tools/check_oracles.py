"""Local replica of the driver's oracle check: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at the given sf, compare
row count, schema (sorted column names), and an order-insensitive
value hash. Usage: python tools/check_oracles.py [sf_dir] [name ...]

Set ``CHECK_ORACLES_JSON=/path/out.json`` to also write the driver's
CORRECTNESS artifact shape (name → rows/schema/hash verdicts) — the
committed full-sweep record (``CORRECTNESS_local_rN.json``) the round
ritual produces, covering every oracled query rather than the driver's
50-query sample. Failures record err and keep sweeping.
"""

from __future__ import annotations

import os
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
    results: dict[str, dict] = {}
    for name, sql in oq.items():
        if only and name not in only:
            continue
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            odf = con.execute(sql).df()
        except Exception as exc:  # keep sweeping; record the error
            failures.append(name)
            results[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(exc).__name__}: {exc}"[:300],
            }
            print(f"FAIL {name:28} err={type(exc).__name__}: {exc}")
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(odf)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        results[name] = {
            "rows_match": ok_rows,
            "schema_match": ok_cols,
            "hash_match": ok_hash,
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
            "err": None,
        }
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
    out_json = os.environ.get("CHECK_ORACLES_JSON")
    if out_json:
        import json

        with open(out_json, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "oracled_queries": len(results),
                    "failures": failures,
                    "results": results,
                },
                fh,
                indent=2,
            )
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
