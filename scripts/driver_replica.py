"""Driver-harness replica: run every registry query under a VANILLA
SparkSession (no regpulse session confs — exactly what the correctness
driver does) and diff against the DuckDB oracle with pandas
canonicalization. Round-1's 15 err:nanos rows came from the gap between
get_spark() and the driver's own session; this script exists so that
class of bug is caught before submit, not by the round grade.

Usage: python scripts/driver_replica.py [sf_dir] [only_query_name]

The optional second argument restricts the differential to one
registry row — the fast loop when iterating on a single query.
"""

from __future__ import annotations

import json
import sys

import duckdb
import pandas as pd

from pyspark.sql import SparkSession

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    return df


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # vanilla, like the driver: master + shuffle partitions only
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("driver_replica")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    sys.path.insert(0, ".")
    import __spark_entry__ as E

    queries, oracles = E.queries(), E.oracle_sql()
    if len(sys.argv) > 2:
        only = sys.argv[2]
        if only not in queries:
            print(f"unknown query {only!r}; registry has {len(queries)} rows")
            return 2
        queries = {only: queries[only]}
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        rec: dict = {}
        try:
            sdf = fn(spark, sf).toPandas()
            if name not in oracles:
                rec = {"mode": "rows_only", "rows": len(sdf), "ok": len(sdf) >= 0}
            else:
                ddf = con.execute(oracles[name]).fetchdf()
                s, d = canon(sdf), canon(ddf)
                schema_ok = list(s.columns) == list(d.columns)
                rows_ok = len(s) == len(d)
                hash_ok = bool(
                    schema_ok
                    and rows_ok
                    and (s.astype(str).values == d.astype(str).values).all()
                )
                rec = {
                    "mode": "oracle",
                    "rows": len(s),
                    "schema_match": schema_ok,
                    "rows_match": rows_ok,
                    "hash_match": hash_ok,
                    "ok": hash_ok,
                }
        except Exception as exc:  # the driver records the traceback; name+type suffice here
            rec = {"mode": "error", "ok": False, "err": f"{type(exc).__name__}: {exc}"[:300]}
        results[name] = rec
        print(("PASS " if rec["ok"] else "FAIL "), name, rec.get("err", ""))

    n_bad = sum(1 for r in results.values() if not r["ok"])
    print(json.dumps({"total": len(results), "failed": n_bad}))
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
