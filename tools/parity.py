"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at a given sf_dir, compare
row counts + order-insensitive values.

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.domain import (  # noqa: E402
    TABLES,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.session import (  # noqa: E402
    get_spark,
)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(9)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> str:
    if len(spark_df) != len(oracle_df):
        return f"ROWCOUNT spark={len(spark_df)} oracle={len(oracle_df)}"
    a, b = normalize(spark_df), normalize(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"COLUMNS spark={list(a.columns)} oracle={list(b.columns)}"
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
    except AssertionError as e:
        return "VALUES " + str(e).split("\n")[0] + " | " + _first_diff(a, b)
    return "OK"


def _first_diff(a: pd.DataFrame, b: pd.DataFrame) -> str:
    for c in a.columns:
        try:
            eq = (a[c].fillna("§") == b[c].fillna("§")) if a[c].dtype == object else (
                (a[c].isna() & b[c].isna()) | (abs(a[c] - b[c]) < 1e-9)
            )
        except Exception:
            eq = a[c].astype(str) == b[c].astype(str)
        bad = (~eq).to_numpy().nonzero()[0]
        if len(bad):
            i = bad[0]
            return f"col={c} row={i} spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
    return "no cell diff found (ordering?)"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    # data-dependent oracles (centroid-literal folding) must be built for
    # the same sf_dir the queries run against
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: ORACLE ERROR {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        verdict = compare(name, sdf, odf)
        tag = "ok" if verdict == "OK" else "FAIL"
        print(f"[{tag}] {name}: {verdict} ({len(sdf)} rows)")
        if verdict != "OK":
            failures += 1
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
