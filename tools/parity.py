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


# ---------------------------------------------------------------------------
# Machine-checkable sketch-accuracy contracts (r12, VERDICT r11 item 4).
#
# Some queries are EXACT only inside a sketch's fidelity regime and
# legitimately diverge from the exact-SQL oracle beyond it. Each entry
# states the regime and supplies a bound checker; when the exact compare
# fails for a contracted query, the checker runs and a within-bound
# divergence is reported as [bounded-ok] instead of [FAIL].
#
# price_bins: decile edges come from a Greenwald-Khanna sketch with
# accuracy A = operators.analytics.PCTL_ACCURACY (150k). GK is
# bit-exact below ~A/2 rows (the sf0.01 gate regime); beyond, each
# edge's RANK error is <= n/A, so each decile-bin population may shift
# by at most 2·n/A + 1 rows vs the exact quantile_disc oracle.
# ---------------------------------------------------------------------------


def _bounded_price_bins(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> str:
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.analytics import (  # noqa: E501
        PCTL_ACCURACY,
    )

    a = spark_df.sort_values("bin_id").reset_index(drop=True)
    b = oracle_df.sort_values("bin_id").reset_index(drop=True)
    if list(a["bin_id"]) != list(b["bin_id"]):
        return f"bin ids differ: {list(a['bin_id'])} vs {list(b['bin_id'])}"
    n = int(b["n_rows"].sum())
    if int(a["n_rows"].sum()) != n:
        return f"total rows differ: {int(a['n_rows'].sum())} vs {n}"
    tol = 2 * (n // PCTL_ACCURACY) + 1
    worst = int((a["n_rows"] - b["n_rows"]).abs().max())
    if worst > tol:
        return f"bin population off by {worst} > rank-error bound {tol} (n={n}, A={PCTL_ACCURACY})"
    return (
        f"OK within GK bound: max bin delta {worst} <= {tol} "
        f"(n={n}, A={PCTL_ACCURACY})"
    )


#: query name -> (exactness regime note, bound checker)
SKETCH_CONTRACTS = {
    "price_bins": (
        "GK edges exact below ~PCTL_ACCURACY/2 input rows (gate SFs); "
        "rank error <= n/A beyond",
        _bounded_price_bins,
    ),
}


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
        if verdict != "OK" and name in SKETCH_CONTRACTS:
            note, checker = SKETCH_CONTRACTS[name]
            bverdict = checker(sdf, odf)
            if bverdict.startswith("OK"):
                print(f"[bounded-ok] {name}: {bverdict} ({len(sdf)} rows)")
                continue
            print(f"[FAIL] {name}: exact: {verdict} | bound: {bverdict}")
            failures += 1
            continue
        tag = "ok" if verdict == "OK" else "FAIL"
        print(f"[{tag}] {name}: {verdict} ({len(sdf)} rows)")
        if verdict != "OK":
            failures += 1
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
