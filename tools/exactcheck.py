"""Bit-exact replica of the driver's hash gate: run queries() entries on
Spark and their oracle_sql() twins on DuckDB, compare values by repr
equality (doubles must match to the last bit, not rtol 1e-9 — this is
the comparison that caught cohort_ltv's HALF_UP-vs-C-round divergence
when tools/parity.py's tolerance could not).

Usage: python tools/exactcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.domain import (  # noqa: E402
    TABLES,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.session import (  # noqa: E402
    get_spark,
)


def exact_diffs(sdf, odf, limit=5):
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    odf = odf.reindex(sorted(odf.columns), axis=1)
    if list(sdf.columns) != list(odf.columns):
        return -1, [f"COLUMNS spark={list(sdf.columns)} oracle={list(odf.columns)}"]
    for df in (sdf, odf):
        for c in df.columns:
            if "datetime" in str(df[c].dtype):
                df[c] = df[c].astype("datetime64[us]").astype(str)
            elif str(df[c].dtype) == "object":
                df[c] = df[c].map(lambda v: None if v is None else str(v))
    sdf = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    odf = odf.sort_values(list(odf.columns)).reset_index(drop=True)
    bad, msgs = 0, []
    for c in sdf.columns:
        sa, oa = sdf[c].tolist(), odf[c].tolist()
        for i, (a, b) in enumerate(zip(sa, oa)):
            if repr(a) != repr(b) and not (a != a and b != b):  # NaN==NaN ok
                if len(msgs) < limit:
                    msgs.append(f"col={c} row={i} spark={a!r} oracle={b!r}")
                bad += 1
    return bad, msgs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark("exactcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: ERROR {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if len(sdf) != len(odf):
            print(f"[FAIL] {name}: ROWCOUNT spark={len(sdf)} oracle={len(odf)}")
            failures += 1
            continue
        bad, msgs = exact_diffs(sdf, odf)
        if bad:
            print(f"[FAIL] {name}: {bad} exact diffs; " + " | ".join(msgs))
            failures += 1
        else:
            print(f"[ok] {name}: {len(sdf)} rows bit-exact")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
