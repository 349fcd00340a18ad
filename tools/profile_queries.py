"""Per-query wall-time breakdown: DataFrame construction (Python-side plan
building + any driver collects inside the builder), planning (explain), and
execution (noop write). Second-run numbers isolate steady-state cost from
first-touch JIT/codegen.

Usage: python tools/profile_queries.py [query ...]   (default: all)
Writes JSON to /tmp/profile_queries.json and prints a sorted table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark import (  # noqa: E402
    queries as q,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.domain import (  # noqa: E402
        TABLES,
    )
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.catalog import (  # noqa: E402
        load_table,
    )

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    names = sys.argv[1:] or list(q.QUERIES)

    # warm shared indexes exactly like bench.py so queries are steady-state
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (  # noqa: E402
        dedup,
        similarity,
    )
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.queries import (  # noqa: E402
        PQ_KSUB_WIDE,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    dedup.shared_shingle_table(docs)
    dedup.shared_band_index(docs)
    _c, _a = similarity.ivf_build_cached(emb)
    similarity.float_topf_cached(emb, _c, _a)
    similarity.pq_codes_cached(emb)
    similarity.pq_residual_codes_cached(emb, _c, _a)
    similarity.pq_residual_codes_cached(emb, _c, _a, ksub=PQ_KSUB_WIDE)

    # release per-query checkpoint blocks between queries exactly like
    # bench.py, keeping only the session-shared indexes: without this the
    # suite accumulates every cut_lineage/persist block of 194 queries x 2
    # runs and storage pressure inflates later builds 3-10x (r13 found
    # create_batch_ingest "build 2.7 s" here vs 0.26 s total in bench)
    import bench as bench_mod

    out: dict[str, dict] = {}
    for name in names:
        rec: dict[str, float] = {}
        for run in ("run1", "run2"):
            t0 = time.perf_counter()
            df = q.QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()  # force planning
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            rec[f"{run}_build"] = round(t1 - t0, 3)
            rec[f"{run}_plan"] = round(t2 - t1, 3)
            rec[f"{run}_exec"] = round(t3 - t2, 3)
            rec[f"{run}_total"] = round(t3 - t0, 3)
            bench_mod.release_checkpoints(spark)
        out[name] = rec
        print(
            f"{name}: total {rec['run2_total']:.2f} "
            f"(build {rec['run2_build']:.2f} plan {rec['run2_plan']:.2f} "
            f"exec {rec['run2_exec']:.2f}) [run1 {rec['run1_total']:.2f}]",
            flush=True,
        )

    with open("/tmp/profile_queries.json", "w") as f:
        json.dump(out, f, indent=1)

    tot = sorted(out.items(), key=lambda kv: -kv[1]["run2_total"])
    print("\n== slowest steady-state ==")
    for name, rec in tot[:25]:
        print(
            f"{name}: {rec['run2_total']:.2f} = build {rec['run2_build']:.2f} "
            f"+ plan {rec['run2_plan']:.2f} + exec {rec['run2_exec']:.2f}"
        )
    b = sum(r["run2_build"] for r in out.values())
    p = sum(r["run2_plan"] for r in out.values())
    e = sum(r["run2_exec"] for r in out.values())
    print(
        f"\nsuite steady-state: build {b:.1f}s plan {p:.1f}s exec {e:.1f}s "
        f"total {b + p + e:.1f}s over {len(out)} queries"
    )
    spark.stop()


if __name__ == "__main__":
    main()
