"""Dump .explain("formatted") for queries into plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]   (default: all)
e.g.   python tools/dump_plans.py r12 before ann_recall_sweep
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark import (  # noqa: E402
    queries as q,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or list(q.QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        df = q.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
