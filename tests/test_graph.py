"""PageRank over pair graphs: determinism + structure."""

from __future__ import annotations

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    graph,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_pagerank_star_center_dominates(spark):
    # star: 1 connected to 2,3,4,5 — the hub must outrank every leaf
    pr = {
        r.doc_id: r.rank
        for r in graph.pagerank(
            _pairs(spark, [(1, 2), (1, 3), (1, 4), (1, 5)])
        ).collect()
    }
    assert pr[1] > pr[2]
    assert len({pr[2], pr[3], pr[4], pr[5]}) == 1  # symmetric leaves tie
    # rank mass conserved up to integer-division remainders
    assert abs(sum(pr.values()) - 1.0) < 1e-3


def test_pagerank_deterministic_across_partitionings(spark):
    edges = [(i, (i * 3) % 17 + 20) for i in range(1, 17)]
    a = {r.doc_id: r.rank_q for r in graph.pagerank(_pairs(spark, edges)).collect()}
    b = {
        r.doc_id: r.rank_q
        for r in graph.pagerank(_pairs(spark, edges).repartition(7)).collect()
    }
    assert a == b  # exact integer equality, any partitioning


def test_pagerank_uniform_on_regular_graph(spark):
    # a 4-cycle is 2-regular: ranks stay exactly uniform
    pr = {
        r.doc_id: r.rank_q
        for r in graph.pagerank(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])).collect()
    }
    assert len(set(pr.values())) == 1


def test_triangle_count_k4_plus_tail(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        graph,
    )

    # K4 on {1,2,3,4} -> 4 triangles, each node in 3; tail edge 4-9 adds
    # none; duplicate edge input must not double-count
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 9), (2, 1)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = {r.doc_id: r.triangles for r in graph.triangle_count(pairs).collect()}
    assert out[-1] == 4
    assert out[1] == out[2] == out[3] == out[4] == 3
    assert 9 not in out  # participates in no triangle
