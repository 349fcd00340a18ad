"""Graph analytics over candidate-pair edge lists: PageRank.

Complements ``dedup.connected_components`` (which labels near-dup
clusters) with an influence score over the same graph — e.g. rank the
most-duplicated documents, the hub assets in a fleet graph.

Determinism design: floating-point PageRank is NOT reproducible across
partitionings (neighbor contributions sum in shuffle order), so every
quantity here is integer pico-units (1e-12): contributions divide with
integer ``div``, the damping factor applies as 17/20, and the per-node
sum of longs is exact — bit-identical across engines, partition counts,
and retries, which is what lets the DuckDB oracle check 5 iterations of
an iterative algorithm to the last digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import iround_ratio
from ..functions.checkpoint import cut_lineage

SCALE = 1_000_000_000_000  # pico-units
PR_ITERS = 5
#: damping 0.85 = 17/20, applied in integer arithmetic


def pagerank(pairs: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """PageRank over an undirected pair list (doc_a, doc_b), ``iters``
    synchronous iterations from a uniform start.

    Per iteration: one join (ranks onto edge sources) + one groupBy on
    the destination — both shuffles on the node key, map-side combined;
    the rank table is lineage-cut per round so plan depth stays constant
    (same shape as connected_components). Degrees are computed once.
    Every node of the pair graph appears in the output; rank mass is
    conserved up to integer-division remainders (bounded by N pico-units
    per iteration).

    Returns (doc_id, rank_q pico-units, rank double).
    """
    both = F.explode(
        F.array(
            F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
            F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
        )
    )
    edges = cut_lineage(pairs.select(both.alias("e")).select("e.src", "e.dst"))
    degs = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = degs.agg(F.count(F.lit(1)).alias("__n"))

    # integer constants derived from N: uniform start SCALE div N and the
    # teleport term (1-d) * SCALE / N = (3 * SCALE) div (20 * N)
    ranks = degs.crossJoin(F.broadcast(n_nodes)).select(
        F.col("src").alias("doc_id"),
        F.expr(f"{SCALE} div __n").alias("rank_q"),
        "deg",
        "__n",
    )
    for _ in range(iters):
        contrib = (
            edges.join(
                ranks.select("doc_id", "rank_q", "deg"),
                edges.src == F.col("doc_id"),
            )
            .select("dst", F.expr("rank_q div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("__s"))
        )
        ranks = cut_lineage(
            ranks.join(contrib, ranks.doc_id == contrib.dst, "left")
            .select(
                "doc_id",
                F.expr(
                    f"(3 * {SCALE}) div (20 * __n) + (17 * coalesce(__s, 0)) div 20"
                ).alias("rank_q"),
                "deg",
                "__n",
            )
        )
    return ranks.select(
        "doc_id",
        "rank_q",
        # exact-int ratio (quantized rank / SCALE) => integer div-round
        iround_ratio(F.col("rank_q"), F.lit(SCALE), 9).alias("rank"),
    )


def triangle_count(pairs: DataFrame) -> DataFrame:
    """Global + per-node triangle counts over an undirected pair list —
    the clustering-cohesion metric of the near-dup graph (a dense
    triangle neighborhood = one heavily-mirrored document family).

    Node-iterator with DEGREE ORDERING, the standard scale trick: orient
    every edge from the lower-(degree, id) endpoint to the higher, so
    each triangle is counted exactly once at its lowest-degree corner
    and the wedge join fans out by min-degree — on skewed (power-law)
    graphs this bounds the per-key wedge explosion that a naive
    edge²/node join suffers at hub nodes. Plan: degree groupBy, one
    self-join of the oriented edge list on its source (wedges), one
    equi-join of wedges against oriented edges (closure check) — all
    shuffles on node/edge keys.

    Output: one row per node that participates in ≥1 triangle
    (doc_id, triangles), plus the graph total under doc_id = -1.
    """
    both = F.explode(
        F.array(
            F.struct(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")),
            F.struct(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")),
        )
    )
    edges = cut_lineage(
        pairs.select(both.alias("e")).select("e.u", "e.v").distinct()
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ranked = (
        edges.join(deg.withColumnRenamed("u", "__du"), F.col("u") == F.col("__du"))
        .withColumnRenamed("deg", "deg_u")
        .drop("__du")
        .join(deg.withColumnRenamed("u", "__dv"), F.col("v") == F.col("__dv"))
        .withColumnRenamed("deg", "deg_v")
        .drop("__dv")
    )
    # orient: keep the edge only in its (degree, id)-ascending direction
    oriented = cut_lineage(
        ranked.filter(
            (F.col("deg_u") < F.col("deg_v"))
            | ((F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v")))
        ).select("u", "v")
    )
    w1 = oriented.select(F.col("u").alias("a"), F.col("v").alias("b"))
    w2 = oriented.select(F.col("u").alias("a2"), F.col("v").alias("c"))
    wedges = w1.join(w2, (F.col("a") == F.col("a2")) & (F.col("b") < F.col("c"))).select(
        "a", "b", "c"
    )
    # closure: (b, c) or (c, b) must be an oriented edge; orientation makes
    # exactly one direction present, so one equi-join on the normalized key
    closing = oriented.select(
        F.least("u", "v").alias("lo"), F.greatest("u", "v").alias("hi")
    )
    tris = wedges.join(
        closing,
        (F.least("b", "c") == F.col("lo")) & (F.greatest("b", "c") == F.col("hi")),
        "left_semi",
    )
    per_corner = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    total = tris.agg(F.count(F.lit(1)).alias("triangles")).select(
        F.lit(-1).cast("long").alias("doc_id"), "triangles"
    )
    return per_corner.unionByName(total).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("triangles").cast("long").alias("triangles"),
    )
