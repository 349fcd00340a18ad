"""Deterministic cardinality / frequency sketches.

At 100 TB, exact distinct counts and exact per-item frequencies are the
expensive queries: both shuffle every distinct value. The standard fix is
a sketch — a small summary mergeable across partitions. Spark's built-ins
(``approx_count_distinct`` HLL, ``count_min_sketch``) are seeded/engine
-specific and can't be reproduced by the DuckDB oracle, so this module
implements two classic sketches from md5-derived hashes
(functions.hashing.hex_hash64), making every estimate bit-identical across
engines while keeping the sketch-shaped plan:

- **KMV (k-minimum-values)** distinct estimator: keep the k smallest
  distinct hash values; estimate = (k-1) / normalized kth minimum. The
  per-group state is k longs regardless of cardinality.
- **Count-min sketch**: depth x width counter grid; an item's estimate is
  the min of its depth bucket counts. The sketch table is depth*width rows
  total — constant size — no matter how many tokens the corpus has.

Both are pure DataFrame plans (explode + groupBy), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import iround_ratio
from ..functions.hashing import hex_hash64
from ..functions.partitioning import spread
from ..functions.textfns import tokens

KMV_K = 64
KMV_SALT_BUCKETS = 32
#: hex_hash64 draws 15 hex chars = 60 uniform bits
HASH_SPACE = float(1 << 60)

CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_SEED_BASE = 1000
CMS_TOPK = 20


def kmv_distinct_tokens(
    documents: DataFrame,
    k: int = KMV_K,
    salt_buckets: int = KMV_SALT_BUCKETS,
) -> DataFrame:
    """Per-source distinct-token estimate via a k-minimum-values sketch,
    reported next to the exact count so the error is visible.

    Scale shape: the distinct (source, hash) set is reduced to the k
    smallest hashes per source with the same two-phase salted top-k as
    operators.corpus.source_cap — phase 1 ranks within (source, salt)
    slices and keeps k per slice (so no source ever funnels through one
    task), phase 2 ranks the <= salt_buckets*k survivors. The sketch
    estimate then reads ONE row per source. The exact count (one shuffle
    of every distinct token) is the cost the sketch avoids at 100 TB; it
    is computed here as the oracle-checked accuracy reference.

    Estimate: (k-1) * 2^60 / kth_min_hash (the classic KMV estimator with
    hashes uniform on [0, 2^60)); when a source has fewer than k distinct
    tokens the sketch holds them all and the estimate is the exact count.
    """
    ex = spread(documents).select(
        "source", F.explode(tokens(F.col("text"))).alias("t")
    )
    hs = ex.select("source", hex_hash64(F.col("t")).alias("h")).distinct()
    order = [F.col("h").asc()]
    w1 = Window.partitionBy("source", "_salt").orderBy(*order)
    w2 = Window.partitionBy("source").orderBy(*order)
    topk = (
        hs.withColumn("_salt", F.col("h") % salt_buckets)
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= k)
        .withColumn("_rk", F.row_number().over(w2))
        .filter(F.col("_rk") <= k)
        .groupBy("source")
        .agg(
            F.max("h").alias("kth_hash"),
            F.count(F.lit(1)).alias("k_actual"),
        )
    )
    exact = ex.groupBy("source").agg(
        F.countDistinct("t").alias("exact_distinct")
    )
    est = F.when(
        F.col("k_actual") < k, F.col("k_actual").cast("double")
    ).otherwise(
        # round-ok: KMV estimator — the denominator is a ~2^63 pseudo-random
        # hash, so the quotient's distance to any 5th-decimal midpoint is
        # uniform at ~2^-63 granularity (P[ulp-coincidence] ~ 1e-12); both
        # engines evaluate the identical double DAG
        F.round(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("kth_hash"), 4)
    )
    return exact.join(topk, "source").select(
        "source",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        F.col("kth_hash").cast("long").alias("kth_hash"),
        est.alias("kmv_estimate"),
    )


QSK_K = 1024


def quantile_sketch_prices(
    lineitem: DataFrame, k: int = QSK_K, exact: bool = True
) -> DataFrame:
    """Quartiles of l_extendedprice from a deterministic hash sample,
    reported next to a full-column reference leg so the error is visible.

    The sample is the ``k`` rows with the smallest md5 hash of the row key
    (orderkey, linenumber) — a uniform random sample that is FIXED across
    runs, partitionings, and engines, selected by one TakeOrdered pass
    (distributed per-partition heaps, k rows to the driver side of the
    plan; no global sort). Quantile interpolation then runs on k rows.

    The reference leg has two variants: ``exact=True`` (the interpolated
    ``percentile`` over every row — buffers the column on one reducer,
    kept as the oracle-checked accuracy baseline) and ``exact=False``
    (the scale twin: mergeable fixed-size ``approx_percentile``, bounded
    memory at any corpus size, discrete value-at-rank semantics that are
    engine-exact below ``analytics.PCTL_ACCURACY`` rows, so the twin is
    itself oracle-checked against DuckDB ``quantile_disc``; columns named
    ``ref_p*``).
    """
    from .analytics import PCTL_ACCURACY

    # the hash rides only on the sample leg — the reference leg reads
    # price alone (no per-row md5), and each leg computes all three
    # quartiles through ONE percentile buffer (array percentage), not 3
    quartiles = F.percentile("price", F.lit([0.25, 0.50, 0.75]))
    keyed = spread(lineitem).select(
        F.col("l_extendedprice").cast("double").alias("price"),
        hex_hash64(
            F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
        ).alias("h"),
    )
    sample = keyed.orderBy("h", "price").limit(k)
    est = sample.agg(quartiles.alias("q")).select(
        F.round(F.col("q")[0], 4).alias("est_p25"),
        F.round(F.col("q")[1], 4).alias("est_p50"),
        F.round(F.col("q")[2], 4).alias("est_p75"),
    )
    if exact:
        ref_q, prefix = quartiles, "exact"
    else:
        ref_q = F.expr(
            f"approx_percentile(price, array(0.25D, 0.5D, 0.75D), {PCTL_ACCURACY})"
        )
        prefix = "ref"
    ref = (
        spread(lineitem)
        .select(F.col("l_extendedprice").cast("double").alias("price"))
        .agg(ref_q.alias("q"))
        .select(
            F.round(F.col("q")[0], 4).alias(f"{prefix}_p25"),
            F.round(F.col("q")[1], 4).alias(f"{prefix}_p50"),
            F.round(F.col("q")[2], 4).alias(f"{prefix}_p75"),
        )
    )
    return est.crossJoin(F.broadcast(ref))


def _cms_buckets(col: F.Column, depth: int, width: int) -> F.Column:
    """array of the item's bucket per sketch row r: hash(item, seed_r) % width."""
    return F.array(
        *[hex_hash64(col, CMS_SEED_BASE + r) % width for r in range(depth)]
    )


def cms_token_counts(
    documents: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    topk: int = CMS_TOPK,
) -> DataFrame:
    """Count-min-sketch token frequencies, validated against exact counts
    for the corpus's ``topk`` most frequent tokens.

    The sketch build is one pass: each token occurrence posexplodes to its
    ``depth`` (row, bucket) cells and a groupBy reduces to the
    depth x width counter grid — map-side combine means the shuffle moves
    at most depth*width rows per partition, and the finished sketch is
    ~4k rows no matter the corpus size (the thing worth broadcasting,
    persisting, and merging across days at 100 TB). Estimates read the
    sketch with a broadcast join; CMS guarantees estimate >= true count,
    with overestimates only from bucket collisions.

    The exact top-k side is a TakeOrdered (distributed heap per partition,
    k rows to the driver) — not a global sort.
    """
    ex = spread(documents).select(F.explode(tokens(F.col("text"))).alias("t"))
    cells = ex.select(
        F.posexplode(_cms_buckets(F.col("t"), depth, width)).alias("r", "bucket")
    )
    sketch = cells.groupBy("r", "bucket").agg(F.count(F.lit(1)).alias("cnt"))

    true_top = (
        ex.groupBy("t")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.col("true_count").desc(), F.col("t").asc())
        .limit(topk)
    )
    probes = true_top.select(
        "t",
        "true_count",
        F.posexplode(_cms_buckets(F.col("t"), depth, width)).alias("r", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("t")
        .agg(
            F.first("true_count").alias("true_count"),
            F.min("cnt").alias("cms_count"),
        )
        .select(
            F.col("t").alias("token"),
            F.col("true_count").cast("long").alias("true_count"),
            F.col("cms_count").cast("long").alias("cms_count"),
        )
    )


def kmv_source_overlap(
    documents: DataFrame,
    n: int | None = None,
    k: int = KMV_K,
    salt_buckets: int = KMV_SALT_BUCKETS,
    exact: bool = True,
) -> DataFrame:
    """Cross-source overlap from KMV sketches — the sketch twin of
    ``corpus.source_overlap``: per source pair, the estimated union size,
    the estimated n-gram Jaccard, and (``exact=True``, the accuracy
    reference) the exact Jaccard next to it so the sketch error is
    visible (the kmv_distinct_tokens disclosure pattern). ``exact=False``
    is the SCALE mode — registered as ``source_overlap_kmv_scaled`` —
    which never materializes the full per-source gram sets into a
    pairwise self-join: after the sketch top-k, every downstream relation
    is ≤ 2k rows per source pair.

    KMV set algebra (Beyer et al., "On Synopses for Distinct-Value
    Estimation Under Multiset Operations", SIGMOD'07): the k smallest
    hashes of A ∪ B are computable from the two per-set sketches alone,
    so |A ∪ B| uses the standard (k−1)·H/kth estimator, and the fraction
    of the merged sketch's members present in BOTH sketches is an
    unbiased Jaccard estimate. At 100 TB this replaces the exact pairwise
    gram intersection (a full self-join on gram) with per-source
    sketches of k longs — sources² pair math on ≤ 2k rows per pair; the
    exact legs computed here are the cost the sketch avoids, carried as
    the oracle-checked accuracy reference.

    Output: (source_a, source_b, k_union, n_both, union_est,
    jaccard_est, jaccard_exact), one row per unordered source pair.
    """
    from .corpus import OVERLAP_NGRAM
    from .dedup import shingle_table

    if n is None:
        n = OVERLAP_NGRAM
    from ..functions.checkpoint import cut_lineage

    src = spread(documents).select("doc_id", "source")
    sg = (
        shingle_table(documents, n)
        .join(src, "doc_id")
        .select("source", F.explode("shingles").alias("gram"))
        .select("source", hex_hash64(F.col("gram")).alias("h"))
        .distinct()
    )
    if exact:
        # the exact legs read sg three more times (sizes + both sides of
        # the gram self-join); Catalyst does not share subplans, so the
        # un-cut plan replayed tokenize+shingle+md5+distinct 4x (the r12
        # plan dump shows four copies of the Generate subtree).
        # Materialize once — at scale this is "persist the gram table",
        # which the exact reference would need anyway.
        sg = cut_lineage(sg)
    # per-source k smallest hashes, two-phase salted top-k (no source
    # funnels through one task)
    order = [F.col("h").asc()]
    w1 = Window.partitionBy("source", "_salt").orderBy(*order)
    w2 = Window.partitionBy("source").orderBy(*order)
    sk = (
        sg.withColumn("_salt", F.col("h") % salt_buckets)
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= k)
        .withColumn("_rk", F.row_number().over(w2))
        .filter(F.col("_rk") <= k)
        .select("source", "h")
    )
    # sk feeds the pair frame AND the pair-extension join: cutting the
    # (tiny, n_sources x k) sketch table stops the second replay of the
    # whole gram -> two-phase-top-k chain in both the exact and scaled
    # variants.
    sk = cut_lineage(sk)
    srcs = sk.select("source").distinct()
    pr = (
        srcs.alias("x")
        .join(srcs.alias("y"), F.col("x.source") < F.col("y.source"))
        .select(
            F.col("x.source").alias("source_a"),
            F.col("y.source").alias("source_b"),
        )
    )
    # merged sketch per pair: k smallest of K(a) ∪ K(b), membership flags
    ext = pr.join(
        sk,
        (F.col("source") == F.col("source_a"))
        | (F.col("source") == F.col("source_b")),
    )
    uh = ext.groupBy("source_a", "source_b", "h").agg(
        F.max(
            F.when(F.col("source") == F.col("source_a"), 1).otherwise(0)
        ).alias("ia"),
        F.max(
            F.when(F.col("source") == F.col("source_b"), 1).otherwise(0)
        ).alias("ib"),
    )
    wp = Window.partitionBy("source_a", "source_b").orderBy(F.col("h").asc())
    agg = (
        uh.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= k)
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("h").alias("kth"),
            F.sum(
                F.when((F.col("ia") == 1) & (F.col("ib") == 1), 1).otherwise(0)
            ).alias("n_both"),
        )
    )
    union_est = F.when(
        F.col("cnt") < k, F.col("cnt").cast("double")
    ).otherwise(
        # round-ok: KMV estimator — the denominator is a ~2^63 pseudo-random
        # hash, so the quotient's distance to any 5th-decimal midpoint is
        # uniform at ~2^-63 granularity (P[ulp-coincidence] ~ 1e-12); both
        # engines evaluate the identical double DAG
        F.round(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("kth"), 4)
    )
    if not exact:
        # sketch-only scale mode: the gram self-join never happens —
        # one distinct-gram scan builds the sketches, everything after
        # is pair math on ≤ 2k rows per pair
        return agg.select(
            "source_a",
            "source_b",
            F.col("cnt").cast("long").alias("k_union"),
            F.col("n_both").cast("long").alias("n_both"),
            union_est.alias("union_est"),
            # exact-int ratio => midpoint-exposed; integer div-round
            iround_ratio(F.col("n_both"), F.col("cnt"), 6).alias(
                "jaccard_est"
            ),
        )
    # exact reference legs (what the sketch replaces at scale)
    sizes = sg.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    a = sg.select(F.col("source").alias("source_a"), "h")
    b = sg.select(F.col("source").alias("source_b"), "h")
    common = (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    z = F.lit(0).cast("long")
    return (
        agg.join(
            sizes.select(F.col("source").alias("source_a"), F.col("n_grams").alias("n_a")),
            "source_a",
        )
        .join(
            sizes.select(F.col("source").alias("source_b"), F.col("n_grams").alias("n_b")),
            "source_b",
        )
        .join(common, ["source_a", "source_b"], "left_outer")
        .select(
            "source_a",
            "source_b",
            F.col("cnt").cast("long").alias("k_union"),
            F.col("n_both").cast("long").alias("n_both"),
            union_est.alias("union_est"),
            # exact-int ratios => midpoint-exposed; integer div-round
            iround_ratio(F.col("n_both"), F.col("cnt"), 6).alias(
                "jaccard_est"
            ),
            iround_ratio(
                F.coalesce(F.col("c"), z),
                F.col("n_a") + F.col("n_b") - F.coalesce(F.col("c"), z),
                6,
            ).alias("jaccard_exact"),
        )
    )


HLL_P = 8
HLL_M = 1 << HLL_P  # 256 buckets
#: hex_hash64 yields 60 uniform bits; 8 go to the bucket, 52 remain for
#: the rank pattern, so ranks live in [1, 53] (53 = the all-zero word).
HLL_MAX_RANK = 53


def hll_constant(m: int = HLL_M) -> float:
    """The estimator's constant numerator ``alpha_m · m² · 2^53``, folded
    to ONE Python double so the Spark plan and the SQL oracle divide the
    IDENTICAL literal by the integer harmonic sum (a DuckDB ``0.7213``
    literal is DECIMAL, not DOUBLE — re-deriving alpha in SQL would
    round differently)."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * float(m * m) * float(1 << HLL_MAX_RANK)


def hll_distinct_users(events: DataFrame, m: int = HLL_M) -> DataFrame:
    """Per-event-type distinct-user estimate via a deterministic
    HyperLogLog sketch (Flajolet et al. 2007), reported next to the
    exact count so the error is visible — completing the sketch trio
    (KMV distinct, count-min frequency, HLL distinct) with the one whose
    per-group state is a CONSTANT 256 bytes however many users exist.

    Spark's own ``approx_count_distinct`` is this sketch, but its hash is
    engine-private; building it from the md5-derived ``hex_hash64`` keeps
    the estimate bit-identical in the DuckDB oracle.

    Scale shape: the plan never shuffles a distinct value. Each row maps
    to (bucket = h mod m, rank = leading-zero count of the remaining 52
    bits + 1) and ``groupBy(type, bucket).max(rank)`` is partial-
    aggregable — map-side combine reduces every partition to ≤ types·m
    rows before the only (tiny) exchange. Compare the exact twin: ONE
    shuffle of every distinct (type, user) pair, the cost this sketch
    avoids at 100 TB; it is computed here as the oracle-checked accuracy
    reference (the ``kmv_distinct_tokens`` disclosure pattern).

    Determinism: the harmonic sum folds integers — each bucket
    contributes ``2^(53 - max_rank)`` (absent buckets ``2^53``), so the
    per-type sum is an exact BIGINT ≤ m·2^53 = 2^61 and order-independent
    (a float ``sum(2^-rank)`` would round: 1 + 2^-53 is not a double).
    The estimator ``alpha_m · m² · 2^53 / S`` is then a constant times
    one integer→double division — reproducible across engines. The raw
    estimator is reported WITHOUT the small-range linear-counting
    correction (ln(m/V) is libm-dependent in its last ulp); the empty-
    bucket count V is emitted so a consumer can apply it, and the exact
    leg carries the truth at any range.
    """
    p = m.bit_length() - 1
    if 1 << p != m:
        raise ValueError("hll bucket count must be a power of two")
    h = hex_hash64(F.col("user_id").cast("string"))
    # the low p bits pick the bucket, the high 52 the rank word — both
    # via EXACT integer ops (h has 60 bits; a double division of h would
    # round above 2^53 and disagree with the oracle's integer `//`)
    w = F.shiftright(h, p)
    rank = F.when(w == 0, F.lit(HLL_MAX_RANK)).otherwise(
        F.lit(HLL_MAX_RANK) - F.length(F.bin(w))
    )
    buckets = (
        events.select(
            "event_type", (h % m).alias("bucket"), rank.alias("r")
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("r").alias("mr"))
    )
    const = hll_constant(m)
    sketch = buckets.groupBy("event_type").agg(
        (
            F.sum(F.expr(f"shiftleft(1L, {HLL_MAX_RANK} - mr)"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << HLL_MAX_RANK)
        ).alias("s_int"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("empty_buckets"),
    )
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    return (
        sketch.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
# round-ok: HLL estimator — the alpha constant is an irrational-valued
# double literal shared verbatim with the oracle; exact decimal
# midpoints are measure-zero
            F.round(
                F.lit(const) / F.col("s_int").cast("double"), 4
            ).alias("hll_estimate"),
            "empty_buckets",
# round-ok: HLL estimator — the alpha constant is an irrational-valued
# double literal shared verbatim with the oracle; exact decimal
# midpoints are measure-zero
            F.round(
                (F.lit(const) / F.col("s_int").cast("double"))
                / F.col("n_exact").cast("double")
                - 1.0,
                6,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


def join_size_estimate(
    left: DataFrame,
    lkey: str,
    right: DataFrame,
    rkey: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    exact: bool = True,
) -> DataFrame:
    """Pre-join cardinality estimation — the planning question every
    100 TB join should answer BEFORE it runs ("will clickstream ⋈ orders
    blow up?"): the exact join size Σ_k cL(k)·cR(k) next to the
    count-min-sketch INNER-PRODUCT estimate min_r Σ_b L_r[b]·R_r[b]
    (Cormode & Muthukrishnan's CM dot product — an upper bound whose
    error collisions drive, so estimate ≥ exact always).

    Scale shape: the sketch path never materializes per-key counts —
    each side folds to its constant depth×width counter grid in one
    map-side-combined pass (≤ 4k rows per side whatever the input), and
    the inner product is a join of two tiny grids; that is the piece a
    planner would persist per table and dot against ANY other table's
    sketch. The exact side (per-key count join) is the disclosed
    accuracy reference — itself keys ≪ rows, but still proportional to
    the key cardinality the sketch path avoids.

    Determinism: counts are exact integers; products/sums run
    DECIMAL(38,0) (cL·cR at 100 TB overflows int64) against the
    oracle's HUGEINT-capable decimals; the overestimate ratio is the
    single rounded double division. NULL keys join nothing and are
    excluded on both sides, counted separately upstream by
    `referential_audit`.

    ``exact=False`` is the SCALE mode (registered as
    ``join_cardinality_scaled`` — the source_overlap_kmv_scaled
    registration lesson): the per-key count join is exactly the cost the
    sketch exists to avoid, so the twin never materializes per-key
    counts at all — grids only, n_left/n_right/cms_estimate out.
    """
    dec = "decimal(38,0)"

    def side(df, key):
        s = df.filter(F.col(key).isNotNull()).select(
            F.col(key).cast("string").alias("k")
        )
        cells = s.select(
            F.posexplode(_cms_buckets(F.col("k"), depth, width)).alias(
                "r", "bucket"
            )
        )
        sketch = cells.groupBy("r", "bucket").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        counts = (
            s.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("c"))
            if exact
            else None
        )
        n = s.agg(F.count(F.lit(1)).cast("long").alias("n"))
        return sketch, counts, n

    ls, lc, ln = side(left, lkey)
    rs, rc, rn = side(right, rkey)
    exact_pairs = (
        lc.withColumnRenamed("c", "cl")
        .join(rc.withColumnRenamed("c", "cr"), "k")
        .agg(
            F.coalesce(
                F.sum(F.col("cl").cast(dec) * F.col("cr").cast(dec)),
                F.lit(0).cast(dec),
            ).alias("exact_pairs")
        )
        if exact
        else None
    )
    per_r = (
        ls.withColumnRenamed("cnt", "cl")
        .join(rs.withColumnRenamed("cnt", "cr"), ["r", "bucket"])
        .groupBy("r")
        .agg(F.sum(F.col("cl").cast(dec) * F.col("cr").cast(dec)).alias("ipr"))
    )
    # every sketch row must vote in the min — a row whose cell overlap is
    # EMPTY has inner product 0 (and 0 is then the estimate), which the
    # inner join alone would silently drop
    all_r = left.sparkSession.range(depth).select(F.col("id").cast("int").alias("r"))
    est = (
        all_r.join(per_r, "r", "left")
        .agg(
            F.min(F.coalesce(F.col("ipr"), F.lit(0).cast(dec))).alias(
                "cms_estimate"
            )
        )
    )
    base = ln.select(F.col("n").alias("n_left")).crossJoin(
        rn.select(F.col("n").alias("n_right"))
    )
    if not exact:
        return base.crossJoin(est).select(
            "n_left",
            "n_right",
            F.col("cms_estimate").cast("double").alias("cms_estimate"),
        )
    return (
        base.crossJoin(exact_pairs)
        .crossJoin(est)
        .select(
            "n_left",
            "n_right",
            # exact DECIMAL(38,0) internally; the OUTPUT is double (the
            # oracle's HUGEINT sums reach pandas as float64 anyway, and a
            # size estimate needs magnitude, not the last digit)
            F.col("exact_pairs").cast("double").alias("exact_pairs"),
            F.col("cms_estimate").cast("double").alias("cms_estimate"),
            # exact-int ratio => midpoint-exposed; integer div-round
            F.when(
                F.col("exact_pairs") > 0,
                iround_ratio(F.col("cms_estimate"), F.col("exact_pairs"), 6),
            ).alias("overestimate"),
        )
    )
