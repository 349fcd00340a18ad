"""Physical-plan contracts (SURVEY §5): right answers AND right plans.

A refactor that silently drops a broadcast hint, breaks filter pushdown, or
introduces row-at-a-time Python evaluation should fail here the same way a
wrong answer would — at 100 TB those regressions are outages, not slowdowns.
"""

from __future__ import annotations

import pytest

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark import (
    queries as q,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.plans import (
    checks,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dfs(spark):
    return {name: fn(spark, SF_DIR) for name, fn in q.QUERIES.items()}


def test_no_unpartitioned_window_in_any_registered_query(dfs):
    """Suite-wide contract: NO registered query may contain a Window with
    an empty partitionSpec (the whole-relation-through-one-task shape that
    reintroduced itself in r9's abc_pareto after being fixed in Q15 at r5).
    Windows over a GlobalLimit-bounded subtree (pagination) are exempt —
    see checks.unpartitioned_windows. Catching the next one at authoring
    time is the point: this sweeps every entry, including future ones."""
    bad = {
        name: w
        for name, df in dfs.items()
        if (w := checks.unpartitioned_windows(df))
    }
    assert not bad, f"partition-less WindowExec in: {bad}"


def test_q1_filter_pushed_to_scan_and_columns_pruned(dfs):
    df = dfs["q1_pricing_summary"]
    assert checks.has_pushed_filter(df, "l_shipdate"), checks.pushed_filters(df)
    # scan must read only the 7 needed columns, not all 16 of lineitem
    schemas = [s for s in checks.read_schemas(df) if "l_returnflag" in s]
    assert schemas, checks.read_schemas(df)
    assert all(len(s.split(",")) <= 7 for s in schemas), schemas
    assert not checks.uses_python_eval(df)
    assert checks.codegen_stage_count(df) >= 1


def test_q3_customer_join_degrades_to_shuffle_when_dim_large(spark):
    """Q3 must NOT pin a static broadcast on customer (150k × SF rows —
    the segment filter keeps ~1/5, still linear in SF; a pinned hint OOMs
    at 100×). Under the default threshold the filtered customer set
    broadcasts; with the threshold off the join degrades to a shuffle."""
    df_small = q.QUERIES["q3_shipping_priority"](spark, SF_DIR)
    assert checks.count_broadcast_joins(df_small) >= 1, checks.plan_string(df_small)
    assert checks.has_pushed_filter(df_small, "o_orderdate")
    assert checks.has_pushed_filter(df_small, "l_shipdate")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df_large = q.QUERIES["q3_shipping_priority"](spark, SF_DIR)
        assert checks.count_broadcast_joins(df_large) == 0, checks.plan_string(df_large)
        assert checks.count_shuffle_exchanges(df_large) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_q5_dims_broadcast_but_supplier_degrades_when_large(spark):
    """region→nation stay statically broadcast (constant 5/25 rows at any
    SF), but supplier (10k × SF rows) must be AQE-sized: broadcast in the
    small regime, shuffle join once it would outgrow the threshold."""
    df_small = q.QUERIES["q5_local_supplier_volume"](spark, SF_DIR)
    assert checks.count_broadcast_joins(df_small) >= 3, checks.plan_string(df_small)
    assert checks.count_shuffle_exchanges(df_small) <= 4
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df_large = q.QUERIES["q5_local_supplier_volume"](spark, SF_DIR)
        # only the two pinned constant-size dims (region-filter, nations)
        # may still broadcast; supplier/customer/orders all shuffle
        import re as _re

        simple = checks.plan_string(df_large, "simple")
        assert len(_re.findall(r"BroadcastHashJoin", simple)) == 2, simple
        assert checks.count_shuffle_exchanges(df_large) >= 3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_q15_no_unpartitioned_window_single_lineitem_scan(spark):
    """Q15's winner filter is a broadcast scalar max, not a global Window
    (which funnels 10k × SF supplier rows through ONE task). The aggregate
    feeds both the max and the filter branch; ReuseExchange must collapse
    the identical shuffle subtrees so lineitem is scanned once."""
    df = q.QUERIES["q15_top_supplier"](spark, SF_DIR)
    plan = checks.plan_string(df, "simple")
    assert "Window" not in plan, plan
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in executed, executed
    # one live lineitem scan: AQE/ReuseExchange dedups the second branch
    import re as _re

    scans = _re.findall(r"lineitem", executed)
    reused = "ReusedExchange" in executed or "ReusedQueryStage" in executed
    assert len(scans) <= 1 or reused, executed


def test_batch_status_stays_jvm_side(dfs):
    df = dfs["batch_status"]
    assert not checks.uses_python_eval(df)
    assert checks.codegen_stage_count(df) >= 1


def test_dedup_ngram_no_python_bounded_shuffles(dfs):
    df = dfs["dedup_ngram_jaccard"]
    assert not checks.uses_python_eval(df)
    # explode → self-join → group → two size joins; anything beyond ~7
    # exchanges means a lost co-partitioning.
    assert checks.count_shuffle_exchanges(df) <= 7


def test_minhash_lsh_no_python_eval(dfs):
    df = dfs["dedup_minhash_lsh"]
    assert not checks.uses_python_eval(df)


def test_multimodal_uses_arrow_not_row_python(dfs):
    df = dfs["multimodal_bytes"]
    assert checks.uses_arrow_eval(df)
    assert not checks.uses_python_eval(df)


def test_no_headline_query_uses_row_python(dfs):
    offenders = [
        name
        for name, df in dfs.items()
        if checks.uses_python_eval(df)
    ]
    assert offenders == []


def test_events_rollup_prunes_columns(dfs):
    df = dfs["events_hourly_rollup"]
    schemas = [s for s in checks.read_schemas(df) if "event_type" in s]
    assert schemas
    # ts, event_type, value, user_id only
    assert all(len(s.split(",")) <= 4 for s in schemas), schemas


def test_corpus_ops_stay_jvm_side(dfs):
    for name in (
        "doc_chunks",
        "repetition_score",
        "corpus_shuffle",
        "corpus_stats",
        "train_split",
        "tfidf_top_terms",
    ):
        df = dfs[name]
        assert not checks.uses_python_eval(df), name


def test_contamination_broadcasts_benchmark_grams(dfs):
    """The benchmark gram set must be the broadcast side — shipping the
    (tiny) eval-suite grams to the corpus, never shuffling the corpus."""
    df = dfs["contamination_check"]
    assert checks.count_broadcast_joins(df) >= 1
    assert not checks.uses_python_eval(df)


def test_tfidf_shuffle_count_bounded(dfs):
    """tf (doc,term) + df (term) + rank (doc) = at most 5 exchanges incl.
    the input spread; a regression that adds per-row re-tokenization or an
    extra global shuffle trips this."""
    df = dfs["tfidf_top_terms"]
    assert checks.count_shuffle_exchanges(df) <= 5


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key co-join with ZERO exchanges —
    the bucketing contract write_bucketed exists to provide."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.catalog import (
        load_bucketed,
        write_bucketed,
    )

    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckdb LOCATION '{tmp_path}/wh'")
    try:
        docs = spark.range(0, 1000).selectExpr("id AS doc_id", "id % 7 AS grp")
        stats = spark.range(0, 1000).selectExpr("id AS doc_id", "id * 2 AS metric")
        write_bucketed(docs, "buckdb.docs_b", "doc_id", n_buckets=8)
        write_bucketed(stats, "buckdb.stats_b", "doc_id", n_buckets=8)
        # MERGE hint models the 100 TB case (both sides far beyond the
        # broadcast threshold — here the planner would broadcast instead)
        joined = (
            load_bucketed(spark, "buckdb.docs_b")
            .hint("merge")
            .join(load_bucketed(spark, "buckdb.stats_b"), "doc_id")
        )
        assert joined.count() == 1000
        assert checks.count_shuffle_exchanges(joined) == 0
        assert checks.count_broadcast_joins(joined) == 0  # a real merge join
    finally:
        spark.sql("DROP DATABASE IF EXISTS buckdb CASCADE")


def test_funnel_single_full_shuffle(dfs):
    # one hashpartitioning Exchange on user_id; the window chain, per-user
    # reduction, and final count reuse it (plus one SinglePartition move
    # of a row per partition)
    df = dfs["events_funnel"]
    assert checks.count_shuffle_exchanges(df) <= 2
    assert not checks.uses_python_eval(df)


def test_cohort_retention_bounded_shuffles(dfs):
    # user_id Exchange (window + distinct reuse it) + the tiny cell-count
    # aggregate; nothing else may shuffle
    df = dfs["cohort_retention"]
    assert checks.count_shuffle_exchanges(df) <= 2
    assert not checks.uses_python_eval(df)


def test_source_cap_salted_no_single_task_source(dfs):
    # two-phase top-N: (source, _salt) ranking then source ranking over
    # survivors — exactly two exchanges, none SinglePartition
    df = dfs["source_cap"]
    assert checks.count_shuffle_exchanges(df) == 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert not checks.uses_python_eval(df)


def test_text_normalize_zero_shuffle_scan_speed(dfs):
    df = dfs["text_normalize"]
    assert checks.count_shuffle_exchanges(df) == 0
    assert not checks.uses_python_eval(df)
    assert checks.codegen_stage_count(df) >= 1


# --- r3 operators ---------------------------------------------------------


def test_range_join_is_equi_join_not_cross(dfs):
    """The bucketed range join must plan as a hash equi-join on
    (user, bucket) — a BroadcastNestedLoopJoin here means the time
    predicate fell back to a per-user cross join."""
    df = dfs["range_join_follow"]
    plan = checks.plan_string(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    assert not checks.uses_python_eval(df)


def test_cms_sketch_is_broadcast_side(dfs):
    # the depth x width sketch is the summary: it must broadcast into the
    # probe join, never shuffle the probes against it
    df = dfs["cms_counts"]
    assert checks.count_broadcast_joins(df) >= 1
    assert not checks.uses_python_eval(df)


def test_boilerplate_drop_is_broadcast_anti_join(dfs):
    df = dfs["boilerplate_scrub"]
    plan = checks.plan_string(df)
    assert "LeftAnti, BuildRight" in plan or (
        "BroadcastHashJoin" in plan and "LeftAnti" in plan
    ), plan[:2000]
    assert not checks.uses_python_eval(df)


def test_contamination_bloom_prefilter_is_semi_join(dfs):
    df = dfs["contamination_bloom"]
    plan = checks.plan_string(df)
    assert "LeftSemi" in plan
    assert not checks.uses_python_eval(df)


def test_sketch_queries_stay_jvm_side(dfs):
    for name in ("distinct_kmv", "cms_counts", "price_quantile_sketch",
                 "unigram_logprob", "heavy_users_topk", "corpus_pipeline"):
        assert not checks.uses_python_eval(dfs[name]), name


def test_kmv_two_phase_no_single_partition_rank(dfs):
    # the per-source min-k must rank within (source, salt) slices first —
    # no SinglePartition exchange anywhere in the executed plan
    df = dfs["distinct_kmv"]
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_ivf_assignment_uses_arrow_not_join(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        similarity,
    )

    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cent = similarity.ivf_centroids(emb, nlist=8, iters=1)
    raw_assign = similarity._assign(
        emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("cv")),
        cent,
    )
    # vectorized Arrow path, no join: the plan is scan -> MapInPandas
    assert checks.uses_arrow_eval(raw_assign)
    assert checks.count_broadcast_joins(raw_assign) == 0
    assert checks.count_shuffle_exchanges(raw_assign) == 0
    cent2, assign = similarity.ivf_build(emb, nlist=8, iters=1)
    probe = similarity.ivf_probe(cent2, assign, emb.limit(5))
    assert not checks.uses_python_eval(probe)


def test_get_batch_point_lookup_pushes_key_to_both_scans(dfs):
    df = dfs["get_batch"]
    pushed = checks.pushed_filters(df)
    assert any("o_orderkey" in p and "7" in p for p in pushed), pushed
    assert any("l_orderkey" in p and "7" in p for p in pushed), pushed
    assert not checks.uses_python_eval(df)


def test_q18_customer_join_degrades_to_shuffle_when_dim_large(spark):
    """Q18's customer join must NOT pin a static broadcast: customer grows
    with the fact tables, so the plan has to degrade to a shuffle join the
    moment the dim side exceeds autoBroadcastJoinThreshold (at 100x a
    pinned broadcast OOMs every executor). Both regimes are exercised by
    moving the threshold; only the planner's size estimate changes."""
    # small regime: customer under the 10 MB default -> broadcast join
    df_small = q.QUERIES["q18_large_volume"](spark, SF_DIR)
    assert checks.count_broadcast_joins(df_small) >= 1, checks.plan_string(df_small)
    # large regime: threshold off simulates customer outgrowing it ->
    # the join must degrade to a shuffle join (no static hint pins it)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df_large = q.QUERIES["q18_large_volume"](spark, SF_DIR)
        assert checks.count_broadcast_joins(df_large) == 0, checks.plan_string(df_large)
        assert checks.count_shuffle_exchanges(df_large) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_domain_cap_salted_no_single_task_domain(dfs):
    # same two-phase salted top-N contract as source_cap, keyed on the
    # registrable domain extracted from the URL
    df = dfs["domain_cap"]
    assert checks.count_shuffle_exchanges(df) == 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert not checks.uses_python_eval(df)


def test_q7_two_nation_roles_broadcast_and_date_pushed(dfs):
    """Q7's nation dim joins the pipeline twice under different roles —
    both must be broadcasts — and the shipdate range must reach the
    lineitem scan."""
    df = dfs["q7_nation_volume"]
    assert checks.count_broadcast_joins(df) >= 2, checks.plan_string(df)
    assert checks.has_pushed_filter(df, "l_shipdate"), checks.pushed_filters(df)
    assert not checks.uses_python_eval(df)


def test_q6_all_four_predicates_push_to_scan(dfs):
    """Q6 is the pushdown proof: shipdate range, discount band, and the
    quantity cap must ALL reach the parquet scan, the read schema must
    carry only the needed columns, and the whole query must stay inside
    codegen with zero joins."""
    df = dfs["q6_forecast_revenue"]
    for col in ["l_shipdate", "l_discount", "l_quantity"]:
        assert checks.has_pushed_filter(df, col), checks.pushed_filters(df)
    schemas = [s for s in checks.read_schemas(df) if "l_extendedprice" in s]
    assert schemas and all(len(s.split(",")) <= 4 for s in schemas), schemas
    assert checks.count_broadcast_joins(df) == 0
    assert not checks.uses_python_eval(df)
    assert checks.codegen_stage_count(df) >= 1


def test_q15_scans_lineitem_once(dfs):
    """The max-of-aggregate must reuse the per-supplier aggregate, never
    rescan lineitem for the scalar max. The pre-execution plan shows two
    textual branches; the runtime guarantee (ReusedExchange collapses
    them) is pinned by test_q15_no_unpartitioned_window_single_lineitem
    _scan, which inspects the executed plan."""
    df = dfs["q15_top_supplier"]
    assert checks.has_pushed_filter(df, "l_shipdate"), checks.pushed_filters(df)
    assert not checks.uses_python_eval(df)


def test_q4_is_semi_join_not_inner(dfs):
    """Q4 must plan a LeftSemi hash join (orders counted once however many
    late lines exist) with the date range pushed to the orders scan."""
    df = dfs["q4_order_priority"]
    plan = checks.plan_string(df)
    assert "LeftSemi" in plan, plan
    assert checks.has_pushed_filter(df, "o_orderdate"), checks.pushed_filters(df)
    assert not checks.uses_python_eval(df)


def test_q22_anti_join_and_broadcast_threshold(dfs):
    """Q22: the recent-orderer exclusion must be an ANTI join and the
    scalar threshold a broadcast — no sort, no cartesian fallback."""
    df = dfs["q22_dormant_customers"]
    plan = checks.plan_string(df)
    assert "LeftAnti" in plan, plan
    assert checks.count_broadcast_joins(df) >= 1, plan
    assert "CartesianProduct" not in plan, plan
    assert not checks.uses_python_eval(df)


def test_scd2_union_carry_forward_no_join_no_python(dfs):
    """scd2_point_in_time must be the union/carry-forward plan: the fact
    table (the 100 TB side) is shuffled once for the carry window and
    NEVER joined against the interval table — a containment join would
    replicate every fact across its key's whole version history."""
    df = dfs["scd2_point_in_time"]
    assert not checks.uses_python_eval(df)
    plan = checks.plan_string(df, "simple")
    assert "Join" not in plan, plan
    # dim-side version window + union carry window (+ at most one AQE
    # coalesce artifact) — not one exchange per fact replica
    assert checks.count_shuffle_exchanges(df) <= 3


def test_rag_retrieve_probe_broadcasts_and_no_row_python(dfs):
    """rag_retrieve's ANN stage must broadcast the tiny sides (centroids,
    probe set) so the inverted file streams in place, and never fall back
    to row Python or a nested-loop join for the re-rank. (The assignment
    stage's Arrow contract is pinned separately by
    test_ivf_assignment_uses_arrow_not_join — its MapInPandas node is
    hidden here behind the inverted file's lineage cut.)"""
    df = dfs["rag_retrieve"]
    assert not checks.uses_python_eval(df)
    assert checks.count_broadcast_joins(df) >= 2
    # the only nested-loop join allowed is ivf_probe's deliberate
    # query × centroid cross join (nlist-row broadcast side); the chunk
    # and token re-rank joins must all be hash equi-joins
    plan = checks.plan_string(df, "simple")
    import re as _re

    assert len(_re.findall(r"BroadcastNestedLoopJoin", plan)) <= 1, plan


def test_percentile_scale_twins_use_mergeable_sketch(dfs):
    """The *_scaled percentile variants must plan approx_percentile's
    fixed-size mergeable sketch — never the exact `percentile` whose
    final reduce buffers every value of the column (or of the per-key
    counts) on a single reducer. The exact reference variants keep
    `percentile` by design."""
    import re

    exact_pctl = re.compile(r"(?<!approx_)percentile\(")
    for name in (
        "price_quantiles_scaled",
        "events_key_skew_scaled",
    ):
        plan = checks.plan_string(dfs[name])
        assert "approx_percentile" in plan, (name, plan)
        assert not exact_pctl.search(plan), (name, plan)
    # the sketch twin's REFERENCE leg is approx; its est leg interpolates
    # over the fixed k-row sample (bounded by construction), which is the
    # one place plain percentile may appear
    plan = checks.plan_string(dfs["price_quantile_sketch_scaled"])
    assert "approx_percentile" in plan, plan
    # exact references unchanged
    assert exact_pctl.search(checks.plan_string(dfs["price_quantiles"]))


def test_profile_scale_twin_has_no_multi_distinct_expand(dfs):
    """The exact profile pays the multi-distinct Expand (rows × columns
    replicated into the shuffle); the KMV scale twin must not — its
    distinct stream is the melted hash pairs reduced by bounded top-k."""
    assert "Expand" in checks.plan_string(dfs["events_profile"])
    assert "Expand" not in checks.plan_string(dfs["events_profile_scaled"])


def test_png_decode_is_scan_shaped_arrow_no_shuffle(dfs):
    """The PNG corpus synthesis + decode must pipeline off the scan as
    two Arrow passes — no shuffle, no row-Python: the decode tier has to
    stream at any corpus size."""
    df = dfs["png_decode"]
    assert not checks.uses_python_eval(df)
    assert checks.count_shuffle_exchanges(df) == 0, checks.plan_string(df, "simple")
    assert "MapInPandas" in checks.plan_string(df)


def test_refine_recall_reranks_with_hash_joins_no_row_python(dfs):
    """The refine stage's vector fetch must be hash equi-joins (AQE-sized)
    — a nested-loop fallback there would scan the corpus per shortlist
    row. The only nested-loop joins allowed are the deliberate
    query × centroid bucket-selection cross joins (nlist-row broadcast
    side) and the 1-row report assembly crossJoins."""
    import re

    df = dfs["ann_pq_refine_recall"]
    assert not checks.uses_python_eval(df)
    plan = checks.plan_string(df, "simple")
    nl = len(re.findall(r"BroadcastNestedLoopJoin", plan))
    # 2 bucket selections (float probe + ADC probe) + 2 report
    # crossJoins; the session-cached float reference (float_topf_cached)
    # may echo its own probe subtree inside the InMemoryRelation text,
    # adding up to 2 more to the COUNT without adding runtime joins
    assert nl <= 6, plan
    assert checks.count_broadcast_joins(df) >= 2


def test_recall_sweep_shares_one_index_across_points(spark):
    """All sweep points must ride the SAME session-cached IVF build and
    residual encode — the sweep is a runtime-knob scan, not three index
    builds. Counted via the shared-relation cache's build counter."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.functions import (
        dfcache,
    )

    q.QUERIES["ann_pq_residual_adc_recall"](spark, SF_DIR).collect()  # warm
    before = dfcache.build_count()
    q.QUERIES["ann_recall_sweep"](spark, SF_DIR).collect()
    assert dfcache.build_count() == before, "sweep rebuilt a shared index"


def test_deployable_config_and_refine_sweep_share_session_indexes(spark):
    """The r8 compositions must ride the session caches end to end: after
    the code-only ksub=256 report warms the IVF build, the 8-bit residual
    codes, and the float-reference ranking, neither the deployable-config
    report nor the refine-cost sweep may rebuild ANY shared index —
    they are probe/re-rank compositions over existing artifacts."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.functions import (
        dfcache,
    )

    q.QUERIES["ann_pq_ksub_recall"](spark, SF_DIR).collect()  # warm
    q.QUERIES["ann_pq_refine_recall"](spark, SF_DIR).collect()  # warm 4-bit path
    before = dfcache.build_count()
    q.QUERIES["ann_pq_refine_ksub_recall"](spark, SF_DIR).collect()
    q.QUERIES["ann_refine_sweep"](spark, SF_DIR).collect()
    assert dfcache.build_count() == before, "composition rebuilt a shared index"


def test_minhash_sweep_rides_shared_shingles(spark):
    """The banding sweep builds its own (wide) signature but must reuse
    the session-shared shingle table — the dominant tokenize+shingle pass
    is shared with every other minhash/Jaccard consumer."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.functions import (
        dfcache,
    )

    q.QUERIES["minhash_recall"](spark, SF_DIR).collect()  # warm shingles+bands
    before = dfcache.build_count()
    q.QUERIES["minhash_recall_sweep"](spark, SF_DIR).collect()
    assert dfcache.build_count() == before, "sweep rebuilt the shingle table"


def test_ivfpq_topk_rides_shared_indexes(spark):
    """The compressed production query is a pure probe composition: once
    the ksub=256 report has warmed the IVF build, residual codes, and
    codebooks, ann_ivfpq_topk may not rebuild any shared index."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.functions import (
        dfcache,
    )

    q.QUERIES["ann_pq_ksub_recall"](spark, SF_DIR).collect()  # warm
    before = dfcache.build_count()
    q.QUERIES["ann_ivfpq_topk"](spark, SF_DIR).collect()
    assert dfcache.build_count() == before, "probe rebuilt a shared index"


def test_kmv_scaled_twin_skips_exact_gram_join(dfs):
    """The sketch-only overlap twin must not pay the gram self-join the
    sketch exists to avoid: no jaccard_exact column, and strictly fewer
    shuffles than the exact-legged reference report."""
    scaled, ref = dfs["source_overlap_kmv_scaled"], dfs["source_overlap_kmv"]
    assert "jaccard_exact" not in scaled.columns
    assert "jaccard_exact" in ref.columns
    assert checks.count_shuffle_exchanges(scaled) < checks.count_shuffle_exchanges(ref)
