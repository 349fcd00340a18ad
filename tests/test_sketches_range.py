"""r3 operators: KMV / count-min sketches, bucketed range join, unigram
logprob quality model, boilerplate segment scrub, bloom-prefiltered
decontamination."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    corpus,
    sketches,
    temporal,
)


def _docs(spark, rows):
    """rows: (doc_id, text) or (doc_id, text, source)."""
    if len(rows[0]) == 2:
        rows = [(i, t, "s0") for i, t in rows]
    return spark.createDataFrame(
        list(rows), "doc_id long, text string, source string"
    )


# --- KMV ------------------------------------------------------------------


def test_kmv_small_source_is_exact(spark):
    # fewer distinct tokens than k → the sketch holds them all and the
    # estimate IS the exact count
    docs = _docs(spark, [(1, "a b c a b"), (2, "c d e")])
    row = sketches.kmv_distinct_tokens(docs, k=64).collect()[0]
    assert row.exact_distinct == 5
    assert row.kmv_estimate == 5.0


def test_kmv_estimate_within_error(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = sketches.kmv_distinct_tokens(docs).collect()
    assert len(rows) == docs.select("source").distinct().count()
    for r in rows:
        if r.exact_distinct >= sketches.KMV_K:
            # standard KMV error ~ 1/sqrt(k) ≈ 12.5% at k=64; allow 3 sigma
            assert abs(r.kmv_estimate - r.exact_distinct) / r.exact_distinct < 0.5


def test_kmv_two_phase_equals_flat_rank(spark, sf_dir):
    """The salted two-phase top-k must equal a flat per-source rank."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.functions.hashing import (
        hex_hash64,
    )
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.functions.textfns import (
        tokens,
    )
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ex = docs.select("source", F.explode(tokens(F.col("text"))).alias("t"))
    hs = ex.select("source", hex_hash64(F.col("t")).alias("h")).distinct()
    w = Window.partitionBy("source").orderBy("h")
    flat = (
        hs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= sketches.KMV_K)
        .groupBy("source")
        .agg(F.max("h").alias("kth_hash"))
    )
    got = {
        r.source: r.kth_hash
        for r in sketches.kmv_distinct_tokens(docs).collect()
    }
    want = {r.source: r.kth_hash for r in flat.collect()}
    assert got == want


# --- CMS ------------------------------------------------------------------


def test_cms_overestimates_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = sketches.cms_token_counts(docs).collect()
    assert len(rows) == sketches.CMS_TOPK
    for r in rows:
        assert r.cms_count >= r.true_count  # CMS never undercounts


def test_cms_exact_when_no_collisions(spark):
    # tiny vocabulary → no bucket collisions → estimates are exact
    docs = _docs(spark, [(1, "x x x y"), (2, "y z")])
    rows = sketches.cms_token_counts(docs, topk=3).collect()
    got = {r.token: (r.true_count, r.cms_count) for r in rows}
    assert got == {"x": (3, 3), "y": (2, 2), "z": (1, 1)}


# --- quantile sketch ------------------------------------------------------


def test_quantile_sketch_close_to_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = sketches.quantile_sketch_prices(li).collect()[0]
    for p in ("p25", "p50", "p75"):
        est, exact = row[f"est_{p}"], row[f"exact_{p}"]
        # k=1024 uniform sample: quantile standard error ~ 2-3% of the
        # price range; the synthetic prices span ~[900, 105k]
        assert abs(est - exact) / exact < 0.2, (p, est, exact)


def test_quantile_sketch_sample_is_exact_when_small(spark):
    rows = [(i, 1, float(i)) for i in range(1, 101)]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber long, l_extendedprice double"
    )
    r = sketches.quantile_sketch_prices(li, k=1024).collect()[0]
    # fewer rows than k → the sample IS the data → estimates equal exact
    assert (r.est_p25, r.est_p50, r.est_p75) == (
        r.exact_p25,
        r.exact_p50,
        r.exact_p75,
    )


# --- corpus pipeline ------------------------------------------------------


def test_corpus_pipeline_gate_precedence_and_dedup(spark):
    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over a lazy dog and then it "
                "runs to the old mill by the river where you can see that "
                "one tall tree in the field"),              # kept
            (2, "the quick brown fox jumps over a lazy dog and then it "
                "runs to the old mill by the river where you can see that "
                "one tall tree in the field"),              # exact dup of 1
            (3, "zz zz zz zz zz zz zz zz zz zz"),           # repetitive
            (4, "@@@@ #### $$$$ %%%%"),                     # low quality
        ],
    )
    rows = {r.doc_id: r for r in corpus.corpus_pipeline(docs).collect()}
    assert rows[1].kept and rows[1].reason == "kept"
    assert not rows[2].kept and rows[2].reason == "exact_dup"
    assert rows[2].is_dup
    assert not rows[3].kept and rows[3].reason == "repetitive"
    assert not rows[4].kept and rows[4].reason == "low_quality"
    assert all(r.split in ("train", "val", "test") for r in rows.values())


def test_corpus_pipeline_matches_component_operators(spark, sf_dir):
    """The composed plan must agree with its standalone components."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.text import (
        quality_score,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pipe = {r.doc_id: r for r in corpus.corpus_pipeline(docs).collect()}
    q = {r.doc_id: r.quality for r in quality_score(docs).collect()}
    assert all(pipe[d].quality == q[d] for d in pipe)


# --- range join -----------------------------------------------------------


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, seconds_offset)."""
    base = datetime.datetime(2024, 1, 1)
    data = [
        (eid, base + datetime.timedelta(seconds=s), uid, et, 1.0, "{}")
        for eid, uid, et, s in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_range_join_counts_window_only(spark):
    ev = _events(
        spark,
        [
            (1, 7, "error", 0),
            (2, 7, "view", 100),     # inside (0, 300]
            (3, 7, "click", 300),    # boundary: inside (inclusive end)
            (4, 7, "view", 301),     # outside
            (5, 8, "view", 50),      # other user
            (6, 7, "view", 0),       # same instant as the error: excluded (strict >)
        ],
    )
    rows = temporal.range_join_follow(ev).collect()
    assert len(rows) == 1
    assert rows[0].error_event_id == 1
    assert rows[0].n_follow == 2


def test_range_join_zero_follow_kept(spark):
    ev = _events(spark, [(1, 7, "error", 0), (2, 8, "view", 10)])
    rows = temporal.range_join_follow(ev).collect()
    assert rows[0].n_follow == 0


def test_range_join_bucket_straddle(spark):
    # follower in the NEXT bucket (anchor at 299s, follower at 500s,
    # bucket width 300) — caught only because anchors explode to 2 buckets
    ev = _events(spark, [(1, 7, "error", 299), (2, 7, "view", 500)])
    rows = temporal.range_join_follow(ev).collect()
    assert rows[0].n_follow == 1


# --- unigram logprob ------------------------------------------------------


def test_unigram_logprob_orders_rarity(spark):
    import math

    docs = _docs(spark, [(1, "a a a"), (2, "a a b")])
    rows = {r.doc_id: r for r in corpus.unigram_logprob(docs).collect()}
    # p(a)=5/6, p(b)=1/6; doc 1 = ln(5/6); doc 2 = (2 ln(5/6) + ln(1/6))/3
    assert abs(rows[1].avg_logprob - math.log(5 / 6)) < 1e-4
    assert rows[2].avg_logprob < rows[1].avg_logprob
    assert rows[1].n_tokens == 3


def test_unigram_logprob_keeps_tokenless_docs(spark):
    docs = _docs(spark, [(1, "hello world"), (2, "!!!")])
    rows = {r.doc_id: r for r in corpus.unigram_logprob(docs).collect()}
    assert rows[2].n_tokens == 0
    assert rows[2].avg_logprob is None


# --- boilerplate scrub ----------------------------------------------------


def test_boilerplate_scrub_drops_repeated_segment(spark):
    footer = "subscribe to our newsletter"  # 4 tokens < seg boundary? 4 tokens
    bodies = ["alpha beta gamma delta", "epsilon zeta eta theta", "iota kappa lambda mu"]
    docs = _docs(
        spark,
        [(i + 1, f"{b} {footer}") for i, b in enumerate(bodies)],
    )
    rows = {
        r.doc_id: r
        for r in corpus.boilerplate_scrub(docs, seg_len=4, max_df=2).collect()
    }
    # the footer segment appears in 3 docs > max_df=2 → dropped everywhere
    for i, b in enumerate(bodies):
        assert rows[i + 1].clean_text == b
        assert rows[i + 1].n_dropped == 1
        assert rows[i + 1].n_segments == 2


def test_boilerplate_scrub_keeps_rare_segments(spark):
    docs = _docs(spark, [(1, "one two three four"), (2, "five six seven eight")])
    rows = corpus.boilerplate_scrub(docs, seg_len=4, max_df=2).collect()
    for r in rows:
        assert r.n_dropped == 0


def test_boilerplate_scrub_order_preserved(spark):
    # 3 segments; ensure reassembly is seg_idx order, not hash order
    text = " ".join(f"w{i}" for i in range(12))
    rows = corpus.boilerplate_scrub(_docs(spark, [(1, text)]), seg_len=4).collect()
    assert rows[0].clean_text == text


# --- bloom-prefiltered contamination --------------------------------------


def test_contamination_bloom_equals_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = corpus.contamination_check(docs).collect()
    bloom = corpus.contamination_check(docs, bloom_prefilter=True).collect()
    key = lambda r: r.doc_id  # noqa: E731
    assert sorted(exact, key=key) == sorted(bloom, key=key)


# --- multimodal frames ----------------------------------------------------


def test_sample_frames_offsets_and_tail(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.multimodal import (
        frame_byte_stats,
        sample_frames,
        with_binary_payload,
    )

    text = "a" * 10 + "b" * 10 + "c" * 5  # 25 bytes
    docs = spark.createDataFrame([(1, text, "s0")], "doc_id long, text string, source string")
    media = with_binary_payload(docs)
    frames = sample_frames(media, frame_bytes=10, stride=2).collect()
    # offsets 0 and 20 (stride skips offset 10)
    assert [(r.frame_idx, r.frame_offset) for r in frames] == [(0, 0), (1, 20)]
    assert bytes(frames[0].frame_bytes) == b"a" * 10
    assert bytes(frames[1].frame_bytes) == b"c" * 5  # short tail frame
    stats = {
        r.frame_idx: r
        for r in frame_byte_stats(
            sample_frames(media, frame_bytes=10, stride=2)
        ).collect()
    }
    assert stats[0].frame_len == 10 and stats[0].max_byte == ord("a")
    assert stats[0].mean_byte == float(ord("a"))
    assert stats[1].frame_len == 5 and stats[1].max_byte == ord("c")


def test_sample_frames_empty_payload_yields_no_frames(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.multimodal import (
        sample_frames,
        with_binary_payload,
    )

    docs = spark.createDataFrame(
        [(1, "", "s0"), (2, "some text", "s0")],
        "doc_id long, text string, source string",
    )
    rows = sample_frames(with_binary_payload(docs), frame_bytes=4).collect()
    assert {r.doc_id for r in rows} == {2}


def test_kmv_source_overlap_exact_when_union_below_k(spark):
    """When a pair's gram union fits inside the sketch (|A ∪ B| < k) the
    merged sketch IS the union: union_est is the exact union size and the
    Jaccard estimate equals the exact Jaccard."""
    t1 = "the quick brown fox jumps over the lazy dog tonight"
    t2 = "pack my box with five dozen brown liquor jugs today"
    docs = spark.createDataFrame(
        [
            (1, t1, "a", "en"),
            (2, t2, "a", "en"),
            (3, t1, "b", "en"),
            (4, t2 + " again and again and again and again", "b", "en"),
        ],
        "doc_id long, text string, source string, lang string",
    )
    rows = sketches.kmv_source_overlap(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.source_a, r.source_b) == ("a", "b")
    assert r.k_union < sketches.KMV_K
    assert r.union_est == float(r.k_union)
    assert r.jaccard_est == r.jaccard_exact
    assert 0.0 < r.jaccard_exact < 1.0


def test_kmv_source_overlap_pair_grid_and_bounds(spark, sf_dir):
    """Every unordered source pair appears once; estimates are sane
    (0 ≤ jaccard ≤ 1, union_est ≥ the larger side can't be checked from
    the output alone, but estimates must be positive and n_both ≤ k)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = sketches.kmv_source_overlap(docs).collect()
    n_src = docs.select("source").distinct().count()
    assert len(out) == n_src * (n_src - 1) // 2
    for r in out:
        assert r.source_a < r.source_b
        assert 0 <= r.n_both <= r.k_union <= sketches.KMV_K
        assert 0.0 <= r.jaccard_est <= 1.0
        assert 0.0 <= r.jaccard_exact <= 1.0
        assert r.union_est >= r.k_union  # estimator ≥ sketch occupancy


def test_join_size_estimate_exact_and_upper_bound(spark):
    """Exact Σ cL·cR on a known key multiset, the CMS upper-bound
    guarantee (estimate ≥ exact always), and null-key exclusion."""
    left = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,), (None,)], "k long"
    )
    right = spark.createDataFrame([(1,), (2,), (2,), (9,), (None,)], "k long")
    [r] = sketches.join_size_estimate(left, "k", right, "k").collect()
    assert (r.n_left, r.n_right) == (5, 4)
    assert r.exact_pairs == 3 * 1 + 1 * 2  # k=1: 3·1, k=2: 1·2, k=3/9: no match
    assert r.cms_estimate >= r.exact_pairs
    assert r.overestimate >= 1.0


def test_join_size_estimate_disjoint_keys_zero(spark):
    """Disjoint key sets: exact 0, overestimate NULL; the all-rows
    completion means an empty cell overlap still yields a 0-row vote
    (without it the min would read off only colliding rows)."""
    left = spark.createDataFrame([(i,) for i in range(1, 6)], "k long")
    right = spark.createDataFrame([(i,) for i in range(1001, 1004)], "k long")
    [r] = sketches.join_size_estimate(left, "k", right, "k").collect()
    assert r.exact_pairs == 0.0
    assert r.overestimate is None
    assert r.cms_estimate >= 0.0
