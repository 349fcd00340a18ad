"""Stratified sampling, PII redaction, corpus n-gram stats, dup clusters."""

from __future__ import annotations

from pyspark.sql import functions as F

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    dedup,
    sampling,
    text,
)


def test_stratified_sample_deterministic_and_rate_shaped(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}", "en" if i % 2 == 0 else "zh") for i in range(400)],
        "doc_id long, text string, lang string",
    )
    s1 = sampling.stratified_sample(docs, {"en": 40, "zh": 100})
    s2 = sampling.stratified_sample(docs, {"en": 40, "zh": 100})
    r1 = sorted(r.doc_id for r in s1.collect())
    assert r1 == sorted(r.doc_id for r in s2.collect())  # idempotent
    by_lang = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["zh"] == 200  # 100% stratum keeps everything
    assert 40 <= by_lang["en"] <= 120  # ~40% of 200 with hash noise


def test_stratified_sample_unknown_stratum_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "a", "xx"), (2, "b", "en")], "doc_id long, text string, lang string"
    )
    out = sampling.stratified_sample(docs, {"en": 100})
    assert [r.doc_id for r in out.collect()] == [2]


def test_pii_redact_scrubs_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at Bob.Smith+x@Example.COM or call 555-123-4567 now"),
            (2, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text.pii_redact(docs).collect()}
    assert rows[1].n_emails == 1
    assert rows[1].n_phones == 1
    assert "<EMAIL>" in rows[1].redacted_text
    assert "<PHONE>" in rows[1].redacted_text
    assert "example.com" not in rows[1].redacted_text
    assert rows[2].n_emails == 0 and rows[2].n_phones == 0
    assert rows[2].redacted_text == "nothing sensitive here"


def test_corpus_ngram_topk_orders_by_df(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma other"),
            (3, "alpha beta gamma"),
            (4, "unrelated words entirely here"),
        ],
        "doc_id long, text string",
    )
    rows = text.corpus_ngram_topk(docs, k=3).collect()
    assert rows[0].gram == "alpha beta gamma"
    assert rows[0].df == 3
    # ties broken by gram ascending
    assert [r.gram for r in rows] == sorted(
        [r.gram for r in rows], key=lambda g: (-dict((x.gram, x.df) for x in rows)[g], g)
    )


def test_dup_clusters_groups_multi_edge_component(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    b = base.replace("today", "tonight")
    c = b.replace("tonight", "yesterday")
    far = "completely unrelated text about spark distributed query engines and planning"
    docs = spark.createDataFrame(
        [(1, base), (2, b), (3, c), (4, far), (5, far)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.cluster_id for r in dedup.dup_clusters(docs).collect()}
    assert rows[1] == rows[2] == rows[3] == 1
    # identical far docs cluster together under the min id
    assert rows[4] == rows[5] == 4


def test_connected_components_transitive_chain(spark):
    # A-B and B-C edges with no A-C edge: pairwise dedup deletes wrongly;
    # label propagation must still produce one cluster {1,2,3}. The chain
    # 10-11 checks multi-hop propagation needs >1 iteration.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13)], "doc_a long, doc_b long"
    )
    rows = {r.doc_id: r.cluster_id for r in dedup.connected_components(pairs).collect()}
    assert rows == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10}


def test_pii_redact_preserves_casing_and_phone_formats(spark):
    docs = spark.createDataFrame(
        [
            (1, "Dear Sir, reach Bob.Smith@Example.COM today"),
            (2, "call (555) 123-4567 or 555.123.4567 or 555 123 4567"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text.pii_redact(docs).collect()}
    # casing outside the redacted span is untouched
    assert rows[1].redacted_text == "Dear Sir, reach <EMAIL> today"
    assert rows[1].n_emails == 1
    # all three phone formats matched
    assert rows[2].n_phones == 3
    assert rows[2].redacted_text == "call <PHONE> or <PHONE> or <PHONE>"


def test_train_val_test_split_disjoint_and_stable(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.sampling import (
        train_val_test_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1000)], "doc_id long, text string"
    )
    a = train_val_test_split(docs).collect()
    b = train_val_test_split(docs).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    counts = {}
    for r in a:
        counts[r.split] = counts.get(r.split, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 900  # ~98%
    assert counts["val"] + counts["test"] < 100


def test_split_decorrelated_from_sample_bucket(spark):
    """The salted split hash must not be the same ordering as the sampling
    bucket — docs in the 40% sample must not all land in 'train' prefix
    buckets."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.sampling import (
        hash_bucket,
        train_val_test_split,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(2000)], "doc_id long, text string"
    )
    out = train_val_test_split(docs, train_pct=50, val_pct=25).withColumn(
        "samp_bucket", hash_bucket(F.col("doc_id").cast("string"))
    )
    rows = out.collect()
    # if correlated, every doc with samp_bucket < 50 would be 'train';
    # decorrelated ⇒ roughly half of them are
    low = [r for r in rows if r.samp_bucket < 50]
    train_low = sum(1 for r in low if r.split == "train")
    assert 0.3 < train_low / len(low) < 0.7


def test_mixture_sample_hits_target_shares(spark):
    """Over-represented stratum downsamples toward its target share;
    under-represented strata keep everything (rate_micro = 1e6)."""
    rows = [(i, "big") for i in range(800)] + [(i, "small") for i in range(800, 1000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.mixture_sample(
        docs, target_shares={"big": 0.5, "small": 0.5}, strata_col="source"
    )
    rates = {r["source"]: r["rate_micro"] for r in out.select("source", "rate_micro").distinct().collect()}
    # big: 0.5 * 1000 / 800 = 0.625 -> 625000; small: capped at 1.0
    assert rates == {"big": 625000, "small": 1000000}
    kept = out.groupBy("source").count().collect()
    kept = {r["source"]: r["count"] for r in kept}
    assert kept["small"] == 200  # rate 1.0 keeps all
    # hash-sampling is approximate: within a loose band of 0.625*800 = 500
    assert 420 <= kept["big"] <= 580
    # deterministic: re-running selects the identical rows
    again = sampling.mixture_sample(
        docs, target_shares={"big": 0.5, "small": 0.5}, strata_col="source"
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_mixture_sample_uniform_default(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(400)], "doc_id long, source string"
    )
    out = sampling.mixture_sample(docs)  # uniform across 4 observed strata
    rates = {r["source"]: r["rate_micro"] for r in out.select("source", "rate_micro").distinct().collect()}
    assert set(rates.values()) == {1000000}  # already uniform: keep all
    assert out.count() == 400


def test_leakage_safe_split_keeps_near_dups_together(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        sampling,
    )

    # docs 100 and 7 are identical -> same dup cluster -> same split,
    # and both use the MIN doc_id (7) as representative. Unique docs
    # represent themselves.
    dup_text = " ".join(f"tok{i}" for i in range(40))
    rows = [(100, dup_text, "en", "s", 1), (7, dup_text, "en", "s", 1)]
    rows += [
        (i, f"unique document number {i} " + " ".join(f"w{i}_{j}" for j in range(30)),
         "en", "s", 1)
        for i in range(200, 220)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.doc_id: r for r in sampling.leakage_safe_split(docs).collect()}
    assert out[100].rep_id == 7 and out[7].rep_id == 7
    assert out[100].split == out[7].split
    for i in range(200, 220):
        assert out[i].rep_id == i
