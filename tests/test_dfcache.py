"""Shared-relation cache (functions/dfcache.py): hit/miss keying, block
exemption, eviction unpersist, and the degrade-to-rebuild guarantee under
an external unpersist (the failure mode that ruled out checkpoint-backed
storage)."""

from __future__ import annotations

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.functions import (
    dfcache,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    dedup,
)


def _docs(spark, tag):
    return spark.createDataFrame(
        [(i, f"{tag} common words here {i}") for i in range(30)],
        "doc_id long, text string",
    )


def test_memo_hits_same_plan_misses_different(spark):
    # hits key on the CANONICAL plan: two independent reads of the same
    # parquet table (fresh expr ids) must alias; a filtered variant and a
    # local relation must not
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.catalog import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    a1 = dedup.shared_band_index(load_table(spark, sf, "documents"))
    a2 = dedup.shared_band_index(load_table(spark, sf, "documents"))
    b = dedup.shared_band_index(
        load_table(spark, sf, "documents").filter("doc_id % 2 = 0")
    )
    assert a1[0] is a2[0] and a1[1] is a2[1]  # same canonical plan -> hit
    assert b[0] is not a1[0]                  # different corpus -> miss
    assert dfcache.persistent_exempt_ids()    # entries registered blocks


def test_external_unpersist_degrades_to_rebuild_not_failure(spark):
    sh, bands = dedup.shared_band_index(_docs(spark, "gamma"))
    n_before = bands.count()
    # an external reaper drops EVERY persisted block (what bench.py's
    # release would do without the exemption): the cached relations must
    # still answer queries by recomputing
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(jmap.keySet().toArray()):
        jmap.get(rid).unpersist(True)
    assert bands.count() == n_before
    assert sh.count() == 30


def test_eviction_unpersists_oldest(spark):
    dfcache._CACHE.clear()
    old_max = dfcache._CACHE_MAX
    dfcache._CACHE_MAX = 2
    try:
        dedup.shared_band_index(_docs(spark, "e1"))
        dedup.shared_band_index(_docs(spark, "e2"))
        ids_two = dfcache.persistent_exempt_ids()
        dedup.shared_band_index(_docs(spark, "e3"))
        assert len(dfcache._CACHE) == 2
        # the evicted entry's blocks left the exempt set
        assert dfcache.persistent_exempt_ids() != ids_two
    finally:
        dfcache._CACHE_MAX = old_max


def test_consumers_share_one_index_per_family(spark):
    """Architecture contract: running a second consumer of the same corpus
    must ADD NO cache entries — the shingle/band and IVF relations are
    built once per session, not per query."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark import (
        queries as q,
    )

    sf = "/root/testdata/sf0.001"
    dfcache._CACHE.clear()
    q.QUERIES["dedup_minhash_lsh"](spark, sf).collect()
    n_band = len(dfcache._CACHE)
    q.QUERIES["dup_clusters"](spark, sf).collect()
    q.QUERIES["dedup_ngram_jaccard"](spark, sf).collect()
    assert len(dfcache._CACHE) == n_band

    q.QUERIES["ann_ivf_topk"](spark, sf).collect()
    n_ivf = len(dfcache._CACHE)
    q.QUERIES["semantic_dedup"](spark, sf).collect()
    assert len(dfcache._CACHE) == n_ivf


def test_stale_session_entries_pruned(spark):
    # an entry whose session has stopped must leave the cache (and the
    # exempt-id set): RDD ids restart at 0 in a new context, so a stale
    # entry's recorded ids could shield unrelated fresh blocks
    class _DeadCtx:
        _jsc = None

    class _DeadSession:
        sparkContext = _DeadCtx()

    dedup.shared_band_index(_docs(spark, "live1"))
    live_ids = dfcache.persistent_exempt_ids()
    assert live_ids
    dfcache._CACHE[("fake", 1)] = ((), {999_999}, _DeadSession())
    assert 999_999 not in dfcache.persistent_exempt_ids()
    assert ("fake", 1) not in dfcache._CACHE
    assert dfcache.persistent_exempt_ids() == live_ids


def test_pq_consumers_share_one_train_encode(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark import (
        queries as q,
    )

    sf = "/root/testdata/sf0.001"
    dfcache._CACHE.clear()
    q.QUERIES["ann_pq_recall"](spark, sf).collect()
    n = len(dfcache._CACHE)
    q.QUERIES["ann_pq_adc_recall"](spark, sf).collect()
    assert len(dfcache._CACHE) == n  # ADC rode the shared books+codes
