"""Corpus-preparation operators: chunking windows, TF-IDF ranking,
contamination detection, repetition scoring, deterministic shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    corpus,
)


def _docs(spark, texts, ids=None):
    ids = ids or range(1, len(texts) + 1)
    return spark.createDataFrame(
        list(zip(ids, texts)), "doc_id long, text string"
    )


def test_chunk_windows(spark):
    # 10 tokens, chunk_size=4, stride=3 → starts 0,3,6,9
    toks = " ".join(f"t{i}" for i in range(10))
    rows = sorted(
        corpus.chunk_documents(_docs(spark, [toks]), chunk_size=4, stride=3).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.chunk_id for r in rows] == [0, 1, 2, 3]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t3 t4 t5 t6"
    assert rows[3].chunk_text == "t9"  # tail chunk, shorter
    assert [r.n_tokens for r in rows] == [4, 4, 4, 1]


def test_chunk_empty_doc_drops(spark):
    rows = corpus.chunk_documents(_docs(spark, ["!!!", "a b"])).collect()
    assert {r.doc_id for r in rows} == {2}  # no tokens → no chunks


def test_tfidf_ranks_rare_terms(spark):
    docs = _docs(
        spark,
        [
            "common common rare",
            "common blah blah",
            "common other words",
        ],
    )
    rows = corpus.tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 'common' appears in every doc → idf = ln(4/4) = 0 → never outranks
    # a doc-unique term.
    top1 = {d: sorted(rs, key=lambda r: r.rk)[0].term for d, rs in by_doc.items()}
    assert top1[1] == "rare"
    assert top1[2] == "blah"
    assert all(len(rs) == 2 for rs in by_doc.values())


def test_tfidf_tie_break_is_term_asc(spark):
    rows = corpus.tfidf_top_terms(_docs(spark, ["zeta alpha", "unrelated x"]), k=2).collect()
    d1 = sorted((r for r in rows if r.doc_id == 1), key=lambda r: r.rk)
    # equal tf and df → equal score; alphabetical order decides
    assert [r.term for r in d1] == ["alpha", "zeta"]


def test_contamination_flags_shared_ngram(spark):
    bench_text = " ".join(f"w{i}" for i in range(12))
    clean_text = " ".join(f"c{i}" for i in range(12))
    docs = _docs(
        spark,
        [bench_text, bench_text + " extra tail tokens", clean_text],
        # doc 97 is the benchmark doc (97 % 97 == 0)
        ids=[97, 5, 6],
    )
    rows = {r.doc_id: r for r in corpus.contamination_check(docs, n=8).collect()}
    assert set(rows) == {5, 6}  # benchmark doc excluded from output
    assert rows[5].contaminated and rows[5].n_contaminated_grams > 0
    assert not rows[6].contaminated and rows[6].n_contaminated_grams == 0


def test_repetition_score_values(spark):
    docs = _docs(spark, ["a b c a b c a b c", "a b c d e f", "one two"])
    rows = {r.doc_id: r for r in corpus.repetition_score(docs).collect()}
    # 9 tokens → 7 grams, 3 distinct ("a b c","b c a","c a b")
    assert rows[1].n_grams == 7 and rows[1].n_distinct == 3
    assert abs(rows[1].rep_ratio - round(1 - 3 / 7, 6)) < 1e-9
    assert rows[2].rep_ratio == 0.0  # all grams unique
    assert rows[3].n_grams == 0 and rows[3].rep_ratio == 0.0  # < n tokens


def test_corpus_shuffle_deterministic_and_dense(spark):
    docs = _docs(spark, [f"doc {i}" for i in range(50)])
    a = corpus.corpus_shuffle(docs, n_shards=4).collect()
    b = corpus.corpus_shuffle(docs, n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(4))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))  # dense ranks
    assert sum(len(p) for p in by_shard.values()) == 50


def test_chunking_plan_has_no_shuffle(spark):
    """Chunking must pipeline off the scan: no exchange in the plan beyond
    the input spread (which is a no-op for multi-partition inputs)."""
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = spark.createDataFrame(
        [(i, "some text here repeated") for i in range(100)],
        "doc_id long, text string",
    ).repartition(width)  # already wide → spread is a no-op
    plan = corpus.chunk_documents(docs)._jdf.queryExecution().optimizedPlan().toString()
    # exactly one Repartition: the test's own widening above — spread must
    # not have added another, and chunking itself introduces no exchange.
    assert plan.count("Repartition") == 1


def test_source_mix_report(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog", "web"),
            (2, "it is a fine day to test the engine", "web"),
            (3, "short one", "books"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in corpus.source_mix_report(docs).collect()}
    assert rows["web"].n_docs == 2 and rows["books"].n_docs == 1
    assert abs(rows["web"].doc_share - round(2 / 3, 6)) < 1e-9
    assert rows["web"].total_tokens == 17
    assert 0.0 <= rows["books"].mean_quality <= 1.0


def test_chunking_reconstructs_tokens_property(spark):
    """Property: with stride == chunk_size (no overlap), concatenating the
    chunks in order reconstructs the tokenized document exactly."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.text(alphabet="abc123", min_size=1, max_size=5),
            min_size=0,
            max_size=40,
        ),
        st.integers(min_value=1, max_value=7),
    )
    def check(tokens_list, size):
        df = spark.createDataFrame(
            [(1, " ".join(tokens_list))], "doc_id long, text string"
        )
        rows = sorted(
            corpus.chunk_documents(df, chunk_size=size, stride=size).collect(),
            key=lambda r: r.chunk_id,
        )
        rebuilt = " ".join(r.chunk_text for r in rows).split()
        assert rebuilt == tokens_list
        assert sum(r.n_tokens for r in rows) == len(tokens_list)

    check()


def test_quality_bands_quartiles(spark):
    docs = _docs(spark, [f"word {'the ' * i}tail" for i in range(20)])
    rows = corpus.quality_bands(docs).collect()
    counts = {}
    for r in rows:
        counts[r.band] = counts.get(r.band, 0) + 1
    assert set(counts) <= {"q1", "q2", "q3", "q4"}
    assert sum(counts.values()) == 20
    # quartiles of 20 docs: roughly 5 per band (ties can shift boundaries)
    assert all(2 <= v <= 8 for v in counts.values()), counts
    # band ordering is monotone in quality
    by_band = {}
    for r in rows:
        by_band.setdefault(r.band, []).append(r.quality)
    for lo, hi in [("q1", "q2"), ("q2", "q3"), ("q3", "q4")]:
        if lo in by_band and hi in by_band:
            assert max(by_band[lo]) <= min(by_band[hi])


def test_sequence_pack_stream_is_contiguous(spark):
    # 30 docs of varying token counts; the packing manifest must describe
    # one gapless stream: sorted by start_offset, each doc starts exactly
    # where the previous one ended (n_tokens + 1 EOS), starting at 0.
    texts = [" ".join(f"w{j}" for j in range(1 + (i * 7) % 13)) for i in range(30)]
    rows = sorted(
        corpus.sequence_pack(_docs(spark, texts), seq_len=16).collect(),
        key=lambda r: r.start_offset,
    )
    pos = 0
    for r in rows:
        assert r.start_offset == pos
        assert r.seq_id == pos // 16
        last = pos + r.n_tokens  # last occupied offset = start + cost - 1
        assert r.n_seqs == last // 16 - pos // 16 + 1
        pos += r.n_tokens + 1
    assert pos == sum(len(t.split()) + 1 for t in texts)


def test_sequence_pack_matches_flat_window(spark):
    # the bucketed two-phase cumsum must equal the naive single-window
    # computation (same deterministic (hash, doc_id) order) — and with
    # bucket_bits=1 vs 5 the manifest is identical: bucketing is purely a
    # parallelism choice, never a semantics one.
    texts = [f"doc {i} body " + "pad " * (i % 9) for i in range(40)]
    a = sorted(
        corpus.sequence_pack(_docs(spark, texts), seq_len=8, bucket_bits=1).collect()
    )
    b = sorted(
        corpus.sequence_pack(_docs(spark, texts), seq_len=8, bucket_bits=5).collect()
    )
    assert a == b


def test_sequence_pack_window_is_bucket_partitioned(spark):
    # the heavy window must partition by the hash bucket — a global
    # single-partition window over the corpus would be the 100 TB killer.
    df = corpus.sequence_pack(_docs(spark, ["alpha beta", "gamma"]))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(__b" in plan


# ---------------------------------------------------------------------------
# source_cap
# ---------------------------------------------------------------------------


def test_source_cap_keeps_top_quality_per_source(spark):
    # stopword ratio dominates at these lengths: doc 1 ("the fox", ratio
    # 1/2 = .5, quality .458) > doc 2 (3/7, .4566) > doc 3 (3/10, .43);
    # a cap of 2 keeps docs 1 and 2 and drops doc 3. srcB is untouched.
    docs = spark.createDataFrame(
        [
            (1, "the fox", "srcA"),
            (2, "the quick brown fox and a dog", "srcA"),
            (3, "the quick brown fox and the lazy dog again and again", "srcA"),
            (4, "only doc", "srcB"),
        ],
        "doc_id long, text string, source string",
    )
    rows = corpus.source_cap(docs, cap=2).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append((r.rk, r.doc_id))
    assert sorted(by_source["srcA"]) == [(1, 1), (2, 2)]
    assert by_source["srcB"] == [(1, 4)]


def test_source_cap_two_phase_equals_single_window(spark):
    # the salted two-phase plan must be EXACT: compare against a plain
    # single-window top-N on a corpus larger than cap x salt slices
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.text import (
        quality_score,
    )

    docs = spark.createDataFrame(
        [
            (i, ("word " * (i % 37 + 1)).strip(), f"src{i % 3}")
            for i in range(1, 301)
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r.source, r.rk): r.doc_id
        for r in corpus.source_cap(docs, cap=5, salt_buckets=4).collect()
    }
    q = quality_score(docs, keep=("source",))
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    want = {
        (r.source, r.rk): r.doc_id
        for r in q.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .collect()
    }
    assert got == want


def test_corpus_drift_zero_for_identical_and_positive_for_shifted(spark):
    same = _docs(spark, ["alpha beta gamma", "delta epsilon zeta"])
    r = corpus.corpus_drift(same, same).collect()[0]
    assert r.kl_ab == 0.0 and r.kl_ba == 0.0 and r.kl_sym == 0.0
    assert r.n_vocab_a == r.n_vocab_union

    shifted = _docs(spark, ["alpha alpha alpha beta", "omega psi chi phi"])
    d = corpus.corpus_drift(same, shifted).collect()[0]
    assert d.kl_ab > 0 and d.kl_ba > 0
    assert d.n_vocab_union > d.n_vocab_a  # disjoint words widen the union


def test_bigram_logprob_ranks_shuffled_gibberish_below_prose(spark):
    """A document with the SAME bag of words but shuffled order breaks the
    corpus' dominant bigrams: the bigram model must rank it strictly below
    the fluent original, while the unigram model (bag of words) scores the
    two identically — the separation that justifies the higher-order
    model."""
    sent = "the cat sat on the mat and the dog sat on the rug"
    shuffled = "mat the on cat dog sat the and rug the on sat the"
    assert sorted(sent.split()) == sorted(shuffled.split())
    rows = [(i, sent) for i in range(1, 9)]  # corpus dominated by the pattern
    rows.append((9, shuffled))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    bi = {r["doc_id"]: r["avg_logprob"] for r in corpus.bigram_logprob(docs).collect()}
    uni = {r["doc_id"]: r["avg_logprob"] for r in corpus.unigram_logprob(docs).collect()}
    assert bi[9] < bi[1], (bi[9], bi[1])
    assert uni[9] == uni[1], (uni[9], uni[1])


def test_bigram_logprob_empty_and_single_token_docs(spark):
    docs = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, "hello hello")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in corpus.bigram_logprob(docs).collect()}
    assert out[1]["n_tokens"] == 1
    assert out[2]["n_tokens"] == 0 and out[2]["avg_logprob"] is None
    assert out[3]["n_tokens"] == 2


def test_domain_cap_collapses_subdomains(spark):
    """Hosts www./cdn./blog.example.com share ONE registrable-domain
    budget; an unrelated domain keeps its own. Order is quality desc then
    doc_id, so the lowest-quality overflow docs drop first."""
    rows = []
    # 6 docs across 3 subdomains of example.com — identical text so
    # quality ties and doc_id breaks the order deterministically
    for i in range(6):
        sub = ["www", "cdn", "blog"][i % 3]
        rows.append((i, "plain text body " * 5, f"https://{sub}.example.com/{i}"))
    rows.append((100, "other corpus text " * 5, "https://solo.other.org/x"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    out = corpus.domain_cap(docs, cap=4)
    by_domain = {}
    for r in out.collect():
        by_domain.setdefault(r["domain"], []).append(r["doc_id"])
    assert sorted(by_domain["example.com"]) == [0, 1, 2, 3]  # cap=4, ids win ties
    assert by_domain["other.org"] == [100]


def test_blocklist_filter_dispositions(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://www.bad.com/x"),
            (2, "https://cdn.bad.com/y"),   # subdomain of a blocked domain
            (3, "https://good.org/z"),
        ],
        "doc_id long, url string",
    )
    out = {r["doc_id"]: r for r in corpus.blocklist_filter(docs, ["bad.com"]).collect()}
    assert len(out) == 3  # every doc gets a disposition row
    assert not out[1]["allowed"] and out[1]["reason"] == "blocked_domain"
    assert not out[2]["allowed"]  # subdomains collapse to the blocked domain
    assert out[3]["allowed"] and out[3]["reason"] is None


def test_source_overlap_exact_jaccard_and_zero_pairs(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        corpus,
    )

    # 10-token docs, n=8 -> each doc has 3 distinct 8-grams; doc A and B
    # share a 9-token run (2 common grams); C shares nothing.
    base = "a b c d e f g h i"
    docs = spark.createDataFrame(
        [
            (1, base + " x", "src1"),
            (2, base + " y", "src2"),
            (3, "p q r s t u v w z0 z1", "src3"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r.source_a, r.source_b): r
        for r in corpus.source_overlap(docs).collect()
    }
    assert set(out) == {("src1", "src2"), ("src1", "src3"), ("src2", "src3")}
    r12 = out[("src1", "src2")]
    # each source: 3 grams; shared: the two grams fully inside "a..i"
    assert (r12.n_a, r12.n_b, r12.n_common) == (3, 3, 2)
    assert r12.jaccard == 0.5  # 2 / (3+3-2)
    assert out[("src1", "src3")].n_common == 0
    assert out[("src1", "src3")].jaccard == 0.0
