"""Text-analysis operators: tokenizer contract, lang-id, quality, token
count, fingerprint determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.functions.hashing import (
    POLY_MOD,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.functions.textfns import (
    tokens,
    word_shingles,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    text,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_tokenizer_contract(spark):
    rows = _docs(spark, ["Hello, World!  42 foo_bar"]).select(
        tokens(F.col("text")).alias("t")
    ).collect()
    # lowercase, split on non-[a-z0-9] runs, no empties ('_' splits)
    assert rows[0].t == ["hello", "world", "42", "foo", "bar"]


def test_word_shingles(spark):
    df = _docs(spark, ["a b c d", "a b"])
    rows = df.select(word_shingles(tokens(F.col("text")), 3).alias("sh")).collect()
    assert rows[0].sh == ["a b c", "b c d"]
    assert rows[1].sh == []  # < n tokens → empty


def test_lang_id_predictions(spark):
    docs = _docs(
        spark,
        [
            "the cat and the dog of to is that it a",
            "der Hund und die Katze ist nicht ein zu",
            "xyzzy qwerty 12345",
        ],
    )
    rows = {r.doc_id: r for r in text.lang_id(docs).collect()}
    assert rows[1].pred_lang == "en"
    assert rows[2].pred_lang == "de"
    assert rows[3].pred_lang == "und"  # no stopword hits anywhere
    assert rows[1].score_en == 8


def test_quality_score_bounds_and_fields(spark):
    docs = _docs(spark, ["the quick brown fox and the lazy dog. " * 10])
    r = text.quality_score(docs).collect()[0]
    assert 0.0 <= r.quality <= 1.0
    assert r.n_tokens == 80
    assert r.n_punct == 10  # the 10 periods
    assert r.n_stopwords == 30  # ('the'×2 + 'and'×1) per repeat × 10


def test_quality_stopword_count_exact(spark):
    # 'the' appears twice, 'and' once → 3 stopword hits
    docs = _docs(spark, ["the quick brown fox and the lazy dog."])
    r = text.quality_score(docs).collect()[0]
    assert r.n_stopwords == 3
    assert r.stopword_ratio == round(3 / 8, 6)


def test_token_count(spark):
    r = text.token_count(_docs(spark, ["one two three"])).collect()[0]
    assert r.n_tokens == 3
    assert r.n_chars_measured == len("one two three")


def _py_poly_fingerprint(toks: list[str]) -> int:
    import hashlib

    def tok_hash(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % POLY_MOD

    acc = 0
    for t in toks:
        acc = (acc * 131 + tok_hash(t)) % POLY_MOD
    return acc


def test_doc_fingerprint_matches_reference_recurrence(spark):
    r = text.doc_fingerprint(_docs(spark, ["alpha beta gamma"])).collect()[0]
    assert r.rolling_fp == _py_poly_fingerprint(["alpha", "beta", "gamma"])


def test_doc_fingerprint_is_order_sensitive(spark):
    rows = {r.doc_id: r for r in text.doc_fingerprint(
        _docs(spark, ["alpha beta", "beta alpha"])
    ).collect()}
    assert rows[1].rolling_fp != rows[2].rolling_fp
    assert rows[1].content_md5 != rows[2].content_md5


def test_empty_doc_fingerprint_zero(spark):
    r = text.doc_fingerprint(_docs(spark, ["!!!"])).collect()[0]
    assert r.rolling_fp == 0


def test_normalize_text_collapses_and_trims(spark):
    rows = {r.doc_id: r for r in text.normalize_text(_docs(spark, [
        "  hello\t\tworld \n next\r\nline  ",
        "already clean",
        "ctrl\x01char\x7fhere",
    ])).collect()}
    assert rows[1].norm_text == "hello world next line"
    assert rows[1].changed is True
    assert rows[1].n_chars_norm == len("hello world next line")
    assert rows[2].norm_text == "already clean"
    assert rows[2].changed is False
    assert rows[3].norm_text == "ctrl char here"


def test_quality_score_keep_threads_columns(spark):
    docs = spark.createDataFrame(
        [(1, "the fox", "srcA")], "doc_id long, text string, source string"
    )
    r = text.quality_score(docs, keep=("source",)).collect()[0]
    assert r.source == "srcA"
    assert r.quality > 0


def test_bpe_token_count_contractions_and_punct(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.text import (
        bpe_token_count,
    )

    docs = spark.createDataFrame(
        [(1, "it's well-known"), (2, "hello world"), (3, "!!!")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bpe_token_count(docs).collect()}
    # "it's well-known" -> it | 's | ' well' | '-' | 'known' = 5 subword
    # tokens but 3 whitespace-ish words (it, s, well, known -> 4 by the
    # [a-z0-9] tokenizer)
    assert rows[1].n_bpe_tokens == 5
    assert rows[1].n_ws_tokens == 4
    assert rows[2].n_bpe_tokens == 2
    assert rows[2].tokens_per_word == 1.0
    # pure punctuation: one punct run, zero words, ratio guarded to 0
    assert rows[3].n_ws_tokens == 0
    assert rows[3].tokens_per_word == 0.0


def test_lang_fertility_ratio_of_sums(spark):
    docs = spark.createDataFrame(
        [
            (1, "the and for are with"),       # en stopwords, 1 bpe token per word
            (2, "the with don't over-easy"),   # contractions/punct fragment
            (3, ""),                           # tokenless -> und group
        ],
        "doc_id long, text string",
    )
    out = {r["pred_lang"]: r for r in text.lang_fertility(docs).collect()}
    en = out["en"]
    assert en["n_docs"] == 2
    assert en["sum_bpe_tokens"] > en["sum_ws_tokens"]  # fragmentation > 1
    assert en["fertility"] == round(en["sum_bpe_tokens"] / en["sum_ws_tokens"], 6)
    assert out["und"]["fertility"] is None  # zero words -> no ratio


def test_bpe_learn_merges_deterministic_and_frequency_ordered():
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.text import (
        bpe_learn_merges,
        bpe_segment,
    )

    wc = [("the", 100), ("then", 20), ("than", 15), ("cat", 5)]
    m1 = bpe_learn_merges(wc, 8)
    m2 = bpe_learn_merges(list(wc), 8)
    assert m1 == m2  # deterministic
    # most frequent pair merges first: 't','h' appears in the/then/than
    assert m1[0] == ("t", "h")
    rank = {p: i for i, p in enumerate(m1)}
    # trained word collapses fully; OOV word reuses learned subwords
    assert bpe_segment("the", rank) == ["the"]
    seg = bpe_segment("thence", rank)  # unseen word
    assert "".join(seg) == "thence" and len(seg) < len("thence")
    # merges exhaust gracefully when fewer pairs exist than requested
    assert len(bpe_learn_merges([("ab", 1)], 10)) == 1


def test_bpe_subword_stats_spark(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.text import (
        bpe_subword_stats,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat and the hat"),
            (2, ""),          # zero tokens -> zeros
            (3, None),        # null text -> zeros
            (4, "the the the"),
        ],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=20)
    out = {r.doc_id: r for r in bpe_subword_stats(docs, merges).collect()}
    assert out[2].n_words == 0 and out[2].fertility == 0.0
    assert out[3].n_subwords == 0
    assert out[4].n_words == 3
    # 'the' is the most frequent word: it must collapse to ONE subword
    assert out[4].n_subwords == 3 and out[4].fertility == 1.0
    assert out[1].n_words == 5 and out[1].n_subwords >= 5


def test_bpe_save_load_segments_identically(spark, tmp_path):
    """A frozen tokenizer must be reusable across jobs: bpe_save/bpe_load
    round-trips the merge table, the loaded tokenizer segments a NEW
    corpus slice byte-identically to the in-session one, and the stats
    over that slice are equal row for row."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.text import (
        bpe_load,
        bpe_save,
        bpe_segment,
        bpe_subword_stats,
        bpe_train,
    )

    train_docs = spark.createDataFrame(
        [
            (1, "the cat and the hat sat on the mat"),
            (2, "the cats and hats that the rats sat on"),
        ],
        "doc_id long, text string",
    )
    merges = bpe_train(train_docs, n_merges=30)
    path = str(tmp_path / "bpe_tok")
    bpe_save(merges, path)
    loaded = bpe_load(spark, path)

    # the artifact round-trips exactly (rank order + strings)
    want = sorted((r.rank, r.left, r.right) for r in merges.collect())
    got = sorted((r.rank, r.left, r.right) for r in loaded.collect())
    assert got == want

    # frozen-tokenizer apply to a NEW corpus slice (the incremental-dedup
    # pattern): per-word segmentation is byte-identical
    rank_mem = {(r.left, r.right): int(r.rank) for r in merges.collect()}
    rank_ld = {(r.left, r.right): int(r.rank) for r in loaded.collect()}
    for w in ["the", "cats", "mats", "thatch", "unseen", "sat"]:
        assert bpe_segment(w, rank_ld) == bpe_segment(w, rank_mem)

    new_docs = spark.createDataFrame(
        [(10, "the hat that sat"), (11, "brand new unseen words")],
        "doc_id long, text string",
    )
    a = {r.doc_id: (r.n_words, r.n_subwords, r.fertility)
         for r in bpe_subword_stats(new_docs, merges).collect()}
    b = {r.doc_id: (r.n_words, r.n_subwords, r.fertility)
         for r in bpe_subword_stats(new_docs, loaded).collect()}
    assert a == b
