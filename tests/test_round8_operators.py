"""Round-8 operator tests: held-out BPE compression report and the
OOV path (which never fires on the shared-alphabet corpus — this pins
it firing on crafted input)."""


from diepy_spark.operators.text import bpe_encode, bpe_oov_report


def _report(spark, words, vocab_syms, merges):
    enc = spark.createDataFrame(
        [("en", n, len(w), list(w)) for w, n in words],
        "lang string, n long, chars int, syms array<string>",
    )
    enc = bpe_encode(enc, merges)
    vocab = spark.createDataFrame([(v,) for v in vocab_syms], "v string")
    return bpe_oov_report(enc, vocab).collect()


def test_oov_fires_on_unseen_char(spark):
    # vocabulary trained on {a, b, ab}: word 'abz' has pieces ab|z and
    # z is out-of-vocabulary.
    rows = _report(
        spark,
        words=[("abz", 3), ("ab", 2)],
        vocab_syms=["a", "b", "ab"],
        merges=[("a", "b")],
    )
    assert len(rows) == 1
    r = rows[0]
    # abz -> [ab, z] (2 pieces, 1 OOV) x3; ab -> [ab] x2
    assert r.n_tokens == 5
    assert r.n_chars == 3 * 3 + 2 * 2
    assert r.n_pieces == 3 * 2 + 2 * 1
    assert r.oov_pieces == 3
    assert abs(r.oov_rate - 3 / 8) < 1e-9
    assert abs(r.chars_per_piece - 13 / 8) < 1e-4


def test_zero_oov_when_vocab_covers(spark):
    rows = _report(
        spark,
        words=[("ab", 4), ("ba", 1)],
        vocab_syms=["a", "b", "ab"],
        merges=[("a", "b")],
    )
    assert rows[0].oov_pieces == 0
    assert rows[0].oov_rate == 0.0


def test_compression_heldout_split(spark, sf_oracle):
    from diepy_spark.plans.extended import (
        BPE_EVAL_HOLD,
        BPE_EVAL_MOD,
        x5_bpe_compression,
    )
    from diepy_spark.sources.registry import load_table

    rows = x5_bpe_compression(spark, sf_oracle).collect()
    langs = {
        r.lang
        for r in load_table(spark, sf_oracle, "documents")
        .where(f"doc_id % {BPE_EVAL_MOD} = {BPE_EVAL_HOLD}")
        .select("lang")
        .distinct()
        .collect()
    }
    assert {r.lang for r in rows} == langs
    for r in rows:
        # merges compress: fewer pieces than chars, at least one per token
        assert r.n_tokens <= r.n_pieces < r.n_chars
        assert r.chars_per_piece > 1.0
        # shared alphabet corpus: OOV honestly zero
        assert r.oov_pieces == 0 and r.oov_rate == 0.0
