"""Round-11 fixes vs literal-Python mirrors (the SURVEY §5 strategy:
recompute the whole answer in plain Python from the raw parquet and
compare exactly).

Covers VERDICT/ADVICE r10: the x5_mtld fold-slot swap (the declared
metric — McCarthy & Jarvis 2010 MTLD forward pass — must match a
hand-computed walk, not just the oracle's replica of the same fold)."""

from __future__ import annotations

import re

import duckdb
import pytest


def _tokenize(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _mtld_forward(tokens: list[str]) -> tuple[int, int, int, float]:
    """Literal MTLD forward pass (McCarthy & Jarvis 2010): walk tokens,
    complete a factor whenever running TTR < 0.72 (integer test
    100*types < 72*tokens, the fold's contract); the draining token is
    consumed by the completed factor.  Returns (factors, part_tokens,
    part_types, mtld)."""
    factors = 0
    cur_tokens = 0
    seen: set[str] = set()
    for t in tokens:
        cur_tokens += 1
        seen.add(t)
        if 100 * len(seen) < 72 * cur_tokens:
            factors += 1
            cur_tokens = 0
            seen = set()
    part_tokens = cur_tokens
    part_types = len(seen)
    rem = (
        (part_tokens - part_types) * 100 / (28 * part_tokens)
        if part_tokens > 0
        else 0.0
    )
    denom = factors + rem
    mtld = round(len(tokens) / denom, 6) if denom else None
    return factors, part_tokens, part_types, mtld


HAND_CASES = [
    # ADVICE r10's example: 4 types x 5 repeats -> 8 completed factors,
    # partial factor of exactly 1 token / 1 type (verified by hand).
    ("a a a a a b b b b b c c c c c d d d d d", 8, 1, 1),
    # All-distinct tokens: TTR never drains -> 0 factors, all partial.
    ("one two three four five", 0, 5, 5),
    # Single repeated token: factor completes on every 2nd token.
    ("x x x x x x x", 3, 1, 1),
]


def test_mtld_fold_matches_hand_computed(spark):
    from diepy_spark.plans.extended import mtld_fold_expr

    rows = spark.createDataFrame(
        [(i, _tokenize(text)) for i, (text, *_) in enumerate(HAND_CASES)],
        "doc_id int, toks array<string>",
    ).selectExpr(
        "doc_id",
        f"{mtld_fold_expr('toks')} AS st",
    ).selectExpr(
        "doc_id",
        "CAST(element_at(st, 2) AS BIGINT) AS factors",
        "CAST(element_at(st, 1) AS BIGINT) AS part_tokens",
        "CAST(size(st) - 2 AS BIGINT) AS part_types",
    ).orderBy("doc_id").collect()
    for row, (text, factors, part_tokens, part_types) in zip(rows, HAND_CASES):
        assert (row.factors, row.part_tokens, row.part_types) == (
            factors,
            part_tokens,
            part_types,
        ), text
        # The literal-Python walk agrees with the hand computation too.
        assert _mtld_forward(_tokenize(text))[:3] == (
            factors,
            part_tokens,
            part_types,
        ), text


def test_mtld_matches_python(spark, sf_small):
    from diepy_spark.plans.extended import x5_mtld

    expect = {}
    con = duckdb.connect()
    for doc_id, text in con.execute(
        f"SELECT doc_id, text FROM '{sf_small}/documents.parquet'"
    ).fetchall():
        toks = _tokenize(text)
        if toks:
            expect[doc_id] = (len(toks), *_mtld_forward(toks))
    got = {
        r.doc_id: (r.n_tokens, r.factors, r.part_tokens, r.part_types, r.mtld)
        for r in x5_mtld(spark, sf_small).collect()
    }
    assert set(got) == set(expect)
    for doc_id in expect:
        assert got[doc_id][:4] == expect[doc_id][:4], doc_id
        e_mtld, g_mtld = expect[doc_id][4], got[doc_id][4]
        if e_mtld is None:
            assert g_mtld is None, doc_id
        else:
            assert g_mtld == pytest.approx(e_mtld, abs=1e-9), doc_id


def test_documents_corpus_is_ascii():
    """Pins the with_binary_payload ASCII-only invariant (see
    operators/multimodal.py): the byte-frame x6 queries and their
    character-frame DuckDB oracles are equivalent only while the
    documents corpus is single-byte-per-codepoint.  If the test data
    ever grows multibyte text, this fails before the oracle hashes
    silently diverge."""
    con = duckdb.connect()
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        n = con.execute(
            f"SELECT count(*) FROM '{sf_dir}/documents.parquet' "
            "WHERE length(text) <> strlen(text)"
        ).fetchone()[0]
        assert n == 0, f"non-ASCII documents in {sf_dir}"
