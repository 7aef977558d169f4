"""Round-9 operators vs literal-Python mirrors (the test strategy
SURVEY §5 models: recompute the whole answer in plain Python from the
raw parquet and compare exactly)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb
import pytest


def _tokenize(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _load_docs(sf_dir: str) -> dict[int, list[str]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    return {d: _tokenize(t) for d, t in rows}


def _bm25_python(sf_dir, n_queries, n_qterms, k, min_len, scale):
    """Literal BM25 with the integer quantization contract:
    idf = round(ln((2N+2)/(2df+1))*scale); avgdl/kd round-half-up
    milli integers; per-term floor division; exact integer sum."""
    docs = _load_docs(sf_dir)
    tf = {d: Counter(t) for d, t in docs.items() if t}
    dl = {d: sum(c.values()) for d, c in tf.items()}
    n = len(dl)
    t_toks = sum(dl.values())
    avg_milli = (2000 * t_toks + n) // (2 * n)
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    idf = {
        t: int(round(math.log((2 * n + 2) / (2 * f + 1)) * scale, 0))
        for t, f in df.items()
    }
    kd = {
        d: 300 + (1800000 * L + avg_milli) // (2 * avg_milli)
        for d, L in dl.items()
    }
    probes = sorted(d for d, L in dl.items() if L >= min_len)[:n_queries]
    out = {}
    for q in probes:
        qt = sorted(tf[q].keys(), key=lambda t: (df[t], t))[:n_qterms]
        scores = defaultdict(int)
        for t in qt:
            for d, cnt in tf.items():
                if d == q or t not in cnt:
                    continue
                c = cnt[t]
                scores[d] += (idf[t] * 2200 * c) // (1000 * c + kd[d])
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[q] = [(rk + 1, d, s) for rk, (d, s) in enumerate(ranked)]
    return out


def test_bm25_matches_python(spark, sf_small):
    from diepy_spark.operators.text import BM25_IDF_SCALE
    from diepy_spark.plans.extended import (
        BM_K,
        BM_MINLEN,
        BM_NQ,
        BM_QTERMS,
        x3_bm25_topk,
    )

    expect = _bm25_python(
        sf_small, BM_NQ, BM_QTERMS, BM_K, BM_MINLEN, BM25_IDF_SCALE
    )
    got = defaultdict(list)
    for r in x3_bm25_topk(spark, sf_small).collect():
        got[r.query_id].append((r.rk, r.doc_id, r.score_x1e6))
    assert dict(got) == {q: v for q, v in expect.items() if v}


def test_bm25_scores_positive_and_ranked(spark, sf_small):
    from diepy_spark.plans.extended import x3_bm25_topk

    rows = x3_bm25_topk(spark, sf_small).collect()
    assert rows, "degenerate fixture: no BM25 results"
    by_q = defaultdict(list)
    for r in rows:
        assert r.score_x1e6 > 0
        by_q[r.query_id].append((r.rk, r.score_x1e6))
    for q, rs in by_q.items():
        rs.sort()
        assert [rk for rk, _ in rs] == list(range(1, len(rs) + 1))
        scores = [s for _, s in rs]
        assert scores == sorted(scores, reverse=True)


def test_hybrid_rrf_matches_python(spark, sf_small):
    """RRF fusion must equal the literal round-half-up integer sum over
    the two Spark-produced rank lists (fusion layer isolated: inputs
    are taken from the engine, arithmetic recomputed in Python)."""
    from diepy_spark.plans.extended import (
        BM_K,
        RRF_K,
        RRF_SCALE,
        _bm25_topk_cached,
        x3_hybrid_rank,
    )

    lex = {
        (r.query_id, r.doc_id): r.rk
        for r in _bm25_topk_cached(spark, sf_small).collect()
    }
    hyb = x3_hybrid_rank(spark, sf_small).collect()
    assert hyb, "degenerate fixture: no hybrid results"
    dense = {
        (r.query_id, r.doc_id): r.dense_rk
        for r in hyb
        if r.dense_rk > 0
    }

    def contrib(rk):
        return (2 * RRF_SCALE + (RRF_K + rk)) // (2 * (RRF_K + rk))

    for r in hyb:
        key = (r.query_id, r.doc_id)
        want = 0
        if key in lex:
            assert r.lex_rk == lex[key]
            want += contrib(lex[key])
        else:
            assert r.lex_rk == 0
        if key in dense:
            want += contrib(dense[key])
        assert r.rrf_x1e9 == want
        assert r.rk <= BM_K


def test_hybrid_fuses_both_lists(spark, sf_small):
    """At least one fused row should come from each list somewhere in
    the result (otherwise the union is degenerate)."""
    from diepy_spark.plans.extended import x3_hybrid_rank

    rows = x3_hybrid_rank(spark, sf_small).collect()
    assert any(r.lex_rk > 0 for r in rows)
    assert any(r.dense_rk > 0 for r in rows)


def test_unigram_em_matches_python_trainer(spark, sf_small):
    """The distributed hard-EM query must reproduce the driver-side
    trainer (operators/text.py:unigram_train_em) EXACTLY — same capped
    word dict, same seed, same Viterbi tie-break, same pruning/floor."""
    from diepy_spark.operators.text import unigram_train_em
    from diepy_spark.plans.extended import (
        UNI_DICT_MAX,
        UNI_EM_ITERS,
        _unigram_words,
        x5_unigram_em,
    )

    rows = (
        _unigram_words(spark, sf_small)
        .groupBy("w")
        .agg({"n": "sum"})
        .withColumnRenamed("sum(n)", "n")
        .orderBy([("n"), ("w")], ascending=[False, True])
        .limit(UNI_DICT_MAX)
        .collect()
    )
    expect = unigram_train_em(
        [(r["w"], int(r["n"])) for r in rows], iters=UNI_EM_ITERS
    )
    got = [
        (r.piece, r.score) for r in x5_unigram_em(spark, sf_small).collect()
    ]
    assert got == expect


def test_record_linkage_matches_bruteforce(spark, sf_small):
    """PPJoin's prefix/positional/length filters are LOSSLESS: the
    best-match table must equal a filterless brute-force Jaccard scan
    over all odd x even pairs."""
    from diepy_spark.plans.extended import RL_DEN, RL_NUM, x2_record_linkage

    docs = _load_docs(sf_small)
    sets = {d: set(t) for d, t in docs.items() if t}
    left = {d: s for d, s in sets.items() if d % 2 == 1}
    right = {d: s for d, s in sets.items() if d % 2 == 0}
    expect = {}
    for da, A in left.items():
        matches = []
        for db, B in right.items():
            inter = len(A & B)
            union = len(A) + len(B) - inter
            if inter * RL_DEN >= RL_NUM * union:
                matches.append((round(inter / union, 4), db))
        if matches:
            matches.sort(key=lambda jb: (-jb[0], jb[1]))
            expect[da] = (matches[0][1], matches[0][0], len(matches))
    got = {
        r.da: (r.db, r.jac, r.n_matches)
        for r in x2_record_linkage(spark, sf_small).collect()
    }
    assert got == expect


def test_dsir_matches_python(spark, sf_small):
    """DSIR importance weights: exact ladder-score mirror over the two
    unigram LMs, top-N manifest equality."""
    from diepy_spark.operators.text import (
        UNI_MU,
        UNI_OCTAVES,
        unigram_score_from_freq,
    )
    from diepy_spark.plans.extended import (
        DSIR_N,
        DSIR_TARGET_LANG,
        x10_dsir_select,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, lang, source, text"
        f" FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    floor = -(UNI_MU * UNI_OCTAVES)
    raw, tgt = Counter(), Counter()
    per_doc = {}
    for d, lang, src, text in rows:
        c = Counter(_tokenize(text))
        if not c:
            continue
        per_doc[d] = (lang, src, c)
        raw.update(c)
        if lang == DSIR_TARGET_LANG:
            tgt.update(c)
    tot_r, tot_t = sum(raw.values()), sum(tgt.values())
    sc_r = {w: unigram_score_from_freq(f, tot_r) for w, f in raw.items()}
    sc_t = {w: unigram_score_from_freq(f, tot_t) for w, f in tgt.items()}
    scored = []
    for d, (lang, src, c) in per_doc.items():
        imp = sum(
            n * (sc_t.get(w, floor) - sc_r.get(w, floor))
            for w, n in c.items()
        )
        scored.append((d, lang, src, sum(c.values()), imp))
    scored.sort(key=lambda r: (-r[4], r[0]))
    expect = scored[:DSIR_N]
    got = [
        (r.doc_id, r.lang, r.source, r.n_toks, r.imp_x64)
        for r in x10_dsir_select(spark, sf_small).collect()
    ]
    assert got == expect
    sel = x10_dsir_select(spark, sf_small).collect()
    for r in sel:
        assert r.log2_ratio == r.imp_x64 / 64


def test_hard_negatives_flags(spark, sf_small):
    """Every BM25 pair appears exactly once; the flag mirrors the
    cosine column against HN_COS_MAX."""
    from diepy_spark.plans.extended import (
        HN_COS_MAX,
        _bm25_topk_cached,
        x3_hard_negatives,
    )

    lex = {
        (r.query_id, r.doc_id): (r.rk, r.score_x1e6)
        for r in _bm25_topk_cached(spark, sf_small).collect()
    }
    rows = x3_hard_negatives(spark, sf_small).collect()
    assert {(r.query_id, r.doc_id) for r in rows} == set(lex)
    n_hard = 0
    for r in rows:
        assert (r.lex_rk, r.score_x1e6) == lex[(r.query_id, r.doc_id)]
        assert r.is_hard == int(r.cos <= HN_COS_MAX)
        n_hard += r.is_hard
    assert 0 < n_hard < len(rows)  # threshold splits the fixture


def test_tokenizer_compare_consistent(spark, sf_small):
    """The comparison table must restate its two component queries."""
    from diepy_spark.plans.extended import (
        x5_bpe_apply,
        x5_tokenizer_compare,
        x5_unigram_encode,
    )

    b = {r.lang: r for r in x5_bpe_apply(spark, sf_small).collect()}
    ug = {r.lang: r for r in x5_unigram_encode(spark, sf_small).collect()}
    rows = x5_tokenizer_compare(spark, sf_small).collect()
    assert {r.lang for r in rows} == set(b) & set(ug)
    for r in rows:
        assert r.bpe_ppt == b[r.lang].pieces_per_token
        assert r.uni_ppt == ug[r.lang].pieces_per_token
        want = (
            "bpe" if r.bpe_ppt < r.uni_ppt
            else ("unigram" if r.uni_ppt < r.bpe_ppt else "tie")
        )
        assert r.fertility_winner == want


def test_adc_rerank_dominates_adc(spark, sf_small):
    """Refine never loses recall: rerank_hits == shortlist_hits (exact
    sort within the shortlist) and >= adc_hits; all bounded by k."""
    from diepy_spark.plans.extended import x3_adc_rerank

    rows = x3_adc_rerank(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0 <= r.adc_hits <= r.rerank_hits <= r.k
        assert r.rerank_hits == r.shortlist_hits


def test_power_analysis_matches_python(spark, sf_small):
    import duckdb as _d
    from diepy_spark.plans.extended import AB_CONV_MIN, x8_power_analysis

    con = _d.connect()
    rows = con.execute(f"""
      SELECT CAST(user_id % 2 = 0 AS INT) AS grp, count(*) AS n,
             sum(CAST(max_conv AS INT)) AS c
      FROM (SELECT user_id, max(event_type = 'purchase'
                 AND value > {AB_CONV_MIN}) AS max_conv
            FROM '{sf_small}/events.parquet' GROUP BY 1)
      GROUP BY 1""").fetchall()
    d = {g: (n, c) for g, n, c in rows}
    n_a, c_a = d[1]
    n_b, c_b = d[0]
    pa, pb = c_a / n_a, c_b / n_b
    za, zb = 1.959963984540054, 0.8416212335729143
    n_req = math.ceil(
        (za + zb) * (za + zb) * (pa * (1 - pa) + pb * (1 - pb))
        / ((pa - pb) * (pa - pb))
    )
    mde = (za + zb) * math.sqrt(
        pa * (1 - pa) / n_a + pb * (1 - pb) / n_b
    )
    r = x8_power_analysis(spark, sf_small).collect()[0]
    assert (r.n_a, r.c_a, r.n_b, r.c_b) == (n_a, c_a, n_b, c_b)
    assert r.n_required_per_arm == n_req
    # the query renders mde at round-6
    assert abs(r.mde_at_current_n - mde) <= 5.1e-7
