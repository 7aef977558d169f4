"""Round-11 fixes vs literal-Python mirrors (the SURVEY §5 strategy:
recompute the whole answer in plain Python from the raw parquet and
compare exactly).

Covers VERDICT/ADVICE r10: the x5_mtld fold-slot swap (the declared
metric — McCarthy & Jarvis 2010 MTLD forward pass — must match a
hand-computed walk, not just the oracle's replica of the same fold)."""

from __future__ import annotations

import glob
import math
import os
import re
from collections import Counter, defaultdict

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
        "st.f AS factors",
        "st.ct AS part_tokens",
        "CAST(size(st.seen) AS BIGINT) AS part_types",
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
    # Every sf tier on disk, not just the two smallest: the bench/ladder
    # corpora (sf0.1; sf1 via tools/make_sf1.py) run the same byte-frame
    # queries, so multibyte text there would diverge just as silently.
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dirs = sorted(glob.glob("/root/testdata/sf*")) + sorted(
        glob.glob(os.path.join(here, "spark-warehouse", "sf*"))
    )
    assert sf_dirs, "no testdata sf directories found"
    checked = 0
    for sf_dir in sf_dirs:
        doc = os.path.join(sf_dir, "documents.parquet")
        if not os.path.exists(doc):
            continue
        # Spark-written tables are directories of part files
        src = f"{doc}/*.parquet" if os.path.isdir(doc) else doc
        n = con.execute(
            f"SELECT count(*) FROM '{src}' "
            "WHERE length(text) <> strlen(text)"
        ).fetchone()[0]
        assert n == 0, f"non-ASCII documents in {sf_dir}"
        checked += 1
    # a renamed/missing documents.parquet must not pass vacuously
    # (ADVICE r12): the two driver testdata tiers are always present
    assert checked >= 2, f"only {checked} sf dirs actually checked"


def _doc_rows(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()


def test_yule_k_matches_python(spark, sf_small):
    from diepy_spark.plans.extended import YK_SCALE, x5_yule_k

    expect = {}
    for doc_id, _src, text in _doc_rows(sf_small):
        toks = _tokenize(text)
        n = len(toks)
        if n <= 1:
            continue
        cnt = Counter(toks)
        s2 = sum(c * c for c in cnt.values())
        expect[doc_id] = (
            n,
            len(cnt),
            round(YK_SCALE * (s2 - n) / (n * n), 6),
            round((s2 - n) / (n * (n - 1)), 6),
        )
    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.yule_k, r.simpson_d)
        for r in x5_yule_k(spark, sf_small).collect()
    }
    assert got == pytest.approx(expect, abs=1e-9)


def test_collocations_matches_python(spark, sf_small):
    from diepy_spark.plans.extended import (
        COLL_MIN,
        COLL_TOP,
        x5_collocations,
    )

    def xlnx(x: int) -> float:
        return x * math.log(x) if x > 0 else 0.0

    bg: Counter = Counter()
    for _doc_id, _src, text in _doc_rows(sf_small):
        toks = _tokenize(text)
        bg.update(zip(toks, toks[1:]))
    c1: Counter = Counter()
    c2: Counter = Counter()
    for (w1, w2), k in bg.items():
        c1[w1] += k
        c2[w2] += k
    t = sum(bg.values())
    rows = []
    for (w1, w2), k11 in bg.items():
        if k11 < COLL_MIN:
            continue
        k12 = c1[w1] - k11
        k21 = c2[w2] - k11
        k22 = t - c1[w1] - c2[w2] + k11
        g2 = 2 * (
            xlnx(k11) + xlnx(k12) + xlnx(k21) + xlnx(k22)
            - xlnx(k11 + k12) - xlnx(k21 + k22)
            - xlnx(k11 + k21) - xlnx(k12 + k22)
            + xlnx(k11 + k12 + k21 + k22)
        )
        rows.append((w1, w2, k11, k12, k21, k22, round(g2, 6)))
    rows.sort(key=lambda r: (-r[6], r[0], r[1]))
    expect = rows[:COLL_TOP]
    got = [tuple(r) for r in x5_collocations(spark, sf_small).collect()]
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g[:6] == e[:6], (g, e)
        assert g[6] == pytest.approx(e[6], abs=1e-6)


def test_burstiness_matches_python(spark, sf_small):
    from diepy_spark.plans.extended import (
        BURST_MIN_DF,
        BURST_TOP,
        x5_burstiness,
    )

    per_term: dict[str, list[int]] = defaultdict(list)
    for _doc_id, _src, text in _doc_rows(sf_small):
        for tok, c in Counter(_tokenize(text)).items():
            per_term[tok].append(c)
    rows = []
    for tok, cs in per_term.items():
        df_ = len(cs)
        if df_ < BURST_MIN_DF:
            continue
        tf = sum(cs)
        ss = sum(c * c for c in cs)
        rate = round(tf / df_, 6)
        fano = round(
            ((df_ * ss - tf * tf) / (df_ * (df_ - 1))) / (tf / df_), 6
        )
        rows.append((tok, df_, tf, rate, fano))
    rows.sort(key=lambda r: (-r[4], r[0]))
    expect = rows[:BURST_TOP]
    got = [tuple(r) for r in x5_burstiness(spark, sf_small).collect()]
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g[:3] == e[:3], (g, e)
        assert g[3] == pytest.approx(e[3], abs=1e-9)
        assert g[4] == pytest.approx(e[4], abs=1e-9)


def test_token_budget_matches_python(spark, sf_small):
    from diepy_spark.plans.extended import TB_FRAC, x10_token_budget

    per_src: dict[str, list[tuple[int, int, int]]] = defaultdict(list)
    for doc_id, src, text in _doc_rows(sf_small):
        toks = _tokenize(text)
        if not toks:
            continue
        n = len(toks)
        score6 = len(set(toks)) * 1000000 // n
        per_src[src].append((-score6, doc_id, n))
    expect = {}
    for src, docs in per_src.items():
        docs.sort()
        total = sum(n for _s, _d, n in docs)
        budget = total // TB_FRAC
        cum = 0
        sel = []
        for neg6, _d, n in docs:
            cum += n
            if cum > budget:
                break
            sel.append((-neg6, n))
        n_sel = len(sel)
        sel_tokens = sum(n for _s6, n in sel)
        avg6 = sum(s6 for s6, _n in sel) // n_sel if n_sel else 0
        expect[src] = (
            len(docs),
            budget,
            n_sel,
            sel_tokens,
            round(sel_tokens / budget, 6),
            avg6,
        )
    got = {
        r.source: (
            r.n_docs, r.budget, r.n_sel, r.sel_tokens,
            r.utilization, r.avg_score6,
        )
        for r in x10_token_budget(spark, sf_small).collect()
    }
    assert got == pytest.approx(expect, abs=1e-9)


def test_block_running_sum_equals_global_window(spark):
    """block_running_sum must be bit-identical to the single-partition
    per-group window it replaces, under partition counts that split
    groups across several range partitions."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from diepy_spark.operators.suffixes import block_running_sum

    rng = random.Random(11)
    rows = [
        (f"s{rng.randrange(4)}", i, rng.randrange(1, 100))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "g string, k int, v long")
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expect = {
        (r.g, r.k): r.cum
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    for parts in (1, 3, 16):
        got = {
            (r.g, r.k): r.cum
            for r in block_running_sum(
                df, "g", ["k"], "v", out="cum", parts=parts
            ).collect()
        }
        assert got == expect, parts


def _c4_python(edges: set[tuple[int, int]]) -> int:
    """Independent 4-cycle count: brute-force over ordered 4-tuples /
    8 (each cycle has 8 traversals).  Only for tiny graphs."""
    from itertools import permutations

    adj = defaultdict(set)
    nodes = set()
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
        nodes.update((u, v))
    cnt = 0
    for quad in permutations(sorted(nodes), 4):
        a, b, c, d = quad
        if b in adj[a] and c in adj[b] and d in adj[c] and a in adj[d]:
            cnt += 1
    return cnt // 8


def test_four_cycles_identity_on_hand_graphs():
    """The opposite-pair identity C4 = sum(C(n_uw, 2)) / 2 equals the
    brute-force count on hand graphs: a square (1), a square with a
    chord (1), K4 (3), two disjoint squares (2), a triangle (0)."""
    square = {(1, 2), (2, 3), (3, 4), (4, 1)}
    chord = square | {(1, 3)}
    k4 = {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    two_sq = square | {(5, 6), (6, 7), (7, 8), (8, 5)}
    tri = {(1, 2), (2, 3), (3, 1)}
    for g, want in ((square, 1), (chord, 1), (k4, 3), (two_sq, 2), (tri, 0)):
        assert _c4_python(g) == want
        adj = defaultdict(set)
        for u, v in g:
            adj[u].add(v)
            adj[v].add(u)
        ns = sorted(adj)
        s = 0
        for i, u in enumerate(ns):
            for w in ns[i + 1:]:
                n = len(adj[u] & adj[w])
                s += n * (n - 1) // 2
        assert s // 2 == want, g


def test_four_cycles_matches_python(spark, sf_small):
    from diepy_spark.plans.extended import (
        FC_DENS,
        FC_N_MIN,
        x11_four_cycles,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey, o_custkey FROM '{sf_small}/orders.parquet'"
    ).fetchall()
    fc_n = max(FC_N_MIN, len(rows) // FC_DENS)
    edges = set()
    for ok, ck in rows:
        a, b = (ok * 37 + 11) % fc_n, (ck * 101 + 7) % fc_n
        if a != b:
            edges.add((min(a, b), max(a, b)))
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    ns = sorted(adj)
    s = 0
    for i, u in enumerate(ns):
        for w in ns[i + 1:]:
            n = len(adj[u] & adj[w])
            s += n * (n - 1) // 2
    c4 = s // 2
    n_edges = len(edges)
    wedges = sum(len(a) * (len(a) - 1) // 2 for a in adj.values())
    got = x11_four_cycles(spark, sf_small).collect()[0]
    assert (got.n_nodes, got.n_edges, got.wedges, got.c4) == (
        len(ns), n_edges, wedges, c4,
    )
    assert got.c4_per_edge == pytest.approx(round(c4 / n_edges, 6), abs=1e-9)


def test_stream_sinks_are_dropped(spark, sf_small):
    """Pins the _run_stream cleanup contract (VERDICT r10 #1): a
    streaming query's memory sink must not outlive its materialization
    — across a 350-query bench the accumulated sinks measured as ~2x
    drag on late families.  After running a streamed query, no
    x7_mem_* temp view remains and no terminated query handle is held."""
    from diepy_spark.plans.pipeline import x7_stream_tumbling

    rows = x7_stream_tumbling(spark, sf_small).collect()
    assert rows  # the result itself survives the sink drop
    leftover = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("x7_mem_")
    ]
    assert leftover == []
    assert list(spark.streams.active) == []
