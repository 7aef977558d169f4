"""Round-12 operators: literal-Python mirrors for the two new
artifact-consumer queries (VERDICT r11 #8 — consumers, not counters).

x2_dup_quality   — near-dup-cluster-size x quality cross-tab; the mirror
                   rebuilds the WHOLE chain (tokenize -> bigram shingles ->
                   max_df stop set -> kept-set Jaccard -> union-find ->
                   bucketed exact-integer aggregates) independently.
x10_budget_price — per-source budget boundary (last selected / first
                   dropped doc on the quality-prefix ranking).
"""

from __future__ import annotations

import re
from collections import defaultdict

import duckdb
import pytest


def _tokenize(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _doc_rows(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()


class _UF:
    def __init__(self):
        self.p: dict[int, int] = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def test_dup_quality_matches_python(spark, sf_small):
    from diepy_spark.operators.text import LANG_PROFILES
    from diepy_spark.plans.extended import (
        JACCARD_MAX_DF,
        JACCARD_THRESHOLD,
        x2_dup_quality,
    )

    stop_words = set(LANG_PROFILES["en"])
    rows = _doc_rows(sf_small)

    # per-doc distinct bigram shingles over the standard tokenization
    shingles: dict[int, set[str]] = {}
    for doc_id, _src, text in rows:
        toks = _tokenize(text)
        shingles[doc_id] = {
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        }

    # stop set: shingles present in more than max_df docs
    df_cnt: dict[str, int] = defaultdict(int)
    for sh in shingles.values():
        for s in sh:
            df_cnt[s] += 1
    stop_sh = {s for s, c in df_cnt.items() if c > JACCARD_MAX_DF}
    kept = {d: sh - stop_sh for d, sh in shingles.items()}

    # pair graph via inverted index; Jaccard over KEPT sets
    inv: dict[str, list[int]] = defaultdict(list)
    for d in sorted(kept):
        for s in kept[d]:
            inv[s].append(d)
    inter: dict[tuple[int, int], int] = defaultdict(int)
    for docs in inv.values():
        for i, da in enumerate(docs):
            for db in docs[i + 1:]:
                inter[(da, db)] += 1
    uf = _UF()
    for (da, db), c in inter.items():
        union = len(kept[da]) + len(kept[db]) - c
        if union > 0 and c / union >= JACCARD_THRESHOLD:
            uf.union(da, db)

    # cluster label = min reachable node; docs outside the pair graph are
    # their own singleton clusters
    label = {d: uf.find(d) if d in uf.p else d for d in shingles}
    csize: dict[int, int] = defaultdict(int)
    for d in label:
        csize[label[d]] += 1

    def bucket(sz: int) -> str:
        return "1" if sz == 1 else "2" if sz == 2 else "3-4" if sz <= 4 else "5+"

    agg = defaultdict(lambda: [0, set(), 0, 0, 0, 0])  # docs, clusters, tok, dist, stop, chars
    for doc_id, _src, text in rows:
        toks = _tokenize(text)
        b = bucket(csize[label[doc_id]])
        a = agg[b]
        a[0] += 1
        a[1].add(label[doc_id])
        a[2] += len(toks)
        a[3] += len(set(toks))
        a[4] += sum(1 for t in toks if t in stop_words)
        a[5] += len(text)

    expect = {}
    for b, (nd, cl, st, sd, ss, sc) in agg.items():
        expect[b] = (
            nd,
            len(cl),
            st,
            st / nd,
            (sd / st) if st > 0 else None,
            (ss / st) if st > 0 else None,
            sc / nd,
        )

    got = {
        r.dup_bucket: (
            r.n_docs, r.n_clusters, r.sum_tokens, r.toks_per_doc,
            r.ttr, r.stop_ratio, r.chars_per_doc,
        )
        for r in x2_dup_quality(spark, sf_small).collect()
    }
    assert set(got) == set(expect)
    for b in expect:
        assert got[b][:3] == expect[b][:3], b
        for gi, ei in zip(got[b][3:], expect[b][3:]):
            if ei is None:
                assert gi is None, b
            else:
                assert gi == pytest.approx(ei, abs=1e-12), b


def test_budget_price_matches_python(spark, sf_small):
    from diepy_spark.plans.extended import TB_FRAC, x10_budget_price

    by_src: dict[str, list[tuple[int, int, int]]] = defaultdict(list)
    for doc_id, src, text in _doc_rows(sf_small):
        toks = _tokenize(text)
        n = len(toks)
        if n == 0:
            continue
        score6 = len(set(toks)) * 1000000 // n
        by_src[src].append((doc_id, n, score6))

    expect = {}
    for src, docs in by_src.items():
        budget = sum(n for _d, n, _s in docs) // TB_FRAC
        ranked = sorted(docs, key=lambda t: (-t[2], t[0]))
        cum = 0
        n_sel = 0
        last_sel = first_drop = None
        for doc_id, n, s6 in ranked:
            cum += n
            if cum <= budget:
                n_sel += 1
                last_sel = (doc_id, s6)
            else:
                first_drop = (doc_id, s6)
                break
        gap = (
            last_sel[1] - first_drop[1]
            if last_sel is not None and first_drop is not None
            else None
        )
        expect[src] = (
            budget,
            n_sel,
            last_sel[0] if last_sel else None,
            last_sel[1] if last_sel else None,
            first_drop[0] if first_drop else None,
            first_drop[1] if first_drop else None,
            gap,
        )

    got = {
        r.source: (
            r.budget, r.n_sel, r.last_sel_doc, r.last_sel_score6,
            r.first_drop_doc, r.first_drop_score6, r.score_gap,
        )
        for r in x10_budget_price(spark, sf_small).collect()
    }
    assert got == expect


def test_freq_quantile_cont_matches_percentile(spark):
    """freq_quantile_cont must be BIT-IDENTICAL to Spark percentile()
    (same interpolation weights) on ties, n=1 groups, fractional and
    integral positions, and NULL values — and invariant to input
    partitioning (the block running sum's contract)."""
    from pyspark.sql import functions as F

    from diepy_spark.operators.robust import freq_quantile_cont

    rows = []
    # group a: ties + fractional interpolation; b: n=1; c: nulls mixed in
    rows += [("a", float(v)) for v in [1, 1, 2, 2, 2, 5, 9, 9, 12, 40]]
    rows += [("b", 7.5)]
    rows += [("c", None), ("c", 3.0), ("c", 4.0), ("c", None), ("c", 10.0)]
    rows += [("d", float((i * 37) % 101)) for i in range(57)]
    df = spark.createDataFrame(rows, "g string, v double")
    for q in (0.0, 0.1, 0.25, 0.5, 0.9, 1.0):
        want = {
            r.g: r.p
            for r in df.groupBy("g")
            .agg(F.expr(f"percentile(v, {q})").alias("p"))
            .collect()
        }
        for parts in (1, 3, 16):
            got = {
                r.g: r.q
                for r in freq_quantile_cont(
                    df.repartition(parts), "g", "v", q, out="q"
                ).collect()
            }
            assert got == want, (q, parts)


def test_freq_quantile_cont_multi_matches_percentile(spark):
    """The one-pass multi-metric variant must agree with percentile()
    per metric — different value columns AND different q in one call."""
    from pyspark.sql import functions as F

    from diepy_spark.operators.robust import freq_quantile_cont_multi

    rows = [
        ("g1", float(v), float((v * 13) % 29)) for v in range(17)
    ] + [("g2", 4.0, 4.0), ("g2", None, 9.0), ("g2", 6.0, None)]
    df = spark.createDataFrame(rows, "g string, a double, b double")
    want = {
        r.g: (r.ma, r.pb)
        for r in df.groupBy("g")
        .agg(
            F.expr("percentile(a, 0.5)").alias("ma"),
            F.expr("percentile(b, 0.9)").alias("pb"),
        )
        .collect()
    }
    got = {
        r.g: (r.ma, r.pb)
        for r in freq_quantile_cont_multi(
            df.repartition(5), "g", {"ma": ("a", 0.5), "pb": ("b", 0.9)}
        ).collect()
    }
    assert got == want


def test_priority_window_is_declared_prefix(spark):
    """Driver-window hygiene: every _PRIORITY name must exist in the
    declared set, the window must be exactly 50 entries with no dups,
    and queries() must surface it as its insertion-order prefix (the
    driver hash-checks the FIRST 50)."""
    import __spark_entry__ as e

    pri = e._PRIORITY
    assert len(pri) == 50
    assert len(set(pri)) == 50
    names = list(e.queries())
    assert names[:50] == pri
    assert all(n in e.oracle_sql() for n in pri)


def test_token_budget_zero_budget_renders_null(spark, tmp_path):
    """ADVICE r11: a source whose total token mass is below TB_FRAC gets
    budget=0 — utilization must render NULL (not raise / not inf) in
    BOTH engines. End-to-end over a synthetic documents.parquet."""
    import duckdb

    from diepy_spark.plans.extended import EXTENDED_ORACLES, x10_token_budget

    sf = str(tmp_path)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM (VALUES
            (0, 'only three tokens', 'en', 'tiny', 17),
            (1, 'a much longer document with plenty of words to pass the
                 budget threshold for its source easily', 'en', 'big', 100),
            (2, 'another long document with plenty of distinct words so the
                 big source keeps a positive budget', 'en', 'big', 100)
          ) t(doc_id, text, lang, source, n_chars)
        ) TO '{sf}/documents.parquet' (FORMAT PARQUET)
        """
    )
    rows = {r.source: r for r in x10_token_budget(spark, sf).collect()}
    # 'tiny' has 3 tokens -> budget 3 div 4 = 0 -> NULL utilization
    assert rows["tiny"].budget == 0
    assert rows["tiny"].utilization is None
    assert rows["tiny"].n_sel == 0
    assert rows["big"].budget > 0
    assert rows["big"].utilization is not None
    # oracle agrees on the NULL
    con.execute(f"CREATE VIEW documents AS FROM '{sf}/documents.parquet'")
    orc = {
        r[0]: r
        for r in con.execute(EXTENDED_ORACLES["x10_token_budget"]).fetchall()
    }
    assert orc["tiny"][2] == 0 and orc["tiny"][5] is None


def test_media_savings_matches_python(spark, sf_small):
    """Literal mirror of x6_media_savings: exact tier fully independent
    (hashlib md5 groups over the ASCII payload stand-in); near tier as an
    independent union-find + byte aggregation over the blockhash pair
    graph (pairs produced by DuckDB's oracle SQL, itself hash-verified
    against the Spark plan)."""
    import hashlib

    from diepy_spark.plans.extended import (
        EXTENDED_ORACLES,
        MEDIA_DOC_MAX,
        x6_media_savings,
    )

    rows = [
        (doc_id, text)
        for doc_id, _src, text in _doc_rows(sf_small)
        if doc_id < MEDIA_DOC_MAX
    ]
    nb = {d: len(t.encode()) for d, t in rows}

    groups = defaultdict(list)
    for d, t in rows:
        groups[hashlib.md5(t.encode()).hexdigest()].append(d)
    bytes_total = sum(nb.values())
    exact = (
        len(rows),
        len(groups),
        bytes_total,
        sum(sum(nb[d] for d in g) - min(nb[d] for d in g)
            for g in groups.values()),
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS FROM '{sf_small}/documents.parquet'"
    )
    pairs = con.execute(
        EXTENDED_ORACLES["x6_blockhash_near_dup"]
    ).fetchall()
    uf = _UF()
    for da, db, _h in pairs:
        uf.union(da, db)
    flagged = [d for d, _t in rows if d in uf.p and uf.find(d) != d]
    near = (
        len(rows),
        len(rows) - len(flagged),
        bytes_total,
        sum(nb[d] for d in flagged),
    )

    got = {
        r.tier: (r.n_assets, r.n_keep, r.bytes_total, r.bytes_reclaim,
                 r.reclaim_frac)
        for r in x6_media_savings(spark, sf_small).collect()
    }
    assert got["exact"][:4] == exact
    assert got["near"][:4] == near
    for tier, exp in (("exact", exact), ("near", near)):
        frac = got[tier][4]
        if exp[2] > 0:
            assert frac == pytest.approx(exp[3] / exp[2], abs=1e-12)
        else:
            assert frac is None
