"""Round-4 analytics operators: snapshot diff (CDC), triangle counting,
Bloom semi-join, cohort retention, market basket, fuzzy join, DQ profile.

Style follows test_operators.py: tiny hand-computed cases plus seeded
randomized equivalence against literal pure-python reference
implementations."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from diepy_spark.operators.bloom import bloom_build, bloom_position_sql, bloom_probe
from diepy_spark.operators.clustering import triangle_count
from diepy_spark.operators.merge import snapshot_diff


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------

def test_snapshot_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "c", None), (4, "D", 4.0), (5, "e", 5.0)],
        "k long, s string, v double",
    )
    got = {
        r["k"]: (r["change_type"], r["old_s"], r["new_s"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    # 1 deleted; 2 unchanged (absent); 3 unchanged with NULL<=>NULL; 4
    # updated (case change); 5 inserted
    assert got == {
        1: ("delete", "a", None),
        4: ("update", "d", "D"),
        5: ("insert", None, "e"),
    }


def test_snapshot_diff_roundtrip_through_merge(spark):
    """Applying the changeset's insert/update rows via merge_upsert and
    filtering its deletes reconstructs the new snapshot exactly."""
    from diepy_spark.operators.merge import merge_upsert

    old = spark.createDataFrame(
        [(i, f"s{i}", float(i)) for i in range(20)], "k long, s string, v double"
    )
    new = spark.createDataFrame(
        [(i, f"s{i}" if i % 3 else "mut", float(i)) for i in range(5, 25)],
        "k long, s string, v double",
    )
    d = snapshot_diff(old, new, ["k"]).cache()
    ups = d.where(F.col("change_type") != "delete").select(
        "k", F.col("new_s").alias("s"), F.col("new_v").alias("v")
    )
    dels = [r["k"] for r in d.where(F.col("change_type") == "delete").collect()]
    rebuilt = merge_upsert(old, ups, ["k"]).where(~F.col("k").isin(dels))
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))
    d.unpersist()


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------

def _tri_reference(edges):
    """Literal per-node triangle counts via itertools over the canonical
    undirected edge set."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in es for n in e})
    cnt = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for n in (a, b, c):
                cnt[n] = cnt.get(n, 0) + 1
    return cnt


def test_triangle_count_k4(spark):
    # K4 has 4 triangles; every node sits in 3 of them. Edges fed with
    # duplicates, reversals, and a self-loop to exercise canonicalization.
    edges = [(a, b) for a in range(4) for b in range(4) if a != b] + [(2, 2), (0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["tri"] for r in triangle_count(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_random_vs_bruteforce(spark):
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        edges = [(rng.randrange(12), rng.randrange(12)) for _ in range(40)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["tri"] for r in triangle_count(df).collect()}
        assert got == _tri_reference(edges), f"seed {seed}"


def test_triangle_edge_support_assume_canonical_identical(spark):
    """The assume_canonical fast path (r13 optimization: the k-truss loop
    feeds edge sets that are their own previous canon output) must return
    exactly the default path's support map when the input IS canonical."""
    from diepy_spark.operators.clustering import triangle_edge_support

    for seed in (3, 11):
        rng = random.Random(seed)
        raw = {(rng.randrange(10), rng.randrange(10)) for _ in range(35)}
        canon = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
        df = spark.createDataFrame(canon, "src long, dst long")
        base = {
            (r["u"], r["v"]): r["sup"]
            for r in triangle_edge_support(df).collect()
        }
        fast = {
            (r["u"], r["v"]): r["sup"]
            for r in triangle_edge_support(df, assume_canonical=True).collect()
        }
        assert base == fast, f"seed {seed}"
        assert base, f"seed {seed}: fixture produced no triangles"


def test_triangle_count_triangle_free(spark):
    # even cycle = bipartite = triangle-free
    edges = [(i, (i + 1) % 8) for i in range(8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert triangle_count(df).count() == 0


# ---------------------------------------------------------------------------
# bloom filter semi-join
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_deterministic(spark):
    keys = spark.createDataFrame([(i * 3,) for i in range(200)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(600)], "k long")
    filt = bloom_build(keys, "k", m=4096, k=3)
    passed = {r["k"] for r in bloom_probe(probe, "k", filt, m=4096, k=3).collect()}
    members = {i * 3 for i in range(200)}
    assert members <= passed  # Bloom guarantee: zero false negatives
    # FP rate sanity: (1 - e^(-kn/m))^k ~ 0.007 at n=200,m=4096,k=3; allow 5x
    fp = len(passed - members) / 400
    assert fp < 0.05, fp
    # bit-deterministic under repartitioning
    filt2 = bloom_build(keys.repartition(7), "k", m=4096, k=3)
    passed2 = {
        r["k"] for r in bloom_probe(probe.repartition(5), "k", filt2, m=4096, k=3).collect()
    }
    assert passed == passed2


def test_bloom_m_must_divide_slice_space():
    with pytest.raises(ValueError):
        bloom_position_sql("k", "s", 0, 10000)  # not a divisor of 16^4


def test_bloom_probe_side_never_shuffles(spark):
    """The operator's reason to exist: the probe side is filtered by
    broadcast hash joins + a codegen'd projection only. Every shuffle
    Exchange in the plan belongs to the filter BUILD's word aggregation
    (one per hash-join branch — 512-row builds); the probe path carries
    none, and no BroadcastNestedLoopJoin appears (the interpreted-
    condition shape this operator regressed to once — ~10x slower)."""
    import io
    import re
    from contextlib import redirect_stdout

    keys = spark.createDataFrame([(i,) for i in range(50)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(500)], "k long")
    out = bloom_probe(probe, "k", bloom_build(keys, "k"), k=3)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 3, plan
    # all shuffle exchanges are build-side word aggregations: each is
    # preceded in the tree by a partial HashAggregate on the keys side
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_ex <= 3, plan
    # probe branch (the ':-' child of the first join) is scan + projection
    # only — no Exchange id may appear on a ':-' line
    assert not re.search(r":- Exchange", plan), plan


# ---------------------------------------------------------------------------
# declared-query consistency (constants shared with the oracles)
# ---------------------------------------------------------------------------

def test_cohort_retention_small(spark, sf_small):
    from diepy_spark.plans.relational import r45_cohort_retention

    rows = r45_cohort_retention(spark, sf_small).collect()
    assert rows, "retention frame empty"
    by_key = {(r["cohort_day"], r["day_offset"]): r for r in rows}
    # offset-0 cell exists per cohort and carries retention 1.0
    for (cd, off), r in by_key.items():
        assert off >= 0
        assert by_key[(cd, 0)]["retention_pct"] == 1.0
        assert r["active_users"] <= by_key[(cd, 0)]["active_users"] or off == 0


def test_market_basket_cap_excludes_megabasket(spark):
    """A basket above BASKET_MAX_ITEMS must contribute no pairs."""
    from diepy_spark.plans.relational import BASKET_MAX_ITEMS

    from pyspark.sql import Window

    rows = [(1, f"b{i}") for i in range(BASKET_MAX_ITEMS + 5)] + [
        (2, "x"),
        (2, "y"),
    ]
    ob = spark.createDataFrame(rows, "ok long, brand string")
    sized = ob.withColumn("bs", F.count(F.lit(1)).over(Window.partitionBy("ok")))
    kept = sized.where(F.col("bs") <= BASKET_MAX_ITEMS)
    assert {r["ok"] for r in kept.select("ok").distinct().collect()} == {2}


def test_dq_profile_counts(spark, sf_small):
    from diepy_spark.plans.extended import x12_dq_profile

    rows = {r["col_name"]: r for r in x12_dq_profile(spark, sf_small).collect()}
    n = rows["o_orderkey"]["n_rows"]
    assert rows["o_orderkey"]["n_distinct"] == n  # primary key
    assert rows["o_orderkey"]["n_null"] == 0
    assert rows["o_orderstatus"]["n_distinct"] <= 3
    # rendered min/max are strings and ordered
    assert rows["o_totalprice"]["min_s"] <= rows["o_totalprice"]["max_s"] or float(
        rows["o_totalprice"]["min_s"]
    ) <= float(rows["o_totalprice"]["max_s"])


def test_fuzzy_join_levenshtein_blocked(spark):
    from diepy_spark.plans.extended import FUZZY_MAX_DIST

    # same suffix block ('ing'), within distance; different block excluded
    df = spark.createDataFrame(
        [("small ring",), ("smal ring",), ("small ring",), ("blue bolt",)],
        "p_name string",
    )
    names = df.groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    blocked = names.withColumn("blk", F.substring("name", -3, 3))
    a = blocked.select("blk", F.col("name").alias("na"))
    b = blocked.select("blk", F.col("name").alias("nb"))
    pairs = (
        a.join(b, "blk")
        .where(F.col("na") < F.col("nb"))
        .withColumn("dist", F.levenshtein("na", "nb"))
        .where(F.col("dist") <= FUZZY_MAX_DIST)
        .collect()
    )
    assert [(r["na"], r["nb"], r["dist"]) for r in pairs] == [
        ("smal ring", "small ring", 1)
    ]


# ---------------------------------------------------------------------------
# funnel / CMS / incremental aggregation
# ---------------------------------------------------------------------------

def test_funnel_strict_event_order(spark):
    """A purchase BEFORE the first qualifying click must not convert."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # user 1 completes the funnel in order
        (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        # user 2: purchase precedes click -> stops at click
        (2, "view", t(1)), (2, "purchase", t(2)), (2, "click", t(4)),
        # user 3: click precedes view -> stops at view
        (3, "click", t(1)), (3, "view", t(2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")

    from pyspark.sql import functions as F

    stage = None
    counts = {}
    for name in ["view", "click", "purchase"]:
        cur = df.where(F.col("event_type") == name)
        if stage is not None:
            cur = cur.join(stage, "user_id").where(F.col("ts") > F.col("since"))
        stage = cur.groupBy("user_id").agg(F.min("ts").alias("since"))
        counts[name] = stage.count()
    assert counts == {"view": 3, "click": 2, "purchase": 1}


def test_cms_never_underestimates_and_exact_when_wide(spark):
    from diepy_spark.operators.sketch import cms_cells, cms_estimate

    rows = [(k,) for k in [1] * 50 + [2] * 30 + [3] * 20 + list(range(10, 40))]
    df = spark.createDataFrame(rows, "k long")
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    cells = cms_cells(df, "k", d=3, w=4096)
    est = cms_estimate(exact, cells, "k", d=3, w=4096).collect()
    for r in est:
        assert r["cms_est"] >= r["n"], r
    # 33 distinct keys in 3x4096 cells: heavy keys essentially collision-free
    by_k = {r["k"]: r["cms_est"] for r in est}
    assert by_k[1] == 50 and by_k[2] == 30


def test_cms_cells_mergeable(spark):
    """CMS's reason to exist at scale: sketches of shards ADD cell-wise to
    the sketch of the union."""
    a = spark.createDataFrame([(i % 7,) for i in range(40)], "k long")
    b = spark.createDataFrame([(i % 5,) for i in range(25)], "k long")
    from diepy_spark.operators.sketch import cms_cells

    def cell_map(df):
        return {(r["r"], r["c"]): r["cnt"] for r in cms_cells(df, "k", d=2, w=256).collect()}

    ca, cb, cu = cell_map(a), cell_map(b), cell_map(a.unionAll(b))
    merged = {k: ca.get(k, 0) + cb.get(k, 0) for k in set(ca) | set(cb)}
    assert merged == cu


def test_incremental_agg_split_invariant(spark, sf_small):
    """The merged partial states must equal the full recompute for ANY
    split point — run the declared plan against a one-shot groupBy."""
    from diepy_spark.plans.extended import x9_incremental_agg
    from diepy_spark.sources.registry import load_table

    inc = {tuple(r) for r in x9_incremental_agg(spark, sf_small).collect()}
    o = load_table(spark, sf_small, "orders")
    full = {
        tuple(r)
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_price"),
            F.min("o_orderdate").alias("min_date"),
            F.max("o_orderdate").alias("max_date"),
        )
        .collect()
    }
    assert inc == full


# ---------------------------------------------------------------------------
# kNN classify / SCD2 / skew diag / transitions
# ---------------------------------------------------------------------------

def test_knn_majority_vote_tiebreak(spark):
    """Vote counting + smaller-label tiebreak, independent of the ANN
    machinery: replicate the vote/argmax stage on a fixed neighbor set."""
    from pyspark.sql import Window

    nn = spark.createDataFrame(
        # qid 1: labels 2,2,3 -> 2 wins; qid 2: 5,7 tie at 1+... -> 5,5,7,7 tie -> 5
        [(1, 2), (1, 2), (1, 3), (2, 5), (2, 5), (2, 7), (2, 7)],
        "qid long, nlabel int",
    )
    votes = nn.groupBy("qid", "nlabel").agg(F.count(F.lit(1)).alias("votes"))
    w = Window.partitionBy("qid").orderBy(F.col("votes").desc(), F.col("nlabel"))
    pred = {
        r["qid"]: r["nlabel"]
        for r in votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    }
    assert pred == {1: 2, 2: 5}


def test_scd2_compresses_runs_and_closes_intervals(spark):
    import datetime as dt

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    rows = [
        (1, "LOW", t(1), 10), (1, "LOW", t(2), 11), (1, "HIGH", t(3), 12),
        (1, "LOW", t(5), 13),
        (2, "MED", t(1), 20),
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderpriority string, o_orderdate timestamp, o_orderkey long"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changed = df.withColumn("prev", F.lag("o_orderpriority").over(w)).where(
        F.col("prev").isNull() | (F.col("prev") != F.col("o_orderpriority"))
    )
    out = changed.withColumn("valid_to", F.lead("o_orderdate").over(w)).select(
        "o_custkey", "o_orderpriority", "o_orderdate", "valid_to"
    )
    got = sorted(map(tuple, out.collect()))
    # run LOW,LOW collapses; re-appearance of LOW on day 5 is a NEW version
    assert got == [
        (1, "LOW", t(1), t(3)),
        (1, "LOW", t(5), None),
        (1, "HIGH", t(3), t(5)),
        (2, "MED", t(1), None),
    ] or got == sorted(
        [(1, "LOW", t(1), t(3)), (1, "HIGH", t(3), t(5)), (1, "LOW", t(5), None),
         (2, "MED", t(1), None)]
    )


def test_transitions_rows_sum_to_one(spark, sf_small):
    from diepy_spark.plans.relational import r48_transitions

    rows = r48_transitions(spark, sf_small).collect()
    assert rows
    from collections import defaultdict

    by_from = defaultdict(float)
    for r in rows:
        assert 0 < r["p"] <= 1
        by_from[r["from_type"]] += r["p"]
    for k, s in by_from.items():
        assert abs(s - 1.0) < 0.01, (k, s)  # rounding slack


def test_skew_diag_share_and_factor(spark, sf_small):
    from diepy_spark.plans.extended import x12_skew_diag

    rows = x12_skew_diag(spark, sf_small).collect()
    assert len(rows) == 10
    assert all(r["skew_factor"] >= 1.0 for r in rows[:1])  # top key is above mean
    assert rows == sorted(rows, key=lambda r: (-r["cnt"], r["l_partkey"]))


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------

def _cdc_reference(text, k=4, div=8):
    """Literal python re-implementation of cdc_chunks for one document."""
    import hashlib
    import re as _re

    toks = [t for t in _re.split(r"[^a-z0-9]+", text.lower()) if t]
    chunks, cur = [], []
    for i, t in enumerate(toks, 1):
        cur.append((i, t))
        if i >= k:
            # gram ending at i uses the ORIGINAL token stream, not cur
            gram = " ".join(toks[i - k:i])
            h = int(hashlib.md5(gram.encode()).hexdigest()[:4], 16)
            if h % div == 0:
                chunks.append(cur)
                cur = []
    if cur:
        chunks.append(cur)
    out = []
    for idx, ch in enumerate(chunks):
        body = " ".join(t for _, t in ch)
        out.append(
            (idx, ch[0][0], len(ch), hashlib.md5(body.encode()).hexdigest())
        )
    return out


def test_cdc_chunks_random_vs_bruteforce(spark):
    from diepy_spark.operators.dedup import cdc_chunks

    rng = random.Random(5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    docs = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 80))))
        for d in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["tok_start"], r["n_tokens"], r["chunk_hash"])
        for r in cdc_chunks(df).collect()
    }
    for d, text in docs:
        for idx, start, n, h in _cdc_reference(text):
            assert got[(d, idx)] == (start, n, h), (d, idx)
    assert len(got) == sum(len(_cdc_reference(t)) for _, t in docs)


def test_cdc_chunks_edit_locality(spark):
    """The operator's reason to exist: one inserted token must leave every
    chunk outside its neighborhood intact (fixed-size chunking shifts ALL
    later chunks)."""
    from diepy_spark.operators.dedup import cdc_chunks

    rng = random.Random(9)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    toks = [rng.choice(vocab) for _ in range(400)]
    edited = toks[:200] + ["INSERTED"] + toks[200:]
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, " ".join(edited))], "doc_id long, text string"
    )
    rows = cdc_chunks(df).collect()
    h1 = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["doc_id"] == 2}
    # all but the edited chunk (and possibly its immediate successor merge)
    # are shared
    assert len(h1 - h2) <= 2, (len(h1), len(h1 - h2))
    assert len(h1 & h2) >= len(h1) - 2


def test_cms_join_size_upper_bound(spark):
    """CMS join-size estimate never underestimates the true join size."""
    from diepy_spark.operators.sketch import cms_cells

    a = spark.createDataFrame([(i % 9,) for i in range(60)], "k long")
    b = spark.createDataFrame([(i % 6,) for i in range(30)], "k long")
    ca = cms_cells(a, "k", d=2, w=256).selectExpr("r", "c", "cnt AS cnt_a")
    cb = cms_cells(b, "k", d=2, w=256).selectExpr("r", "c", "cnt AS cnt_b")
    est = (
        ca.join(cb, ["r", "c"])
        .groupBy("r")
        .agg(F.sum(F.expr("cnt_a * cnt_b")).alias("dot"))
        .agg(F.min("dot"))
        .collect()[0][0]
    )
    exact = a.join(b, "k").count()
    assert est >= exact


def test_drift_tvd_zero_when_identical(spark):
    """Identical mixes on both sides -> share deltas and TVD all zero."""
    from pyspark.sql import Window

    j = spark.createDataFrame(
        [("A", 10, 20), ("B", 30, 60)], "s string, n_base long, n_new long"
    )
    w = Window.partitionBy()
    t = j.select(
        "*",
        F.sum("n_base").over(w).alias("tb"),
        F.sum("n_new").over(w).alias("tn"),
    ).withColumn(
        "num", F.abs(F.col("n_new") * F.col("tb") - F.col("n_base") * F.col("tn"))
    )
    out = t.select(
        F.round(F.sum("num").over(w) / (F.lit(2.0) * F.col("tb") * F.col("tn")), 6).alias("tvd")
    ).collect()
    assert all(r["tvd"] == 0.0 for r in out)


def test_partitioned_roundtrip_prunes(spark, sf_small):
    """The t3 scan must prune non-selected status partitions at the
    directory level: PartitionFilters carries the o_orderstatus predicate
    and the row filter does NOT reappear as a data filter."""
    import io
    import re
    from contextlib import redirect_stdout

    from diepy_spark.plans.pipeline import t3_roundtrip_parquet

    df = t3_roundtrip_parquet(spark, sf_small)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderstatus" in m.group(1), plan
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed is None or "o_orderstatus" not in pushed.group(1), plan


def test_stream_upsert_replay_granularity_invariant(spark, sf_small, monkeypatch):
    """The foreachBatch upsert's final state must not depend on how many
    micro-batches the replay used (4-batch test profile vs 2-batch bench
    profile) — later ts-range batches strictly supersede either way."""
    import os as _os

    from diepy_spark.plans.pipeline import x7_stream_upsert

    monkeypatch.delenv("SPARK_GRAFT_STREAM_MFPT", raising=False)
    a = sorted(map(tuple, x7_stream_upsert(spark, sf_small).collect()))
    monkeypatch.setenv("SPARK_GRAFT_STREAM_MFPT", "2")
    b = sorted(map(tuple, x7_stream_upsert(spark, sf_small).collect()))
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# gaps / bootstrap
# ---------------------------------------------------------------------------

def test_gaps_random_vs_bruteforce(spark):
    """Boundary-anti-join islands/gaps == the sorted-scan reference."""
    from pyspark.sql import Window

    for seed in (3, 14):
        rng = random.Random(seed)
        ks = sorted(rng.sample(range(200), 80))
        keys = spark.createDataFrame([(k,) for k in ks], "key long")
        mx = keys.agg(F.max("key").alias("mx"))
        succ = keys.select((F.col("key") + 1).alias("key"))
        gap_starts = (
            succ.join(keys, "key", "left_anti")
            .crossJoin(F.broadcast(mx))
            .where(F.col("key") <= F.col("mx"))
            .select(F.col("key").alias("pos"), F.lit("g").alias("tag"))
        )
        island_starts = keys.join(succ, "key", "left_anti").select(
            F.col("key").alias("pos"), F.lit("i").alias("tag")
        )
        w = Window.orderBy("pos").rowsBetween(1, Window.unboundedFollowing)
        got = sorted(
            (r["pos"], r["next_island"] - 1)
            for r in gap_starts.unionByName(island_starts)
            .withColumn(
                "next_island",
                F.min(F.when(F.col("tag") == "i", F.col("pos"))).over(w),
            )
            .where(F.col("tag") == "g")
            .collect()
        )
        ref = sorted(
            (a + 1, b - 1) for a, b in zip(ks, ks[1:]) if b - a > 1
        )
        assert got == ref, seed


def test_poisson_bootstrap_deterministic_and_unit_mean(spark):
    from diepy_spark.operators.sampling import poisson_bootstrap_means

    df = spark.createDataFrame(
        [("g", i, (i % 50) * 100) for i in range(500)], "grp string, id long, cents long"
    )
    a = sorted(
        map(tuple, poisson_bootstrap_means(df, "grp", "cents", "id", b=10).collect())
    )
    b = sorted(
        map(
            tuple,
            poisson_bootstrap_means(
                df.repartition(7), "grp", "cents", "id", b=10
            ).collect(),
        )
    )
    assert a == b and len(a) == 10
    # replicate means hover around the true mean; Poisson(1) weights keep
    # each replicate's effective n near 500
    true_mean = sum((i % 50) for i in range(500)) / 500
    means = [m for (_, _, m) in a]
    assert all(abs(m - true_mean) < true_mean * 0.2 for m in means), means


def test_kmeans_int_vs_python_reference(spark):
    """Literal python Lloyd's with the same quantization, floor-mean
    update, and smaller-cluster tie-break, on seeded random vectors."""
    import math

    from diepy_spark.operators.clustering import kmeans_int

    rng = random.Random(21)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in kmeans_int(df, k=3, iterations=2, scale=1000).collect()
    }

    xs = {i: [int(round(v * 1000)) for v in vec] for i, vec in vecs}
    cents = [xs[i][:] for i in range(3)]  # seeds: smallest ids

    def assign(cs):
        out = {}
        for i, x in xs.items():
            ds = [sum((a - b) ** 2 for a, b in zip(x, c)) for c in cs]
            best = min(ds)
            j = ds.index(best)  # first == smallest cluster id on ties
            out[i] = (j, best)
        return out

    for _ in range(2):
        a = assign(cents)
        for j in range(3):
            members = [xs[i] for i, (c, _) in a.items() if c == j]
            if members:
                cents[j] = [
                    int(math.floor(sum(col) / len(members)))
                    for col in zip(*members)
                ]
    assert got == assign(cents)


def test_weighted_topk_sample_properties(spark):
    """A-ES: fixed size per group, partition-independent, and
    weight-sensitive (heavy rows oversampled across seeds)."""
    from diepy_spark.operators.sampling import weighted_topk_sample

    rows = [(g, i, 1000 if i % 10 == 0 else 1) for g in ("a", "b") for i in range(100)]
    df = spark.createDataFrame(rows, "grp string, id long, w long")
    got = weighted_topk_sample(df, "grp", "id", "w", k=5).collect()
    assert {r["grp"] for r in got} == {"a", "b"}
    assert all(
        sorted(r["rk"] for r in got if r["grp"] == g) == [1, 2, 3, 4, 5]
        for g in ("a", "b")
    )
    again = weighted_topk_sample(df.repartition(9), "grp", "id", "w", k=5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # weight sensitivity: the 1000x rows (10% of ids) dominate the sample
    heavy = sum(1 for r in got if r["id"] % 10 == 0)
    assert heavy >= 8, heavy

    # zero/negative weights are excluded entirely
    dfz = spark.createDataFrame([("a", 1, 0), ("a", 2, -3), ("a", 3, 7)],
                                "grp string, id long, w long")
    kept = weighted_topk_sample(dfz, "grp", "id", "w", k=5).collect()
    assert [r["id"] for r in kept] == [3]


def test_containment_catches_inclusion_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: containment == 1.0
    while jaccard stays below any useful threshold."""
    from diepy_spark.operators.dedup import ngram_jaccard_pairs

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} w{i+1}" for i in range(0, 120, 2))
    long_doc = filler + " " + short + " " + filler[::-1].replace("w", "v")
    df = spark.createDataFrame(
        [(1, short), (2, long_doc)], "doc_id long, text string"
    )
    cont = ngram_jaccard_pairs(df, threshold=0.9, metric="containment").collect()
    assert [(r["da"], r["db"]) for r in cont] == [(1, 2)]
    assert cont[0]["cont"] == 1.0
    jac = ngram_jaccard_pairs(df, threshold=0.2, metric="jaccard").collect()
    assert jac == []  # inclusion is invisible to jaccard at any sane bar


def test_rolling_dau_window_semantics(spark):
    """WAU(day) counts users active in the trailing 7 days exactly."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1)),
        (2, dt.datetime(2024, 1, 3)),
        (1, dt.datetime(2024, 1, 10)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    ev = df.select(
        "user_id", F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("d")
    ).distinct()
    bounds = ev.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    ex = ev.crossJoin(F.broadcast(bounds)).select(
        "user_id", "lo",
        F.explode(F.expr("sequence(d, least(d + 6, hi))")).alias("day"),
    )
    got = {
        r["day_idx"]: r["wau"]
        for r in ex.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
        .crossJoin(F.broadcast(bounds))
        .select((F.col("day") - F.col("lo")).alias("day_idx"), "wau")
        .collect()
    }
    # day 0: {1}; days 2-6: {1,2}; day 7: u1's window expired -> {2};
    # day 8: {2}; day 9: {1} (re-activity)
    assert got[0] == 1 and got[2] == 2 and got[6] == 2
    assert got[7] == 1 and got[8] == 1 and got[9] == 1


def test_kmv_overlap_exact_below_capacity_and_sane_above(spark):
    from diepy_spark.operators.sketch import kmv_set_overlap

    # below capacity: estimates are exact by construction
    small = spark.createDataFrame(
        [("a", f"v{i}") for i in range(30)] + [("b", f"v{i}") for i in range(15, 45)],
        "g string, v string",
    )
    r = kmv_set_overlap(small, "g", "v", k=64).collect()[0]
    assert (r["exact_union"], r["exact_overlap"]) == (45, 15)
    assert (r["est_union"], r["est_overlap"]) == (45.0, 15.0)

    # above capacity: estimates within a loose band of the truth
    big = spark.createDataFrame(
        [("a", f"v{i}") for i in range(1000)]
        + [("b", f"v{i}") for i in range(500, 1500)],
        "g string, v string",
    )
    r = kmv_set_overlap(big, "g", "v", k=128).collect()[0]
    assert (r["exact_union"], r["exact_overlap"]) == (1500, 500)
    assert abs(r["est_union"] - 1500) / 1500 < 0.35, r
    assert abs(r["est_overlap"] - 500) / 500 < 0.6, r


def test_equidepth_bins_monotone_and_balanced(spark, sf_small):
    from diepy_spark.plans.relational import r50_equidepth_binning

    rows = r50_equidepth_binning(spark, sf_small).collect()
    assert [r["bin"] for r in rows] == list(range(1, len(rows) + 1))
    # ranges are disjoint and ordered
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]
    # equi-depth within histogram-resolution slack: no bin is wildly off
    n = sum(r["cnt"] for r in rows)
    for r in rows:
        assert r["cnt"] < n * 0.35, (r["bin"], r["cnt"], n)


def test_ivf_topk_trained_vs_python_reference(spark):
    """Trained IVF = kmeans centroids + integer-L2 cell search. The
    reference trains the same quantized Lloyd's in python, assigns corpus
    rows to their argmin cell, probes each query's 2 nearest cells, and
    brute-forces top-k inside the probed cells only."""
    import math

    from diepy_spark.operators.clustering import kmeans_centroids_int
    from diepy_spark.operators.similarity import ivf_topk_trained

    rng = random.Random(33)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    nq, k, nprobe = 4, 3, 2
    cents = kmeans_centroids_int(df, k=3, iterations=2, scale=1000)
    got = sorted(
        map(
            tuple,
            ivf_topk_trained(
                df.where(F.col("vec_id") < nq),
                df.where(F.col("vec_id") >= nq),
                cents,
                k=k,
                nprobe=nprobe,
                scale=1000,
            ).collect(),
        )
    )

    # python mirror of the whole pipeline
    xs = {i: [int(round(v * 1000)) for v in vec] for i, vec in vecs}
    pc = [xs[i][:] for i in range(3)]
    def d2(a, b):
        return sum((p - q) ** 2 for p, q in zip(a, b))
    for _ in range(2):
        a = {i: min(range(3), key=lambda j: (d2(x, pc[j]), j)) for i, x in xs.items()}
        for j in range(3):
            members = [xs[i] for i, c in a.items() if c == j]
            if members:
                pc[j] = [int(math.floor(sum(col) / len(members))) for col in zip(*members)]
    assert pc == cents

    cell = {i: min(range(3), key=lambda j: (d2(xs[i], pc[j]), j)) for i in xs if i >= nq}
    ref = []
    for qi in range(nq):
        probes = sorted(range(3), key=lambda j: (d2(xs[qi], pc[j]), j))[:nprobe]
        cand = sorted(
            (d2(xs[qi], xs[ci]), ci) for ci in cell if cell[ci] in probes
        )
        ref += [(qi, ci, d, rk + 1) for rk, (d, ci) in enumerate(cand[:k])]
    assert got == sorted(ref)


def test_orc_roundtrip_pushes_filter(spark, sf_small):
    """The t4 ORC scan must push the o_totalprice range predicate into the
    reader (PushedFilters), where ORC stride min/max stats skip row groups
    in the totalprice-sorted layout."""
    import io
    import re
    from contextlib import redirect_stdout

    from diepy_spark.plans.pipeline import t4_roundtrip_orc

    df = t4_roundtrip_orc(spark, sf_small)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "o_totalprice" in pushed.group(1), plan


def test_robust_outliers_vs_python_reference(spark):
    """freq_median is the LOWER median (position ceil(n/2), no
    interpolation); MAD and outlier counts follow from it. Includes a
    group whose outlier would wreck a mean/stddev rule."""
    from diepy_spark.operators.robust import freq_median, robust_outliers

    rows = [("a", v) for v in [1, 2, 3, 4, 100]] + [
        ("b", v) for v in [10, 10, 11, 12]
    ]
    df = spark.createDataFrame(rows, "g string, v long")

    med = {r["g"]: r["med"] for r in freq_median(df, "g", "v").collect()}
    assert med == {"a": 3, "b": 10}  # lower median for even n

    got = {r["g"]: r.asDict() for r in robust_outliers(df, "g", "v", k=5).collect()}
    # group a: med=3, devs=[2,1,0,1,97], mad=1 -> 100 is the only outlier
    assert got["a"]["mad"] == 1 and got["a"]["n_out"] == 1
    assert got["a"]["max_dev"] == 97
    # group b: med=10, devs=[0,0,1,2], lower median -> MAD=0; the
    # documented degeneracy: with MAD=0 every nonzero deviation flags
    assert got["b"]["mad"] == 0 and got["b"]["n_out"] == 2

    again = {
        r["g"]: r.asDict()
        for r in robust_outliers(df.repartition(7), "g", "v", k=5).collect()
    }
    assert got == again


def test_gopher_rules_each_rule_bites(spark):
    """One crafted doc per rule violation + one clean doc; integer rule
    flags match hand computation."""
    from diepy_spark.operators.text import gopher_rules

    clean = "the cat and dog walked into the house with food today extra words"
    docs = [
        (1, clean),  # passes all
        (2, "the of short doc"),  # < 10 words -> r_wordcount = 0
        (3, "the of " + " ".join(["a"] * 20)),  # mean len < 3, many short
        (4, " ".join(f"word{i}" for i in range(20))),  # no stopwords
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    assert got[1]["keep"] == 1, got[1]
    assert got[2]["r_wordcount"] == 0 and got[2]["keep"] == 0
    assert got[3]["r_meanlen"] == 0 and got[3]["r_shorttok"] == 0
    assert got[4]["r_stopwords"] == 0 and got[4]["r_wordcount"] == 1


def _lpa_reference(edges, iterations):
    """Literal synchronous LPA with self-vote and (count desc, label asc)
    tie-break on a symmetrized edge set."""
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    labels = {n: n for n in adj}
    for _ in range(iterations):
        new = {}
        for n in adj:
            votes = {}
            for m in adj[n]:
                votes[labels[m]] = votes.get(labels[m], 0) + 1
            votes[labels[n]] = votes.get(labels[n], 0) + 1
            new[n] = min(votes, key=lambda l: (-votes[l], l))
        labels = new
    return labels


def test_label_propagation_two_cliques(spark):
    """Two 5-cliques joined by one bridge: LPA keeps them as two
    communities anchored at each clique's min id, where connected
    components would merge them."""
    from diepy_spark.operators.clustering import label_propagation

    k5a = [(a, b) for a in range(5) for b in range(5) if a < b]
    k5b = [(a + 10, b + 10) for a, b in k5a]
    edges = k5a + k5b + [(4, 10)]
    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(sym, "src long, dst long")
    got = {r["node"]: r["label"] for r in label_propagation(df, iterations=3).collect()}
    assert {got[n] for n in range(5)} == {0}
    assert {got[n + 10] for n in range(5)} == {10}


def test_label_propagation_random_vs_reference(spark):
    from diepy_spark.operators.clustering import label_propagation

    for seed in (3, 19):
        rng = random.Random(seed)
        edges = [(rng.randrange(15), rng.randrange(15)) for _ in range(40)]
        sym = [(a, b) for a, b in edges if a != b]
        sym = sym + [(b, a) for a, b in sym]
        if not sym:
            continue
        df = spark.createDataFrame(sym, "src long, dst long")
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, iterations=3).collect()
        }
        assert got == _lpa_reference(edges, 3), f"seed {seed}"


def test_label_propagation_assume_symmetric_identical(spark):
    """assume_symmetric=True (r13: the per-round vote join keys on src
    instead of dst so the partitioned edge layout is read instead of
    re-shuffled) must be label-for-label identical to the default path
    on a symmetric edge set — the vote multiset argument in the
    docstring, pinned over random graphs."""
    from diepy_spark.operators.clustering import label_propagation

    for seed in (7, 23):
        rng = random.Random(seed)
        edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(60)]
        sym = [(a, b) for a, b in edges if a != b]
        sym = list(set(sym + [(b, a) for a, b in sym]))
        df = spark.createDataFrame(sym, "src long, dst long")
        base = {
            r["node"]: r["label"]
            for r in label_propagation(df, iterations=3).collect()
        }
        flip = {
            r["node"]: r["label"]
            for r in label_propagation(
                df, iterations=3, assume_distinct=True, assume_symmetric=True
            ).collect()
        }
        assert flip == base, f"seed {seed}"


def test_pq_adc_vs_python_reference(spark):
    """PQ encode + ADC distances mirror a literal python implementation:
    codebooks from the first-8 subvectors, corpus codes by argmin, ADC =
    sum of per-subspace LUT entries."""
    from diepy_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    rng = random.Random(44)
    dim, m, ncodes, nq, k = 12, 3, 4, 3, 2
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    books = pq_codebooks(df, m=m, ncodes=ncodes, scale=1000)

    xs = {i: [int(round(v * 1000)) for v in vec] for i, vec in vecs}
    sub = dim // m
    ref_books = [
        [xs[j][s * sub : (s + 1) * sub] for j in range(ncodes)] for s in range(m)
    ]
    assert books == ref_books

    def d2(a, b):
        return sum((p - q) ** 2 for p, q in zip(a, b))

    def encode(x):
        return [
            min(range(ncodes), key=lambda j: (d2(x[s * sub:(s + 1) * sub], ref_books[s][j]), j))
            for s in range(m)
        ]

    got_codes = {
        r["vec_id"]: [r[f"code_{s}"] for s in range(m)]
        for r in pq_encode(df, books, scale=1000).collect()
    }
    assert got_codes == {i: encode(x) for i, x in xs.items()}

    got = sorted(
        map(
            tuple,
            pq_adc_topk(
                df.where(F.col("vec_id") < nq),
                df.where(F.col("vec_id") >= nq),
                books,
                k=k,
                scale=1000,
            ).collect(),
        )
    )
    ref = []
    for qi in range(nq):
        cand = []
        for ci in range(nq, 40):
            codes = encode(xs[ci])
            adc = sum(
                d2(xs[qi][s * sub:(s + 1) * sub], ref_books[s][codes[s]])
                for s in range(m)
            )
            cand.append((adc, ci))
        cand.sort()
        ref += [(qi, ci, d, rk + 1) for rk, (d, ci) in enumerate(cand[:k])]
    assert got == sorted(ref)


def test_temperature_mix_properties(spark):
    """alpha=0 flattens toward uniform budget, alpha=1 keeps the natural
    mix; draws are partition-independent; rates cap at 1."""
    from diepy_spark.operators.sampling import temperature_mix

    rows = [(f"d{i}", "big" if i % 10 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    # alpha=1: rate == budget_frac for every group (n^1 / sum n cancels)
    a1 = temperature_mix(df, "source", 0.3, alpha=1.0)
    rates = {r["source"]: r["rate"] for r in a1.select("source", "rate").distinct().collect()}
    assert all(abs(v - 0.3) < 1e-12 for v in rates.values()), rates
    # alpha=0: equal target count per group -> the small group's rate caps at 1
    a0 = temperature_mix(df, "source", 0.3, alpha=0.0)
    r0 = {r["source"]: r["rate"] for r in a0.select("source", "rate").distinct().collect()}
    assert r0["small"] == 1.0 and r0["big"] < 0.3, r0
    # determinism under repartitioning
    k1 = sorted(r["doc_id"] for r in a0.select("doc_id").collect())
    k2 = sorted(
        r["doc_id"]
        for r in temperature_mix(df.repartition(13), "source", 0.3, alpha=0.0)
        .select("doc_id")
        .collect()
    )
    assert k1 == k2


def test_dedup_corpus_best_keeps_longest(spark):
    from diepy_spark.operators.clustering import dedup_corpus_best

    docs = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (4, 7), (9, 99)],
        "doc_id long, n_chars long",
    )
    # {1,2,3} one cluster (longest tie 2 vs 3 -> min id 2); 4 unique; 9 unique
    edges = spark.createDataFrame([(1, 2), (2, 3)], "da long, db long")
    got = sorted(
        (r["doc_id"], r["cluster"])
        for r in dedup_corpus_best(docs, edges, "n_chars").collect()
    )
    assert got == [(2, 1), (4, None), (9, None)]


def test_incremental_exact_dedup_flags(spark):
    from diepy_spark.operators.dedup import incremental_exact_dedup

    index = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, "aaa"), (11, "new"), (12, "new"), (13, "ccc")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["dup_of_index"], r["dup_in_batch"])
        for r in incremental_exact_dedup(index, batch).collect()
    }
    assert got == {
        10: (1, 0),  # duplicates the index
        11: (0, 0),  # first copy within the batch
        12: (0, 1),  # duplicates an earlier batch row
        13: (0, 0),
    }


def test_kcore_peels_to_fixpoint(spark):
    """A 4-clique with pendant nodes: k=3 peels the pendants in round 1
    and the clique survives with its internal degrees."""
    from diepy_spark.operators.clustering import kcore

    clique = [(a, b) for a in range(4) for b in range(4) if a != b]
    pendants = [(0, 10), (10, 0), (1, 11), (11, 1)]
    df = spark.createDataFrame(clique + pendants, "src long, dst long")
    got = {r["node"]: r["deg"] for r in kcore(df, k=3, iterations=2).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # DataFrame threshold variant agrees with the int form
    kf = spark.createDataFrame([(3,)], "k long")
    got2 = {r["node"]: r["deg"] for r in kcore(df, k=kf, iterations=2).collect()}
    assert got2 == got
