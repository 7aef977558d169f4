"""Round-5 operator units: top-2 centroid assignment, multi-probe
SemDeDup pairs, IVF+PQ composition, incremental MinHash, the vectorized
EWMA fold, and the sorted-run span-dedup equivalence."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _brute_top2(xi, cents):
    ds = [
        (sum((a - b) * (a - b) for a, b in zip(xi, c)), j)
        for j, c in enumerate(cents)
    ]
    ds.sort()
    return ds[0][1], ds[1][1]


def test_assign_top2_matches_brute_force(spark):
    from diepy_spark.operators.clustering import (
        assign_top2_to_centroids,
        quantize_vectors,
    )

    rows = [
        (1, [0.0, 0.0]),
        (2, [1.0, 1.0]),
        (3, [0.4, 0.6]),
        (4, [0.5, 0.5]),  # equidistant to cents 0/1 on some grids — tie path
        (5, [2.0, -1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[0, 0], [1000, 1000], [2000, -1000]]
    q = quantize_vectors(df, scale=1000)
    got = {
        r.vec_id: (r.cluster, r.cluster2)
        for r in assign_top2_to_centroids(q, cents).collect()
    }
    for vid, emb in rows:
        xi = [round(v * 1000) for v in emb]
        assert got[vid] == _brute_top2(xi, cents), vid


def test_semdedup_dup_pairs_all_is_exhaustive(spark):
    """probes='all' must equal the brute-force integer-cosine pair set,
    and probes=1 / probes=2 must be monotone subsets of it."""
    from diepy_spark.operators.clustering import kmeans_centroids_int
    from diepy_spark.operators.similarity import semdedup_dup_pairs

    import random

    rnd = random.Random(11)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(4)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_centroids_int(df, k=4, iterations=2, scale=1000)

    def pairs(p):
        return {
            (r.da, r.db)
            for r in semdedup_dup_pairs(
                df, cents, probes=p, thr_num=2, thr_den=5, scale=1000
            ).collect()
        }

    exact = pairs("all")
    # brute force in python on the quantized grid
    qs = {i: [round(v * 1000) for v in emb] for i, emb in rows}
    brute = set()
    for a in range(40):
        for b in range(a + 1, 40):
            xa, xb = qs[a], qs[b]
            dot = sum(p * q for p, q in zip(xa, xb))
            na = sum(v * v for v in xa)
            nb = sum(v * v for v in xb)
            if dot > 0 and 25 * dot * dot > 4 * na * nb:
                brute.add((a, b))
    assert exact == brute
    p1, p2 = pairs(1), pairs(2)
    assert p1 <= p2 <= exact


def test_ivfpq_matches_python_reference(spark):
    """nprobe=len(cents) IVFPQ must equal a python ADC reference over all
    candidates (every pair probed)."""
    from diepy_spark.operators.clustering import kmeans_centroids_int
    from diepy_spark.operators.similarity import ivfpq_topk, pq_codebooks

    import random

    rnd = random.Random(3)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where(F.col("vec_id") < 3)
    corpus = df.where(F.col("vec_id") >= 3)
    cents = kmeans_centroids_int(df, k=3, iterations=2, scale=1000)
    books = pq_codebooks(df, m=2, ncodes=4, scale=1000)
    got = {
        (r.qid, r.rk): (r.cid, r.dist)
        for r in ivfpq_topk(
            queries, corpus, cents, books, k=2, nprobe=len(cents), scale=1000
        ).collect()
    }

    qz = {i: [round(v * 1000) for v in emb] for i, emb in rows}
    m, sub = 2, 4

    def codes(xi):
        out = []
        for s in range(m):
            seg = xi[s * sub : (s + 1) * sub]
            ds = [
                (sum((a - b) * (a - b) for a, b in zip(seg, c)), j)
                for j, c in enumerate(books[s])
            ]
            out.append(min(ds)[1])
        return out

    for qid in range(3):
        xq = qz[qid]
        scored = []
        for cid in range(3, 30):
            cc = codes(qz[cid])
            d = 0
            for s in range(m):
                seg = xq[s * sub : (s + 1) * sub]
                cb = books[s][cc[s]]
                d += sum((a - b) * (a - b) for a, b in zip(seg, cb))
            scored.append((d, cid))
        scored.sort()
        for rk in (1, 2):
            d, cid = scored[rk - 1]
            assert got[(qid, rk)] == (cid, d), (qid, rk)


def test_incremental_minhash_flags_near_dups(spark):
    from diepy_spark.operators.dedup import incremental_minhash_dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    index = spark.createDataFrame(
        [(1, base), (2, "completely different content about spark engines")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, base + " tail"),  # near-dup of index doc 1
            (11, "nothing shared with anything here at all zebra"),
            (12, base + " tail"),  # exact dup of earlier batch doc 10
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.dup_of_index, r.dup_in_batch)
        for r in incremental_minhash_dedup(
            index, batch, num_hashes=16, band_size=2, min_match=8
        ).collect()
    }
    assert got[10] == (1, 0)
    assert got[11] == (0, 0)
    assert got[12] == (1, 1)


def test_ewma_vectorized_matches_loop_and_handles_nan(spark):
    """The pandas-ewm fast path must agree bit-for-bit with the sequential
    fold, and NaN-bearing segments must take the NaN-poisoning loop path."""
    from diepy_spark.operators.timeseries import ewma

    import random

    rnd = random.Random(5)
    rows = []
    eid = 0
    for uid in range(7):
        for _ in range(rnd.randint(1, 60)):
            rows.append((uid, eid, float(rnd.uniform(-10, 10))))
            eid += 1
    # one NaN row to force the fallback path for that user
    rows.append((3, eid, float("nan")))
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    out = {
        (r.user_id, r.ts): r.ewma
        for r in ewma(df, on=["user_id"], ts_col="ts", value_col="value", alpha=0.3).collect()
    }
    # python reference
    acc: dict[int, float | None] = {}
    ref = {}
    for uid, ts, v in sorted(rows, key=lambda t: (t[0], t[1])):
        a = acc.get(uid)
        a = v if a is None else 0.3 * v + 0.7 * a
        acc[uid] = a
        ref[(uid, ts)] = a
    assert set(out) == set(ref)
    for k, v in ref.items():
        if math.isnan(v):
            # NaN round-trips to null through the Arrow batch boundary
            # (pandas uses NaN as the float null sentinel) — both the
            # loop and vectorized paths share this rendering.
            assert out[k] is None or math.isnan(out[k]), k
        else:
            assert out[k] == v, k


def test_span_dedup_sorted_equals_hash_mode(spark):
    from diepy_spark.operators.dedup import duplicated_spans

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "prefix alpha beta gamma delta epsilon zeta eta suffix"),
            (3, "unrelated words entirely here of course today"),
        ],
        "doc_id long, text string",
    )
    a = {
        tuple(r)
        for r in duplicated_spans(docs, L=6, mode="hash").collect()
    }
    b = {
        tuple(r)
        for r in duplicated_spans(docs, L=6, mode="sorted").collect()
    }
    assert a == b and a  # identical and non-empty
    with pytest.raises(ValueError):
        duplicated_spans(docs, mode="nope")
