"""Round-13 operator mirrors.

x6_band_health and x11_hyperball_error get the same treatment as every
declared query: a literal pure-Python recomputation (signatures, band
slices, bucket counts; BFS balls, HLL registers and fold) fully
independent of both engines, compared against the Spark plan on
sf0.001.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from decimal import Decimal

import duckdb


def _doc_rows(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()


def _py_blockhash(text: str, bits: int) -> int:
    """Literal mirror of _ph_sigs: bit j set when block j's byte mass
    exceeds its pro-rata share (integer cross-multiplication)."""
    n = len(text)
    tot = sum(ord(c) for c in text)
    sig = 0
    for j in range(bits):
        lo = (n * j) // bits + 1          # 1-based inclusive
        hi = (n * (j + 1)) // bits
        blk = sum(ord(c) for c in text[lo - 1:hi])
        if blk * n > tot * (hi - lo + 1):
            sig |= 1 << j
    return sig


def test_band_health_matches_python(spark, sf_small):
    from diepy_spark.plans.extended import (
        MEDIA_DOC_MAX,
        PH_BANDS,
        PH_BITS,
        _ph_band_slices,
        x6_band_health,
    )

    sigs = {
        d: _py_blockhash(t, PH_BITS)
        for d, t in _doc_rows(sf_small)
        if d < MEDIA_DOC_MAX and len(t) >= PH_BITS
    }
    assert sigs, "fixture empty — MEDIA_DOC_MAX bound moved?"

    slices = _ph_band_slices()
    assert len(slices) == PH_BANDS
    assert sum(w for _s, w in slices) == PH_BITS
    # disjoint, consecutive coverage — the pigeonhole precondition
    pos = 0
    for start, w in slices:
        assert start == pos and w >= 1
        pos += w

    buckets: dict[int, Counter] = defaultdict(Counter)
    for sig in sigs.values():
        for bid, (start, w) in enumerate(slices):
            buckets[bid][(sig >> start) & ((1 << w) - 1)] += 1
    expect = {
        bid: (
            len(cnt),
            max(cnt.values()),
            sum(c * (c - 1) // 2 for c in cnt.values()),
        )
        for bid, cnt in buckets.items()
    }

    got = {
        r.bid: (r.n_buckets, r.max_bucket, r.cand_pairs)
        for r in x6_band_health(spark, sf_small).collect()
    }
    assert got == expect


def _bucket_rho(node: int, m: int) -> tuple[int, int]:
    """Literal mirror of sketch.py's portable md5 register layout (the
    same helper as tests/test_hyperball.py)."""
    h = hashlib.md5(str(node).encode()).hexdigest()
    bucket = int(h[:2], 16) % m
    window = h[2:10].lstrip("0")
    if not window:
        return bucket, 33
    clz4 = {"1": 3, "2": 2, "3": 2}.get(window[0], 1 if window[0] in "4567" else 0)
    return bucket, 4 * (8 - len(window)) + clz4 + 1


def test_hyperball_error_matches_python(spark, sf_small):
    from diepy_spark.operators.sketch import hll_alpha
    from diepy_spark.plans.extended import (
        HB_ITER,
        HB_M,
        HBE_SEED_MAX,
        x11_hyperball_error,
    )

    con = duckdb.connect()
    edges = con.execute(
        f"SELECT DISTINCT l_partkey * 10 + 1, l_suppkey * 10 + 2 "
        f"FROM '{sf_small}/lineitem.parquet'"
    ).fetchall()
    seeds = {
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT l_partkey * 10 + 1 "
            f"FROM '{sf_small}/lineitem.parquet' WHERE l_partkey <= {HBE_SEED_MAX}"
        ).fetchall()
    }
    assert seeds, "fixture empty — HBE_SEED_MAX bound moved?"

    adj: dict[int, set[int]] = defaultdict(set)
    nodes: set[int] = set()
    for a, b in edges:
        if a == b:
            continue
        adj[a].add(b)
        adj[b].add(a)
        nodes.update((a, b))

    # exact per-seed balls by frontier BFS; estimate side unions
    # in-neighbour balls per round (register max == ball union), so one
    # ball evolution serves both arms of the sheet.
    balls = {v: {v} for v in nodes}
    per_t_balls = [dict(balls)]
    for _ in range(HB_ITER):
        balls = {v: set.union(balls[v], *(balls[u] for u in adj[v])) for v in nodes}
        per_t_balls.append(dict(balls))

    alpha = hll_alpha(HB_M)
    expect = {}
    for t, bt in enumerate(per_t_balls):
        exact_pairs = sum(len(bt[s]) for s in seeds)
        est = Decimal(0)
        for s_ in seeds:
            regs: dict[int, int] = {}
            for u in bt[s_]:
                b, r = _bucket_rho(u, HB_M)
                regs[b] = max(regs.get(b, 0), r)
            ssum = sum(2.0**-r for r in regs.values())
            nb = len(regs)
            raw = alpha * HB_M * HB_M / (ssum + (HB_M - nb))
            if raw <= 2.5 * HB_M and HB_M - nb > 0:
                e = float(HB_M) * math.log(HB_M / (HB_M - nb))
            else:
                e = raw
            est += Decimal(f"{e:.4f}")
        expect[t] = (len(seeds), exact_pairs, float(est))

    rows = x11_hyperball_error(spark, sf_small).collect()
    got = {r.t: (r.n_seeds, r.exact_pairs, r.est_sum) for r in rows}
    assert got == expect
    for r in rows:
        # ratio column re-derived with a 1-ulp tolerance (Python round is
        # HALF_EVEN, Spark's HALF_UP — the integers and the DECIMAL sum
        # above are compared exactly; only this display ratio is rounded)
        want = expect[r.t][2] / expect[r.t][1]
        assert abs(r.est_over_exact - want) <= 1e-6
