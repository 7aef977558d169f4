"""HyperBall (operators/clustering.py:hyperball): exact equivalence.

The brute force computes every node's t-ball EXACTLY (Python BFS), then
builds the same md5-derived HLL registers over each ball and folds them
with the same alpha/linear-counting formula — the operator's output must
match to the cent (DECIMAL(18,4) sums of 4-decimal-rounded estimates).
"""

from __future__ import annotations

import hashlib
import math
import random
from decimal import Decimal

from diepy_spark.operators.clustering import hyperball
from diepy_spark.operators.sketch import hll_alpha


def _bucket_rho(node: int, m: int) -> tuple[int, int]:
    h = hashlib.md5(str(node).encode()).hexdigest()
    bucket = int(h[:2], 16) % m
    window = h[2:10].lstrip("0")
    if not window:
        return bucket, 33
    clz4 = {"1": 3, "2": 2, "3": 2}.get(window[0], 1 if window[0] in "4567" else 0)
    return bucket, 4 * (8 - len(window)) + clz4 + 1


def brute_hyperball(edges: list[tuple[int, int]], iterations: int, m: int):
    adj: dict[int, set[int]] = {}
    nodes = set()
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        nodes.update((s, d))
    balls = {v: {v} for v in nodes}
    rows = []
    alpha = hll_alpha(m)
    # balls grow by unioning IN-neighbour balls each round, matching the
    # operator's src->dst register propagation
    balls = {v: {v} for v in nodes}
    per_t_balls = [dict(balls)]
    for _ in range(iterations):
        nxt = {}
        for v in nodes:
            b = set(balls[v])
            for s, d in edges:
                if d == v and s != d:
                    b |= balls[s]
            nxt[v] = b
        balls = nxt
        per_t_balls.append(dict(balls))
    for t, bt in enumerate(per_t_balls):
        total = Decimal(0)
        for v in nodes:
            regs: dict[int, int] = {}
            for u in bt[v]:
                b, r = _bucket_rho(u, m)
                regs[b] = max(regs.get(b, 0), r)
            s = sum(2.0 ** -r for r in regs.values())
            nb = len(regs)
            raw = alpha * m * m / (s + (m - nb))
            if raw <= 2.5 * m and m - nb > 0:
                est = float(m) * math.log(m / (m - nb))
            else:
                est = raw
            total += Decimal(f"{est:.4f}")
        rows.append((t, len(nodes), float(total)))
    return rows


def test_hyperball_matches_bruteforce(spark):
    rng = random.Random(11)
    edges = set()
    for _ in range(60):
        a, b = rng.randint(1, 25), rng.randint(1, 25)
        if a != b:
            edges.add((a, b))
            edges.add((b, a))  # symmetric, like the declared query
    edges = sorted(edges)
    df = spark.createDataFrame(edges, ["src", "dst"])
    for m in (64, 256):
        got = {
            r["t"]: (r["n_nodes"], r["nf"])
            for r in hyperball(df, iterations=2, m=m).collect()
        }
        for t, n_nodes, nf in brute_hyperball(edges, 2, m):
            gn, gnf = got[t]
            assert gn == n_nodes
            assert abs(gnf - nf) < 1e-9, (m, t, gnf, nf)


def brute_error_sheet(
    edges: list[tuple[int, int]], seeds: set[int], iterations: int, m: int
):
    """Exact per-seed balls (BFS) + the seeds' HLL fold per round —
    the hyperball_exact_error contract on an arbitrary graph."""
    nodes = set()
    for s, d in edges:
        if s != d:
            nodes.update((s, d))
    balls = {v: {v} for v in nodes}
    per_t = [dict(balls)]
    for _ in range(iterations):
        nxt = {}
        for v in nodes:
            b = set(balls[v])
            for s, d in edges:
                if d == v and s != d:
                    b |= balls[s]
            nxt[v] = b
        balls = nxt
        per_t.append(dict(balls))
    alpha = hll_alpha(m)
    rows = []
    for t, bt in enumerate(per_t):
        exact = sum(len(bt[s]) for s in seeds)
        est = Decimal(0)
        for v in seeds:
            regs: dict[int, int] = {}
            for u in bt[v]:
                b, r = _bucket_rho(u, m)
                regs[b] = max(regs.get(b, 0), r)
            s_ = sum(2.0 ** -r for r in regs.values())
            nb = len(regs)
            raw = alpha * m * m / (s_ + (m - nb))
            if raw <= 2.5 * m and m - nb > 0:
                e = float(m) * math.log(m / (m - nb))
            else:
                e = raw
            est += Decimal(f"{e:.4f}")
        rows.append((t, len(seeds), exact, float(est)))
    return rows


def test_hyperball_exact_error_matches_bruteforce(spark):
    from diepy_spark.operators.clustering import hyperball_exact_error

    rng = random.Random(23)
    edges = set()
    for _ in range(60):
        a, b = rng.randint(1, 25), rng.randint(1, 25)
        if a != b:
            edges.add((a, b))
            edges.add((b, a))
    edges = sorted(edges)
    nodes = sorted({n for e in edges for n in e})
    seeds = set(nodes[::3])  # every third node — an arbitrary seed subset
    df = spark.createDataFrame(edges, ["src", "dst"])
    sdf = spark.createDataFrame([(s,) for s in sorted(seeds)], ["node"])
    got = {
        r["t"]: (r["n_seeds"], r["exact_pairs"], r["est_sum"], r["est_over_exact"])
        for r in hyperball_exact_error(df, sdf, iterations=2, m=64).collect()
    }
    for t, n_seeds, exact, est in brute_error_sheet(edges, seeds, 2, 64):
        gn, gx, ge, gr = got[t]
        assert gn == n_seeds
        assert gx == exact
        assert abs(ge - est) < 1e-9, (t, ge, est)
        assert abs(gr - est / exact) <= 1e-6, (t, gr, est / exact)
