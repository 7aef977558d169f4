"""HITS (operators/clustering.py:hits): exact integer equivalence against
a Python mirror of the same max-normalized iteration, plus the direction
sanity check (the max-rescaled scores rank like the float L2 iteration).
"""

from __future__ import annotations

import math
import random

from diepy_spark.operators.clustering import hits


def brute_hits(edges, iterations, scale):
    us = sorted({u for u, _ in edges})
    vs = sorted({v for _, v in edges})
    hub = {u: scale for u in us}
    auth = {}
    for _ in range(iterations):
        araw = {}
        for u, v in edges:
            araw[v] = araw.get(v, 0) + hub[u]
        mx = max(araw.values())
        auth = {v: (a * scale) // mx for v, a in araw.items()}
        hraw = {}
        for u, v in edges:
            if v in auth:
                hraw[u] = hraw.get(u, 0) + auth[v]
        mx = max(hraw.values())
        hub = {u: (h * scale) // mx for u, h in hraw.items()}
    nodes = sorted(set(us) | set(vs))
    return {n: (hub.get(n, 0), auth.get(n, 0)) for n in nodes}


def float_hits_ranking(edges, iterations):
    us = sorted({u for u, _ in edges})
    hub = {u: 1.0 for u in us}
    auth = {}
    for _ in range(iterations):
        araw = {}
        for u, v in edges:
            araw[v] = araw.get(v, 0.0) + hub[u]
        nrm = math.sqrt(sum(x * x for x in araw.values()))
        auth = {v: a / nrm for v, a in araw.items()}
        hraw = {}
        for u, v in edges:
            hraw[u] = hraw.get(u, 0.0) + auth[v]
        nrm = math.sqrt(sum(x * x for x in hraw.values()))
        hub = {u: h / nrm for u, h in hraw.items()}
    return auth


def test_hits_matches_integer_bruteforce(spark):
    rng = random.Random(23)
    edges = sorted({(rng.randint(1, 12), rng.randint(100, 108)) for _ in range(40)})
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(df, iterations=3, scale=10**6).collect()
    }
    assert got == brute_hits(edges, 3, 10**6)


def test_max_rescale_preserves_l2_ranking(spark):
    # Max-normalization changes magnitudes, not the eigenvector direction:
    # the authority RANKING must match the float L2 iteration's.
    rng = random.Random(5)
    edges = sorted({(rng.randint(1, 15), rng.randint(100, 110)) for _ in range(60)})
    df = spark.createDataFrame(edges, ["src", "dst"])
    ours = {
        r["node"]: r["auth"]
        for r in hits(df, iterations=6, scale=10**9).collect()
        if r["auth"] > 0
    }
    ref = float_hits_ranking(edges, 6)
    rank_ours = sorted(ours, key=lambda n: (-ours[n], n))
    rank_ref = sorted(ref, key=lambda n: (-ref[n], n))
    assert rank_ours == rank_ref
