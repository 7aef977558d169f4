"""Round-13 operator mirrors.

x6_band_health gets the same treatment as every declared query: a
literal pure-Python recomputation (signatures, band slices, bucket
counts) fully independent of both engines, compared against the Spark
plan on sf0.001.
"""

from __future__ import annotations

from collections import Counter, defaultdict

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
