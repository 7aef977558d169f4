"""Deduplication operators for LLM-training-data pipelines (SURVEY §2.6 X1/X2).

All operators are pure DataFrame compositions (no Python in the row path) and
deterministic across engines: hash functions are md5-over-UTF-8 (identical in
Spark, DuckDB, and Python), min-hash signatures are lexicographic minima of
md5 hex strings, and SimHash bit weights come from hex-nibble parsing — so
every operator here is oracle-checkable value-for-value against ANSI SQL.

Scale design notes:
- tokenize/shingle stays inside whole-stage codegen (higher-order array
  functions, no explode until needed);
- shingle self-joins are guarded by a max-df "stop shingle" cap: a shingle
  occurring in more than `max_df` docs is dropped before the pair join,
  bounding the classic quadratic hot-key blowup (sum over shingles of df²);
- MinHash-LSH banding turns all-pairs similarity into an equi-join on
  (band_id, band_signature) — the standard sub-quadratic path at 100 TB;
- every join key (shingle, band signature) is a high-cardinality string →
  hash-partitions evenly; AQE skew-join covers residual hotspots.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization / shingling (shared with operators.text)
# ---------------------------------------------------------------------------

TOKEN_SPLIT_RE = "[^a-z0-9]+"

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _ident(name: str) -> str:
    if not _IDENT_RE.match(name):
        raise ValueError(f"not a plain column identifier: {name!r}")
    return name


def tokens_expr(text_col: str = "text") -> str:
    """SQL text for the token array. NOTE: built as an expr STRING, not via
    the Python-lambda higher-order API — the lambda API produces the same
    logical plan but measures ~10-15x slower per row in Spark 4 (observed:
    1.9s vs 0.2s for the token split over 5k docs), so every hot path here
    goes through F.expr."""
    return f"filter(split(lower({_ident(text_col)}), '{TOKEN_SPLIT_RE}'), x -> x != '')"


def tokens_col(text_col: str = "text"):
    """lowercase word tokens as an array column (empty strings removed)."""
    return F.expr(tokens_expr(text_col))


def shingles_col(text_col: str = "text", n: int = 2):
    """Distinct word n-gram shingles as an array column, built with
    higher-order functions (sequence/transform over a slice) — no shuffle,
    no UDF, whole expression in one codegen stage."""
    t = tokens_expr(text_col)
    if n == 2:
        # fast path: pairwise zip of the array with its own tail
        body = (
            f"zip_with(slice({t}, 1, greatest(size({t}) - 1, 0)), "
            f"slice({t}, 2, greatest(size({t}) - 1, 0)), (a, b) -> concat(a, ' ', b))"
        )
    else:
        body = (
            f"if(size({t}) >= {n}, transform(sequence(1, size({t}) - {n - 1}), "
            f"i -> array_join(slice({t}, i, {n}), ' ')), array())"
        )
    return F.expr(f"array_distinct({body})")


# ---------------------------------------------------------------------------
# X1: exact dedup
# ---------------------------------------------------------------------------

def exact_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate accounting: one row per distinct text with the
    canonical (minimum) id and the duplicate count. `dropDuplicates` semantics
    but deterministic about which row survives."""
    return (
        df.groupBy(text_col)
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
        .select("keep_id", "dup_count")
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    The cheap first pass of any dedup pipeline (hash-groupBy instead of
    shuffling full documents)."""
    norm = F.concat_ws(" ", tokens_col(text_col))
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))


# ---------------------------------------------------------------------------
# X2a: exact n-gram Jaccard pairs (shingle join)
# ---------------------------------------------------------------------------

def _kept_shingles(
    df: DataFrame, n: int, max_df: int, text_col: str, id_col: str
) -> DataFrame:
    """(d, s) pairs after the corpus-wide stop-shingle cap: a shingle in
    more than max_df docs carries almost no signal and would dominate any
    shingle self-join (Σ df² blowup), so it is dropped up front."""
    sh = df.select(F.col(id_col).alias("d"), F.explode(shingles_col(text_col, n)).alias("s"))
    return sh.join(
        sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_cnt")).where(F.col("df_cnt") <= max_df),
        "s",
    ).select("d", "s")


def _jaccard_from_kept(kept: DataFrame, pair_kept: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard over kept shingles; the pair join runs on `pair_kept`
    (possibly a doc-restricted subset) while per-doc sizes come from `kept`
    — per-doc counts don't depend on other docs, so restricting the join
    side never changes a surviving pair's value."""
    sizes = kept.groupBy("d").agg(F.count(F.lit(1)).alias("n_sh"))
    a = pair_kept.alias("a")
    b = pair_kept.alias("b")
    common = (
        a.join(b, "s")
        .where(F.col("a.d") < F.col("b.d"))
        .groupBy(F.col("a.d").alias("da"), F.col("b.d").alias("db"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        common.join(sizes.withColumnRenamed("d", "da").withColumnRenamed("n_sh", "na"), "da")
        .join(sizes.withColumnRenamed("d", "db").withColumnRenamed("n_sh", "nb"), "db")
        # raw double ratio (bit-identical across engines; never rounded)
        .withColumn("jac", F.col("c") / (F.col("na") + F.col("nb") - F.col("c")))
        .where(F.col("jac") >= threshold)
        .select("da", "db", "jac")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 2,
    max_df: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ threshold.

    Exact but join-based: cost is Σ_shingle df², bounded by the max_df cap.
    Jaccard is computed over the KEPT shingle set — documented, mirrored in
    the oracle."""
    kept = _kept_shingles(df, n, max_df, text_col, id_col)
    return _jaccard_from_kept(kept, kept, threshold)


# ---------------------------------------------------------------------------
# X2b: MinHash + LSH banding
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame, num_hashes: int = 16, n: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature per document: for seed h, min over shingles of
    md5('h|' + shingle) (lexicographic min of hex = a perfectly serviceable,
    engine-portable min-hash). One explode + one groupBy; the shuffle carries
    (doc, shingle) pairs once regardless of num_hashes."""
    sh = df.select(F.col(id_col).alias("d"), F.explode(shingles_col(text_col, n)).alias("s"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{h}|"), F.col("s")))).alias(f"mh{h}")
        for h in range(num_hashes)
    ]
    return sh.groupBy("d").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 16,
    band_size: int = 2,
    threshold: float = 0.3,
    n: int = 2,
    max_df: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs via MinHash-LSH banding, then exact-Jaccard verify.

    Candidates = pairs agreeing on at least one band of `band_size`
    consecutive min-hashes (equi-join on the band signature — sub-quadratic).
    Verification joins back through the exact shingle Jaccard so the output
    is exact above `threshold` (up to LSH recall)."""
    sigs = minhash_signatures(df, num_hashes, n, text_col, id_col)
    n_bands = num_hashes // band_size
    # one explode of a (band, signature) struct array — NOT a per-band union,
    # which would re-evaluate the whole signature DAG n_bands times
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "#", *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
                ).alias("sig"),
            )
            for b in range(n_bands)
        ]
    )
    bands = sigs.select("d", F.explode(band_arr).alias("bs")).select(
        "d", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    x = bands.alias("x")
    y = bands.alias("y")
    cand = (
        x.join(y, ["band", "sig"])
        .where(F.col("x.d") < F.col("y.d"))
        .select(F.col("x.d").alias("da"), F.col("y.d").alias("db"))
        .distinct()
    )
    # Exact-Jaccard verify with the pair join restricted to docs appearing
    # in some candidate pair: at scale candidates are sparse, so the
    # quadratic all-pairs shingle join shrinks to the candidate
    # neighborhood. The stop-shingle df counts and per-doc sizes still come
    # from the FULL corpus, so surviving pairs keep their global values.
    cand_ids = (
        cand.select(F.col("da").alias("d")).union(cand.select(F.col("db").alias("d"))).distinct()
    )
    kept = _kept_shingles(df, n, max_df, text_col, id_col)
    pair_kept = kept.join(cand_ids, "d", "left_semi")
    exact = _jaccard_from_kept(kept, pair_kept, threshold)
    return cand.join(exact, ["da", "db"]).select("da", "db", "jac")


# ---------------------------------------------------------------------------
# X2c: SimHash
# ---------------------------------------------------------------------------

def _hex_nibble_to_int(col, pos: int):
    """Value 0-15 of hex char at 1-based pos (portable across engines)."""
    return F.instr(F.lit("0123456789abcdef"), F.substring(col, pos, 1)) - 1


def _hex16_to_int(col, start: int):
    """Parse 4 hex chars at 1-based `start` → 0..65535."""
    return (
        _hex_nibble_to_int(col, start) * 4096
        + _hex_nibble_to_int(col, start + 1) * 256
        + _hex_nibble_to_int(col, start + 2) * 16
        + _hex_nibble_to_int(col, start + 3)
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", chunks: int = 4
) -> DataFrame:
    """64-bit SimHash as 4×16-bit chunks (columns sh0..sh3).

    Per token, md5 supplies 64 deterministic bits (4 hex quads); per bit the
    classic weighted vote (+1/-1) is summed across tokens; the sign vector is
    re-packed into 16-bit ints. Pure expressions → whole-stage codegen; one
    explode + one groupBy per document."""
    toks = df.select(
        F.col(id_col).alias("d"), F.explode(tokens_col(text_col)).alias("tok")
    ).withColumn("h", F.md5("tok"))
    for c in range(chunks):
        toks = toks.withColumn(f"v{c}", _hex16_to_int(F.col("h"), 1 + 4 * c))
    bit_sums = toks.groupBy("d").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col(f"v{c}"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"b{c}_{j}")
            for c in range(chunks)
            for j in range(16)
        ]
    )
    out = bit_sums
    for c in range(chunks):
        expr = None
        for j in range(16):
            term = F.when(F.col(f"b{c}_{j}") > 0, F.lit(1 << j)).otherwise(0)
            expr = term if expr is None else expr + term
        out = out.withColumn(f"sh{c}", expr.cast("int"))
    return out.select("d", *[f"sh{c}" for c in range(chunks)])


def simhash_candidate_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup candidates: pairs whose SimHash agrees on ≥1 of the 4 16-bit
    chunks (standard block-match: hamming distance ≤3 over 64 bits is
    guaranteed caught). Equi-join per chunk — no quadratic scan."""
    sigs = simhash(df, text_col, id_col)
    # single explode of (chunk, value) instead of a 4-way self-join union,
    # which would re-evaluate the simhash DAG four times
    chunks = sigs.select(
        "d",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("chunk"), F.col(f"sh{c}").alias("v"))
                    for c in range(4)
                ]
            )
        ).alias("cv"),
    ).select("d", F.col("cv.chunk").alias("chunk"), F.col("cv.v").alias("v"))
    x = chunks.alias("x")
    y = chunks.alias("y")
    return (
        x.join(y, ["chunk", "v"])
        .where(F.col("x.d") < F.col("y.d"))
        .select(F.col("x.d").alias("da"), F.col("y.d").alias("db"))
        .distinct()
    )
