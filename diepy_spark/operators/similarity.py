"""Similarity search over embedding columns (SURVEY §2.6 X3).

Embeddings are `array<float>` columns. The exact path computes cosine with
built-in higher-order functions (zip_with + aggregate — JVM-side, no UDF);
the scale path buckets by random-hyperplane LSH so only same-bucket pairs
are scored.

Determinism: cosine values are rounded before any ranking so that top-k
order (rounded score desc, id asc) is stable across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from diepy_spark.operators.dedup import _hex_nibble_to_int, _ident


def _dot(a: str, b: str):
    """Dot product of two array<float> columns BY NAME. expr-string form:
    the Python-lambda higher-order API is ~10x slower (see dedup.tokens_expr
    note). The elementwise product stays in FLOAT (x*y on float32) before
    widening into the double accumulator — DuckDB multiplies unnested floats
    the same way, keeping cosine values bit-aligned with the oracle."""
    return F.expr(
        f"aggregate(zip_with({_ident(a)}, {_ident(b)}, (x, y) -> x * y), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def _norm(a: str):
    return F.sqrt(
        F.expr(
            f"aggregate(zip_with({_ident(a)}, {_ident(a)}, (x, y) -> x * y), "
            f"0.0D, (acc, v) -> acc + v)"
        )
    )


def cosine(a: str, b: str):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_pairs(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.99,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute force). O(n²) by nature —
    bound the input (filter / LSH bucket) before calling at scale.

    Norms are precomputed once per vector (not per pair), cutting the
    per-pair work to a single dot product."""
    a = df.select(
        F.col(id_col).alias("va"), F.col(vec_col).alias("ea"), _norm(vec_col).alias("na")
    )
    b = df.select(
        F.col(id_col).alias("vb"), F.col(vec_col).alias("eb"), _norm(vec_col).alias("nb")
    )
    return (
        a.join(b, F.col("va") < F.col("vb"))
        .withColumn("cos", F.round(_dot("ea", "eb") / (F.col("na") * F.col("nb")), 4))
        .where(F.col("cos") >= threshold)
        .select("va", "vb", "cos")
    )


def cosine_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector, brute force.

    The query side is broadcast (queries are few; the corpus is the big
    side), so the corpus is scanned once with no shuffle; the per-query
    top-k is a window over (rounded cos desc, id) — rank ties impossible."""
    q = F.broadcast(queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")))
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    scored = c.join(q).withColumn("cos", F.round(cosine("qv", "cv"), 4))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "cid", "cos", "rk")
    )


def lsh_bucket(
    df: DataFrame, num_planes: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: str = "ann",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector.

    Hyperplane p's component for dimension i is derived deterministically
    from md5(seed|p|i) → a value in {-8..7} (first hex nibble − 8). The
    bucket is the sign pattern of the `num_planes` dot products. Everything
    is built-in expressions; the plane table is tiny and broadcast."""
    dim = len(df.select(vec_col).first()[0])
    spark = df.sparkSession
    planes = spark.range(num_planes).select(
        F.col("id").cast("int").alias("p"),
        F.array(
            *[
                (_hex_nibble_to_int(F.md5(F.concat_ws("|", F.lit(seed), F.col("id"), F.lit(i))), 1) - 8)
                .cast("double")
                for i in range(dim)
            ]
        ).alias("pv"),
    )
    v = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vv"))
    signed = (
        v.join(F.broadcast(planes))
        .withColumn("bit", F.when(_dot("vv", "pv") >= 0, 1).otherwise(0))
        .groupBy("vid")
        .agg(
            F.sum(F.col("bit") * F.pow(F.lit(2.0), F.col("p")).cast("long")).cast("int").alias("bucket")
        )
    )
    return signed


def ann_topk_lsh(
    queries: DataFrame, corpus: DataFrame, k: int = 3, num_planes: int = 6,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket. At scale this turns a full scan per query into one equi-join on
    bucket id. Recall < 1.0 by construction (documented); multi-probe or
    more tables raise it."""
    qb = lsh_bucket(queries, num_planes, id_col, vec_col).withColumnRenamed("vid", "qid")
    cb = lsh_bucket(corpus, num_planes, id_col, vec_col).withColumnRenamed("vid", "cid")
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")).join(qb, "qid")
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")).join(cb, "cid")
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "cos", F.round(cosine("qv", "cv"), 4)
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "cid", "cos", "rk")
    )
