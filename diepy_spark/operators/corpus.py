"""End-to-end corpus cleaning: the composed pipeline a training-data run
actually executes, built entirely from this engine's own operators:

    quality gate (text.quality_score + text.repetition_stats)
      -> exact dedup (min-id representative per identical text)
        -> near-dup dedup (dedup.ngram_jaccard_pairs
                           -> clustering.dedup_corpus)

The reference has nothing like this (its product is import/export —
SURVEY §2.1); this is north-star extension surface, and the single entry
point a user calls instead of wiring the five operators by hand.

Scale design: each stage SHRINKS the corpus before the next touches it —
the gates are narrow per-row predicates over HOF-array features (no
shuffle), exact dedup is one hash aggregate (group on md5(text) at real
scale — see dedup.fingerprint), and only the surviving documents pay the
near-dup pair-graph cost, which is itself sub-quadratic (stop-shingle cap,
see dedup.ngram_jaccard_pairs). The dup-cluster label frame is orders of
magnitude smaller than the corpus and broadcast-joins back under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diepy_spark.operators.clustering import dedup_corpus
from diepy_spark.operators.dedup import ngram_jaccard_pairs
from diepy_spark.operators.text import quality_score, repetition_stats


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    min_score: float = 0.5,
    max_dup3: float = 0.5,
    jaccard_threshold: float = 0.2,
    max_df: int = 100,
) -> DataFrame:
    """Cleaned corpus: documents surviving the quality gate
    (``n_tokens >= min_tokens``, composite quality ``score >= min_score``,
    duplicate-3-gram fraction ``<= max_dup3``), exact dedup (the minimum
    id survives per identical text), and near-dup dedup (one
    representative per n-gram-Jaccard duplicate cluster).

    Output: ``id_col`` + the input's ``lang``/metadata columns surviving
    selection, ``n_tokens``, ``score``, and ``cluster`` (the doc's dup
    cluster id, null when it had no near-duplicate). Every threshold
    comparison runs on values computed identically in the SQL oracle, so
    the whole pipeline is hash-checkable end to end.

    The two feature passes (quality + repetition) each tokenize; fusing
    them into one projection is a straightforward optimization if the
    gate stage ever dominates — the dedup stages, not the gates, are the
    cost at corpus scale.
    """
    q = quality_score(df, text_col, id_col)
    rep = repetition_stats(df, text_col, id_col).select(id_col, "dup_frac3")
    gate = (
        q.join(rep, id_col)
        .where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("score") >= min_score)
            & (F.col("dup_frac3") <= max_dup3)
        )
        .select(id_col, "n_tokens", "score")
    )
    survivors = df.join(gate, id_col)
    exact_rep = survivors.groupBy(text_col).agg(F.min(id_col).alias(id_col))
    deduped = survivors.join(exact_rep.select(id_col), id_col, "left_semi")
    pairs = ngram_jaccard_pairs(
        deduped, threshold=jaccard_threshold, max_df=max_df, text_col=text_col, id_col=id_col
    )
    return dedup_corpus(deduped, pairs, id_col=id_col)
