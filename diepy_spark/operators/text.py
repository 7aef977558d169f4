"""Text analysis operators for training-data pipelines (SURVEY §2.6 X5).

Language-ID (stopword-count heuristic), quality scoring, token counting,
and fingerprinting — all pure built-in expressions (narrow ops + at most one
aggregate shuffle), deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from diepy_spark.operators.dedup import tokens_expr


def _token_frame(
    df: DataFrame, text_col: str, id_col: str, *extra: Column, min_tokens: int = 0
) -> DataFrame:
    """(id, *extra, toks): token array materialized ONCE per row as a real
    column — downstream expressions reference it several times, and
    Catalyst's CollapseProject keeps multi-referenced non-cheap aliases
    materialized instead of re-tokenizing per reference (see
    dedup.shingle_frame). Input is hash-repartitioned to spread the
    CPU-bound scoring work even off single-file sources; the min_tokens
    filter runs on raw text BELOW the projection (cheap pushdown)."""
    if min_tokens:
        df = df.where(F.expr(f"size({tokens_expr(text_col)}) >= {min_tokens}"))
    return df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    ).select(F.col(id_col), *extra, F.expr(tokens_expr(text_col)).alias("toks"))

# Small closed-class stopword profiles. The heuristic is the classic
# "count function-word hits per language, argmax wins"; ties and zero hits
# resolve deterministically (priority = list order, zero → 'und').
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "por", "para"),
}


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Predicted language per document via stopword hit counts.

    Hit counts are exact token-membership sums (not distinct), computed with
    one pass over the token array per language — no explode, no
    aggregation shuffle."""
    out = _token_frame(df, text_col, id_col)
    for lang, words in LANG_PROFILES.items():
        out = out.withColumn(
            f"hits_{lang}",
            F.aggregate(
                F.transform(
                    F.col("toks"),
                    lambda x: F.when(x.isin(*words), 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, v: acc + v,
            ),
        )
    best = None
    for lang in LANG_PROFILES:
        cond = (F.col(f"hits_{lang}") > 0) & F.lit(True)
        for other in LANG_PROFILES:
            if other == lang:
                continue
            op = (
                F.col(f"hits_{lang}") >= F.col(f"hits_{other}")
                if list(LANG_PROFILES).index(other) > list(LANG_PROFILES).index(lang)
                else F.col(f"hits_{lang}") > F.col(f"hits_{other}")
            )
            cond = cond & op
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    pred = best.otherwise("und")
    return out.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        *[F.col(f"hits_{lang}").alias(f"hits_{lang}") for lang in LANG_PROFILES],
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token counts: whitespace tokens, regex word tokens
    (BPE-ish [a-z0-9]+ pieces), distinct words, char length."""
    tf = _token_frame(
        df,
        text_col,
        id_col,
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("ws_tokens"),
        F.length(text_col).alias("chars"),
    )
    return tf.select(
        F.col(id_col),
        "ws_tokens",
        F.size("toks").alias("word_tokens"),
        F.size(F.array_distinct("toks")).alias("distinct_tokens"),
        "chars",
    )


def vocab(
    df: DataFrame, top_n: int = 100, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus vocabulary with heavy-hitter stats: the top_n tokens by total
    occurrence count, with document frequency. The vocabulary-building step
    of every tokenizer/filter pipeline.

    Scale: ONE explode shuffle; the occurrence count combines map-side
    (partial aggregation), so the shuffle carries (token, partial) pairs
    per task, not every occurrence of 'the'. Doc frequency is exact
    two-phase count-distinct here (oracle parity); at 100 TB swap in
    approx_count_distinct (HLL, one pass) when ~2% error is acceptable.
    Top-n compiles to TakeOrderedAndProject — no global sort."""
    toks = _token_frame(df, text_col, id_col).select(
        F.col(id_col).alias("d"), F.explode("toks").alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("d").alias("doc_freq"),
        )
        .orderBy(F.col("n").desc(), "tok")
        .limit(top_n)
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf:
    tf = occurrences / doc token count, idf = ln(N / doc_freq), ties broken
    by token (after rounding — deterministic, engine-portable).

    Scale: explode → one (doc, token) count shuffle with map-side combine;
    the per-doc totals reuse a window over the same rows; doc frequency is
    a token-keyed aggregate whose result is vocabulary-sized (joined back
    broadcast-or-shuffle under AQE); N rides in as a 1-row broadcast
    cross join. The final top-k is a per-doc window on rounded scores."""
    from pyspark.sql import Window

    toks = _token_frame(df, text_col, id_col).select(
        F.col(id_col).alias("d"), F.explode("toks").alias("tok")
    )
    tf = toks.groupBy("d", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    tf = tf.withColumn("tot", F.sum("cnt").over(Window.partitionBy("d")))
    docfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = tf.select(F.countDistinct("d").alias("n_docs"))
    scored = (
        tf.join(docfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                (F.col("cnt") / F.col("tot"))
                * F.log(F.col("n_docs") / F.col("doc_freq")),
                round_to,
            ),
        )
    )
    w = Window.partitionBy("d").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(F.col("d").alias(id_col), "tok", "score", "rk")
    )


def quality_exprs(toks_col: str = "toks", n_chars_col: str = "n_chars_raw") -> dict[str, Column]:
    """The quality feature expressions over a MATERIALIZED token-array
    column and a raw char-length column — shared by quality_score and the
    fused corpus-cleaning gate (operators/corpus.py), so the formula can't
    drift between them (the SQL oracles restate it from the same shape).
    Built as expr STRINGS, not the Python-lambda HOF API — same plan, but
    the lambda API measures ~10-15x slower per row in Spark 4 (see
    dedup.tokens_expr note).

    Ratios of exact integers are emitted as RAW doubles — IEEE division is
    bit-identical across engines, while ROUND(double) is not (Spark rounds
    the exact binary value, DuckDB the decimal rendering; values landing
    on .xxxx5 diverge). Only float-sum-derived values ever get rounded."""
    from diepy_spark.operators.dedup import _ident

    t = _ident(toks_col)
    en_list = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    n_tok = F.expr(f"size({t})")
    n_distinct = F.expr(f"size(array_distinct({t}))")
    n_stop = F.expr(
        f"aggregate(transform({t}, x -> if(x in ({en_list}), 1, 0)), 0, (a, v) -> a + v)"
    )
    sum_tok_len = F.expr(
        f"aggregate(transform({t}, x -> length(x)), 0, (a, v) -> a + v)"
    )
    ttr = n_distinct / n_tok
    stop_ratio = n_stop / n_tok
    mean_len = sum_tok_len / n_tok
    len_signal = F.least(F.col(_ident(n_chars_col)) / F.lit(500.0), F.lit(1.0))
    score = (
        0.3 * len_signal
        + 0.3 * ttr
        + 0.2 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.2 * F.least(mean_len / 8, F.lit(1.0))
    )
    return {
        "n_tokens": n_tok,
        "ttr": ttr,
        "stop_ratio": stop_ratio,
        "mean_tok_len": mean_len,
        "score": score,
    }


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + a composite score in [0,1]:
    length signal, type-token ratio, stopword ratio, mean token length
    (see quality_exprs for the bit-stability contract).
    Zero-token docs are dropped by a cheap pre-filter (the former
    post-filter on the aliased count pushed down as a full re-tokenize)."""
    tf = _token_frame(
        df, text_col, id_col, F.length(text_col).alias("n_chars_raw"), min_tokens=1
    )
    q = quality_exprs()
    return tf.select(
        F.col(id_col), *[expr.alias(name) for name, expr in q.items()]
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """Within-document repetition signals (the Gopher repetition filters,
    Rae et al. 2021 §A1.1): for each n in `ns`, the fraction of word
    n-grams that are duplicates of an earlier n-gram in the same document
    (``1 - distinct/total``). High values flag boilerplate/spam docs that
    survive corpus-level dedup because they only repeat *internally*.

    Scale: pure per-row higher-order array expressions — the gram arrays
    never explode and nothing shuffles; the whole operator is one narrow
    projection pipeline over the corpus scan. The n-gram arrays are
    materialized as real columns in their own projection so the three
    downstream references (two sizes + distinct) don't re-evaluate the
    gram build under interpreted HOF eval.

    Docs with fewer than max(ns) tokens are dropped (no n-gram of every
    requested length exists; ratios would be 0/0).
    """
    from diepy_spark.operators.dedup import _grams_over

    tf = _token_frame(df, text_col, id_col, min_tokens=max(ns))
    grams = tf.select(
        F.col(id_col),
        F.size("toks").alias("n_tokens"),
        *[F.expr(_grams_over("toks", n)).alias(f"g{n}") for n in ns],
    )
    cols: list[Column] = [F.col(id_col), F.col("n_tokens")]
    for n in ns:
        g = F.col(f"g{n}")
        # int/int division -> double, bit-identical in Spark and DuckDB
        cols.append(F.size(g).alias(f"n_grams{n}"))
        cols.append(
            ((F.size(g) - F.size(F.array_distinct(g))) / F.size(g)).alias(f"dup_frac{n}")
        )
    return grams.select(*cols)


# PII patterns shared verbatim by the Spark plan and the DuckDB oracle.
# Deliberately backslash-free (character classes like [.] instead of \.) so
# the SAME string is a valid, identical regex in Java (Spark) and RE2
# (DuckDB) without double-escaping games.
PII_PATTERNS: dict[str, str] = {
    "email": "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}",
    "phone": "[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ip": "([0-9]{1,3}[.]){3}[0-9]{1,3}",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """PII scrubbing: counts matches of each pattern in the original text
    and replaces them with ``<name>`` placeholders, applied in dict order.
    Counts are taken against the ORIGINAL text (reporting), replacements
    chain (sanitizing) — the standard shape of a corpus scrubbing pass.

    Scale: regexp_extract_all/regexp_replace are JVM-side codegen'd
    expressions — one narrow projection, no shuffle, no Python. Pattern
    strings must avoid backslash escapes (see PII_PATTERNS) so the same
    pattern text is portable to the SQL oracle.
    """
    patterns = PII_PATTERNS if patterns is None else patterns
    cols: list[Column] = [F.col(id_col)]
    red = F.col(text_col)
    for name, pat in patterns.items():
        cols.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(
                f"n_{name}"
            )
        )
        red = F.regexp_replace(red, pat, f"<{name}>")
    cols.append(red.alias("redacted"))
    return df.select(*cols)


def chunk_tokens(
    df: DataFrame,
    chunk_size: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing / context-window chunking: split each document's
    token stream into windows of `chunk_size` tokens starting every
    `stride` tokens (overlap = chunk_size - stride), the step that turns a
    cleaned corpus into training sequences. Emits one row per (doc, chunk)
    with the chunk's token count and an md5 over its joined tokens (the
    content id downstream shuffles/dedups on, instead of moving the text).

    Scale: tokenize + window-start generation are per-row HOF arrays; the
    only Generate is the per-chunk posexplode (fan-out = ~1/stride of the
    token volume); no shuffle at all. Trailing chunks are partial (every
    token appears in >= 1 chunk); empty docs emit nothing.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError(f"chunk_size and stride must be positive: {chunk_size}, {stride}")
    tf = _token_frame(df, text_col, id_col, min_tokens=1)
    starts = tf.select(
        F.col(id_col),
        F.col("toks"),
        F.posexplode(F.expr(f"sequence(1, size(toks), {stride})")).alias("chunk_idx", "start"),
    )
    chunk = F.expr(f"slice(toks, start, {chunk_size})")
    return starts.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


def pack_shards(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budgeted corpus SHARDING: assign each document to an output
    shard so that every (group, shard) holds at most ~budget_tokens word
    tokens — the step that turns a cleaned corpus into training files of
    roughly equal token count (chunk_tokens is the within-doc sibling;
    this packs across docs). Streaming first-fit in id order: a doc goes
    to shard floor(cum_tokens_before / budget), so a shard may overflow
    by at most one document (the standard one-pass packing bound);
    deterministic because the order is the stable id, never arrival.

    Scale design: token counts are a narrow projection; the only state is
    ONE running-sum window partitioned by `group_col` — packing
    parallelizes across groups (sources/languages), which is how a 100 TB
    corpus shards in practice. A single global pack would serialize into
    one partition; that is the physics of exact sequential packing, so
    this operator requires a group column and leaves global packing to a
    two-level compose (pack per group, then concatenate shard ranges).

    Output: (id_col, group_col, shard, n_tokens) — int shard ids from 0
    per group. Zero-token docs pack too (they consume no budget)."""
    from pyspark.sql import Window

    from diepy_spark.operators.dedup import _ident

    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive: {budget_tokens}")
    _ident(group_col)
    tf = df.select(
        F.col(id_col),
        F.col(group_col),
        F.expr(f"size({tokens_expr(text_col)})").cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return tf.select(
        id_col,
        group_col,
        F.floor((cum - F.col("n_tokens")) / budget_tokens).cast("int").alias("shard"),
        "n_tokens",
    )


def lm_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Unigram language-model scoring (the CCNet-style perplexity quality
    filter, Wenzek et al. 2020, with the simplest possible LM): train a
    corpus unigram model (p = count/total) in one aggregate, then score
    each document by its mean negative log-likelihood and perplexity.
    Low-probability token soup scores high NLL; fluent/common text low.

    Scale: pass 1 is a token-keyed count with map-side combine (the model
    is vocabulary-sized); pass 2 broadcast-joins the model to the exploded
    token stream and re-aggregates per doc. The per-doc log-prob sum folds
    in TOKEN ORDER (sorted struct array -> ordered fold), not aggregation
    order, so the double sum is deterministic and oracle-reproducible.

    Output: (id_col, n_tokens, nll, ppl) — nll = -(1/n) Σ ln p(tok_i)
    rounded to 6, ppl = exp(nll) rounded to 4.
    """
    toks = _token_frame(df, text_col, id_col, min_tokens=1).select(
        F.col(id_col).alias("d"), F.posexplode("toks").alias("i", "tok")
    )
    model = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = model.select(F.sum("cnt").alias("total"))
    probs = model.crossJoin(F.broadcast(total)).select(
        "tok", (F.col("cnt") / F.col("total")).alias("p")
    )
    scored = toks.join(F.broadcast(probs), "tok").select(
        "d", F.struct("i", (-F.log("p")).alias("lp")).alias("s")
    )
    arr = scored.groupBy("d").agg(F.array_sort(F.collect_list("s")).alias("ss"))
    nll = (
        F.expr("aggregate(transform(ss, s -> s.lp), 0.0D, (acc, v) -> acc + v)")
        / F.size("ss")
    )
    return arr.select(
        F.col("d").alias(id_col),
        F.size("ss").alias("n_tokens"),
        F.round(nll, 6).alias("nll"),
        F.round(F.exp(nll), 4).alias("ppl"),
    )


def domain_mix(
    df: DataFrame,
    domain_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Data-mixture report: per (domain, language), document count, total
    word tokens, total characters, and the group's share of all tokens —
    the table a pretraining run uses to set/verify sampling weights per
    source.

    Scale: ONE aggregate shuffle with map-side combine (the token count is
    a per-row expression evaluated before the exchange); the share is a
    window over the GROUPED frame, whose cardinality is |domains|x|langs|
    — trivially single-partition no matter the corpus size."""
    from pyspark.sql import Window

    g = (
        df.select(
            F.col(domain_col).alias("domain"),
            F.col(lang_col).alias("lang"),
            F.expr(f"size({tokens_expr(text_col)})").cast("bigint").alias("_t"),
            F.length(text_col).cast("bigint").alias("_c"),
        )
        .groupBy("domain", "lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("_t").alias("tokens"),
            F.sum("_c").alias("chars"),
        )
    )
    total = F.sum("tokens").over(Window.partitionBy())
    return g.withColumn("token_share", F.round(F.col("tokens") / total, 6))


def char_ngram_profile(
    df: DataFrame,
    n: int = 3,
    top_n: int = 20,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-language character n-gram frequency profile: the top_n most
    frequent character n-grams per language with counts and rank — the
    profile table a trainable language identifier (textcat / CLD-style)
    is built from, and a drift check between corpus snapshots.

    Scale: the n-gram explode multiplies rows by ~doc length, but the
    count aggregate combines map-side, so the ONE shuffle carries
    (lang, gram, partial-count) — bounded by the distinct-gram count per
    task, not corpus size. Top-n per lang is a window over the grouped
    frame (|langs| x |distinct grams| rows, far smaller than the corpus)."""
    from pyspark.sql import Window

    # explode an INDEX sequence and slice in a follow-up projection rather
    # than materializing the per-row n-gram string array: the array form
    # allocates ~doc-length strings per row inside the interpreted HOF and
    # measured ~25% slower at sf0.1
    grams = (
        df.where(F.length(text_col) >= n)
        .select(
            F.col(lang_col).alias("lang"),
            F.col(text_col).alias("_t"),
            F.explode(F.expr(f"sequence(1, length({text_col}) - {n - 1})")).alias("_j"),
        )
        .select("lang", F.expr(f"substring(_t, _j, {n})").alias("gram"))
    )
    counts = grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "gram")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_n)
        .select("lang", "gram", "cnt", "rk")
    )


TFIDF_W_SCALE = 10**6

LANGCLF_SCALE = 10**6


def lang_classify(
    df: DataFrame,
    n: int = 3,
    top_n: int = 64,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TRAINED language identification — the inference step that closes the
    char_ngram_profile loop (that operator builds the feature table; this
    one trains a multinomial Naive Bayes over the same char n-grams and
    applies it): per language, the top_n most frequent n-grams form the
    model vocabulary; add-one-smoothed log-probabilities (plus the class
    log-prior) score each document; argmax predicts. lang_id (stopword
    heuristic) is the zero-training sibling; this is the CLD/fastText-style
    trainable shape.

    Determinism: every model weight is quantized ONCE per (lang, gram) —
    round(ln(p) * SCALE) over a model-sized value set (the idf_int
    pattern, see tfidf_cosine_pairs) — after which doc scores are exact
    integer dot products in both engines; ties break (score desc, lang
    asc).

    Scale design: training is one (lang, gram) count with map-side combine
    (shuffle carries the distinct-gram frame, not the corpus); the model
    grid (|langs| x vocab, with per-lang OOV weight and prior) is a
    BROADCAST — scoring is one narrow pass over the per-doc gram counts
    plus a |langs|-way broadcast nested-loop fan-out, argmax per doc via
    window. The corpus text never shuffles; only (doc, gram hash-sized)
    count rows do. Train-once/apply-everywhere at 100 TB: fit the model on
    a labeled seed corpus, persist the grid, broadcast-apply to the rest.

    Output: (id_col, <lang_col> actual, pred_lang) — one row per document
    with at least one n-gram."""
    from pyspark.sql import Window

    dg = (
        df.where(F.length(text_col) >= n)
        .repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
        .select(
            F.col(id_col).alias("d"),
            F.col(lang_col).alias("_lang"),
            F.col(text_col).alias("_t"),
            F.explode(F.expr(f"sequence(1, length({text_col}) - {n - 1})")).alias("_j"),
        )
        .select("d", "_lang", F.expr(f"substring(_t, _j, {n})").alias("gram"))
        .groupBy("d", "_lang", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lg = dg.groupBy("_lang", "gram").agg(F.sum("cnt").alias("lcnt"))
    wtop = Window.partitionBy("_lang").orderBy(F.col("lcnt").desc(), "gram")
    # The model frame fans out to FIVE consumers (vocab, vsize, tot, the
    # grid join, and through them the broadcast constants); without a
    # lineage cut each consumer re-derives the full corpus gram explode —
    # measured 8 Generate nodes / 28 scans at sf0.1 (5.1 s), collapsing
    # to 2 / a handful (~2x faster) with this |langs| x top_n-row
    # checkpoint (the triangle-count lesson). dg itself stays recomputed
    # by its two consumers — it is corpus-sized, and materializing it is
    # exactly what a 100 TB caller must opt into, not default.
    model = (
        lg.withColumn("rk", F.row_number().over(wtop))
        .where(F.col("rk") <= top_n)
        .select("_lang", "gram", "lcnt")
        .localCheckpoint(eager=False)
    )
    vocab = model.select("gram").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).alias("V"))
    tot = model.groupBy("_lang").agg(F.sum("lcnt").alias("tot"))
    ndocs = df.where(F.length(text_col) >= n).agg(F.count(F.lit(1)).alias("N"))
    docs_l = (
        df.where(F.length(text_col) >= n)
        .groupBy(F.col(lang_col).alias("_lang"))
        .agg(F.count(F.lit(1)).alias("ldocs"))
    )
    # per-lang constants: OOV weight and class prior, quantized once
    lang_consts = (
        tot.join(docs_l, "_lang")
        .crossJoin(F.broadcast(vsize))
        .crossJoin(F.broadcast(ndocs))
        .select(
            "_lang",
            "tot",
            F.round(-F.log(F.col("tot") + F.col("V")) * LANGCLF_SCALE, 0)
            .cast("bigint")
            .alias("w_oov"),
            F.round(F.log(F.col("ldocs") / F.col("N")) * LANGCLF_SCALE, 0)
            .cast("bigint")
            .alias("prior"),
        )
        .localCheckpoint(eager=False)  # |langs| rows, two consumers
    )
    # full langs x vocab grid -> one quantized weight per cell
    grid = (
        lang_consts.select("_lang", "tot")
        .crossJoin(vocab)
        .join(model, ["_lang", "gram"], "left")
        .crossJoin(F.broadcast(vsize))
        .select(
            "_lang",
            "gram",
            F.round(
                F.log((F.coalesce("lcnt", F.lit(0)) + 1) / (F.col("tot") + F.col("V")))
                * LANGCLF_SCALE,
                0,
            )
            .cast("bigint")
            .alias("w"),
        )
    )
    # total grams per doc is a CLOSED FORM of the text length (every
    # position yields one n-gram), so the feature frame is a narrow
    # projection — no dependency on the exploded gram stream, one fewer
    # aggregate consumer of dg
    feats = df.where(F.length(text_col) >= n).select(
        F.col(id_col).alias("d"),
        (F.length(text_col) - F.lit(n - 1)).cast("bigint").alias("n_grams"),
    )
    matched = (
        dg.select("d", "gram", "cnt")
        .join(F.broadcast(grid.select(F.col("_lang").alias("cand"), "gram", "w")), "gram")
        .groupBy("d", "cand")
        .agg(
            F.sum(F.col("cnt") * F.col("w")).alias("mw"),
            F.sum("cnt").alias("nm"),
        )
    )
    scored = (
        feats.crossJoin(
            F.broadcast(lang_consts.select(F.col("_lang").alias("cand"), "w_oov", "prior"))
        )
        .join(matched, ["d", "cand"], "left")
        .select(
            "d",
            "cand",
            (
                F.col("prior")
                + F.coalesce("mw", F.lit(0))
                + (F.col("n_grams") - F.coalesce("nm", F.lit(0))) * F.col("w_oov")
            ).alias("score"),
        )
    )
    wbest = Window.partitionBy("d").orderBy(F.col("score").desc(), F.col("cand").asc())
    pred = (
        scored.withColumn("rk", F.row_number().over(wbest))
        .where(F.col("rk") == 1)
        .select("d", F.col("cand").alias("pred_lang"))
    )
    actual = df.where(F.length(text_col) >= n).select(
        F.col(id_col).alias("d"), F.col(lang_col)
    )
    return actual.join(pred, "d").select(
        F.col("d").alias(id_col), F.col(lang_col), "pred_lang"
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.3,
    max_df_frac: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document-pair cosine similarity over SPARSE tf-idf vectors — the
    lexical near-dup/recommendation measure that complements the dense
    embedding paths (operators/similarity.py). Pairs are generated
    through the token inverted index, so only documents sharing at least
    one (non-ubiquitous) token are ever scored — sub-quadratic like every
    pair path in this repo.

    Determinism: the ONLY float operation in the weight derivation is the
    per-TOKEN idf quantization round(ln(N/df)*SCALE) — a vocabulary-sized
    value set, minimizing exposure to the ROUND(double) boundary hazard
    (see quality_exprs) — after which weights are pure integer floor
    arithmetic: w = (tf_count * idf_int) div doc_total, and the pair dot
    products and norm sums are exact bigints in both engines. The single
    float division happens once per pair at the end. Tokens in more than
    ceil(max_df_frac * N) docs are dropped (stop tokens — they dominate
    Σdf² and carry no signal). The cap is a FRACTION of the corpus, not
    an absolute count, so the operator's semantics are scale-invariant:
    an absolute cap that keeps mid-frequency tokens at 500 docs silently
    empties the index at 5M. Output: (da, db, cos) with da < db,
    cos >= threshold.
    """
    from pyspark.sql import Window

    toks = _token_frame(df, text_col, id_col).select(
        F.col(id_col).alias("d"), F.explode("toks").alias("tok")
    )
    tf = toks.groupBy("d", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    tf = tf.withColumn("tot", F.sum("cnt").over(Window.partitionBy("d")))
    docfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = tf.select(F.countDistinct("d").alias("n_docs"))
    # idf quantized ONCE PER TOKEN (round(x, 0) then cast — a bare
    # double->bigint cast truncates in Spark but rounds in DuckDB)
    idf = (
        docfreq.crossJoin(F.broadcast(n_docs))
        .where(F.col("doc_freq") <= F.ceil(F.lit(max_df_frac) * F.col("n_docs")))
        .select(
            "tok",
            F.round(F.log(F.col("n_docs") / F.col("doc_freq")) * TFIDF_W_SCALE, 0)
            .cast("bigint")
            .alias("idf_int"),
        )
    )
    w = tf.join(idf, "tok").select(
        "d", "tok", F.expr("(cnt * idf_int) div tot").alias("w")
    )
    norms = w.groupBy("d").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    # pre-shuffle both self-join sides on the token -> one reused exchange
    wp = w.repartition(df.sparkSession.sparkContext.defaultParallelism, F.col("tok"))
    a, b = wp.alias("a"), wp.alias("b")
    dots = (
        a.join(b.hint("shuffle_hash"), "tok")
        .where(F.col("a.d") < F.col("b.d"))
        .groupBy(F.col("a.d").alias("da"), F.col("b.d").alias("db"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    na = norms.select(F.col("d").alias("da"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("d").alias("db"), F.col("n2").alias("nb2"))
    return (
        dots.join(na, "da")
        .join(nb, "db")
        .select(
            "da",
            "db",
            F.round(
                F.col("dot") / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2"))), 4
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


GOPHER_MIN_WORDS = 10
GOPHER_MAX_WORDS = 100_000
GOPHER_MEANLEN_LO = 3
GOPHER_MEANLEN_HI = 10
GOPHER_MIN_STOPWORDS = 2
GOPHER_SHORT_LEN = 2
GOPHER_SHORT_MAX_TENTHS = 3  # short-token share <= 0.3


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Rule-based document filter in the style of the Gopher quality
    heuristics (Rae et al. 2021 §A1.1) — the accept/reject sibling of
    quality_score's soft composite: word count within bounds, mean word
    length within [3,10], at least 2 distinct English stopwords, and a
    bounded share of very short tokens. The pre-dedup gate of a training
    pipeline: cheap, per-row, and it removes the machine-generated and
    boilerplate mass BEFORE the expensive dedup/similarity stages.

    Every rule is an INTEGER comparison — mean bounds cross-multiplied
    (sum_len >= 3*n), shares in tenths (10*n_short <= 3*n) — so flags
    are hash-exact in any engine, with no division anywhere.

    Scale: one narrow projection over the corpus scan (the token array
    materializes once per row, HOF folds only) — zero shuffle.

    Output: (id_col, *passthrough, n_tokens, r_wordcount, r_meanlen,
    r_stopwords, r_shorttok, keep) with rules as 0/1 ints and keep their
    conjunction; `passthrough` names input columns carried along so a
    downstream rollup needs no join back to the corpus.
    """
    tf = _token_frame(
        df, text_col, id_col, *[F.col(c) for c in passthrough], min_tokens=1
    )
    en_list = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    n_tok = F.expr("size(toks)")
    sum_len = F.expr("aggregate(transform(toks, x -> length(x)), 0, (a, v) -> a + v)")
    n_short = F.expr(
        f"size(filter(toks, x -> length(x) <= {GOPHER_SHORT_LEN}))"
    )
    n_stop_d = F.expr(f"size(filter(array_distinct(toks), x -> x in ({en_list})))")
    feats = tf.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        n_tok.alias("n_tokens"),
        sum_len.alias("sum_len"),
        n_short.alias("n_short"),
        n_stop_d.alias("n_stop_d"),
    )
    r_wc = (F.col("n_tokens") >= GOPHER_MIN_WORDS) & (
        F.col("n_tokens") <= GOPHER_MAX_WORDS
    )
    r_ml = (F.col("sum_len") >= GOPHER_MEANLEN_LO * F.col("n_tokens")) & (
        F.col("sum_len") <= GOPHER_MEANLEN_HI * F.col("n_tokens")
    )
    r_st = F.col("n_stop_d") >= GOPHER_MIN_STOPWORDS
    r_sh = 10 * F.col("n_short") <= GOPHER_SHORT_MAX_TENTHS * F.col("n_tokens")
    return feats.select(
        id_col,
        *passthrough,
        "n_tokens",
        r_wc.cast("int").alias("r_wordcount"),
        r_ml.cast("int").alias("r_meanlen"),
        r_st.cast("int").alias("r_stopwords"),
        r_sh.cast("int").alias("r_shorttok"),
        (r_wc & r_ml & r_st & r_sh).cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016 — the public byte-pair
# encoding algorithm for subword vocabularies). No reference counterpart
# (`/root/reference/diepy/core.py` has no text operators); mandated by the
# north-star LLM-data-pipeline surface.

# One merge round's fold step — shared TEXT between Spark (`aggregate`)
# and any engine with a list fold (DuckDB `list_reduce` in the declared
# oracle). Walking the word left to right with accumulator string acc
# (tokens joined by ' ', leading separator kept during the fold), pair
# (a, b) fuses by appending b exactly when the trailing token IS a: the
# boundary check `right(acc, length(a)+1) = ' '||a` can only match a
# whole token (tokens never contain the separator), and a just-fused
# token 'ab' no longer equals a — greedy left-to-right, non-overlapping,
# the reference BPE merge semantics.
BPE_STEP = (
    "CASE WHEN s = b AND right(acc, length(a) + 1) = (' ' || a) "
    "THEN acc || b ELSE acc || ' ' || s END"
)


def bpe_merge_table(words: DataFrame, n_merges: int) -> DataFrame:
    """Learn a BPE merge table from a word-TYPE frequency dictionary
    ``words`` (columns ``w`` string, ``n`` count). Per round: (1) count
    adjacent symbol pairs weighted by type frequency, (2) take the
    argmax — count desc, then pair text asc (the ' ' separator sorts
    below all token characters, so pair-string order equals (a, b)
    tuple order: the DETERMINISTIC tie-break), (3) fuse that pair in
    every word via the BPE_STEP string fold, (4) repeat. Returns the
    ordered merge table (step, a, b, merged, cnt) with n_merges rows.

    Scale shape: callers collapse the corpus to the dictionary first
    (one shuffle — vocabulary-sized ever after, why real BPE trainers
    run on frequency dicts); each round is one vocab-sized pair count +
    a 1-row broadcast argmax + a map-only fold, with per-round
    localCheckpoint lineage cuts (each dictionary feeds two consumers:
    the next pair count and the merge projection)."""
    w = words.selectExpr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1)) AS syms",
        "n",
    ).localCheckpoint(eager=False)
    merges = []
    for step in range(1, n_merges + 1):
        p = (
            w.where("size(syms) >= 2")
            .selectExpr(
                "explode(transform(sequence(1, size(syms) - 1),"
                " j -> concat(element_at(syms, j), ' ', element_at(syms, j + 1))))"
                " AS pr",
                "n",
            )
            .groupBy("pr")
            .agg(F.sum("n").alias("cnt"))
        )
        m = (
            p.orderBy(F.col("cnt").desc(), "pr")
            .limit(1)
            .selectExpr(
                "element_at(split(pr, ' '), 1) AS a",
                "element_at(split(pr, ' '), 2) AS b",
                "cnt",
            )
            .localCheckpoint(eager=False)  # feeds w_{i} AND the output union
        )
        merges.append(
            m.selectExpr(
                f"CAST({step} AS INT) AS step",
                "a",
                "b",
                "a || b AS merged",
                "CAST(cnt AS BIGINT) AS cnt",
            )
        )
        w = (
            w.crossJoin(F.broadcast(m.select("a", "b")))
            .selectExpr(
                f"split(substring(aggregate(syms, '', (acc, s) -> {BPE_STEP}),"
                " 2), ' ') AS syms",
                "n",
            )
            .localCheckpoint(eager=False)  # per-round lineage cut
        )
    out = merges[0]
    for mm in merges[1:]:
        out = out.unionByName(mm)
    return out.orderBy("step")


def bpe_step_lit(a: str, b: str) -> str:
    """BPE_STEP with the pair inlined as SQL literals — the ENCODE-side
    form: applying an already-learned merge table needs no per-round
    argmax frame, just the fold with (a, b) baked in. Tokens here are
    [a-z0-9]+ concatenations, so bare single-quoting is safe."""
    return (
        f"CASE WHEN s = '{b}' AND right(acc, {len(a) + 1}) = (' ' || '{a}') "
        f"THEN acc || '{b}' ELSE acc || ' ' || s END"
    )


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]], col: str = "syms") -> DataFrame:
    """Apply a learned merge table (ordered (a, b) pairs) to a symbol
    array column — the TOKENIZE step: each merge is one fold over the
    current symbols, applied in training order (BPE inference is exactly
    replaying the merge history). All merges inline as literal folds in
    one projection — zero shuffles, zero joins: the merge table is
    driver-sized by definition (it IS the vocabulary)."""
    out = df
    for a, b in merges:
        out = out.withColumn(
            col,
            F.expr(
                f"split(substring(aggregate({col}, '',"
                f" (acc, s) -> {bpe_step_lit(a, b)}), 2), ' ')"
            ),
        )
    return out


def bpe_oov_report(enc: DataFrame, vocab: DataFrame) -> DataFrame:
    """Held-out tokenizer evaluation: per-language token/char/piece
    volumes, the compression the learned subword vocabulary achieves
    over the character baseline (chars_per_piece — the char baseline
    is exactly 1.0 by definition), and the OOV-piece rate against the
    trained symbol vocabulary.

    ``enc``: an encoded word-TYPE dictionary (lang, n type-frequency,
    chars, syms pieces — the output of :func:`bpe_encode`). ``vocab``:
    one string column ``v`` holding every trained symbol (training
    alphabet + merged pieces). A piece outside ``vocab`` is OOV — with
    a character-level base alphabet that is exactly a held-out
    character never seen in training.

    Scale shape: ``vocab`` is vocabulary-sized by definition and rides
    a broadcast hash join against the exploded piece dictionary
    (dictionary-sized x <=16 pieces — never corpus-sized); callers
    should localCheckpoint ``enc`` (it feeds both aggregates). Counts
    are exact integers; the two ratios are single divisions at the
    end."""
    pieces = enc.select("lang", "n", F.explode("syms").alias("piece"))
    j = pieces.join(F.broadcast(vocab), pieces.piece == vocab.v, "left")
    by_piece = j.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("n_pieces"),
        F.sum(F.expr("CASE WHEN v IS NULL THEN n ELSE 0 END"))
        .cast("bigint")
        .alias("oov_pieces"),
    )
    by_word = enc.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.sum(F.expr("chars * n")).cast("bigint").alias("n_chars"),
    )
    return by_word.join(by_piece, "lang").selectExpr(
        "lang",
        "n_tokens",
        "n_chars",
        "n_pieces",
        "oov_pieces",
        "round(CAST(n_chars AS DOUBLE) / CAST(n_pieces AS DOUBLE), 4)"
        " AS chars_per_piece",
        "round(CAST(oov_pieces AS DOUBLE) / CAST(n_pieces AS DOUBLE), 6)"
        " AS oov_rate",
    )


# --- Unigram-LM tokenizer (SentencePiece-style, Kudo 2018 "Subword
# Regularization" — the public algorithm), hard-EM (Viterbi-EM)
# variant. The driver-side trainer below runs on the COLLECTED top-K
# word-type dictionary (SentencePiece itself trains on a capped
# sentence sample); the distributed encode in plans/extended.py
# replays the learned integer score table exactly.

UNI_MAX_PIECE = 4          # max piece length considered
UNI_VOCAB = 40             # multi-char pieces kept in the seed vocab
UNI_MISS = -(10**12)       # score for a piece outside the vocabulary

# Integer log-quantization ladder: score(f, T) = -#{k : f <= (T*2^30)
# div R_k} with R_k = round(2^(k/UNI_MU) * 2^30) — i.e. -floor-ish of
# UNI_MU*log2(T/f) computed by EXACT integer comparisons against
# rational rungs (no ln/pow ever runs inside either engine, so
# cross-engine float drift is impossible by construction). UNI_MU=64
# gives 1/64-bit resolution; UNI_OCTAVES bounds the ladder (scores
# saturate at -UNI_MU*UNI_OCTAVES — the standard min-prob floor).
# Bound: T * 2^30 must stay under 2^63, i.e. T < 8.6e9 total piece
# occurrences; beyond that drop UNI_SHIFT (and rescale R_k) — the
# rungs stay exact at any scale.
UNI_MU = 64
UNI_OCTAVES = 23
UNI_SHIFT = 1 << 30
UNI_LADDER: list[int] = [
    round(2 ** (k / UNI_MU) * UNI_SHIFT)
    for k in range(1, UNI_MU * UNI_OCTAVES + 1)
]

# Viterbi state packing: c = s*64 - np (s = summed integer score, np =
# piece count <= 16 < 64). max(c) is exactly lexicographic max on
# (s, -np), and the DP transition collapses to c_j + score*64 - 1 —
# one BIGINT per cell, portable verbatim to Spark SQL and DuckDB.
UNI_PACK = 64


def unigram_score_from_freq(freq: int, total: int) -> int:
    """The ladder quantization, driver-side mirror of the SQL filter-
    count expression: -#{k: freq <= (total * UNI_SHIFT) div R_k}."""
    ts = total * UNI_SHIFT
    return -sum(1 for r in UNI_LADDER if freq <= ts // r)


def unigram_seed(words: list[tuple[str, int]]) -> dict[str, int]:
    """Seed vocabulary from a word-type frequency dictionary: every
    substring of length 1..UNI_MAX_PIECE with occurrence-weighted
    frequency; all single chars kept (coverage requirement), plus the
    top UNI_VOCAB multi-char pieces by (freq desc, piece) — the same
    selection x5_unigram_train declares and hash-checks."""
    freq: dict[str, int] = {}
    for w, n in words:
        L = len(w)
        for i in range(L):
            for k in range(1, min(UNI_MAX_PIECE, L - i) + 1):
                p = w[i : i + k]
                freq[p] = freq.get(p, 0) + n
    single = {p: f for p, f in freq.items() if len(p) == 1}
    multi = sorted(
        ((p, f) for p, f in freq.items() if len(p) > 1),
        key=lambda pf: (-pf[1], pf[0]),
    )[:UNI_VOCAB]
    out = dict(single)
    out.update(dict(multi))
    return out


def unigram_scores(pieces: dict[str, int]) -> dict[str, int]:
    """Integer ladder-quantized log-probs (unigram_score_from_freq)
    for a piece-frequency table — identical arithmetic to the SQL
    expression both engines run, so the Python EM layer and the
    declared encode query share one score definition."""
    total = sum(pieces.values())
    return {p: unigram_score_from_freq(f, total) for p, f in pieces.items()}


def unigram_viterbi(word: str, scores: dict[str, int]) -> tuple[int, list[str]]:
    """Best segmentation under the packed-integer DP (the exact rule
    the SQL encode replays): returns (packed c for best[L], pieces).
    Backtrace tie-break: smallest k wins among equal packed values —
    only the M-step counts see the backtrace; the declared queries
    consume only the packed value, which is tie-free by construction."""
    L = len(word)
    best = [0] + [None] * L
    back = [0] * (L + 1)
    for i in range(1, L + 1):
        bc, bk = None, None
        for k in range(1, min(UNI_MAX_PIECE, i) + 1):
            s = scores.get(word[i - k : i], UNI_MISS)
            c = best[i - k] + s * UNI_PACK - 1
            if bc is None or c > bc:
                bc, bk = c, k
        best[i], back[i] = bc, bk
    pieces = []
    i = L
    while i > 0:
        k = back[i]
        pieces.append(word[i - k : i])
        i -= k
    return best[L], pieces[::-1]


def unigram_train_em(
    words: list[tuple[str, int]], iters: int = 2
) -> list[tuple[str, int]]:
    """Hard-EM (Viterbi-EM) unigram trainer: E-step segments every
    word type under the current integer scores; M-step re-estimates
    piece frequencies from the segmentations (type-frequency
    weighted), dropping multi-char pieces that won no occurrences
    (the pruning step) and flooring every observed single char at
    count 1 (character coverage — SentencePiece's required-char set).
    Deterministic end to end: integer scores, deterministic DP
    tie-break, sorted iteration. Returns the final score table sorted
    by (score desc, piece)."""
    pieces = unigram_seed(words)
    alphabet = {p for p in pieces if len(p) == 1}
    for _ in range(iters):
        scores = unigram_scores(pieces)
        counts: dict[str, int] = {}
        for w, n in sorted(words):
            for p in unigram_viterbi(w, scores)[1]:
                counts[p] = counts.get(p, 0) + n
        pieces = {p: c for p, c in counts.items() if c > 0}
        for ch in sorted(alphabet):
            pieces.setdefault(ch, 1)
    final = unigram_scores(pieces)
    return sorted(final.items(), key=lambda ps: (-ps[1], ps[0]))


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (round 9) — the lexical baseline every
# hybrid-search / hard-negative-mining pipeline starts from.
# Robertson & Zaragoza 2009 ("The Probabilistic Relevance Framework:
# BM25 and Beyond"); the nonnegative idf variant ln((N+1)/(df+0.5)) is
# the one Lucene ships.  Beyond-reference surface (SURVEY §2.6) — the
# reference engine (core.py) has no retrieval operator.
# ---------------------------------------------------------------------------

BM25_IDF_SCALE = 10**6

# k1 = 1.2 and b = 0.75 folded into INTEGER formula texts shared
# verbatim by the Spark plan and the DuckDB oracle ({d} = the engine's
# integer-div spelling: `div` Spark, `//` DuckDB):
#
#   score_t = idf * (k1+1)*tf / (tf + k1*(1 - b + b*dl/avgdl))
#           = idf * 2200*tf / (1000*tf + 300 + 900000*dl/avg_milli)
#
# avgdl is quantized ONCE per corpus to milli-tokens (round-half-up of
# 1000*T/N), the per-doc length norm kd once per doc, the idf once per
# token (ln of an integer rational, the x3_tfidf_cosine_pairs idiom) —
# after which every per-(query,term,doc) partial score is one exact
# BIGINT floor division and the per-(query,doc) total is an exact
# BIGINT sum (order-independent, no float accumulation anywhere).
_BM_AVG_MILLI = "(2000 * t_toks + n_docs) {d} (2 * n_docs)"
_BM_KD = "300 + (1800000 * dl + avg_milli) {d} (2 * avg_milli)"
_BM_IDF = (
    "CAST(round(ln(CAST(2 * n_docs + 2 AS DOUBLE)"
    " / CAST(2 * df + 1 AS DOUBLE)) * {scale}, 0) AS BIGINT)"
)
_BM_SCORE_T = "(idf_int * 2200 * cnt) {d} (1000 * cnt + kd)"


def bm25_topk(
    df: DataFrame,
    n_queries: int = 8,
    n_qterms: int = 12,
    k: int = 10,
    min_len: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 "more-like-this" ranked retrieval: the `n_queries` smallest
    doc ids with >= min_len tokens act as probe queries, each reduced
    to its `n_qterms` RAREST distinct tokens (global df asc, token asc
    — a realistic keyword query, and the bound that keeps candidate
    generation sub-corpus); every other document sharing at least one
    query term is scored with exact-integer BM25 (see _BM_* texts) and
    the top k per query returned.

    Scale shape (the Lucene architecture in DataFrame form): ONE
    tokenize+explode pass builds the postings frame (d, tok, cnt) —
    checkpointed, it IS the inverted index a production pipeline
    persists; doc-length norms kd are joined in once, co-keyed on d,
    exactly as Lucene stores the length norm inside the index. The
    query side (n_queries x n_qterms rows) and the corpus-constant
    frame are BROADCAST, so retrieval is a map-side probe of the
    postings — the corpus never shuffles at query time. Candidates are
    bounded by sum(df) over the chosen rare terms, not by corpus size.

    Output: (query_id, rk, {id_col}, score_x1e6) — score at idf scale
    1e6, an exact BIGINT."""
    from pyspark.sql import Window

    par = df.sparkSession.sparkContext.defaultParallelism
    toks = _token_frame(df, text_col, id_col).select(
        F.col(id_col).alias("d"), F.explode("toks").alias("tok")
    )
    tf = (
        toks.groupBy("d", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)  # the persisted postings index
    )
    dl = tf.groupBy("d").agg(F.sum("cnt").cast("bigint").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("t_toks"),
    ).selectExpr(
        "n_docs",
        "t_toks",
        _BM_AVG_MILLI.format(d="div") + " AS avg_milli",
    )  # 1 row
    dfreq = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    idf = dfreq.crossJoin(
        F.broadcast(corpus.select("n_docs"))
    ).selectExpr(
        "tok", "df",
        _BM_IDF.format(scale=BM25_IDF_SCALE) + " AS idf_int",
    )
    kd = dl.crossJoin(F.broadcast(corpus.select("avg_milli"))).selectExpr(
        "d", _BM_KD.format(d="div") + " AS kd"
    )
    probes = (
        dl.where(F.col("dl") >= min_len)
        .orderBy("d")
        .limit(n_queries)
        .select(F.col("d").alias("q"))
    )
    wq = Window.partitionBy("q").orderBy(
        F.col("df").asc(), F.col("tok").asc()
    )
    qt = (
        tf.join(F.broadcast(probes), tf["d"] == F.col("q"))
        .join(idf, "tok")
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_qterms)
        .select("q", "tok", "idf_int")
        .localCheckpoint(eager=False)  # bounded: n_queries * n_qterms
    )
    idx = tf.join(kd, "d")  # postings + length norm, co-keyed on d
    cand = idx.join(F.broadcast(qt), "tok").where(F.col("d") != F.col("q"))
    tot = (
        cand.selectExpr("q", "d", _BM_SCORE_T.format(d="div") + " AS s")
        .groupBy("q", "d")
        .agg(F.sum("s").cast("bigint").alias("score_x1e6"))
    )
    w = Window.partitionBy("q").orderBy(
        F.col("score_x1e6").desc(), F.col("d").asc()
    )
    return (
        tot.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            F.col("q").alias("query_id"),
            "rk",
            F.col("d").alias(id_col),
            "score_x1e6",
        )
    )


# --- Query-likelihood (Dirichlet-smoothed LM) retrieval ---------------------
# Ponte & Croft 1998 / Zhai & Lafferty 2001: score(q,d) =
# sum_{t in q} ln p(t|d) with p(t|d) = (tf + mu*cf_t/T) / (dl + mu)
# = (tf*T + mu*cf_t) / (T*(dl + mu)).  Every ln argument is an exact
# BIGINT, each ln is rounded ONCE at 9 decimals and carried as integer
# NANOS (DECIMAL(18,9) * 1e9 -> BIGINT), so scores, ranking, and the
# output column are integer-exact cross-engine (the entropy idiom,
# hardened to a fully integer output).  Missing query terms contribute
# the background ln(mu*cf_t) - ln(T*(dl+mu)), folded in as a per-query
# constant qc9 minus nq*lnd9, so candidates still come ONLY from the
# postings of present terms (the WAND-style bound BM25 uses).
QL_MU = 100  # Dirichlet pseudo-count, sized to the fixture's ~1e2-token docs
_QL_LN9 = (
    "CAST(CAST(round(ln(CAST({a} AS DOUBLE)), 9) AS DECIMAL(28,9))"
    " * 1000000000 AS BIGINT)"
)


def ql_topk(
    df: DataFrame,
    n_queries: int = 8,
    n_qterms: int = 12,
    k: int = 10,
    min_len: int = 20,
    mu: int = QL_MU,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dirichlet query-likelihood "more-like-this" retrieval — the
    classical LM counterpart of bm25_topk (same probe-query and
    candidate discipline, so the two rankers are directly comparable
    query-for-query). Output: (query_id, rk, {id_col}, score_x1e9),
    score in integer ln-nanos (more negative = less likely).

    Scale shape: identical to bm25_topk — ONE tokenize pass builds
    the checkpointed postings frame; corpus stats and the
    n_queries x n_qterms query frame broadcast; candidates are
    bounded by sum(df) over the rare probe terms; the per-doc length
    norm lnd9 joins co-keyed on d. The corpus never shuffles at
    query time."""
    from pyspark.sql import Window

    toks = _token_frame(df, text_col, id_col).select(
        F.col(id_col).alias("d"), F.explode("toks").alias("tok")
    )
    tf = (
        toks.groupBy("d", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)  # the persisted postings index
    )
    dl = tf.groupBy("d").agg(F.sum("cnt").cast("bigint").alias("dl"))
    corpus = dl.agg(
        F.sum("dl").cast("bigint").alias("t_toks")
    )  # 1 row
    cf = tf.groupBy("tok").agg(
        F.sum("cnt").cast("bigint").alias("cf"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
    )
    probes = (
        dl.where(F.col("dl") >= min_len)
        .orderBy("d")
        .limit(n_queries)
        .select(F.col("d").alias("q"))
    )
    wq = Window.partitionBy("q").orderBy(
        F.col("df").asc(), F.col("tok").asc()
    )
    qt = (
        tf.join(F.broadcast(probes), tf["d"] == F.col("q"))
        .join(cf, "tok")
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_qterms)
        .select("q", "tok", "cf")
        .localCheckpoint(eager=False)  # bounded: n_queries * n_qterms
    )
    qconst = qt.selectExpr(
        "q", _QL_LN9.format(a=f"{mu} * cf") + " AS l"
    ).groupBy("q").agg(
        F.sum("l").cast("bigint").alias("qc9"),
        F.count(F.lit(1)).cast("bigint").alias("nq"),
    )
    lnd = dl.crossJoin(F.broadcast(corpus)).selectExpr(
        "d", _QL_LN9.format(a=f"t_toks * (dl + {mu})") + " AS lnd9"
    )
    cand = (
        tf.join(F.broadcast(qt), "tok")
        .where(F.col("d") != F.col("q"))
        .crossJoin(F.broadcast(corpus))
        .selectExpr(
            "q", "d",
            _QL_LN9.format(a=f"cnt * t_toks + {mu} * cf")
            + " - " + _QL_LN9.format(a=f"{mu} * cf") + " AS delta9",
        )
        .groupBy("q", "d")
        .agg(F.sum("delta9").cast("bigint").alias("sd9"))
    )
    scored = (
        cand.join(lnd, "d")
        .join(F.broadcast(qconst), "q")
        .selectExpr("q", "d", "qc9 + sd9 - nq * lnd9 AS score_x1e9")
    )
    w = Window.partitionBy("q").orderBy(
        F.col("score_x1e9").desc(), F.col("d").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            F.col("q").alias("query_id"),
            "rk",
            F.col("d").alias(id_col),
            "score_x1e9",
        )
    )
