"""Round-6 operator units: BPE merge-table training (greedy fold
semantics, deterministic tie-breaks, weighted pair counts) and the
two-pass SPRT block-cumsum decomposition."""

from __future__ import annotations


def _merge_table(spark, word_counts, n_merges):
    from diepy_spark.operators.text import bpe_merge_table

    words = spark.createDataFrame(word_counts, "w string, n bigint")
    return [
        (r["step"], r["a"], r["b"], r["merged"], r["cnt"])
        for r in bpe_merge_table(words, n_merges).collect()
    ]


def test_bpe_greedy_left_to_right_nonoverlapping(spark):
    # 'aaaa' has three overlapping (a,a) pairs (counted like the
    # reference get_stats), but the MERGE fuses greedily left-to-right:
    # [a,a,a,a] -> [aa,aa], never [a,aa,a].
    got = _merge_table(spark, [("aaaa", 1)], 2)
    assert got == [
        (1, "a", "a", "aa", 3),
        (2, "aa", "aa", "aaaa", 1),
    ]


def test_bpe_tiebreak_is_pair_text_order(spark):
    # 'ab' and 'ba' tie at count 2: the winner must be the
    # lexicographically smaller pair string 'a b' — deterministic, and
    # identical to (a, b) tuple order since ' ' sorts below [a-z0-9].
    got = _merge_table(spark, [("ab", 2), ("ba", 2)], 1)
    assert got == [(1, "a", "b", "ab", 2)]


def test_bpe_counts_weighted_by_type_frequency(spark):
    # (l,o) appears once in 'lol' x3 = 3 and once in 'lo' x2 = 2 -> 5;
    # (o,l) only in 'lol' -> 3. Merge 2 then fuses lo+l.
    got = _merge_table(spark, [("lol", 3), ("lo", 2)], 2)
    assert got[0] == (1, "l", "o", "lo", 5)
    assert got[1] == (2, "lo", "l", "lol", 3)


def test_bpe_multichar_tokens_never_fuse_across_boundaries(spark):
    # Round 1 merges (a,b): 'abc' becomes [ab, c]. Round 2 merges (b,c)
    # (from 'zbc'); applying it to [ab, c] must NOT fuse — the trailing
    # token is 'ab', not 'b', even though the accumulator string ends in
    # 'b'. A suffix check without the token boundary would corrupt
    # [ab, c] into [abc] and erase round 3's (ab,c)... pair.
    got = _merge_table(spark, [("ab", 9), ("abc", 1), ("zbc", 5)], 3)
    assert got == [
        (1, "a", "b", "ab", 10),
        (2, "b", "c", "bc", 5),
        (3, "z", "bc", "zbc", 5),
    ]


def test_sprt_block_cumsum_matches_sequential(spark):
    # The (n, c) walk from the 32-block decomposition must equal the
    # sequential cumulative counts in user_id order exactly.
    import __spark_entry__ as entrymod

    df = entrymod.queries()["x8_sprt"](spark, "/root/testdata/sf0.001")
    row = df.collect()[0]
    assert set(df.columns) == {"decision", "n_stop", "llr_at_stop", "total_n"}
    assert row["total_n"] > 0 and 1 <= row["n_stop"] <= row["total_n"]


SF = "/root/testdata/sf0.001"


def _q(name):
    import __spark_entry__ as entrymod

    return entrymod.queries()[name]


def test_fdr_bh_adjustment_invariants(spark):
    # BH adjusted p must be the suffix-min of p*m/rank clamped to 1:
    # per row p_adj >= p_value, the sequence is non-decreasing in rank,
    # and reject flags exactly p_adj <= 0.10.
    rows = _q("x8_fdr_bh")(spark, SF).collect()
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
    prev = 0.0
    for r in rows:
        assert r["p_adj"] >= r["p_value"] - 1e-9
        assert r["p_adj"] >= prev - 1e-9  # monotone after suffix-min
        prev = r["p_adj"]
        assert r["reject"] == (1 if r["p_adj"] <= 0.10 else 0)
        assert 0.0 <= r["p_value"] <= 1.0 and r["p_adj"] <= 1.0


def test_mutual_info_bounds(spark):
    # 0 <= MI <= min(Hx, Hy) (information inequality) and NMI in [0,1];
    # n_rows must equal the orders rowcount for every pair.
    from diepy_spark.sources.registry import load_table

    n = load_table(spark, SF, "orders").count()
    rows = _q("x12_mutual_info")(spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_rows"] == n
        assert -1e-9 <= r["mi"] <= min(r["hx"], r["hy"]) + 1e-6
        assert -1e-9 <= r["nmi"] <= 1.0 + 1e-9


def test_zipf_fit_shape(spark):
    # Natural-ish text: slope negative, R^2 in (0, 1], fit uses at most
    # ZIPF_TOP ranks and never more than the language's vocabulary.
    from diepy_spark.plans.extended import ZIPF_TOP

    rows = _q("x5_zipf")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["slope"] < 0
        assert 0.0 < r["r2"] <= 1.0 + 1e-9
        assert r["k_fit"] <= min(ZIPF_TOP, r["vocab"])
        assert r["total_tok"] >= r["vocab"]


def test_epoch_plan_arithmetic(spark):
    # Weights sum to 1; epochs is the ceiling of desired/available;
    # realized caps at EPOCH_MAX epochs; deficit is the exact remainder.
    import math

    from diepy_spark.plans.extended import EPOCH_MAX

    rows = _q("x10_epoch_plan")(spark, SF).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r["epochs_need"] == math.ceil(r["desired_tokens"] / r["tokens"])
        assert r["epochs"] == min(r["epochs_need"], EPOCH_MAX)
        assert r["realized_tokens"] == min(
            r["desired_tokens"], EPOCH_MAX * r["tokens"]
        )
        assert r["deficit"] == r["desired_tokens"] - r["realized_tokens"]
        assert r["deficit"] >= 0


def test_bloom_dedup_no_false_negatives(spark):
    # Every exact duplicate must bloom-pass (no false negatives by
    # construction); the FP rate is a valid fraction of true uniques.
    rows = _q("x1_bloom_dedup")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["exact_dup"] <= r["bloom_pass"] <= r["arrived"]
        assert r["false_pos"] == r["bloom_pass"] - r["exact_dup"]
        if r["arrived"] > r["exact_dup"]:
            assert 0.0 <= r["fp_rate"] <= 1.0


def test_late_audit_consistent_with_late_query(spark):
    # Cross-query invariant: the audit's emitted_rows equals the row
    # total of the emitted windows in x7_stream_late, and the engine
    # cannot have emitted + dropped more groups than rows arrived.
    import pyspark.sql.functions as F

    late = _q("x7_stream_late")(spark, SF)
    emitted = late.agg(F.sum("c")).collect()[0][0]
    audit = _q("x7_stream_late_audit")(spark, SF).collect()[0]
    assert audit["emitted_rows"] == emitted
    assert audit["dropped_late"] >= 1  # the late path actually fired
    assert audit["emitted_rows"] + audit["dropped_late"] <= audit["arrived"]


def test_stream_resume_matches_tumbling_and_uses_sink_log(spark):
    # The resumed two-life run must agree with the uninterrupted
    # streaming replay (same windows, same counts), and the sink must
    # carry the _spark_metadata transaction log that makes the
    # two-query parquet output read exactly-once.
    import os as _os

    from diepy_spark.plans import pipeline as P

    resume = {
        (r["w"], r["event_type"]): r["c"]
        for r in _q("x7_stream_resume")(spark, SF).collect()
    }
    tumbling = {
        (r["w"], r["event_type"]): r["c"]
        for r in _q("x7_stream_tumbling")(spark, SF).collect()
    }
    assert resume == tumbling
    outd = P._scratch_cache[("stream-resume", SF)]
    assert _os.path.isdir(_os.path.join(outd, "_spark_metadata"))


def test_cms_span_tier_is_conservative(spark):
    # The CMS guarantee: estimates never fall below truth, so the
    # sketch tier can over-strip but never miss a true heavy gram.
    r = _q("x1_cms_span_dedup")(spark, SF).collect()[0]
    assert r["missed"] == 0
    assert r["cms_flagged"] >= r["exact_dups"]
    assert r["extra_stripped"] == r["cms_flagged"] - r["exact_dups"]
    assert 0.0 <= r["slack_rate"] <= 1.0


def test_delta_method_se_positive_and_ratio_consistent(spark):
    # Ratios must equal the cohort sums' quotient; delta-method SEs are
    # strictly positive and finite for non-degenerate cohorts.
    import math

    r = _q("x8_delta_method")(spark, SF).collect()[0]
    assert r["n_a"] > 1 and r["n_b"] > 1
    for c in ("se_a", "se_b"):
        assert r[c] > 0 and math.isfinite(r[c])
    assert abs(r["diff"] - round(r["ratio_a"] - r["ratio_b"], 6)) <= 1e-6


def test_stream_hll_tracks_exact_distinct(spark):
    # The streaming sketch must land within the m=64 HLL error envelope
    # of the exact per-window distinct count (~13% sigma; assert 3x).
    import pyspark.sql.functions as F

    from diepy_spark.sources.registry import load_table

    got = {r["w"]: r["hll_users"] for r in _q("x7_stream_hll")(spark, SF).collect()}
    exact = {
        r["w"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("w"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got, "no windows emitted"
    checked = 0
    for w, est in got.items():
        n = exact[w]
        assert abs(est - n) <= max(3, 0.40 * n), (w, est, n)
        checked += 1
    assert checked == len(got)


def test_filtered_ann_is_prefiltered(spark):
    # Pre-filter semantics: every query returns exactly TOPK_K rows and
    # no neighbor shares the query's label.
    from diepy_spark.plans.extended import TOPK_K, TOPK_QUERY_MAX

    rows = _q("x3_filtered_ann")(spark, SF).collect()
    per_q = {}
    for r in rows:
        assert r["ql"] != r["cl"]
        per_q.setdefault(r["qid"], []).append(r["rk"])
    assert len(per_q) == TOPK_QUERY_MAX
    for qid, rks in per_q.items():
        assert sorted(rks) == list(range(1, TOPK_K + 1))


def test_cdc_apply_semantics_micro(spark):
    # Micro-fixture nailing all three semantics at once: latest seq
    # wins over earlier updates AND deletes; a winning delete removes
    # the key; untouched keys carry through unchanged.
    from diepy_spark.operators.merge import apply_changelog

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0), (5, 50.0)],
        "k bigint, v double",
    )
    log = spark.createDataFrame(
        [
            (1, 11.0, "U", 1),  # plain update
            (2, 0.0, "D", 2),   # delete wins (only entry)
            (3, 31.0, "U", 1),  # ...but a later delete kills it
            (3, 0.0, "D", 5),
            (4, 41.0, "U", 1),  # delete at 2, then a LATER update revives
            (4, 0.0, "D", 2),
            (4, 42.0, "U", 7),
        ],
        "k bigint, v double, op string, seq bigint",
    )
    got = {
        r["k"]: r["v"]
        for r in apply_changelog(base, log, ["k"], "seq", "op").collect()
    }
    assert got == {1: 11.0, 4: 42.0, 5: 50.0}


def test_tost_verdict_consistent_with_z_stats(spark):
    # The rendered verdict must agree with the rendered one-sided z's
    # (tolerating the 4-dp render at the boundary), the Welch SE must be
    # positive, and diff must equal the mean difference.
    import math

    r = _q("x8_tost")(spark, SF).collect()[0]
    assert r["n_a"] > 1 and r["n_b"] > 1
    assert r["se"] > 0 and math.isfinite(r["se"])
    assert abs(r["diff"] - round(r["mean_a"] - r["mean_b"], 3)) <= 2e-3
    zc = 1.6448536269514722
    if min(r["z_low"], r["z_high"]) > zc + 1e-3:
        assert r["equivalent"] == 1
    if min(r["z_low"], r["z_high"]) < zc - 1e-3:
        assert r["equivalent"] == 0


def test_psi_terms_nonnegative_and_counts_partition(spark):
    # Every PSI term is >= 0 ((q-p) and ln(q/p) always share sign), the
    # headline equals the bin-ordered term sum, and the bin counts
    # partition each period exactly.
    from diepy_spark.plans.extended import PSI_NBINS
    from diepy_spark.sources.registry import load_table

    rows = _q("x12_psi")(spark, SF).collect()
    assert [r["bin"] for r in rows] == list(range(PSI_NBINS))
    n_orders = load_table(spark, SF, "orders").count()
    assert sum(r["n_base"] + r["n_new"] for r in rows) == n_orders
    for r in rows:
        assert r["psi_term"] >= -1e-6, r
    assert rows[0]["psi"] >= 0
    assert abs(rows[0]["psi"] - sum(r["psi_term"] for r in rows)) <= 1e-4


def test_embedding_drift_render_matches_integer_anchor(spark):
    # The rendered shift must be the single sqrt/divide chain over the
    # exact integer anchor columns, and every label reports both halves.
    import math

    from diepy_spark.plans.extended import KM_SCALE

    rows = _q("x3_embedding_drift")(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["n_a"] > 0 and r["n_b"] > 0
        assert r["shift_num"] >= 0
        want = math.sqrt(r["shift_num"]) / (r["n_a"] * r["n_b"] * KM_SCALE)
        assert abs(r["shift"] - want) <= 1e-6, r


def test_cross_source_pairs_conserves_pair_count(spark):
    # The matrix is upper-triangular on source name and its total equals
    # the underlying near-dup pair frame exactly (joins drop nothing).
    from diepy_spark.operators import dedup as D
    from diepy_spark.plans.extended import (
        JACCARD_MAX_DF,
        LSH_BAND_SIZE,
        LSH_NUM_HASHES,
        LSH_THRESHOLD,
        _docs,
    )

    rows = _q("x2_cross_source_pairs")(spark, SF).collect()
    assert rows, "no near-dup pairs at this sf"
    for r in rows:
        assert r["src_a"] <= r["src_b"]
        assert r["n_pairs"] > 0
    n_pairs = D.minhash_lsh_pairs(
        _docs(spark, SF),
        num_hashes=LSH_NUM_HASHES,
        band_size=LSH_BAND_SIZE,
        threshold=LSH_THRESHOLD,
        max_df=JACCARD_MAX_DF,
    ).count()
    assert sum(r["n_pairs"] for r in rows) == n_pairs


def test_pq_distortion_anchors_and_render(spark):
    # One row per subspace; n_vecs constant and equal to the table size;
    # mse is exactly the sse/n render in float units.
    from diepy_spark.plans.extended import KM_SCALE, PQ_M, _vecs

    rows = _q("x3_pq_distortion")(spark, SF).collect()
    assert len(rows) == PQ_M
    n = _vecs(spark, SF).count()
    for r in rows:
        assert r["n_vecs"] == n
        assert 0 <= r["sse"] and 0 <= r["max_err"]
        assert r["max_err"] * n >= r["sse"]  # max bounds the mean
        want = r["sse"] / n / (KM_SCALE * KM_SCALE)
        assert abs(r["mse"] - want) <= 1e-6, r


def test_dedup_savings_monotone_and_conserves_base(spark):
    # The sweep is monotone non-increasing in the threshold, and the
    # loosest row equals the full pair frame (nothing dropped on entry).
    from diepy_spark.operators import dedup as D
    from diepy_spark.plans.extended import (
        DEDUP_CURVE_THRESHOLDS,
        JACCARD_MAX_DF,
        LSH_BAND_SIZE,
        LSH_NUM_HASHES,
        LSH_THRESHOLD,
        _docs,
    )

    rows = _q("x2_dedup_savings")(spark, SF).collect()
    assert rows and rows[0]["thr"] == DEDUP_CURVE_THRESHOLDS[0]
    for a, b in zip(rows, rows[1:]):
        assert a["thr"] < b["thr"]
        for c in ("n_pairs", "n_docs_flagged", "chars_flagged"):
            assert a[c] >= b[c], (c, a, b)
    for r in rows:
        assert r["n_docs_flagged"] <= r["n_pairs"]
    base = D.minhash_lsh_pairs(
        _docs(spark, SF),
        num_hashes=LSH_NUM_HASHES,
        band_size=LSH_BAND_SIZE,
        threshold=LSH_THRESHOLD,
        max_df=JACCARD_MAX_DF,
    ).count()
    assert rows[0]["n_pairs"] == base


def test_pipeline_funnel_monotone_and_matches_training_corpus(spark):
    # Five stages in order, docs/tokens never increase, and the last
    # stage's totals equal the x10_training_corpus manifest exactly (the
    # funnel instruments the SAME chain, not a parallel one).
    rows = _q("x10_pipeline_funnel")(spark, SF).collect()
    assert [r["stage"] for r in rows] == [0, 1, 2, 3, 4]
    assert [r["stage_name"] for r in rows] == [
        "scored", "gate", "exact", "neardup", "semdedup",
    ]
    for a, b in zip(rows, rows[1:]):
        assert a["docs"] >= b["docs"] and a["tokens"] >= b["tokens"], (a, b)
    tc = _q("x10_training_corpus")(spark, SF).collect()
    assert rows[-1]["docs"] == sum(r["docs"] for r in tc)
    assert rows[-1]["tokens"] == sum(r["tokens"] for r in tc)


def test_media_pack_budget_and_conservation(spark):
    # Shards are contiguous from 0 per source; a shard exceeds the byte
    # budget by at most one payload (the one-pass packing bound); totals
    # conserve the corpus exactly.
    from diepy_spark.plans.extended import MEDIA_PACK_BUDGET, _docs

    rows = _q("x6_media_pack")(spark, SF).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        assert [r["shard"] for r in rs] == list(range(len(rs))), src
        for r in rs[:-1]:  # every non-final shard crossed the budget line
            assert r["bytes"] + 1 > MEDIA_PACK_BUDGET - max(
                x["bytes"] for x in rs
            ), r
    d = _docs(spark, SF)
    import pyspark.sql.functions as F

    tot = d.agg(
        F.count("*").alias("n"),
        F.sum(F.length(F.encode("text", "UTF-8"))).alias("b"),
    ).collect()[0]
    assert sum(r["files"] for r in rows) == tot["n"]
    assert sum(r["bytes"] for r in rows) == tot["b"]


def test_regex_tokens_dominance_and_render(spark):
    # Every word token (maximal alnum run) maps to >=1 pre-token, so
    # re_toks >= word_toks (fertility >= 1); each pre-token is >=1 char;
    # the rendered ratios are the single-division chains over the sums.
    rows = _q("x5_regex_tokens")(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["re_toks"] >= r["word_toks"] > 0
        assert r["chars"] >= r["re_toks"]
        assert abs(r["fertility"] - round(r["re_toks"] / r["word_toks"], 6)) <= 1e-9
        assert (
            abs(r["chars_per_tok"] - round(r["chars"] / r["re_toks"], 6))
            <= 1e-9
        )


def test_retention_plan_watermark_and_reclaim(spark):
    # Exactly the most recent RETENTION_DAYS days are kept; drops precede
    # keeps in day order; the running reclaim equals the dropped-row sum
    # and freezes once the kept region starts.
    from diepy_spark.plans.extended import RETENTION_DAYS

    rows = _q("x9_retention_plan")(spark, SF).collect()
    assert rows == sorted(rows, key=lambda r: r["day"])
    kept = [r for r in rows if r["action"] == "keep"]
    dropped = [r for r in rows if r["action"] == "drop"]
    assert len(kept) == min(RETENTION_DAYS, len(rows))
    if dropped and kept:
        assert max(r["day"] for r in dropped) < min(r["day"] for r in kept)
    assert rows[-1]["cum_reclaimed"] == sum(r["n_rows"] for r in dropped)
    run = 0
    for r in rows:
        run += r["n_rows"] if r["action"] == "drop" else 0
        assert r["cum_reclaimed"] == run, r


def test_cc_twophase_matches_dup_clusters_rowwise(spark):
    # The forced distributed tier must reproduce the adaptive path's
    # labels row for row (same pair graph, same min-id fixpoint) — the
    # declared-query analog of the randomized union-find equivalence
    # suite, and a union-find call would be a bug here (threshold 0).
    a = sorted(
        tuple(r) for r in _q("x11_cc_twophase")(spark, SF).collect()
    )
    b = sorted(
        tuple(r) for r in _q("x2_dup_clusters")(spark, SF).collect()
    )
    assert a == b and len(a) > 0


def test_degree_dist_conserves_nodes_and_edges(spark):
    # The histogram must conserve both node and edge-endpoint counts of
    # the symmetrized graph, and the two node kinds partition it.
    import pyspark.sql.functions as F

    from diepy_spark.plans.extended import load_table

    rows = _q("x11_degree_dist")(spark, SF).collect()
    assert {r["kind"] for r in rows} <= {1, 2}
    li = load_table(spark, SF, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    n_edges = ps.count()
    n_parts = ps.select("l_partkey").distinct().count()
    n_supps = ps.select("l_suppkey").distinct().count()
    assert sum(r["n_nodes"] for r in rows) == n_parts + n_supps
    # each undirected edge contributes one degree to each side
    assert sum(r["deg"] * r["n_nodes"] for r in rows) == 2 * n_edges


def test_gini_bounds_and_identity(spark):
    # Gini over positive masses lies in [0, 1); both dimensions report.
    rows = {r["dim"]: r for r in _q("x12_gini")(spark, SF).collect()}
    assert set(rows) == {"source", "lang"}
    for r in rows.values():
        assert 0 <= r["gini"] < 1
        assert r["n_groups"] > 1 and r["total_chars"] > 0


def test_frame_dedup_counts_and_canonical(spark):
    # Every reported frame really repeats; the canonical doc carries it;
    # occurrences bound docs from above.
    rows = _q("x6_frame_dedup")(spark, SF).collect()
    assert rows, "expected duplicate frames at this sf"
    for r in rows:
        assert r["n_occurrences"] > 1
        assert 1 <= r["n_docs"] <= r["n_occurrences"]
    # spot-check one group against the raw frame stream
    from diepy_spark.operators import multimodal as M
    from diepy_spark.plans.extended import _docs

    import pyspark.sql.functions as F

    target = rows[0]
    fr = M.frame_sample(
        M.with_binary_payload(_docs(spark, SF)), every=4, frame_size=256
    ).select(F.md5("frame_bytes").alias("m"), "doc_id")
    grp = fr.where(F.col("m") == target["frame_md5"]).collect()
    assert len(grp) == target["n_occurrences"]
    assert min(g["doc_id"] for g in grp) == target["canonical_doc"]


def test_stream_psi_nonnegative_and_conserves_rows(spark):
    # PSI terms (q-p)ln(q/p) are individually nonnegative, so each day's
    # PSI is >= 0; emitted-day row totals must equal the batch counts of
    # those days exactly (the stream dropped nothing inside a window).
    import pyspark.sql.functions as F

    from diepy_spark.sources.registry import load_table

    rows = _q("x7_stream_psi")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["psi"] >= -1e-9
        assert r["n_rows"] > 0
    batch = {
        r["day"]: r["n"]
        for r in load_table(spark, SF, "events")
        .where(F.col("value").isNotNull())
        .groupBy(F.expr("CAST(CAST(date_trunc('day', ts) AS DATE) AS STRING)").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert batch[r["day"]] == r["n_rows"], r


def test_semdedup_sweep_monotone_and_reconciles(spark):
    # Flags shrink as the threshold tightens, and the production 2/5 arm
    # must equal x2_semdedup's flagged total exactly (same chain).
    rows = _q("x2_semdedup_sweep")(spark, SF).collect()
    assert [(r["num"], r["den"]) for r in rows] == [(1, 5), (2, 5), (3, 5), (4, 5)]
    for a, b in zip(rows, rows[1:]):
        assert a["n_flagged"] >= b["n_flagged"]
        assert a["n_vecs"] == b["n_vecs"] > 0
    report = _q("x2_semdedup")(spark, SF).collect()
    flagged_2_5 = sum(r["n_flagged"] for r in report)
    assert rows[1]["n_flagged"] == flagged_2_5


def test_mix_rebalance_exact_target_shares(spark):
    # No upsampling (realized <= tokens), at least one binding language
    # at keep rate within floor-rounding of 1, realized shares within
    # integer-floor error of the target basis points.
    rows = _q("x10_mix_rebalance")(spark, SF).collect()
    assert len(rows) == 5
    cap = min(r["tokens"] * 10000 // r["target_bp"] for r in rows)
    for r in rows:
        assert r["realized_tokens"] == cap * r["target_bp"] // 10000
        assert 0 <= r["realized_tokens"] <= r["tokens"]
        assert r["binding"] == (
            1 if r["tokens"] * 10000 // r["target_bp"] == cap else 0
        )
    assert any(r["binding"] == 1 for r in rows)


def test_sweep_matches_per_threshold_flags_random_vectors(spark):
    # Randomized equivalence: for every threshold arm, the sweep's
    # distinct-flag count must equal a fresh semdedup_flags run at that
    # single threshold — same chain, two code paths (deterministic
    # seeds; the union-find-vs-two-phase suite pattern).
    import random

    import pyspark.sql.functions as F

    from diepy_spark.operators.similarity import (
        semdedup_flags,
        semdedup_threshold_sweep,
    )

    for seed in (11, 37):
        rng = random.Random(seed)
        rows = [
            (i, [rng.uniform(-1.0, 1.0) for _ in range(8)])
            for i in range(40)
        ]
        vecs = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>"
        )
        cents = [
            [rng.randrange(-1000, 1000) for _ in range(8)] for _ in range(3)
        ]
        arms = ((1, 4), (2, 4), (3, 4))
        sweep = {
            (r["num"], r["den"]): r["n_flagged"]
            for r in semdedup_threshold_sweep(
                vecs, cents, arms, scale=1000
            ).collect()
        }
        for num, den in arms:
            direct = (
                semdedup_flags(vecs, cents, thr_num=num, thr_den=den, scale=1000)
                .where(F.col("is_dup"))
                .count()
            )
            assert sweep[(num, den)] == direct, (seed, num, den)


def test_corpus_funnel_stages_match_standalone_operators(spark):
    # Randomized equivalence: the funnel's neardup stage must equal a
    # standalone clean_corpus run, and its semdedup stage the flag
    # filter applied on top — the funnel instruments, never diverges.
    import random

    import pyspark.sql.functions as F

    from diepy_spark.operators.corpus import clean_corpus, corpus_funnel

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for seed in (5, 19):
        rng = random.Random(seed)
        docs = []
        for i in range(30):
            if i % 7 == 3:
                text = docs[i - 1][1]  # exact duplicate of the previous
            else:
                text = " ".join(rng.choice(words) for _ in range(rng.randrange(3, 25)))
            docs.append((i, text, "en", "s%d" % (i % 3), len(text)))
        d = spark.createDataFrame(
            docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        )
        flags = spark.createDataFrame(
            [(i, i % 5 == 0) for i in range(30)], "doc_id bigint, is_dup boolean"
        )
        kw = dict(min_tokens=4, min_score=0.1, max_dup3=0.9, jaccard_threshold=0.5, max_df=100)
        funnel = {r["stage_name"]: r for r in corpus_funnel(d, flags, **kw).collect()}
        clean = clean_corpus(d, **kw)
        n_clean = clean.count()
        assert funnel["neardup"]["docs"] == n_clean, seed
        n_sem = (
            clean.join(flags, "doc_id", "left")
            .where(~F.coalesce("is_dup", F.lit(False)))
            .count()
        )
        assert funnel["semdedup"]["docs"] == n_sem, seed
        ds = [funnel[s]["docs"] for s in ("scored", "gate", "exact", "neardup", "semdedup")]
        assert ds == sorted(ds, reverse=True), ds


def test_stream_quantiles_order_and_histogram_truth(spark):
    # p50 <= p90 <= p99 per day, and each reported edge really covers
    # the target mass: re-derive one day's histogram from the batch
    # table and check the integer pick rule.
    import pyspark.sql.functions as F

    from diepy_spark.plans.pipeline import SQNT_BIN_CENTS, SQNT_NBINS
    from diepy_spark.sources.registry import load_table

    rows = _q("x7_stream_quantiles")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["p50"] <= r["p90"] <= r["p99"]
        assert r["n_rows"] > 0
    day = rows[0]["day"]
    hist = (
        load_table(spark, SF, "events")
        .where(F.col("value").isNotNull())
        .where(F.expr(f"CAST(CAST(date_trunc('day', ts) AS DATE) AS STRING) = '{day}'"))
        .selectExpr(
            f"least(CAST(floor(CAST(round(value * 100) AS BIGINT)"
            f" / {SQNT_BIN_CENTS}) AS BIGINT),"
            f" CAST({SQNT_NBINS - 1} AS BIGINT)) AS bin"
        )
        .groupBy("bin")
        .count()
        .collect()
    )
    counts = sorted((h["bin"], h["count"]) for h in hist)
    n = sum(c for _, c in counts)
    assert n == rows[0]["n_rows"]
    for p, col in ((50, "p50"), (90, "p90"), (99, "p99")):
        cum = 0
        for b, c in counts:
            cum += c
            if cum * 100 >= n * p:
                assert rows[0][col] == (b + 1) * SQNT_BIN_CENTS / 100.0
                break


def test_rq_refinement_never_hurts_and_matches_pq_level1(spark):
    # The reserved zero code makes refinement decline-able, so
    # reduction >= 0 on every subspace; and level-1 sse must equal
    # x3_pq_distortion's sse exactly (same codebooks, same argmin).
    rq = {r["s"]: r for r in _q("x3_rq_distortion")(spark, SF).collect()}
    pq = {r["s"]: r for r in _q("x3_pq_distortion")(spark, SF).collect()}
    assert set(rq) == set(pq)
    for s, r in rq.items():
        assert r["sse1"] == pq[s]["sse"], s
        assert 0 <= r["sse2"] <= r["sse1"]
        assert r["reduction"] >= 0


def test_rq_adc_distance_is_exact_reconstruction_distance(spark):
    # Re-derive one reported pair's distance from raw python ints: the
    # LUT sum must equal ||q - (c1[code1] + c2[code2])||^2 exactly,
    # with codes from the same greedy argmin.
    import pyspark.sql.functions as F

    from diepy_spark.operators.similarity import (
        pq_codebooks,
        rq_codebooks,
        rq_encode,
    )
    from diepy_spark.plans.extended import KM_SCALE, PQ_CODES, PQ_M, PQ_NQ, _vecs

    rows = _q("x3_rq_adc")(spark, SF).collect()
    assert len(rows) > 0
    target = rows[0]
    v = _vecs(spark, SF)
    b1 = pq_codebooks(v, m=PQ_M, ncodes=PQ_CODES, scale=KM_SCALE)
    b2 = rq_codebooks(v, b1, scale=KM_SCALE)
    codes = (
        rq_encode(
            v.where(F.col("vec_id") == target["cid"]), b1, b2, scale=KM_SCALE
        )
        .collect()[0]
    )
    q_xi, c_xi = [
        [int(round(float(x) * KM_SCALE)) for x in r["embedding"]]
        for r in v.where(
            F.col("vec_id").isin([target["qid"], target["cid"]])
        )
        .orderBy(F.col("vec_id") == F.lit(target["cid"]))
        .collect()
    ]
    sub = len(q_xi) // PQ_M
    dist = 0
    for s in range(PQ_M):
        c1 = b1[s][codes[f"code1_{s}"]]
        c2 = b2[s][codes[f"code2_{s}"]]
        for t in range(sub):
            recon = c1[t] + c2[t]
            d = q_xi[s * sub + t] - recon
            dist += d * d
    assert dist == target["dist"], (target, dist)
    for r in rows:
        assert r["dist"] >= 0 and 1 <= r["rk"]


def test_pq_vs_rq_recall_counts_consistent(spark):
    # Both rows share the exact-set size PQ_NQ*PQ_K; hits bounded by it;
    # recall is the exact division render.
    from diepy_spark.plans.extended import PQ_K, PQ_NQ

    rows = {r["method"]: r for r in _q("x3_pq_vs_rq_recall")(spark, SF).collect()}
    assert set(rows) == {"pq_adc", "rq_adc"}
    for r in rows.values():
        assert r["n_exact"] == PQ_NQ * PQ_K
        assert 0 <= r["hits"] <= r["n_exact"]
        assert r["recall"] == round(r["hits"] / r["n_exact"], 4)


def test_pq_training_strictly_improves_and_reconciles(spark):
    # Lloyd's must beat the seed codebooks on every subspace at this
    # fixture, and the deterministic column must equal x3_pq_distortion
    # exactly (same books, same corpus).
    tr = {r["s"]: r for r in _q("x3_pq_trained_distortion")(spark, SF).collect()}
    det = {r["s"]: r for r in _q("x3_pq_distortion")(spark, SF).collect()}
    assert set(tr) == set(det)
    for s, r in tr.items():
        assert r["sse_det"] == det[s]["sse"], s
        assert 0 < r["sse_trained"] < r["sse_det"], s
        assert r["improvement"] > 0


def _daily_counts(spark):
    # The (day, count) series both new x8 queries collapse events to.
    import pyspark.sql.functions as F

    from diepy_spark.plans.extended import _DAY_DIV, load_table

    rows = (
        load_table(spark, SF, "events")
        .select(
            F.expr(f"unix_micros(cast(ts as timestamp)) div {_DAY_DIV}").alias("day")
        )
        .groupBy("day")
        .count()
        .collect()
    )
    return {r["day"]: r["count"] for r in rows}


def test_acf_matches_reference_computation(spark):
    # The integer n*x - S centering must reproduce the textbook
    # mean-centered ACF over the gap-filled spine, computed here in
    # plain Python fractions (exact), to the rendered 6 decimals; and
    # every lag obeys the Cauchy-Schwarz bound |r_k| <= 1.
    from fractions import Fraction

    from diepy_spark.plans.extended import ACF_MAX_LAG

    counts = _daily_counts(spark)
    d0, d1 = min(counts), max(counts)
    xs = [counts.get(d, 0) for d in range(d0, d1 + 1)]
    n = len(xs)
    mean = Fraction(sum(xs), n)
    dev = [Fraction(x) - mean for x in xs]
    den = sum(d * d for d in dev)
    rows = _q("x8_acf")(spark, SF).collect()
    assert [r["lag_k"] for r in rows] == list(
        range(1, min(ACF_MAX_LAG, n - 1) + 1)
    )
    for r in rows:
        k = r["lag_k"]
        num = sum(dev[t] * dev[t + k] for t in range(n - k))
        assert r["n_days"] == n
        assert Fraction(r["num"], r["den"]) == num / den, k
        assert abs(r["acf"]) <= 1
        assert r["acf"] == round(r["num"] / r["den"], 6), k


def test_runs_test_matches_reference_computation(spark):
    # n1/n2/runs must equal a direct Python pass over the observed-day
    # series (median-excluded, above/below runs), and the z text must
    # agree with the Wald-Wolfowitz moments to the rendered 6 decimals.
    counts = _daily_counts(spark)
    xs = [counts[d] for d in sorted(counts)]
    s = sorted(xs)
    n = len(s)
    med2 = 2 * s[(n - 1) // 2] if n % 2 else s[n // 2 - 1] + s[n // 2]
    kept = [1 if 2 * x > med2 else 0 for x in xs if 2 * x != med2]
    n1, n2 = sum(kept), len(kept) - sum(kept)
    runs = 1 + sum(a != b for a, b in zip(kept, kept[1:])) if kept else 0
    row = _q("x8_runs_test")(spark, SF).collect()[0]
    assert (row["n1"], row["n2"], row["runs"]) == (n1, n2, runs)
    p2, m = 2 * n1 * n2, n1 + n2
    assert (row["p2"], row["m"]) == (p2, m)
    if p2 > m and m > 1:
        import math

        z = (runs - 1 - p2 / m) / math.sqrt(
            p2 * (p2 - m) / (m * m * (m - 1))
        )
        assert row["runs_z"] == round(z, 6)
    else:
        assert row["runs_z"] == 0.0


def test_anova_matches_reference_computation(spark):
    # SSB/SSW/F from exact Fractions over the same cents values must
    # agree with the rendered doubles; the sum-of-squares identity
    # SSB + SSW = SST must hold exactly in the rational domain.
    from fractions import Fraction

    import pyspark.sql.functions as F

    from diepy_spark.plans.extended import load_table

    rows = (
        load_table(spark, SF, "orders")
        .selectExpr(
            "CAST(o_orderpriority AS STRING) AS grp",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .collect()
    )
    by = {}
    for r in rows:
        by.setdefault(r["grp"], []).append(r["cents"])
    k, n = len(by), len(rows)
    s_tot = sum(sum(v) for v in by.values())
    q_tot = sum(c * c for v in by.values() for c in v)
    ssq_exact = sum(Fraction(sum(v)) ** 2 / len(v) for v in by.values())
    ssb = ssq_exact - Fraction(s_tot) ** 2 / n
    ssw = Fraction(q_tot) - ssq_exact
    got = _q("x8_anova")(spark, SF).collect()[0]
    assert (got["k_groups"], got["n_rows"], got["s_tot"]) == (k, n, s_tot)
    # float layer: RELATIVE tolerance — the ssq - S^2/n subtraction
    # cancels ~4 leading digits (deterministic, shared-text, but not
    # exact); 1e-9 relative is far past cancellation noise (~1e-13)
    # and far under any wrong formula (relative ~1).
    assert abs(got["ss_between"] - float(ssb)) < 1e-9 * float(ssb)
    assert abs(got["ss_within"] - float(ssw)) < 1e-9 * float(ssw)
    f_exact = (ssb / (k - 1)) / (ssw / (n - k))
    # + 5e-7: f_stat renders at round(..., 6)
    assert abs(got["f_stat"] - float(f_exact)) < 1e-9 * float(f_exact) + 5e-7


def test_random_walks_are_valid_deterministic_trajectories(spark):
    # Every consecutive (t-1 -> t) transition of every walk must be a
    # real edge of the symmetrized graph; every walk emits exactly one
    # node per step; a second run reproduces the corpus bit-for-bit.
    import pyspark.sql.functions as F

    from diepy_spark.operators.clustering import random_walks
    from diepy_spark.plans.extended import load_table

    li = load_table(spark, SF, "lineitem")
    ps = li.select(
        (F.col("l_partkey") * 10 + 1).alias("src"),
        (F.col("l_suppkey") * 10 + 2).alias("dst"),
    ).distinct()
    sym = ps.unionByName(
        ps.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    steps = 3
    rows = random_walks(sym, steps=steps).collect()
    edges = {(r["src"], r["dst"]) for r in sym.collect()}
    traj = {}
    for r in rows:
        traj.setdefault(r["walk"], {})[r["t"]] = r["node"]
    assert traj, "no walks produced"
    for walk, path in traj.items():
        assert sorted(path) == list(range(steps + 1)), walk
        assert path[0] == walk
        for t in range(1, steps + 1):
            assert (path[t - 1], path[t]) in edges, (walk, t)
    again = random_walks(sym, steps=steps).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_node2vec_classes_and_determinism(spark):
    # Trajectories must be valid edges; for t >= 2 the recorded bias
    # class must equal ground truth recomputed from (t-2, t-1, t); the
    # corpus must reproduce bit-for-bit on a second run.
    import pyspark.sql.functions as F

    from diepy_spark.operators.clustering import node2vec_walks
    from diepy_spark.plans.extended import load_table

    li = load_table(spark, SF, "lineitem")
    ps = li.select(
        (F.col("l_partkey") * 10 + 1).alias("src"),
        (F.col("l_suppkey") * 10 + 2).alias("dst"),
    ).distinct()
    sym = ps.unionByName(
        ps.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    steps = 3
    rows = node2vec_walks(sym, steps=steps).collect()
    edges = {(r["src"], r["dst"]) for r in sym.collect()}
    traj, cls = {}, {}
    for r in rows:
        traj.setdefault(r["walk"], {})[r["t"]] = r["node"]
        cls.setdefault(r["walk"], {})[r["t"]] = r["cls"]
    assert traj, "no walks produced"
    for walk, path in traj.items():
        assert sorted(path) == list(range(steps + 1)), walk
        assert path[0] == walk and cls[walk][0] == "start"
        assert cls[walk][1] == "uniform"
        for t in range(1, steps + 1):
            assert (path[t - 1], path[t]) in edges, (walk, t)
        for t in range(2, steps + 1):
            want = (
                "back"
                if path[t] == path[t - 2]
                else "common"
                if (path[t - 2], path[t]) in edges
                else "forward"
            )
            assert cls[walk][t] == want, (walk, t)
    again = node2vec_walks(sym, steps=steps).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_walk_cooccur_matches_python_recount(spark):
    # The skip-gram pair counts must equal a direct Python recount over
    # the same cached walk corpus, and the top-k rows must be the
    # (cnt desc, center, context) prefix of that exact pair table.
    from collections import Counter

    from diepy_spark.plans.extended import (
        WC_TOP,
        WC_WINDOW,
        _rw_walks_cached,
    )

    walks = _rw_walks_cached(spark, SF).collect()
    seq = {}
    for r in walks:
        seq.setdefault(r["walk"], {})[r["t"]] = r["node"]
    counts = Counter()
    for path in seq.values():
        ts = sorted(path)
        for i in ts:
            for j in ts:
                if i != j and abs(i - j) <= WC_WINDOW:
                    counts[(path[i], path[j])] += 1
    want = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )[:WC_TOP]
    got = _q("x11_walk_cooccur")(spark, SF).collect()
    assert len(got) == min(WC_TOP, len(counts))
    total = sum(counts.values())
    for row, ((center, context), cnt) in zip(got, want):
        assert (row["center"], row["context"], row["cnt"]) == (
            center,
            context,
            cnt,
        )
        assert row["total_pairs"] == total
        assert row["distinct_pairs"] == len(counts)


def test_wasserstein_matches_python_integral(spark):
    # W1 must equal the exact ECDF-gap integral recomputed with
    # Fractions over the same cents values, and dominate... be bounded
    # by the value range (W1 <= max - min for distributions on it).
    from fractions import Fraction

    from diepy_spark.plans.extended import load_table

    rows = (
        load_table(spark, SF, "events")
        .where("value IS NOT NULL")
        .selectExpr(
            "CAST(round(value * 100) AS BIGINT) AS cents",
            "user_id % 2 = 0 AS in_a",
        )
        .collect()
    )
    a = sorted(r["cents"] for r in rows if r["in_a"])
    b = sorted(r["cents"] for r in rows if not r["in_a"])
    import bisect

    domain = sorted({*a, *b})
    w1 = Fraction(0)
    for lo, hi in zip(domain, domain[1:]):
        fa = Fraction(bisect.bisect_right(a, lo), len(a))
        fb = Fraction(bisect.bisect_right(b, lo), len(b))
        w1 += abs(fa - fb) * (hi - lo)
    got = _q("x8_wasserstein")(spark, SF).collect()[0]
    assert (got["n_a"], got["n_b"]) == (len(a), len(b))
    assert Fraction(got["w1_num"], len(a) * len(b)) == w1
    assert abs(got["w1_cents"] - float(w1)) < 5e-7 + 1e-9 * float(w1)
    assert 0 <= float(w1) <= domain[-1] - domain[0]


def test_walk_pmi_matches_python_recount(spark):
    # PMI marginals, lift and ranking must equal a direct recount from
    # the same cached pair table (SGNS marginals: row sums, column
    # sums, grand total).
    import math
    from collections import Counter

    from diepy_spark.plans.extended import (
        PMI_MIN_CNT,
        PMI_TOP,
        _wc_pairs_cached,
    )

    pairs = {
        (r["center"], r["context"]): r["cnt"]
        for r in _wc_pairs_cached(spark, SF).collect()
    }
    cw, cc = Counter(), Counter()
    for (w, c), n in pairs.items():
        cw[w] += n
        cc[c] += n
    dd = sum(pairs.values())
    scored = [
        (w, c, n, cw[w], cc[c], (n * dd) / (cw[w] * cc[c]))
        for (w, c), n in pairs.items()
        if n >= PMI_MIN_CNT
    ]
    want = sorted(scored, key=lambda r: (-r[5], r[0], r[1]))[:PMI_TOP]
    got = _q("x11_walk_pmi")(spark, SF).collect()
    assert len(got) == min(PMI_TOP, len(scored))
    for row, (w, c, n, w_cnt, c_cnt, lift) in zip(got, want):
        assert (row["center"], row["context"], row["cnt"]) == (w, c, n)
        assert (row["cw"], row["cc"]) == (w_cnt, c_cnt)
        assert abs(row["lift"] - lift) < 5e-7 + 1e-9 * lift
        assert abs(row["pmi"] - math.log(lift)) < 1e-5
