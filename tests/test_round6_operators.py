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
