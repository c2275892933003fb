"""BPE tokenizer: classic-example merges, determinism, distributed
encode consistency."""

from __future__ import annotations

from mcm_problem_f_data_wrangling_spark.functions.bpe import (
    END,
    _encode_word,
    bpe_token_stats,
    corpus_word_counts,
    learn_bpe_merges,
)


def test_learn_merges_classic_example():
    # Sennrich et al. running example: 'es' then 'est' dominate
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_bpe_merges(wc, num_merges=4)
    assert merges[0] == ("e", "s")          # 9 occurrences
    assert merges[1] == ("es", "t")         # 9
    assert merges[2] == ("est", END)        # 9
    # encoding uses merge order as rank
    ranks = {p: i for i, p in enumerate(merges)}
    assert "est" + END in _encode_word("widest", ranks)


def test_learning_is_deterministic():
    wc = [("ab", 2), ("ba", 2), ("aa", 2)]  # tied counts everywhere
    m1 = learn_bpe_merges(wc, num_merges=3)
    m2 = learn_bpe_merges(list(reversed(wc)), num_merges=3)
    assert m1 == m2  # tie-break is (count desc, pair lexicographic)


def test_distributed_encode_matches_local(spark):
    df = spark.createDataFrame(
        [(1, "newest widest low"), (2, "lower newest"), (3, None)],
        "doc_id long, text string",
    )
    wc = corpus_word_counts(df)
    assert wc[0][0] == "newest" and wc[0][1] == 2
    merges = learn_bpe_merges(wc, num_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    rows = {r["doc_id"]: r for r in bpe_token_stats(df, merges).collect()}
    local = sum(len(_encode_word(w, ranks)) for w in "newest widest low".split())
    assert rows[1]["n_tokens_bpe"] == local
    assert rows[1]["n_tokens_ws"] == 3
    assert rows[1]["sample_tokens"] == _encode_word("newest", ranks)
    assert rows[3]["n_tokens_bpe"] == 0 and rows[3]["sample_tokens"] == []
    # more merges never increase token count
    fewer = {r["doc_id"]: r for r in bpe_token_stats(df, merges[:2]).collect()}
    assert rows[1]["n_tokens_bpe"] <= fewer[1]["n_tokens_bpe"]
