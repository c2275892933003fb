"""Repetition-signal tests: hand-computed fixtures + edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcm_problem_f_data_wrangling_spark.operators.quality import (
    repetition_signals,
    word_ngrams_strict,
)


def _by_key(rows):
    return {(r["doc_id"], r["n"]): r for r in rows}


def test_repetition_signals_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # bigrams: [a b, b a, a b, b a] -> top 2/4, distinct 2 -> dup 0.5
            # trigrams: [a b a, b a b, a b a] -> top 2/3, distinct 2 -> dup 1/3
            (1, "a b a b a"),
            # all-unique bigrams -> top 1/3, dup 0
            (2, "w x y z"),
            # single repeated token: bigrams [q q, q q] -> top 1.0, dup 0.5
            (3, "q q q"),
        ],
        "doc_id long, text string",
    )
    out = _by_key(repetition_signals(df).collect())
    r = out[(1, 2)]
    assert (r["top_gram_frac"], r["dup_gram_frac"], r["n_grams"]) == (0.5, 0.5, 4)
    r = out[(1, 3)]
    assert r["top_gram_frac"] == round(2 / 3, 6)
    assert r["dup_gram_frac"] == round(1 / 3, 6)
    r = out[(2, 2)]
    assert (r["top_gram_frac"], r["dup_gram_frac"], r["n_grams"]) == (
        round(1 / 3, 6),
        0.0,
        3,
    )
    r = out[(3, 2)]
    assert (r["top_gram_frac"], r["dup_gram_frac"], r["n_grams"]) == (1.0, 0.5, 2)
    # doc 3 has 3 tokens -> exactly one trigram
    assert out[(3, 3)]["n_grams"] == 1


def test_repetition_signals_short_docs_emit_no_row(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, "two words")], "doc_id long, text string"
    )
    out = _by_key(repetition_signals(df).collect())
    assert (1, 2) not in out and (1, 3) not in out  # 1 token: nothing
    assert out[(2, 2)]["n_grams"] == 1
    assert (2, 3) not in out  # 2 tokens: no trigram row


def test_word_ngrams_strict_empty_below_n(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    row = df.select(
        word_ngrams_strict(F.split("text", " "), 3).alias("g")
    ).first()
    assert row["g"] == []


def test_redact_pii_fixtures(spark):
    from mcm_problem_f_data_wrangling_spark.functions.textfn import (
        pii_counts,
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "mail a.smith+x@sub.example.co.uk now"),
            (2, "call 415-555-0123 or 415.555.0199"),
            (3, "host 192.168.1.254 is up"),
            (4, "clean text, no pii at all"),
            (5, "both bob@x.io and 10.0.0.1"),
        ],
        "id long, text string",
    )
    c = pii_counts(F.col("text"))
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            redact_pii("text").alias("red"),
            c["email"].alias("ne"),
            c["phone"].alias("np"),
            c["ipv4"].alias("ni"),
        ).collect()
    }
    assert got[1]["red"] == "mail <EMAIL> now" and got[1]["ne"] == 1
    assert got[2]["red"] == "call <PHONE> or <PHONE>" and got[2]["np"] == 2
    assert got[3]["red"] == "host <IPV4> is up" and got[3]["ni"] == 1
    assert got[4]["red"] == "clean text, no pii at all"
    assert (got[4]["ne"], got[4]["np"], got[4]["ni"]) == (0, 0, 0)
    assert got[5]["red"] == "both <EMAIL> and <IPV4>"


def test_filter_funnel_single_scan_report(spark):
    from mcm_problem_f_data_wrangling_spark.operators.quality import filter_funnel

    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 30, "a"), (3, 30, "b"), (4, None, "b"), (5, 50, "a")],
        "id bigint, v int, cat string",
    )
    out = filter_funnel(
        df,
        [
            ("cat_a", F.col("cat") == "a"),
            ("v_big", F.col("v") >= 30),  # NULL v on id=4 must count as drop
        ],
    ).collect()
    rows = {r["stage"]: r for r in out}
    assert [r["stage_idx"] for r in sorted(out, key=lambda r: r["stage_idx"])] == [1, 2]
    assert rows["cat_a"]["n_in"] == 5 and rows["cat_a"]["n_kept"] == 3
    assert rows["v_big"]["n_in"] == 3 and rows["v_big"]["n_kept"] == 2
    assert rows["v_big"]["n_dropped"] == 1


def test_filter_funnel_null_predicate_drops(spark):
    from mcm_problem_f_data_wrangling_spark.operators.quality import filter_funnel

    df = spark.createDataFrame([(None,), (1,)], "v int")
    out = filter_funnel(df, [("nonnull_pass", F.col("v") > 0)]).collect()
    assert out[0]["n_kept"] == 1 and out[0]["n_dropped"] == 1
