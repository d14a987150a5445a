"""Bigram-LM cross-entropy scoring (CCNet-style quality signal)."""

from __future__ import annotations

import math

from snowplow_s3_loader_spark.operators.lm import bigram_lm_scores


def _micro(p: float) -> int:
    return round(math.log(p) * 1e6)


def test_bigram_lm_hand_computed(spark):
    # corpus: d1 = "a b a b", d2 = "a b c"
    # bigrams: d1 -> (a b), (b a), (a b); d2 -> (a b), (b c)
    # c2: (a b)=3, (b a)=1, (b c)=1; ctx: a=3, b=2; V=3; k=0.5
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "id long, text string"
    )
    rows = {r["id"]: r for r in bigram_lm_scores(df, "id", "text").collect()}

    p_ab = (3 + 0.5) / (3 + 0.5 * 3)   # P(b|a)
    p_ba = (1 + 0.5) / (2 + 0.5 * 3)   # P(a|b)
    p_bc = (1 + 0.5) / (2 + 0.5 * 3)   # P(c|b)

    d1_sum = 2 * _micro(p_ab) + _micro(p_ba)
    d2_sum = _micro(p_ab) + _micro(p_bc)

    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["sum_logp_micronats"] == d1_sum
    assert abs(rows[1]["lm_cross_entropy"] - round(-d1_sum / 3e6, 6)) < 1e-12
    assert rows[2]["n_bigrams"] == 2
    assert rows[2]["sum_logp_micronats"] == d2_sum

    # repetitive d1 is more predictable than d2's unseen-ish tail
    assert rows[1]["lm_cross_entropy"] < rows[2]["lm_cross_entropy"]


def test_bigram_lm_short_docs_null_not_crash(spark):
    df = spark.createDataFrame(
        [(1, "only"), (2, ""), (3, "two words")], "id long, text string"
    )
    rows = {r["id"]: r for r in bigram_lm_scores(df, "id", "text").collect()}
    assert len(rows) == 3  # every input row present
    for short_id in (1, 2):
        assert rows[short_id]["n_bigrams"] == 0
        assert rows[short_id]["lm_cross_entropy"] is None
    assert rows[3]["n_bigrams"] == 1


def test_bigram_lm_detects_degenerate_repetition(spark):
    # a pathological repeated-token doc scores far below varied text
    rep = " ".join(["spam"] * 50)
    var = " ".join(f"tok{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, rep), (2, var)], "id long, text string"
    )
    rows = {r["id"]: r for r in bigram_lm_scores(df, "id", "text").collect()}
    assert rows[1]["lm_cross_entropy"] < rows[2]["lm_cross_entropy"]
