"""Training-data hygiene: n-gram decontamination + PII redaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowplow_s3_loader_spark.operators.hygiene import (
    ngram_contamination,
    redact_pii,
    redaction_report,
    word_ngrams,
)


def test_word_ngrams_basic_and_short_doc(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "")], "id long, text string"
    )
    got = {
        r["id"]: r["g"]
        for r in df.select("id", word_ngrams(F.col("text"), 3).alias("g")).collect()
    }
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == []  # shorter than n: empty, not a negative sequence
    assert got[3] == []


def test_ngram_contamination_flags_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here today friends"),
            (3, "quick brown fox jumps high above everything"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox jumps sentence")], "bid long, text string"
    )
    out = {
        r["id"]: (r["n_shared_ngrams"], r["contaminated"])
        for r in ngram_contamination(docs, bench, "doc_id", "text", n=4).collect()
    }
    # doc 1 shares 'quick brown fox jumps'; doc 3 shares it too; doc 2 clean
    assert out[1] == (1, True)
    assert out[3] == (1, True)
    assert out[2] == (0, False)
    assert len(out) == 3  # every input row present


def test_ngram_contamination_counts_distinct_grams_once(spark):
    # a doc repeating the contaminated n-gram counts it once (distinct grams)
    docs = spark.createDataFrame(
        [(1, "x y z w q x y z w q")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "x y z w")], "bid long, text string")
    row = ngram_contamination(docs, bench, "doc_id", "text", n=4).collect()[0]
    assert row["n_shared_ngrams"] == 1 and row["contaminated"]


def test_contamination_benchmark_side_is_broadcast(spark):
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b c d")], "bid long, text string")
    plan = (
        ngram_contamination(docs, bench, "doc_id", "text", n=4)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "ResolvedHint (strategy=broadcast)" in plan or "broadcast" in plan.lower()


def test_redaction_masks_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at joe.doe+x@corp.example.org or 192.168.0.1 thanks"),
            (2, "card 4242 4242 4242 4242 and 1234-5678-9012-3456 end"),
            (3, "nothing sensitive here"),
        ],
        "id long, text string",
    )
    rows = {r["id"]: r for r in redaction_report(df, "id", "text").collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_ips"] == 1
    assert "<EMAIL>" in rows[1]["redacted"] and "<IP>" in rows[1]["redacted"]
    assert "joe.doe" not in rows[1]["redacted"]
    assert "192.168.0.1" not in rows[1]["redacted"]
    assert rows[2]["n_cards"] == 2
    assert rows[2]["redacted"].count("<CARD>") == 2
    assert rows[3]["redacted"] == "nothing sensitive here"
    assert rows[3]["n_emails"] == rows[3]["n_ips"] == rows[3]["n_cards"] == 0


def test_redaction_order_card_before_ip(spark):
    # a dashed card must become <CARD>, never a half-masked <IP>
    df = spark.createDataFrame([(1, "pay 1111-2222-3333-4444 now")], "id long, text string")
    red = df.select(redact_pii(F.col("text")).alias("r")).collect()[0]["r"]
    assert red == "pay <CARD> now"


# ---------------------------------------------------------------------------
# repeated-span removal (ExactSubstr-style dedup)
# ---------------------------------------------------------------------------


def test_remove_repeated_spans_hand_computed(spark):
    from snowplow_s3_loader_spark.operators.hygiene import remove_repeated_spans

    # 'a b c' and 'b c d' (k=3) each occur in both docs -> witness spans
    # d1: [0,2],[1,3] merge to [0,3]; d2: [2,4],[3,5] merge to [2,5]
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "z z a b c d q")], "doc_id long, text string"
    )
    rows = {
        r["id"]: r
        for r in remove_repeated_spans(docs, "doc_id", "text", k=3).collect()
    }
    assert rows[1]["n_dup_spans"] == 1
    assert rows[1]["n_tokens_removed"] == 4
    assert rows[1]["cleaned_text"] == "e f"
    assert rows[2]["n_dup_spans"] == 1
    assert rows[2]["n_tokens_removed"] == 4
    assert rows[2]["cleaned_text"] == "z z q"


def test_remove_repeated_spans_within_doc_repeat(spark):
    from snowplow_s3_loader_spark.operators.hygiene import remove_repeated_spans

    # the same 3-gram twice INSIDE one doc also counts as duplication
    docs = spark.createDataFrame(
        [(1, "p q r x p q r y")], "doc_id long, text string"
    )
    row = remove_repeated_spans(docs, "doc_id", "text", k=3).collect()[0]
    assert row["n_dup_spans"] == 2
    assert row["n_tokens_removed"] == 6
    assert row["cleaned_text"] == "x y"


def test_remove_repeated_spans_no_dups_and_short_docs(spark):
    from snowplow_s3_loader_spark.operators.hygiene import remove_repeated_spans

    docs = spark.createDataFrame(
        [(1, "all unique words here"), (2, "hi"), (3, "")],
        "doc_id long, text string",
    )
    rows = {
        r["id"]: r
        for r in remove_repeated_spans(docs, "doc_id", "text", k=3).collect()
    }
    assert len(rows) == 3
    assert rows[1]["n_dup_spans"] == 0
    assert rows[1]["cleaned_text"] == "all unique words here"
    assert rows[2]["cleaned_text"] == "hi"
    assert rows[3]["cleaned_text"] == ""


def test_remove_repeated_spans_whole_doc_removed(spark):
    from snowplow_s3_loader_spark.operators.hygiene import remove_repeated_spans

    docs = spark.createDataFrame(
        [(1, "c c c"), (2, "c c c")], "doc_id long, text string"
    )
    rows = {
        r["id"]: r
        for r in remove_repeated_spans(docs, "doc_id", "text", k=3).collect()
    }
    for i in (1, 2):
        assert rows[i]["n_tokens_removed"] == 3
        assert rows[i]["cleaned_text"] == ""


def test_remove_repeated_spans_matches_python_reference(spark):
    """Differential test: a direct Python implementation of the span-dedup
    semantics (gram counts -> witness spans -> island merge -> rebuild)
    must agree with the distributed operator on a seeded random corpus
    with injected shared runs."""
    import random

    from snowplow_s3_loader_spark.operators.hygiene import remove_repeated_spans

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    shared_runs = [
        [f"r{j}_{i}" for i in range(6)] for j in range(4)
    ]
    docs = {}
    for d in range(40):
        toks = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        if rng.random() < 0.6:
            run = shared_runs[rng.randrange(4)]
            at = rng.randint(0, len(toks))
            toks = toks[:at] + run + toks[at:]
        docs[d] = " ".join(toks)

    K = 4

    def reference(all_docs: dict[int, str]):
        toks = {i: t.split() for i, t in all_docs.items()}
        from collections import Counter

        grams = Counter()
        for ts in toks.values():
            for p in range(len(ts) - K + 1):
                grams[tuple(ts[p : p + K])] += 1
        out = {}
        for i, ts in toks.items():
            spans = [
                (p, p + K - 1)
                for p in range(len(ts) - K + 1)
                if grams[tuple(ts[p : p + K])] >= 2
            ]
            merged = []
            for s, e in spans:  # already sorted by start
                if merged and s <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e))
                else:
                    merged.append((s, e))
            covered = {p for s, e in merged for p in range(s, e + 1)}
            kept = [t for p, t in enumerate(ts) if p not in covered]
            out[i] = (
                len(merged),
                sum(e - s + 1 for s, e in merged),
                " ".join(kept),
            )
        return out

    expected = reference(docs)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["id"]: (r["n_dup_spans"], r["n_tokens_removed"], r["cleaned_text"])
        for r in remove_repeated_spans(df, "doc_id", "text", k=K).collect()
    }
    assert got == expected
