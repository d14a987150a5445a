"""Training-data hygiene: benchmark decontamination and PII redaction.
(Beyond the reference's surface — SURVEY.md SS7.8 training-data
extensions; the reference loader has no relational layer at all,
Processing.scala:69-77.)

Decontamination is the standard pretraining-corpus step (flag documents
sharing any word n-gram with an evaluation benchmark, cf. GPT-3 appendix
C / PaLM's 13-gram rule); redaction masks obvious PII spans before
training. Both are pure JVM column expressions over one scan — no UDFs,
no Python in the hot path.

Scale shape:
- benchmark n-grams come from the (small) benchmark table: distinct
  n-grams are aggregated then BROADCAST to the corpus-side semi join —
  the corpus is never shuffled, and each corpus partition streams its
  exploded n-grams against the in-memory hash relation;
- corpus-side n-gram explosion is ~tokens-per-doc rows per document,
  filtered by the join immediately — nothing materializes;
- redaction is regexp_replace/regexp_count column expressions: one scan,
  zero shuffles, whole-stage-codegen'd.

Token model is shared with operators/text.py (whitespace runs), so every
result is reproducible in the DuckDB oracle. Regex patterns restrict to
the RE2-compatible subset (no backrefs/lookaround) so Spark (Java regex)
and DuckDB (RE2) agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from snowplow_s3_loader_spark.operators.text import tokens

# RE2-safe PII patterns (both engines agree on these)
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
CARD_RE = r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b"


def word_ngrams(text: Column, n: int) -> Column:
    """Array of space-joined word n-grams (empty when the document has
    fewer than n tokens — guarded: sequence() would otherwise run
    DESCENDING for negative spans and explode)."""
    toks = tokens(text)
    spans = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(spans, lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 8,
    benchmark_broadcast: bool = True,
) -> DataFrame:
    """(id, n_shared_ngrams, contaminated) per corpus document: how many
    of the document's distinct word n-grams appear anywhere in the
    benchmark, and whether any do.

    With benchmark_broadcast=True (default) the benchmark n-gram set is
    distinct-aggregated and broadcast (eval benchmarks are tiny next to a
    pretraining corpus). When the "benchmark" is itself huge — e.g.
    decontaminating against every eval suite ever published, or against
    another corpus — set benchmark_broadcast=False: the corpus-side gram
    stream is then reduced by a blocked-bloom prefilter (a compact bit_or
    filter over the benchmark grams, broadcast in place of the grams
    themselves) before the exact semi join, so the big-big join's shuffle
    only moves grams the bloom passed. Results are identical (the bloom
    is exact-after-confirmation); pytest pins the equality.

    Documents with no overlap survive the left join with count 0 — every
    input row is present in the output, so the operator composes with
    filters either way (drop contaminated / route to audit).
    """
    bench_text = bench_text_col or text_col
    bench_grams = (
        benchmark.select(F.explode(word_ngrams(F.col(bench_text), n)).alias("gram"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode_outer(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram"),
    )
    if benchmark_broadcast:
        matched = doc_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
    else:
        from snowplow_s3_loader_spark.operators.bloom import bloom_prefilter_semi_join

        matched = bloom_prefilter_semi_join(doc_grams, bench_grams, "gram")
    hits = matched.groupBy("id").agg(F.count("*").alias("n_shared_ngrams"))
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(hits, "id", "left").select(
        "id",
        F.coalesce("n_shared_ngrams", F.lit(0)).cast("long").alias("n_shared_ngrams"),
        (F.coalesce("n_shared_ngrams", F.lit(0)) > 0).alias("contaminated"),
    )


def remove_repeated_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    min_repeat: int = 2,
) -> DataFrame:
    """Cross-document repeated-substring removal (the ExactSubstr dedup of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL'22 — there via parallel suffix arrays; here as the
    relational formulation a shared-nothing engine wants):

    1. every k-token span (word k-gram with its start position) is
       counted corpus-wide; spans of grams occurring >= min_repeat times
       anywhere (across OR within documents) are duplication witnesses;
    2. per document, overlapping witness spans merge into maximal islands
       (gaps-and-islands: a span starts a new island iff its start
       exceeds the running max end of all earlier spans);
    3. tokens covered by any island are dropped and the survivors are
       re-joined in order.

    Returns (id, n_dup_spans, n_tokens_removed, cleaned_text) with every
    input row present; cleaned_text is whitespace-normalized (token
    re-join). Deterministic: integer positions and counts only, so the
    DuckDB oracle hash-matches.

    Scale shape: the gram count is one partial+final hash aggregation
    (the same shuffle TF-IDF's df pays — the suffix-array work
    re-expressed as aggregation); witness spans are a semi join of the
    exploded grams against the (duplicated-only) gram set; the island
    merge is a per-document window over span starts; the rebuild is one
    id-keyed join + ordered re-assembly. Nothing is driver-side.
    """
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(word_ngrams(F.col(text_col), k)).alias("pos", "gram"),
    )
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_repeat)
        .select("gram")
    )
    witness = grams.join(dup_grams, "gram", "left_semi").select(
        "id", "pos", (F.col("pos") + (k - 1)).alias("end")
    )
    w_prev = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        witness.withColumn("prev_end", F.max("end").over(w_prev))
        .withColumn(
            "new_island",
            (F.col("prev_end").isNull() | (F.col("pos") > F.col("prev_end"))).cast("int"),
        )
        .withColumn("island", F.sum("new_island").over(w_run))
        .groupBy("id", "island")
        .agg(F.min("pos").alias("s"), F.max("end").alias("e"))
    )
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    spans = islands.select(
        F.col("id").alias("sid"), "s", "e"
    )
    kept = toks.join(
        spans,
        (F.col("id") == F.col("sid")) & F.col("pos").between(F.col("s"), F.col("e")),
        "left_anti",
    )
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda st: st.tok,
            ),
            " ",
        ).alias("cleaned_text")
    )
    span_stats = islands.groupBy("id").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("n_tokens_removed"),
    )
    base = docs.select(F.col(id_col).alias("id"))
    return (
        base.join(span_stats, "id", "left")
        .join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce("n_tokens_removed", F.lit(0)).cast("long").alias("n_tokens_removed"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_cards) found in the text."""
    return (
        F.regexp_count(text, F.lit(EMAIL_RE)).cast("int"),
        F.regexp_count(text, F.lit(IPV4_RE)).cast("int"),
        F.regexp_count(text, F.lit(CARD_RE)).cast("int"),
    )


def redact_pii(text: Column) -> Column:
    """Text with email/IPv4/card spans replaced by typed mask tokens.
    Order matters: cards before IPs (a dashed card is not an IP), emails
    first (an email's domain must not be half-masked by a later rule)."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, CARD_RE, "<CARD>")
    return F.regexp_replace(out, IPV4_RE, "<IP>")


def redaction_report(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_emails, n_ips, n_cards, redacted) per document — the audit
    artifact a curation pipeline keeps next to the cleaned corpus."""
    t = F.col(text_col)
    n_emails, n_ips, n_cards = pii_counts(t)
    return docs.select(
        F.col(id_col).alias("id"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_cards.alias("n_cards"),
        redact_pii(t).alias("redacted"),
    )


def strip_boilerplate_lines(
    docs: DataFrame, id_col: str, text_col: str, max_doc_freq: int
) -> DataFrame:
    """Line-level boilerplate removal (the RefinedWeb / CCNet paragraph
    rule): a line appearing verbatim in MORE than ``max_doc_freq``
    distinct documents is boilerplate (headers, nav bars, cookie
    banners, license footers) and is dropped from every document; text
    reassembles from the surviving lines in their original order.
    Returns (id, n_lines, n_removed, clean_text).

    Scale shape: one posexplode over the corpus, one line-keyed
    count-distinct (map-side combined partials), then the flagging join
    back on the line key and ONE per-document aggregation that computes
    the counts and the ordered reassembly together (collect_list of
    (pos, line) structs is document-sized state — the same bound as the
    document itself). The boilerplate side of the join is, by
    definition, the few-distinct/high-frequency slice, so AQE's runtime
    sizing broadcasts it in practice; the plan stays correct either
    way. Documents whose every line is boilerplate come back with
    ``clean_text = ''`` (not null)."""
    if max_doc_freq < 1:
        raise ValueError(f"max_doc_freq must be >= 1, got {max_doc_freq}")
    lines = docs.select(
        F.col(id_col).alias("__doc"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    )
    boiler = (
        lines.groupBy("__line")
        .agg(F.count_distinct("__doc").alias("__df"))
        .where(F.col("__df") > max_doc_freq)
        .select("__line", F.lit(1).alias("__boiler"))
    )
    flagged = lines.join(boiler, "__line", "left")
    kept_struct = F.when(
        F.col("__boiler").isNull(), F.struct("__pos", "__line")
    )
    return flagged.groupBy("__doc").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("__boiler") == 1, 1).otherwise(0)).alias(
            "n_removed"
        ),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda x: x["__line"],
            ),
            "\n",
        ).alias("clean_text"),
    ).withColumnRenamed("__doc", "id")
