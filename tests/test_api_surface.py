"""API-surface parity beyond the core batteries: Python UDTFs (the last
UDF flavor SURVEY SS2.3 lists — scalar pandas_udf, applyInPandas,
mapInPandas, applyInPandasWithState are covered elsewhere) and
non-parquet source formats (ORC / CSV / JSON round-trips through the
same frames the engine serves from parquet)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowplow_s3_loader_spark.tables import load_table

# ---------------------------------------------------------------------------
# Python UDTF
# ---------------------------------------------------------------------------


def test_python_udtf_matches_builtin_chunker(spark, sf_dir):
    """A table-function chunker (one input row -> many output rows) must
    agree with the pure-JVM chunk_documents at overlap=0. UDTFs are the
    escape hatch for row-expanding logic the built-ins can't express;
    this pins the wiring (registration, lateral join, schema) on a case
    where a built-in twin CAN check it."""
    from pyspark.sql.functions import udtf

    from snowplow_s3_loader_spark.operators.text import chunk_documents

    @udtf(returnType="chunk_id int, chunk_text string")
    class ChunkWords:
        def eval(self, text: str, size: int):
            toks = text.split()
            for i in range(0, len(toks), size):
                yield i // size, " ".join(toks[i : i + size])

    spark.udtf.register("chunk_words", ChunkWords)
    docs = load_table(spark, sf_dir, "documents").limit(40)
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        """
        SELECT d.doc_id AS id, c.chunk_id, c.chunk_text
        FROM udtf_docs d, LATERAL chunk_words(d.text, 16) c
        """
    )
    want = chunk_documents(docs, "doc_id", "text", window=16, overlap=0).select(
        "id", "chunk_id", "chunk_text"
    )
    g = {(r["id"], r["chunk_id"], r["chunk_text"]) for r in got.collect()}
    w = {(r["id"], r["chunk_id"], r["chunk_text"]) for r in want.collect()}
    assert g == w and g


def test_python_udtf_arrow_variant(spark):
    """The Arrow-optimized UDTF path (batch transfer) must behave
    identically to the pickled path."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="n int, sq bigint", useArrow=True)
    class Squares:
        def eval(self, upto: int):
            for i in range(upto):
                yield i, i * i

    rows = Squares(lit(6)).collect()
    assert [(r["n"], r["sq"]) for r in rows] == [(i, i * i) for i in range(6)]


# ---------------------------------------------------------------------------
# source format parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fmt", ["orc", "csv", "json"])
def test_format_roundtrip_documents(spark, sf_dir, fmt, tmp_path):
    """documents written to ORC/CSV/JSON and read back must carry the
    exact same rows (checksums over ids and text fingerprints) — the
    engine is not parquet-bound."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    path = str(tmp_path / f"docs_{fmt}")
    writer = docs.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", True).option("escape", '"')
    writer.format(fmt).save(path)
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", True).schema(docs.schema)
    elif fmt == "json":
        reader = reader.schema(docs.schema)
    back = reader.format(fmt).load(path)

    def summary(df):
        return df.agg(
            F.count("*").alias("n"),
            F.sum("doc_id").alias("id_sum"),
            F.sum(F.crc32(F.concat_ws("|", "lang", "source", "text"))).alias("crc"),
        ).collect()[0]

    assert summary(back) == summary(docs)


def test_variant_semi_structured_extraction(spark, sf_dir):
    """Spark 4 VARIANT path for semi-structured JSON: parse_json +
    variant_get must agree with the string-path get_json_object the
    existing JSON battery uses."""
    ev = load_table(spark, sf_dir, "events").limit(200)
    both = ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("via_variant"),
        F.get_json_object("props", "$.k").cast("int").alias("via_string"),
    )
    rows = both.collect()
    assert rows and all(r["via_variant"] == r["via_string"] for r in rows)


def test_bench_compact_headline_fits_driver_tail_capture():
    """bench.py's FINAL printed line is the driver's only perf signal; it
    must parse standalone and stay far inside the 2 KB tail capture
    (the per-query line exceeded it for four rounds — never again)."""
    import importlib.util
    import json as _json

    spec = importlib.util.spec_from_file_location("bench_mod", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from snowplow_s3_loader_spark.plans.queries import QUERIES

    canary = {n.split("_")[0]: 12345.678 for n in mod.CANARIES}
    # worst-case family fold: every registry query at a 4-digit wall
    fam = mod.family_subtotals({n: 9999.999 for n in QUERIES})
    line = mod.compact_headline(98765.432, 0.1, 102, 2, canary, fam)
    assert len(line) < 1600
    parsed = _json.loads(line)
    assert parsed["metric"] == "total_query_set_seconds"
    assert parsed["value"] == 98765.432 and parsed["n_queries"] == 102
    assert "queries" not in parsed
    assert parsed["canary"] == canary
    assert parsed["canary_total"] == round(sum(canary.values()), 3)
    # the untouched-canary host probe (round 14): exactly the four
    # never-optimized members, so cross-round normalization cannot
    # conflate host drift with code wins
    assert parsed["canary_untouched_total"] == round(
        sum(canary[c] for c in mod.CANARY_UNTOUCHED), 3
    )
    assert parsed["fam"] == fam
    # canary-less headline (subprocess failure path) still parses
    bare = _json.loads(mod.compact_headline(1.0, 0.1, 102, 2, None))
    assert "canary" not in bare and "fam" not in bare


def test_bench_family_map_covers_registry():
    """Every declared single must map to exactly one family — an
    unmapped query would silently land in 'oth' and break per-family
    attribution; a double-mapped one would double-count."""
    import importlib.util

    from snowplow_s3_loader_spark.plans.queries import QUERIES

    spec = importlib.util.spec_from_file_location("bench_mod", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assigned = [q for qs in mod.FAMILIES.values() for q in qs]
    assert len(assigned) == len(set(assigned)), "double-mapped query number"
    nums = {int(n.split("_")[0][1:]) for n in QUERIES}
    assert nums == set(assigned), (
        sorted(nums - set(assigned)),
        sorted(set(assigned) - nums),
    )
    fam = mod.family_subtotals({n: 1.0 for n in QUERIES})
    assert "oth" not in fam
    # untouched canaries resolve against the canary short keys
    canary_shorts = {n.split("_")[0] for n in mod.CANARIES}
    assert set(mod.CANARY_UNTOUCHED) <= canary_shorts


def test_bench_canaries_exist_and_are_pinned():
    """The canary set must always resolve against the live registry —
    a silent rename would drop a canary and skew the normalization
    denominator across rounds."""
    import importlib.util

    from snowplow_s3_loader_spark.plans.queries import QUERIES

    spec = importlib.util.spec_from_file_location("bench_mod", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert len(mod.CANARIES) == 8
    for name in mod.CANARIES:
        assert name in QUERIES, f"canary {name} missing from the registry"
    # short keys (the headline fold) must be unique
    shorts = [n.split("_")[0] for n in mod.CANARIES]
    assert len(set(shorts)) == len(shorts)
