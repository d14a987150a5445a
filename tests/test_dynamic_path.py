"""1:1 translation of the reference's DynamicPathSpec (DynamicPathSpec.scala:
24-39; fixtures FIXTURES.md F5)."""

from __future__ import annotations

from datetime import datetime, timezone

from snowplow_s3_loader_spark.dynamic_path import (
    DEFAULT_SDJ_TEMPLATE,
    ENRICHED_PARTITIONING_ERROR,
    get_filename,
    get_full_path,
    get_partition,
    normalize_path,
    validate_partition_format,
)
from snowplow_s3_loader_spark.igluschema import ATOMIC_SCHEMA, SchemaKey

SCHEMA = SchemaKey("com.example", "test_event", "jsonschema", 1, 2, 3)
NOW = datetime(2023, 12, 25, 15, 30, 45, tzinfo=timezone.utc)


def test_empty_template():
    assert get_partition(None, SCHEMA, NOW) == ""
    assert get_partition("", SCHEMA, NOW) == ""


def test_time_tokens():
    assert (
        get_partition("year={yyyy}/month={MM}/day={dd}/hour={HH}/minute={mm}/second={ss}", SCHEMA, NOW)
        == "year=2023/month=12/day=25/hour=15/minute=30/second=45"
    )


def test_schema_tokens():
    assert (
        get_partition("{vendor}/{schema}/{name}/{format}/{model}", SCHEMA, NOW)
        == "com.example/test_event/test_event/jsonschema/1"
    )


def test_atomic_schema_not_substituted():
    # DynamicPath.scala:85-87 — atomic schema leaves schema tokens unresolved
    assert (
        get_partition("{vendor}.{schema}.{format}", ATOMIC_SCHEMA, NOW)
        == "{vendor}.{schema}.{format}"
    )


def test_atomic_schema_time_still_substituted():
    assert get_partition("{yyyy}/{vendor}", ATOMIC_SCHEMA, NOW) == "2023/{vendor}"


def test_mixed_tokens():
    assert (
        get_partition("{vendor}/{schema}/year={yyyy}/month={MM}", SCHEMA, NOW)
        == "com.example/test_event/year=2023/month=12"
    )


def test_repeated_tokens():
    assert (
        get_partition("{vendor}/{vendor}-{schema}/{schema}/month={MM}/month={MM}", SCHEMA, NOW)
        == "com.example/com.example-test_event/test_event/month=12/month=12"
    )


def test_filename():
    assert get_filename("pfx-", NOW, "xxxx") == "pfx-2023-12-25-153045-xxxx.gz"
    assert get_filename(None, NOW, "xxxx") == "2023-12-25-153045-xxxx.gz"


def test_full_path_and_slash_normalization():
    p = get_full_path("s3://bucket/output/", "pfx-", "{vendor}/{model}", NOW, SCHEMA, "xxxx")
    assert p == "s3://bucket/output/com.example/1/pfx-2023-12-25-153045-xxxx.gz"
    assert normalize_path("s3://b//a///c") == "s3://b/a/c"
    assert normalize_path("s3://b/a/c") == "s3://b/a/c"


def test_full_path_no_partition():
    p = get_full_path("s3://bucket/out", None, None, NOW, SCHEMA, "xxxx")
    assert p == "s3://bucket/out/2023-12-25-153045-xxxx.gz"


def test_validate_enriched_rejects_schema_tokens():
    # ConfigSpec.scala:42-48 / invalid_partitioning.hocon
    _, err = validate_partition_format("ENRICHED_EVENTS", "{vendor}/{schema}")
    assert err == ENRICHED_PARTITIONING_ERROR


def test_validate_enriched_allows_time_tokens():
    tpl, err = validate_partition_format("ENRICHED_EVENTS", "date={yyyy}-{MM}")
    assert err is None and tpl == "date={yyyy}-{MM}"


def test_validate_sdj_default_template():
    # ConfigSpec.scala:50-87 / default_partitioning_sdjs.hocon
    tpl, err = validate_partition_format("SELF_DESCRIBING", None)
    assert err is None and tpl == DEFAULT_SDJ_TEMPLATE
