"""Dynamic partitioned output paths — pure-Python port of the reference's one
real algorithm (DynamicPath.scala:54-108, spec DynamicPathSpec.scala:24-39).

Template substitutions:
  schema-derived: {vendor} {schema} {name} {format} {model}
                  ({schema} and {name} are aliases for the schema name,
                  DynamicPath.scala:24-30)
  time-derived (UTC): {yyyy} {MM} {dd} {HH} {mm} {ss}

Behavioral contract (verified by tests mirroring DynamicPathSpec):
  - the atomic schema leaves schema tokens UNRESOLVED (DynamicPath.scala:85-87)
  - enriched purpose forbids schema tokens ("Enriched events can only get
    partitioned by date and time", DynamicPath.scala:38-45)
  - SDJ purpose defaults the template to "{vendor}.{schema}" when unset
    (DynamicPath.scala:46-49)
  - duplicate slashes are collapsed (DynamicPathSpec.scala:111-121)
  - filename = <prefix><yyyy-MM-dd-HHmmss>-<uuid>.gz (DynamicPath.scala:103-108)
"""

from __future__ import annotations

import re
import uuid as uuid_mod
from datetime import datetime, timezone

from snowplow_s3_loader_spark.igluschema import ATOMIC_SCHEMA, SchemaKey

SCHEMA_TOKENS = ("{vendor}", "{schema}", "{name}", "{format}", "{model}")
TIME_TOKENS = ("{yyyy}", "{MM}", "{dd}", "{HH}", "{mm}", "{ss}")

ENRICHED_PARTITIONING_ERROR = "Enriched events can only get partitioned by date and time"
DEFAULT_SDJ_TEMPLATE = "{vendor}.{schema}"

_DUP_SLASH_RE = re.compile(r"(?<!:)/{2,}")  # collapse // but keep scheme://


def _utc(now: datetime) -> datetime:
    if now.tzinfo is None:
        return now.replace(tzinfo=timezone.utc)
    return now.astimezone(timezone.utc)


def _time_substitutions(now: datetime) -> dict[str, str]:
    t = _utc(now)
    return {
        "{yyyy}": f"{t.year:04d}",
        "{MM}": f"{t.month:02d}",
        "{dd}": f"{t.day:02d}",
        "{HH}": f"{t.hour:02d}",
        "{mm}": f"{t.minute:02d}",
        "{ss}": f"{t.second:02d}",
    }


def _schema_substitutions(schema: SchemaKey) -> dict[str, str]:
    return {
        "{vendor}": schema.vendor,
        "{schema}": schema.name,
        "{name}": schema.name,
        "{format}": schema.format,
        "{model}": str(schema.model),
    }


def contains_schema_tokens(template: str) -> bool:
    return any(tok in template for tok in SCHEMA_TOKENS)


def get_partition(template: str | None, schema: SchemaKey, now: datetime) -> str:
    """Resolve the partition directory for one (schema, flush-time) pair."""
    if not template:
        return ""
    out = template
    for tok, val in _time_substitutions(now).items():
        out = out.replace(tok, val)
    if schema != ATOMIC_SCHEMA:
        for tok, val in _schema_substitutions(schema).items():
            out = out.replace(tok, val)
    return out


def get_filename(prefix: str | None, now: datetime, uid: str | None = None) -> str:
    t = _utc(now)
    stamp = t.strftime("%Y-%m-%d-%H%M%S")
    uid = uid if uid is not None else str(uuid_mod.uuid4())
    return f"{prefix or ''}{stamp}-{uid}.gz"


def normalize_path(path: str) -> str:
    return _DUP_SLASH_RE.sub("/", path)


def get_full_path(
    base: str,
    prefix: str | None,
    template: str | None,
    now: datetime,
    schema: SchemaKey,
    uid: str | None = None,
) -> str:
    """base URI + resolved partition + filename, duplicate slashes collapsed."""
    partition = get_partition(template, schema, now)
    return normalize_path("/".join(p for p in (base, partition, get_filename(prefix, now, uid)) if p))


def validate_partition_format(purpose: str, template: str | None) -> tuple[str | None, str | None]:
    """Config-time validation hook (reference Config.scala:122).

    Returns (resolved_template, error). Enriched purpose + schema tokens is
    an error; SDJ purpose with no template gets the default.
    """
    if purpose == "ENRICHED_EVENTS":
        if template and contains_schema_tokens(template):
            return None, ENRICHED_PARTITIONING_ERROR
        return template, None
    # SELF_DESCRIBING
    return (template if template else DEFAULT_SDJ_TEMPLATE), None
