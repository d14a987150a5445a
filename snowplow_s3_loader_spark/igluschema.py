"""Iglu schema keys — the one structured type in the reference's data model.

A SchemaKey is the 5-tuple parsed from an iglu URI
``iglu:<vendor>/<name>/<format>/<model>-<revision>-<addition>`` used for
grouping and path templating (reference DynamicPath.scala:24-30,
Processing.scala:175-187). All enriched events are keyed under the sentinel
``ATOMIC_SCHEMA`` (reference package.scala:16).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

IGLU_URI_RE = re.compile(
    r"^iglu:"
    r"(?P<vendor>[a-zA-Z0-9\-_.]+)/"
    r"(?P<name>[a-zA-Z0-9\-_]+)/"
    r"(?P<format>[a-zA-Z0-9\-_]+)/"
    r"(?P<model>[1-9][0-9]*)-(?P<revision>0|[1-9][0-9]*)-(?P<addition>0|[1-9][0-9]*)$"
)

# Spark-side equivalent of IGLU_URI_RE (java.util.regex syntax, same meaning).
IGLU_URI_REGEXP = (
    r"^iglu:([a-zA-Z0-9\-_.]+)/([a-zA-Z0-9\-_]+)/([a-zA-Z0-9\-_]+)/"
    r"([1-9][0-9]*)-(0|[1-9][0-9]*)-(0|[1-9][0-9]*)$"
)


@dataclass(frozen=True)
class SchemaKey:
    vendor: str
    name: str
    format: str
    model: int
    revision: int
    addition: int

    @classmethod
    def parse(cls, uri: str) -> "SchemaKey | None":
        m = IGLU_URI_RE.match(uri)
        if not m:
            return None
        return cls(
            vendor=m.group("vendor"),
            name=m.group("name"),
            format=m.group("format"),
            model=int(m.group("model")),
            revision=int(m.group("revision")),
            addition=int(m.group("addition")),
        )

    def to_uri(self) -> str:
        return (
            f"iglu:{self.vendor}/{self.name}/{self.format}/"
            f"{self.model}-{self.revision}-{self.addition}"
        )


ATOMIC_SCHEMA = SchemaKey(
    vendor="com.snowplowanalytics.snowplow",
    name="atomic",
    format="jsonschema",
    model=1,
    revision=0,
    addition=0,
)
ATOMIC_SCHEMA_URI = ATOMIC_SCHEMA.to_uri()
