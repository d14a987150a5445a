"""Partition-path templating as column expressions (vectorized twin of
dynamic_path.get_partition — reference DynamicPath.scala:54-108).

Used when the path must be computed per-row at scale (Q17 of the query
contract): pure concat/date_format expressions, no UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(r"\{(yyyy|MM|dd|HH|mm|ss|vendor|schema|name|format|model)\}")

_TIME_FMT = {"yyyy": "yyyy", "MM": "MM", "dd": "dd", "HH": "HH", "mm": "mm", "ss": "ss"}


def partition_path(
    template: str,
    schema_key: Column,
    ts: Column,
) -> Column:
    """Resolve a partition template to a per-row path column.

    schema_key: struct<vendor,name,format,model,...> column; ts: timestamp
    column (UTC semantics — session tz must be UTC for LTZ inputs).
    """
    parts: list[Column] = []
    pos = 0
    for m in _TOKEN_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        tok = m.group(1)
        if tok in _TIME_FMT:
            parts.append(F.date_format(ts, _TIME_FMT[tok]))
        elif tok == "vendor":
            parts.append(schema_key["vendor"])
        elif tok in ("schema", "name"):
            parts.append(schema_key["name"])
        elif tok == "format":
            parts.append(schema_key["format"])
        elif tok == "model":
            parts.append(schema_key["model"].cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts)
