"""Enriched-TSV timestamp extraction (reference Processing.scala:143-154).

The reference takes TSV index 3, replaces the space with 'T', appends 'Z',
and parses to Instant; parse errors are silently ignored (.toOption at
Processing.scala:152). Here: split + try_to_timestamp (NULL on failure —
ANSI-safe), which Catalyst keeps entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tsv_field(value: Column, idx: int) -> Column:
    """0-based positional TSV field; NULL when the line has too few fields.

    split(value, '\\t', -1) mirrors the reference's limit=-1 split
    (Processing.scala:146: keep trailing empty fields); F.get returns NULL
    (never ANSI error) past the end.
    """
    return F.get(F.split(value, "\t", -1), idx)


def enriched_collector_tstamp(value: Column) -> Column:
    """collector_tstamp at TSV index 3, 'yyyy-MM-dd HH:mm:ss[.SSS]' lenient."""
    raw = tsv_field(value, 3)
    # try_to_timestamp: NULL on malformed text = reference's ignored errors.
    return F.try_to_timestamp(raw)
