"""Changelog application (CDC merge / upsert) — apply a stream of keyed
INSERT/UPDATE/DELETE change records to a snapshot table, latest change
per key wins. The lakehouse MERGE primitive every incremental curation
pipeline needs (refresh a document corpus from a crawl delta, apply
takedown/deletion lists, upsert re-scored quality columns) — beyond the
reference's surface (its loader appends blobs and has no table
semantics at all, Processing.scala:69-77 / S3Sink.scala:29-58).

Scale mechanics:
- resolving "latest change per key" is ONE window shuffle over the
  changelog — the changelog, not the snapshot, which is typically
  orders of magnitude smaller;
- applying it is ONE left-anti join on the key (drop every snapshot row
  that has any change, then union the surviving upserts back in). When
  the resolved changelog is small it broadcasts (AQE decides from the
  post-window size; `broadcast_changes=True` forces the hint), so the
  100 TB snapshot never shuffles at all — the scan streams through a
  broadcast-hash anti join and the union.
- the snapshot is never windowed, sorted, or re-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """One row per key: the change with the highest ``seq_col`` (the
    winning change under last-writer-wins). Sequence ties break on
    ``op_col`` descending ('U' > 'D' in ASCII, so an update outranks a
    delete carrying the same sequence number) — callers with a real
    total order (log offset, LSN) never hit the tie-break. Rows tied on
    (key, seq, op) but carrying DIFFERENT payloads take a final
    deterministic tie-break on the payload's xxhash64, so the winner is
    stable across runs and engines instead of depending on scan order
    (fully identical duplicate rows are interchangeable either way).
    Map-typed payload columns are skipped from the hash (xxhash64 does
    not support MapType, and raising would break callers that have a
    real total order in ``seq_col`` and never hit the tie-break); rows
    differing ONLY in a map column remain tie-broken arbitrarily — give
    such changelogs a real total order."""
    from pyspark.sql.types import MapType

    schema = {f.name: f.dataType for f in changes.schema.fields}
    payload = [
        c
        for c in changes.columns
        if c not in (*keys, seq_col, op_col)
        and not isinstance(schema[c], MapType)
    ]
    order = [F.col(seq_col).desc(), F.col(op_col).desc()]
    if payload:
        order.append(F.xxhash64(*[F.col(c) for c in payload]).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a keyed changelog:
    every non-delete change becomes a VERSION row valid from its own
    sequence number until the next change's (``valid_to_seq`` null on
    the open version); a delete closes the preceding version (its
    sequence becomes that version's ``valid_to_seq``) and emits no row
    of its own. ``is_current`` marks open versions. The warehouse twin
    of apply_changelog: MERGE keeps only the latest state, SCD2 keeps
    the full validity timeline.

    One window pass over the CHANGELOG (lead over the same total order
    latest_changes uses — seq, then op, then the payload hash, so the
    two operators never disagree about ordering); the changelog, not
    any snapshot, is all that shuffles. Changelogs whose (keys, seq)
    is a genuine total order — log offsets, LSNs — get
    oracle-reproducible output; ties fall back to the documented
    deterministic hash order."""
    from pyspark.sql.types import MapType

    for c in (*keys, seq_col, op_col):
        if c not in changes.columns:
            raise ValueError(f"changes is missing required column {c!r}")
    schema = {f.name: f.dataType for f in changes.schema.fields}
    payload = [
        c
        for c in changes.columns
        if c not in (*keys, seq_col, op_col)
        and not isinstance(schema[c], MapType)
    ]
    order = [F.col(seq_col).asc(), F.col(op_col).asc()]
    if payload:
        order.append(F.xxhash64(*[F.col(c) for c in payload]).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("__next_seq", F.lead(seq_col).over(w))
        .where(F.col(op_col) != delete_op)
        .select(
            *keys,
            *[c for c in changes.columns if c not in (*keys, seq_col, op_col)],
            F.col(seq_col).alias("valid_from_seq"),
            F.col("__next_seq").alias("valid_to_seq"),
            F.col("__next_seq").isNull().cast("boolean").alias("is_current"),
        )
    )


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    broadcast_changes: bool = False,
) -> DataFrame:
    """MERGE the changelog into the snapshot: for every key with at
    least one change, the latest change wins — a ``delete_op`` row
    removes the key, any other op replaces (or inserts) the row with
    the change's payload columns. Keys without changes pass through
    untouched.

    ``changes`` must carry every snapshot column (the upsert payload)
    plus ``seq_col`` and ``op_col``. The result has exactly the
    snapshot's schema.
    """
    for c in (*keys, seq_col, op_col):
        if c not in changes.columns:
            raise ValueError(f"changes is missing required column {c!r}")
    missing = [c for c in snapshot.columns if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing snapshot payload columns {missing}")
    latest = latest_changes(changes, keys, seq_col, op_col)
    touched = latest.select(*keys)
    if broadcast_changes:
        # hint only the join side; the upsert branch is a union (no join)
        touched = F.broadcast(touched)
    upserts = latest.where(F.col(op_col) != delete_op).select(*snapshot.columns)
    return snapshot.join(touched, keys, "left_anti").unionByName(upserts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level diff between two snapshots of the same keyed table:
    one row per key present in either side, classified as ``added``
    (key only in ``new``), ``removed`` (only in ``old``), ``changed``
    (both sides, any payload column differs — SQL ``IS DISTINCT FROM``
    semantics, so NULL vs value counts as a change and NULL vs NULL
    does not), or ``unchanged`` (emitted only with
    ``include_unchanged=True``). The dataset-versioning audit primitive:
    what did this crawl/ingest/backfill actually touch?

    ONE full-outer join on the key and a pure-expression classifier —
    both sides shuffle once on the key (or less: AQE broadcasts a
    small side), payload comparison never leaves the JVM. Schemas must
    match; column order may differ.
    """
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshots differ in columns: {sorted(set(old.columns) ^ set(new.columns))}"
        )
    payload = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in payload],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in payload],
        F.lit(True).alias("__in_new"),
    )
    changed = F.lit(False)
    for c in payload:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    out = o.join(n, keys, "full_outer").select(
        *keys,
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )
    if not include_unchanged:
        out = out.where(F.col("change_type") != "unchanged")
    return out
