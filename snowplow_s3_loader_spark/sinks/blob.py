"""Blob sink — O8/O10 of the reference (DynamicPath.scala:54-108,
S3Sink.scala:29-58, writeToStorage Processing.scala:281-300).

Writes one flushed batch as gzip-compressed newline-terminated text objects,
one-or-more files per schema partition, at template-resolved paths with
reference-style filenames `<prefix><yyyy-MM-dd-HHmmss>-<uuid>.gz`.

Spark-first design: a single distributed write job (partitionBy on the
resolved partition string, gzip codec on the text sink, maxRecordsPerFile
for the byte-cap soft limit), then a driver-side rename pass to the
reference's layout. The rename touches only file *names* (count = files per
batch, bounded by maxBytes rolling), never data — on S3A this is a metadata
copy per file, same cost profile as the reference's one PutObject per file.

The byte cap mirrors the reference's *soft* maxBytes semantics
(Processing.scala:249 checks after exceeding; config comment calls it a soft
limit): we translate maxBytes to a record-count cap using the batch's
average compressed-line estimate rather than tracking exact compressed bytes.
"""

from __future__ import annotations

import os
import shutil
import uuid as uuid_mod
from dataclasses import dataclass, field
from datetime import datetime, timezone
from urllib.parse import unquote

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snowplow_s3_loader_spark.dynamic_path import get_filename, normalize_path

# partition column name used during the staged write; '~' replaces '/' so the
# whole template path stays one partitionBy column
_PP = "__pp"
_SLASH = "~"

# assumed gzip ratio for translating maxBytes (compressed) into a row-count
# soft cap; the reference itself sizes buffers with similar heuristics
# (Environment.scala:122-130)
GZIP_RATIO_ESTIMATE = 0.4


@dataclass
class WrittenFile:
    path: str
    n_bytes: int


@dataclass
class BlobWriteResult:
    files: list[WrittenFile] = field(default_factory=list)


def write_batch(
    df: DataFrame,
    base_dir: str,
    partition_col: str,
    value_col: str = "value",
    prefix: str = "",
    max_bytes: int = 67_108_864,
    now: datetime | None = None,
    deterministic_uuids: bool = False,
) -> BlobWriteResult:
    """Write one batch: rows carry their resolved partition path in
    `partition_col` ('' for unpartitioned). Returns the written files.

    Local-FS implementation of the rename pass; on S3A the same logic runs
    against the Hadoop FileSystem API (rename = server-side copy).
    """
    now = now or datetime.now(timezone.utc)
    staging = os.path.join(base_dir, "_staging_" + uuid_mod.uuid4().hex[:8])

    staged = df.select(
        F.col(value_col).alias("value"),
        F.regexp_replace(F.coalesce(F.col(partition_col), F.lit("")), "/", _SLASH).alias(_PP),
    )

    # soft byte cap -> row cap from the batch's average line size estimate
    est = staged.select(
        F.avg(F.octet_length("value")).alias("avg_len"), F.count("*").alias("n")
    ).first()
    if est["n"] == 0:
        return BlobWriteResult()
    avg_compressed = max(1.0, float(est["avg_len"] or 1.0) * GZIP_RATIO_ESTIMATE)
    max_records_per_file = max(1, int(max_bytes / avg_compressed))

    (
        staged.repartition(F.col(_PP))
        .write.partitionBy(_PP)
        .option("compression", "gzip")
        .option("maxRecordsPerFile", max_records_per_file)
        .mode("overwrite")
        .text(staging)
    )

    result = BlobWriteResult()
    for root, _dirs, files in os.walk(staging):
        gz_files = sorted(f for f in files if f.endswith(".gz"))
        if not gz_files:
            continue
        rel = os.path.relpath(root, staging)
        partition = ""
        if rel.startswith(_PP + "="):
            partition = unquote(rel[len(_PP) + 1 :]).replace(_SLASH, "/")
        if partition == "__HIVE_DEFAULT_PARTITION__":
            partition = ""
        target_dir = normalize_path(os.path.join(base_dir, partition) if partition else base_dir)
        os.makedirs(target_dir, exist_ok=True)
        for i, fname in enumerate(gz_files):
            uid = f"{i:04d}" if deterministic_uuids else str(uuid_mod.uuid4())
            out_name = get_filename(prefix, now, uid)
            src = os.path.join(root, fname)
            dst = os.path.join(target_dir, out_name)
            shutil.move(src, dst)
            result.files.append(WrittenFile(path=dst, n_bytes=os.path.getsize(dst)))
    shutil.rmtree(staging, ignore_errors=True)
    result.files.sort(key=lambda f: f.path)
    return result
