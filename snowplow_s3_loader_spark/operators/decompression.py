"""Record-envelope decompression — O1 of the reference
(Processing.scala:40-51; common-streams Decompression, behavior visible in
ProcessingSpec.scala:163-256 and config core reference.conf:26-29).

A single source record may be a compressed *envelope* expanding to many
records. Framing (observed in the corrupt-fixture builder,
ProcessingSpec.scala:273-285): inside the compression stream —
1 byte compression-format version, 1 byte payload-format version, then
repeated [u32 big-endian length][record bytes].

Magic-byte autodetection: zstd = 28 B5 2F FD, gzip = 1F 8B; anything else is
passed through as a single plain record.

Limits (reference.conf:27-28): maxBytesInBatch (5 MiB) — stop expanding an
envelope past this budget; maxBytesSinglePayload (10 MB) — oversize record
is dropped and surfaced as a failure.

Spark-side: this is the one genuinely imperative per-record step, so it runs
as mapInPandas over the binary column (Arrow batches, not row-at-a-time).
zstd decodes through pyarrow's bundled codec (streaming, no frame-content-size
required); gzip uses zlib streaming decompression. Both are capped at a
multiple of maxBytesInBatch so a decompression bomb cannot OOM a worker.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
GZIP_MAGIC = b"\x1f\x8b"

MAX_BYTES_IN_BATCH = 5_242_880
MAX_BYTES_SINGLE_PAYLOAD = 10_000_000

MSG_CANT_DECOMPRESS = "Cannot decompress record"
MSG_OVERSIZE = "Decompressed payload exceeds maxBytesSinglePayload"
MSG_ZSTD_UNAVAILABLE = "zstd decompression unavailable (no zstd codec in pyarrow)"
MSG_STREAM_CAP = "decompressed stream exceeds decompression cap"

# Bomb guard: refuse to expand any single envelope past this multiple of the
# batch budget (the envelope parser then enforces the exact budgets).
_DECOMPRESS_CAP_MULTIPLIER = 4

DECOMPRESSED_SCHEMA = StructType(
    [
        StructField("value", StringType()),
        StructField("decompress_error", StringType()),
    ]
)


@dataclass
class DecompressionLimits:
    max_bytes_in_batch: int = MAX_BYTES_IN_BATCH
    max_bytes_single_payload: int = MAX_BYTES_SINGLE_PAYLOAD


def _zstd_decompress(payload: bytes, cap: int) -> bytes:
    """Streaming zstd decode via pyarrow's bundled codec.

    `pa.CompressedInputStream` does NOT need the frame-content-size header, so
    it handles frames from both one-shot and streaming zstd writers (the
    reference accepts either — zstd-jni streams, ProcessingSpec.scala:163-256).
    Reads are capped at `cap` bytes to bound decompression bombs.
    """
    try:
        import pyarrow as pa

        if not pa.Codec.is_available("zstd"):
            raise NotImplementedError(MSG_ZSTD_UNAVAILABLE)
    except ImportError as e:  # pragma: no cover - pyarrow is a hard dep of pyspark
        raise NotImplementedError(MSG_ZSTD_UNAVAILABLE) from e
    stream = pa.CompressedInputStream(pa.BufferReader(payload), "zstd")
    out = stream.read(cap + 1)
    if len(out) > cap:
        raise ValueError(MSG_STREAM_CAP)
    return out


def _gzip_decompress(payload: bytes, cap: int) -> bytes:
    """Capped multi-member gzip decode (zlib streaming, wbits=47 accepts gzip
    headers). Unlike `gzip.decompress`, never materializes more than `cap`+1
    bytes, so a gzip bomb cannot OOM a worker."""
    chunks: list[bytes] = []
    total = 0
    data = payload
    while True:
        d = zlib.decompressobj(wbits=47)
        chunk = d.decompress(data, cap + 1 - total)
        chunks.append(chunk)
        total += len(chunk)
        if total > cap:
            raise ValueError(MSG_STREAM_CAP)
        while d.unconsumed_tail and not d.eof:
            chunk = d.decompress(d.unconsumed_tail, cap + 1 - total)
            chunks.append(chunk)
            total += len(chunk)
            if total > cap:
                raise ValueError(MSG_STREAM_CAP)
        if not d.eof:
            raise ValueError("truncated gzip stream")
        data = d.unused_data
        if not data:
            return b"".join(chunks)


def _parse_envelope(stream: bytes, limits: DecompressionLimits) -> list[bytes]:
    """Parse the decompressed envelope: 2 header bytes then length-prefixed
    records. Raises ValueError on truncation/corruption."""
    if len(stream) < 2:
        raise ValueError("envelope too short for header")
    out: list[bytes] = []
    pos = 2
    budget = limits.max_bytes_in_batch
    while pos < len(stream):
        if pos + 4 > len(stream):
            raise ValueError("truncated record length prefix")
        (length,) = struct.unpack(">I", stream[pos : pos + 4])
        pos += 4
        if pos + length > len(stream):
            raise ValueError("declared record length exceeds available bytes")
        if length > limits.max_bytes_single_payload:
            raise ValueError(MSG_OVERSIZE)
        budget -= length
        if budget < 0:
            raise ValueError("decompressed batch exceeds maxBytesInBatch")
        out.append(stream[pos : pos + length])
        pos += length
    return out


def decompress_record(payload: bytes, limits: DecompressionLimits) -> tuple[list[bytes], str | None]:
    """One source record -> (records, error). Plain records pass through."""
    cap = limits.max_bytes_in_batch * _DECOMPRESS_CAP_MULTIPLIER
    try:
        if payload[:4] == ZSTD_MAGIC:
            return _parse_envelope(_zstd_decompress(payload, cap), limits), None
        if payload[:2] == GZIP_MAGIC:
            return _parse_envelope(_gzip_decompress(payload, cap), limits), None
        return [payload], None
    except NotImplementedError as e:
        return [], str(e)
    except Exception as e:
        return [], f"{MSG_CANT_DECOMPRESS}: {e}"


def decompressed_stream(
    df: DataFrame,
    payload_col: str = "payload",
    limits: DecompressionLimits | None = None,
) -> DataFrame:
    """The Spark twin of `source.decompressedStream` (Processing.scala:44-51):
    binary records in, UTF-8 lines out, failures in `decompress_error`
    (downstream turns them into BadRow.LoaderParsingError,
    Processing.scala:156-165)."""
    limits = limits or DecompressionLimits()

    def _expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            values: list[str | None] = []
            errors: list[str | None] = []
            for payload in pdf[payload_col]:
                payload = bytes(payload)
                records, err = decompress_record(payload, limits)
                if err is not None:
                    values.append(payload.decode("utf-8", errors="replace"))
                    errors.append(err)
                else:
                    for rec in records:
                        values.append(rec.decode("utf-8", errors="replace"))
                        errors.append(None)
            yield pd.DataFrame({"value": values, "decompress_error": errors})

    return df.mapInPandas(_expand, schema=DECOMPRESSED_SCHEMA)


def make_envelope(records: list[bytes], codec: str = "gzip") -> bytes:
    """Build a compressed envelope (test fixture helper, mirrors
    ProcessingSpec.scala:273-285 framing)."""
    body = b"\x01\x01" + b"".join(struct.pack(">I", len(r)) + r for r in records)
    if codec == "gzip":
        import gzip as _gzip

        return _gzip.compress(body, compresslevel=6)
    if codec == "zstd":
        # One-shot frame: carries the frame-content-size header.
        import pyarrow as pa

        return pa.Codec("zstd").compress(body, asbytes=True)
    if codec == "zstd-stream":
        # Streaming frame: NO frame-content-size header (what a zstd-jni
        # OutputStream writer produces) — exercises the size-unaware decode.
        import pyarrow as pa

        sink = pa.BufferOutputStream()
        with pa.CompressedOutputStream(sink, "zstd") as f:
            f.write(body)
        return sink.getvalue().to_pybytes()
    if codec == "plain":
        return body
    raise ValueError(f"unknown codec {codec!r}")
