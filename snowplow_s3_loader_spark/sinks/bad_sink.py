"""Bad-row dead-letter sink — O12 (Processing.scala:315-331; Kinesis
producer caps config.aws.reference.hocon:85-103).

Two implementations behind one interface:
  - FileBadSink: newline-delimited JSON files (tests/local runs)
  - KinesisBadSink: boto3 put_records batched to the reference's caps
    (500 records / 5 MiB per call), import-gated — no AWS SDK in the image.
"""

from __future__ import annotations

import os
import uuid as uuid_mod
from dataclasses import dataclass


class BadSink:
    def send(self, serialized_rows: list[bytes]) -> None:  # pragma: no cover
        raise NotImplementedError


@dataclass
class FileBadSink(BadSink):
    directory: str

    def send(self, serialized_rows: list[bytes]) -> None:
        if not serialized_rows:
            return
        os.makedirs(self.directory, exist_ok=True)
        path = os.path.join(self.directory, f"bad-{uuid_mod.uuid4().hex}.jsonl")
        with open(path, "wb") as f:
            for row in serialized_rows:
                f.write(row)
                f.write(b"\n")


@dataclass
class KinesisBadSink(BadSink):
    """PutRecords batching per the reference caps (recordLimit=500,
    byteLimit=5 MiB — hocon:96-99); random partition key (CHANGELOG #180)."""

    stream_name: str
    region: str | None = None
    record_limit: int = 500
    byte_limit: int = 5_242_880

    def send(self, serialized_rows: list[bytes]) -> None:
        if not serialized_rows:
            return
        try:
            import boto3
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError("KinesisBadSink requires boto3 (not installed)") from e
        client = boto3.client("kinesis", region_name=self.region)
        batch: list[dict] = []
        batch_bytes = 0
        for row in serialized_rows:
            entry = {"Data": row, "PartitionKey": uuid_mod.uuid4().hex}
            if batch and (
                len(batch) >= self.record_limit or batch_bytes + len(row) > self.byte_limit
            ):
                client.put_records(StreamName=self.stream_name, Records=batch)
                batch, batch_bytes = [], 0
            batch.append(entry)
            batch_bytes += len(row)
        if batch:
            client.put_records(StreamName=self.stream_name, Records=batch)
