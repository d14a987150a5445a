"""Blob-sink S3 rename branch: server-side CopyObject + DeleteObject per
file (the reference's one-PutObject-per-file uploader shape,
Processing.scala:287-289), with the wire client injected."""

from __future__ import annotations

import pytest

from snowplow_s3_loader_spark.sinks.blob import _move_one, _parse_s3_uri


class FakeS3:
    def __init__(self):
        self.objects = {}
        self.calls = []

    def copy_object(self, Bucket, Key, CopySource):
        self.calls.append("copy")
        src = (CopySource["Bucket"], CopySource["Key"])
        if src not in self.objects:
            raise KeyError(src)
        self.objects[(Bucket, Key)] = self.objects[src]

    def head_object(self, Bucket, Key):
        self.calls.append("head")
        return {"ContentLength": len(self.objects[(Bucket, Key)])}

    def delete_object(self, Bucket, Key):
        self.calls.append("delete")
        del self.objects[(Bucket, Key)]


def test_parse_s3_uri():
    assert _parse_s3_uri("s3://bucket/a/b/c.gz") == ("bucket", "a/b/c.gz")
    assert _parse_s3_uri("s3a://b2/x.gz") == ("b2", "x.gz")


def test_move_one_s3_copy_delete():
    s3 = FakeS3()
    s3.objects[("bkt", "_staging_ab/__pp=v.e1/part-0.gz")] = b"x" * 42
    dst, n = _move_one(
        ("s3://bkt/_staging_ab/__pp=v.e1/part-0.gz", "s3://bkt/v.e1/2023-01-01-000000-0000.gz"),
        s3_client=s3,
    )
    assert dst == "s3://bkt/v.e1/2023-01-01-000000-0000.gz"
    assert n == 42
    assert ("bkt", "v.e1/2023-01-01-000000-0000.gz") in s3.objects
    assert ("bkt", "_staging_ab/__pp=v.e1/part-0.gz") not in s3.objects
    assert s3.calls == ["copy", "head", "delete"]


def test_move_one_local_still_moves(tmp_path):
    src = tmp_path / "stage" / "f.gz"
    src.parent.mkdir()
    src.write_bytes(b"data")
    dst = tmp_path / "out" / "final.gz"
    got, n = _move_one((str(src), str(dst)))
    assert got == str(dst) and n == 4
    assert dst.exists() and not src.exists()
