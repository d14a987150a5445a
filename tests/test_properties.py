"""Property-based tests (hypothesis) for the pure algorithmic kernel:
dynamic-path templating, iglu parsing, size-cap rule, envelope framing.
No SparkSession — these run in milliseconds."""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from snowplow_s3_loader_spark.dynamic_path import (
    get_filename,
    get_full_path,
    get_partition,
    normalize_path,
)
from snowplow_s3_loader_spark.igluschema import SchemaKey
from snowplow_s3_loader_spark.operators.decompression import (
    DecompressionLimits,
    decompress_record,
    make_envelope,
)

ident = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789_-", min_size=1, max_size=20)
times = st.datetimes(
    min_value=datetime(2000, 1, 1), max_value=datetime(2099, 12, 31)
).map(lambda d: d.replace(tzinfo=timezone.utc))


@st.composite
def schema_keys(draw):
    return SchemaKey(
        vendor=draw(ident),
        name=draw(ident),
        format=draw(ident),
        model=draw(st.integers(1, 99)),
        revision=draw(st.integers(0, 99)),
        addition=draw(st.integers(0, 99)),
    )


@given(schema_keys())
def test_iglu_uri_roundtrip(key):
    assert SchemaKey.parse(key.to_uri()) == key


@given(st.text(max_size=50))
def test_iglu_parse_never_raises(s):
    SchemaKey.parse(s)  # malformed input -> None, never an exception


@given(schema_keys(), times)
def test_full_path_no_double_slashes_and_gz_suffix(key, now):
    p = get_full_path("s3://bucket/out/", "pfx-", "{vendor}/{model}/{yyyy}", now, key, "u")
    assert "//" not in p.replace("s3://", "")
    assert p.endswith(".gz")
    assert f"/{key.vendor}/{key.model}/" in p


@given(times)
def test_filename_sortable_by_time(now):
    # lexicographic order of filenames == chronological order (fixed-width)
    f = get_filename(None, now, "u")
    assert len(f.split("-u.gz")[0]) == 17  # yyyy-MM-dd-HHmmss


@given(st.text(min_size=1, max_size=30))
def test_normalize_idempotent(s):
    assert normalize_path(normalize_path(s)) == normalize_path(s)


@given(schema_keys(), times, st.sampled_from(["", "{vendor}", "a/{schema}/b", "{yyyy}/{MM}"]))
def test_partition_deterministic(key, now, template):
    assert get_partition(template, key, now) == get_partition(template, key, now)


@given(
    st.lists(st.binary(min_size=0, max_size=200), min_size=0, max_size=10),
    st.sampled_from(["gzip", "zstd", "zstd-stream"]),
)
@settings(max_examples=50)
def test_envelope_roundtrip(records, codec):
    env = make_envelope(records, codec)
    out, err = decompress_record(env, DecompressionLimits())
    assert err is None
    assert out == records


def test_decompression_bomb_capped():
    """A tiny compressed payload expanding past 4x maxBytesInBatch is refused
    with an error, without materializing the full expansion."""
    import gzip

    from snowplow_s3_loader_spark.operators.decompression import MSG_STREAM_CAP

    limits = DecompressionLimits(max_bytes_in_batch=1000, max_bytes_single_payload=10_000_000)
    bomb = gzip.compress(b"\x00" * 1_000_000)  # ~1 KB compressed, 1 MB expanded
    out, err = decompress_record(bomb, limits)
    assert out == [] and MSG_STREAM_CAP in err

    import pyarrow as pa

    zbomb = pa.Codec("zstd").compress(b"\x00" * 1_000_000, asbytes=True)
    out, err = decompress_record(zbomb, limits)
    assert out == [] and MSG_STREAM_CAP in err


@given(st.binary(min_size=2, max_size=100))
@settings(max_examples=50)
def test_corrupt_envelope_never_raises(noise):
    import gzip

    out, err = decompress_record(gzip.compress(noise), DecompressionLimits())
    # either parses to records or reports an error — never throws
    assert (err is None) or (out == [])


@given(st.binary(min_size=0, max_size=100))
def test_plain_record_passthrough(payload):
    from snowplow_s3_loader_spark.operators.decompression import GZIP_MAGIC, ZSTD_MAGIC

    if payload[:2] != GZIP_MAGIC and payload[:4] != ZSTD_MAGIC:
        out, err = decompress_record(payload, DecompressionLimits())
        assert err is None and out == [payload]


# ---------------------------------------------------------------------------
# round-6 primitives: Misra-Gries compaction + Morton interleave
# ---------------------------------------------------------------------------


@given(
    st.lists(st.sampled_from([f"t{i}" for i in range(40)]), min_size=0, max_size=400),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=60, deadline=None)
def test_mg_stream_guarantee_property(tokens, capacity, n_batches):
    """For ANY stream split into ANY number of batches: the compacted
    summary (a) never over-counts, (b) under-counts by at most
    n/(capacity+1), and (c) contains every token heavier than that bound
    — the MG invariant the distributed merge builds on."""
    from collections import Counter

    import pandas as pd

    from snowplow_s3_loader_spark.operators.sketches import _mg_partition

    if not tokens:
        batches = []
    else:
        size = max(1, len(tokens) // n_batches)
        batches = [
            pd.DataFrame({"tok": tokens[i : i + size]})
            for i in range(0, len(tokens), size)
        ]
    out = list(_mg_partition(iter(batches), capacity))
    summary = (
        dict(zip(out[0]["token"], out[0]["partial"])) if out else {}
    )
    truth = Counter(tokens)
    err = len(tokens) // (capacity + 1)
    assert len(summary) <= capacity + 0  # compaction may leave < capacity
    for t, est in summary.items():
        assert 0 < est <= truth[t]
        assert est >= truth[t] - err
    for t, c in truth.items():
        if c > err:
            assert t in summary


@given(
    st.lists(st.integers(min_value=0, max_value=2**15 - 1), min_size=1, max_size=4),
    st.integers(min_value=1, max_value=15),
)
@settings(max_examples=100, deadline=None)
def test_interleave_roundtrip_property(vals, bits):
    """The Morton code is a bijection on the masked inputs: de-interleave
    recovers every column's low `bits` bits, and the code is monotone in
    each column when the others are fixed (the property range
    partitioning relies on)."""
    if len(vals) * bits > 62:
        vals = vals[: max(1, 62 // bits)]
    d = len(vals)
    masked = [v & ((1 << bits) - 1) for v in vals]

    def interleave(vs):
        z = 0
        for i in range(bits):
            for j, v in enumerate(vs):
                z |= ((v >> i) & 1) << (i * d + j)
        return z

    z = interleave(masked)
    for j in range(d):
        back = sum(((z >> (i * d + j)) & 1) << i for i in range(bits))
        assert back == masked[j]
    for j in range(d):
        if masked[j] + 1 < (1 << bits):
            bumped = list(masked)
            bumped[j] += 1
            assert interleave(bumped) > z


# ---------------------------------------------------------------------------
# Round-12 DP kernels (pure python, no SparkSession)
# ---------------------------------------------------------------------------


@given(
    st.lists(st.integers(1, 500), min_size=2, max_size=9),
    st.integers(2, 4),
    st.integers(2, 3),
    st.integers(0, 2_000_000),
)
@settings(max_examples=150, deadline=None)
def test_multistate_viterbi_is_optimal(gaps, k, s_num, gamma):
    """The k-state integer Viterbi's cost equals the brute-force
    minimum over ALL k^n state assignments, and the backtracked
    states achieve it."""
    import itertools
    import math

    from snowplow_s3_loader_spark.operators.timeseries import (
        _burst_states_multi,
    )

    states, cost, mean_gap, trans = _burst_states_multi(
        gaps, "k", k, s_num, gamma
    )
    ln_s = int(math.floor(math.log(s_num) * 1e6 + 0.5))

    def seq_cost(seq):
        c, prev = 0, 0
        for stt, x in zip(seq, gaps):
            c += max(0, stt - prev) * trans
            c += (s_num**stt - 1) * ((x * 1_000_000) // mean_gap)
            c -= stt * ln_s
            prev = stt
        return c

    brute = min(
        seq_cost(seq) for seq in itertools.product(range(k), repeat=len(gaps))
    )
    assert cost == brute == seq_cost(states)


@given(st.lists(st.integers(1, 500), min_size=2, max_size=200))
@settings(max_examples=100, deadline=None)
def test_two_state_equals_multi_at_k2(gaps):
    """_burst_states (the q162 kernel) and _burst_states_multi at
    n_states = 2 must agree bit for bit — states AND cost."""
    from snowplow_s3_loader_spark.operators.timeseries import (
        _burst_states,
        _burst_states_multi,
    )

    s1, c1, m1, t1 = _burst_states(gaps, "k", 2, 1_000_000)
    s2, c2, m2, t2 = _burst_states_multi(gaps, "k", 2, 2, 1_000_000)
    assert (s1, c1, m1, t1) == (s2, c2, m2, t2)
