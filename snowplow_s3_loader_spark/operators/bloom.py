"""Bloom-filter runtime prefiltering for big-big semi joins.

(Beyond the reference's surface — SURVEY.md SS7.8 scale extensions; the
reference loader has no relational layer, Processing.scala:69-77.)

The problem this solves at 100 TB: a semi join `corpus SEMI JOIN keys`
where BOTH sides are too large to broadcast normally shuffles the full
corpus on the join key before a single row is eliminated. Engines solve
this with runtime bloom filters (Spark's own InjectRuntimeFilter does it
when statistics allow; its `might_contain` expression is not SQL-exposed).
This module implements the same idea explicitly, as a *blocked* bloom
filter (Putze, Sanders, Singler, "Cache-, Hash- and Space-Efficient Bloom
Filters", JEA 2009): every key hashes to ONE 64-bit block and to k bit
positions inside that block, so

  - the filter is a tiny (block_id, bits) DataFrame built with ONE
    partial+final `bit_or` aggregation over the key side;
  - membership is ONE broadcast hash join on block_id plus a bitwise
    `bits & mask = mask` filter — pure JVM expressions, whole-stage
    codegen, zero Python, zero extra shuffle of the probe side;
  - the probe side is reduced BEFORE the exact semi join's shuffle, so
    the expensive exchange only moves surviving rows.

The result is EXACT: the bloom pass can only produce false positives
(bounded below), and the exact semi join afterwards removes them. A
dropped true match is impossible by construction (all k bits of a present
key are set in its block).

False-positive rate: with c bits/key budget, a key's block receives on
average 64/c keys; for k=4 and c=16 the classic blocked-bloom analysis
gives ~2-3% FPR (a ~1.3x penalty over an unblocked bloom of the same
size, paid for single-cache-line probes — here, single-join probes).

Scaling knobs (documented for the 1000-executor case):
  - `n_blocks` grows linearly with the distinct-key count; at 16
    bits/key, 1e8 keys -> ~3e7 blocks -> ~400 MB. Below
    `max_broadcast_blocks` the filter is broadcast; above, the operator
    refuses (raises) rather than silently shuffling the probe side —
    callers at that scale should partition the key space and run
    per-partition filters, or fall back to the plain semi join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOCK = "__bloom_block"
_MASK = "__bloom_mask"
_BITS = "__bloom_bits"


def _block_and_mask(key: Column, n_blocks: int, k: int, seed: int) -> tuple[Column, Column]:
    """(block_id, k-bit mask) for one key: hash 0 picks the 64-bit block,
    hashes 1..k pick bit positions inside it (xxhash64 with distinct
    seeds — the same independent-seed family the MinHash operator uses)."""
    block = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(n_blocks))
    # F.shiftleft only takes a literal shift count; call_function reaches
    # the SQL shiftleft, whose count is an arbitrary expression
    bits = [
        F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            F.pmod(F.xxhash64(key, F.lit(seed + 1 + i)), F.lit(64)).cast("int"),
        )
        for i in range(k)
    ]
    return block, reduce(lambda a, b: a.bitwiseOR(b), bits)


def bloom_build(
    keys: DataFrame, key_col: str, n_blocks: int, k: int = 4, seed: int = 41
) -> DataFrame:
    """(block_id, bits) blocked-bloom frame over the (distinct) key side:
    one hash-partial + final `bit_or` aggregation, output has at most
    `n_blocks` rows regardless of key count."""
    block, mask = _block_and_mask(F.col(key_col), n_blocks, k, seed)
    return (
        keys.select(block.alias(_BLOCK), mask.alias(_MASK))
        .groupBy(_BLOCK)
        .agg(F.bit_or(_MASK).alias(_BITS))
    )


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_blocks: int,
    k: int = 4,
    seed: int = 41,
    keep_bits: bool = False,
) -> DataFrame:
    """Rows of `df` whose key MIGHT be in the bloom (false positives
    possible, false negatives impossible). One broadcast inner join on
    block_id + a bitwise filter; the probe side keeps its partitioning.
    With keep_bits=True the (non-null by construction) __bloom_bits
    column survives, so callers can fence later operators to this join's
    output (see bloom_prefilter_semi_join)."""
    clash = {_BLOCK, _MASK, _BITS} & set(df.columns)
    if clash:
        raise ValueError(
            f"probe frame already has reserved column(s) {sorted(clash)}; "
            "rename them before bloom filtering"
        )
    block, mask = _block_and_mask(F.col(key_col), n_blocks, k, seed)
    probe = df.withColumn(_BLOCK, block).withColumn(_MASK, mask)
    out = (
        probe.join(F.broadcast(bloom), _BLOCK, "inner")
        .filter(F.col(_BITS).bitwiseAND(F.col(_MASK)) == F.col(_MASK))
        .drop(_BLOCK, _MASK)
    )
    return out if keep_bits else out.drop(_BITS)


def bloom_prefilter_semi_join(
    big: DataFrame,
    keys: DataFrame,
    on: str | tuple[str, str],
    bits_per_key: int = 16,
    k: int = 4,
    seed: int = 41,
    n_keys: int | None = None,
    max_broadcast_blocks: int = 50_000_000,
) -> DataFrame:
    """EXACT `big SEMI JOIN keys` with a blocked-bloom prefilter: the probe
    side is reduced by a broadcast bloom membership test before the exact
    semi join's shuffle, so the exchange only moves surviving rows.

    `on`: shared column name, or (big_col, keys_col). `n_keys` sizes the
    filter; when omitted it is counted from `keys` (one cheap agg on the
    smaller side — the same bounded pattern as the IVF training sample).
    Null probe keys never match a semi join and are dropped up front on
    both paths (bloom and exact join agree by construction).
    """
    if bits_per_key < 1 or k < 1:
        raise ValueError(f"bits_per_key ({bits_per_key}) and k ({k}) must be >= 1")
    big_col, key_col = (on, on) if isinstance(on, str) else on
    key_side = keys.select(F.col(key_col).alias(key_col)).filter(
        F.col(key_col).isNotNull()
    )
    if n_keys is None:
        n_keys = key_side.count()
    n_blocks = max(64, -(-n_keys * bits_per_key // 64))
    if n_blocks > max_broadcast_blocks:
        raise ValueError(
            f"bloom filter would need {n_blocks} blocks "
            f"(> max_broadcast_blocks={max_broadcast_blocks}); partition the "
            "key space or use a plain semi join"
        )
    bloom = bloom_build(key_side, key_col, n_blocks, k=k, seed=seed)
    pre = bloom_might_contain(
        big.filter(F.col(big_col).isNotNull()),
        big_col,
        bloom,
        n_blocks,
        k=k,
        seed=seed,
        keep_bits=True,
    )
    # Optimizer fence: Catalyst's PushDownLeftSemiAntiJoin would otherwise
    # push the exact semi join BELOW the bloom probe join (its key only
    # references the probe leg), shuffling the full, unfiltered probe side
    # — the exact pessimization this operator exists to avoid. The fence
    # conjunct is an always-true OR spanning both semi-join legs
    # (__bloom_bits comes from the probe join's build leg, the key from
    # the semi join's right): an OR is not separable into per-side
    # predicates, not constant-foldable (both operands are runtime-null-
    # tracked), and forces the semi condition to reference both legs of
    # the probe join, which the pushdown rule cannot see through. Pinned
    # by test_bloom_filter_sits_below_exact_join_shuffle.
    # No distinct() on the exact join's build side: LEFT SEMI dedups by
    # definition, and the extra exchange would cost more than it saves.
    fence = pre[_BITS].isNull() | key_side[key_col].isNotNull()
    joined = pre.join(
        key_side, on=(pre[big_col] == key_side[key_col]) & fence, how="left_semi"
    )
    return joined.drop(_BITS)
