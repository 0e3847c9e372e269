"""Bloom-filter semi-join reduction — shrink the big side before a join.

When a selective dimension filter leaves a key set too large to broadcast
as an exact hash table, a Bloom filter of those keys still fits: build it
in one aggregate over the small side, broadcast the ~KB–MB bitset, and drop
non-matching fact rows AT THE SCAN, before they pay the join shuffle. False
positives only let a few extra rows through — the join itself stays exact,
so the rewrite is semantics-preserving (the oracle gate proves it).

PySpark exposes no Bloom primitives (``bloom_filter_agg``/``might_contain``
are optimizer-internal, used by runtime row-level filtering), so the filter
is built from public expressions only — and stays entirely JVM-side:

- **build**: k probe positions per key (``xxhash64(key, seed)`` mod m) →
  per-64-bit-word ``bit_or`` aggregate → ONE row holding the bitset as
  ``array<long>`` (dense; absent words zero-filled via a map lookup done
  once on the build side).
- **probe**: broadcast cross join of that single row; each of the k probes
  is an O(1) array index + bitwise AND inside whole-stage codegen. No
  Python in the row path, no shuffle of the big side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["build_bloom_bits", "bloom_prefilter"]


def _pos(key: str, seed: int, num_bits: int) -> str:
    # SQL fragment: i-th probe position of `key` in [0, num_bits).
    # xxhash64 with the seed ordinal as an extra hashed column gives k
    # independent-enough probes; pmod keeps negatives out.
    return f"pmod(xxhash64({key}, {seed}), {num_bits}L)"


def build_bloom_bits(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
) -> DataFrame:
    """ONE-row DataFrame with column ``bloom_bits: array<long>`` — the
    Bloom bitset of ``keys[key_col]`` (m = num_bits, k = num_hashes)."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64
    positions = keys.select(
        F.explode(
            F.array(
                *[
                    F.expr(_pos(key_col, i, num_bits))
                    for i in range(num_hashes)
                ]
            )
        ).alias("pos")
    )
    words = positions.select(
        (F.col("pos") / 64).cast("int").alias("w"),
        F.pmod(F.col("pos"), F.lit(64)).cast("int").alias("b"),
    ).groupBy("w").agg(F.expr("bit_or(shiftleft(1L, b))").alias("word"))
    # Densify to a positional array (absent words = 0) with a one-row Arrow
    # scatter. NOT a map+transform fill: Spark map element_at is a linear
    # scan, so sequence×map zero-fill is O(n_words · set_words) on a single
    # row — measured 15 s at 16 Ki words / 50 k set bits.
    @F.pandas_udf("array<long>")
    def scatter(entries: pd.Series) -> pd.Series:
        out = []
        for es in entries:
            arr = np.zeros(n_words, dtype=np.int64)
            for e in es:
                arr[int(e["w"])] = int(e["word"])
            out.append(arr)
        return pd.Series(out)

    return words.agg(
        F.collect_list(F.struct("w", "word")).alias("_entries")
    ).select(scatter("_entries").alias("bloom_bits"))


def bloom_prefilter(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
) -> DataFrame:
    """Rows of ``big`` whose ``big_key`` *probably* appears in
    ``small[small_key]`` (no false negatives). Follow with the real join
    for exactness; this just keeps non-matching rows out of its shuffle.

    Sizing: FPP ≈ (1 − e^(−k·n/m))^k; the default 1 Mi bits / 4 hashes
    gives ~2.4% at n = 100 k keys. At a real 100 TB run size m to the
    dimension cardinality — the bitset broadcast is m/8 bytes.
    """
    small_key = small_key or big_key
    bits = build_bloom_bits(small, small_key, num_bits, num_hashes)
    checks = []
    for i in range(num_hashes):
        p = _pos(big_key, i, num_bits)
        checks.append(
            f"(bloom_bits[cast({p} / 64 as int)]"
            f" & shiftleft(1L, cast(pmod({p}, 64) as int))) != 0"
        )
    return (
        big.join(F.broadcast(bits))
        .where(F.expr(" AND ".join(checks)))
        .drop("bloom_bits")
    )
