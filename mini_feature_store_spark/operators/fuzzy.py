"""Blocked fuzzy string matching (edit-distance entity resolution).

Near-dup detection for *short strings* (names, titles, product labels) where
shingle/MinHash machinery (operators/dedup.py) is too coarse: compare by
Levenshtein edit distance, but only within a blocking key — the classic
entity-resolution trick that turns an O(n²) all-pairs comparison into
per-block self-joins. Absent from the reference (no string similarity at
all); complements the document-level dedup family.

Scale shape: the candidate generation is an equi self-join on the block key
(hash/SMJ — never a nested loop over the full table), `levenshtein` is a
JVM built-in evaluated inside whole-stage codegen on the joined pairs, and
`a < b` halves the pair space. Block-key skew is ordinary join skew — AQE
splits hot blocks; a block whose size explodes should be re-blocked with a
finer key (that's a data-modeling decision, not an engine one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["blocked_edit_distance_pairs"]


def blocked_edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    block: Column,
    max_distance: int,
    distinct: bool = True,
) -> DataFrame:
    """All pairs of values of ``text_col`` with the same ``block`` key and
    ``levenshtein(a, b) <= max_distance``.

    Output: ``name_a`` < ``name_b`` (lexicographic, so each unordered pair
    appears once), ``distance`` (int). With ``distinct=True`` (default)
    matching runs over the distinct value+block set — for catalog-style
    columns with heavy duplication this shrinks the join quadratically.
    """
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    vals = df.select(F.col(text_col).alias("_txt"), block.alias("_blk"))
    if distinct:
        vals = vals.distinct()
    a = vals.select(F.col("_txt").alias("name_a"), F.col("_blk").alias("_ba"))
    b = vals.select(F.col("_txt").alias("name_b"), F.col("_blk").alias("_bb"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(
            b,
            (F.col("_ba") == F.col("_bb"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .where(dist <= max_distance)
        .select("name_a", "name_b", dist.cast("int").alias("distance"))
    )
