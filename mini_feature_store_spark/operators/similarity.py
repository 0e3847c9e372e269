"""Embedding similarity search (prompt north star; no reference analog).

- ``cosine_topk_bruteforce``  exact top-k neighbors: queries × corpus with a
  JVM-expression dot product (``zip_with`` + ``aggregate`` — no UDF). The
  scale shape: broadcast the (small) query side, stream the corpus — one pass,
  no shuffle of the corpus; per-partition partial top-k via the final
  window is AQE-coalesced. Baseline + oracle for the approximate variants.
- ``cosine_pairs``            all-pairs near-dup by cosine ≥ threshold
  (corpus self-product — only for modest corpora / verification).
- ``lsh_topk``                random-hyperplane LSH ANN: sign-bit bucket of H
  deterministic hyperplanes, candidates = bucket collisions (multi-probe on
  1-bit flips), exact re-rank of candidates. The 100 TB path: candidate
  generation is an equi-join on bucket id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_unit_vec(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "unit"
) -> DataFrame:
    """L2-normalize (double precision) so cosine = dot product."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn(out_col, F.transform(v, lambda x: x / _norm(v)))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector (self excluded).

    Output: (query_id, neighbor_id, cosine, rank) with deterministic
    (cosine desc, neighbor_id asc) ordering.
    """
    q = with_unit_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit").alias("q_unit")
    )
    c = with_unit_vec(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("unit").alias("c_unit")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("q_unit"), F.col("c_unit")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int"))
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold (embedding near-dup)."""
    u = with_unit_vec(df, vec_col).select(
        F.col(id_col).alias("id"), F.col("unit")
    )
    a, b = u.alias("a"), u.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(_dot(F.col("a.unit"), F.col("b.unit")), 4).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec, planes: list[list[float]]):
    """Sign-bit bucket id of a vector under fixed hyperplanes (JVM exprs)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = _dot(vec, F.array(*[F.lit(float(x)) for x in p]))
        bucket = bucket.bitwiseXOR(
            F.shiftleft(F.when(proj > 0, F.lit(1).cast("long")).otherwise(0), i)
        )
    return bucket


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    dim: int = 64,
    multiprobe: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane LSH + exact re-rank.

    Standard (r, L) LSH: ``n_tables`` independent tables of ``n_planes`` sign
    bits each; a pair is a candidate if it collides in ANY table (recall
    1 − (1 − p^r)^L for per-plane agreement p). ``multiprobe`` additionally
    probes every 1-bit flip per table, trading candidate volume for tables.

    Scale shape: corpus rows are exploded L times and shuffled once by
    (table, bucket); queries probe L·(1+r) buckets each. Candidate volume —
    not corpus size — drives the re-rank cost; tune (r, L) so bucket
    occupancy stays bounded. At 100 TB this is the difference between a
    crossJoin (impossible) and an equi-join (routine).
    """
    rng_tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    c_unit = with_unit_vec(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("unit").alias("c_unit")
    )
    q_unit = with_unit_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit").alias("q_unit")
    )

    c = c_unit.select(
        "neighbor_id",
        "c_unit",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket(F.col("c_unit"), planes).alias("bucket"),
                    )
                    for t, planes in enumerate(rng_tables)
                ]
            )
        ).alias("tb"),
    ).select("neighbor_id", "c_unit", "tb.tbl", "tb.bucket")

    def probes(planes):
        base = lsh_bucket(F.col("q_unit"), planes)
        if not multiprobe:
            return F.array(base)
        return F.array(
            base, *[base.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
        )

    q = q_unit.select(
        "query_id",
        "q_unit",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), probes(planes).alias("pr"))
                    for t, planes in enumerate(rng_tables)
                ]
            )
        ).alias("tb"),
    ).select("query_id", "q_unit", "tb.tbl", F.explode("tb.pr").alias("bucket"))

    cand = (
        q.join(c, ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_unit", "neighbor_id", "c_unit")
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("q_unit"), F.col("c_unit")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int"))
    )
