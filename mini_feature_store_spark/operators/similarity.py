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

Representation note: vectors are carried as ``(v: array<double>, nrm:
double)`` — the L2 norm is computed ONCE per row and materialized as a
scalar column, and cosine(a, b) = dot(a, b) / (nrm_a · nrm_b). Normalizing
the array instead (``transform(v, x -> x / norm(v))``) re-evaluates the
O(d) norm aggregate per element (O(d²) per row), and the unit-vector
expression gets re-inlined at every use site — measured 30× slower on the
all-pairs join. Compute-heavy projections are ``spread()`` first so a
small input (single parquet row group) doesn't pin the operator to 1 core.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mini_feature_store_spark.functions import spread


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_vec_norm(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Project to ``(id, v: array<double>, nrm: double)`` — the carrier
    representation for all cosine math (see module docstring)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)).alias(
            "nrm"
        ),
    )


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
    q = with_vec_norm(queries, vec_col, id_col).select(
        F.col("id").alias("query_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )
    c = with_vec_norm(spread(corpus), vec_col, id_col).select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("c_v"),
        F.col("nrm").alias("c_nrm"),
    )
    cos = _dot(F.col("q_v"), F.col("c_v")) / (F.col("q_nrm") * F.col("c_nrm"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos, 4).alias("cosine"),
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
    u = with_vec_norm(spread(df), vec_col, id_col)
    a, b = u.alias("a"), u.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cos, 4).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec, planes: list[list[float]]):
    """Sign-bit bucket id of a vector under fixed hyperplanes (JVM exprs).

    Scale-invariant: operates on the raw (un-normalized) vector."""
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
    c_unit = with_vec_norm(spread(corpus), vec_col, id_col).select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("c_v"),
        F.col("nrm").alias("c_nrm"),
    )
    q_unit = with_vec_norm(queries, vec_col, id_col).select(
        F.col("id").alias("query_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )

    c = c_unit.select(
        "neighbor_id",
        "c_v",
        "c_nrm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket(F.col("c_v"), planes).alias("bucket"),
                    )
                    for t, planes in enumerate(rng_tables)
                ]
            )
        ).alias("tb"),
    ).select("neighbor_id", "c_v", "c_nrm", "tb.tbl", "tb.bucket")

    def probes(planes):
        base = lsh_bucket(F.col("q_v"), planes)
        if not multiprobe:
            return F.array(base)
        return F.array(
            base, *[base.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
        )

    q = q_unit.select(
        "query_id",
        "q_v",
        "q_nrm",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), probes(planes).alias("pr"))
                    for t, planes in enumerate(rng_tables)
                ]
            )
        ).alias("tb"),
    ).select("query_id", "q_v", "q_nrm", "tb.tbl", F.explode("tb.pr").alias("bucket"))

    cos = _dot(F.col("q_v"), F.col("c_v")) / (F.col("q_nrm") * F.col("c_nrm"))
    cand = (
        q.join(c, ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_v", "q_nrm", "neighbor_id", "c_v", "c_nrm")
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos, 4).alias("cosine"),
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
