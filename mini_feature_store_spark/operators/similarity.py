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
    num_blocks: int = 32,
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold (embedding near-dup).

    Block-GEMM plan — the only shape that survives scale for exact
    all-pairs: vectors are hashed into ``num_blocks`` blocks (collect_list
    per block), block pairs (bi ≤ bj) meet in an equi-free join of
    B(B+1)/2 rows, and each block pair is ONE vectorized numpy matmul
    inside Arrow-batched ``mapInPandas``. Work is O(n²·d) either way, but
    GEMM runs at SIMD throughput while a per-pair ``aggregate(zip_with(...))``
    expression is interpreted (CodegenFallback) — measured 10-100× slower
    and variance-prone. Tune ``num_blocks`` so a block (n/B vectors) fits
    executor memory; the B² join fan-out is inherent to exact all-pairs.
    """
    import pandas as pd

    blocks = (
        spread(df)
        .select(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_blocks)).alias("bid"),
            F.struct(
                F.col(id_col).cast("long").alias("id"),
                F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
            ).alias("item"),
        )
        .groupBy("bid")
        .agg(F.collect_list("item").alias("items"))
    )
    a = blocks.select(F.col("bid").alias("a_bid"), F.col("items").alias("a_items"))
    b = blocks.select(F.col("bid").alias("b_bid"), F.col("items").alias("b_items"))
    pairs = a.join(b, F.col("a_bid") <= F.col("b_bid"))

    def gemm(batches):
        for pdf in batches:
            for a_bid, a_items, b_bid, b_items in zip(
                pdf["a_bid"], pdf["a_items"], pdf["b_bid"], pdf["b_items"]
            ):
                ids_a = np.array([it["id"] for it in a_items], dtype=np.int64)
                ids_b = np.array([it["id"] for it in b_items], dtype=np.int64)
                ma = np.array([it["v"] for it in a_items], dtype=np.float64)
                mb = np.array([it["v"] for it in b_items], dtype=np.float64)
                na = np.linalg.norm(ma, axis=1)
                nb = np.linalg.norm(mb, axis=1)
                cos = np.round((ma @ mb.T) / np.outer(na, nb), 4)
                if a_bid == b_bid:
                    # same block meets itself once: keep one orientation
                    mask = (cos >= threshold) & (ids_a[:, None] < ids_b[None, :])
                else:
                    # disjoint blocks meet once; normalize pair orientation
                    # to (min, max) — id order is independent of block order
                    mask = cos >= threshold
                ii, jj = np.nonzero(mask)
                if len(ii):
                    ia, ib = ids_a[ii], ids_b[jj]
                    yield pd.DataFrame(
                        {
                            "id_a": np.minimum(ia, ib),
                            "id_b": np.maximum(ia, ib),
                            "cosine": cos[ii, jj],
                        }
                    )

    return pairs.mapInPandas(
        gemm, schema="id_a long, id_b long, cosine double"
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
