"""Persistent IVF-PQ index: build once on the corpus, query many times.

Prompt north star (no reference analog). The per-call training inside
``similarity.pq_topk`` is the right shape for ad-hoc queries, but a real
serving path builds the index offline and amortizes it: at 100 TB the
encode pass is a full-corpus job you run once per corpus version, while
probes run thousands of times a day.

Layout under ``index_dir``:

- ``model.json``   — driver-side artifacts: IVF centroids (n_cells·dim)
  and PQ codebooks (m_sub·2^nbits·sub), plus every build parameter. Tiny
  by construction (the whole point of PQ), so JSON is fine.
- ``codes/``       — parquet **partitioned by cell**: one row per corpus
  vector with its 8-byte PQ codes, norm, and the raw vector (the index is
  a self-contained copy — re-rank never joins back to the source table).

Why ``partitionBy("cell")`` is the load-bearing choice: a probe touches
``n_probe`` of ``n_cells`` cells, and the cell filter is a literal IN
predicate at read time, so Spark's partition pruning skips the other
cells' FILES entirely — the scan cost of a query is n_probe/n_cells of
the corpus by directory structure, not by filter evaluation. Verify with
``.explain``: the scan shows ``PartitionFilters: [cell IN (...)]``.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mini_feature_store_spark.functions import round_half_up, spread
from mini_feature_store_spark.operators.similarity import (
    _hash_sample_matrix,
    _pair_cos,
    _train_ivfpq,
    with_vec_norm,
)


def _pq_assign_codes(
    mat: "np.ndarray", books: "np.ndarray"
) -> "np.ndarray":
    """Nearest-codeword id per subspace → (n, m_sub) int16 codes. The ONE
    copy of the PQ assignment math (build, append, drift, and the
    reconstruct below all derive from it)."""
    m_sub, _, sub = books.shape
    s = mat.reshape(len(mat), m_sub, sub)
    codes = np.empty((len(mat), m_sub), dtype=np.int16)
    for j in range(m_sub):
        d2 = ((s[:, j, None, :] - books[j][None, :, :]) ** 2).sum(-1)
        codes[:, j] = d2.argmin(1).astype(np.int16)
    return codes


def _pq_reconstruct(codes: "np.ndarray", books: "np.ndarray") -> "np.ndarray":
    """Decode (n, m_sub) codes back to (n, dim) via codebook gathers."""
    m_sub = books.shape[0]
    return np.concatenate(
        [books[j][codes[:, j].astype(np.int64)] for j in range(m_sub)], axis=1
    )


def _encode_map(cent_unit: "np.ndarray", books: "np.ndarray"):
    """mapInPandas closure: (id, v, nrm) carrier → (vec_id, cell, codes,
    nrm, v) index rows. Shared by build and append so their encodings can
    never diverge."""

    def encode(batches):
        for pdf in batches:
            mat = np.array(pdf["v"].tolist(), dtype=np.float64)
            cells = np.argmax(mat @ cent_unit.T, axis=1).astype(np.int32)
            codes = _pq_assign_codes(mat, books)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["id"].astype("int64"),
                    "cell": cells,
                    "codes": list(codes),
                    "nrm": pdf["nrm"].astype("float64"),
                    "v": pdf["v"],
                }
            )

    return encode


_INDEX_ROW_SCHEMA = (
    "vec_id long, cell int, codes array<smallint>, nrm double, "
    "v array<double>"
)


def _load_model(index_dir: str) -> dict:
    meta = json.loads(Path(index_dir, "model.json").read_text())
    meta["centroids_np"] = np.array(meta["centroids"], dtype=np.float64)
    meta["codebooks_np"] = np.array(meta["codebooks"], dtype=np.float64)
    return meta


def build_ivfpq_index(
    corpus: DataFrame,
    index_dir: str,
    n_cells: int = 16,
    m_sub: int = 16,
    nbits: int = 4,
    seed: int = 42,
    sample_size: int = 2048,
    kmeans_iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Train (bounded sample, driver) + encode (one distributed pass) +
    write. Returns a small summary dict (also persisted in model.json)."""
    c = with_vec_norm(spread(corpus), vec_col, id_col)
    sample = _hash_sample_matrix(c, max(sample_size, n_cells), seed)
    if len(sample) < n_cells:
        raise ValueError(f"corpus smaller than n_cells={n_cells}")
    dim = sample.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    cent_unit, books = _train_ivfpq(
        sample, n_cells, m_sub, nbits, kmeans_iters, seed
    )

    enc = c.mapInPandas(_encode_map(cent_unit, books), _INDEX_ROW_SCHEMA)
    enc.write.mode("overwrite").partitionBy("cell").parquet(
        str(Path(index_dir) / "codes")
    )

    # baseline quantization error on the training sample — the drift
    # reference: arriving batches whose error grows well past this are
    # out-of-distribution for the frozen codebooks (rebuild signal)
    srec = _pq_reconstruct(_pq_assign_codes(sample, books), books)
    baseline_mse = float(((sample - srec) ** 2).mean())

    meta = {
        "n_cells": n_cells,
        "m_sub": m_sub,
        "nbits": nbits,
        "dim": dim,
        "seed": seed,
        "sample_size": sample_size,
        "kmeans_iters": kmeans_iters,
        "baseline_mse": baseline_mse,
        "centroids": cent_unit.tolist(),
        "codebooks": books.tolist(),
    }
    Path(index_dir, "model.json").write_text(json.dumps(meta))
    return {k: meta[k] for k in ("n_cells", "m_sub", "nbits", "dim")}


def pq_topk_indexed(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    refine: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe a prebuilt index: same output contract as ``pq_topk``
    (query_id, neighbor_id, cosine, rank), cosines EXACT via re-rank
    against the raw vectors stored in the index.

    The probed cell set is computed up front (one tiny job over the query
    side) and applied as a literal IN filter, so partition pruning skips
    the unprobed cells' files — scan cost tracks n_probe/n_cells of the
    corpus by directory structure.
    """
    meta = _load_model(index_dir)
    cent_unit, books = meta["centroids_np"], meta["codebooks_np"]
    m_sub = meta["m_sub"]

    @F.pandas_udf("array<int>")
    def probe_cells(vs: pd.Series) -> pd.Series:
        mat = np.array(vs.tolist(), dtype=np.float64)
        order = np.argsort(-(mat @ cent_unit.T), axis=1)[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    q = with_vec_norm(queries, vec_col, id_col).select(
        F.col("id").alias("query_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
        F.explode(probe_cells("v")).alias("cell"),
    )
    # literal cell list → PartitionFilters on the codes scan
    probed = sorted(
        {r["cell"] for r in q.select("cell").distinct().collect()}
    )
    codes = (
        spark.read.parquet(str(Path(index_dir) / "codes"))
        .where(F.col("cell").isin(probed))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            "codes",
            F.col("nrm").alias("c_nrm"),
            F.col("v").alias("c_v"),
        )
    )

    @F.pandas_udf("double")
    def approx_cos(
        qv: pd.Series, qn: pd.Series, cs: pd.Series, cn: pd.Series
    ) -> pd.Series:
        qm = np.array(qv.tolist(), dtype=np.float64)
        cm = np.array(cs.tolist(), dtype=np.int64)
        dec = np.concatenate(
            [books[j][cm[:, j]] for j in range(m_sub)], axis=1
        )
        return pd.Series(
            np.einsum("ij,ij->i", qm, dec) / (qn.to_numpy() * cn.to_numpy())
        )

    cand = (
        q.join(codes, "cell")
        .where(
            (F.col("query_id") != F.col("neighbor_id"))
            # degenerate (zero-norm) pairs excluded from ranking — the
            # bruteforce ground-truth convention (also keeps the numpy
            # approx denominator strictly positive)
            & (F.col("q_nrm") * F.col("c_nrm") > 0)
        )
        .select(
            "query_id",
            "neighbor_id",
            "q_v",
            "q_nrm",
            "c_v",
            "c_nrm",
            approx_cos("q_v", "q_nrm", "codes", "c_nrm").alias("approx"),
        )
    )
    w_a = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id").asc()
    )
    exact = (
        cand.withColumn("arank", F.row_number().over(w_a))
        .where(F.col("arank") <= refine * k)
        .select(
            "query_id",
            "neighbor_id",
            round_half_up(
                _pair_cos("q_v", "c_v", "q_nrm", "c_nrm")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int"))
    )


def append_to_ivfpq_index(
    batch: DataFrame,
    index_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    skip_existing_ids: bool = False,
    return_count: bool = True,
) -> int | None:
    """Encode an arriving batch with the EXISTING model artifacts and
    append its codes to the cell-partitioned parquet — the daily-ingest
    path: codebooks/centroids stay frozen between full rebuilds (the
    standard IVF-PQ maintenance contract; re-train only when drift
    accumulates), so appends never touch existing files and probes see
    new vectors immediately.

    ``skip_existing_ids`` anti-joins the batch against the ids already in
    the index (a column-pruned vec_id scan) before encoding — the
    idempotency guard replayed streaming micro-batches need, same
    re-probe-the-store discipline as ``incremental_dedup_stream``.
    ``return_count=True`` counts the appended batch with one extra plain
    scan of the (filtered) input; pass False on hot ingest paths that
    discard it. Dynamic partition append: only the cells the batch lands
    in gain new files; compaction of small appended files is the same
    ``VersionedTable.compact`` story as any other table.
    """
    meta = _load_model(index_dir)
    if skip_existing_ids:
        seen = (
            batch.sparkSession.read.parquet(str(Path(index_dir) / "codes"))
            .select(F.col("vec_id").alias(id_col))
        )
        batch = batch.join(seen, id_col, "left_anti")

    c = with_vec_norm(batch, vec_col, id_col)
    enc = c.mapInPandas(
        _encode_map(meta["centroids_np"], meta["codebooks_np"]),
        _INDEX_ROW_SCHEMA,
    )
    enc.write.mode("append").partitionBy("cell").parquet(
        str(Path(index_dir) / "codes")
    )
    # count the INPUT batch (plain scan) — counting `enc` would run the
    # whole encode pass a second time
    return batch.count() if return_count else None


def index_drift_report(
    batch: DataFrame,
    index_dir: str,
    rebuild_ratio: float = 2.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Quantify how well the FROZEN codebooks fit an arriving batch —
    the rebuild trigger for the append-only maintenance loop.

    Encodes the batch (decode-reconstruct per Arrow batch) and aggregates
    its quantization MSE distributively (one tiny mean, no collect of
    vectors), then compares against the training-time ``baseline_mse``
    recorded in model.json. ``drift_ratio = batch_mse / baseline_mse``;
    ratios near 1 mean the batch is in-distribution, and
    ``rebuild_recommended`` fires at ``rebuild_ratio`` (default 2× — the
    usual practical threshold before recall degrades noticeably).

    Returns {n, batch_mse, baseline_mse, drift_ratio, rebuild_recommended}.
    """
    meta = _load_model(index_dir)
    books = meta["codebooks_np"]

    c = with_vec_norm(batch, vec_col, id_col)

    def err(batches):
        for pdf in batches:
            mat = np.array(pdf["v"].tolist(), dtype=np.float64)
            rec = _pq_reconstruct(_pq_assign_codes(mat, books), books)
            yield pd.DataFrame({"mse": ((mat - rec) ** 2).mean(axis=1)})

    agg = (
        c.select("v")
        .mapInPandas(err, "mse double")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("mse").alias("batch_mse"))
        .collect()[0]
    )
    batch_mse = float(agg["batch_mse"])
    baseline = meta.get("baseline_mse")  # may legitimately be 0.0
    if baseline is None:  # pre-baseline index: can't judge drift
        ratio = float("nan")
        rebuild = False
    elif baseline > 0:
        ratio = batch_mse / baseline
        rebuild = ratio >= rebuild_ratio
    else:
        # a zero baseline means the codebooks reproduce the sample
        # exactly; any nonzero batch error is then out-of-distribution,
        # while a zero batch error is a perfect fit — NOT a rebuild
        ratio = 1.0 if batch_mse == 0 else float("inf")
        rebuild = batch_mse > 0
    return {
        "n": int(agg["n"]),
        "batch_mse": round(batch_mse, 8),
        "baseline_mse": None if baseline is None else round(baseline, 8),
        "drift_ratio": None if ratio != ratio else round(ratio, 4),
        "rebuild_recommended": bool(rebuild),
    }
