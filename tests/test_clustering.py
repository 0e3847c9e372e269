"""Distributed k-means + semantic dedup: structural invariants.

Lloyd's is iterative and seed-dependent, so these tests pin properties
rather than golden outputs: planted-blob recovery, convergence (an extra
manual Lloyd step no longer moves the centroids), exact agreement of the
within-cluster pair generator with a numpy reference, planted-duplicate
recovery with the min-id survivor policy, and an MLlib cost cross-check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mini_feature_store_spark.operators.clustering import (
    cluster_cosine_pairs,
    kmeans,
    kmeans_assign,
    kmeans_fit,
    semantic_dedup,
)


def _blob_rows(n_blobs=4, per=40, dim=16, noise=1.0, seed=0):
    """Directionally separated blobs (spherical k-means clusters on the
    sphere, so separation must be angular, not just positional)."""
    rng = np.random.default_rng(seed)
    centers, rows, vid = [], [], 0
    while len(centers) < n_blobs:
        c = rng.normal(size=dim)
        c /= np.linalg.norm(c)
        if all(abs(c @ p) < 0.3 for p in centers):
            centers.append(c)
    for ci, c in enumerate(centers):
        for _ in range(per):
            v = c * 10 + rng.normal(size=dim) * noise
            rows.append((vid, [float(x) for x in v], ci))
            vid += 1
    return rows


@pytest.fixture(scope="module")
def blobs(spark):
    rows = _blob_rows()
    return (
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).persist(),
        rows,
    )


def test_kmeans_recovers_planted_blobs(spark, blobs):
    df, rows = blobs
    _, assigns = kmeans(df, k=4, iters=6, seed=1)
    a = assigns.toPandas().merge(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])[
            ["vec_id", "label"]
        ],
        on="vec_id",
    )
    # each cluster is pure, and each blob landed in exactly one cluster
    purity = a.groupby("cluster")["label"].nunique()
    assert (purity == 1).all()
    assert a.groupby("label")["cluster"].nunique().eq(1).all()


def test_kmeans_converged_fixed_point(spark, blobs):
    """After convergence an extra manual Lloyd step must not move the
    centroids: every centroid is the (normalized) mean of its members."""
    df, _ = blobs
    cent = kmeans_fit(df, k=4, iters=8, seed=1)
    a = kmeans_assign(df, cent).toPandas()
    vecs = df.select("vec_id", "embedding").toPandas()
    m = a.merge(vecs, on="vec_id")
    for c in range(4):
        mat = np.array(m[m.cluster == c]["embedding"].tolist(), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        mean = mat.mean(0)
        mean /= np.linalg.norm(mean)
        assert np.allclose(mean, cent[c], atol=1e-9)


def test_kmeans_assignment_matches_numpy(spark, blobs):
    """The assignment step given fixed centroids is deterministic and must
    equal the literal numpy argmax (including the low-index tie-break)."""
    df, rows = blobs
    cent = kmeans_fit(df, k=4, iters=3, seed=1)
    got = (
        kmeans_assign(df, cent)
        .toPandas()
        .sort_values("vec_id")["cluster"]
        .to_numpy()
    )
    mat = np.array(
        [r[1] for r in sorted(rows)], dtype=np.float64
    )
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    want = np.argmax(mat @ cent.T, axis=1)
    assert (got == want).all()


def test_kmeans_cost_vs_mllib(spark, blobs):
    """Cross-engine check: our spherical k-means cost on unit vectors is
    within 1.5x of MLlib's Euclidean k-means trained on the same unit
    vectors (on the unit sphere, ||a-b||² = 2 - 2·cos, so the objectives
    are affinely equivalent)."""
    pytest.importorskip("pyspark.ml")
    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.functions import array_to_vector

    df, _ = blobs
    cent = kmeans_fit(df, k=4, iters=8, seed=1)
    a = kmeans_assign(df, cent).toPandas()
    ours = float((2 - 2 * a["cos_to_centroid"]).sum())

    unit = df.select(
        array_to_vector(
            F.transform(
                "embedding",
                lambda x: x.cast("double")
                / F.sqrt(
                    F.aggregate(
                        F.transform("embedding", lambda y: y.cast("double")),
                        F.lit(0.0),
                        lambda acc, y: acc + y * y,
                    )
                ),
            )
        ).alias("features")
    )
    model = MLKMeans(k=4, seed=1, maxIter=8).fit(unit)
    theirs = model.summary.trainingCost
    assert ours <= 1.5 * theirs + 1e-6


def test_cluster_pairs_match_numpy_within_clusters(spark, blobs):
    df, rows = blobs
    cent = kmeans_fit(df, k=4, iters=6, seed=1)
    assigns = kmeans_assign(df, cent)
    got = {
        (r.id_a, r.id_b)
        for r in cluster_cosine_pairs(df, assigns, threshold=0.9).collect()
    }
    a = assigns.toPandas().sort_values("vec_id")
    mat = np.array([r[1] for r in sorted(rows)], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    cl = a["cluster"].to_numpy()
    want = {
        (i, j)
        for i in range(len(rows))
        for j in range(i + 1, len(rows))
        if cl[i] == cl[j] and sims[i, j] >= 0.9
    }
    assert got == want
    assert len(want) > 0  # blobs at noise=1.0 do produce >=0.9 pairs


def test_semantic_dedup_recovers_planted_clones(spark):
    rows = _blob_rows(noise=2.0)
    clones = [(10_000 + i, rows[i][1], rows[i][2]) for i in range(10)]
    df = spark.createDataFrame(
        rows + clones, "vec_id long, embedding array<float>, label int"
    )
    out = semantic_dedup(df, k=4, threshold=0.9999, iters=6, seed=1).toPandas()
    assert len(out) == len(rows) + 10  # every row gets a decision
    dropped = set(out[~out.is_survivor]["vec_id"])
    assert dropped == {10_000 + i for i in range(10)}  # min-id survives
    # component id == min vec_id of the component
    grp = out.groupby("component")["vec_id"].min()
    assert (grp.index == grp.values).all()


def test_semantic_dedup_threshold_excludes_non_dups(spark):
    rows = _blob_rows(noise=2.0)
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = semantic_dedup(df, k=4, threshold=0.9999, iters=6, seed=1).toPandas()
    assert out.is_survivor.all()  # no exact dups planted -> nothing dropped


def test_kmeans_local_equals_distributed(spark, blobs):
    """r17 §1.2 driver-local fast path: under LOCAL_MAX_VECTORS the fit
    replays the distributed arithmetic exactly — same hash-ordered init
    sample, same per-partition/per-batch partial kernel
    (_batch_partials, one shared function), same sorted-(cluster, pid)
    fold (_fold_partials). The centroid TRAJECTORY must be bit-equal,
    not approximately equal (local_max_vectors=0 forces the distributed
    path on the same data)."""
    df, _ = blobs
    local = kmeans_fit(df, k=4, iters=5, seed=3)
    dist = kmeans_fit(df, k=4, iters=5, seed=3, local_max_vectors=0)
    assert local.shape == dist.shape == (4, len(df.first()["embedding"]))
    assert np.array_equal(local, dist)

    # and the tiny-batch regime: force multi-batch partition replay by
    # shrinking the Arrow batch size so batch-split accumulation order
    # is exercised on both paths
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        local_b = kmeans_fit(df, k=4, iters=3, seed=11)
        dist_b = kmeans_fit(df, k=4, iters=3, seed=11, local_max_vectors=0)
        assert np.array_equal(local_b, dist_b)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
