"""DSIR importance resampling: pure-Python differential + laws.

The differential reference re-implements the whole algorithm (hashing,
add-1 bag models, Gumbel keys) with hashlib/math — independent of both
Spark and DuckDB — and the tests pin the operator to it exactly (at the
operator's own output rounding)."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from mini_feature_store_spark.operators.dsir import (
    dsir_bucket_weights,
    dsir_importance,
    dsir_resample,
)

B = 64  # small bucket space → forced collisions


def _toks(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text.strip().lower())
    return t.split(" ") if t else []


def _grams(text: str, max_order: int = 2) -> list[str]:
    t = _toks(text)
    out = []
    for i in range(len(t)):
        for k in range(1, max_order + 1):
            if i + k <= len(t):
                out.append(" ".join(t[i : i + k]))
    return out


def _bucket(g: str, n_buckets: int = B) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets


def _round4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000


def _round8(x: float) -> float:
    return math.floor(x * 1e8 + 0.5) / 1e8


def _py_weights(target: list[str], raw: list[str]) -> dict[int, float]:
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for txt in target:
        for g in _grams(txt):
            b = _bucket(g)
            ct[b] = ct.get(b, 0) + 1
    for txt in raw:
        for g in _grams(txt):
            b = _bucket(g)
            cr[b] = cr.get(b, 0) + 1
    nt, nr = sum(ct.values()), sum(cr.values())
    return {
        b: _round8(
            math.log(ct.get(b, 0) + 1)
            - math.log(cr.get(b, 0) + 1)
            + math.log(nr + B)
            - math.log(nt + B)
        )
        for b in range(B)
    }


def _py_scores(target: list[str], raw: list[str]) -> dict[int, tuple]:
    w = _py_weights(target, raw)
    out = {}
    for i, txt in enumerate(raw):
        gs = _grams(txt)
        out[i] = (len(gs), _round4(sum(w[_bucket(g)] for g in gs)))
    return out


def _py_sample_key(doc_id: int, log_weight: float, seed: int = 42) -> float:
    h = int(
        hashlib.md5(f"{doc_id}|{seed}".encode()).hexdigest()[:8], 16
    )
    u = (h + 0.5) / 4294967296.0
    return _round4(log_weight - math.log(-math.log(u)))


TARGET = [
    "the curated target corpus speaks plainly",
    "plain prose the target prefers",
    "the target corpus repeats the word target",
]
RAW = [
    "the raw corpus speaks plainly too",
    "zz xq jkl noise tokens qqq",
    "plain prose the target prefers exactly",
    "the the the the the",
    "   ",  # gram-less: whitespace-only
]


def _frames(spark):
    tgt = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TARGET)], ["doc_id", "text"]
    )
    raw = spark.createDataFrame(
        [(i, t) for i, t in enumerate(RAW)], ["doc_id", "text"]
    )
    return tgt, raw


def test_bucket_weights_match_python(spark):
    tgt, raw = _frames(spark)
    got = {
        r.bucket: r.weight
        for r in dsir_bucket_weights(tgt, raw, n_buckets=B).collect()
    }
    assert got == pytest.approx(_py_weights(TARGET, RAW), abs=1e-12)
    assert len(got) == B  # dense: every bucket present


def test_importance_matches_python_and_keeps_gramless_docs(spark):
    tgt, raw = _frames(spark)
    got = {
        r.doc_id: (r.n_features, r.log_weight)
        for r in dsir_importance(tgt, raw, n_buckets=B).collect()
    }
    exp = _py_scores(TARGET, RAW)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0]
        assert got[i][1] == pytest.approx(exp[i][1], abs=1e-9)
    # the whitespace-only doc keeps a weight-neutral row
    assert got[4] == (0, 0.0)
    # the target-like doc outscores the pure-noise doc
    assert got[2][1] > got[1][1]


def test_resample_keys_and_topk(spark):
    tgt, raw = _frames(spark)
    rows = dsir_resample(tgt, raw, k=3, n_buckets=B, seed=42).collect()
    assert len(rows) == 3
    exp_scores = _py_scores(TARGET, RAW)
    exp_keys = {
        i: _py_sample_key(i, lw) for i, (_, lw) in exp_scores.items()
    }
    for r in rows:
        assert r.sample_key == pytest.approx(
            exp_keys[r.doc_id], abs=1e-9
        )
    # the selected set IS the top-3 by (key desc, id asc)
    top = sorted(exp_keys.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert {r.doc_id for r in rows} == {i for i, _ in top}


def test_resample_deterministic_and_seed_sensitive(spark):
    tgt, raw = _frames(spark)
    a = {r.doc_id for r in dsir_resample(tgt, raw, 3, n_buckets=B).collect()}
    b = {r.doc_id for r in dsir_resample(tgt, raw, 3, n_buckets=B).collect()}
    assert a == b
    keys_s1 = {
        r.doc_id: r.sample_key
        for r in dsir_resample(tgt, raw, 5, n_buckets=B, seed=1).collect()
    }
    keys_s2 = {
        r.doc_id: r.sample_key
        for r in dsir_resample(tgt, raw, 5, n_buckets=B, seed=2).collect()
    }
    assert keys_s1 != keys_s2  # Gumbel noise moves with the seed


def test_k_larger_than_corpus_returns_all(spark):
    tgt, raw = _frames(spark)
    rows = dsir_resample(tgt, raw, k=100, n_buckets=B).collect()
    assert len(rows) == len(RAW)


def _bulk_frames(spark, n_raw: int = 240):
    """A corpus large enough that a 20% selection budget crosses the
    threshold-selection machinery's margin floor (band + core + outside
    all non-empty)."""
    words = ["alpha", "beta", "gamma", "delta", "the", "target", "noise"]
    tgt = spark.createDataFrame(
        [(i, "the target corpus alpha beta") for i in range(3)],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [
            (
                i,
                " ".join(
                    words[(i * 7 + j * 3) % len(words)] for j in range(12)
                ),
            )
            for i in range(n_raw)
        ],
        ["doc_id", "text"],
    )
    return tgt, raw


def test_resample_threshold_selection_matches_full_sort(spark):
    """The r13 corpus-fraction-k contract: at k = 5% / 20% / 60% / n−1 /
    1, the threshold-selected set is EXACTLY the global top-k by
    (sample_key desc, doc_id asc) — the set a full sort would pick."""
    tgt, raw = _bulk_frames(spark)
    imp = {
        r.doc_id: r.log_weight
        for r in dsir_importance(tgt, raw, n_buckets=B).collect()
    }
    keys = {i: _py_sample_key(i, lw) for i, lw in imp.items()}
    ranked = sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))
    for k in (1, 12, 48, 144, len(ranked) - 1):
        got = {
            r.doc_id
            for r in dsir_resample(
                tgt, raw, k=k, n_buckets=B, seed=42
            ).collect()
        }
        assert got == {i for i, _ in ranked[:k]}, f"k={k}"


def test_resample_plan_has_no_corpus_topk(spark):
    """The selection plan must carry NO k-sized ordered limit (the
    corpus-fraction-k heap hazard) and no global sort of the scored
    frame. Catalyst lowers the boundary trim's row_number window to a
    TakeOrderedAndProject — that one is FINE because its limit is
    ``needed`` (bounded by the sketch margin, here 16), never ``k``:
    every ordered-limit operator in the plan must carry a limit < k."""
    tgt, raw = _bulk_frames(spark)
    df = dsir_resample(tgt, raw, k=48, n_buckets=B)
    plan = df._jdf.queryExecution().executedPlan().toString()
    limits = [
        int(m)
        for m in re.findall(r"TakeOrderedAndProject\(limit=(\d+)", plan)
    ]
    assert all(lim < 48 for lim in limits), limits
    assert len(limits) <= 1  # only the boundary trim, never the corpus
    assert "GlobalLimit" not in plan
    # a global sort of the keyed frame would show up as a range
    # partitioning exchange — there must be none
    assert "rangepartitioning" not in plan


def test_resample_margin_retry_converges(spark, monkeypatch):
    """Force a pathologically coarse sketch (accuracy 4 → rank error
    n/4): the margin-doubling retry must still produce the exact
    top-k set."""
    import mini_feature_store_spark.operators.dsir as dsir_mod

    monkeypatch.setattr(dsir_mod, "_PCT_ACCURACY", 4)
    tgt, raw = _bulk_frames(spark, n_raw=120)
    imp = {
        r.doc_id: r.log_weight
        for r in dsir_importance(tgt, raw, n_buckets=B).collect()
    }
    keys = {i: _py_sample_key(i, lw) for i, lw in imp.items()}
    ranked = sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))
    got = {
        r.doc_id
        for r in dsir_resample(tgt, raw, k=30, n_buckets=B).collect()
    }
    assert got == {i for i, _ in ranked[:30]}


def test_band_tie_fallback(spark, monkeypatch):
    """ADVICE r13: an oversized boundary band (mass ties at one rounded
    sample_key) must degrade LOUDLY into the two-phase value-cut trim —
    and that fallback must still select EXACTLY the full-sort top-k set.
    Forced here by capping the band bound at zero."""
    import mini_feature_store_spark.operators.dsir as dsir_mod

    monkeypatch.setattr(dsir_mod, "_band_cap", lambda m, e: 0.0)
    tgt, raw = _bulk_frames(spark)
    imp = {
        r.doc_id: r.log_weight
        for r in dsir_importance(tgt, raw, n_buckets=B).collect()
    }
    keys = {i: _py_sample_key(i, lw) for i, lw in imp.items()}
    ranked = sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))
    for k in (1, 48, 144):
        with pytest.warns(UserWarning, match="two-phase value-cut"):
            sel = dsir_resample(tgt, raw, k=k, n_buckets=B, seed=42)
        got = {r.doc_id for r in sel.collect()}
        assert got == {i for i, _ in ranked[:k]}, f"k={k}"


def test_weights_join_is_broadcast(spark):
    # The B-row weight table must reach the scoring join as a broadcast:
    # the corpus side never shuffles for the join itself.
    tgt, raw = _frames(spark)
    plan = dsir_importance(tgt, raw, n_buckets=B)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dsir_train_artifact_roundtrip(spark, tmp_path):
    """dsir-train CLI → load_dsir_weights → dsir_score_with_weights
    reproduces dsir_importance exactly (the incremental batch-scoring
    contract: train once, score new crawl batches without the corpora)."""
    from mini_feature_store_spark import cli
    from mini_feature_store_spark.operators.dsir import (
        dsir_importance,
        dsir_score_with_weights,
        load_dsir_weights,
    )

    tgt, raw = _frames(spark)
    tgt_path, raw_path = str(tmp_path / "t"), str(tmp_path / "r")
    tgt.write.parquet(tgt_path)
    raw.write.parquet(raw_path)
    model = str(tmp_path / "dsir")
    rc = cli.main(
        [
            "dsir-train",
            "--target-path", tgt_path,
            "--raw-path", raw_path,
            "--output-dir", model,
            "--n-buckets", str(B),
        ]
    )
    assert rc == 0
    w, nb, mo = load_dsir_weights(spark, model)
    assert (nb, mo) == (B, 2)
    scored = {
        r.doc_id: (r.n_features, r.log_weight)
        for r in dsir_score_with_weights(
            w, raw, n_buckets=nb, max_order=mo
        ).collect()
    }
    direct = {
        r.doc_id: (r.n_features, r.log_weight)
        for r in dsir_importance(tgt, raw, n_buckets=B).collect()
    }
    assert scored == direct


def test_suggest_keep_rate_on_id_free_corpus(spark, tmp_path):
    """r14 ADVICE: plain dsir-train is id-free (bag counts never need a
    doc column), so --suggest-keep-rate must not newly require doc_id.
    The CLI's default (no --id-col) synthesizes a per-row id for the
    calibration grouping; the threshold it calibrates equals the one
    from an explicit id column over the same rows."""
    from mini_feature_store_spark import cli
    from mini_feature_store_spark.operators.dsir import (
        dsir_bucket_weights,
        load_dsir_suggested_threshold,
        suggest_min_log_weight,
    )

    tgt, raw = _frames(spark)
    tgt_path = str(tmp_path / "t")
    raw_path = str(tmp_path / "r_noid")
    tgt.write.parquet(tgt_path)
    raw.select("text").write.parquet(raw_path)  # no doc_id column
    model = str(tmp_path / "dsir_noid")
    rc = cli.main(
        [
            "dsir-train",
            "--target-path", tgt_path,
            "--raw-path", raw_path,
            "--output-dir", model,
            "--n-buckets", str(B),
            "--suggest-keep-rate", "0.25",
        ]
    )
    assert rc == 0
    t = load_dsir_suggested_threshold(spark, model)
    assert t is not None
    w = dsir_bucket_weights(tgt, raw, n_buckets=B)
    t_explicit = suggest_min_log_weight(
        w, raw, 0.25, id_col="doc_id", n_buckets=B
    )
    assert t == pytest.approx(t_explicit)


def test_load_dsir_weights_rejects_truncated(spark, tmp_path):
    from mini_feature_store_spark.operators.dsir import (
        dsir_bucket_weights,
        load_dsir_weights,
        save_dsir_weights,
    )

    tgt, raw = _frames(spark)
    w = dsir_bucket_weights(tgt, raw, n_buckets=B)
    model = str(tmp_path / "bad")
    save_dsir_weights(
        w.where("bucket < 10"), model, n_buckets=B, max_order=2
    )
    with pytest.raises(ValueError, match="not dense"):
        load_dsir_weights(spark, model)


def test_score_column_matches_batch_scorer(spark, tmp_path):
    """The stateless column scorer (array-literal weight lookup inside
    the row — the streaming-gate form) equals the batch
    explode+aggregate scorer at the shared scale-4 rounding."""
    from pyspark.sql import functions as F

    from mini_feature_store_spark.operators.dsir import (
        dsir_bucket_weights,
        dsir_score_column,
        dsir_score_with_weights,
        load_dsir_weight_list,
        save_dsir_weights,
    )

    tgt, raw = _frames(spark)
    w = dsir_bucket_weights(tgt, raw, n_buckets=B)
    model = str(tmp_path / "m")
    save_dsir_weights(w, model, n_buckets=B, max_order=2)
    wl, nb, mo = load_dsir_weight_list(spark, model)
    assert nb == B and len(wl) == B
    batch = {
        r.doc_id: r.log_weight
        for r in dsir_score_with_weights(
            w, raw, n_buckets=B, max_order=mo
        ).collect()
    }
    inline = {
        r.doc_id: r.lw
        for r in raw.select(
            "doc_id",
            dsir_score_column(F.col("text"), wl, max_order=mo).alias(
                "lw"
            ),
        ).collect()
    }
    assert set(inline) == set(batch)
    for d in batch:
        assert inline[d] == pytest.approx(batch[d], abs=1e-12), d
    # gram-less docs (whitespace-only) score the weight-neutral 0.0
    assert inline[4] == 0.0


def test_score_column_is_shuffle_free(spark, tmp_path):
    """The column scorer's plan must be scan+project only — no
    exchange, no generate (the property that makes it streaming-safe)."""
    from pyspark.sql import functions as F

    from mini_feature_store_spark.operators.dsir import (
        dsir_bucket_weights,
        dsir_score_column,
        save_dsir_weights,
        load_dsir_weight_list,
    )

    tgt, raw = _frames(spark)
    model = str(tmp_path / "m")
    save_dsir_weights(
        dsir_bucket_weights(tgt, raw, n_buckets=B), model,
        n_buckets=B, max_order=2,
    )
    wl, _, mo = load_dsir_weight_list(spark, model)
    df = raw.select(
        "doc_id", dsir_score_column(F.col("text"), wl, max_order=mo)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" not in plan
