"""Property-based tests (hypothesis) for the r4 training-pipeline
operators: int8 quantization roundtrip laws, epoch-shuffle permutation
laws, and k-means assignment vs a literal numpy argmax — on randomized
inputs that example tests can't enumerate (denormal-ish magnitudes,
constant vectors, adversarial key sets)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


finite_f = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False,
    width=32,
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


class TestProperties:
    @settings(max_examples=5, deadline=None)
    @given(
        vecs=st.lists(
            st.lists(finite_f, min_size=4, max_size=4),
            min_size=1,
            max_size=12,
        )
    )
    def test_int8_quantize_laws(self, sp, vecs):
        from mini_feature_store_spark.operators.similarity import int8_quantize

        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        df = sp.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {r.vec_id: r for r in int8_quantize(df).collect()}
        for vid, v in rows:
            r = out[vid]
            # float32 storage: compare against the float32-rounded values
            v32 = np.array(v, dtype=np.float32).astype(np.float64)
            scale = np.abs(v32).max() / 127.0
            if scale == 0:
                assert all(c == 0 for c in r.codes) and r.recon_mse == 0.0
                continue
            assert -127 <= r.code_min <= r.code_max <= 127
            recon = np.array(r.codes, dtype=np.float64) * scale
            assert np.abs(recon - v32).max() <= scale / 2 * (1 + 1e-9)

    @settings(max_examples=5, deadline=None)
    @given(
        keys=st.lists(
            st.integers(min_value=-(2**31), max_value=2**31),
            min_size=1,
            max_size=60,
            unique=True,
        ),
        seed=st.integers(min_value=0, max_value=10),
        n_shards=st.sampled_from([1, 4, 16]),
    )
    def test_epoch_shuffle_laws(self, sp, keys, seed, n_shards):
        from mini_feature_store_spark.operators.sampling import epoch_shuffle

        df = sp.createDataFrame([(k,) for k in keys], "k long")
        out = epoch_shuffle(df, ["k"], seed=seed, n_shards=n_shards).toPandas()
        # permutation: every key exactly once
        assert sorted(out["k"]) == sorted(keys)
        # shard ids in range; positions dense 1..n per shard
        assert out["shard"].between(0, n_shards - 1).all()
        for _, g in out.groupby("shard"):
            assert sorted(g["pos_in_shard"]) == list(range(1, len(g) + 1))
        # rerun-stability (same seed)
        again = epoch_shuffle(df, ["k"], seed=seed, n_shards=n_shards).toPandas()
        a = out.sort_values("k").reset_index(drop=True)
        b = again.sort_values("k").reset_index(drop=True)
        assert a.equals(b)

    @settings(max_examples=5, deadline=None)
    @given(
        data=st.lists(
            st.lists(
                st.floats(
                    min_value=-10, max_value=10,
                    allow_nan=False, allow_infinity=False, width=32,
                ),
                min_size=4,
                max_size=4,
            ).filter(lambda v: any(abs(x) > 1e-3 for x in v)),
            min_size=3,
            max_size=20,
        )
    )
    def test_kmeans_assign_matches_numpy_argmax(self, sp, data):
        from mini_feature_store_spark.operators.clustering import kmeans_assign

        cents = np.array(
            [[1, 0, 0, 0], [0, 1, 0, 0], [-1, 0, 0, 0]], dtype=np.float64
        )
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(data)]
        df = sp.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = (
            kmeans_assign(df, cents)
            .toPandas()
            .sort_values("vec_id")["cluster"]
            .to_numpy()
        )
        mat = np.array(
            [np.array(v, dtype=np.float32) for _, v in rows], dtype=np.float64
        )
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm < 1e-30] = 1e-30
        want = np.argmax((mat / nrm[:, None]) @ cents.T, axis=1)
        assert (got == want).all()


class TestLmStrategyProperties:
    @settings(max_examples=5, deadline=None)
    @given(
        data=st.data(),
        order=st.integers(min_value=2, max_value=4),
    )
    def test_ngram_lm_position_equals_type_on_random_corpora(
        self, sp, data, order
    ):
        """Strategy-equality law on randomized corpora: for ANY reference
        and score set (tiny vocab so n-gram collisions/backoff branches
        all fire, docs of mixed lengths incl. < order tokens), the
        position-join and type-level scorers return identical rows —
        the dispatch can never change answers, only plans."""
        from mini_feature_store_spark.operators.text import ngram_lm_score

        word = st.sampled_from(["a", "b", "c", "dd"])
        doc = st.lists(word, min_size=0, max_size=12).map(" ".join)
        train_texts = data.draw(
            st.lists(doc, min_size=1, max_size=5), label="train"
        )
        score_texts = data.draw(
            st.lists(doc, min_size=1, max_size=6), label="score"
        )
        train = sp.createDataFrame(
            [(i, t) for i, t in enumerate(train_texts)],
            "doc_id long, text string",
        )
        score = sp.createDataFrame(
            [(i, t) for i, t in enumerate(score_texts)],
            "doc_id long, text string",
        )
        # an all-empty reference raises identically on both paths; skip
        if not any(t.strip() for t in train_texts):
            return
        pos_r = {
            r.doc_id: tuple(r)[1:]
            for r in ngram_lm_score(
                train, score, order=order, strategy="position"
            ).collect()
        }
        typ_r = {
            r.doc_id: tuple(r)[1:]
            for r in ngram_lm_score(
                train, score, order=order, strategy="type"
            ).collect()
        }
        assert pos_r == typ_r


class TestDsirThresholdSelection:
    """Property: _gumbel_topk's threshold selection equals the full
    sort's top-k SET for arbitrary importance frames and budgets —
    including adversarial mass ties at a single rounded key (the case
    the margin-doubling retry exists for)."""

    @settings(max_examples=8, deadline=None)
    @given(
        weights=st.lists(
            st.one_of(
                st.floats(
                    min_value=-50.0,
                    max_value=50.0,
                    allow_nan=False,
                    allow_infinity=False,
                ),
                st.just(0.0),  # boost tie mass at the rounded key
            ),
            min_size=3,
            max_size=120,
        ),
        k_frac=st.floats(min_value=0.01, max_value=0.99),
        seed=st.integers(min_value=0, max_value=3),
    )
    def test_threshold_topk_equals_full_sort(self, sp, weights, k_frac, seed):
        import hashlib
        import math

        from mini_feature_store_spark.operators.dsir import _gumbel_topk

        n = len(weights)
        k = max(1, int(n * k_frac))
        imp = sp.createDataFrame(
            [(i, 1, float(w)) for i, w in enumerate(weights)],
            "doc_id long, n_features long, log_weight double",
        )
        got = {
            r.doc_id
            for r in _gumbel_topk(
                imp, k, seed=seed, id_col="doc_id"
            ).collect()
        }

        def key(i, w):
            h = int(
                hashlib.md5(f"{i}|{seed}".encode()).hexdigest()[:8], 16
            )
            u = (h + 0.5) / 4294967296.0
            g = -math.log(-math.log(u))
            return math.floor((w + g) * 1e4 + 0.5) / 1e4

        ranked = sorted(
            ((i, key(i, w)) for i, w in enumerate(weights)),
            key=lambda t: (-t[1], t[0]),
        )
        assert got == {i for i, _ in ranked[:k]}, (n, k, seed)
