"""Sequence packing (operators/packing.py) — invariants + python reference."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mini_feature_store_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def sized(spark):
    rng = random.Random(99)
    rows = []
    for i in range(400):
        shard = f"s{i % 3}"
        # mix of tiny docs, budget-straddling docs, over-budget docs, and
        # zero-token docs
        n = rng.choice([0, 1, 7, 50, 120, 130, 260])
        rows.append((i, shard, n))
    return spark.createDataFrame(rows, "doc_id long, shard string, n_tokens long")


def test_matches_python_reference(sized):
    budget = 128
    got = {
        r.doc_id: (r.start_pack, r.end_pack, r.n_packs, r.offset_in_pack)
        for r in pack_sequences(
            sized, budget=budget, shard_col="shard"
        ).collect()
    }
    rows = sorted(sized.collect(), key=lambda r: (r.shard, r.doc_id))
    cum: dict[str, int] = {}
    for r in rows:
        cb = cum.get(r.shard, 0)
        if r.n_tokens > 0:
            start = cb // budget
            end = (cb + r.n_tokens - 1) // budget
            n_packs = end - start + 1
        else:
            # zero-token docs anchor to the preceding token's pack and
            # occupy none (can't mint last_pack+1 at an exact boundary)
            start = end = max(cb - 1, 0) // budget
            n_packs = 0
        assert got[r.doc_id] == (start, end, n_packs, cb % budget), (
            r.doc_id,
            r.shard,
            cb,
            r.n_tokens,
        )
        cum[r.shard] = cb + r.n_tokens


def test_packing_invariants(sized):
    budget = 128
    out = pack_sequences(sized, budget=budget, shard_col="shard").collect()
    by_shard: dict[str, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        total = sum(r.n_tokens for r in rs)
        last_pack = max(r.end_pack for r in rs)
        # every pack index up to the last is touched by a TOKEN-BEARING
        # doc (zero-token docs anchor but occupy nothing)
        touched = set()
        for r in rs:
            if r.n_tokens > 0:
                touched.update(range(r.start_pack, r.end_pack + 1))
        assert touched == set(range(last_pack + 1))
        # the stream fills exactly ceil(total/budget) packs
        assert last_pack == (max(total, 1) - 1) // budget
        # offsets are within the budget and consistent with spans
        for r in rs:
            assert 0 <= r.offset_in_pack < budget
            if r.n_tokens > 0:
                assert r.n_packs == r.end_pack - r.start_pack + 1
            else:
                assert r.n_packs == 0
                assert 0 <= r.start_pack == r.end_pack <= last_pack


def test_single_global_stream_and_validation(spark, sized):
    out = pack_sequences(sized.drop("shard"), budget=1000)
    assert out.count() == 400
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(sized, budget=0)


def test_plan_single_exchange(sized):
    """One hash exchange on the shard key — the window must not introduce
    a global sort or extra shuffles."""
    from mini_feature_store_spark.functions import plan_text

    plan = plan_text(pack_sequences(sized, budget=128, shard_col="shard"))
    import re

    assert len(set(re.findall(r"\((\d+)\) Exchange", plan))) <= 1, plan


def test_zero_token_doc_at_exact_pack_boundary(spark):
    """A zero-token doc whose cumulative offset sits exactly on a pack
    boundary must anchor to the PRECEDING pack with n_packs=0, never mint
    pack index last_pack+1."""
    from mini_feature_store_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(0, 128), (1, 0), (2, 0)], "doc_id long, n_tokens long"
    )
    out = {r.doc_id: r for r in pack_sequences(df, budget=128).collect()}
    assert out[0].start_pack == 0 and out[0].end_pack == 0
    for zid in (1, 2):
        z = out[zid]
        assert z.start_pack == 0 and z.end_pack == 0 and z.n_packs == 0
    # zero-token doc at stream START (cum=0) also anchors to pack 0
    df2 = spark.createDataFrame([(0, 0), (1, 5)], "doc_id long, n_tokens long")
    z0 = {r.doc_id: r for r in pack_sequences(df2, budget=128).collect()}[0]
    assert z0.start_pack == 0 and z0.n_packs == 0


def test_pack_documents_greedy_nfd(spark):
    """Doc-preserving NFD packing: longest-first per shard, bin closes
    when the next doc doesn't fit, oversized docs get their own bin,
    every doc packed exactly once, no bin over capacity (except a
    single-oversized-doc bin)."""
    from mini_feature_store_spark.operators.packing import (
        pack_documents_greedy,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{j}" for j in range(n)))
            for i, n in [(1, 60), (2, 50), (3, 40), (4, 30), (5, 150), (6, 10)]
        ],
        "doc_id long, text string",
    )
    out = pack_documents_greedy(docs, max_tokens=100, shards=1).collect()
    assert {r.doc_id for r in out} == {1, 2, 3, 4, 5, 6}
    by_doc = {r.doc_id: r for r in out}
    # order: 150, 60, 50, 40, 30, 10 -> bins: [150] [60] [50+40+10=100]... 
    # next-fit: 150 opens b1 (overful alone); 60 -> b2 (150+60>100);
    # 50 -> b3 (60+50>100); 40 joins b3 (90); 30 -> b4 (90+30>100);
    # 10 joins b4 (40)
    assert by_doc[5].bin_id == 1
    assert by_doc[1].bin_id == 2
    assert by_doc[2].bin_id == 3 and by_doc[3].bin_id == 3
    assert by_doc[4].bin_id == 4 and by_doc[6].bin_id == 4
    # capacity invariant over a larger random-ish shape
    big = spark.createDataFrame(
        [(i, " ".join("w" for _ in range((i * 37) % 90 + 1))) for i in range(60)],
        "doc_id long, text string",
    )
    rows = pack_documents_greedy(big, max_tokens=100, shards=4).collect()
    fills = {}
    for r in rows:
        fills[(r.shard, r.bin_id)] = fills.get((r.shard, r.bin_id), 0) + r.n_tokens
    for (s, b), fill in fills.items():
        assert fill <= 100 or len(
            [r for r in rows if (r.shard, r.bin_id) == (s, b)]
        ) == 1
    assert len(rows) == 60


def test_pack_documents_greedy_null_text(spark):
    """NULL-text docs pack as 0 tokens (joining whatever bin is open),
    never -1 — a negative count would DECREASE the running bin fill and
    corrupt packing for every later doc in the shard. Same clamp in
    duplicate_span_coverage's token base."""
    from mini_feature_store_spark.operators.dedup import (
        duplicate_span_coverage,
    )
    from mini_feature_store_spark.operators.packing import (
        pack_documents_greedy,
    )

    docs = spark.createDataFrame(
        [(1, "w " * 60), (2, None), (3, "w " * 50)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in pack_documents_greedy(docs, max_tokens=100, shards=1).collect()
    }
    assert out[2].n_tokens == 0
    assert all(r.n_tokens >= 0 for r in out.values())
    # next-fit longest-first: 60 opens b1, 50 -> b2 (110>100), 0 joins b2
    assert out[1].bin_id == 1 and out[3].bin_id == 2 and out[2].bin_id == 2

    cov = {
        r.doc_id: r
        for r in duplicate_span_coverage(docs, k=2, min_docs=2).collect()
    }
    assert cov[2].n_tokens == 0 and cov[2].dup_share == 0.0 and cov[2].keep


def test_pack_documents_greedy_tokens_col(spark):
    """tokens_col mode: the size measure comes from a precomputed count
    column (the real-tokenizer path); text_col is ignored and need not
    exist; NULL counts clamp to 0."""
    from mini_feature_store_spark.operators.packing import (
        pack_documents_greedy,
    )

    counts = spark.createDataFrame(
        [(1, 60), (2, 50), (3, 40), (4, None)],
        "doc_id long, n_tokens int",
    )
    out = {
        r.doc_id: r
        for r in pack_documents_greedy(
            counts, max_tokens=100, shards=1, tokens_col="n_tokens"
        ).collect()
    }
    assert [out[i].n_tokens for i in (1, 2, 3, 4)] == [60, 50, 40, 0]
    # NFD: 60 -> b1; 50 -> b2; 40 joins b2 (90); 0 joins b2
    assert out[1].bin_id == 1
    assert out[2].bin_id == 2 and out[3].bin_id == 2 and out[4].bin_id == 2


def test_pack_documents_greedy_string_ids(spark):
    """The id column keeps its INPUT type in the output (string URLs
    pack the same as long ids)."""
    from mini_feature_store_spark.operators.packing import (
        pack_documents_greedy,
    )

    docs = spark.createDataFrame(
        [
            ("https://a.com/1", "w " * 60),
            ("https://a.com/2", "w " * 50),
            ("https://a.com/3", "w " * 40),
        ],
        "url string, text string",
    )
    out = pack_documents_greedy(docs, max_tokens=100, shards=1, id_col="url")
    assert dict(out.dtypes)["url"] == "string"
    rows = {r.url: (r.bin_id, r.n_tokens) for r in out.collect()}
    assert len(rows) == 3 and all(n in (60, 50, 40) for _, n in rows.values())
