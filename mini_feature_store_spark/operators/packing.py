"""Sequence packing for LLM pretraining (prompt north star; no reference
analog).

Pretraining pipelines concatenate documents in a fixed order and chunk the
token stream into fixed-size training contexts ("concat-then-chunk"
packing — the standard dataloader shape). The distributed question is only
WHERE each document lands: its pack ids and offset are pure functions of
the running token count before it, which is one window cumulative sum —
one exchange, no Python, no iteration.

Scale shape: the running sum is inherently sequential, so it is computed
PER SHARD (``shard_col``) — each shard is an independent token stream with
its own pack numbering (pack identity at scale is the pair
(shard, pack)). One hash exchange on the shard key, one sort per
partition; no global ordering bottleneck. At 100 TB you shard by a
pipeline-natural key (source, date, bucket-of-hash) sized so a shard's
docs fit a task's sort budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Assign each document its packed training-context location.

    Within each shard (``shard_col``; a single global stream when None),
    documents are laid out in ``order_col`` order (default: ``id_col``) as
    one concatenated token stream chunked every ``budget`` tokens. Output
    per document:

    - ``start_pack`` / ``end_pack`` — first / last pack the doc's tokens
      land in (a doc longer than ``budget`` spans several; a zero-token
      doc occupies none: it reports the pack of the last PRECEDING token
      — clamped so an exact pack-boundary position cannot mint a pack
      index past the stream's last real pack — with ``n_packs = 0``);
    - ``n_packs`` — packs spanned (0 for zero-token docs);
    - ``offset_in_pack`` — token offset of the doc's first token inside
      ``start_pack``.

    Deterministic given the ordering; order ties must be impossible
    (``order_col`` unique per shard — ids are) for reproducible packing.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order = order_col or id_col
    part = [shard_col] if shard_col else [F.lit(0)]
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(order).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b = F.lit(budget)
    n = F.col(token_col)
    cum = F.coalesce(F.sum(token_col).over(w), F.lit(0)).alias("_cum_before")
    out = df.select("*", cum)
    # zero-token docs: anchor to the pack of the last preceding token
    # (floor((cum-1)/b), clamped at 0) — using floor(cum/b) would mint
    # pack index last_pack+1 for a zero-token doc at an exact boundary
    anchor = F.floor(
        F.greatest(F.col("_cum_before") - 1, F.lit(0)) / b
    )
    start = F.when(n > 0, F.floor(F.col("_cum_before") / b)).otherwise(anchor)
    end = F.when(
        n > 0, F.floor((F.col("_cum_before") + n - 1) / b)
    ).otherwise(anchor)
    return (
        out.withColumn("start_pack", start.cast("long"))
        .withColumn("end_pack", end.cast("long"))
        .withColumn(
            "n_packs",
            F.when(n > 0, F.col("end_pack") - F.col("start_pack") + 1)
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn(
            "offset_in_pack", F.pmod(F.col("_cum_before"), b).cast("long")
        )
        .drop("_cum_before")
    )


def pack_documents_greedy(
    df: DataFrame,
    max_tokens: int,
    shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Doc-PRESERVING packing: next-fit-decreasing bin packing per shard —
    the packing mode that never splits a document across training
    contexts (``pack_sequences`` is the concat-then-chunk mode that
    does). Each document lands in exactly one bin of capacity
    ``max_tokens``; within a shard, docs are taken longest-first
    (ties by id) and a bin closes the first time the next doc no longer
    fits — the classic NFD approximation (≤ 2× optimal bin count;
    longest-first ordering makes the big items anchor bins so padding
    concentrates where it is unavoidable). A single document longer than
    ``max_tokens`` gets a bin of its own (truncation is the caller's
    policy, not the packer's).

    Output: one row per input document — ``(id_col, shard, bin_id,
    n_tokens)``; bin ids are 1-based PER (shard); global pack identity is
    the pair (shard, bin_id), exactly like ``pack_sequences``.

    Scale shape: bin packing is inherently sequential, so — like the
    cumsum in ``pack_sequences`` — it runs independently PER SHARD
    (deterministic md5 bucket of the id): one hash exchange on the shard
    key, then a linear Arrow-batched pass per shard
    (``applyInPandas`` — the greedy fold is state Spark's built-ins
    can't express; this is the sanctioned Pandas-UDF escape hatch).
    Size ``shards`` so one shard's docs fit an executor's Arrow batch
    budget; at 100 TB that is thousands of shards, each a few GB.

    ``tokens_col`` switches the size measure from the whitespace
    ``token_count(text_col)`` to a PRECOMPUTED per-doc count column —
    how production packing runs, sized by the actual tokenizer's counts
    (e.g. ``bpe_tokenize(...).n_tokens``) rather than a whitespace
    proxy; ``text_col`` is ignored (and need not exist) in that mode.
    """
    import pandas as pd

    from mini_feature_store_spark.operators.text import token_count

    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")

    # the output schema carries the id column at its INPUT type (string
    # URLs, longs, ... — the md5 shard hash accepts any castable type)
    id_type = dict(df.dtypes)[id_col]

    # NULL text/count must pack as 0 tokens: bare token_count(NULL) is -1
    # under default size(null) semantics (it would DECREASE the running
    # bin fill) and null under ansi/sizeOfNull=false (int(NaN) raises
    # inside the Arrow fold). greatest(col, 0) fixes both — greatest
    # ignores nulls unless all args are null.
    measure = (
        F.col(tokens_col).cast("long")
        if tokens_col is not None
        else token_count(F.col(text_col))
    )
    base = df.select(
        F.col(id_col),
        (
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % shards
        ).alias("shard"),
        F.greatest(measure, F.lit(0).cast("long")).alias("n_tokens"),
    )

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True], kind="mergesort"
        )
        bin_ids: list[int] = []
        bin_id, fill = 0, 0
        for n in pdf["n_tokens"]:
            if bin_id == 0 or fill + n > max_tokens:
                bin_id += 1
                fill = int(n)
            else:
                fill += int(n)
            bin_ids.append(bin_id)
        pdf = pdf.assign(bin_id=bin_ids)
        return pdf[[id_col, "shard", "bin_id", "n_tokens"]]

    return base.groupBy("shard").applyInPandas(
        _pack,
        f"{id_col} {id_type}, shard long, bin_id long, n_tokens long",
    )
