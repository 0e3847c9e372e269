"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Selects raw-corpus documents whose hashed n-gram distribution looks like
a curated TARGET corpus (arXiv:2302.03169, NeurIPS 2023 — the standard
pretraining data-selection recipe): fit bag-of-hashed-ngram generative
models on the target and raw corpora, weight each raw document by its
log importance ratio log p_target(x) − log p_raw(x), and resample k
documents without replacement under Gumbel noise on the log weights.

The reference repo has no data-selection tier (it is a feature store;
see SURVEY.md §2.11) — this operator belongs to the beyond-reference
training-data tier alongside dedup/decontamination/sampling.

Spark-first shape (designed for 100 TB):

- the hashed feature space is BOUNDED (``n_buckets`` rows, default
  8192), so both corpus count tables collapse to ≤ n_buckets rows via
  one map-side-combined hash aggregate each, the totals are 1-row
  aggregates OVER those bounded tables (no extra corpus scan), and the
  dense weight table is broadcast BY CONSTRUCTION — the per-document
  scoring join never shuffles the corpus;
- per-document scoring is ONE corpus-side shuffle (the ``groupBy(id)``
  sum of broadcast-joined bucket weights), independent of ``max_order``;
- resampling is a deterministic md5-Gumbel key + ``orderBy().limit(k)``
  → TakeOrderedAndProject (distributed partial top-k, never a
  single-task global sort).

Engine-parity conventions (the repo's standing oracle rules): md5 is the
portable hash (``sampling.py``), per-bucket weights are fixed-point
rounded at scale 8 BEFORE document summation so only the (sub-rounding)
float-sum order noise differs across engines, and all document-level
floats are ``round_half_up(·, 4)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mini_feature_store_spark.functions import round_half_up, spread
from mini_feature_store_spark.operators.text import _tokens, normalize

#: 2^32 — the md5-prefix digit space shared with the samplers.
_HASH_SPACE = 4294967296.0


def _bucket(col: Column, n_buckets: int) -> Column:
    """Hash bucket of a gram string: first 8 hex chars of md5 as an
    integer, mod ``n_buckets`` (md5 is identical in Spark / DuckDB /
    Python — the repo's portable-hash convention)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    ).alias("bucket")


def _bucketed_grams(
    df: DataFrame,
    text_col: str,
    n_buckets: int,
    max_order: int,
    id_cols: tuple[str, ...] = (),
    with_sentinel: bool = False,
) -> DataFrame:
    """One row per n-gram OCCURRENCE (k = 1..``max_order``, space-joined
    over the normalized whitespace tokens), carrying ``id_cols`` and the
    hashed ``bucket``. One scan, map-only.

    ``with_sentinel=True`` additionally emits exactly one NULL-bucket
    row per input row (even gram-less ones) — the ``_stacked_gram_counts``
    sentinel trick, so a downstream ``groupBy(id)`` covers EVERY document
    without a corpus-keyed join back onto the id list (which would cost a
    second scan and a second doc_id exchange at 100 TB).

    (The positional explosion deliberately parallels
    ``text.py:_stacked_gram_counts`` — that one counts every-order grams
    with a token-total sentinel for the LM tier; this one carries id
    columns, hashes to buckets, and its sentinel marks the DOCUMENT.
    A change to the shared tokenize/window conventions must land in
    both.)

    NULL text is treated as empty (the ``paragraph_dedup`` contract:
    degenerate docs keep their row, dropping them is a gate's decision).
    """
    t = F.coalesce(
        _tokens(normalize(F.col(text_col))),
        F.array().cast("array<string>"),
    )
    lo = 0 if with_sentinel else 1
    pos = (
        spread(df)
        .select(*id_cols, t.alias("_toks"))
        .select(
            *id_cols,
            "_toks",
            F.explode(
                F.when(
                    F.size("_toks") >= F.lit(1 if lo else 0),
                    F.sequence(F.lit(lo), F.size("_toks")),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("i"),
        )
    )
    gram_arr = F.transform(
        F.sequence(
            F.lit(1),
            F.least(
                F.lit(max_order),
                F.size("_toks") - F.col("i") + F.lit(1),
            ),
        ),
        lambda k: F.array_join(F.slice("_toks", F.col("i"), k), " "),
    )
    if with_sentinel:
        gram_arr = F.when(
            F.col("i") == 0, F.array(F.lit(None).cast("string"))
        ).otherwise(gram_arr)
    grams = pos.select(*id_cols, F.explode(gram_arr).alias("g"))
    return grams.select(*id_cols, _bucket(F.col("g"), n_buckets))


def dsir_bucket_weights(
    target: DataFrame,
    raw: DataFrame,
    *,
    text_col: str = "text",
    n_buckets: int = 8192,
    max_order: int = 2,
) -> DataFrame:
    """DENSE per-bucket importance weights ``(bucket, weight)`` — one row
    for EVERY bucket 0..n_buckets−1, so downstream scoring is a plain
    inner join with no unseen-bucket default path:

        weight[b] = log(c_t[b]+1) − log(c_r[b]+1)
                    + log(N_r + B) − log(N_t + B)

    (add-1 smoothed bag-of-hashed-ngrams log likelihood ratio; the two
    total terms fold the normalizers into the per-bucket weight so a
    document's log importance is exactly the sum of its grams' weights).
    Weights are fixed-point rounded at scale 8 — coarse enough to absorb
    cross-engine libm ``log`` ulp differences, fine enough that document
    sums stay exact at the scale-4 output rounding.

    Everything here is bounded AND single-pass: both corpora stack into
    ONE gram explosion with a target flag (the ``_stacked_gram_counts``
    pattern), so one map-side-combined aggregate produces both count
    columns (≤ B rows) — one corpus read instead of two; totals are
    1-row aggregates over that bounded table (no second corpus scan),
    and the result is B rows — broadcast by construction at any corpus
    size.
    """
    both = target.select(
        F.lit(True).alias("_t"), F.col(text_col).alias(text_col)
    ).unionByName(
        raw.select(F.lit(False).alias("_t"), F.col(text_col).alias(text_col))
    )
    counts = (
        _bucketed_grams(both, text_col, n_buckets, max_order, id_cols=("_t",))
        .groupBy("bucket")
        .agg(
            F.count(F.when(F.col("_t"), 1)).alias("_ct"),
            F.count(F.when(~F.col("_t"), 1)).alias("_cr"),
        )
    )
    spark = target.sparkSession
    dense = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    b = F.lit(n_buckets)
    # corpus totals as window sums over the B-row dense table (bounded
    # single partition by construction) — a 1-row crossJoin aggregate
    # would duplicate the whole counts subtree in the plan, re-scanning
    # the corpus twice more (Catalyst gives no ReusedExchange for
    # duplicated aggregate subtrees; the repo's standing lesson)
    wall = Window.partitionBy()
    ct = F.coalesce(F.col("_ct"), F.lit(0))
    cr = F.coalesce(F.col("_cr"), F.lit(0))
    return (
        dense.join(counts, "bucket", "left")
        .select(
            "bucket",
            round_half_up(
                F.log(ct + F.lit(1))
                - F.log(cr + F.lit(1))
                + F.log(F.sum(cr).over(wall) + b)
                - F.log(F.sum(ct).over(wall) + b),
                8,
            ).alias("weight"),
        )
    )


def dsir_score_with_weights(
    weights: DataFrame,
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    max_order: int = 2,
) -> DataFrame:
    """Score ``df`` under a PREBUILT weight table (the incremental /
    production shape: weights trained once via ``dsir_bucket_weights``
    or loaded from a ``dsir-train`` artifact, then applied to every new
    crawl batch without re-reading either training corpus).

    ``n_buckets`` / ``max_order`` must match the table's training
    configuration — the hash bucketing is part of the model."""
    grams = _bucketed_grams(
        df,
        text_col,
        n_buckets,
        max_order,
        id_cols=(id_col,),
        with_sentinel=True,
    )
    return (
        grams.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            # count(weight): the NULL-bucket sentinel contributes no
            # feature and no mass, only the group
            F.count("weight").alias("n_features"),
            round_half_up(
                F.coalesce(F.sum("weight"), F.lit(0.0)), 4
            ).alias("log_weight"),
        )
        .select(id_col, "n_features", "log_weight")
    )


def dsir_importance(
    target: DataFrame,
    raw: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    max_order: int = 2,
) -> DataFrame:
    """Per-document log importance weights ``(id_col, n_features,
    log_weight)`` for every RAW document (gram-less documents — empty or
    whitespace-only text — keep a row with ``n_features = 0`` and the
    weight-neutral ``log_weight = 0.0``).

    log_weight = Σ over the document's hashed grams of weight[bucket]
    — exactly log p̂_target(doc) − log p̂_raw(doc) under the add-1
    bag-of-hashed-ngrams models. ONE corpus-side shuffle (the per-doc
    sum); the weight join is broadcast by construction (B rows), and a
    per-doc NULL-bucket sentinel row keeps gram-less docs in the single
    aggregate — no join back onto the id list (that shape costs a second
    corpus scan plus a second doc_id exchange).
    """
    w = dsir_bucket_weights(
        target,
        raw,
        text_col=text_col,
        n_buckets=n_buckets,
        max_order=max_order,
    )
    return dsir_score_with_weights(
        w,
        raw,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        max_order=max_order,
    )


def save_dsir_weights(
    weights: DataFrame, out_dir: str, *, n_buckets: int, max_order: int
) -> None:
    """Persist a weight table as ``<out_dir>/weights.parquet`` (bucket,
    weight, n_buckets, max_order — the two config columns ride every
    row so the artifact is self-describing without a sidecar file;
    B rows, bounded)."""
    base = out_dir.rstrip("/")
    (
        weights.select(
            "bucket",
            "weight",
            F.lit(n_buckets).alias("n_buckets"),
            F.lit(max_order).alias("max_order"),
        )
        .write.mode("overwrite")
        .parquet(base + "/weights.parquet")
    )


def load_dsir_weights(spark, model_dir: str) -> tuple[DataFrame, int, int]:
    """Load ``(weights_df, n_buckets, max_order)`` written by
    ``save_dsir_weights``; validates the table is dense (exactly
    n_buckets rows) so a truncated artifact fails loudly."""
    base = model_dir.rstrip("/")
    df = spark.read.parquet(base + "/weights.parquet")
    head = df.limit(1).collect()
    if not head:
        raise ValueError(f"empty DSIR weights artifact at {model_dir!r}")
    n_buckets = int(head[0]["n_buckets"])
    max_order = int(head[0]["max_order"])
    # distinct count, not just row count: a duplicated bucket would
    # double-count every gram hashing to it in the scoring join (and a
    # duplicate implies some other bucket is missing at the same total)
    n = df.select("bucket").distinct().count()
    if n != n_buckets or df.count() != n_buckets:
        raise ValueError(
            f"DSIR weights artifact at {model_dir!r} is not dense: "
            f"{df.count()} rows / {n} distinct buckets for "
            f"n_buckets={n_buckets}"
        )
    return df.select("bucket", "weight"), n_buckets, max_order


def dsir_resample(
    target: DataFrame,
    raw: DataFrame,
    k: int,
    *,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    max_order: int = 2,
) -> DataFrame:
    """Gumbel top-k importance resampling (the paper's without-
    replacement sampler, made deterministic): key = log_weight + g where
    g = −ln(−ln(u)) and u is the md5-uniform of ``(id, seed)`` — the
    samplers' portable digit space, so reruns and engines agree. Top-k
    by ``orderBy(desc(sample_key), id).limit(k)`` — Spark plans
    TakeOrderedAndProject (per-partition heaps + driver merge of k·P
    rows), never a global sort. Ties at the rounded key break by id on
    both engines."""
    imp = dsir_importance(
        target,
        raw,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        max_order=max_order,
    )
    return _gumbel_topk(imp, k, seed=seed, id_col=id_col)


def dsir_resample_with_weights(
    weights: DataFrame,
    raw: DataFrame,
    k: int,
    *,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    max_order: int = 2,
) -> DataFrame:
    """``dsir_resample`` under a PREBUILT weight table (a ``dsir-train``
    artifact): score the batch with ``dsir_score_with_weights``, then
    the same Gumbel top-k — identical output to training in-line when
    the weights came from the same corpora (pinned by test)."""
    imp = dsir_score_with_weights(
        weights,
        raw,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        max_order=max_order,
    )
    return _gumbel_topk(imp, k, seed=seed, id_col=id_col)


def _gumbel_topk(
    imp: DataFrame, k: int, *, seed: int, id_col: str
) -> DataFrame:
    """Shared resampling tail: deterministic md5-Gumbel key over the
    importance frame + TakeOrderedAndProject top-k."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.col(id_col).cast("string"), F.lit(str(seed))
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_HASH_SPACE)
    gum = -F.log(-F.log(u))
    return (
        imp.select(
            id_col,
            "n_features",
            "log_weight",
            round_half_up(F.col("log_weight") + gum, 4).alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), F.col(id_col))
        .limit(k)
    )
