"""Deterministic, key-consistent sampling and dataset splits.

Training-data pipelines need sampling that is (a) reproducible across runs
and engines, (b) *consistent by key* — if ``user 42`` is sampled into the
10% slice, every table sampled on ``user_id`` keeps the same users, so joins
between sampled tables stay complete — and (c) driver-free at 100 TB.
``df.sample``/``sampleBy`` give none of that (seeded RNG is
partitioning-dependent and engine-specific).

The portable primitive: md5 over the key's canonical string form, compare
the first 8 hex chars against ``round(fraction * 2^32)`` rendered as 8-digit
hex. md5 is identical everywhere (Spark, DuckDB, Python), lowercase-hex
digits sort lexicographically = numerically, so the predicate is a pure
codegen'd projection — no shuffle, no RNG state, pushes down like any
filter.

The reference has no sampling surface at all; §2.11 capability add.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket_expr",
    "hash_sample",
    "hash_split",
    "weighted_hash_sample",
    "stratified_hash_sample",
    "balanced_mixture_sample",
    "temperature_mixture_sample",
    "upsample_epochs",
    "epoch_shuffle",
]

_SPACE = 1 << 32  # 8 hex chars


def _prefix(keys: list[str]) -> Column:
    # Canonical key string: values cast to string, '|'-joined. concat_ws
    # skips nulls (a null key component hashes like the empty string —
    # document, don't crash).
    return F.substring(
        F.md5(F.concat_ws("|", *[F.col(k).cast("string") for k in keys])), 1, 8
    )


def _hex_threshold(cum_fraction: float) -> str:
    return format(min(round(cum_fraction * _SPACE), _SPACE - 1), "08x")


def _col_threshold(frac: Column) -> Column:
    """Per-row hex admission threshold for a COLUMN fraction: 8-digit hex
    of ``trunc(frac·2³²)``, the rendering every column-rate sampler
    (weighted / temperature / balanced / upsample) shares and their
    DuckDB oracles mirror as ``FLOOR(rate*4294967296)``.

    NOTE the deliberate family split: literal-fraction samplers
    (``hash_sample``/``hash_split``) ROUND via ``_hex_threshold``;
    column-rate samplers TRUNCATE — a key whose md5 prefix lands exactly
    on the 2⁻³² boundary cell can therefore differ between the two
    families (≈2⁻³² of keys per boundary), but is always consistent
    WITHIN a family and with its oracle."""
    return F.lpad(
        F.lower(F.hex((frac * F.lit(float(_SPACE))).cast("bigint"))), 8, "0"
    )


def hash_bucket_expr(keys: list[str]) -> Column:
    """The raw 8-hex-char bucket string (sorts uniformly over 2^32)."""
    return _prefix(list(keys))


def hash_sample(
    df: DataFrame, keys: list[str] | tuple[str, ...], fraction: float
) -> DataFrame:
    """Keep ≈``fraction`` of rows, decided ONLY by ``keys`` (stable across
    runs, partitionings, engines, and sibling tables sharing the key)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    # Exact endpoints short-circuit: the threshold caps at 'ffffffff' with a
    # strict '<', so without this a 100% sample would deterministically drop
    # keys whose md5 prefix is exactly 'ffffffff' (~1 in 2^32).
    if fraction >= 1.0:
        return df
    if fraction <= 0.0:
        return df.where(F.lit(False))
    return df.where(_prefix(list(keys)) < F.lit(_hex_threshold(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    keys: list[str] | tuple[str, ...],
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling rates (``df.sampleBy`` surface) with hash_sample's
    guarantees: deterministic, key-consistent, engine-portable, pure filter.

    Down-weighting over-represented strata (boilerplate-heavy domains, bot
    traffic, one dominant language) while keeping rare strata at 100% is the
    standard rebalancing step for training corpora; at 100 TB it must be a
    scan-side filter, not a shuffle. Strata absent from ``fractions`` get
    ``default_fraction``.
    """
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0,1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0,1], got {default_fraction}")

    prefix = _prefix(list(keys))

    def admit(fraction: float) -> Column:
        if fraction >= 1.0:
            return F.lit(True)
        if fraction <= 0.0:
            return F.lit(False)
        return prefix < F.lit(_hex_threshold(fraction))

    pred: Column | None = None
    for stratum, fraction in fractions.items():
        cond = F.when(F.col(strata_col) == stratum, admit(fraction))
        pred = cond if pred is None else pred.when(
            F.col(strata_col) == stratum, admit(fraction)
        )
    pred = admit(default_fraction) if pred is None else pred.otherwise(
        admit(default_fraction)
    )
    return df.where(pred)


def hash_split(
    df: DataFrame,
    keys: list[str] | tuple[str, ...],
    weights: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Partition rows into named splits (e.g. train/val/test) by key hash.

    ``weights`` must sum to 1. Every row gets exactly one split label; the
    assignment is a chain of threshold comparisons on one md5 prefix —
    a single projection, no shuffle, and the same key always lands in the
    same split even across different tables.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    prefix = _prefix(list(keys))
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = prefix < F.lit(_hex_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, last)


def weighted_hash_sample(
    df: DataFrame,
    keys: list[str] | tuple[str, ...],
    weight: Column,
) -> DataFrame:
    """Keep each row with probability ``clamp(weight, 0, 1)``, decided ONLY
    by md5 of ``keys`` — per-row importance sampling with all of
    ``hash_sample``'s guarantees (reproducible, engine-portable, key-
    consistent, pure codegen filter).

    Unlike the fixed-fraction variants the admission threshold varies per
    row, so it is rendered as 8-digit hex of ``weight·2³²`` and compared
    lexicographically against the key's md5 prefix (same digit space).
    Standard use: length-proportional document sampling, inverse-propensity
    class rebalancing.
    """
    w = F.greatest(weight.cast("double"), F.lit(0.0))
    thresh = _col_threshold(w)
    # weight ≥ 1 short-circuits: its hex is 9 digits and lpad TRUNCATES,
    # so the comparison would silently wrap (same edge as hash_sample's
    # fraction=1.0 bug class).
    return df.where((w >= 1.0) | (_prefix(list(keys)) < thresh))


def balanced_mixture_sample(
    df: DataFrame,
    keys: list[str] | tuple[str, ...],
    strata_col: str,
) -> DataFrame:
    """Down-sample every stratum to the size of the SMALLEST one (uniform
    mixture) — the standard domain-rebalancing step when one source or
    language dominates a crawl — with the md5 predicate's guarantees
    (deterministic, key-consistent, engine-portable).

    Unlike ``stratified_hash_sample`` the rates are not supplied: they are
    computed from the data (``rate_s = min_count / count_s``) as a
    per-stratum aggregate joined back (unhinted — AQE broadcasts it while
    the stratum count allows) — no driver collect, no RNG. Expected kept size per stratum ≈ min_count (hash sampling is
    probabilistic per key, so counts vary by O(√n) around the target, same
    as every fractional sampler here).

    NULL strata are a stratum like any other: the rate join runs on a
    null-coalesced shadow key, because a plain equi-join on the stratum
    column silently DROPS all NULL-stratum rows while their group still
    participates in (and can set) the min count.
    """
    # Exactly the alpha=0 temperature mixture — delegate so the
    # NULL-stratum shadow key, the unhinted rate join, and the admission
    # predicate live in ONE place (r7 review: the bodies had drifted
    # into copy-paste).
    return temperature_mixture_sample(df, keys, strata_col, alpha=0.0)


#: sentinel shadow key for NULL strata — the ONE definition every
#: stratum-rate sampler (temperature / balanced / target) shares
_NULL_STRATUM = "\x00<null-stratum>"


def _stratum_tagged(df: DataFrame, strata_col: str) -> DataFrame:
    """Input tagged with the null-coalesced shadow stratum key ``_sk``
    (a plain equi-join on the raw stratum column would silently DROP
    all NULL-stratum rows while their group still sets rates)."""
    return df.withColumn(
        "_sk",
        F.coalesce(F.col(strata_col).cast("string"), F.lit(_NULL_STRATUM)),
    )


def _stratum_mass(tokens_col: str | None):
    """Per-stratum mass aggregate: document count, or token mass
    (NULL counts weigh 0; clamped ≥ 1 so an all-empty stratum keeps a
    defined rate) — shared by every stratum-rate sampler."""
    if tokens_col is None:
        return F.count(F.lit(1))
    return F.greatest(
        F.sum(F.coalesce(F.col(tokens_col), F.lit(0))), F.lit(1)
    )


def _admit_by_stratum_rate(tagged, keys, rates) -> DataFrame:
    """Shared sampler tail: unhinted rate join (AQE broadcasts while
    the stratum count allows) + md5 admission + working-column drop."""
    joined = tagged.join(rates, "_sk")
    return weighted_hash_sample(joined, list(keys), F.col("_rate")).drop(
        "_rate", "_sk"
    )


def temperature_mixture_sample(
    df: DataFrame,
    keys: list[str] | tuple[str, ...],
    strata_col: str,
    alpha: float = 0.5,
    tokens_col: str | None = None,
) -> DataFrame:
    """Temperature-based mixture sampling (the mT5/PaLM multilingual
    recipe): keep a per-stratum share proportional to ``n_s^alpha``, so
    small sources are boosted relative to the natural distribution
    without replacement — realized as pure down-sampling with
    ``rate_s = (n_min / n_s)^(1-alpha)``:

    - ``alpha = 0``  → every stratum down to the smallest one's size
      (exactly ``balanced_mixture_sample``);
    - ``alpha = 1``  → natural distribution, nothing dropped;
    - ``0 < alpha < 1`` → the standard temperature interpolation
      (kept_s = n_min^(1-alpha) · n_s^alpha ∝ n_s^alpha).

    Same guarantees as every sampler here: md5 admission predicate —
    deterministic, key-consistent, engine-portable, zero RNG, zero
    driver collect; rates come from a per-stratum aggregate joined back
    (unhinted — AQE decides). NULL strata participate via the shadow
    key, as in ``balanced_mixture_sample``.

    Portability note: ``alpha = 0.5`` evaluates the rate with ``sqrt``,
    which IEEE 754 requires to be CORRECTLY ROUNDED — bit-identical in
    every engine — so 0.5 is the temperature an oracle-checked pipeline
    should prefer; other exponents go through ``pow``, whose last-ulp
    behavior is implementation-defined (Java ``Math.pow`` vs C libm)
    and can flip a document sitting exactly on the admission threshold.

    ``tokens_col``: when set, strata are weighed by their TOKEN MASS
    (``sum(tokens_col)``) instead of document counts — training
    mixtures are token-budgeted in practice (a stratum of few huge docs
    costs as much budget as one of many small docs), so the kept share
    becomes ∝ ``m_s^alpha`` over token masses. Same ``tokens_col``
    convention as the packer (``packing.py:pack_documents_greedy``):
    feed it real tokenizer counts (``bpe_encode``'s ``n_tokens``).
    NULL counts weigh 0; a stratum's mass is clamped to ≥ 1 (mirroring
    doc counts, which are never 0) so an all-empty stratum keeps a
    defined rate instead of dividing by zero — and note the admission
    stays PER-DOCUMENT (each doc of a stratum keeps with probability
    ``rate_s``): the expected KEPT TOKEN mass is ``rate_s · m_s``
    because the md5 predicate is independent of document length.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    tagged = _stratum_tagged(df, strata_col)
    counts = tagged.groupBy("_sk").agg(
        _stratum_mass(tokens_col).alias("_n")
    )
    w = Window.partitionBy(F.lit(0))
    ratio = F.min("_n").over(w).cast("double") / F.col("_n")
    if alpha == 0.5:
        rate = F.sqrt(ratio)
    elif alpha == 0.0:
        rate = ratio
    elif alpha == 1.0:
        rate = F.lit(1.0)
    else:
        rate = F.pow(ratio, F.lit(1.0 - alpha))
    rates = counts.select("_sk", rate.alias("_rate"))
    return _admit_by_stratum_rate(tagged, keys, rates)


def target_mixture_sample(
    df: DataFrame,
    keys: list[str] | tuple[str, ...],
    strata_col: str,
    weights: dict,
    tokens_col: str | None = None,
) -> DataFrame:
    """Realize an ARBITRARY target mixture by pure down-sampling — the
    consumer of a data-driven weight artifact (``doremi.py``'s averaged
    iterate, a hand-tuned domain recipe, a compliance quota):

        kept mass of stratum s  =  c · w_s,   c = min_s (m_s / w_s)

    i.e. the largest corpus consistent with the target proportions
    ``w`` that never UP-samples any stratum (the bottleneck stratum is
    kept whole; every other stratum down-samples to its share). Rates
    follow as ``rate_s = c · w_s / m_s ≤ 1`` and admission is the md5
    predicate — deterministic, key-consistent, engine-portable, zero
    RNG, zero driver collect (same guarantees as every sampler here).

    ``weights``: stratum value → non-negative target share (need not
    sum to 1 — only proportions matter; a ``None`` key addresses the
    NULL stratum). Zero-weight strata are dropped entirely. A stratum
    OBSERVED in the data but absent from ``weights`` raises AT
    EXECUTION with the stratum name (lazy ``assert_true`` guard — a
    typo'd recipe must not silently drop a domain). Strata named in
    ``weights`` but absent from the data simply contribute nothing:
    the realized proportions then hold over the PRESENT strata.

    ``tokens_col``: as in ``temperature_mixture_sample`` — masses are
    token sums instead of document counts, and the admission stays
    per-document, so kept TOKEN mass tracks ``c·w_s`` in expectation.
    """
    if not weights:
        raise ValueError("target_mixture_sample: weights must be non-empty")
    for k, v in weights.items():
        fv = float(v)
        if not math.isfinite(fv) or fv < 0.0:
            raise ValueError(
                f"target_mixture_sample: weight for {k!r} must be a "
                f"finite non-negative number, got {v!r}"
            )
    if not any(float(v) > 0.0 for v in weights.values()):
        raise ValueError(
            "target_mixture_sample: at least one weight must be positive"
        )
    tagged = _stratum_tagged(df, strata_col)
    masses = tagged.groupBy("_sk").agg(
        _stratum_mass(tokens_col).alias("_m")
    )
    spark = df.sparkSession
    wrows = [
        (_NULL_STRATUM if k is None else str(k), float(v))
        for k, v in weights.items()
    ]
    # two weight keys that stringify identically (5 vs "5", or None vs a
    # literal equal to the NULL sentinel) would yield duplicate _sk rows
    # and the left join below would then DUPLICATE every document of
    # that stratum instead of sampling it — fail loudly at build time
    seen: dict[str, object] = {}
    for (sk, _), orig in zip(wrows, weights):
        if sk in seen:
            raise ValueError(
                "target_mixture_sample: weight keys "
                f"{seen[sk]!r} and {orig!r} collide on stratum key "
                f"{sk!r} after stringification"
            )
        seen[sk] = orig
    wdf = spark.createDataFrame(wrows, "_sk string, _w double")
    wall = Window.partitionBy()
    # c over the bounded per-stratum table (stratum cardinality —
    # domains/languages — not data volume); zero-weight strata are
    # excluded from the bottleneck min
    c = F.min(
        F.when(F.col("_w") > 0.0, F.col("_m") / F.col("_w"))
    ).over(wall)
    rate = (
        F.when(
            F.col("_w").isNull(),
            # loud lazy guard: an unweighted observed stratum fails the
            # JOB with its name, instead of silently vanishing
            F.assert_true(
                F.lit(False),
                F.concat(
                    F.lit(
                        "target_mixture_sample: stratum observed in the "
                        "data but missing from weights: "
                    ),
                    F.col("_sk"),
                ),
            ).cast("double"),
        )
        .when(F.col("_w") > 0.0, c * F.col("_w") / F.col("_m"))
        .otherwise(F.lit(0.0))
    )
    rates = masses.join(wdf, "_sk", "left").select(
        "_sk", rate.alias("_rate")
    )
    return _admit_by_stratum_rate(tagged, keys, rates)


def upsample_epochs(
    df: DataFrame,
    keys: list[str] | tuple[str, ...],
    rate,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Fractional-epoch upsampling — the >1× half of mixture weighting
    (temperature/balanced sampling only DOWN-weights; a data recipe that
    repeats small high-quality sources needs rows MATERIALIZED multiple
    times): every row is emitted ``floor(rate)`` times plus one more
    with probability ``rate - floor(rate)``, decided by the same md5
    predicate as every COLUMN-rate sampler here (deterministic,
    key-consistent, engine-portable, no RNG — see ``_col_threshold`` for
    the truncation-vs-round family split). ``rate`` is a Column (e.g. a
    per-source target joined on) or a literal float; rates < 1 degrade
    gracefully to ``weighted_hash_sample``'s admission set exactly
    (0 full copies + one md5-admitted), so the same call expresses
    down- AND up-sampling.

    Output adds ``epoch_col`` (1-based copy index) — downstream epoch
    shuffling keys on (keys…, epoch) so repeated copies spread across
    shards instead of clumping.

    Scale shape: one codegen projection computes n_copies per row, ONE
    ``explode(sequence(1, n_copies))`` materializes the copies —
    map-only, no shuffle, no driver participation. The preceding
    ``n_copies > 0`` filter is LOAD-BEARING, not an optimization:
    Spark's ``sequence(1, 0)`` defaults to step=-1 and yields ``[1, 0]``
    — without the filter a zero-rate row would be emitted TWICE.
    """
    r = F.lit(rate).cast("double") if not isinstance(rate, Column) else rate
    r = F.greatest(r, F.lit(0.0))
    full = F.floor(r).cast("int")
    frac = r - F.floor(r)
    thresh = _col_threshold(frac)
    extra = (
        F.when(frac <= 0.0, F.lit(0))
        .when(_prefix(list(keys)) < thresh, F.lit(1))
        .otherwise(F.lit(0))
    )
    n_copies = (full + extra).alias("_n_copies")
    out = df.withColumn("_n_copies", n_copies).where(F.col("_n_copies") > 0)
    return (
        out.select(
            "*",
            F.explode(
                F.sequence(F.lit(1), F.col("_n_copies"))
            ).alias(epoch_col),
        )
        .drop("_n_copies")
    )


def epoch_shuffle(
    df: DataFrame,
    keys: list[str] | tuple[str, ...],
    seed: int = 0,
    n_shards: int = 16,
) -> DataFrame:
    """Deterministic global training-order reshuffle, realized as
    ``(shard, pos_in_shard)`` — the scalable form of "ORDER BY random()".

    A training run needs a different-but-reproducible order per epoch; a
    literal global sort + row_number would funnel 100 TB through one
    window partition. Instead: md5 over (keys, seed) gives each row a
    uniform 2³²-space rank; ``shard = rank % n_shards`` spreads rows over
    shards (each shard a uniform random subset), and ``pos_in_shard`` is a
    per-shard window rank — readers consume shards round-robin to realize
    the permutation. Changing ``seed`` (the epoch number) yields an
    independent permutation; the same seed is bit-identical across runs,
    partitionings, and engines (md5, like the samplers above).

    One shuffle (the per-shard window). Output: input columns +
    ``shuffle_rank`` (the 2³² rank), ``shard``, ``pos_in_shard``.
    """
    rank = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    *[F.col(k).cast("string") for k in keys],
                    F.lit(str(seed)),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    out = df.withColumn("shuffle_rank", rank).withColumn(
        "shard", F.pmod(F.col("shuffle_rank"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(
        "shuffle_rank", *[F.col(k) for k in keys]
    )
    return out.withColumn("pos_in_shard", F.row_number().over(w))
