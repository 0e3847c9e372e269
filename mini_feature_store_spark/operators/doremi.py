"""DoReMi-style domain reweighting with hashed n-gram proxy models
(Xie et al. 2023, arXiv:2305.10429 — "DoReMi: Optimizing Data Mixtures
Speeds Up Language Model Pretraining").

DoReMi picks pretraining mixture weights by Group DRO: per step, domain
weights move by an exponentiated-gradient update on each domain's
EXCESS LOSS — its loss under the proxy model (trained on the current
mixture) minus its loss under a reference model (trained on the
baseline mixture) — then the final mixture is the average iterate.

This implementation substitutes the paper's 280M-parameter proxy with
the repo's hashed bag-of-ngram models (the ``dsir.py`` generative
family): a "model trained on mixture α" is the add-1-smoothed
multinomial over hash buckets whose counts are the α-weighted blend of
per-domain bucket distributions. That keeps the whole algorithm inside
one honest Spark shape — and it must be said plainly: a static mixture
model has no training dynamics, so the minimax fixed point is the
reference mixture itself (excess ≡ 0 there). The useful output is the
AVERAGED iterate: starting from uniform, domains travel toward the
reference mixture at a rate proportional to their hardness (excess
loss), so ᾱ is a principled, data-driven interpolation between uniform
and the reference — the quantity temperature mixing
(``sampling.py:temperature_mixture_sample``) otherwise sets by a blind
global α.

Spark-first shape (designed for 100 TB):

- ONE corpus scan: the gram explosion collapses into a single
  map-side-combined hash aggregate keyed by (domain, bucket) — at most
  D·B rows (domains × ``n_buckets``), BOUNDED BY CONSTRUCTION at any
  corpus size;
- every model quantity (per-domain totals, normalized frequencies,
  blended counts, log probabilities, per-domain NLLs) is arithmetic
  over that bounded table — the corpus is never touched again;
- the DRO loop itself runs driver-side over the COLLECTED D·B table —
  the sanctioned bounded-collect trainer class (module precedent: the
  LR trainer's d+1-double gradients, the EM trainer's vocab-bounded
  partials); the artifact is D floats.

Engine-parity conventions (for the oracled first-round companion,
``queries.py:doc_doremi_excess_loss``): per-domain normalized bucket
frequencies are integer fixed-point at scale 12 computed with exact
integer division (``(cnt · 10¹²) div T_d`` — DECIMAL(38,0) on Spark,
HUGEINT on DuckDB, both exact), per-bucket log probabilities are
fixed-point rounded at scale 8 BEFORE the domain sums (the
``dsir_bucket_weights`` discipline), and all domain-level outputs are
``round_half_up(·, 4)``.

The reference repo has no data-mixing tier at all (it is a feature
store; SURVEY.md §2.11) — this operator extends the beyond-reference
training-data tier alongside DSIR / temperature mixing / packing.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mini_feature_store_spark.functions import round_half_up, track_cache
from mini_feature_store_spark.operators.dsir import _bucketed_grams

#: integer fixed-point scale for per-domain normalized bucket
#: frequencies — exact in DECIMAL(38,0)/HUGEINT integer division, and
#: 10¹² · D fits comfortably in BIGINT after the cross-domain sum.
FREQ_SCALE = 10**12

#: integer fixed-point scale for mixture weights α when they feed a
#: BLENDED model (rounds ≥ 2): quantizing α before the blend makes the
#: round-2 model integer-exact and therefore oracle-replayable — the
#: float work (exp / normalize) happens BEFORE the quantization, and
#: scale 8 puts rounding-boundary flips from engine ulp noise at
#: ~1e-8 probability (the repo's scale-8 log-prob precedent).
ALPHA_SCALE = 10**8


def doremi_bucket_counts(
    df: DataFrame,
    *,
    domain_col: str = "source",
    text_col: str = "text",
    n_buckets: int = 2048,
    max_order: int = 2,
) -> DataFrame:
    """``(domain, bucket, cnt)`` — hashed n-gram occurrence counts per
    domain. ONE corpus scan, one map-side-combined aggregate; ≤ D·B
    rows by construction. Shares the gram explosion + md5 bucketing
    with the DSIR tier (``dsir._bucketed_grams``), so the two mixture
    tools can never drift on tokenize/hash conventions."""
    return (
        _bucketed_grams(
            df, text_col, n_buckets, max_order, id_cols=(domain_col,)
        )
        .groupBy(F.col(domain_col).alias("domain"), "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _model_log_probs(counts_col, total_col, n_buckets: int):
    """round8(log((counts + 1) / (total + B))) — the add-1 multinomial
    log probability at the repo's scale-8 fixed point."""
    return round_half_up(
        F.log(
            (counts_col + F.lit(1)).cast("double")
            / (total_col + F.lit(n_buckets)).cast("double")
        ),
        8,
    )


def doremi_excess_loss(
    df: DataFrame,
    *,
    domain_col: str = "source",
    text_col: str = "text",
    n_buckets: int = 2048,
    max_order: int = 2,
) -> DataFrame:
    """Per-domain FIRST-ROUND excess loss — the deterministic core of
    the DoReMi update, as an oracle-checkable DataFrame:

    ``(domain, n_grams, nll_proxy, nll_reference, excess_loss)``

    - proxy = the UNIFORM-mixture model (α₀ = 1/D): bucket counts are
      the sum of per-domain scale-12 normalized frequencies
      ``f_{d,b} = (cnt · 10¹²) div T_d`` (equal-weight blend — the
      same distribution as averaging, exact in integers);
    - reference = the PROPORTIONAL model: raw corpus counts (the
      natural mixture DoReMi measures excess against);
    - ``nll_d(model) = −Σ_b cnt_{d,b} · w_b / T_d`` at scale 4, where
      ``w_b`` is the model's scale-8 add-1 log probability;
    - ``excess = max(0, nll_proxy − nll_reference)`` — the clipped DRO
      gradient signal for round 1.

    Everything after the one corpus scan is arithmetic over the
    bounded (domain, bucket) table; the two window sums run over that
    bounded table in a single partition by construction (the
    ``dsir_bucket_weights`` totals pattern — a crossJoin of 1-row
    aggregates would duplicate the counts subtree)."""
    base = _freq_base(
        df,
        domain_col=domain_col,
        text_col=text_col,
        n_buckets=n_buckets,
        max_order=max_order,
    )
    per_dom = _round1_stats(base, n_buckets)
    return per_dom.select(
        "domain",
        F.col("n_grams").cast("long"),
        "nll_proxy",
        "nll_reference",
        round_half_up(
            F.greatest(
                F.lit(0.0), F.col("nll_proxy") - F.col("nll_reference")
            ),
            4,
        ).alias("excess_loss"),
    )


def _freq_base(
    df: DataFrame,
    *,
    domain_col: str,
    text_col: str,
    n_buckets: int,
    max_order: int,
) -> DataFrame:
    """``(domain, bucket, cnt, _t, _f)`` — the bounded count table with
    per-domain totals and exact scale-12 integer normalized
    frequencies. ONE corpus scan; everything downstream is arithmetic
    over these ≤ D·B rows.

    The table is ``persist()``ed (r16): both excess-loss operators
    reference it from several join/aggregate branches (round 1: the
    blended-model aggregate plus the per-domain join-back; round 2:
    those plus the α-blend and the round-2 NLL join-back), and Catalyst
    plans duplicated aggregate subtrees with zero ReusedExchange — so
    unpersisted, the corpus scan + gram explosion + (domain, bucket)
    hash aggregate executed up to 4× per run. The cached frame is ≤ D·B
    narrow rows — bounded by construction at any corpus size. Registry
    consumers carry PLAN_BUILD_CACHE_ALLOWLIST entries; the bench's
    clearCache() bounds accumulation."""
    counts = doremi_bucket_counts(
        df,
        domain_col=domain_col,
        text_col=text_col,
        n_buckets=n_buckets,
        max_order=max_order,
    )
    wd = Window.partitionBy("domain")
    # exact integer fixed-point normalized frequency: DECIMAL(38,0)
    # keeps cnt·10¹² exact (BIGINT would overflow past cnt ≈ 9.2e6),
    # `div` is integral division on both engines
    f = F.expr(
        f"CAST((CAST(cnt AS DECIMAL(38,0)) * {FREQ_SCALE}) "
        f"DIV _t AS BIGINT)"
    )
    # lifecycle: see functions.track_cache — released by
    # release_operator_caches() / clearCache(), never by this operator
    return track_cache(
        counts.withColumn("_t", F.sum("cnt").over(wd))
        .withColumn("_f", f)
        .persist()
    )


def _round1_stats(base: DataFrame, n_buckets: int) -> DataFrame:
    """Per-domain ``(domain, n_grams, nll_proxy, nll_reference)`` under
    the round-1 models: uniform-mixture proxy (Σ of per-domain
    scale-12 frequencies — exact at α₀ = 1/D, the normalizer absorbs
    the D factor) and the proportional reference (raw counts)."""
    wall = Window.partitionBy()
    model = (
        base.groupBy("bucket")
        .agg(F.sum("_f").alias("_s"), F.sum("cnt").alias("_r"))
        .select(
            "bucket",
            "_s",
            "_r",
            F.sum("_s").over(wall).alias("_st"),
            F.sum("_r").over(wall).alias("_rt"),
        )
        .select(
            "bucket",
            _model_log_probs(F.col("_s"), F.col("_st"), n_buckets).alias(
                "_wp"
            ),
            _model_log_probs(F.col("_r"), F.col("_rt"), n_buckets).alias(
                "_wr"
            ),
        )
    )
    return (
        base.select("domain", "bucket", "cnt", "_t")
        .join(model, "bucket")
        .groupBy("domain")
        .agg(
            F.first("_t").alias("n_grams"),
            round_half_up(
                -F.sum(F.col("cnt") * F.col("_wp")) / F.first("_t"), 4
            ).alias("nll_proxy"),
            round_half_up(
                -F.sum(F.col("cnt") * F.col("_wr")) / F.first("_t"), 4
            ).alias("nll_reference"),
        )
    )


def doremi_excess_loss_round2(
    df: DataFrame,
    *,
    domain_col: str = "source",
    text_col: str = "text",
    n_buckets: int = 2048,
    max_order: int = 2,
    step: float = 1.0,
    smoothing: float = 1e-3,
) -> DataFrame:
    """Per-domain ROUND-2 excess loss — the first mixture-DEPENDENT
    step of the DoReMi trajectory, fully oracle-checkable (r13 judge
    directive #4):

    ``(domain, n_grams, alpha_r1, nll_proxy, nll_reference,
    excess_loss)``

    1. round-1 excess per domain exactly as ``doremi_excess_loss``;
    2. the exponentiated-gradient update IN-ENGINE over the D-row
       frame: ``α₁ ∝ exp(step · excess₁)`` (uniform α₀ cancels),
       smoothed ``(1−c)·α + c/D``, then QUANTIZED to scale-8 integers
       ``A_d = floor(α·10⁸ + 0.5)`` — ``alpha_r1 = A_d/10⁸`` is
       emitted so the oracle pins the update itself;
    3. the round-2 proxy is the α₁-blended model: integer bucket
       counts ``s_b = Σ_d A_d·D·f_{d,b}`` (exact in DECIMAL(38,0) /
       HUGEINT — ≤ 10⁸·D²·10¹² per bucket), add-1 smoothing carried at
       the α scale (``(s + 10⁸)/(s_tot + B·10⁸)`` — the integerized
       form of ``(s'+1)/(s'_tot+B)`` in frequency units), log probs
       rounded scale-8, domain NLLs scale-4;
    4. ``excess = round4(max(0, nll_proxy − nll_reference))`` against
       the SAME fixed proportional reference as round 1.

    At the reference mixture the blend reproduces the reference model
    (excess ≡ 0 — the documented fixed point); away from it, round 2's
    excess reflects the hardness REMAINING after round 1's move — the
    mixture-dependent dynamics the static round-1 signal can't show.
    Still one corpus scan: every step is arithmetic over the bounded
    (domain, bucket) table, with the two D-row side tables broadcast
    by construction. Pinned to ``doremi_domain_weights(rounds=2)``'s
    trajectory by test."""
    base = _freq_base(
        df,
        domain_col=domain_col,
        text_col=text_col,
        n_buckets=n_buckets,
        max_order=max_order,
    )
    wall = Window.partitionBy()
    e1 = _round1_stats(base, n_buckets).select(
        "domain",
        "n_grams",
        "nll_reference",
        round_half_up(
            F.greatest(
                F.lit(0.0), F.col("nll_proxy") - F.col("nll_reference")
            ),
            4,
        ).alias("_e"),
    )
    # association mirrors the driver loop EXACTLY (review r14): v =
    # α₀·exp(step·e) with α₀ = 1/D, then (1−c)·(v/z) + c/D — the same
    # float op order in engine, oracle, and loop, so the scale-8
    # quantization below cannot flip on association noise (only on the
    # accepted sum-order ulp band)
    dcnt = F.count(F.lit(1)).over(wall)
    scaled = (F.lit(1.0) / dcnt.cast("double")) * F.exp(
        F.lit(float(step)) * F.col("_e")
    )
    z = F.sum(scaled).over(wall)
    alpha = (
        F.lit(1.0 - smoothing) * (scaled / z)
        + F.lit(smoothing) / dcnt.cast("double")
    )
    al = e1.select(
        "domain",
        "n_grams",
        "nll_reference",
        F.floor(alpha * F.lit(float(ALPHA_SCALE)) + F.lit(0.5))
        .cast("long")
        .alias("_a"),
        dcnt.alias("_d"),
    )
    # null-safe equality: a NULL domain is a first-class stratum (the
    # sampling-tier contract) and must not fall out of the blend join
    alk = al.select(F.col("domain").alias("_dom"), "_a", "_d")
    blend = base.select("domain", "bucket", "cnt", "_t", "_f").join(
        F.broadcast(alk), F.col("domain").eqNullSafe(F.col("_dom"))
    ).drop("_dom")
    s2 = (
        blend.groupBy("bucket")
        .agg(
            F.sum(
                F.expr("CAST(_a * _d AS DECIMAL(38,0)) * _f")
            ).alias("_s2")
        )
        .select("bucket", "_s2", F.sum("_s2").over(wall).alias("_s2t"))
    )
    w2 = s2.select(
        "bucket",
        round_half_up(
            F.log(
                (F.col("_s2").cast("double") + F.lit(float(ALPHA_SCALE)))
                / (
                    F.col("_s2t").cast("double")
                    + F.lit(float(n_buckets * ALPHA_SCALE))
                )
            ),
            8,
        ).alias("_wp2"),
    )
    nd2 = (
        base.select("domain", "bucket", "cnt", "_t")
        .join(w2, "bucket")
        .groupBy("domain")
        .agg(
            round_half_up(
                -F.sum(F.col("cnt") * F.col("_wp2")) / F.first("_t"), 4
            ).alias("nll_proxy")
        )
    )
    nd2k = nd2.select(F.col("domain").alias("_dom2"), "nll_proxy")
    return al.join(
        F.broadcast(nd2k), F.col("domain").eqNullSafe(F.col("_dom2"))
    ).select(
        "domain",
        F.col("n_grams").cast("long"),
        (F.col("_a").cast("double") / F.lit(float(ALPHA_SCALE))).alias(
            "alpha_r1"
        ),
        "nll_proxy",
        "nll_reference",
        round_half_up(
            F.greatest(
                F.lit(0.0), F.col("nll_proxy") - F.col("nll_reference")
            ),
            4,
        ).alias("excess_loss"),
    )


def doremi_domain_weights(
    df: DataFrame,
    *,
    domain_col: str = "source",
    text_col: str = "text",
    n_buckets: int = 2048,
    max_order: int = 2,
    rounds: int = 10,
    step: float = 1.0,
    smoothing: float = 1e-3,
) -> dict:
    """The full DoReMi loop → mixture-weight artifact.

    ONE corpus scan builds the (domain, bucket) count table; the table
    (≤ D·B rows — bounded by construction) is collected and the
    exponentiated-gradient loop runs driver-side (the bounded-collect
    trainer class; see module docstring for why that is the honest
    shape here). Per round t:

        excess_d = max(0, nll_d(mixture model at α_t) − nll_d(reference))
        α ← normalize(α · exp(step · excess));  α ← (1−c)·α + c/D

    Returns ``{"domains": [...], "weights": {domain: ᾱ_d}`` (the
    averaged iterate — the paper's output), ``"final": {domain: α_T},
    "excess_r1": {domain: e}, "n_grams": {domain: T_d},
    "per_round": [[α...]...]}``. Raises ``ValueError`` on an empty
    corpus or fewer than two domains (the mixture is degenerate).

    Rounding discipline: per-domain NLLs are quantized at scale 4
    (``round_half_up_py`` — the identical quantity the oracled
    companion emits) and per-bucket log probs at scale 8 in EVERY
    round, so round 1's excess ties EXACTLY to ``doremi_excess_loss``
    (pinned by test); rounds ≥ 2 additionally quantize α at scale 8
    BEFORE blending (``ALPHA_SCALE`` — the integerized blend), so each
    round's excess is integer-deterministic given the counts and round
    2 ties EXACTLY to the oracled ``doremi_excess_loss_round2``
    (``excess_per_round`` exposes the trajectory for the pin). The α
    updates themselves (exp / renormalize) remain float work, so the
    registry gate for the full loop stays rows-only — the
    EM-trainer/GD-classifier precedent."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if not 0.0 <= smoothing < 1.0:
        raise ValueError(f"smoothing must be in [0, 1), got {smoothing}")
    rows = doremi_bucket_counts(
        df,
        domain_col=domain_col,
        text_col=text_col,
        n_buckets=n_buckets,
        max_order=max_order,
    ).collect()  # bounded: ≤ D·B rows by construction
    if not rows:
        raise ValueError("doremi_domain_weights: corpus has no grams")
    # NULL domain is a first-class stratum (the sampling-tier contract)
    # — None-safe sort keeps it deterministic, and the returned dicts
    # keep the None key, which target_mixture_sample accepts directly
    domains = sorted(
        {r["domain"] for r in rows}, key=lambda d: (d is None, d or "")
    )
    if len(domains) < 2:
        raise ValueError(
            "doremi_domain_weights: need >= 2 domains, got "
            f"{domains!r}"
        )
    d_ix = {d: i for i, d in enumerate(domains)}
    D = len(domains)
    c: list[dict[int, int]] = [dict() for _ in range(D)]
    for r in rows:
        c[d_ix[r["domain"]]][int(r["bucket"])] = int(r["cnt"])
    T = [sum(m.values()) for m in c]
    # integer scale-12 normalized frequencies — exactly the oracled
    # companion's quantity, so round-1 pins across the two paths
    f = [
        {b: (cnt * FREQ_SCALE) // T[i] for b, cnt in m.items()}
        for i, m in enumerate(c)
    ]
    # reference: proportional (raw-count) model, fixed across rounds
    r_counts: dict[int, int] = {}
    for m in c:
        for b, cnt in m.items():
            r_counts[b] = r_counts.get(b, 0) + cnt
    r_tot = sum(r_counts.values())

    from mini_feature_store_spark.functions import round_half_up_py

    def _nll(i: int, w: dict[int, float]) -> float:
        # rounded at scale 4 — the SAME quantity doremi_excess_loss
        # emits, so excess values (differences of rounded NLLs) tie
        # exactly to the oracled companion at round 1
        return round_half_up_py(
            -sum(cnt * w[b] for b, cnt in c[i].items()) / T[i], 4
        )

    w_ref = {
        b: round_half_up_py(math.log((cnt + 1) / (r_tot + n_buckets)), 8)
        for b, cnt in r_counts.items()
    }
    nll_ref = [_nll(i, w_ref) for i in range(D)]

    alpha = [1.0 / D] * D
    history: list[list[float]] = []
    excess_hist: list[list[float]] = []
    for t in range(rounds):
        # mixture model at α — two regimes sharing one integer form:
        # round 1 blends the scale-12 frequencies EXACTLY (uniform α
        # cancels — the oracled doc_doremi_excess_loss proxy), later
        # rounds quantize α at scale 8 first (A_d = floor(α·10⁸+0.5))
        # so the blend stays integer-exact and ties bit-for-bit to the
        # oracled doc_doremi_excess_round2 / in-engine operator
        s: dict[int, int] = {}
        if t == 0:
            for i in range(D):
                for b, fv in f[i].items():
                    s[b] = s.get(b, 0) + fv
            add_num, add_den = 1.0, float(n_buckets)
        else:
            a_int = [
                math.floor(alpha[i] * ALPHA_SCALE + 0.5) for i in range(D)
            ]
            for i in range(D):
                ad = a_int[i] * D
                for b, fv in f[i].items():
                    s[b] = s.get(b, 0) + ad * fv
            add_num = float(ALPHA_SCALE)
            add_den = float(n_buckets * ALPHA_SCALE)
        s_tot = float(sum(s.values()))
        w_mix = {
            b: round_half_up_py(
                math.log((float(sv) + add_num) / (s_tot + add_den)), 8
            )
            for b, sv in s.items()
        }
        excess = [
            round_half_up_py(max(0.0, _nll(i, w_mix) - nll_ref[i]), 4)
            for i in range(D)
        ]
        excess_hist.append(list(excess))
        scaled = [alpha[i] * math.exp(step * excess[i]) for i in range(D)]
        z = sum(scaled)
        alpha = [
            (1.0 - smoothing) * (v / z) + smoothing / D for v in scaled
        ]
        history.append(list(alpha))
    avg = [sum(h[i] for h in history) / len(history) for i in range(D)]
    return {
        "domains": domains,
        "weights": {d: avg[d_ix[d]] for d in domains},
        "final": {d: alpha[d_ix[d]] for d in domains},
        "excess_r1": {d: excess_hist[0][d_ix[d]] for d in domains},
        "n_grams": {d: T[d_ix[d]] for d in domains},
        "per_round": history,
        "excess_per_round": excess_hist,
    }
