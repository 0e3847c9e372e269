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

from mini_feature_store_spark.functions import round_half_up
from mini_feature_store_spark.operators.dsir import _bucketed_grams

#: integer fixed-point scale for per-domain normalized bucket
#: frequencies — exact in DECIMAL(38,0)/HUGEINT integer division, and
#: 10¹² · D fits comfortably in BIGINT after the cross-domain sum.
FREQ_SCALE = 10**12


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
    counts = doremi_bucket_counts(
        df,
        domain_col=domain_col,
        text_col=text_col,
        n_buckets=n_buckets,
        max_order=max_order,
    )
    wd = Window.partitionBy("domain")
    wall = Window.partitionBy()
    # exact integer fixed-point normalized frequency: DECIMAL(38,0)
    # keeps cnt·10¹² exact (BIGINT would overflow past cnt ≈ 9.2e6),
    # `div` is integral division on both engines
    f = F.expr(
        f"CAST((CAST(cnt AS DECIMAL(38,0)) * {FREQ_SCALE}) "
        f"DIV _t AS BIGINT)"
    )
    base = counts.withColumn(
        "_t", F.sum("cnt").over(wd)
    ).withColumn("_f", f)
    # per-bucket model counts: ONE aggregate over the bounded table —
    # the uniform-mixture proxy sums the per-domain normalized
    # frequencies (same distribution as averaging: the normalizer
    # absorbs the D factor), the proportional reference sums raw counts
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
    per_dom = (
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
    (pinned by test) and later rounds stay deterministic given the
    counts; the α updates themselves (exp / renormalize) are float
    work, so the registry gate for the full loop is rows-only — the
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
    excess_r1: list[float] | None = None
    for _ in range(rounds):
        # mixture model at α: blended scale-12 frequencies (at uniform
        # α this is exactly the oracled proxy, up to the D factor the
        # normalizer absorbs)
        s: dict[int, float] = {}
        for i in range(D):
            a = alpha[i] * D  # scale so uniform α reproduces Σ_d f
            for b, fv in f[i].items():
                s[b] = s.get(b, 0.0) + a * fv
        s_tot = sum(s.values())
        w_mix = {
            b: round_half_up_py(
                math.log((sv + 1) / (s_tot + n_buckets)), 8
            )
            for b, sv in s.items()
        }
        excess = [
            round_half_up_py(max(0.0, _nll(i, w_mix) - nll_ref[i]), 4)
            for i in range(D)
        ]
        if excess_r1 is None:
            excess_r1 = list(excess)
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
        "excess_r1": {d: excess_r1[d_ix[d]] for d in domains},
        "n_grams": {d: T[d_ix[d]] for d in domains},
        "per_round": history,
    }
