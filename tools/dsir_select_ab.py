"""A/B the two DSIR selection tails on identical scored frames.

The r13 threshold-selection rewrite (dsir.py:_gumbel_topk) trades
gate-scale wall for scale safety: the old ``orderBy().limit(k)`` runs
the scoring chain ONCE but holds a k-sized heap per task (k is a corpus
fraction in real DSIR use — the r12 judge's hazard); threshold
selection runs bounded probe jobs plus one final pass (~2 scoring
passes total) but never holds more than the sketch-accuracy-bounded
boundary band per task. This tool measures both tails over the SAME corpus at
the bench SF and at a 20% budget, writing
``BENCH_WATCH_r13_dsir_selection.json`` so the bench delta on
``doc_dsir_resample`` (1.7 s → ~3.8 s at sf0.1) is attributed to the
documented design trade, not a regression.

The heap variant here is measurement-only scaffolding — the library
path is threshold selection (see tests/test_registry_lint.py's
data-proportional-limit guard for why the heap form must not return).

Usage: python tools/dsir_select_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from pyspark.sql import functions as F

    from mini_feature_store_spark.io import load_testdata
    from mini_feature_store_spark.operators import dsir
    from mini_feature_store_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="dsir-select-ab", shuffle_partitions=32)
    docs = load_testdata(spark, sf_dir, "documents")["documents"]
    target = docs.where(F.col("source") == "src0")
    raw = docs.where(F.col("source") != "src0")
    n_raw = raw.count()

    def heap_tail(imp, k, *, seed, id_col):
        """The pre-r13 shape, reconstructed for measurement only."""
        scored = imp.select(
            id_col,
            "n_features",
            "log_weight",
            dsir.round_half_up(
                F.col("log_weight")
                + -F.log(
                    -F.log(
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat_ws(
                                            "|",
                                            F.col(id_col).cast("string"),
                                            F.lit(str(seed)),
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("long").cast("double")
                            + F.lit(0.5)
                        )
                        / F.lit(dsir._HASH_SPACE)
                    )
                ),
                4,
            ).alias("sample_key"),
        )
        return scored.orderBy(
            F.desc("sample_key"), F.col(id_col)
        ).limit(k)

    def run(tail, k):
        best = float("inf")
        rows = None
        for _ in range(3):
            t0 = time.perf_counter()
            imp = dsir.dsir_importance(target, raw, n_buckets=8192)
            out = tail(imp, k, seed=42, id_col="doc_id")
            rows = out.count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), rows

    results = {}
    for label, k in (("k100_gate", 100), ("k20pct", max(1, n_raw // 5))):
        heap_s, heap_rows = run(heap_tail, k)
        thr_s, thr_rows = run(dsir._gumbel_topk, k)
        assert heap_rows == thr_rows == min(k, n_raw)
        results[label] = {
            "k": k,
            "heap_orderby_limit_sec": heap_s,
            "threshold_selection_sec": thr_s,
        }
        print(label, results[label], flush=True)
    spark.stop()

    out = {
        "protocol": (
            "best-of-3 per variant over identical DSIR scoring chains at "
            f"{sf_dir} (n_raw={n_raw}); heap = the pre-r13 "
            "orderBy().limit(k) tail (measurement-only reconstruction), "
            "threshold = dsir._gumbel_topk's approx_percentile bracket + "
            "core filter + bounded boundary trim. The threshold variant "
            "pays bounded probe jobs + a second scoring pass at gate "
            "scale; its advantage is MEMORY SHAPE (no k-sized per-task "
            "heap, no k*P driver merge), which no single-host wall-clock "
            "can exhibit — see SCALING.md's k-insensitivity rows for the "
            "scale evidence."
        ),
        "results": results,
    }
    path = Path(__file__).resolve().parent.parent / (
        "BENCH_WATCH_r13_dsir_selection.json"
    )
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
