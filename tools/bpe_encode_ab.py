"""A/B the two bpe_encode strategies across merge-table sizes.

The column-fold form compiles one interpreted ``F.aggregate`` per merge —
a Catalyst expression tree of depth ∝ n_merges — while the Arrow replay
form ships the merge table to a ``mapInPandas`` cursor replay whose plan
is CONSTANT in n_merges. This probe measures both at growing n_merges to
locate the fold form's knee and prove the replay form flat: the evidence
behind ``FOLD_MAX_MERGES`` and the SCALING.md row (r10 VERDICT "What's
wrong #1").

Per (n_merges, strategy) it reports:

- ``plan_s``  — time to BUILD + ANALYZE the plan (``df.schema`` forces
  analysis; for the fold form this is where depth ∝ n_merges bites)
- ``exec_s``  — wall time of a noop-write execution (best of 2)

The fold form is skipped (recorded as ``"skipped"``) once a smaller size
exceeded ``--fold-budget`` seconds, so the probe terminates even where
the fold form effectively stalls.

Usage: python tools/bpe_encode_ab.py [--sf-dir /root/testdata/sf0.01]
         [--sizes 10,25,50,100,200,400] [--fold-budget 60]
Writes BENCH_WATCH_r11_bpe_encode.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--sizes", default="10,25,50,100,200,400")
    ap.add_argument("--fold-budget", type=float, default=60.0)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from mini_feature_store_spark.io import load_testdata
    from mini_feature_store_spark.operators.bpe import bpe_encode, bpe_train
    from mini_feature_store_spark.session import get_spark

    spark = get_spark(app_name="bpe-encode-ab", shuffle_partitions=32)
    spark.range(1_000_000).groupBy("id").count().write.format("noop").mode(
        "overwrite"
    ).save()

    docs = load_testdata(spark, args.sf_dir, "documents")[
        "documents"
    ].persist()
    docs.count()

    # one local-path training at the largest size; prefixes give the
    # smaller merge tables (a rank-k prefix of a BPE merge table IS the
    # k-merge table — training is greedy and order-stable)
    merges_all, vocab = bpe_train(docs, n_merges=max(sizes))
    vocab.unpersist()
    merges_all = merges_all.persist()
    n_avail = merges_all.count()
    print(f"trained {n_avail} merges once (local path)", flush=True)

    results: dict[str, dict[str, dict[str, float | str]]] = {}
    fold_dead = False
    for n in sizes:
        if n > n_avail:
            print(f"n={n}: only {n_avail} merges learnable — stop", flush=True)
            break
        sub = merges_all.where(f"merge_rank <= {n}")
        row: dict[str, dict[str, float | str]] = {}
        for strat in ("fold", "replay"):
            if strat == "fold" and fold_dead:
                row[strat] = {"plan_s": "skipped", "exec_s": "skipped"}
                continue
            try:
                t0 = time.perf_counter()
                df = bpe_encode(docs, sub, strategy=strat)
                _ = df.schema  # force analysis
                plan_s = time.perf_counter() - t0
                best = float("inf")
                for _i in range(2):
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001 — the failure IS data
                msg = f"{type(exc).__name__}: {str(exc).splitlines()[0][:160]}"
                jexc = getattr(exc, "java_exception", None)
                if jexc is not None:
                    try:
                        root = jexc
                        while root.getCause() is not None:
                            root = root.getCause()
                        msg = (
                            f"{root.getClass().getName()}"
                            f" (via {type(exc).__name__})"
                        )
                    except Exception:  # noqa: BLE001
                        pass
                row[strat] = {
                    "plan_s": round(time.perf_counter() - t0, 2),
                    "exec_s": "FAILED",
                    "error": msg,
                }
                if strat == "fold":
                    fold_dead = True
                continue
            row[strat] = {
                "plan_s": round(plan_s, 2),
                "exec_s": round(best, 2),
            }
            if strat == "fold" and plan_s + best > args.fold_budget:
                fold_dead = True
        results[str(n)] = row
        print(f"n={n}: {json.dumps(row)}", flush=True)

    out = Path(__file__).resolve().parent.parent / (
        "BENCH_WATCH_r11_bpe_encode.json"
    )
    out.write_text(
        json.dumps(
            {
                "probe": "bpe_encode fold vs replay",
                "sf_dir": args.sf_dir,
                "results": results,
            },
            indent=1,
        )
        + "\n"
    )
    print(json.dumps(results))
    docs.unpersist()
    merges_all.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
