"""Skew probe for the order/supplier-key joins (r5 VERDICT #8 / r6 #7).

The de-hinting sweep (r6/r7) left the Q7/Q18 join build sides to the
planner/AQE. This probe supplies the measured evidence that the choice
survives a PLANTED celebrity key — the skew shape that defines job
wall-clock at 100 TB — matching the measured-evidence standard of the
dedup family in SCALING.md.

Corpus model: a synthetic orders/lineitem pair at a multiple of sf0.1
volume where ONE supplier owns ``hot_frac`` (default 30%) of all
lineitems and ONE customer owns 30% of all orders — the mega-vendor /
house-account shape real ledgers have. Uniform keys otherwise.

Timed variants of the Q7 join chain (lineitem ⋈ orders ⋈ customer ⋈
supplier → 3-key aggregate), dims forced too big to broadcast
(autoBroadcastJoinThreshold=-1, so the sort-merge path that 100 TB dims
actually take is what's measured):

- ``smj_skew_split_on``   — AQE skew-join split enabled (the default the
                            de-hinted queries now rely on)
- ``smj_skew_split_off``  — the straggler baseline (what a hard-hinted
                            plan degrades to when the hinted side stops
                            fitting and the hint is removed in a hurry)
- ``salted``              — operators/skew.py:salted_join on the hot
                            supplier join (planner-independent fix)
- ``aqe_free_choice``     — broadcast threshold restored: AQE promotes
                            the dims (what actually happens at test
                            scale; the reason hints were pure risk)

plus the Q18 aggregate (groupBy l_orderkey → join back) over a lineitem
variant whose celebrity key is planted on l_orderkey ITSELF (one
mega-order owns hot_frac of all lines): aggregation skew needs NO
mitigation — hash aggregation is two-phase, the hot group
partial-combines map-side; the probe measures it to demonstrate exactly
that.

Results merge into SCALING_RESULTS.json under ``"skew_probe"``;
SCALING.md interprets them.

Usage: python tools/skew_probe.py [--scale 1] [--hot-frac 0.3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE_LINEITEM = 600_000
BASE_ORDERS = 150_000
N_CUST = 15_000
N_SUPP = 1_000
N_NATION = 25


def gen(out: Path, scale: float, hot_frac: float, seed: int = 23) -> None:
    rng = np.random.default_rng(seed)
    n_li = int(BASE_LINEITEM * scale)
    n_ord = int(BASE_ORDERS * scale)

    hot_cust, hot_supp = 0, 0
    custkey = rng.integers(1, N_CUST, n_ord)
    custkey[rng.random(n_ord) < hot_frac] = hot_cust
    pq.write_table(
        pa.table(
            {
                "o_orderkey": np.arange(n_ord, dtype=np.int64),
                "o_custkey": custkey.astype(np.int64),
            }
        ),
        out / "orders.parquet",
    )
    orderkey = rng.integers(0, n_ord, n_li).astype(np.int64)
    suppkey = rng.integers(1, N_SUPP, n_li)
    suppkey[rng.random(n_li) < hot_frac] = hot_supp
    qty = rng.integers(1, 51, n_li).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": orderkey,
                "l_suppkey": suppkey.astype(np.int64),
                "l_qty": qty,
            }
        ),
        out / "lineitem.parquet",
    )
    # Variant for the AGGREGATION-skew measurement: the celebrity key is
    # planted on l_orderkey itself (one mega-order owns hot_frac of all
    # lines), so groupBy(l_orderkey) has a genuinely hot group. The mask
    # comes from an INDEPENDENT child generator so the base tables stay
    # bit-identical to runs without the variant (same seed → same q7
    # data, round-over-round comparable).
    rng_hot = np.random.default_rng(seed + 1)
    hot_orderkey = orderkey.copy()
    hot_orderkey[rng_hot.random(n_li) < hot_frac] = 0
    pq.write_table(
        pa.table(
            {
                "l_orderkey": hot_orderkey,
                "l_suppkey": suppkey.astype(np.int64),
                "l_qty": qty,
            }
        ),
        out / "lineitem_hotorder.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": np.arange(N_CUST, dtype=np.int64),
                "c_nationkey": (np.arange(N_CUST) % N_NATION).astype(np.int64),
            }
        ),
        out / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": np.arange(N_SUPP, dtype=np.int64),
                "s_nationkey": (np.arange(N_SUPP) % N_NATION).astype(np.int64),
            }
        ),
        out / "supplier.parquet",
    )


def time_op(spark, build, iters: int = 2) -> float:
    best = float("inf")
    for _ in range(iters):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--hot-frac", type=float, default=0.3)
    ap.add_argument("--out", default="/tmp/mfss-skew")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mini_feature_store_spark.operators.skew import salted_join
    from mini_feature_store_spark.session import get_spark

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    gen(out, args.scale, args.hot_frac)

    spark = get_spark(app_name="skew-probe")
    li = spark.read.parquet(str(out / "lineitem.parquet"))
    li_hotorder = spark.read.parquet(str(out / "lineitem_hotorder.parquet"))
    orders = spark.read.parquet(str(out / "orders.parquet"))
    cust = spark.read.parquet(str(out / "customer.parquet"))
    supp = spark.read.parquet(str(out / "supplier.parquet"))

    def q7_join(salted: bool = False):
        """Q7 chain: fact ⋈ orders ⋈ customer ⋈ supplier → 2-key agg."""
        j = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).join(cust, F.col("o_custkey") == F.col("c_custkey"))
        if salted:
            # salt BOTH hot equi-joins' big side; dims replicate 8x
            j = salted_join(
                j.withColumnRenamed("l_suppkey", "s_suppkey"),
                supp,
                on=["s_suppkey"],
                how="inner",
                salt=8,
            )
        else:
            j = j.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        return j.groupBy("c_nationkey", "s_nationkey").agg(
            F.sum("l_qty").alias("qty"), F.count(F.lit(1)).alias("n")
        )

    def q18_agg():
        big = (
            li_hotorder.groupBy("l_orderkey")
            .agg(F.sum("l_qty").alias("total_qty"))
            .where(F.col("total_qty") > 100)
        )
        return big.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).join(cust, F.col("o_custkey") == F.col("c_custkey"))

    results: dict[str, float] = {}

    def set_conf(broadcast: str, skew_split: bool) -> None:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcast)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_split).lower()
        )
        # make the splitter willing to act on test-scale partitions
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8MB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB"
        )

    set_conf("-1", True)
    results["q7_smj_skew_split_on"] = time_op(spark, q7_join)
    set_conf("-1", False)
    results["q7_smj_skew_split_off"] = time_op(spark, q7_join)
    results["q7_salted"] = time_op(spark, lambda: q7_join(salted=True))
    set_conf("10485760", True)
    results["q7_aqe_free_choice"] = time_op(spark, q7_join)

    set_conf("-1", True)
    results["q18_agg_with_celebrity_key"] = time_op(spark, q18_agg)
    set_conf("10485760", True)

    path = Path(__file__).resolve().parent.parent / "SCALING_RESULTS.json"
    data = json.loads(path.read_text()) if path.exists() else {}
    probe = data.setdefault("skew_probe", {})
    key = f"scale{args.scale:g}_hot{args.hot_frac:g}"
    probe[key] = {
        "n_lineitem": int(BASE_LINEITEM * args.scale),
        "n_orders": int(BASE_ORDERS * args.scale),
        "timings": results,
    }
    path.write_text(json.dumps(data, indent=2) + "\n")
    print(json.dumps({key: probe[key]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
