"""Per-query optimization profiler (r16).

For each named query: time the callable's plan-build phase (which for the
trainer class includes its sanctioned bounded driver jobs), the first
noop-sink execution, and a second execution (cache-warm when the query
persists intermediates); optionally dump ``explain("formatted")`` to a
plans directory. Prints one JSON line per query so repeated runs can be
diffed.

Usage:
    python tools/profile_queries.py q1,q2,... [--plans plans/r16 --tag before]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument("--plans", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from mini_feature_store_spark.session import get_spark

    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="mfss-profile", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(10_000).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()
    from mini_feature_store_spark.io import load_testdata

    load_testdata(spark, args.sf_dir, "events")["events"].write.format(
        "noop"
    ).mode("overwrite").save()

    qs = entrymod.queries()
    names = [s.strip() for s in args.queries.split(",") if s.strip()]
    for name in names:
        fn = qs[name]
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"profile:{name}:build")
        t0 = time.perf_counter()
        df = fn(spark, args.sf_dir)
        t_build = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(f"profile:{name}:exec1")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec1 = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(f"profile:{name}:exec2")
        t0 = time.perf_counter()
        df2 = fn(spark, args.sf_dir)
        df2.write.format("noop").mode("overwrite").save()
        t_exec2 = time.perf_counter() - t0
        if args.plans:
            out = Path(args.plans)
            out.mkdir(parents=True, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out / f"{name}_{args.tag}.txt").write_text(buf.getvalue())
        spark.sparkContext.setJobDescription(None)
        print(
            "PROFILE "
            + json.dumps(
                {
                    "query": name,
                    "build_sec": round(t_build, 3),
                    "exec1_sec": round(t_exec1, 3),
                    "iter2_total_sec": round(t_exec2, 3),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
