"""Dump ``explain("formatted")`` for named queries to a directory.

Usage: python tools/dump_plans.py <outdir> <tag> q1,q2,...
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    outdir, tag, queries = sys.argv[1], sys.argv[2], sys.argv[3]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mini_feature_store_spark.session import get_spark

    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="mfss-plans", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    qs = entrymod.queries()
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    for name in [s.strip() for s in queries.split(",") if s.strip()]:
        spark.catalog.clearCache()
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out / f"{name}_{tag}.txt").write_text(buf.getvalue())
        print("dumped", name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
