"""Run EVERY registered query under a vanilla SparkSession (driver
simulation).

The round driver builds its own SparkSession — unknown conf, possibly
non-UTC timezone, none of our session.py settings. Anything that silently
depends on get_spark()'s conf (parquet NTZ inference, legacy nanos, Arrow
flags, session tz) breaks ONLY under the driver, which is exactly how round
2 lost all 17 events queries. This sweep is the cheap insurance: every query
at sf0.001 under a bare session, failures collected, nonzero exit on any.

Usage: python tools/vanilla_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("vanilla-sweep")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    bad: list[str] = []
    for i, (name, fn) in enumerate(entry.queries().items()):
        try:
            n = fn(spark, sf_dir).count()
            print(f"{i:3d} {name:30s} {n}", flush=True)
        except Exception as e:  # noqa: BLE001 - collect every failure mode
            bad.append(name)
            print(
                f"{i:3d} {name:30s} FAIL {type(e).__name__}: {str(e)[:200]}",
                flush=True,
            )
    print("FAILURES:", bad, flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
