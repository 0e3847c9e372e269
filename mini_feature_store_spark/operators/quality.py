"""Data-quality audit: declarative expectations → one violations report.

Feature stores live or die on input contracts (the reference hard-codes its
nullability contract in twin schemas, ``domain/Schemas.scala:17-50`` +
``Option[_]`` case classes, but never *audits* data against it). This
operator family makes the contract executable: declare expectations, get
one row per check with its violation count — the admission gate a 100 TB
ingest runs before publishing a partition.

Scale shape: all row-local checks (null / range / regexp / set membership)
fold into ONE aggregate over one scan — adding a check adds a counter, not
a pass. Uniqueness and referential integrity are the only checks that
genuinely need a shuffle (one groupBy on the key; one broadcast-able anti
join), and each is a separate small plan unioned into the report.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "expect_not_null",
    "expect_between",
    "expect_in_set",
    "expect_rlike",
    "expect_unique",
    "expect_foreign_key",
    "run_checks",
]


@dataclass(frozen=True)
class _RowCheck:
    """Row-local expectation: a boolean Column; violation = NOT ok (nulls in
    the predicate count as violations — an un-evaluable contract is broken)."""

    name: str
    ok: Column


@dataclass(frozen=True)
class _UniqueCheck:
    name: str
    cols: tuple[str, ...]


@dataclass(frozen=True)
class _ForeignKeyCheck:
    name: str
    col: str
    ref: DataFrame
    ref_col: str


def expect_not_null(col: str) -> _RowCheck:
    return _RowCheck(f"{col}_not_null", F.col(col).isNotNull())


def expect_between(col: str, lo, hi) -> _RowCheck:
    return _RowCheck(
        f"{col}_between", (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    )


def expect_in_set(col: str, values: list) -> _RowCheck:
    return _RowCheck(f"{col}_in_set", F.col(col).isin(*values))


def expect_rlike(col: str, pattern: str) -> _RowCheck:
    return _RowCheck(f"{col}_matches", F.col(col).rlike(pattern))


def expect_unique(*cols: str) -> _UniqueCheck:
    return _UniqueCheck("_".join(cols) + "_unique", tuple(cols))


def expect_foreign_key(col: str, ref: DataFrame, ref_col: str) -> _ForeignKeyCheck:
    return _ForeignKeyCheck(f"{col}_fk", col, ref, ref_col)


def run_checks(df: DataFrame, checks: list) -> DataFrame:
    """Evaluate expectations; returns ``check`` (string), ``n_violations``
    (bigint), ``passed`` (boolean), ordered as declared via ``check_idx``."""
    row_checks = [c for c in checks if isinstance(c, _RowCheck)]
    reports: list[DataFrame] = []

    if row_checks:
        # ONE aggregate for every row-local check: count rows where the
        # expectation is not satisfied (null-safe: null ≠ true).
        agg = df.agg(
            *[
                F.count(F.when(~c.ok.eqNullSafe(F.lit(True)), F.lit(1))).alias(
                    c.name
                )
                for c in row_checks
            ]
        )
        stack = ", ".join(f"'{c.name}', {c.name}" for c in row_checks)
        reports.append(
            agg.selectExpr(
                f"stack({len(row_checks)}, {stack}) AS (check, n_violations)"
            )
        )

    for c in checks:
        if isinstance(c, _UniqueCheck):
            dupes = (
                df.groupBy(*c.cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .where(F.col("_n") > 1)
                # Violations = surplus rows beyond the one legitimate owner.
                .agg(
                    F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias(
                        "n_violations"
                    )
                )
            )
            reports.append(dupes.select(F.lit(c.name).alias("check"), "n_violations"))
        elif isinstance(c, _ForeignKeyCheck):
            orphans = (
                df.where(F.col(c.col).isNotNull())
                .join(
                    c.ref.select(F.col(c.ref_col).alias(c.col)).distinct(),
                    on=c.col,
                    how="left_anti",
                )
                .agg(F.count(F.lit(1)).alias("n_violations"))
            )
            reports.append(
                orphans.select(F.lit(c.name).alias("check"), "n_violations")
            )

    order = {  # declared order survives the union
        (c.name if hasattr(c, "name") else str(i)): i for i, c in enumerate(checks)
    }
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    idx = F.element_at(
        F.create_map(
            *[x for n, i in order.items() for x in (F.lit(n), F.lit(i))]
        ),
        F.col("check"),
    )
    return out.select(
        idx.cast("int").alias("check_idx"),
        "check",
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )
