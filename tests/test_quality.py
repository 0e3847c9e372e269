"""Data-quality audit tests: violation counting semantics per check type."""

from __future__ import annotations

from mini_feature_store_spark.operators.quality import (
    expect_between,
    expect_foreign_key,
    expect_in_set,
    expect_not_null,
    expect_rlike,
    expect_unique,
    run_checks,
)


def _report(df, checks):
    return {r.check: r for r in run_checks(df, checks).collect()}


def test_row_checks_single_pass(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "A"), (2, -1.0, "B"), (None, 50.0, "Z"), (4, None, "A")],
        "k int, v double, s string",
    )
    out = _report(
        df,
        [
            expect_not_null("k"),
            expect_between("v", 0, 10),
            expect_in_set("s", ["A", "B"]),
        ],
    )
    assert out["k_not_null"].n_violations == 1
    # -1 out of range, 50 out of range, null v un-evaluable → 3 violations
    assert out["v_between"].n_violations == 3
    assert out["s_in_set"].n_violations == 1
    assert not out["v_between"].passed


def test_unique_counts_surplus_rows(spark):
    df = spark.createDataFrame([(1,), (1,), (1,), (2,)], "k int")
    out = _report(df, [expect_unique("k")])
    # three rows share k=1 → 2 surplus rows beyond the legitimate one
    assert out["k_unique"].n_violations == 2
    clean = spark.createDataFrame([(1,), (2,)], "k int")
    assert _report(clean, [expect_unique("k")])["k_unique"].passed


def test_foreign_key_orphans(spark):
    ref = spark.createDataFrame([(1,), (2,)], "rk int")
    df = spark.createDataFrame([(1,), (3,), (None,)], "fk int")
    out = _report(df, [expect_foreign_key("fk", ref, "rk")])
    # 3 is an orphan; null FK is NOT an orphan (use expect_not_null for that)
    assert out["fk_fk"].n_violations == 1


def test_rlike_and_declared_order(spark):
    df = spark.createDataFrame([("a1",), ("b!",)], "s string")
    rep = run_checks(
        df, [expect_rlike("s", "^[a-z][0-9]$"), expect_not_null("s")]
    ).orderBy("check_idx").collect()
    assert [r.check for r in rep] == ["s_matches", "s_not_null"]
    assert rep[0].n_violations == 1 and rep[1].n_violations == 0
