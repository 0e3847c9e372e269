"""Registry-wide lints over the query/oracle contract.

The correctness driver canonicalizes each result through pandas
``sort_values`` before hashing, which raises ``TypeError: unhashable
type`` on list/dict cells. Round 4 shipped an oracled query
(``embedding_int8_quant``) with an ``array<int>`` column that was green
under the local gate replica (it tuple-ized lists) but failed at the
driver — a gate-replica divergence. This lint makes that class of bug
impossible to reintroduce: every ORACLED query's output schema must be
scalar-only. Rows-only queries may still return arrays/maps (the driver
only counts their rows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from mini_feature_store_spark.queries import ORACLE, QUERIES, VERIFY_ORDER

SF_DIR = "/root/testdata/sf0.001"

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def test_verify_order_is_a_permutation():
    assert set(VERIFY_ORDER) == set(QUERIES)
    assert len(VERIFY_ORDER) == len(set(VERIFY_ORDER))


def test_every_oracle_has_a_query():
    assert set(ORACLE) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracled_output_is_scalar_only(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, _COMPLEX)
    ]
    assert not bad, (
        f"oracled query {name!r} returns non-scalar column(s) {bad}; the "
        f"driver's pandas canonicalizer cannot hash these — serialize "
        f"them (F.array_join / array_to_string / md5) in BOTH the Spark "
        f"query and the oracle SQL"
    )
