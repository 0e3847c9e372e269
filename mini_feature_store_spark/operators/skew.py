"""Skew mitigation: salted joins for hot keys (100 TB survival kit).

When one join key carries a disproportionate share of rows (celebrity
users, null-ish defaults, hot SKUs), the shuffle partition owning that key
becomes the straggler that defines job wall-clock. AQE's skew-join split
(`spark.sql.adaptive.skewJoin.enabled`) handles the common sort-merge case;
salting is the explicit, planner-independent fix that also composes with
broadcast-ineligible shapes and stream-stream joins.

Mechanics of ``salted_join(big, small, on, salt)``:

- every BIG-side row gets a uniform pseudo-random salt in [0, salt);
- the SMALL side is replicated ``salt`` times (explode of a sequence — a
  narrow, shuffle-free expansion of the smaller input);
- the join key becomes (key..., salt), splitting each hot key's rows across
  ``salt`` shuffle partitions.

Results are identical to the unsalted join for inner/left/semi/anti joins
(each big row sees exactly one full copy of the small side, namely its
salt's copy); right/full-outer would multiply unmatched small rows and are
rejected. Aggregation skew, by contrast, needs no salting in Spark: hash
aggregation is already two-phase (map-side partial + final), so a hot group
is pre-combined before it crosses the wire.

No reference analog (the reference leaves physical concerns to Catalyst);
this is north-star scale work.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT_COL = "__salt"

#: Join types whose semantics survive small-side replication.
_SAFE_HOWS = {"inner", "left", "leftouter", "left_outer", "left_semi",
              "leftsemi", "semi", "left_anti", "leftanti", "anti"}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Join ``big`` to ``small`` on equi-keys ``on`` with salted shuffle keys.

    ``salt`` bounds the worst key's partition share at ~1/salt of its rows;
    the cost is a ``salt``× replication of the small side (keep it
    dimension-sized — if both sides are huge AND skewed, range-partition on
    a composite key instead).
    """
    how_norm = how.replace("_", "").lower()
    if how_norm not in {h.replace("_", "") for h in _SAFE_HOWS}:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti, not {how!r}: "
            "replicating the small side would duplicate unmatched rows "
            "under right/full outer semantics"
        )
    on = list(on)
    big_salted = big.withColumn(
        _SALT_COL, F.floor(F.rand(seed) * salt).cast("int")
    )
    small_replicated = small.withColumn(
        _SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_salted.join(small_replicated, [*on, _SALT_COL], how)
    return out.drop(_SALT_COL)
