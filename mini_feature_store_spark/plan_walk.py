"""Logical-plan introspection: audit every forced broadcast hint.

The broadcast-hint discipline (r5/r6 VERDICT #1): a hard ``F.broadcast()``
never degrades to shuffle — it OOMs when the hinted side outgrows executor
memory — so hard hints are allowed ONLY on relations whose row count is
bounded by a constant independent of data scale. This module walks the
ANALYZED logical plan (hints survive analysis verbatim) and classifies
each ``ResolvedHint(strategy=broadcast)`` subtree as provably bounded or
not, so a registry-wide test can assert the discipline instead of pinning
hand-enumerated per-query hint counts.

Provably bounded (auto-classified, conservative):

- a global aggregate (``Aggregate`` with zero grouping expressions — one
  output row), wherever it appears on the path to every leaf;
- ``GlobalLimit`` / ``LocalLimit`` — output capped by a literal;
- a scan of a constant-size dimension (``nation`` 25 rows / ``region``
  5 rows — fixed by the schema, not by SF);
- ``LocalRelation`` / ``OneRowRelation`` / ``Range`` — driver-side
  literal data with plan-time-known size;
- any node ALL of whose inputs are bounded, EXCEPT ``Generate``
  (explode multiplies rows by a data-dependent factor) and the
  Python/Arrow UDF family (``mapInPandas`` / ``applyInPandas`` /
  cogrouped / stateful variants — a UDF may emit any number of rows
  per input batch).

Anything else — full or filtered O(SF) dims, per-key aggregates,
dropped-id sets — is reported unbounded; the discipline test fails unless
the site carries an explicit, justified allowlist entry (e.g. a ≤64-types
``raise_error`` contract, a fixed-size eval benchmark, a calendar-bounded
date spine).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

#: parquet basenames of dimension tables whose size is fixed by the schema
BOUNDED_TABLES = frozenset({"nation", "region"})

#: leaf classes whose size is known at plan time
_LITERAL_LEAVES = frozenset({"LocalRelation", "OneRowRelation", "Range"})

#: nodes whose output row count is NOT bounded by their input's —
#: Python/Arrow UDF nodes may emit any number of rows per input batch
_ROW_EXPANDING = frozenset(
    {
        "MapInPandas",
        "PythonMapInArrow",
        "MapInArrow",
        "FlatMapGroupsInPandas",
        "FlatMapGroupsInArrow",
        "FlatMapCoGroupsInPandas",
        "FlatMapCoGroupsInArrow",
        "FlatMapGroupsInPandasWithState",
        "TransformWithStateInPandas",
        "MapGroups",
        "FlatMapGroupsWithState",
    }
)


@dataclass
class HintSite:
    """One ``ResolvedHint(strategy=broadcast)`` node in an analyzed plan."""

    bounded: bool
    reason: str
    subtree: str  # first lines of the hinted subtree, for error messages


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _relation_basename(node) -> str | None:
    try:
        paths = node.relation().location().rootPaths()
        if paths.size() != 1:
            return None
        name = str(paths.apply(0)).rstrip("/").rsplit("/", 1)[-1]
        return name.removesuffix(".parquet")
    except Exception:
        return None


def _bounded(node) -> tuple[bool, str]:
    """Is this subtree's output row count scale-independent?"""
    cls = node.getClass().getSimpleName()
    if cls == "Aggregate" and node.groupingExpressions().size() == 0:
        return True, "global aggregate (1 row)"
    if cls in ("GlobalLimit", "LocalLimit"):
        return True, "LIMIT-capped"
    if cls == "LogicalRelation":
        base = _relation_basename(node)
        if base in BOUNDED_TABLES:
            return True, f"constant-size dim ({base})"
        return False, f"scan of scale-dependent relation ({base})"
    if cls in _LITERAL_LEAVES:
        return True, f"literal leaf ({cls})"
    if cls in _ROW_EXPANDING:
        # Arrow-UDF nodes (mapInPandas / applyInPandas family) emit an
        # arbitrary number of rows per input batch — data-dependent
        # fan-out the walker cannot bound even over a LIMIT'd input.
        return False, f"{cls} — data-dependent fan-out"
    if cls == "Generate":
        # explode of a LITERAL collection (e.g. sequence(date'..',date'..')
        # — a date spine) has plan-time-known fan-out: the generator
        # expression references no attributes (no `#n` refs), so its size
        # cannot depend on the data.
        if "#" not in str(node.generator().toString()):
            kids = _children(node)
            ok, why = _bounded(kids[0]) if kids else (False, "no child")
            if ok:
                return True, "literal generator over bounded input"
            return False, why
        return False, "Generate (explode) — data-dependent fan-out"
    kids = _children(node)
    if not kids:
        return False, f"unknown leaf ({cls})"
    for k in kids:
        ok, why = _bounded(k)
        if not ok:
            return False, why
    return True, "all inputs bounded"


def broadcast_hint_sites(df: DataFrame) -> list[HintSite]:
    """All forced-broadcast hint sites in ``df``'s analyzed logical plan."""
    sites: list[HintSite] = []

    def walk(node):
        cls = node.getClass().getSimpleName()
        if cls == "ResolvedHint" and "broadcast" in str(
            node.hints().strategy()
        ):
            (child,) = _children(node)
            ok, why = _bounded(child)
            head = "\n".join(child.toString().splitlines()[:6])
            sites.append(HintSite(ok, why, head))
            # hints can nest (rare) — keep walking below
        for k in _children(node):
            walk(k)

    walk(df._jdf.queryExecution().analyzed())
    return sites
