"""Operator registry (SURVEY.md §2 — the binding contract).

Every §2 operator registers itself here via the ``@op`` decorator; the
driver-facing ``__spark_entry__.py`` re-exports ``queries()`` and
``oracle_sql()`` from this module.

An operator = (name, query fn, optional DuckDB oracle SQL).  Operators
whose semantics are not SQL-expressible (streaming state, MinHash LSH,
side-effecting sinks, approx sketches) register ``oracle=None`` and get
the driver's weaker rows-only check plus our own property tests
(SURVEY.md §5.2 layer 3).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB 1.0, or None -> rows-only
    category: str  # SURVEY.md §2 subsection, e.g. "2.4 aggregation"


OPS: dict[str, Op] = {}


def op(name: str, oracle: str | None, category: str) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in OPS:
            raise ValueError(f"duplicate operator name: {name}")
        OPS[name] = Op(name=name, fn=fn, oracle=oracle, category=category)
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import for side effect: each module registers its operators.
    from trip_data_pipeline_spark import operators  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: o.fn for name, o in OPS.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: o.oracle for name, o in OPS.items() if o.oracle is not None}
