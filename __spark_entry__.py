"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``trip_data_pipeline_spark`` (SURVEY.md §2 is
the operator inventory; the registry maps each §2 row name to its
query fn + oracle SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trip_data_pipeline_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (agg_pricing_summary, SURVEY.md §2.4) on sf0.001."""
    from trip_data_pipeline_spark.operators.aggregates import agg_pricing_summary

    return agg_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each hash-checked query; rows-only
    operators (streaming state, sketches, sinks, MinHash) are omitted."""
    return registry.oracle_sql()
