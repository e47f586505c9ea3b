"""Layer-2 oracle parity tests (SURVEY.md §5.2): every registered
operator with an oracle is hash-compared against DuckDB on sf0.01 —
a local replica of the driver's t2 gate.  Oracle-less (rows-only)
operators are smoke-run and must return a non-None DataFrame with a
stable schema; their semantic checks live in test_properties.py."""

from __future__ import annotations

import pytest

from trip_data_pipeline_spark.registry import OPS, queries  # noqa: F401
from tests.oracle import compare

queries()  # force registration


def _names():
    return sorted(OPS)


@pytest.mark.parametrize("name", _names())
def test_operator(name, spark, duck, sf_dir):
    o = OPS[name]
    df = o.fn(spark, sf_dir)
    assert df is not None
    if o.oracle is None:
        n = df.count()
        assert n >= 0
        assert len(df.columns) > 0
    else:
        compare(df, duck, o.oracle)
