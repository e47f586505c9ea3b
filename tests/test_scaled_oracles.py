"""Value-equivalence lock for the parity sweep's scale-tractable
oracle overrides (tools/parity_sweep.py SCALED_ORACLES).

The at-scale value gate (docs/PARITY_10x.json) substitutes a scalable
DuckDB evaluation for two registry oracles whose original strategies
are super-linear (the connected-components recursive-CTE closure and
the minhash truth arm's candidate-DISTINCT + per-pair list_intersect).
The substitution is only sound if the override computes the SAME
value, so this test runs BOTH forms on the driver fixture (sf0.01,
where the originals are tractable) and asserts exact bag equality.
With this lock green, a 10x HASH-OK against the scaled oracle chains
to the original independent oracle through a machine-checked equality
rather than an argument.
"""

from __future__ import annotations

import os

import pytest

from tests.oracle import canon_rows, duck_connect, duck_result
from tools.parity_sweep import SCALED_ORACLES
from trip_data_pipeline_spark.registry import OPS, queries

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.mark.parametrize("name", sorted(SCALED_ORACLES))
def test_scaled_oracle_matches_registry_oracle(name):
    queries()  # load the registry
    original = OPS[name].oracle
    assert original is not None, f"{name} has no registry oracle to lock against"
    con = duck_connect(SF_DIR)
    try:
        scaled_sql = SCALED_ORACLES[name](con)
        o_cols, o_rows = duck_result(con, original)
        s_cols, s_rows = duck_result(con, scaled_sql)
        assert sorted(o_cols) == sorted(s_cols)
        assert canon_rows(o_cols, o_rows) == canon_rows(s_cols, s_rows)
    finally:
        con.close()
