"""Cross-engine lock for tools/parity_sweep.py's fingerprint encoder.

The at-scale parity sweep (docs/PARITY_10x.json) compares big outputs
via an engine-side canonical-row md5 fingerprint instead of collecting
millions of rows.  That check is only as good as the guarantee that
BOTH engines render the identical canonical string for every value —
so this suite runs ops whose outputs jointly cover every dtype the
registry emits (string, bigint, int, double incl. %.6f rendering, date,
and NULL cells from grouping-sets keys) and asserts, per op:

  1. the exact driver-parity compare passes (tests/oracle.compare), and
  2. the Spark fingerprint equals the DuckDB fingerprint,

i.e. whenever the exact bag compare says "equal", the fingerprint path
must agree — on real operator outputs, not synthetic data.  A full
429-op forced-fingerprint sweep (PARITY_CAP_ROWS=5 at sf0.001) was run
at round 8 with the same result; this keeps the five dtype-covering
representatives in the default suite.
"""

from __future__ import annotations

import pytest

from tests.oracle import compare
from tools.parity_sweep import duck_fingerprint, spark_fingerprint
from trip_data_pipeline_spark.registry import OPS, queries

# jointly cover: string / bigint / int / double / date outputs, NULL
# cells (grouping-sets keys), negative + fractional doubles
# (math_suite), and NULL doubles (join_left_outer's unmatched rows —
# the case that caught Java format_string rendering null as "null")
FP_OPS = [
    "agg_pricing_summary",
    "calendar_spine_join",
    "date_arith",
    "agg_grouping_sets",
    "math_suite",
    "join_left_outer",
]


@pytest.mark.parametrize("name", FP_OPS)
def test_fingerprint_agrees_with_exact_compare(spark, duck, sf_dir, name):
    queries()
    o = OPS[name]
    df = o.fn(spark, sf_dir)
    compare(df, duck, o.oracle)  # exact driver-parity bag compare
    assert spark_fingerprint(df) == duck_fingerprint(duck, o.oracle)


def test_fp_ops_cover_emitted_dtypes(spark, sf_dir):
    queries()
    seen = set()
    for name in FP_OPS:
        seen |= {t for _, t in OPS[name].fn(spark, sf_dir).dtypes}
    assert {"string", "bigint", "int", "double", "date"} <= seen


def test_fingerprint_detects_single_value_change(spark, duck, sf_dir):
    """Falsifiability: a one-value perturbation of the oracle must flip
    the fingerprint (guards against a degenerate encoder that hashes
    constants)."""
    queries()
    o = OPS["agg_pricing_summary"]
    base = duck_fingerprint(duck, o.oracle)
    body = o.oracle.rstrip().rstrip(";")
    perturbed = duck_fingerprint(
        duck,
        f"SELECT * REPLACE (count_order + 1 AS count_order) FROM ({body})",
    )
    assert base[0] == perturbed[0]  # same row count ...
    assert base[1:] != perturbed[1:]  # ... different value sums


def test_exact_sample_agrees_and_detects_divergence(spark, duck, sf_dir):
    """Round-10 stratified exact-sample mode (parity_sweep): on a real
    op output the sample check must pass against the true oracle and
    SAMPLE-FAIL against a rows-dropped perturbation — both engines
    must select the same content-addressed rows for either verdict to
    mean anything."""
    from tools.parity_sweep import exact_sample_check

    queries()
    o = OPS["date_arith"]
    df = o.fn(spark, sf_dir)
    n = df.count()
    ok = exact_sample_check(duck, df, o.oracle, n)
    assert ok["status"] == "SAMPLE-OK", ok
    assert ok["rows"] > 0
    body = o.oracle.rstrip().rstrip(";")
    first_col = df.columns[0]
    bad = exact_sample_check(
        duck, df,
        f"SELECT * FROM ({body}) "
        f"WHERE md5(CAST(\"{first_col}\" AS VARCHAR)) < 'f8'",
        n,
    )
    assert bad["status"] == "SAMPLE-FAIL", bad


def test_1000x_artifact_carries_declared_exclusions():
    """Regen-proof lock (VERDICT r11 item 1): the close-tree 1000x
    subset artifact must embed the builder-declared exclusions dict
    exactly as the EXCLUSIONS_1000X constant declares it — r11 commit
    7fdc927 regenerated the artifact whole and silently dropped the
    dict 145df19 had added, making a README claim false.  The sweep
    now merges the constant on every 1000x write; this asserts the
    artifact on disk actually carries it, and that every excluded name
    is a real registered op (a typo here would exclude nothing)."""
    import json
    import os

    from tools.parity_sweep import EXCLUSIONS_1000X

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "docs", "PARITY_1000x_subset.json")
    art = json.load(open(path))
    assert art.get("exclusions") == EXCLUSIONS_1000X
    queries()
    unknown = [n for n in EXCLUSIONS_1000X if n != "_note" and n not in OPS]
    assert not unknown, unknown
