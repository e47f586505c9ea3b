"""Locks for the round-7 ppm-overflow audit.

``1000000 * <bigint magnitude>`` overflows int64 once the magnitude
passes ~9.2e12 — reachable at 100 TB for cumulative revenue cents
(agg_pareto_coverage, found by the 10x profile sweep: ANSI mode
raised ARITHMETIC_OVERFLOW), per-class revenue
(orders_abc_classification, parts_single_source_risk), corpus-wide
term counts (freq_heavy_hitters_exact, text_term_burstiness), and per-user
microsecond sums (geo_fleet_utilization).  Those six ops now widen
through DECIMAL(38,0) before the multiply.  sf-fixture runs can never
reach the overflow region, so these tests drive the widened
expression shape directly with near-int64-max values and pin (a) no
overflow error and (b) exact floor-division values; a third test
pins value parity with the old narrow expression in the safe region.
"""

from __future__ import annotations

import pytest

MAX64 = (1 << 63) - 1

WIDE = "CAST((CAST(1000000 AS DECIMAL(38,0)) * num) div den AS BIGINT)"
NARROW = "1000000 * num div den"


def test_widened_ppm_survives_near_max_int64(spark):
    # cum ~ total ~ 9e18: the old narrow form overflows immediately;
    # the widened form must return exactly floor(1e6 * num / den).
    rows = [
        (MAX64 - 1, MAX64),          # share just under 1.0
        (MAX64 // 2, MAX64),         # ~0.5
        (9_200_000_000_000, MAX64),  # the ~9.2e12 threshold magnitude
        (1, MAX64),                  # tiny share of a huge total
    ]
    df = spark.createDataFrame(rows, "num bigint, den bigint")
    got = {
        (r["num"]): r["ppm"]
        for r in df.selectExpr("num", f"{WIDE} AS ppm").collect()
    }
    for num, den in rows:
        assert got[num] == (1_000_000 * num) // den, (num, den)


def test_narrow_ppm_really_overflows(spark):
    # Guard the guard: if Spark ever stops raising here (ANSI off or
    # silent wraparound), the widening rationale needs re-auditing.
    df = spark.createDataFrame([(MAX64 - 1, MAX64)], "num bigint, den bigint")
    try:
        [r] = df.selectExpr(f"{NARROW} AS ppm").collect()
    except Exception:
        return  # ANSI mode: overflow raises — the failure the audit found
    # non-ANSI builds wrap around instead of raising; either way the
    # narrow form is wrong in this region
    assert r["ppm"] != (1_000_000 * (MAX64 - 1)) // MAX64


def test_widened_matches_narrow_in_safe_region(spark):
    rows = [(0, 7), (1, 3), (999, 1000), (123_456_789, 987_654_321)]
    df = spark.createDataFrame(rows, "num bigint, den bigint")
    out = df.selectExpr(
        f"{WIDE} AS wide", f"{NARROW} AS narrow"
    ).collect()
    for r in out:
        assert r["wide"] == r["narrow"]
