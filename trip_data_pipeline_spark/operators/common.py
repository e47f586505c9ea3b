"""Shared parity-safe column helpers (SURVEY.md §5.3 rules).

The Spark<->DuckDB hash check compares exact values, so every derived
double is rounded (2 dp money / 4 dp similarity) and every timestamp is
projected as a DATE or integer epoch — never raw.  ``events.ts`` is
µs-identical in both engines (measured, FIXTURES.md gotcha 1 resolved),
so integer µs/second math below is exact parity.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCRATCH_DIRS: list[str] = []


def _cleanup_scratch() -> None:
    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)


atexit.register(_cleanup_scratch)


def scratch_dir(prefix: str) -> str:
    """mkdtemp with process-exit cleanup (ADVICE r3: sink/scan ops were
    leaking a materialized table copy into /tmp per verify sweep).  The
    dir must outlive the op's RETURNED DataFrame — Spark re-reads it
    lazily on every action — so cleanup is atexit, not per-call."""
    d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(d)
    return d


def r2(c: Column) -> Column:
    """Round a money/metric double to 2 dp (SURVEY.md §5.3 rule 1)."""
    return F.round(c, 2)


def r4(c: Column) -> Column:
    """Round a similarity/unit-scale double to 4 dp."""
    return F.round(c, 4)


def nz(c: Column) -> Column:
    """Normalize negative zero: a rounded near-zero value computed by
    two independent pipelines can land on +0.0 in one engine and -0.0
    in the other (sum-order noise crossing zero) — map both to +0.0.
    Oracle-side mirror: ``CASE WHEN x = 0 THEN CAST(0.0 AS DOUBLE) ELSE x END``.
    """
    return F.when(c == 0, F.lit(0.0)).otherwise(c)


def duck_nz(expr: str) -> str:
    return f"CASE WHEN {expr} = 0 THEN CAST(0.0 AS DOUBLE) ELSE {expr} END"


def bigint(c: Column) -> Column:
    """Cast to BIGINT so Spark counts/ranks match DuckDB's BIGINT
    (SURVEY.md §5.3 rule 3)."""
    return c.cast("bigint")


def as_date(c: Column) -> Column:
    """Project an ms-precision, date-valued timestamp as DATE
    (SURVEY.md §5.3 rule 2)."""
    return F.to_date(c)


def epoch_s(col: str) -> Column:
    """Whole-second epoch of timestamp column `col` as BIGINT.

    DuckDB equivalent: ``epoch_us(ts) // 1000000``.  Both engines see the
    same µs instant, and both floor-divide, so this is exact.
    """
    return F.expr(f"(unix_micros({col}) div 1000000)")


# DuckDB-side rendering of the same expression, for oracle SQL strings.
def duck_epoch_s(col: str) -> str:
    return f"(epoch_us({col}) // 1000000)"


def spread(df, min_fraction: float = 1.0):
    """Round-robin repartition to the session's default parallelism —
    ONLY when the input is under-partitioned.

    Parquet scans are partitioned by BYTES (maxPartitionBytes), but a
    corpus table is byte-small and CPU-heavy — per-document/-vector
    higher-order-function work — and the fixtures are single-row-group
    files, so the scan yields ONE task and pins the whole pass to one
    core no matter how many are available.  CPU-bound narrow
    transforms must scale with cores, not input bytes: locally the
    rebalance unlocks all cores (measured: 8-20x on the corpus ops).

    At cluster scale the scan already has thousands of splits, so an
    unconditional repartition would (a) pointlessly shuffle raw
    document text and (b) *down*-partition to defaultParallelism.
    Hence the guard: if the plan already has >= defaultParallelism
    partitions, return the input untouched — no extra Exchange
    (plan-locked in tests/test_plans.py::test_spread_no_shuffle_when_wide).

    min_fraction tunes the guard per op (round-4 measurement on the
    16-file 10x layout, 32 cores): for LIGHT per-row work (split +
    count: term_freq, exact-hash dedup, tf-idf) the 16->32 text
    shuffle costs more than the idle cores — relaxed guard
    (min_fraction=0.25: skip at >= 8 partitions) is 35-45% faster
    (term_freq 0.64->0.36 s, dedup_exact 0.46->0.29 s).  For HEAVY
    per-row work (64-perm MinHash HOF folds) the opposite holds:
    dedup_near_minhash is 33% SLOWER at 16 tasks (42->56 s), so
    compute-bound ops keep the strict default (always reach full
    parallelism)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, int(target * min_fraction)):
        return df
    return df.repartition(target)
