"""Regression tests for the events nanos-parquet read (VERDICT r1 #1/#2).

The events.parquet physical type is TIMESTAMP(NANOS).  PySpark 4.1.2
surfaces it as TIMESTAMP_NTZ and silently ignores a runtime
``spark.sql.legacy.parquet.nanosAsLong`` — round 1 assumed LongType and
crashed 59 operators.  These tests pin the contract:

1. ``ns_to_ts`` handles all three dtypes it can meet (long ns-epoch,
   timestamp_ntz, timestamp) and produces identical µs values.
2. ``load()`` works in a truly VANILLA zero-config SparkSession (fresh
   JVM via subprocess — ``getOrCreate`` inside the test JVM would reuse
   the configured test session and prove nothing).
3. The µs values match DuckDB ``epoch_us`` exactly (oracle parity).
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

from pyspark.sql import functions as F
from pyspark.sql import types as T

from trip_data_pipeline_spark.io import load, ns_to_ts


def test_ns_to_ts_three_dtypes_agree(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    base = ev.select("event_id", F.unix_micros("ts").alias("us")).limit(200)
    rows = {r.event_id: r.us for r in base.collect()}
    assert rows, "fixture events table must not be empty"

    # Rebuild the same column as long-ns and as NTZ, run each through
    # ns_to_ts, and require identical µs values.
    as_long = ev.select(
        "event_id", (F.unix_micros("ts") * 1000).alias("ts")
    )
    out_long = {
        r.event_id: r.us
        for r in ns_to_ts(as_long)
        .select("event_id", F.unix_micros("ts").alias("us"))
        .limit(200)
        .collect()
    }
    as_ntz = ev.select(
        "event_id", F.col("ts").cast(T.TimestampNTZType()).alias("ts")
    )
    out_ntz = {
        r.event_id: r.us
        for r in ns_to_ts(as_ntz)
        .select("event_id", F.unix_micros("ts").alias("us"))
        .limit(200)
        .collect()
    }
    for eid, us in rows.items():
        assert out_long[eid] == us
        assert out_ntz[eid] == us

    # Already-TimestampType input is a no-op.
    assert ns_to_ts(ev) is ev


def test_events_us_matches_duckdb(spark, sf_dir, duck):
    ev = load(spark, sf_dir, "events")
    got = {
        r.event_id: r.us
        for r in ev.select("event_id", F.unix_micros("ts").alias("us"))
        .orderBy("event_id")
        .limit(100)
        .collect()
    }
    want = dict(
        duck.execute(
            "SELECT event_id, epoch_us(ts) FROM events ORDER BY event_id LIMIT 100"
        ).fetchall()
    )
    assert got == want


def test_vanilla_session_loads_events(sf_dir):
    """Drive-by in a FRESH zero-config JVM, exactly like the driver."""
    code = textwrap.dedent(
        f"""
        from pyspark.sql import SparkSession
        from pyspark.sql import types as T
        spark = SparkSession.builder.getOrCreate()
        from trip_data_pipeline_spark.io import load
        ev = load(spark, {str(sf_dir)!r}, "events")
        assert isinstance(ev.schema["ts"].dataType, T.TimestampType), ev.schema
        n = ev.count()
        assert n > 0, n
        print("VANILLA_OK", n)
        spark.stop()
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "VANILLA_OK" in proc.stdout
