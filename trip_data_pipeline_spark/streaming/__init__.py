"""Structured Streaming harness (SURVEY.md §2.9, §3.2 entry point 3).

Determinism rules (SURVEY.md §7 hard-part 6): always
``Trigger.AvailableNow`` (drain the static fixture and stop — never
processing-time triggers), unique in-memory sink names per run, and
event-time math on integer microseconds.

At scale the same queries run unchanged against a real source (Kafka,
files-on-arrival): AvailableNow is exactly the production backfill
trigger, watermarks bound state store size, and the session/window
aggregations shuffle by (key, window) — state is per-key-and-window,
not global.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from trip_data_pipeline_spark.io import EVENTS_NTZ_SCHEMA, ns_to_ts


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a bounded stream (NTZ->µs ts conversion as in
    batch io.load)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = (
        spark.readStream.format("parquet")
        .schema(EVENTS_NTZ_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return ns_to_ts(raw)


def run_to_memory(
    stream_df: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into an
    in-memory table; return the materialized batch DataFrame."""
    spark = stream_df.sparkSession
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
