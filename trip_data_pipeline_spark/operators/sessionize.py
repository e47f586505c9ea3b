"""Batch sessionization (gaps-and-islands) — the batch form of
SURVEY.md §2.9's session windows, benched in BASELINE.md.

Same semantics as stream_session_window (30-min inactivity gap,
session = [first, last+gap)), expressed as lag -> new-session flag ->
running sum -> group.  Two window passes + one agg, all partitioned by
user_id: at 100 TB this shuffles each user's events once and keeps
per-user state linear — the standard batch sessionization plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import bigint
from trip_data_pipeline_spark.registry import op

GAP_US = 1800 * 1_000_000


@op(
    "sessionize_batch",
    oracle="""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events
           WHERE ts IS NOT NULL),
     g AS (SELECT user_id, us, event_id,
                  CASE WHEN lag(us) OVER w IS NULL
                        OR us - lag(us) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS new_s
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
     s AS (SELECT user_id, us,
                  sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
           FROM g)
SELECT user_id,
       CAST(min(us) AS BIGINT)                        AS sess_start_us,
       CAST(max(us) - min(us) + 1800000000 AS BIGINT) AS dur_us,
       CAST(count(*) AS BIGINT)                       AS n_events
FROM s GROUP BY user_id, sid
""",
    category="2.9 streaming (batch form)",
    pure=True,
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization; result equals
    stream_session_window exactly (same oracle SQL).

    Tie semantics (round-9 stream-edge fixture): Spark's native
    session_window MERGES touching sessions — an event at exactly
    last_ts + gap extends the session — so the break condition is
    gap STRICTLY GREATER than 30 min in both this op and its oracle;
    the >= form diverged from the streaming twin on exact ties."""
    # NULL event time excluded symmetrically with the streaming twin's
    # source filter (round-9 stream-edge class): a NULL ts has no
    # session semantics, and left in, the engines disagree on where
    # it even SORTS (Spark NULLS FIRST vs DuckDB NULLS LAST in the
    # lag window) before the arithmetic goes three-valued.
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull()).select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev = F.lag("us").over(w)
    new_s = F.when(prev.isNull() | (F.col("us") - prev > GAP_US), 1).otherwise(0)
    return (
        ev.withColumn("sid", F.sum(new_s).over(run))
        .groupBy("user_id", "sid")
        .agg(
            bigint(F.min("us")).alias("sess_start_us"),
            bigint(F.max("us") - F.min("us") + GAP_US).alias("dur_us"),
            bigint(F.count(F.lit(1))).alias("n_events"),
        )
        .drop("sid")
    )
