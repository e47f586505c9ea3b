"""Batch sessionization (gaps-and-islands) — the batch form of
SURVEY.md §2.9's session windows, benched in BASELINE.md.

Same semantics as stream_session_window (30-min inactivity gap,
session = [first, last+gap)), expressed since round 10 through the
native batch session_window aggregation: one user-keyed shuffle, one
sort, one merging pass (MergingSessionsExec) — the same operator the
streaming twin runs, so batch and streaming semantics cannot drift.
At 100 TB this shuffles each user's events once and keeps per-user
state linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import bigint
from trip_data_pipeline_spark.registry import op


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
    """Sessionization via Spark's NATIVE batch session_window
    aggregation; result equals stream_session_window exactly — it is
    literally the same operator family (MergingSessionsExec), so the
    touching-sessions tie semantics (an event at exactly last_ts + gap
    EXTENDS the session — the round-9 stream-edge finding) hold by
    construction instead of by a hand-mirrored strict-> condition.

    Round-10 plan change (VERDICT r9 item 3a, measured): the previous
    shape was lag -> new-session flag -> running sum -> hash agg — two
    sequential WindowExec passes over one user-keyed sort, and its
    DuckDB ratio sat FLAT at 3.3-3.6x across 10x/100x/1000x while
    every other non-floor headline converged.  The native form is one
    shuffle + one sort + a single merging pass (groupBy user_id +
    session_window), reads (user_id, ts) instead of three columns, and
    A/B'd value-identical (exceptAll 0/0 at sf0.01 and 10x) at
    0.61 s vs 0.76 s (10x min-of-3); the 100x/1000x deltas are in
    docs/SCALE.md.  At 100 TB the win is structural: one ordered pass
    per user partition, no second window-function sweep, and the
    session merge is the same code path a streaming backfill uses.

    NULL event time excluded symmetrically with the streaming twin's
    source filter (round-9 stream-edge class): a NULL ts has no
    session semantics, and left in, the engines disagree on where it
    even SORTS before the arithmetic goes three-valued."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull()).select(
        "user_id", "ts"
    )
    sw = F.session_window(F.col("ts"), "30 minutes")
    return (
        ev.groupBy("user_id", sw.alias("sw"))
        .agg(bigint(F.count(F.lit(1))).alias("n_events"))
        .select(
            "user_id",
            bigint(F.unix_micros("sw.start")).alias("sess_start_us"),
            bigint(
                F.unix_micros("sw.end") - F.unix_micros("sw.start")
            ).alias("dur_us"),
            "n_events",
        )
    )
