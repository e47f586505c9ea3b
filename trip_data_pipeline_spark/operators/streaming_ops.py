"""§2.9 Streaming operators (SURVEY.md §2.9) over the events stream.

Each operator runs a genuine Structured Streaming query (incremental
planning, state store, watermarks) drained with AvailableNow, then
returns the materialized result as a batch DataFrame — so the driver's
(spark, sf_dir) -> DataFrame contract holds.  Batch-SQL oracles exist
where the final answer is a pure function of event time (§2.9 note);
watermark-drop / stateful / sink ops are rows-only with golden &
property tests in tests/test_streaming.py.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import RAW_EVENTS_SCHEMA, load, ns_to_ts
from trip_data_pipeline_spark.operators.common import bigint, r2, scratch_dir
from trip_data_pipeline_spark.registry import op
from trip_data_pipeline_spark.streaming import read_events_stream, run_to_memory

CAT = "2.9 streaming"


@op(
    "stream_tumbling_count",
    oracle="""
WITH e AS (SELECT epoch_us(date_trunc('hour', ts)) // 1000000 AS hour_s,
                  event_type, value
           FROM events WHERE ts IS NOT NULL)
SELECT CAST(hour_s AS BIGINT)  AS win_start_s,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2)     AS total_value
FROM e GROUP BY hour_s, event_type
""",
    category=CAT,
)
def stream_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows per event_type — SURVEY.md
    §2.9 row 1.  Watermark bounds state; with a static file fully
    drained, the final counts equal the batch hour-truncation oracle."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            bigint(F.count(F.lit(1))).alias("n"),
            r2(F.sum("value")).alias("total_value"),
        )
    )
    res = run_to_memory(agg, "complete", final_no_data_batch=False)
    return res.select(
        F.expr("(unix_micros(window.start) div 1000000)").alias("win_start_s"),
        "event_type",
        "n",
        "total_value",
    )


@op(
    "stream_sliding_sum",
    oracle="""
WITH e AS (SELECT (epoch_us(ts) // 1000000) AS s, value FROM events
           WHERE ts IS NOT NULL),
     b AS (SELECT s - s % 900 AS b15, value FROM e),
     w AS (SELECT b15 - off AS win_start_s, value
           FROM b CROSS JOIN (VALUES (0), (900), (1800), (2700)) t(off))
SELECT CAST(win_start_s AS BIGINT) AS win_start_s,
       CAST(count(*) AS BIGINT)    AS n,
       round(sum(value), 2)        AS total_value
FROM w GROUP BY win_start_s
""",
    category=CAT,
)
def stream_sliding_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 min — SURVEY.md §2.9 row 2.
    Oracle self-expands each event into its 4 covering window starts
    (epoch-aligned, matching Spark's window alignment)."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(
            bigint(F.count(F.lit(1))).alias("n"),
            r2(F.sum("value")).alias("total_value"),
        )
    )
    res = run_to_memory(agg, "complete", final_no_data_batch=False)
    return res.select(
        F.expr("(unix_micros(window.start) div 1000000)").alias("win_start_s"),
        "n",
        "total_value",
    )


@op(
    "stream_session_window",
    oracle="""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events
           WHERE ts IS NOT NULL),
     g AS (SELECT user_id, us,
                  CASE WHEN lag(us) OVER w IS NULL
                        OR us - lag(us) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS new_s
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
     s AS (SELECT user_id, us,
                  sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                                   ROWS UNBOUNDED PRECEDING) AS sid
           FROM g)
SELECT user_id,
       CAST(min(us) AS BIGINT)                          AS sess_start_us,
       CAST(max(us) - min(us) + 1800000000 AS BIGINT)   AS dur_us,
       CAST(count(*) AS BIGINT)                         AS n_events
FROM s GROUP BY user_id, sid
""",
    category=CAT,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows, 30-min inactivity gap — SURVEY.md
    §2.9 row 3 (also the trip 'sessionization' op).

    Oracle is the gaps-and-islands formulation on exact integer µs:
    a session window is [first, last+gap), and Spark MERGES touching
    sessions (an event at exactly last_ts + gap extends the session —
    measured on the round-9 stream-edge tie fixture), so a new
    session starts only when the gap is STRICTLY > 30 min."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(bigint(F.count(F.lit(1))).alias("n_events"))
    )
    res = run_to_memory(agg, "complete", final_no_data_batch=False)
    return res.select(
        "user_id",
        F.expr("unix_micros(session_window.start)").alias("sess_start_us"),
        F.expr("unix_micros(session_window.end) - unix_micros(session_window.start)").alias(
            "dur_us"
        ),
        "n_events",
    )


def _late_batches_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build a temp dir with three parquet files whose modification
    order forces three micro-batches:

    - batch 0: on-time data (advances the watermark for batch 1),
    - batch 1: empty (runs state eviction with the advanced watermark,
      so the on-time windows are emitted and CLOSED — the watermark
      used for eviction is the start-of-batch one, so a batch boundary
      is needed between "data seen" and "windows closed"),
    - batch 2: a late tail (rows re-sent from the earliest days, far
      behind the watermark -> dropped by the state operator; verified
      via numRowsDroppedByWatermark in tests).
    """
    out = scratch_dir(prefix="stream_late_")
    ev = load(spark, sf_dir, "events")
    as_raw = lambda df: df.select(  # noqa: E731 — ts back to long ns
        "event_id",
        F.expr("unix_micros(ts) * 1000").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    on_time = as_raw(ev.filter(F.col("ts") < "2024-01-20 00:00:00"))
    empty = as_raw(ev).limit(0)
    late = as_raw(
        ev.filter(F.col("ts") < "2024-01-03 00:00:00").withColumn(
            "event_id", F.col("event_id") + 10_000_000
        )
    )
    # Round-12 note (guide §1.2, measured): consolidating the three
    # coalesce(1) write jobs into one partitionBy(b) write was
    # prototyped and benched NEUTRAL — the repartition(1, b) shuffle
    # of the union costs what the saved job commit saves — so the
    # straightforward three-write form stays.
    for i, df in enumerate([on_time, empty, late]):
        tmp = os.path.join(out, f"_tmp{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = os.path.join(out, f"batch{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1700000000 + i * 3600, 1700000000 + i * 3600))
    return out


# raw schema for the two-batch dir: ts written back as long ns
_LATE_SCHEMA = RAW_EVENTS_SCHEMA


@op(
    "stream_watermark_late",
    oracle="""
WITH ot AS (SELECT ts FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'),
wm AS (SELECT max(epoch_us(ts)) - 600000000 AS w FROM ot)
SELECT (epoch_us(ts) // 3600000000) * 3600 AS win_start_s,
       CAST(count(*) AS BIGINT) AS n
FROM ot, wm
GROUP BY 1
HAVING (((epoch_us(min(ts)) // 3600000000) + 1) * 3600000000) <= max(wm.w)
""",
    category=CAT,
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics: 10-min watermark, append mode, late tail in
    a second micro-batch — SURVEY.md §2.9 row 4 (the golden property
    'late rows change nothing' is asserted in tests/test_streaming.py).

    Hash-checked since round 3: the emitted set is exactly the hourly
    counts of ON-TIME rows for windows finalized by the watermark
    (window_end <= max(on-time ts) - 10min) — the late batch-2 rows
    are all days behind the watermark and must not contribute a single
    count, so a watermark-semantics regression (late rows leaking in,
    or unfinalized windows emitted) breaks the hash.

    After batch 0 the watermark is max(ts)-10min; the empty batch 1
    closes the on-time windows, and every batch-2 row is days older
    than the watermark, so the state operator drops them and the
    emitted (finalized) windows equal an on-time-only run."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = _late_batches_dir(spark, sf_dir)
    raw = (
        spark.readStream.format("parquet")
        .schema(_LATE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    ev = ns_to_ts(raw)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(bigint(F.count(F.lit(1))).alias("n"))
    )
    # final_no_data_batch=False is sound for THIS append-mode agg
    # because the last data batch cannot finalize anything new: the
    # late batch-2 rows sit days behind the watermark, so the eviction
    # watermark after batch 2 equals the one batch 1 already emitted
    # with — the trailing no-data batch re-evicts with an identical
    # watermark and emits zero rows (hash-locked vs the finalized-
    # window oracle; the general append-mode rule stays documented in
    # run_to_memory — stream_two_level_window keeps the default).
    res = run_to_memory(agg, "append", final_no_data_batch=False)
    return res.select(
        F.expr("(unix_micros(window.start) div 1000000)").alias("win_start_s"), "n"
    )


@op(
    "stream_dedup_watermark",
    oracle="""
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events WHERE ts IS NOT NULL GROUP BY 1
""",
    category=CAT,
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on (user_id, event_type) within the
    watermark — SURVEY.md §2.9 row 5.

    Hash-checked since round 3: the fixture drains as ONE AvailableNow
    micro-batch (single file source), so no dedup state can expire
    mid-stream and the emitted key set must equal batch DISTINCT —
    which is what the oracle aggregates."""
    ev = read_events_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    res = run_to_memory(deduped, "append", final_no_data_batch=False)
    return (
        res.groupBy("event_type")
        .agg(bigint(F.count(F.lit(1))).alias("n_users"))
    )


@op(
    "stream_stateful_runstate",
    oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events WHERE ts IS NOT NULL GROUP BY 1
""",
    category=CAT,
)
def stream_stateful_runstate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful op via applyInPandasWithState: running
    per-user event count + value total — SURVEY.md §2.9 row 6.
    State = (count, total) per user_id, updated per micro-batch.

    Hash-checked since round 3: the fixture drains as one AvailableNow
    batch, so each user emits exactly one update equal to the per-user
    batch aggregate — the oracle computes it directly."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_user(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 2)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    ev = read_events_stream(spark, sf_dir).select("user_id", "ts", "value")
    stateful = (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_user,
            outputStructType="user_id bigint, n_events bigint, total_value double",
            stateStructType="n bigint, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_memory(stateful, "update", final_no_data_batch=False)


@op(
    "stream_foreachbatch_sink",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS total_value
FROM events WHERE ts IS NOT NULL GROUP BY 1
""",
    category=CAT,
)
def stream_foreachbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch micro-batch sink writing parquet, then re-read —
    SURVEY.md §2.9 row 7.  foreachBatch is the exactly-once escape
    hatch for sinks without native streaming support.

    Hash-checked since round 3: exactly-once across however many
    micro-batches means the sink accumulates every event exactly once,
    so the aggregate over the re-read sink must equal the same
    aggregate on the source table — a doubled or dropped batch breaks
    the hash (the streaming sibling of the sink_*_roundtrip checks)."""
    out = scratch_dir(prefix="febatch_") + "/out"

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("epoch", F.lit(epoch_id))
            .write.mode("append")
            .parquet(out)
        )

    ev = read_events_stream(spark, sf_dir).select("event_id", "event_type", "value")
    q = (
        ev.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", scratch_dir(prefix="febatch_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(
        bigint(F.count(F.lit(1))).alias("n"),
        r2(F.sum("value")).alias("total_value"),
    )


@op(
    "stream_stream_join",
    oracle="""
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
           FROM events WHERE ts IS NOT NULL)
SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
       CAST((p.us // 1000000) - (v.us // 1000000) AS BIGINT) AS lag_s
FROM e p JOIN e v
  ON p.user_id = v.user_id
 AND p.event_type = 'purchase' AND v.event_type = 'view'
 AND v.us < p.us AND v.us >= p.us - 3600000000
""",
    category=CAT,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time range condition:
    purchases joined to the views that preceded them within 1 hour
    (attribution join).  Both sides carry watermarks; the range
    condition bounds the join state.  With the fixture fully drained
    the final append result equals the batch theta join — hash-checked
    against that oracle.

    Round-8 at-scale parity fix: the oracle originally truncated ts to
    SECONDS before the range test while the streaming join compares
    raw microsecond timestamps — every fixture ts carries sub-second
    micros, so pairs with micro-lag in (3600s, 3601s) (oracle kept,
    op correctly drops) or in (0s, 1s) (op keeps, oracle dropped)
    diverge.  No such boundary pair exists at sf0.01 (which is why
    the driver gate was green); the 10x layout surfaced 13+2 of them.
    The oracle now joins on microseconds — identical semantics to the
    op; lag_s stays the truncate-each-then-subtract second lag."""
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    views = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") < F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    res = run_to_memory(
        joined.select(
            "purchase_id",
            "view_id",
            "user_id",
            F.expr(
                "(unix_micros(p_ts) div 1000000) - (unix_micros(v_ts) div 1000000)"
            ).alias("lag_s"),
        ),
        "append",
        # Inner-join state eviction never emits a row, so the trailing
        # no-data micro-batch cannot add output — measured 1.8-2.6 s of
        # pure state reload per drain (guide §1.1): skipped.
        final_no_data_batch=False,
    )
    return res


def _twsip_available() -> bool:
    """transformWithStateInPandas needs google.protobuf at runtime
    (state-server protocol); this container does not ship it, so the
    operator is gated behind an import-try per the environment rules.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@op("stream_transform_with_state", oracle=None, category=CAT)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 transformWithStateInPandas (the successor state API to
    applyInPandasWithState): per-user ValueState accumulating (count,
    total) — SURVEY.md §2.9 row 6's surface on the new API (rows-only;
    equals the batch per-user aggregate when drained, see tests).

    Environment gate: the new API requires protobuf, absent here, so
    without it the SAME semantics run through applyInPandasWithState
    (stream_stateful_runstate's path) — output schema identical; the
    code path below is exercised wherever protobuf exists."""
    if not _twsip_available():
        return stream_stateful_runstate(spark, sf_dir)

    import pandas as pd  # noqa: F811 — local for the worker closure
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningAgg(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "acc", "n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (0, 0.0)
            if self._state.exists():
                n, total = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    ev = read_events_stream(spark, sf_dir).select("user_id", "ts", "value")
    out = (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningAgg(),
            outputStructType="user_id bigint, n_events bigint, total_value double",
            outputMode="Update",
            timeMode="None",
        )
    )
    return run_to_memory(out, "update", final_no_data_batch=False)


def _stream_outer_join_full(
    spark: SparkSession, sf_dir: str, *, final_no_data_batch: bool = False
) -> DataFrame:
    """Full drained output of the LEFT OUTER stream-stream join —
    matched rows PLUS whatever null-extended rows the watermark closed
    before the fixture drained.  The null-extended tail is micro-batch-
    boundary-dependent (engine-defined), so the FULL output stays
    unhashable; it is property-checked in tests/test_properties.py
    (matched == batch inner exactly; every null-extended purchase has
    zero qualifying views).

    Round-12 (guide §1.1): by default the drain skips the trailing
    no-data micro-batch — eviction during that batch emits only
    NULL-EXTENDED rows (the matched set is complete after the data
    batches), and the one registered consumer filters to the matched
    subset, so its hash-checked result is unchanged while the drain
    drops a full zero-input state-store reload (~2.5 s at sf0.1).  The
    null-extension path itself stays exercised:
    test_stream_outer_join_floor_semantics runs this helper with
    final_no_data_batch=True and asserts the tail is present and
    correct — the engine semantics the default path no longer pays
    for remain locked."""
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    views = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") < F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    )
    return run_to_memory(
        joined.select("purchase_id", "view_id", "user_id"),
        "append",
        final_no_data_batch=final_no_data_batch,
    )


@op(
    "stream_outer_join_watermark",
    oracle="""
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
           FROM events WHERE ts IS NOT NULL)
SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id
FROM e p JOIN e v
  ON p.user_id = v.user_id
 AND p.event_type = 'purchase' AND v.event_type = 'view'
 AND v.us < p.us AND v.us >= p.us - 3600000000
""",
    category=CAT,
)
def stream_outer_join_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join with watermark-bounded state:
    purchases left-joined to preceding same-user views within 1 hour.

    Round-10 upgrade (VERDICT r9 item 6): the op was rows-only because
    null-extended rows emit only once the watermark passes their join-
    window end — WHICH unmatched purchases appear depends on micro-
    batch boundaries.  But the MATCHED rows are boundary-invariant: an
    outer join emits a matched pair exactly when the inner join would,
    and a pair is null-extended only when the watermark PROVES no
    match exists, so with the fixture fully drained the matched subset
    equals the batch inner join exactly.  The registered result is
    therefore that deterministic subset, hash-checked against the
    batch-join oracle (microsecond range semantics, the same contract
    as stream_stream_join); the boundary-dependent null-extended tail
    still executes — the filter is applied to the SAME drained
    left-outer output — and keeps its property check over
    _stream_outer_join_full in tests/test_properties.py (matched ==
    inner exactly; null-extended purchases have zero qualifying
    views).  At scale the watermark bounds both sides' state stores
    exactly as in the inner variant.

    Micro-batch assumption (ADVICE r10): "matched subset == batch
    inner join" additionally assumes no matched row is LOST to
    watermark eviction mid-drain, which holds because AvailableNow on
    the single-part fixture drains in one micro-batch (and more
    generally whenever files arrive in event-time order).  A
    multi-part layout processed out of time order could advance the
    watermark past a view before its matching purchase arrives and
    evict it — a hash FAIL here should be diagnosed against that
    layout property first (same latent assumption as
    stream_stream_join)."""
    return _stream_outer_join_full(spark, sf_dir).filter(
        F.col("view_id").isNotNull()
    )


@op(
    "stream_checkpoint_resume",
    oracle="""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(floor(value * 100 + 0.5)) AS BIGINT) AS value_cents
FROM events
GROUP BY user_id
""",
    category=CAT,
)
def stream_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed exactly-once resume — the recovery semantics a
    production stream depends on: drain half the input with a
    checkpointed file-source query, stop, land more input files, then
    RESTART the same query from the checkpoint — the resumed run
    processes ONLY the new files (source offsets live in the
    checkpoint), and the append sink holds every row exactly once.
    The full DuckDB hash oracle over ALL events proves it: any
    re-processing would double-count, any lost offset would
    under-count.

    Scale: this is the nightly-backfill/crash-recovery path verbatim —
    AvailableNow + checkpointLocation is how a 100 TB file stream
    restarts; nothing here is fixture-specific except the tmp dirs."""
    base = scratch_dir(prefix="ckpt_resume_")
    indir, ckpt, outdir = f"{base}/in", f"{base}/ckpt", f"{base}/out"
    ev = load(spark, sf_dir, "events")

    def drain() -> None:
        s = spark.readStream.schema(ev.schema).parquet(indir)
        q = (
            s.writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(indir)
    drain()  # run 1: drains the even half, records offsets in ckpt
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(indir)
    drain()  # run 2: resumes from ckpt — processes ONLY the new file
    back = spark.read.schema(ev.schema).parquet(outdir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    return back.groupBy("user_id").agg(
        bigint(F.count(F.lit(1))).alias("n_events"),
        bigint(F.sum(cents)).alias("value_cents"),
    )


@op(
    "stream_two_level_window",
    oracle="""
WITH wm AS (SELECT max(epoch_us(ts)) - 600000000 AS w FROM events),
e AS (SELECT epoch_us(date_trunc('day', ts)) // 1000000 AS day_s,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
d AS (SELECT day_s, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM e GROUP BY day_s)
SELECT day_s, n, cents FROM d, wm
WHERE (day_s + 86400) * 1000000 <= wm.w
""",
    category=CAT,
)
def stream_two_level_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful streaming aggregations (Spark >= 3.4/4): an
    hourly windowed aggregate re-aggregated into daily windows inside
    the SAME streaming query — window_time() carries the hour's event
    time into the second stateful operator, so the incremental rollup
    tree (hour -> day) runs without an intermediate sink.  Append mode
    is required for chaining; with the full file drained, the final
    watermark is max(ts) - 10min and exactly the days whose end <=
    watermark are finalized — the oracle pins that exact set (the
    same finalized-window contract as stream_watermark_late).  Each
    level's state is bounded by its own window horizon."""
    ev = read_events_stream(spark, sf_dir)
    hourly = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
    )
    daily = (
        hourly.groupBy(F.window(F.window_time("window"), "1 day"))
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    )
    res = run_to_memory(daily, "append")
    return res.select(
        F.expr("(unix_micros(window.start) div 1000000)").alias("day_s"),
        bigint(F.col("n")).alias("n"),
        bigint(F.col("cents")).alias("cents"),
    )


@op(
    "stream_session_dynamic_gap",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         epoch_us(ts)
           + (600 + CAST(round(value * 100) AS BIGINT) % 1800) * 1000000 AS en
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
g AS (
  SELECT user_id, event_id, us, en,
         max(en) OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pmax
  FROM e
),
s0 AS (
  SELECT user_id, event_id, us, en,
         CASE WHEN pmax IS NULL OR us > pmax THEN 1 ELSE 0 END AS new_s
  FROM g
),
s AS (
  SELECT user_id, us, en,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM s0
)
SELECT user_id,
       CAST(min(us) AS BIGINT) AS sess_start_us,
       CAST(max(en) - min(us) AS BIGINT) AS dur_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid
""",
    category=CAT,
)
def stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a DYNAMIC, per-event gap (session_window's
    gap as an expression — here value-derived, 600-2399 s): each event
    extends its session to [t, t + its own gap), overlapping spans
    merge — activity-dependent timeouts (a purchase keeps the session
    alive longer than a view), which the fixed-gap form cannot
    express.  The batch oracle is the interval-merge formulation: a
    session break is exactly `t > running max of previous ends` (Spark
    MERGES touching spans: an event starting exactly at the running
    end extends the session — the round-9 stream-edge tie fixture
    measured the >= form engine-opposite); no recursion needed because the break
    condition only consults the running max.  Both oracle windows
    order by (us, event_id) — a TOTAL order even when one user has two
    events at the same timestamp (ADVICE r3: (us, en) could diverge
    from the pmax window's order and misassign sessions).
    Complete-mode drain emits every merged session."""
    # an event with a NULL value has no defined gap — excluded from
    # sessionization in BOTH engines (round-8 NULL-payload sweep)
    ev = read_events_stream(spark, sf_dir).filter(F.col("value").isNotNull())
    gap = F.concat(
        (
            600 + F.round(F.col("value") * 100).cast("bigint") % 1800
        ).cast("string"),
        F.lit(" seconds"),
    )
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(bigint(F.count(F.lit(1))).alias("n_events"))
    )
    res = run_to_memory(agg, "complete", final_no_data_batch=False)
    return res.select(
        "user_id",
        F.expr("unix_micros(session_window.start)").alias("sess_start_us"),
        F.expr(
            "unix_micros(session_window.end) - unix_micros(session_window.start)"
        ).alias("dur_us"),
        "n_events",
    )
