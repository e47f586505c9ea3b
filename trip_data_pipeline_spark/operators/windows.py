"""§2.5 Window functions (SURVEY.md §2.5).

Every materialized order carries a total tie-break key (§5.3 rules 7/8)
so ranks are deterministic.  Windows partition by real keys — the only
single-partition (global) window in the inventory is the bounded
sort_multikey_nulls materialization; everything here scales by its
partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import as_date, bigint, epoch_s, r2
from trip_data_pipeline_spark.registry import op

CAT = "2.5 window functions"


@op(
    "win_rank_dense_rownum",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal,
       CAST(rank()       OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(row_number() OVER w AS BIGINT) AS rn
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
""",
    category=CAT,
)
def win_rank_dense_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number over a total order — SURVEY.md
    §2.5 row 1."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        bigint(F.rank().over(w)).alias("rnk"),
        bigint(F.dense_rank().over(w)).alias("drnk"),
        bigint(F.row_number().over(w)).alias("rn"),
    )


@op(
    "win_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
      FROM orders) t
WHERE rn <= 3
""",
    category=CAT,
    pure=True,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — SURVEY.md §2.5 row 2.

    row_number + filter is the per-group top-k physical pattern; Spark
    pushes a WindowGroupLimit (top-k per partition before the full
    sort) in recent versions, keeping state bounded per key."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            bigint(F.row_number().over(w)).alias("rn"),
        ).filter(F.col("rn") <= 3)
    )


@op(
    "win_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
""",
    category=CAT,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative order value per customer — SURVEY.md §2.5 row 3.
    Prefix sums of 2dp values stay on the 2dp grid, so round(2) is
    tie-free."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        as_date(F.col("o_orderdate")).alias("o_orderdate"),
        r2(F.sum("o_totalprice").over(w)).alias("running_total"),
    )


@op(
    "win_moving_avg",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, round(sum(value), 2) AS day_value
  FROM events GROUP BY 1
)
SELECT day, day_value,
       round(avg(day_value) OVER (ORDER BY day
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7
FROM daily
""",
    category=CAT,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily event value — SURVEY.md §2.5 row 4.

    The global window runs over ~30 pre-aggregated daily rows, not raw
    events — aggregate first, window the small result (the scale-safe
    shape for time-series smoothing)."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(r2(F.sum("value")).alias("day_value"))
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        "day", "day_value", r2(F.avg("day_value").over(w)).alias("ma7")
    )


@op(
    "win_range_frame",
    oracle="""
SELECT p_partkey, p_brand, p_size,
       round(sum(p_retailprice) OVER (
         PARTITION BY p_brand ORDER BY p_size
         RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING), 2) AS near_size_total
FROM part
""",
    category=CAT,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, peer-inclusive) — SURVEY.md §2.5
    row 5."""
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_size").rangeBetween(-10, 10)
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        r2(F.sum("p_retailprice").over(w)).alias("near_size_total"),
    )


@op(
    "win_lag_lead",
    oracle="""
WITH e AS (SELECT event_id, user_id, value,
                  (epoch_us(ts) // 1000000) AS s FROM events)
SELECT event_id, user_id,
       round(value - lag(value) OVER w, 2)          AS value_delta,
       CAST(lead(s) OVER w - s AS BIGINT)           AS gap_to_next_s
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
""",
    category=CAT,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead deltas per user — SURVEY.md §2.5 row 6."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", epoch_s("ts").alias("s")
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        r2(F.col("value") - F.lag("value").over(w)).alias("value_delta"),
        bigint(F.lead("s").over(w) - F.col("s")).alias("gap_to_next_s"),
    )


@op(
    "win_ntile_pctrank",
    oracle="""
SELECT c_custkey, c_mktsegment,
       CAST(ntile(4) OVER w AS BIGINT)      AS quartile,
       round(percent_rank() OVER w, 6)      AS pct_rank,
       round(cume_dist() OVER w, 6)         AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
    category=CAT,
)
def win_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist — SURVEY.md §2.5 row 7."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        bigint(F.ntile(4).over(w)).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@op(
    "win_first_last",
    oracle="""
SELECT c_custkey, c_nationkey,
       first_value(c_name) OVER w AS richest,
       last_value(c_name)  OVER w AS poorest
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    category=CAT,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value over an explicit full frame — SURVEY.md §2.5
    row 8 (explicit frame: the default frame stops at CURRENT ROW,
    which would make last_value trivially the current row)."""
    c = load(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.first("c_name").over(w).alias("richest"),
        F.last("c_name").over(w).alias("poorest"),
    )


@op(
    "win_time_weighted_avg",
    oracle="""
WITH t AS (
  SELECT user_id, value,
         epoch_us(ts) // 1000000 AS s,
         lead(epoch_us(ts) // 1000000) OVER (
           PARTITION BY user_id
           ORDER BY epoch_us(ts) // 1000000, event_id) AS ns
  FROM events
)
SELECT user_id,
       round(sum(value * (ns - s)) / sum(ns - s), 4) AS twap,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM t WHERE ns IS NOT NULL AND ns > s
GROUP BY user_id
""",
    category=CAT,
)
def win_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation weighted by its
    holding time until the next observation (lead over the per-user
    timeline), then one grouped ratio.  The irregular-timeseries
    rollup a tick store needs; all time math in integer epoch seconds
    (§5.3 rule 2), total order (s, event_id) so lead() is
    deterministic on both engines.  One shuffle on user_id serves both
    the window sort and the final aggregate."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "value", "event_id", epoch_s("ts").alias("s")
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    t = ev.withColumn("ns", F.lead("s").over(w))
    return (
        t.filter(F.col("ns").isNotNull() & (F.col("ns") > F.col("s")))
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * (F.col("ns") - F.col("s")))
                / F.sum(F.col("ns") - F.col("s")),
                4,
            ).alias("twap"),
            bigint(F.count(F.lit(1))).alias("n_intervals"),
        )
    )
