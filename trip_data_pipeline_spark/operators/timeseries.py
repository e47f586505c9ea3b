"""Time-series warehouse patterns: hypertable-style two-level rollup,
calendar gap-fill with last-observation-carried-forward, cumulative
distinct counting, and IQR outlier fences.

These are the continuous-aggregate / downsampling operations a
time-series store (TimescaleDB-style hypertable rollups) provides,
re-expressed as plain Spark aggregations whose *reaggregability* is
the point: the daily rollup is computed FROM the hourly rollup, not
from raw data, proving the sketch-free aggregates (count, integer
sum) compose — which is exactly what makes incremental materialized
rollups valid at 100 TB.

Parity strategy (SURVEY.md §5.3): hours/days are projected as integer
epoch seconds or DATEs; ``value`` is quantized to integer cents
before any sum; LOCF compares no floats at all.

Scale notes (100 TB):
- ``rollup_hypertable_2level``: two partial+final hash aggregates;
  the second one runs on the (tiny) hourly output.  On a cluster the
  hourly rollup would be written partitioned by day and the daily
  pass reads only the rollup — the query shape here is that plan.
- ``timeseries_gap_fill_locf``: the spine is generated (no scan) and
  the fill is one window sort per series key — never a self-join.
- ``agg_cumulative_distinct``: the classic distributed form — distinct
  via min(first-seen) per user (one shuffle), then a tiny running sum
  over days — instead of a quadratic windowed COUNT(DISTINCT).
- ``dq_outlier_iqr``: exact quantiles per group need a per-group sort;
  at real scale swap in approx_percentile with the same fence logic
  (the rows-only `agg_percentile_approx` op covers the sketch path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import bigint
from trip_data_pipeline_spark.registry import op

CAT = "2.14 time-series rollups"

_CENTS = "CAST(round(value * 100) AS BIGINT)"


def _cents(c: F.Column = None):
    return F.round(F.col("value") * 100).cast("bigint")


@op(
    "rollup_hypertable_2level",
    oracle=f"""
WITH hourly AS (
  SELECT (epoch_us(date_trunc('hour', ts)) // 1000000) AS hour_s,
         event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum({_CENTS}) AS BIGINT) AS cents
  FROM events
  GROUP BY 1, 2
)
SELECT CAST(to_timestamp(hour_s)::DATE AS DATE) AS day,
       event_type,
       CAST(sum(n) AS BIGINT) AS n_events,
       round(sum(cents) / 100.0, 2) AS total_value
FROM hourly
GROUP BY 1, 2
""",
    category=CAT,
)
def rollup_hypertable_2level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hourly rollup, then a
    daily rollup computed FROM the hourly result (reaggregation, not a
    second raw scan) — the validity proof for incremental rollups."""
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.expr("unix_micros(date_trunc('hour', ts)) div 1000000").alias("hour_s"),
            "event_type",
        ).agg(
            bigint(F.count(F.lit(1))).alias("n"),
            bigint(F.sum(_cents())).alias("cents"),
        )
    )
    return hourly.groupBy(
        F.to_date(F.timestamp_seconds(F.col("hour_s"))).alias("day"),
        "event_type",
    ).agg(
        bigint(F.sum("n")).alias("n_events"),
        F.round(F.sum("cents") / 100.0, 2).alias("total_value"),
    )


@op(
    "timeseries_gap_fill_locf",
    oracle=f"""
WITH spine AS (
  SELECT b.bucket, d.day
  FROM (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                      INTERVAL 1 DAY))::DATE AS day) d
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bucket) b
),
daily AS (
  SELECT user_id % 10 AS bucket, ts::DATE AS day,
         {_CENTS} AS cents, epoch_us(ts) AS us, event_id
  FROM events
),
last_per_day AS (
  SELECT bucket, day, cents
  FROM (SELECT bucket, day, cents,
               row_number() OVER (PARTITION BY bucket, day
                                  ORDER BY us DESC, event_id DESC) AS rn
        FROM daily)
  WHERE rn = 1
)
SELECT s.bucket, s.day,
       last_value(l.cents IGNORE NULLS) OVER (
         PARTITION BY s.bucket ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
FROM spine s
LEFT JOIN last_per_day l ON l.bucket = s.bucket AND l.day = s.day
""",
    category=CAT,
)
def timeseries_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap fill: generated day spine x series key, left-join
    the last observed value per (key, day), then carry the last
    non-null observation forward (LOCF) with an ignore-nulls window.
    All values are integer cents — no float comparison anywhere."""
    ev = load(spark, sf_dir, "events")
    daily = ev.select(
        (F.col("user_id") % 10).alias("bucket"),
        F.to_date("ts").alias("day"),
        _cents().alias("cents"),
        F.expr("unix_micros(ts)").alias("us"),
        "event_id",
    )
    wlast = Window.partitionBy("bucket", "day").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    last_per_day = (
        daily.withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .select("bucket", "day", "cents")
    )
    spine = (
        spark.range(10)
        .select(F.col("id").cast("int").alias("bucket"))
        .crossJoin(
            spark.sql(
                "SELECT explode(sequence(DATE '2024-01-01', DATE '2024-01-30',"
                " INTERVAL 1 DAY)) AS day"
            )
        )
    )
    wfill = (
        Window.partitionBy("bucket")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(last_per_day, ["bucket", "day"], "left")
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            "day",
            F.last("cents", ignorenulls=True).over(wfill).alias("filled_cents"),
        )
    )


@op(
    "agg_cumulative_distinct",
    oracle="""
WITH first_seen AS (
  SELECT user_id, min(ts::DATE) AS day FROM events GROUP BY user_id
),
daily_new AS (
  SELECT day, CAST(count(*) AS BIGINT) AS new_users
  FROM first_seen GROUP BY day
)
SELECT day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM daily_new
""",
    category=CAT,
)
def agg_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day WITHOUT a windowed
    COUNT(DISTINCT): min(first-seen day) per user (one shuffle on
    user_id), count per day, tiny running sum.  The standard rewrite
    that makes 'users to date' linear at warehouse scale."""
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("day"))
    daily_new = first_seen.groupBy("day").agg(
        bigint(F.count(F.lit(1))).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily_new.select(
        "day", "new_users", bigint(F.sum("new_users").over(w)).alias("cum_users")
    )


@op(
    "dq_outlier_iqr",
    oracle=f"""
WITH vals AS (
  SELECT event_type, {_CENTS} AS cents FROM events
),
fences AS (
  SELECT event_type,
         quantile_cont(cents, 0.25) AS q1,
         quantile_cont(cents, 0.75) AS q3
  FROM vals GROUP BY event_type
)
SELECT v.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN v.cents * 2.0 < f.q1 * 5 - f.q3 * 3
                       OR v.cents * 2.0 > f.q3 * 5 - f.q1 * 3
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(f.q1 / 100.0, 4) AS q1,
       round(f.q3 / 100.0, 4) AS q3
FROM vals v JOIN fences f USING (event_type)
GROUP BY v.event_type, f.q1, f.q3
""",
    category=CAT,
)
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts per group.  Fence test is
    cross-multiplied: x < q1 - 1.5*(q3-q1)  <=>  2x < 5*q1 - 3*q3,
    keeping the comparison in exact halves of integer cents (q1/q3 are
    midpoint-interpolated, so 2*q is integral).  Spark `percentile` and
    DuckDB `quantile_cont` both interpolate linearly on the sorted set."""
    ev = load(spark, sf_dir, "events").select("event_type", _cents().alias("cents"))
    fences = ev.groupBy("event_type").agg(
        F.percentile("cents", 0.25).alias("q1"),
        F.percentile("cents", 0.75).alias("q3"),
    )
    lo = F.col("q1") * 5 - F.col("q3") * 3
    hi = F.col("q3") * 5 - F.col("q1") * 3
    out_flag = (F.col("cents") * 2.0 < lo) | (F.col("cents") * 2.0 > hi)
    return (
        ev.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "q1", "q3")
        .agg(
            bigint(F.count(F.lit(1))).alias("n"),
            bigint(F.sum(F.when(out_flag, 1).otherwise(0))).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            "n_outliers",
            F.round(F.col("q1") / 100.0, 4).alias("q1"),
            F.round(F.col("q3") / 100.0, 4).alias("q3"),
        )
    )


@op(
    "dq_anomaly_mad",
    oracle="""
WITH x AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
med AS (SELECT event_type, median(cents) AS med FROM x GROUP BY event_type),
dev AS (
  SELECT x.event_type, x.cents, abs(x.cents - med.med) AS d, med.med
  FROM x JOIN med USING (event_type)
),
mad AS (SELECT event_type, median(d) AS mad FROM dev GROUP BY event_type)
SELECT dev.event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(min(dev.med), 1)   AS med_cents,
       round(min(mad.mad), 1)   AS mad_cents,
       CAST(sum(CASE WHEN dev.d > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
""",
    category=CAT,
)
def dq_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection via median absolute deviation: flag
    values more than 3 MAD from the per-group median — the
    outlier-resistant sibling of dq_outlier_iqr (a single wild value
    shifts an IQR fence, not a MAD fence).

    Exactness: values quantized to integer cents; medians of integers
    are either integers or exact .5 halves (quantile interpolation at
    the midpoint) — every comparison and the 3xMAD threshold are
    exact doubles, so outlier membership cannot flip between engines.

    Scale: two grouped exact medians (per-group sort; swap in
    approx_percentile at real scale, same shape) + two broadcast-size
    joins of per-type statistics back onto the value stream."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("cents") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(d, 0.5)").alias("mad"))
    j = dev.join(F.broadcast(mad), "event_type")
    return j.groupBy("event_type").agg(
        bigint(F.count(F.lit(1))).alias("n"),
        F.round(F.min("med"), 1).alias("med_cents"),
        F.round(F.min("mad"), 1).alias("mad_cents"),
        bigint(
            F.sum((F.col("d") > 3 * F.col("mad")).cast("bigint"))
        ).alias("n_outliers"),
    )
