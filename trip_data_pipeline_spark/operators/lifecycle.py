"""Record-lifecycle / sessionless-analytics composites: interval
merging, consecutive-day streaks, CDC latest-wins apply, first-touch
attribution, and largest-remainder allocation.

These are the remaining "data lifecycle" patterns a production trip /
training-data pipeline runs beside the SURVEY.md §2 inventory: merging
overlapping activity windows (gaps-and-islands on time ranges),
activity streaks (gaps-and-islands on days), applying a change log to
a snapshot (upsert + tombstone), marketing-style attribution, and
deterministic integer budget allocation.

Parity strategy (SURVEY.md §5.3): every timestamp is reduced to integer
epoch seconds/days BEFORE any comparison; every summed money value is
quantized to integer milli-units before aggregation; allocation is pure
integer arithmetic — no float can differ cross-engine.

Scale notes (100 TB): all five ops are one shuffle each — a window
partitioned by user/key or a groupBy on the same key — with no
self-join fan-out.  The island-detection trick (cumulative max over an
ordered window, then a running sum of boundary flags) is the standard
distributed formulation: it needs ONE sort per partition key instead of
an O(n²) interval self-join, so it survives arbitrarily many intervals
per key as long as one key's intervals fit a partition (the same
constraint as any windowed op; salt the key if a single user exceeds
that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import as_date, bigint, epoch_s, r2
from trip_data_pipeline_spark.registry import op

CAT = "lifecycle / sessionless analytics"

WIDTH_S = 300  # each event opens a 5-minute activity interval


@op(
    "interval_merge_overlaps",
    oracle=f"""
WITH iv AS (
  SELECT user_id,
         (epoch_us(ts) // 1000000)           AS start_s,
         (epoch_us(ts) // 1000000) + {WIDTH_S} AS end_s
  FROM events
),
marked AS (
  SELECT user_id, start_s, end_s,
         CASE WHEN start_s <= max(end_s) OVER (
                PARTITION BY user_id ORDER BY start_s, end_s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 0 ELSE 1 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, start_s, end_s,
         sum(new_island) OVER (
           PARTITION BY user_id ORDER BY start_s, end_s
           ROWS UNBOUNDED PRECEDING) AS island_id
  FROM marked
)
SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
       CAST(min(start_s) AS BIGINT) AS island_start_s,
       CAST(max(end_s) AS BIGINT)   AS island_end_s,
       CAST(count(*) AS BIGINT)     AS n_events
FROM islands GROUP BY user_id, island_id
ORDER BY user_id, island_id
""",
    category=CAT,
)
def interval_merge_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping per-user activity intervals (each event opens
    [ts, ts+300s)) into maximal islands.  Classic distributed interval
    merge: an interval starts a new island iff its start exceeds the
    running max end of all earlier intervals; a running sum of those
    boundary flags numbers the islands; one groupBy collapses them.
    Two window passes + one aggregate over the SAME partition key =
    one shuffle total (Spark reuses the user_id hash partitioning
    across the three steps).  All integer epoch-second math."""
    s = epoch_s("ts")
    iv = load(spark, sf_dir, "events").select(
        "user_id", s.alias("start_s"), (s + WIDTH_S).alias("end_s")
    )
    w = Window.partitionBy("user_id").orderBy("start_s", "end_s")
    prev_max_end = F.max("end_s").over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = iv.withColumn(
        "new_island",
        F.when(F.col("start_s") <= prev_max_end, 0).otherwise(1),
    )
    islands = marked.withColumn(
        "island_id", F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy("user_id", bigint(F.col("island_id")).alias("island_id"))
        .agg(
            bigint(F.min("start_s")).alias("island_start_s"),
            bigint(F.max("end_s")).alias("island_end_s"),
            bigint(F.count("*")).alias("n_events"),
        )
        .orderBy("user_id", "island_id")
    )


@op(
    "streak_longest_daily",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, (epoch_us(ts) // 1000000) // 86400 AS day
  FROM events
),
numbered AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
),
streaks AS (
  SELECT user_id, grp, count(*) AS len FROM numbered GROUP BY user_id, grp
)
SELECT user_id,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(sum(len) AS BIGINT) AS active_days
FROM streaks GROUP BY user_id ORDER BY user_id
""",
    category=CAT,
)
def streak_longest_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive active days per user — the canonical
    gaps-and-islands on days: distinct (user, epoch-day), then
    `day - row_number()` is constant exactly within a consecutive run,
    so a two-level groupBy yields streak lengths.  Epoch-day integers
    (no calendar functions) keep both engines on identical values; the
    whole op is one shuffle on user_id (distinct, window, and both
    aggregates all share the key)."""
    days = (
        load(spark, sf_dir, "events")
        .select("user_id", (epoch_s("ts") / F.lit(86400)).cast("bigint").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    numbered = days.withColumn("grp", F.col("day") - F.row_number().over(w))
    return (
        numbered.groupBy("user_id", "grp")
        .agg(F.count("*").alias("len"))
        .groupBy("user_id")
        .agg(
            bigint(F.max("len")).alias("longest_streak"),
            bigint(F.sum("len")).alias("active_days"),
        )
        .orderBy("user_id")
    )


@op(
    "cdc_apply_changelog",
    oracle="""
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
SELECT o_custkey,
       o_orderkey                    AS last_orderkey,
       CAST(o_orderdate AS DATE)     AS last_date,
       round(o_totalprice, 2)        AS last_price
FROM ranked
WHERE rn = 1 AND o_orderstatus <> 'P'
ORDER BY o_custkey
""",
    category=CAT,
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a change log with latest-wins + tombstone semantics: the
    orders table is read as a changelog keyed by customer, ordered by
    (o_orderdate, o_orderkey); the newest record wins, and a newest
    record in status 'P' (pending = tombstone here) deletes the key.
    This is the batch formulation of CDC materialization (MERGE INTO /
    upsert compaction): one window shuffle on the key, rank-1 filter,
    tombstone drop — no join against the base snapshot needed because
    rank-1-per-key IS the snapshot.  At 100 TB the changelog shuffles
    once on the key; with a bucketed base table the same plan runs
    shuffle-free."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("o_orderstatus") != "P"))
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("last_orderkey"),
            as_date(F.col("o_orderdate")).alias("last_date"),
            r2(F.col("o_totalprice")).alias("last_price"),
        )
        .orderBy("o_custkey")
    )


@op(
    "attribution_first_touch",
    oracle="""
WITH firsts AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
channel AS (
  SELECT user_id, event_type AS first_channel FROM firsts WHERE rn = 1
),
rev AS (
  SELECT user_id,
         sum(CAST(round(value * 1000) AS BIGINT)) AS rev_milli,
         count(*) AS n_purch
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT first_channel,
       CAST(count(*) AS BIGINT)                       AS n_users,
       round(coalesce(sum(rev_milli), 0) / 1000.0, 2) AS attributed_revenue,
       CAST(coalesce(sum(n_purch), 0) AS BIGINT)      AS n_purchases
FROM channel LEFT JOIN rev USING (user_id)
GROUP BY first_channel ORDER BY first_channel
""",
    category=CAT,
)
def attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: every user's purchase revenue is
    credited to the event_type of their first-ever event.  Two passes
    over events sharing the user_id shuffle key (rank-1 window for the
    first touch, filtered aggregate for revenue) joined on user_id.
    Revenue is quantized to exact integer milli-units per event before
    summing (identical IEEE product then identical round on both
    engines), so group totals are bit-identical regardless of sum
    order.  Window ties broken by event_id for determinism."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    channel = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("first_channel"))
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("rev_milli"),
            F.count("*").alias("n_purch"),
        )
    )
    return (
        channel.join(rev, "user_id", "left")
        .groupBy("first_channel")
        .agg(
            bigint(F.count("*")).alias("n_users"),
            F.round(F.coalesce(F.sum("rev_milli"), F.lit(0)) / 1000.0, 2).alias(
                "attributed_revenue"
            ),
            bigint(F.coalesce(F.sum("n_purch"), F.lit(0))).alias("n_purchases"),
        )
        .orderBy("first_channel")
    )


BUDGET = 1_000_000


@op(
    "alloc_largest_remainder",
    oracle=f"""
WITH cnt AS (
  SELECT n_name, count(*) AS c
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
),
tot AS (SELECT sum(c) AS t FROM cnt),
base AS (
  SELECT n_name, c,
         (c * {BUDGET}) // t AS floor_alloc,
         (c * {BUDGET}) % t  AS rem
  FROM cnt, tot
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY rem DESC, n_name) AS rk,
         {BUDGET} - sum(floor_alloc) OVER ()           AS leftover
  FROM base
)
SELECT n_name,
       CAST(c AS BIGINT) AS n_customers,
       CAST(floor_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT)   AS alloc
FROM ranked ORDER BY n_name
""",
    category=CAT,
)
def alloc_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: split an integer
    budget across nations proportional to customer count so the parts
    sum EXACTLY to the budget.  Floor allocations + distribute the
    leftover units to the largest remainders (ties broken by name).
    Pure integer arithmetic end-to-end — `c*B div t` and `c*B mod t`
    are exact in both engines — so this is deterministic in a way a
    float-share-then-round scheme never is.  The per-nation aggregate
    is tiny (25 rows); the single-partition windows over it are
    intentional and free at any source scale because the shuffle
    reduces to nation cardinality first."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    cnt = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("c"))
    )
    tot = cnt.agg(F.sum("c").alias("t"))
    base = cnt.join(F.broadcast(tot)).select(
        "n_name",
        "c",
        F.expr(f"(c * {BUDGET}) div t").alias("floor_alloc"),
        ((F.col("c") * BUDGET) % F.col("t")).alias("rem"),
    )
    w_all = Window.partitionBy(F.lit(1))
    ranked = base.withColumn(
        "rk",
        F.row_number().over(w_all.orderBy(F.col("rem").desc(), "n_name")),
    ).withColumn("leftover", F.lit(BUDGET) - F.sum("floor_alloc").over(w_all))
    return ranked.select(
        "n_name",
        bigint(F.col("c")).alias("n_customers"),
        bigint(
            F.col("floor_alloc")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).alias("alloc"),
    ).orderBy("n_name")


@op(
    "win_sliding_distinct_users",
    oracle="""
WITH du AS (
  SELECT DISTINCT (epoch_us(ts) // 1000000) // 86400 AS day, user_id
  FROM events
),
win AS (
  SELECT day,
         count(DISTINCT user_id) OVER (
           ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
           AS users_7d
  FROM du
)
SELECT CAST(day AS BIGINT) AS day, CAST(users_7d AS BIGINT) AS users_7d
FROM win GROUP BY day, users_7d ORDER BY day
""",
    category=CAT,
)
def win_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the sliding
    DISTINCT aggregate Spark's window API lacks natively.

    Round-3 rewrite, fully distributed: instead of a single-partition
    `collect_set` range window over the whole (day, user) relation
    (which serializes on one task and materializes user sets), each
    active (day, user) pair CONTRIBUTES to the seven output days
    [day, day+6]; exploding the contribution days turns the sliding
    distinct into two plain keyed aggregations — distinct
    (contrib_day, user), then count per contrib_day — restricted to
    days that actually occur.  Every stage shuffles on a key; nothing
    is ever globally ordered.  At 100 TB the same shape holds (the 7x
    explode is the window length, a constant); the sketch path for
    huge cardinalities remains `agg_hll_sketch`."""
    du = (
        load(spark, sf_dir, "events")
        .select(
            (epoch_s("ts") / F.lit(86400)).cast("bigint").alias("day"), "user_id"
        )
        .distinct()
    )
    days = du.select("day").distinct()
    contrib = du.select(
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("day"),
        "user_id",
    ).distinct()
    counts = contrib.groupBy("day").agg(
        bigint(F.count(F.lit(1))).alias("users_7d")
    )
    return (
        counts.join(days, "day", "left_semi")
        .select(bigint(F.col("day")).alias("day"), "users_7d")
        .orderBy("day")
    )
