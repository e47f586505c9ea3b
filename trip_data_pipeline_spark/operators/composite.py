"""Composite analytic queries (round-1 additions): TPC-H-shaped
multi-join aggregations and calendar-spine ETL patterns — the
"realistic query" layer on top of the per-operator inventory.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import as_date, bigint, epoch_s, r2
from trip_data_pipeline_spark.registry import op

CAT = "composite queries"


@op(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
  AND CAST(l_shipdate  AS DATE) > DATE '1998-03-15'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
    category=CAT,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped shipping priority: segment filter -> 3-way join
    -> grouped revenue -> top-10 (total tie-break).  Both date filters
    push to their scans; the segment filter reduces customer before
    the join."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        as_date(F.col("o_orderdate")) < F.lit("1998-03-15").cast("date")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        as_date(F.col("l_shipdate")) > F.lit("1998-03-15").cast("date")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            as_date(F.col("o_orderdate")).alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@op(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM customer
JOIN nation   ON n_nationkey = c_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    category=CAT,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped returned-item report: top-20 customers by
    revenue lost to returns; nation dim broadcast."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
            bigint(F.count(F.lit(1))).alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@op(
    "calendar_spine_join",
    oracle="""
WITH cal AS (
  SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '2001-08-01',
                                     INTERVAL 1 MONTH)) AS DATE) AS month
),
per_month AS (
  SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month,
         CAST(count(*) AS BIGINT) AS n,
         round(sum(o_totalprice), 2) AS total
  FROM orders GROUP BY 1
)
SELECT cal.month,
       CAST(coalesce(per_month.n, 0) AS BIGINT) AS n_orders,
       round(coalesce(per_month.total, 0.0), 2) AS total
FROM cal LEFT JOIN per_month ON per_month.month = cal.month
""",
    category=CAT,
)
def calendar_spine_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine generation + left join (gap-filled time series,
    months with zero orders included) — the dimension-spine ETL
    pattern.  The spine is generated with sequence(), not read: one
    row per month, broadcast side of the join."""
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("2001-08-01").cast("date"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month")
    )
    per_month = (
        load(spark, sf_dir, "orders")
        .groupBy(F.trunc(as_date(F.col("o_orderdate")), "month").alias("month"))
        .agg(
            bigint(F.count(F.lit(1))).alias("n"),
            r2(F.sum("o_totalprice")).alias("total"),
        )
    )
    return F.broadcast(spine).join(per_month, "month", "left").select(
        "month",
        bigint(F.coalesce("n", F.lit(0))).alias("n_orders"),
        r2(F.coalesce("total", F.lit(0.0))).alias("total"),
    )


@op(
    "str_levenshtein",
    oracle="""
SELECT p1.p_partkey AS partkey,
       CAST(levenshtein(p1.p_name, p2.p_name) AS BIGINT)  AS dist_next,
       CAST(levenshtein(p1.p_name, 'red widget') AS BIGINT) AS dist_ref
FROM part p1 JOIN part p2 ON p2.p_partkey = p1.p_partkey + 1
""",
    category=CAT,
)
def str_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance between neighboring part names and to a reference
    string — fuzzy-matching primitive (both engines implement classic
    Levenshtein)."""
    p = load(spark, sf_dir, "part")
    p1, p2 = p.alias("p1"), p.alias("p2")
    return p1.join(p2, F.col("p2.p_partkey") == F.col("p1.p_partkey") + 1).select(
        F.col("p1.p_partkey").alias("partkey"),
        bigint(F.levenshtein(F.col("p1.p_name"), F.col("p2.p_name"))).alias(
            "dist_next"
        ),
        bigint(F.levenshtein(F.col("p1.p_name"), F.lit("red widget"))).alias(
            "dist_ref"
        ),
    )


@op(
    "explode_outer_preserve",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> length(x) > 8) AS longw
  FROM documents
)
SELECT doc_id,
       unnest(CASE WHEN longw IS NULL OR len(longw) = 0
                   THEN [NULL] ELSE longw END) AS word
FROM t
""",
    category=CAT,
)
def explode_outer_preserve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with empty arrays survive with NULL (LEFT
    lateral view semantics) — docs with no long words keep one NULL
    row; the oracle emulates with a CASE to a [NULL] list."""
    d = load(spark, sf_dir, "documents")
    longw = F.filter(
        F.split(F.col("text"), " "), lambda w: F.length(w) > 8
    )
    return d.select(
        "doc_id", F.explode_outer(longw).alias("word")
    )


@op(
    "subquery_correlated",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
                          FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
""",
    category=CAT,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders >2x their customer's average)
    — exercises Catalyst's RewriteCorrelatedScalarSubquery: the
    correlated aggregate decorrelates into a grouped join, not a
    per-row re-scan.  Expressed via spark.sql (the DSL has no
    correlated-subquery surface)."""
    view = f"orders_sq_{uuid.uuid4().hex[:8]}"
    load(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM {view} o
        WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
                                  FROM {view} o2
                                  WHERE o2.o_custkey = o.o_custkey)
        """
    )


@op(
    "join_null_safe",
    oracle="""
WITH a AS (SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS k FROM orders
           WHERE o_orderkey < 500),
     b AS (SELECT DISTINCT NULLIF(o_orderstatus, 'P') AS k FROM orders)
SELECT a.o_orderkey, a.k AS k
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
""",
    category=CAT,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics a merge on a
    nullable natural key needs."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("k")
    )
    b = o.select(F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("bk")).distinct()
    return a.join(b, a.k.eqNullSafe(b.bk)).select("o_orderkey", "k")


@op(
    "q4_order_priority_exists",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    category=CAT,
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped priority check: EXISTS decorrelates to a LEFT
    SEMI join on the order key (shipdate>orderdate+30d stands in for
    commit/receipt lateness, which the fixtures lack).  The quarter
    filter prunes orders before the semi-join's shuffle."""
    o = load(spark, sf_dir, "orders").filter(
        (as_date(F.col("o_orderdate")) >= F.lit("1996-07-01").cast("date"))
        & (as_date(F.col("o_orderdate")) < F.lit("1996-10-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(bigint(F.count("*")).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@op(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey   = o_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
JOIN supplier ON l_suppkey   = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    category=CAT,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped local supplier volume: 6-way join where the
    customer and supplier must share a nation, restricted to one region
    and year.  region/nation/supplier/customer are all broadcast-side;
    only orders<->lineitem shuffles on the order key."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (as_date(F.col("o_orderdate")) >= F.lit("1996-01-01").cast("date"))
        & (as_date(F.col("o_orderdate")) < F.lit("1997-01-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@op(
    "q6_forecast_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    category=CAT,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped forecast revenue: pure scan-filter-agg, no join.
    All three predicates reach the parquet scan (PushedFilters) and the
    sum is a single partial+final agg — the canonical pushdown probe."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (as_date(F.col("l_shipdate")) >= F.lit("1996-01-01").cast("date"))
        & (as_date(F.col("l_shipdate")) < F.lit("1997-01-01").cast("date"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
        bigint(F.count("*")).alias("n_lines"),
    )


@op(
    "q12_late_lines_by_priority",
    oracle="""
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY year(l_shipdate)
ORDER BY ship_year
""",
    category=CAT,
)
def q12_late_lines_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped shipping check (no l_shipmode in fixtures, so
    the 'late' predicate is shipdate>orderdate+60d and the split is by
    ship year): join + conditional counts via sum(CASE WHEN).  The
    non-equi lateness predicate stays a post-join filter on the single
    equi-join."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            bigint(F.sum(F.when(high, 1).otherwise(0))).alias("high_line_count"),
            bigint(F.sum(F.when(~high, 1).otherwise(0))).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


@op(
    "q14_promo_revenue_pct",
    oracle="""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-09-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1996-10-01'
""",
    category=CAT,
)
def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promo share: month-filtered lineitem joined to
    a broadcast part dim, ratio of conditional to total revenue in one
    aggregate pass (no second scan)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (as_date(F.col("l_shipdate")) >= F.lit("1996-09-01").cast("date"))
        & (as_date(F.col("l_shipdate")) < F.lit("1996-10-01").cast("date"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


@op(
    "q18_large_volume_customer",
    oracle="""
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       o_totalprice,
       round(sum(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    category=CAT,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped large-volume customers: the IN-subquery is a
    grouped HAVING on lineitem semi-joined back, then the 3-way join
    re-aggregates per order.  The heavy groupBy(l_orderkey) happens
    once on the narrow (key, qty) projection."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 200)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        li.withColumnRenamed("l_orderkey", "lk")
        .join(big, F.col("lk") == F.col("l_orderkey"), "inner")
        .join(o, F.col("lk") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            as_date(F.col("o_orderdate")).alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(r2(F.sum(F.col("l_quantity"))).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@op(
    "funnel_conversion",
    oracle="""
WITH s AS (
  SELECT user_id, min(epoch_us(ts) // 1000000) AS t_signup
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), v AS (
  SELECT e.user_id, min(epoch_us(e.ts) // 1000000) AS t_view
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'view' AND (epoch_us(e.ts) // 1000000) >= s.t_signup
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(epoch_us(e.ts) // 1000000) AS t_purchase
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND (epoch_us(e.ts) // 1000000) >= v.t_view
  GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup,
       CAST((SELECT count(*) FROM v) AS BIGINT) AS n_then_view,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_then_purchase
""",
    category=CAT,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup -> later view -> later purchase): each
    stage keeps users whose stage event occurs at-or-after their
    previous stage's first event.  Three narrow grouped mins over one
    scan family, joined on user_id — shuffles carry (user, ts) pairs
    only.  All time math in integer epoch seconds (§5.3 rule 2)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_s("ts").alias("s")
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("s").alias("t_signup"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("s") >= F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("s").alias("t_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("s") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("s").alias("t_purchase"))
    )
    return (
        s.agg(bigint(F.count("*")).alias("n_signup"))
        .crossJoin(v.agg(bigint(F.count("*")).alias("n_then_view")))
        .crossJoin(p.agg(bigint(F.count("*")).alias("n_then_purchase")))
    )


@op(
    "retention_cohort",
    oracle="""
WITH d AS (
  SELECT user_id, (epoch_us(ts) // 1000000) // 86400 AS day
  FROM events
), c AS (
  SELECT user_id, min(day) AS d0 FROM d GROUP BY user_id
)
SELECT CAST(c.d0 // 7 AS BIGINT)          AS cohort_week,
       CAST((d.day - c.d0) // 7 AS BIGINT) AS week_offset,
       CAST(count(DISTINCT d.user_id) AS BIGINT) AS active_users
FROM d JOIN c ON d.user_id = c.user_id
GROUP BY 1, 2
ORDER BY cohort_week, week_offset
""",
    category=CAT,
)
def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-activity week,
    counted distinct per week offset.  Day/week numbers are integer
    epoch-day arithmetic — engine-independent, no calendar functions
    (§5.3 rule 5).  The cohort map (user -> d0) is a narrow aggregate
    reused via join; at scale it broadcasts if the user dimension is
    small or co-partitions on user_id otherwise."""
    d = load(spark, sf_dir, "events").select(
        "user_id", (epoch_s("ts") / F.lit(86400)).cast("bigint").alias("day")
    )
    c = d.groupBy("user_id").agg(F.min("day").alias("d0"))
    return (
        d.join(c, "user_id")
        .groupBy(
            (F.col("d0") / 7).cast("bigint").alias("cohort_week"),
            ((F.col("day") - F.col("d0")) / 7).cast("bigint").alias("week_offset"),
        )
        .agg(bigint(F.count_distinct("user_id")).alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@op(
    "histogram_fixed_width",
    oracle="""
SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders
GROUP BY 1 ORDER BY bucket
""",
    category=CAT,
)
def histogram_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via floor(x/w) bucketing — one partial+
    final aggregate, no sort; identical IEEE double division on both
    engines so bucket edges agree exactly.  min/max round at the 2dp
    value grid (§5.3 rule 1)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 25000).cast("bigint").alias("bucket")
        )
        .agg(
            bigint(F.count("*")).alias("n"),
            r2(F.min("o_totalprice")).alias("lo"),
            r2(F.max("o_totalprice")).alias("hi"),
        )
        .orderBy("bucket")
    )
