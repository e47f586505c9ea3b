"""§2.4 Aggregations (SURVEY.md §2.4).

All hash-aggregates in Spark execute as partial (map-side combine) +
final (post-shuffle) automatically — the §2.4 note's partial/final
requirement is covered by construction.  At 100 TB the shuffle carries
only the grouped partial states (|groups| x |aggs|), not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import as_date, bigint, r2
from trip_data_pipeline_spark.registry import op

CAT = "2.4 aggregation"


@op(
    "agg_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                           AS sum_qty,
  round(sum(l_extendedprice), 2)                                      AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                   AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)     AS sum_charge,
  round(avg(l_quantity), 2)                                           AS avg_qty,
  round(avg(l_extendedprice), 2)                                      AS avg_price,
  round(avg(l_discount), 2)                                           AS avg_disc,
  CAST(count(*) AS BIGINT)                                            AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-01'
GROUP BY l_returnflag, l_linestatus
""",
    category=CAT,
    pure=True,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H-Q1-style) pricing summary — SURVEY.md §2.4 row 1.

    Scan -> filter (pushed to parquet) -> partial+final hash agg.
    Scale note: 3x2 groups means the shuffle moves ~6 partial-state rows
    per map task regardless of input size — this plan is 100-TB-safe.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(as_date(F.col("l_shipdate")) <= F.lit("2000-12-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r2(F.sum("l_quantity")).alias("sum_qty"),
            r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            r2(F.sum(disc_price)).alias("sum_disc_price"),
            r2(F.sum(charge)).alias("sum_charge"),
            r2(F.avg("l_quantity")).alias("avg_qty"),
            r2(F.avg("l_extendedprice")).alias("avg_price"),
            r2(F.avg("l_discount")).alias("avg_disc"),
            bigint(F.count(F.lit(1))).alias("count_order"),
        )
    )


@op(
    "agg_global",
    oracle="""
SELECT
  round(min(l_quantity), 2)        AS min_qty,
  round(max(l_extendedprice), 2)   AS max_price,
  round(sum(l_extendedprice), 2)   AS sum_price,
  CAST(count(*) AS BIGINT)         AS n_rows,
  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
""",
    category=CAT,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-GROUP-BY) aggregate — SURVEY.md §2.4 row 2."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        r2(F.min("l_quantity")).alias("min_qty"),
        r2(F.max("l_extendedprice")).alias("max_price"),
        r2(F.sum("l_extendedprice")).alias("sum_price"),
        bigint(F.count(F.lit(1))).alias("n_rows"),
        bigint(F.countDistinct("l_orderkey")).alias("n_orders"),
    )


@op(
    "agg_count_distinct",
    oracle="""
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
""",
    category=CAT,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group — SURVEY.md §2.4 row 3.

    Spark expands this to a two-phase partial-distinct aggregate (expand
    + two shuffles) — scale-safe without driver materialization.
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(bigint(F.countDistinct("user_id")).alias("n_users"))


@op(
    "agg_multi_distinct",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT)          AS n_users,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
FROM events GROUP BY event_type
""",
    category=CAT,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two distinct aggregates in one grouping — SURVEY.md §2.4 row 4."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        bigint(F.countDistinct("user_id")).alias("n_users"),
        bigint(F.countDistinct(F.to_date("ts"))).alias("n_days"),
    )


@op(
    "agg_stats",
    oracle="""
SELECT event_type,
       round(avg(value), 2)          AS avg_value,
       round(stddev_samp(value), 2)  AS sd_value,
       round(var_samp(value), 2)     AS var_value,
       round(min(value), 2)          AS min_value,
       round(max(value), 2)          AS max_value,
       CAST(count(*) AS BIGINT)      AS n
FROM events GROUP BY event_type
""",
    category=CAT,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (sample stddev/variance) — SURVEY.md §2.4
    row 5; ddof=1 on both sides (§5.3 rule 6)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        r2(F.avg("value")).alias("avg_value"),
        r2(F.stddev_samp("value")).alias("sd_value"),
        r2(F.var_samp("value")).alias("var_value"),
        r2(F.min("value")).alias("min_value"),
        r2(F.max("value")).alias("max_value"),
        bigint(F.count(F.lit(1))).alias("n"),
    )


@op(
    "agg_having",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type
HAVING count(*) > 1900
""",
    category=CAT,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation group filter (HAVING) — SURVEY.md §2.4 row 6."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(bigint(F.count(F.lit(1))).alias("n"))
        .filter(F.col("n") > 1900)
    )


@op(
    "agg_grouping_sets",
    oracle="""
SELECT lang, source,
       CAST(count(*) AS BIGINT)             AS n_docs,
       CAST(GROUPING(lang, source) AS BIGINT) AS gid
FROM documents
GROUP BY GROUPING SETS ((lang, source), (lang), ())
""",
    category=CAT,
    pure=True,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping_id — SURVEY.md §2.4 row 7."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupingSets(
        [["lang", "source"], ["lang"], []], "lang", "source"
    ).agg(
        bigint(F.count(F.lit(1))).alias("n_docs"),
        bigint(F.grouping_id()).alias("gid"),
    )


@op(
    "agg_rollup",
    oracle="""
SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_customers
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    category=CAT,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals — SURVEY.md §2.4 row 8.

    Dims are broadcast (25 / 5 rows) so only the rollup agg shuffles.
    """
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        bigint(F.count(F.lit(1))).alias("n_customers")
    )


@op(
    "agg_cube",
    oracle="""
SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY CUBE (event_type, CAST(ts AS DATE))
""",
    category=CAT,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day) — SURVEY.md §2.4 row 9."""
    ev = load(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    return ev.cube("event_type", "day").agg(bigint(F.count(F.lit(1))).alias("n"))


@op("agg_approx_distinct", oracle=None, category=CAT)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approx distinct — SURVEY.md §2.4 row 10.

    rows-only: sketch estimates differ across engines by design.  At
    100 TB this is THE distinct-count operator (fixed-size sketch vs the
    exact expand+two-shuffle path); rsd pinned for determinism.
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        bigint(F.approx_count_distinct("user_id", 0.02)).alias("approx_users")
    )


@op(
    "agg_conditional",
    oracle="""
SELECT user_id % 10 AS user_bucket,
       round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase_value,
       round(sum(CASE WHEN event_type = 'view' THEN value ELSE 0 END), 2) AS view_value,
       CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_clicks
FROM events GROUP BY user_id % 10
""",
    category=CAT,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (pivot-style) aggregation — SURVEY.md §2.4 row 11."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .agg(
            r2(F.sum(F.when(F.col("event_type") == "purchase", F.col("value")))).alias(
                "purchase_value"
            ),
            r2(
                F.sum(F.when(F.col("event_type") == "view", F.col("value")).otherwise(0.0))
            ).alias("view_value"),
            bigint(F.count(F.when(F.col("event_type") == "click", F.lit(1)))).alias(
                "n_clicks"
            ),
        )
    )
