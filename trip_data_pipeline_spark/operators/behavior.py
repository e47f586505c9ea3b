"""Behavioral / operational analytics tranche: event-sequence Markov
transitions, RFM customer segmentation, Pareto (80/20) concentration,
deadline-bounded conversion, and a multi-table data-quality report.

Parity strategy as elsewhere (SURVEY.md §5.3): timestamps reduced to
integer epoch seconds/days, money quantized to integer cents/milli
before aggregation, every probability/ratio computed as ONE division
of exact integer operands then rounded — so no float path can diverge
between Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import as_date, bigint, epoch_s, r2
from trip_data_pipeline_spark.registry import op

CAT = "lifecycle / sessionless analytics"


@op(
    "events_markov_transition",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n_ab
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT prev_type, sum(n_ab) AS n_a FROM trans GROUP BY prev_type)
SELECT t.prev_type, t.next_type, CAST(n_ab AS BIGINT) AS n_ab,
       round(CAST(n_ab AS DOUBLE) / n_a, 4) AS p
FROM trans t JOIN tot USING (prev_type)
ORDER BY prev_type, next_type
""",
    category=CAT,
)
def events_markov_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: lag() pairs each event with its predecessor (ties broken
    by event_id), bigram counts normalize row-wise into transition
    probabilities.  One user_id-partitioned window shuffle + one tiny
    (|types|²) aggregate; p is a single division of exact integer
    counts, rounded — engine-identical.  The standard first step of
    any clickstream/sequence model at any scale."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    # materialize the bigram counts once: `tot` is derived from the same
    # subtree, and without this the user_id window shuffle runs twice.
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_ab"))
        .localCheckpoint()
    )
    tot = trans.groupBy("prev_type").agg(F.sum("n_ab").alias("n_a"))
    return (
        trans.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            bigint(F.col("n_ab")).alias("n_ab"),
            F.round(F.col("n_ab").cast("double") / F.col("n_a"), 4).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


@op(
    "orders_rfm_segmentation",
    oracle="""
WITH rfm AS (
  SELECT o_custkey,
         max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
           AS last_day,
         count(*) AS freq,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary_cents
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey,
         ntile(5) OVER (ORDER BY last_day DESC, o_custkey)       AS r_score,
         ntile(5) OVER (ORDER BY freq DESC, o_custkey)           AS f_score,
         ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey) AS m_score
  FROM rfm
)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(count(*) AS BIGINT) AS n_customers
FROM scored GROUP BY 1, 2, 3
ORDER BY r_score, f_score, m_score
""",
    category="composite queries",
)
def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency (last order epoch-day),
    frequency (order count), monetary (exact integer cents), each
    quintile-scored with ntile(5), then segment sizes.  Every ntile
    ordering carries the custkey tie-break so ranks are total and
    engine-identical.

    Scale honesty (corrected round 3): an unpartitioned ntile window
    executes as a SINGLE-partition sort — Spark does not range-spread
    window frames the way it does ORDER BY.  That is acceptable here
    only because the windowed input is the per-customer AGGREGATE
    (cardinality ≪ orders); for a customer dimension too big for one
    task, exact ntile requires a global rank (range-repartition +
    per-partition offsets) — the practical form is quantile boundaries
    from percentile_approx with a deterministic tie rule, trading
    exact equal-sized buckets for full parallelism."""
    o = load(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max(F.unix_date(as_date(F.col("o_orderdate")))).alias("last_day"),
        F.count("*").alias("freq"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "monetary_cents"
        ),
    )
    w = Window.partitionBy()
    scored = rfm.select(
        F.ntile(5)
        .over(w.orderBy(F.col("last_day").desc(), "o_custkey"))
        .alias("r_score"),
        F.ntile(5).over(w.orderBy(F.col("freq").desc(), "o_custkey")).alias("f_score"),
        F.ntile(5)
        .over(w.orderBy(F.col("monetary_cents").desc(), "o_custkey"))
        .alias("m_score"),
    )
    return (
        scored.groupBy(
            bigint(F.col("r_score")).alias("r_score"),
            bigint(F.col("f_score")).alias("f_score"),
            bigint(F.col("m_score")).alias("m_score"),
        )
        .agg(bigint(F.count("*")).alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )


@op(
    "supplier_pareto_8020",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000) AS BIGINT))
           AS rev_milli
  FROM lineitem GROUP BY l_suppkey
),
ranked AS (
  SELECT l_suppkey, rev_milli,
         sum(rev_milli) OVER (ORDER BY rev_milli DESC, l_suppkey
                              ROWS UNBOUNDED PRECEDING) AS cum_milli,
         sum(rev_milli) OVER ()                         AS total_milli,
         row_number()  OVER (ORDER BY rev_milli DESC, l_suppkey) AS rk
  FROM rev
)
SELECT CAST(count(*) AS BIGINT) AS n_head_suppliers,
       CAST((SELECT count(*) FROM rev) AS BIGINT) AS n_suppliers,
       round(sum(rev_milli) / 1000.0, 2) AS head_revenue,
       round(max(total_milli) / 1000.0, 2) AS total_revenue
FROM ranked
WHERE (cum_milli - rev_milli) * 10 < total_milli * 8
""",
    category="composite queries",
)
def supplier_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: the smallest head set of suppliers whose
    cumulative revenue reaches 80% of total.  Revenue is quantized to
    integer milli-units per line BEFORE summing; the 80% membership
    test is the integer cross-multiplication `(cum - own)*10 <
    total*8` — keep a supplier iff the revenue BEFORE it hasn't
    reached 80% — so no float threshold exists anywhere.  One groupBy
    shuffle + one global sort over the supplier aggregate (tiny
    relative to lineitem at every scale)."""
    li = load(spark, sf_dir, "lineitem")
    rev_milli = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000
    ).cast("bigint")
    rev = li.groupBy("l_suppkey").agg(F.sum(rev_milli).alias("rev_milli"))
    w_ord = (
        Window.partitionBy()
        .orderBy(F.col("rev_milli").desc(), "l_suppkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy()
    ranked = rev.select(
        "rev_milli",
        F.sum("rev_milli").over(w_ord).alias("cum_milli"),
        F.sum("rev_milli").over(w_all.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).alias("total_milli"),
    )
    n_suppliers = rev.agg(F.count("*").alias("n_suppliers"))
    return (
        ranked.filter(
            (F.col("cum_milli") - F.col("rev_milli")) * 10 < F.col("total_milli") * 8
        )
        .agg(
            bigint(F.count("*")).alias("n_head_suppliers"),
            r2(F.sum("rev_milli") / 1000.0).alias("head_revenue"),
            r2(F.max("total_milli") / 1000.0).alias("total_revenue"),
        )
        .crossJoin(F.broadcast(n_suppliers))
        .select(
            "n_head_suppliers",
            bigint(F.col("n_suppliers")).alias("n_suppliers"),
            "head_revenue",
            "total_revenue",
        )
    )


DEADLINE_S = 86_400  # convert within 24h of first signup


@op(
    "conversion_time_bounded",
    oracle=f"""
WITH s AS (
  SELECT user_id, min(epoch_us(ts) // 1000000) AS t0
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT e.user_id, min(epoch_us(e.ts) // 1000000) AS t1
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase'
    AND (epoch_us(e.ts) // 1000000) >= s.t0
  GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup,
       CAST(count(*) AS BIGINT)                 AS n_converted_24h,
       CAST(min(t1 - t0) AS BIGINT)             AS min_lag_s,
       CAST(max(t1 - t0) AS BIGINT)             AS max_lag_s,
       CAST(sum(t1 - t0) AS BIGINT)             AS total_lag_s
FROM s JOIN p USING (user_id)
WHERE t1 - t0 <= {DEADLINE_S}
""",
    category=CAT,
)
def conversion_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deadline-bounded conversion: users whose first at-or-after-
    signup purchase lands within 24h, with min/max/total lag.  Two
    grouped mins over the same user_id shuffle key joined once; the
    deadline and all lag stats are integer epoch-second arithmetic
    (sum instead of avg so the output stays exact — callers divide).
    Complements `funnel_conversion` (ordered stages, unbounded) with
    the time-window semantics attribution systems need."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_s("ts").alias("s")
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("s").alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("s") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("s").alias("t1"))
    )
    n_signup = s.agg(F.count("*").alias("n_signup"))
    return (
        s.join(p, "user_id")
        .filter(F.col("t1") - F.col("t0") <= DEADLINE_S)
        .agg(
            bigint(F.count("*")).alias("n_converted_24h"),
            bigint(F.min(F.col("t1") - F.col("t0"))).alias("min_lag_s"),
            bigint(F.max(F.col("t1") - F.col("t0"))).alias("max_lag_s"),
            bigint(F.sum(F.col("t1") - F.col("t0"))).alias("total_lag_s"),
        )
        .crossJoin(F.broadcast(n_signup))
        .select(
            bigint(F.col("n_signup")).alias("n_signup"),
            "n_converted_24h",
            "min_lag_s",
            "max_lag_s",
            "total_lag_s",
        )
    )


@op(
    "dq_expectations_report",
    oracle="""
SELECT 'lineitem_orphan_orderkey' AS check_name, CAST(count(*) AS BIGINT) AS n_violations
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem_nonpositive_price', CAST(count(*) AS BIGINT)
FROM lineitem WHERE l_extendedprice <= 0
UNION ALL
SELECT 'lineitem_discount_range', CAST(count(*) AS BIGINT)
FROM lineitem WHERE l_discount < 0 OR l_discount > 1
UNION ALL
SELECT 'orders_null_custkey', CAST(count(*) AS BIGINT)
FROM orders WHERE o_custkey IS NULL
UNION ALL
SELECT 'orders_orphan_custkey', CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'customer_dup_custkey', CAST(coalesce(sum(n - 1), 0) AS BIGINT)
FROM (SELECT c_custkey, count(*) AS n FROM customer GROUP BY c_custkey HAVING count(*) > 1)
UNION ALL
SELECT 'events_negative_value', CAST(count(*) AS BIGINT)
FROM events WHERE value < 0
ORDER BY check_name
""",
    category="extras (round-1 additions)",
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations-style data-quality report: referential orphans
    (anti joins), domain-range violations, null keys, duplicate keys,
    one row per check.  Each check is an independent narrow aggregate
    (the anti joins broadcast their key side when small, shuffle on the
    key otherwise), unioned at the end — embarrassingly parallel at
    any scale, and the natural pre-flight gate before a pipeline
    publishes."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    ev = load(spark, sf_dir, "events")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.agg(bigint(F.count("*")).alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    orphan_li = li.join(
        o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti"
    )
    orphan_o = o.join(
        F.broadcast(c.select("c_custkey")), o.o_custkey == c.c_custkey, "left_anti"
    )
    dup_c = (
        c.groupBy("c_custkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(bigint(F.coalesce(F.sum(F.col("n") - 1), F.lit(0))).alias("n_violations"))
        .select(F.lit("customer_dup_custkey").alias("check_name"), "n_violations")
    )
    report = (
        check("lineitem_orphan_orderkey", orphan_li)
        .unionAll(check("lineitem_nonpositive_price", li.filter(F.col("l_extendedprice") <= 0)))
        .unionAll(
            check(
                "lineitem_discount_range",
                li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
            )
        )
        .unionAll(check("orders_null_custkey", o.filter(F.col("o_custkey").isNull())))
        .unionAll(check("orders_orphan_custkey", orphan_o))
        .unionAll(dup_c)
        .unionAll(check("events_negative_value", ev.filter(F.col("value") < 0)))
    )
    return report.orderBy("check_name")
