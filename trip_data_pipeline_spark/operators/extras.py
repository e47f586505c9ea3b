"""Round-1 coverage extensions beyond the SURVEY.md §2 inventory:
the reference-shaped anonymization pipeline, table profiling, ordered/
positional aggregates, pivot/unpivot, SCD2 merge emulation, extra sink
formats, bucketed co-located joins, and a stream-static join.

Each op keeps the same contract as §2 rows: hash-checked against a
DuckDB oracle where expressible, rows-only otherwise.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import bigint, r2, r4, scratch_dir
from trip_data_pipeline_spark.registry import op
from trip_data_pipeline_spark.streaming import read_events_stream, run_to_memory

CAT = "extras (round-1 additions)"


@op(
    "pipeline_anonymize_trips",
    oracle="""
SELECT event_id,
       substring(sha256(CAST(user_id AS VARCHAR)), 1, 16) AS uid_hash,
       CAST((epoch_us(ts) // 1000000)
            - (epoch_us(ts) // 1000000) % 900 AS BIGINT)  AS bucket_s,
       floor(value * 10) / 10                              AS value_reduced,
       event_type
FROM events
WHERE value > 0
""",
    category=CAT,
)
def pipeline_anonymize_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline's characteristic end-to-end record flow
    (SURVEY.md §3.1), composed from §2 operators: validate (filter) ->
    anonymize ids (hash + truncate) -> reduce temporal precision
    (15-min bucket) -> reduce value precision (floor to 1 dp) ->
    publish projection.  One scan, one narrow projection — the whole
    anonymization pass is a single codegen stage at any scale."""
    ev = load(spark, sf_dir, "events")
    s = F.expr("(unix_micros(ts) div 1000000)")
    return ev.filter(F.col("value") > 0).select(
        "event_id",
        F.substring(F.sha2(F.col("user_id").cast("string"), 256), 1, 16).alias(
            "uid_hash"
        ),
        bigint(s - s % 900).alias("bucket_s"),
        (F.floor(F.col("value") * 10) / 10).alias("value_reduced"),
        "event_type",
    )


@op(
    "profile_table",
    oracle="""
SELECT 'l_quantity' AS col_name,
       CAST(count(*) - count(l_quantity) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT l_quantity) AS BIGINT)   AS n_distinct,
       round(min(l_quantity), 2)  AS min_num,
       round(max(l_quantity), 2)  AS max_num
FROM lineitem
UNION ALL
SELECT 'l_extendedprice',
       CAST(count(*) - count(l_extendedprice) AS BIGINT),
       CAST(count(DISTINCT l_extendedprice) AS BIGINT),
       round(min(l_extendedprice), 2), round(max(l_extendedprice), 2)
FROM lineitem
UNION ALL
SELECT 'l_returnflag',
       CAST(count(*) - count(l_returnflag) AS BIGINT),
       CAST(count(DISTINCT l_returnflag) AS BIGINT),
       NULL, NULL
FROM lineitem
""",
    category=CAT,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling op: null/distinct/min/max per column in ONE scan
    (the three per-column aggregates are computed side by side, then
    unpivoted — not three scans)."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.agg(
        bigint(F.count(F.lit(1)) - F.count("l_quantity")).alias("q_nulls"),
        bigint(F.countDistinct("l_quantity")).alias("q_distinct"),
        r2(F.min("l_quantity")).alias("q_min"),
        r2(F.max("l_quantity")).alias("q_max"),
        bigint(F.count(F.lit(1)) - F.count("l_extendedprice")).alias("p_nulls"),
        bigint(F.countDistinct("l_extendedprice")).alias("p_distinct"),
        r2(F.min("l_extendedprice")).alias("p_min"),
        r2(F.max("l_extendedprice")).alias("p_max"),
        bigint(F.count(F.lit(1)) - F.count("l_returnflag")).alias("r_nulls"),
        bigint(F.countDistinct("l_returnflag")).alias("r_distinct"),
    )
    return agg.selectExpr(
        """stack(3,
             'l_quantity',      q_nulls, q_distinct, q_min, q_max,
             'l_extendedprice', p_nulls, p_distinct, p_min, p_max,
             'l_returnflag',    r_nulls, r_distinct, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
           ) AS (col_name, n_nulls, n_distinct, min_num, max_num)"""
    )


@op(
    "agg_max_by_min_by",
    oracle="""
WITH e AS (SELECT event_type, event_id, value,
                  CAST(round(value * 100) AS BIGINT) * 10000000 + event_id AS ord
           FROM events)
SELECT event_type,
       CAST(arg_max(event_id, ord) AS BIGINT) AS top_event_id,
       CAST(arg_min(event_id, ord) AS BIGINT) AS bottom_event_id
FROM e GROUP BY event_type
""",
    category=CAT,
)
def agg_max_by_min_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional aggregates max_by/min_by (DuckDB arg_max/arg_min) —
    the ordering key embeds event_id so value ties are broken totally
    (§5.3 rule 7)."""
    ev = load(spark, sf_dir, "events")
    ordc = F.round(F.col("value") * 100, 0).cast("bigint") * 10000000 + F.col(
        "event_id"
    )
    e = ev.select("event_type", "event_id", ordc.alias("ord"))
    return e.groupBy("event_type").agg(
        bigint(F.max_by("event_id", F.col("ord"))).alias("top_event_id"),
        bigint(F.min_by("event_id", F.col("ord"))).alias("bottom_event_id"),
    )


@op(
    "agg_collect_sorted",
    oracle="""
SELECT user_id, array_to_string(list_sort(list(DISTINCT event_type)), ',')
                AS types
FROM events GROUP BY user_id
""",
    category=CAT,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-building aggregate with deterministic order:
    sort_array(collect_set(...)) — §5.3 rule 7 forbids hashing raw
    collect_list order.  Projected comma-joined: the driver's pandas
    canonicalizer cannot sort raw ArrayType cells (CORRECTNESS_r03)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types")
    )


@op(
    "agg_percentile_exact",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90
FROM events GROUP BY event_type
""",
    category=CAT,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles: Spark percentile == DuckDB
    quantile_cont (both linear interpolation on the sorted set)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        r4(F.percentile("value", 0.5)).alias("p50"),
        r4(F.percentile("value", 0.9)).alias("p90"),
    )


@op("agg_percentile_approx", oracle=None, category=CAT)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile sketch (rows-only: sketch values are
    engine-specific).  At 100 TB this replaces the exact sort-based
    percentile: bounded-memory KLL/GK sketch, one shuffle of sketches."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_percentile("value", 0.5, 10000).alias("p50_approx"),
        F.approx_percentile("value", 0.9, 10000).alias("p90_approx"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@op(
    "pivot_wide",
    oracle="""
SELECT user_id % 10 AS user_bucket,
       round(sum(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
       round(sum(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
       round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
       round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
       round(sum(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
FROM events GROUP BY 1
""",
    category=CAT,
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot with an explicit value list (no discovery scan) — wide
    conditional aggregation."""
    ev = load(spark, sf_dir, "events")
    piv = (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", _EVENT_TYPES)
        .agg(r2(F.sum("value")))
    )
    return piv


@op(
    "unpivot_stack",
    oracle="""
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
UNION ALL
SELECT p_partkey, 'price', p_retailprice FROM part
""",
    category=CAT,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot via stack() — wide-to-long reshaping."""
    p = load(spark, sf_dir, "part")
    return p.selectExpr(
        "p_partkey",
        "stack(2, 'size', CAST(p_size AS DOUBLE), 'price', p_retailprice) AS (metric, val)",
    )


@op(
    "scd2_merge_emulation",
    oracle="""
WITH updates AS (
  SELECT c_custkey, c_acctbal + 100 AS new_bal
  FROM customer WHERE c_custkey % 10 = 0
)
SELECT c_custkey, round(c_acctbal, 2) AS acctbal, 1 AS version, FALSE AS is_current
FROM customer WHERE c_custkey % 10 = 0
UNION ALL
SELECT c_custkey, round(new_bal, 2), 2, TRUE FROM updates
UNION ALL
SELECT c_custkey, round(c_acctbal, 2), 1, TRUE
FROM customer WHERE c_custkey % 10 <> 0
""",
    category=CAT,
)
def scd2_merge_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 MERGE emulation without Delta (task-brief CDC/SCD2 note):
    close out matched current rows, append new versions, pass through
    unmatched — expressed as semi/anti joins + union, the plan a MERGE
    INTO would produce on a non-transactional store."""
    c = load(spark, sf_dir, "customer")
    updates = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", (F.col("c_acctbal") + 100).alias("new_bal")
    )
    closed = (
        c.join(updates, "c_custkey", "left_semi")
        .select(
            "c_custkey",
            r2(F.col("c_acctbal")).alias("acctbal"),
            F.lit(1).alias("version"),
            F.lit(False).alias("is_current"),
        )
    )
    fresh = updates.select(
        "c_custkey",
        r2(F.col("new_bal")).alias("acctbal"),
        F.lit(2).alias("version"),
        F.lit(True).alias("is_current"),
    )
    untouched = (
        c.join(updates, "c_custkey", "left_anti")
        .select(
            "c_custkey",
            r2(F.col("c_acctbal")).alias("acctbal"),
            F.lit(1).alias("version"),
            F.lit(True).alias("is_current"),
        )
    )
    return closed.unionByName(fresh).unionByName(untouched)


@op(
    "sink_json_roundtrip",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
""",
    category=CAT,
)
def sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON lines publish + schema-on-read ingest round trip.

    Hash-checked since round 3: the JSON cycle is lossless for these
    types, so the post-roundtrip aggregate must equal the same
    aggregate on the source table."""
    out = scratch_dir(prefix="sink_json_")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    o.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double"
    ).json(out)
    return back.agg(
        bigint(F.count(F.lit(1))).alias("n"),
        r2(F.sum("o_totalprice")).alias("total"),
    )


@op(
    "sink_orc_roundtrip",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands,
       round(sum(p_retailprice), 2) AS total_price
FROM part
""",
    category=CAT,
)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC publish + ingest round trip — second columnar format
    besides parquet.  Hash-checked since round 3: ORC round-trips
    losslessly, so the post-roundtrip aggregate must equal the
    source-table aggregate."""
    out = scratch_dir(prefix="sink_orc_")
    p = load(spark, sf_dir, "part")
    p.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.agg(
        bigint(F.count(F.lit(1))).alias("n"),
        bigint(F.countDistinct("p_brand")).alias("n_brands"),
        r2(F.sum("p_retailprice")).alias("total_price"),
    )


def bucketed_join_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders/customer bucketed+sorted by the join key, return
    the join of the two bucketed tables (used by the operator and by
    the no-Exchange plan assertion in tests)."""
    suffix = uuid.uuid4().hex[:8]
    base = scratch_dir(prefix="bucketed_")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    ot, ct = f"orders_b_{suffix}", f"customer_b_{suffix}"
    (
        o.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", f"{base}/{ot}")
        .mode("overwrite")
        .saveAsTable(ot)
    )
    (
        c.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", f"{base}/{ct}")
        .mode("overwrite")
        .saveAsTable(ct)
    )
    ob, cb = spark.table(ot), spark.table(ct)
    # At fixture scale the optimizer would (rightly) broadcast the
    # small side; the merge hint forces the sort-merge path so the
    # bucketed no-shuffle property is observable — at 100 TB neither
    # side broadcasts and this IS the chosen plan.
    return ob.hint("merge").join(cb, ob.o_custkey == cb.c_custkey)


@op(
    "join_bucketed_colocated",
    oracle="""
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
""",
    category=CAT,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join.  Hash-checked since round 3: the
    bucketed-table join must produce exactly the rows of the plain
    join on the source tables — bucketing changes the physical plan
    (no Exchange), never the result.

    Writes orders and customer bucketed by the join key
    (bucketBy(8, custkey) + sortBy), then joins the two bucketed
    tables: Spark plans a sort-merge join with NO Exchange on either
    side (asserted in tests/test_properties.py) — the 100 TB pattern
    for repeated joins on a stable key: pay the shuffle once at write
    time, never at read time."""
    joined = bucketed_join_df(spark, sf_dir)
    return joined.groupBy("c_mktsegment").agg(
        bigint(F.count(F.lit(1))).alias("n_orders"),
        r2(F.sum("o_totalprice")).alias("total"),
    )


@op(
    "stream_static_join",
    oracle="""
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2)     AS total_value
FROM events
JOIN customer ON c_custkey = user_id
WHERE ts IS NOT NULL
GROUP BY c_mktsegment
""",
    category=CAT,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events stream enriched with a broadcast
    dimension, then aggregated — the canonical streaming enrichment
    shape (dim re-read per micro-batch; broadcast, no stream-side
    shuffle for the join).  user_id 0..149 joins customer c_custkey
    1:1.  Final counts equal the batch join, so it hash-checks."""
    ev = read_events_stream(spark, sf_dir)
    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey)
    agg = (
        joined.withWatermark("ts", "1 hour")
        .groupBy("c_mktsegment")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_events"),
            r2(F.sum("value")).alias("total_value"),
        )
    )
    return run_to_memory(agg, "complete")


@op(
    "sql_api_query",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(avg(o_totalprice), 2) AS avg_price
FROM orders
WHERE o_orderstatus <> 'P'
GROUP BY o_orderpriority
""",
    category=CAT,
)
def sql_api_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql string entry point (SURVEY.md §3.2): temp view +
    ANSI SQL — Catalyst produces the same plan as the DSL; registered
    once to cover the SQL-API capability row."""
    view = f"orders_v_{uuid.uuid4().hex[:8]}"
    load(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(avg(o_totalprice), 2) AS avg_price
        FROM {view}
        WHERE o_orderstatus <> 'P'
        GROUP BY o_orderpriority
        """
    )


@op(
    "agg_string_concat_sorted",
    oracle="""
SELECT n_nationkey,
       string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segs
FROM nation
JOIN customer ON c_nationkey = n_nationkey
WHERE c_custkey <= 200
GROUP BY n_nationkey
ORDER BY n_nationkey
""",
    category=CAT,
)
def agg_string_concat_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg semantics) made
    deterministic: collect_list -> sort_array -> concat_ws, so the
    result is order-independent of partitioning — the only way a
    distributed string_agg can be reproducible."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_nationkey")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list("c_mktsegment"))
            ).alias("segs")
        )
        .orderBy("n_nationkey")
    )


@op(
    "agg_bitwise",
    oracle="""
SELECT l_linestatus,
       bit_and(CAST(l_orderkey % 4096 AS BIGINT)) AS b_and,
       bit_or(CAST(l_orderkey % 4096 AS BIGINT))  AS b_or,
       bit_xor(CAST(l_orderkey % 4096 AS BIGINT)) AS b_xor
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    category=CAT,
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_and/bit_or/bit_xor) — order- and
    partition-insensitive folds, so they distribute with plain
    partial+final aggregation."""
    li = load(spark, sf_dir, "lineitem")
    k = (F.col("l_orderkey") % 4096).cast("bigint")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.bit_and(k).alias("b_and"),
            F.bit_or(k).alias("b_or"),
            F.bit_xor(k).alias("b_xor"),
        )
        .orderBy("l_linestatus")
    )


@op(
    "agg_median_mode",
    oracle="""
WITH counts AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS n
  FROM customer GROUP BY c_nationkey, c_mktsegment
),
modes AS (
  SELECT c_nationkey, c_mktsegment AS mode_seg,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY n DESC, c_mktsegment) AS rn
  FROM counts
)
SELECT c.c_nationkey,
       CAST(median(CAST(round(c.c_acctbal * 100) AS BIGINT)) * 2 AS BIGINT)
           AS med_bal_halfcents,
       any_value(m.mode_seg)         AS mode_seg
FROM customer c
JOIN modes m ON m.c_nationkey = c.c_nationkey AND m.rn = 1
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""",
    category=CAT,
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (= percentile 0.5, linear interpolation — same rule
    as DuckDB's quantile_cont) plus a DETERMINISTIC mode: built-in
    mode() breaks ties arbitrarily, so ties are broken by
    (count DESC, value ASC) via max_by over a struct — reproducible
    across partitionings, which a distributed mode must be.

    The median is computed in integer CENTS and reported x2
    (half-cent units): even-count groups interpolate to k+0.5 cents,
    which doubled is exact in int64 — no float round-off to disagree
    on.  Rounding the interpolated double instead fails at sf0.1
    (x.xx5 boundaries round differently per engine — §5.3 rule 1's
    float-origin caveat, found by the sf0.1 gate)."""
    c = load(spark, sf_dir, "customer")
    counts = c.groupBy("c_nationkey", "c_mktsegment").agg(F.count("*").alias("n"))
    # min over (-n, segment): highest count first, then smallest value
    modes = counts.groupBy("c_nationkey").agg(
        F.expr("min_by(c_mktsegment, struct(-n, c_mktsegment))").alias("mode_seg")
    )
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    med = c.groupBy("c_nationkey").agg(
        (F.median(cents) * 2).cast("bigint").alias("med_bal_halfcents")
    )
    return (
        med.join(modes, "c_nationkey")
        .select("c_nationkey", "med_bal_halfcents", "mode_seg")
        .orderBy("c_nationkey")
    )


@op(
    "lateral_correlated_topk",
    oracle="""
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
     LATERAL (SELECT c_name, c_acctbal FROM customer
              WHERE c_nationkey = n.n_nationkey
              ORDER BY c_acctbal DESC, c_name LIMIT 2) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
""",
    category=CAT,
)
def lateral_correlated_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL API): per-nation top-2
    customers by balance.  Catalyst decorrelates the LATERAL into a
    window-rank under the hood — same plan family as win_topk_per_group
    but exercising the LATERAL front-end path."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("_lat_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM _lat_nation n,
             LATERAL (SELECT c_name, c_acctbal FROM _lat_customer
                      WHERE c_nationkey = n.n_nationkey
                      ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
        """
    )


@op("agg_hll_sketch", oracle=None, category=CAT)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Datasketches): per-type user sketches via
    hll_sketch_agg, then hll_union_agg folds them to a global estimate —
    the re-aggregatable rollup pattern (store sketches per partition,
    union at query time) that exact count-distinct can't do at scale.
    Rows-only: sketch estimates are engine-specific; the companion
    property test bounds the error vs the exact count."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        bigint(F.count_distinct("user_id")).alias("exact_users"),
    )
    per_type.createOrReplaceTempView("_hll_per_type")
    return spark.sql(
        """
        SELECT event_type,
               CAST(hll_sketch_estimate(sk) AS BIGINT) AS approx_users,
               exact_users
        FROM _hll_per_type
        UNION ALL
        SELECT '_all', CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT),
               CAST(NULL AS BIGINT)
        FROM _hll_per_type
        ORDER BY event_type
        """
    )


@op(
    "regexp_extract_all_freq",
    oracle="""
SELECT tok AS num_token, CAST(count(*) AS BIGINT) AS freq
FROM (SELECT unnest(regexp_extract_all(text, '[a-z]{5,}')) AS tok
      FROM documents)
GROUP BY tok
ORDER BY freq DESC, num_token
LIMIT 20
""",
    category=CAT,
)
def regexp_extract_all_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all -> explode -> frequency: the extract-all-
    matches path (vs str_regexp's single-group extract).  Stays in
    whole-stage codegen; explode volume is bounded by matches/doc."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(r"[a-z]{5,}"), 0)
            ).alias("num_token")
        )
        .groupBy("num_token")
        .agg(bigint(F.count("*")).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("num_token"))
        .limit(20)
    )


@op(
    "agg_corr_regr",
    oracle="""
SELECT l_returnflag,
       round(corr(l_extendedprice, l_quantity), 4)           AS corr_price_qty,
       round(covar_samp(l_extendedprice, l_quantity), 2)     AS covar_s,
       round(covar_pop(l_extendedprice, l_quantity), 2)      AS covar_p,
       round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
""",
    category=CAT,
)
def agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates: correlation, covariance
    (sample+population), and simple linear regression slope/intercept,
    per group.  All are one-pass partial-aggregatable moments (sum,
    sum^2, cross-sum) so the shuffle carries O(groups) state — the
    same plan shape as agg_stats, just wider moment vectors.  Both
    engines use (y, x) argument order for regr_*."""
    li = load(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        r4(F.corr(y, x)).alias("corr_price_qty"),
        r2(F.covar_samp(y, x)).alias("covar_s"),
        r2(F.covar_pop(y, x)).alias("covar_p"),
        r4(F.regr_slope(y, x)).alias("slope"),
        r2(F.regr_intercept(y, x)).alias("intercept"),
        bigint(F.regr_count(y, x)).alias("n"),
    )


@op(
    "agg_percentile_disc",
    oracle="""
WITH t AS (
  SELECT event_type, value,
         cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
  FROM events WHERE value IS NOT NULL
)
SELECT event_type,
       min(CASE WHEN cd >= 0.5 THEN value END) AS p50_disc,
       min(CASE WHEN cd >= 0.9 THEN value END) AS p90_disc
FROM t GROUP BY event_type
""",
    category=CAT,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (smallest value whose cume_dist >= p — the
    SQL-standard PERCENTILE_DISC definition, which the oracle spells
    out via cume_dist so no engine-specific quantile interpolation is
    involved).  Returns actual data values, so no rounding is needed:
    the selected doubles are bit-identical across engines.

    NULL values are filtered BEFORE the groupBy to mirror the oracle's
    WHERE value IS NOT NULL (ADVICE r8): relying on percentile_disc's
    implicit NULL-skip alone is asymmetric — a group whose values are
    all NULL would emit a (type, NULL, NULL) row here but no row at
    all in the oracle.  With the symmetric filter such groups vanish
    identically on both sides."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50_disc"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").alias("p90_disc"),
    )


@op(
    "agg_boolean_countif",
    oracle="""
SELECT event_type,
       bool_and(value > 0)                    AS all_positive,
       bool_or(value > 100)                   AS any_large,
       CAST(count_if(value > 50) AS BIGINT)   AS n_over_50,
       CAST(count_if(value IS NULL) AS BIGINT) AS n_null
FROM events GROUP BY event_type
""",
    category=CAT,
)
def agg_boolean_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional-count aggregates (bool_and / bool_or /
    count_if) — data-quality assertion primitives, all partial-
    aggregatable to 1-bit/1-long state per group."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    return ev.groupBy("event_type").agg(
        F.bool_and(v > 0).alias("all_positive"),
        F.bool_or(v > 100).alias("any_large"),
        bigint(F.count_if(v > 50)).alias("n_over_50"),
        bigint(F.count_if(v.isNull())).alias("n_null"),
    )


@op(
    "text_pii_redact",
    oracle="""
SELECT event_id,
       regexp_replace(props, '[0-9]+', '#', 'g') AS props_redacted,
       CAST(length(props) - length(regexp_replace(props, '[0-9]', '', 'g'))
            AS BIGINT) AS n_digits_masked
FROM events WHERE event_id % 211 = 0
""",
    category=CAT,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern-based redaction: every digit run in the semi-structured
    props payload is masked to '#', with a per-record count of masked
    characters — the anonymize-before-publish step of a training-data
    pipeline (cf. pipeline_anonymize_trips for the hash/bucket form).
    Map-only whole-stage-codegen regexes; the sampled key filter is
    pushed to the scan."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 211 == 0)
    return ev.select(
        "event_id",
        F.regexp_replace("props", "[0-9]+", "#").alias("props_redacted"),
        bigint(
            F.length("props") - F.length(F.regexp_replace("props", "[0-9]", ""))
        ).alias("n_digits_masked"),
    )
