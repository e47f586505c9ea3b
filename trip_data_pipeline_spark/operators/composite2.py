"""TPC-H-analog composites, second tranche (SURVEY.md §2.12): the
remaining classic plan shapes expressible over the fixture tables —
two-sided nation volume (Q7), profit rollup (Q9), customer order-count
distribution (Q13), correlated small-quantity average (Q17),
disjunctive join predicates (Q19), multi-EXISTS anti-join chain (Q21),
and a global-average threshold with NOT EXISTS (Q22).

The fixtures lack partsupp / comments / ship-mode columns, so each
analog keeps the reference query's OPTIMIZER SHAPE (the part the 100 TB
design cares about) with predicates adapted to available columns;
adaptations are noted per op.  Parity hygiene per SURVEY.md §5.3:
money rounded 2 dp, date math in integer epoch days, and the Q22
threshold comparison done in exact integer cents cross-multiplied to
avoid a float boundary flip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import bigint, duck_epoch_s, r2
from trip_data_pipeline_spark.registry import op

CAT = "composite queries"


def _day(col: str):
    # unix_date(to_date(..)) is timezone-free on TIMESTAMP_NTZ columns
    # (lineitem/orders dates); matches DuckDB's naive epoch-day floor.
    return F.unix_date(F.to_date(F.col(col))).cast("bigint")


def _duck_day(col: str) -> str:
    return f"({duck_epoch_s(col)} // 86400)"


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@op(
    "q7_nation_volume",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
""",
    category=CAT,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: bidirectional trade volume between two nations
    by ship year.  Supplier/customer/nation dims broadcast; only
    lineitem<->orders shuffles.  The OR-of-pairs predicate is applied
    after both nation joins, exactly like the reference query."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            bigint(F.year(F.col("l_shipdate"))).alias("l_year"),
        )
        .agg(r2(F.sum(_rev())).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@op(
    "q9_profit_by_nation_year",
    oracle="""
SELECT n_name AS nation,
       CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.1 * p_retailprice * l_quantity), 2) AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%5%'
GROUP BY 1, 2 ORDER BY nation, o_year
""",
    category=CAT,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape: product-line profit by supplier nation and
    order year.  Fixtures have no partsupp, so supply cost is proxied
    as 10% of p_retailprice per unit (adaptation noted in module
    docstring); the plan shape is unchanged — three broadcast dims
    (part, supplier, nation) against the lineitem<->orders shuffle
    join, profit expression folded before the partial agg."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%5%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    profit = _rev() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            bigint(F.year(F.col("o_orderdate"))).alias("o_year"),
        )
        .agg(r2(F.sum(profit)).alias("profit"))
        .orderBy("nation", "o_year")
    )


@op(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
""",
    category=CAT,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape: distribution of per-customer order counts,
    including zero-order customers (the LEFT OUTER join with the
    filter INSIDE the join condition — pushing it to WHERE would drop
    them).  Two cascaded aggregations; the second groups on the tiny
    c_count domain so it coalesces to a near-free shuffle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(bigint(F.count("o_orderkey")).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(bigint(F.count(F.lit(1))).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@op(
    "q17_small_quantity_revenue",
    oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#9' AND p_size < 15
  AND l_quantity < (
    SELECT 0.5 * avg(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p_partkey)
""",
    category=CAT,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape: revenue lost if small-quantity orders were
    dropped — a correlated scalar average decorrelated into a per-part
    aggregate joined back to the filtered fact.  The threshold compare
    is exact: l_quantity is integer-valued, so avg = exact-int-sum /
    count is bit-identical on both engines.  (l_container doesn't
    exist in the fixture; p_size < 15 stands in.)"""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#9") & (F.col("p_size") < 15)
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pp")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pp"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(r2(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@op(
    "q19_disjunctive_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
       AND l_quantity BETWEEN 5 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
       AND l_quantity BETWEEN 10 AND 40)
""",
    category=CAT,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 shape: disjunction of conjunctive brand/size/quantity
    predicates across the part join.  Catalyst extracts the common
    l_quantity/ p_size bounds so both scans still get pushed filters
    (the classic Q19 optimization); part broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q, sz, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((b == "Brand#1") & sz.between(1, 10) & q.between(1, 20))
        | ((b == "Brand#2") & sz.between(5, 20) & q.between(5, 30))
        | ((b == "Brand#3") & sz.between(10, 40) & q.between(10, 40))
    )
    return j.filter(cond).agg(r2(F.sum(_rev())).alias("revenue"))


@op(
    "q21_suppliers_kept_waiting",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         {_duck_day('l_shipdate')} AS ship_day
  FROM lineitem
), od AS (
  SELECT o_orderkey, {_duck_day('o_orderdate')} AS order_day
  FROM orders WHERE o_orderstatus = 'F'
), l1 AS (
  SELECT li.* FROM li JOIN od ON l_orderkey = o_orderkey
  WHERE ship_day > order_day + 60
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM li l2 WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l1 l3 WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
""",
    category=CAT,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape: suppliers who were the SOLE late supplier on a
    finished multi-supplier order — EXISTS (another supplier on the
    order) + NOT EXISTS (another LATE supplier) compiling to a
    left-semi + left-anti join chain on l_orderkey.  'Late' is
    ship_day > order_day + 60 in integer epoch days (fixtures have no
    receipt/commit dates).  Both existence probes reuse the same
    shuffle key as the driving join — one partitioning serves all
    three."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _day("l_shipdate").alias("ship_day")
    )
    od = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", _day("o_orderdate").alias("order_day"))
    )
    s = load(spark, sf_dir, "supplier")
    l1 = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .filter(F.col("ship_day") > F.col("order_day") + 60)
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2"))
    l3 = l1.select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3"))
    return (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(bigint(F.count(F.lit(1))).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@op(
    "q22_idle_customer_balance",
    oracle="""
WITH pos AS (
  SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS balc
  FROM customer WHERE c_custkey % 7 IN (1, 3, 5) AND c_acctbal > 0.0
)
SELECT c_custkey % 7 AS bucket,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_custkey % 7 IN (1, 3, 5)
  AND CAST(round(c_acctbal * 100) AS BIGINT) * (SELECT count(*) FROM pos)
      > (SELECT sum(balc) FROM pos)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1 ORDER BY bucket
""",
    category=CAT,
)
def q22_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape: above-average-balance customers with no
    orders, bucketed by a key-derived 'country code' (no c_phone in
    the fixture).  The global-average threshold is evaluated in exact
    integer cents, cross-multiplied (bal_cents * n > sum_cents) so no
    float division can flip a boundary row on either engine.  Plan:
    1-row global agg broadcast into the scan filter + left-anti join
    against orders."""
    c = load(spark, sf_dir, "customer").filter(
        (F.col("c_custkey") % 7).isin(1, 3, 5)
    )
    balc = F.round(F.col("c_acctbal") * 100).cast("bigint")
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(balc).alias("sum_cents"), F.count(F.lit(1)).alias("n_pos")
    )
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey"))
    return (
        c.join(F.broadcast(pos))
        .filter(balc * F.col("n_pos") > F.col("sum_cents"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 7).alias("bucket"))
        .agg(
            bigint(F.count(F.lit(1))).alias("numcust"),
            r2(F.sum("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("bucket")
    )
