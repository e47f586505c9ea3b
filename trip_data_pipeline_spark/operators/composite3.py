"""TPC-H-analog composites, third tranche: the five queries that need
a part-supplier inventory table (Q2, Q11, Q15, Q16, Q20).

The fixtures have no partsupp, so these ops derive one DETERMINISTICALLY
from the observed (l_partkey, l_suppkey) pairs, with integer-arithmetic
supply cost / available quantity so both engines compute bit-identical
values:

    ps_supplycost_cents = (l_partkey*31 + l_suppkey*7) % 10000 + 100
    ps_availqty         = (l_partkey*17 + l_suppkey*13) % 1000 + 1

Every threshold/extremum comparison that TPC-H does on money is done
here in exact integers (cents / milli-revenue), per SURVEY.md §5.3's
exact-grid rule, so no float boundary can flip a row cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import bigint, r2
from trip_data_pipeline_spark.registry import op

CAT = "composite queries"

_DUCK_PARTSUPP = """
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         (l_partkey * 31 + l_suppkey * 7) % 10000 + 100 AS ps_supplycost_cents,
         (l_partkey * 17 + l_suppkey * 13) % 1000 + 1   AS ps_availqty
  FROM lineitem
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pk, sk = F.col("ps_partkey"), F.col("ps_suppkey")
    return (
        li.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
        .select(
            "ps_partkey",
            "ps_suppkey",
            ((pk * 31 + sk * 7) % 10000 + 100).alias("ps_supplycost_cents"),
            ((pk * 17 + sk * 13) % 1000 + 1).alias("ps_availqty"),
        )
    )


@op(
    "q2_min_cost_supplier",
    oracle=f"""
WITH partsupp AS ({_DUCK_PARTSUPP})
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       round(ps_supplycost_cents / 100.0, 2) AS supplycost
FROM part, supplier, partsupp, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size = 15 AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
  AND ps_supplycost_cents = (
    SELECT min(ps_supplycost_cents)
    FROM partsupp ps2, supplier s2, nation n2, region r2
    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
      AND s2.s_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
""",
    category=CAT,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape: cheapest regional supplier per part — a
    correlated MIN subquery decorrelated into a per-part aggregate
    joined back on (partkey, exact integer cost).  Dims broadcast;
    the partsupp view is derived (module docstring) so the extremum
    compare is exact integer cents."""
    ps = _partsupp(spark, sf_dir)
    p = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    regional = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    min_cost = regional.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_supplycost_cents").alias("min_cents")
    )
    return (
        regional.join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .join(
            min_cost,
            (F.col("ps_partkey") == F.col("mk"))
            & (F.col("ps_supplycost_cents") == F.col("min_cents")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            r2(F.col("ps_supplycost_cents") / 100.0).alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@op(
    "q11_important_stock",
    oracle=f"""
WITH partsupp AS ({_DUCK_PARTSUPP}),
scoped AS (
  SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS value_cents
  FROM partsupp, supplier, nation
  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
)
SELECT ps_partkey, round(sum(value_cents) / 100.0, 2) AS value
FROM scoped
GROUP BY ps_partkey
HAVING sum(value_cents) * 1000 > (SELECT sum(value_cents) FROM scoped)
ORDER BY value DESC, ps_partkey LIMIT 100
""",
    category=CAT,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 shape: parts whose scoped inventory value exceeds
    1/1000 of the total — a HAVING against a global scalar aggregate.
    The fraction test is cross-multiplied in exact integer cents
    (sum*1000 > total), so no float division; the 1-row global agg
    broadcasts into the HAVING filter."""
    ps = _partsupp(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11")
    )
    scoped = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("value_cents"),
        )
    )
    total = scoped.agg(F.sum("value_cents").alias("total_cents"))
    return (
        scoped.groupBy("ps_partkey")
        .agg(F.sum("value_cents").alias("part_cents"))
        .join(F.broadcast(total))
        .filter(F.col("part_cents") * 1000 > F.col("total_cents"))
        .select("ps_partkey", r2(F.col("part_cents") / 100.0).alias("value"))
        .orderBy(F.col("value").desc(), "ps_partkey")
        .limit(100)
    )


@op(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000) AS BIGINT))
           AS total_revenue_milli
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       round(total_revenue_milli / 1000.0, 2) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue_milli = (SELECT max(total_revenue_milli) FROM revenue)
ORDER BY s_suppkey
""",
    category=CAT,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape: supplier(s) with maximum windowed revenue — the
    view + global-MAX-subquery pattern.  Per-line revenue is quantized
    to exact integer milli-units BEFORE summing (identical IEEE product
    then identical round on both engines), so the max-equality join
    cannot be flipped by sum-order float noise."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    rev_milli = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000
    ).cast("bigint")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev_milli).alias("total_revenue_milli")
    )
    mx = revenue.agg(F.max("total_revenue_milli").alias("mx"))
    s = load(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue_milli") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            r2(F.col("total_revenue_milli") / 1000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@op(
    "q16_supplier_count",
    oracle=f"""
WITH partsupp AS ({_DUCK_PARTSUPP})
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#9' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                         WHERE s_name LIKE '%7%')
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 100
""",
    category=CAT,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape: distinct supplier counts per excluded-filter
    part group, with a NOT IN supplier blacklist compiling to a
    broadcast left-anti join (the blacklist is provably non-null here,
    so NOT IN == anti join)."""
    ps = _partsupp(spark, sf_dir)
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7%"))
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(bigint(F.count_distinct("ps_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(100)
    )


@op(
    "q20_excess_stock_suppliers",
    oracle=f"""
WITH partsupp AS ({_DUCK_PARTSUPP}),
shipped AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_3', 'NATION_7')
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%3%')
      AND ps_availqty > 0.5 * qty)
ORDER BY s_name
""",
    category=CAT,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 shape: suppliers holding excess stock of filtered
    parts — two nested IN subqueries compiling to a semi-join chain.
    The stock threshold (availqty > half the shipped quantity) is
    exact: quantities are integer-valued doubles, halving is exact in
    binary."""
    ps = _partsupp(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    parts3 = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%3%"))
        .select("p_partkey")
    )
    excess = (
        ps.join(F.broadcast(parts3), ps.ps_partkey == parts3.p_partkey, "left_semi")
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey) & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@op(
    "q8_market_share",
    oracle="""
WITH flat AS (
  SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 1000) AS BIGINT)
           AS vol_milli,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n2.n_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
)
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol_milli ELSE 0 END)
             / CAST(sum(vol_milli) AS DOUBLE), 4) AS mkt_share
FROM flat GROUP BY o_year ORDER BY o_year
""",
    category=CAT,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: one nation's share of regional revenue per
    year — conditional-sum ratio over a 7-way join (5 broadcast dims,
    lineitem<->orders shuffle).  Both sums are quantized to exact
    integer milli-units before the single final division, so the
    ratio's operands are bit-identical on both engines.  Completes the
    22/22 TPC-H shape coverage."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    vol_milli = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000
    ).cast("bigint")
    flat = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .select(
            bigint(F.year(F.col("o_orderdate"))).alias("o_year"),
            vol_milli.alias("vol_milli"),
            "supp_nation",
        )
    )
    nation_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("vol_milli")).otherwise(0)
    )
    return (
        flat.groupBy("o_year")
        .agg(
            F.round(nation_vol / F.sum("vol_milli").cast("double"), 4).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )
