"""§2.7 Set operations (SURVEY.md §2.7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.registry import op

CAT = "2.7 set operations"


@op(
    "set_union_all",
    oracle="""
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
""",
    category=CAT,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (UNION ALL) — SURVEY.md §2.7 row 1.  unionByName is a
    zero-shuffle plan concatenation."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderstatus")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_orderkey", "o_orderstatus")
    return a.unionByName(b)


@op(
    "set_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
    category=CAT,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (UNION) — SURVEY.md §2.7 row 2."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@op(
    "set_intersect",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'view'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
    category=CAT,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics) — SURVEY.md §2.7 row 3."""
    ev = load(spark, sf_dir, "events")
    viewed = ev.filter(F.col("event_type") == "view").select("user_id")
    purchased = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return viewed.intersect(purchased)


@op(
    "set_except",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
    category=CAT,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: users who viewed but never purchased — SURVEY.md §2.7
    row 4 (subtract = EXCEPT DISTINCT, matching SQL set semantics)."""
    ev = load(spark, sf_dir, "events")
    viewed = ev.filter(F.col("event_type") == "view").select("user_id")
    purchased = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return viewed.subtract(purchased)
