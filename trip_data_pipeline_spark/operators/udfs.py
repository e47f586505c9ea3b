"""§2.10 UDF / UDAF / UDTF surface (SURVEY.md §2.10; patterns per
SNIPPETS.md grouped-map / scalar-pandas examples).

These operators exist to cover the extension surface.  Performance
ordering (SURVEY.md §4): built-ins > higher-order fns > Arrow-batched
pandas UDFs > row-at-a-time Python UDFs; the row UDF appears exactly
once (udf_python_scalar) to cover the API, everything else is
Arrow-vectorized.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.registry import op

CAT = "2.10 UDF surface"


@op(
    "udf_python_scalar",
    oracle="""
SELECT c_custkey, reverse(lower(c_name)) AS rev_name
FROM customer
""",
    category=CAT,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path, present for API
    coverage) — SURVEY.md §2.10 row 1."""

    @F.udf(returnType=T.StringType())
    def rev_lower(s: str) -> str:
        return s[::-1].lower() if s is not None else None

    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", rev_lower(F.col("c_name")).alias("rev_name"))


@op(
    "udf_pandas_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 4) AS revenue
FROM lineitem
""",
    category=CAT,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batches) — SURVEY.md §2.10
    row 2.  Same 4dp-grid rounding rule as the built-in version."""

    @F.pandas_udf("double")
    def revenue(price: pd.Series, discount: pd.Series) -> pd.Series:
        return (price * (1.0 - discount)).round(4)

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue(F.col("l_extendedprice"), F.col("l_discount")).alias("revenue"),
    )


@op(
    "udaf_pandas_grouped_agg",
    oracle="""
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2)
         AS weighted_avg_price
FROM lineitem GROUP BY l_returnflag
""",
    category=CAT,
)
def udaf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: quantity-weighted mean price —
    SURVEY.md §2.10 row 3."""

    @F.pandas_udf("double")
    def weighted_mean(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            weighted_mean(F.col("l_extendedprice"), F.col("l_quantity")), 2
        ).alias("weighted_avg_price")
    )


@op(
    "udtf_grouped_map_normalize",
    oracle="""
SELECT event_id, event_type,
       CASE WHEN round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4) = 0
            THEN CAST(0.0 AS DOUBLE)
            ELSE round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4) END AS z
FROM events
WINDOW w AS (PARTITION BY event_type)
""",
    category=CAT,
)
def udtf_grouped_map_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas z-score per event_type — SURVEY.md
    §2.10 row 4 (SNIPPETS.md grouped-map pattern; pandas std is ddof=1
    so the oracle uses stddev_samp, §5.3 rule 6)."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        z = ((v - v.mean()) / v.std()).round(4) + 0.0  # +0.0 kills -0.0
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "event_type": pdf["event_type"], "z": z}
        )

    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").applyInPandas(
        normalize, schema="event_id bigint, event_type string, z double"
    )


@op(
    "udtf_python",
    oracle="""
SELECT doc_id, word, CAST(length(word) AS BIGINT) AS wlen
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents WHERE doc_id < 20) t
""",
    category=CAT,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function) exploding text into
    (word, wlen) rows via a lateral join — SURVEY.md §2.10 row 5."""

    @F.udtf(returnType="word string, wlen bigint")
    class SplitWords:
        def eval(self, text: str):
            if text:
                for w in text.split(" "):
                    yield (w, len(w))

    spark.udtf.register("split_words", SplitWords)
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.word, t.wlen "
        "FROM _udtf_docs d, LATERAL split_words(d.text) t"
    )


@op(
    "udf_arrow_batch",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 100000 THEN 'small' ELSE 'large' END AS band,
       round(o_totalprice * 1.1, 3) AS boosted
FROM orders
""",
    category=CAT,
)
def udf_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas whole-partition Arrow-batch transform — SURVEY.md
    §2.10 row 6.  boosted is on a 3dp grid (2dp x 1.1), rounded there."""

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "o_orderkey": pdf["o_orderkey"],
                    "band": (pdf["o_totalprice"] < 100000).map(
                        {True: "small", False: "large"}
                    ),
                    "boosted": (pdf["o_totalprice"] * 1.1).round(3),
                }
            )

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return o.mapInPandas(
        transform, schema="o_orderkey bigint, band string, boosted double"
    )
