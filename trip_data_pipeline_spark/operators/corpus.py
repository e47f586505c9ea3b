"""Corpus-level composites: duplicate-cluster canonicalization (the
full dedup story end-to-end) and an order-backlog sweep line.

`dedup_cluster_canonical` is the piece that turns pairwise dup signals
into an actual deduplicated corpus: exact-dup groups collapse to a
representative first, blocked edit-distance pairs over representatives
feed the iterative connected-components operator (operators/graph.py),
and every clustered document maps to the minimum doc_id of its
component — the canonical survivor.  This is how production corpus dedup actually composes
(pair generation is cheap and parallel; transitive closure makes
A~B, B~C collapse to one cluster even when A~C was never compared).

Scale notes: the md5 pair join is a plain hash join on the digest (no
quadratic stage); the edit-distance stage is bounded by blocking
(mlprep.py); components iterate in O(log diameter) supersteps, and dup
clusters are near-cliques with tiny diameter, so 2-3 supersteps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import bigint
from trip_data_pipeline_spark.operators.graph import connected_components
from trip_data_pipeline_spark.registry import op

EDIT_MAX = 20  # same near-dup threshold as mlprep.dedup_blocked_editdist


@op(
    "dedup_cluster_canonical",
    oracle=f"""
WITH RECURSIVE
b AS (
  SELECT doc_id, lang, n_chars // 50 AS bkt, substr(text, 1, 3) AS pfx,
         substr(text, 1, 40) AS head, md5(text) AS h
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS x, b2.doc_id AS y
  FROM b a JOIN b b2 ON a.h = b2.h AND a.doc_id < b2.doc_id
  UNION
  SELECT a.doc_id AS x, b2.doc_id AS y
  FROM b a JOIN b b2
    ON a.lang = b2.lang AND a.bkt = b2.bkt AND a.pfx = b2.pfx
   AND a.doc_id < b2.doc_id
  WHERE levenshtein(a.head, b2.head) <= {EDIT_MAX}
),
e AS (SELECT x AS src, y AS dst FROM pairs
      UNION SELECT y AS src, x AS dst FROM pairs),
n AS (SELECT DISTINCT src AS node FROM e),
reach(node, r) AS (
  SELECT node, node FROM n
  UNION
  SELECT re.node, e2.dst FROM reach re JOIN e e2 ON re.r = e2.src
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS canonical_id
FROM reach GROUP BY node ORDER BY doc_id
""",
    category="2.11 deduplication",
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full corpus-dedup composition, representative-first: exact-dup
    groups collapse to their min-doc_id representative BEFORE any
    pairwise work (one groupBy on the content hash — the md5 cliques'
    quadratic pair lists never materialize), blocked edit distance and
    iterative connected components then run over the (much smaller)
    representative set, and component labels broadcast back through
    the hash-group map.  Because every doc shares its representative's
    text (same md5 => same head/block), linking reps is equivalent to
    linking docs, and since each rep is its group's min id, the
    component min over reps IS the global min doc_id — so the result
    is identical to the naive formulation.  The DuckDB oracle is
    exactly that naive formulation (brute-force pairs + recursive-CTE
    transitive closure), so the hash check PROVES the optimized
    algorithm equivalent on the fixture.  Measured on the 10x replica
    this is what keeps the op linear in corpus size when duplicate
    multiplicity grows (docs/SCALE.md)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.expr("n_chars div 50").alias("bkt"),
        F.substring("text", 1, 3).alias("pfx"),
        F.substring("text", 1, 40).alias("head"),
        F.md5("text").alias("h"),
    )
    groups = d.groupBy("h").agg(
        F.min("doc_id").alias("rep"), F.count("*").alias("n_copies")
    )
    dmap = d.join(groups, "h").localCheckpoint()
    rep_rows = dmap.select("lang", "bkt", "pfx", "head", "rep").distinct()
    a, b = rep_rows.alias("a"), rep_rows.alias("b")
    near = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.pfx") == F.col("b.pfx"))
            & (F.col("a.rep") < F.col("b.rep")),
        )
        .filter(F.levenshtein(F.col("a.head"), F.col("b.head")) <= EDIT_MAX)
        .select(F.col("a.rep").alias("x"), F.col("b.rep").alias("y"))
        .distinct()
    )
    edges = near.select(F.col("x").alias("src"), F.col("y").alias("dst")).unionAll(
        near.select(F.col("y").alias("src"), F.col("x").alias("dst"))
    )
    comp = connected_components(edges).withColumnRenamed("node", "c_rep")
    # comp is bounded by the number of near-dup representatives —
    # usually small, but it GROWS with the corpus, so no forced
    # broadcast: AQE picks broadcast at fixture scale and falls back
    # to a shuffle join when the label map outgrows the threshold
    # (same rule as the round-3 contamination/tfidf fixes).
    labelled = (
        dmap.join(comp, dmap.rep == F.col("c_rep"), "left")
        # a doc is "clustered" iff its text has >1 copy (exact dup) or
        # its representative has a near-dup link
        .filter((F.col("n_copies") > 1) | F.col("component").isNotNull())
        .select(
            bigint(F.col("doc_id")).alias("doc_id"),
            bigint(F.coalesce(F.col("component"), F.col("rep"))).alias("canonical_id"),
        )
    )
    return labelled.orderBy("doc_id")


@op(
    "orders_backlog_sweep",
    oracle="""
WITH opened AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
         count(*) AS delta
  FROM orders GROUP BY 1
),
closed AS (
  SELECT close_day + 1 AS day, -count(*) AS delta FROM (
    SELECT l_orderkey,
           max(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)))
             AS close_day
    FROM lineitem GROUP BY l_orderkey
  ) GROUP BY 1
),
daily AS (
  SELECT day, sum(delta) AS net_change
  FROM (SELECT * FROM opened UNION ALL SELECT * FROM closed)
  GROUP BY day
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(net_change AS BIGINT) AS net_change,
       CAST(sum(net_change) OVER (ORDER BY day
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog
FROM daily ORDER BY day
""",
    category="composite queries",
)
def orders_backlog_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time by sweep-line: +1 at order date,
    -1 the day after the order's last line ships, then a running sum
    over per-day net changes.  The classic interval-stabbing question
    answered without an interval join: deltas aggregate to day
    granularity FIRST (map-side combinable, one shuffle), so the
    global cumulative window runs over |days| rows — thousands —
    regardless of source scale.  Integer epoch-day arithmetic
    throughout."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    opened = (
        o.select(F.unix_date(F.to_date("o_orderdate")).alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("delta"))
    )
    closed = (
        li.groupBy("l_orderkey")
        .agg(F.max(F.unix_date(F.to_date("l_shipdate"))).alias("close_day"))
        .groupBy((F.col("close_day") + 1).alias("day"))
        .agg((-F.count("*")).alias("delta"))
    )
    daily = (
        opened.unionAll(closed).groupBy("day").agg(F.sum("delta").alias("net_change"))
    )
    w = (
        Window.partitionBy()
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        bigint(F.col("day")).alias("day"),
        bigint(F.col("net_change")).alias("net_change"),
        bigint(F.sum("net_change").over(w)).alias("backlog"),
    ).orderBy("day")
