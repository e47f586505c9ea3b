"""§2.17 scale-pipeline operators (round-3 additions, SURVEY.md §2.17).

Eight ops rounding out the large-cluster pipeline surface: an
iterative PageRank with integer-exact arithmetic, incremental rollup
merging (partial-agg reuse), the binaryFile source, an
interval-overlap join, snapshot diffing, per-group Pareto skylines,
product-quantization code assignment, and exact heavy hitters.  All
hash-checked: every ranking/membership decision is integer arithmetic
(the round-3 cross-engine exactness conventions), so DuckDB replays
each pipeline bit-identically.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import as_date, bigint, r2, scratch_dir, spread
from trip_data_pipeline_spark.operators.graph import _copart_edges
from trip_data_pipeline_spark.operators.text_ops import _duck_words, _words
from trip_data_pipeline_spark.registry import op

CAT = "2.17 scale-pipeline ops (round-3 additions)"


# --------------------------------------------------------------------------
# PageRank — iterative, integer-exact
# --------------------------------------------------------------------------

_PR_EDGES_DUCK = """
op_ AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p
        FROM lineitem WHERE l_orderkey % 97 = 0),
e AS (SELECT DISTINCT a.p AS src, b.p AS dst
      FROM op_ a JOIN op_ b ON a.k = b.k AND a.p <> b.p),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
n AS (SELECT src AS node FROM deg)
"""


def _pr_iter_duck(prev: str, out: str) -> str:
    """One PageRank iteration as a DuckDB CTE pair (contribution sum +
    damped update) — integer // arithmetic mirrors Spark's div."""
    return f"""
c_{out} AS (
  SELECT e.dst AS node, sum({prev}.r // deg.d) AS s
  FROM e JOIN {prev} ON {prev}.node = e.src JOIN deg ON deg.src = e.src
  GROUP BY 1
),
{out} AS (
  SELECT n.node, 150000 + (850 * COALESCE(c_{out}.s, 0)) // 1000 AS r
  FROM n LEFT JOIN c_{out} ON c_{out}.node = n.node
)"""


_PAGERANK_ORACLE = f"""
WITH {_PR_EDGES_DUCK},
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
{_pr_iter_duck('r0', 'r1')},
{_pr_iter_duck('r1', 'r2')},
{_pr_iter_duck('r2', 'r3')}
SELECT node, CAST(r AS BIGINT) AS rank_ppm FROM r3
"""


@op("graph_pagerank_int", oracle=_PAGERANK_ORACLE, category=CAT)
def graph_pagerank_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank, 3 fixed iterations, damping 0.85 — iterative link
    analysis over the part co-occurrence graph (same edge derivation
    as graph_connected_components).

    Integer-exact: ranks are parts-per-million integers, contributions
    use floor division (Spark ``div`` == DuckDB ``//``), and the damped
    update is ``150000 + 850*sum div 1000`` — no float ever enters, so
    both engines land on identical ranks and the op hash-checks (an
    approximation-free replay a float PageRank could never give).

    Scale: each iteration is one join of the edge list with the
    (node, rank) map on src plus a partial/final sum on dst — the same
    co-partitioned per-superstep cost as connected components; edges
    are localCheckpoint'ed once and reused, and a fixed iteration
    count means a fixed-depth plan (no driver convergence probe
    needed).  At 100 TB the edge list is hash-partitioned on src once
    and every superstep reuses that partitioning."""
    edges = _copart_edges(spark, sf_dir).localCheckpoint()
    deg = edges.groupBy("src").agg(bigint(F.count(F.lit(1))).alias("d"))
    nodes = deg.select(F.col("src").alias("node"))
    rank = nodes.select("node", F.lit(1000000).cast("bigint").alias("r"))
    e_deg = edges.join(deg, "src")
    for _ in range(3):
        contrib = (
            e_deg.join(rank.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), F.expr("r div d").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        rank = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(150000) + F.expr("850 * coalesce(s, 0) div 1000")).alias("r"),
        )
    return rank.select("node", bigint(F.col("r")).alias("rank_ppm"))


# --------------------------------------------------------------------------
# Incremental rollup merge — partial-aggregate reuse
# --------------------------------------------------------------------------


@op(
    "rollup_incremental_merge",
    oracle="""
SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month,
       o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS total,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi,
       round(round(sum(o_totalprice), 2) / count(*), 2) AS avg_price
FROM orders
GROUP BY 1, 2
""",
    category=CAT,
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: daily partial aggregates merged
    into monthly finals — the materialized-view pattern where each new
    day's partition aggregates once and coarser rollups merge partials
    instead of rescanning history (sum-of-sums, count-of-counts,
    min-of-mins, max-of-maxes; avg recomposed exactly from merged
    sum/count, never averaged-of-averages).

    The oracle aggregates the source directly — the hash check proves
    merge-of-partials is value-identical to a full recompute.

    Scale: at 100 TB the daily partials are tiny (days x priorities
    rows) regardless of fact size, so the monthly merge touches
    KB not TB; the expensive pass is the per-day partial, which runs
    once per new partition."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        as_date(F.col("o_orderdate")).alias("day"), "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_totalprice").alias("s"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
    )
    return (
        daily.groupBy(F.trunc("day", "month").alias("month"), "o_orderpriority")
        .agg(
            bigint(F.sum("n")).alias("n"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
        .select(
            "month",
            "o_orderpriority",
            "n",
            r2(F.col("s")).alias("total"),
            r2(F.col("mn")).alias("lo"),
            r2(F.col("mx")).alias("hi"),
            # divide the ROUNDED (exact-cents) total, not the raw sum:
            # partial-merge order perturbs the raw double's last ulp,
            # which can flip round(s/n) at a half-cent boundary; the
            # rounded total is bit-identical in both engines, so the
            # division (and its rounding) is too.
            r2(r2(F.col("s")) / F.col("n")).alias("avg_price"),
        )
    )


# --------------------------------------------------------------------------
# binaryFile source
# --------------------------------------------------------------------------


@op(
    "scan_binary_files",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
FROM documents WHERE doc_id < 64
""",
    category=CAT,
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``binaryFile`` source — whole-file ingestion of opaque
    payloads (the on-ramp for image/audio corpora: one row per file
    with path, length, and raw bytes).

    Setup materializes the first 64 documents as individual files;
    the scan reads them back whole-file and the oracle checks byte
    length and content md5 against the source rows — a truncated or
    corrupted read would hash-mismatch.

    Scale: binaryFile is a FileFormat scan like parquet — splits are
    whole files, listing is distributed, and pathGlobFilter/
    recursiveFileLookup prune at listing time.  The per-file payload
    stays in one row, so downstream decode parallelism is per-file
    (pair with mapInPandas decoders, cf. multimodal_decode_ppm)."""
    out = scratch_dir(prefix="binsrc_")
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id", "text")
        .collect()
    )
    for row in docs:
        with open(os.path.join(out, f"doc_{row.doc_id}.txt"), "wb") as fh:
            fh.write(row.text.encode("utf-8"))
    b = spark.read.format("binaryFile").load(out)
    return b.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.txt", 1)
        .cast("bigint")
        .alias("doc_id"),
        bigint(F.col("length")).alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


# --------------------------------------------------------------------------
# Interval-overlap join
# --------------------------------------------------------------------------

_IVL_DUCK = """
iv AS (
  SELECT o_orderkey AS id,
         CAST(o_orderdate AS DATE) AS s,
         CAST(o_orderdate AS DATE) + CAST((o_orderkey % 7) + 1 AS INTEGER) AS e,
         o_orderkey % 2 AS side
  FROM orders WHERE o_orderkey % 13 = 0
)
"""


@op(
    "join_interval_overlap",
    oracle=f"""
WITH {_IVL_DUCK}
SELECT a.id AS left_id,
       CAST(count(*) AS BIGINT) AS n_overlaps,
       CAST(sum(date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) + 1) AS BIGINT)
         AS overlap_days
FROM iv a JOIN iv b
  ON a.side = 0 AND b.side = 1 AND a.s <= b.e AND b.s <= a.e
GROUP BY 1
""",
    category=CAT,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-vs-interval overlap join — the two-sided generalization
    of the point-in-interval containment op: reservation-style windows
    on both sides, pairs that overlap in time.

    Spark has no native interval join, so the scale formulation
    explodes each interval into its covered week buckets and
    equi-joins on the bucket (candidates bounded per bucket because
    interval length is bounded: <= 8 days -> <= 2 buckets), dedups the
    pairs, then verifies true overlap — the standard bucketed range
    join.  The oracle runs the direct theta join; identical results
    prove the bucketing loses nothing.

    Scale: the only shuffle is the bucket equi-join; a naive theta
    join would be a cartesian product.  Bucket width tracks the max
    interval length so each interval lands in O(1) buckets."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    iv = o.select(
        F.col("o_orderkey").alias("id"),
        as_date(F.col("o_orderdate")).alias("s"),
        F.date_add(
            as_date(F.col("o_orderdate")),
            ((F.col("o_orderkey") % 7) + 1).cast("int"),
        ).alias("e"),
        (F.col("o_orderkey") % 2).alias("side"),
    )
    # week bucket indices covered by [s, e] (epoch-day // 7)
    wk = iv.withColumn(
        "wk",
        F.explode(
            F.sequence(
                F.floor(F.unix_date("s") / 7), F.floor(F.unix_date("e") / 7)
            )
        ),
    )
    a = wk.filter(F.col("side") == 0).select(
        F.col("id").alias("left_id"), F.col("s").alias("s1"),
        F.col("e").alias("e1"), "wk",
    )
    b = wk.filter(F.col("side") == 1).select(
        F.col("id").alias("right_id"), F.col("s").alias("s2"),
        F.col("e").alias("e2"), "wk",
    )
    pairs = (
        a.join(b, "wk")
        .filter((F.col("s1") <= F.col("e2")) & (F.col("s2") <= F.col("e1")))
        .select(
            "left_id", "right_id",
            (
                F.datediff(
                    F.least("e1", "e2"), F.greatest("s1", "s2")
                ) + 1
            ).alias("od"),
        )
        .distinct()  # same pair can meet in 2 shared buckets
    )
    return pairs.groupBy("left_id").agg(
        bigint(F.count(F.lit(1))).alias("n_overlaps"),
        bigint(F.sum("od")).alias("overlap_days"),
    )


# --------------------------------------------------------------------------
# Snapshot diff
# --------------------------------------------------------------------------


@op(
    "table_snapshot_diff",
    oracle="""
WITH snap_b AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 31 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus
  FROM orders WHERE o_orderkey % 53 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000000, o_orderstatus
  FROM orders WHERE o_orderkey % 41 = 0
),
d AS (
  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         a.o_orderstatus AS old_status,
         b.o_orderstatus AS new_status,
         CASE WHEN b.o_orderkey IS NULL THEN 'D'
              WHEN a.o_orderkey IS NULL THEN 'I'
              WHEN a.o_orderstatus <> b.o_orderstatus THEN 'U'
              ELSE NULL END AS change_type
  FROM (SELECT o_orderkey, o_orderstatus FROM orders) a
  FULL OUTER JOIN snap_b b USING (o_orderkey)
)
SELECT o_orderkey, change_type, old_status, new_status
FROM d WHERE change_type IS NOT NULL
""",
    category=CAT,
)
def table_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot table diff: classify every key as
    insert/update/delete between two versions (the reconciliation
    primitive behind CDC validation, backfill audits, and
    lakehouse-table drift checks).

    Snapshot B is derived deterministically from A (deletes where
    key%53=0, status updates where key%31=0, inserts as key+1e10
    clones where key%41=0), so the oracle replays the same derivation
    and the diff must classify every key identically.

    Scale: one full outer join hash-partitioned on the key — both
    snapshots shuffle once; with bucketed/sorted snapshots (cf.
    join_bucketed_colocated) the diff is exchange-free.  Unchanged
    rows are dropped pre-output so the result is change-volume-sized,
    not table-sized."""
    a = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    b = (
        a.filter(F.col("o_orderkey") % 53 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 31 == 0, "X")
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
        )
        .unionAll(
            a.filter(F.col("o_orderkey") % 41 == 0).select(
                (F.col("o_orderkey") + F.lit(10000000000)).alias("o_orderkey"),
                "o_orderstatus",
            )
        )
    )
    aa, bb = a.alias("a"), b.alias("b")
    d = aa.join(bb, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer").select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("b.o_orderkey").isNull(), "D")
        .when(F.col("a.o_orderkey").isNull(), "I")
        .when(F.col("a.o_orderstatus") != F.col("b.o_orderstatus"), "U")
        .alias("change_type"),
        F.col("a.o_orderstatus").alias("old_status"),
        F.col("b.o_orderstatus").alias("new_status"),
    )
    return d.filter(F.col("change_type").isNotNull())


# --------------------------------------------------------------------------
# Pareto skyline per group
# --------------------------------------------------------------------------


@op(
    "skyline_pareto_per_group",
    oracle="""
WITH pts AS (
  SELECT c.c_mktsegment, c.c_custkey,
         CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
         CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
),
w AS (
  SELECT *,
         max(n_orders) OVER (PARTITION BY c_mktsegment ORDER BY bal_cents DESC
                             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS m_strict,
         max(n_orders) OVER (PARTITION BY c_mktsegment, bal_cents) AS m_tie
  FROM pts
)
SELECT c_mktsegment, c_custkey, bal_cents, n_orders
FROM w
WHERE NOT (COALESCE(m_strict >= n_orders, FALSE) OR m_tie > n_orders)
""",
    category=CAT,
)
def skyline_pareto_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline per market segment: customers not dominated on
    (account balance, order count) — multi-criteria top-set analytics
    (a point is dominated if another is >= on both axes and > on one).

    O(n log n) window formulation instead of the quadratic dominance
    self-join: sort each group by balance descending; a point is
    dominated iff the max order-count over strictly-higher balances
    reaches its own (``RANGE ... 1 PRECEDING`` on the integer-cents
    key = bal' > bal exactly) or a same-balance point strictly beats
    it.  Integer cents keep the range frame and every comparison
    engine-exact.

    Scale: one shuffle on the group key, then a per-group sort —
    the skyline never materializes candidate pairs, vs the self-join
    form whose intermediate is O(n^2) per group."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    pts = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy(
            "c_mktsegment",
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint").alias("bal_cents"),
        )
        .agg(bigint(F.count("o_orderkey")).alias("n_orders"))
    )
    w_strict = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("bal_cents").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_tie = Window.partitionBy("c_mktsegment", "bal_cents")
    w = pts.select(
        "*",
        F.max("n_orders").over(w_strict).alias("m_strict"),
        F.max("n_orders").over(w_tie).alias("m_tie"),
    )
    dominated = F.coalesce(
        F.col("m_strict") >= F.col("n_orders"), F.lit(False)
    ) | (F.col("m_tie") > F.col("n_orders"))
    return w.filter(~dominated).select(
        "c_mktsegment", "c_custkey", "bal_cents", "n_orders"
    )


# --------------------------------------------------------------------------
# Product-quantization code assignment
# --------------------------------------------------------------------------

PQ_SUBS = 8  # 64 dims -> 8 subspaces x 8 dims
PQ_CENTS = 16


@op(
    "embed_pq_assign",
    oracle=f"""
WITH v AS (
  SELECT vec_id, gd,
         CAST(floor(CAST(embedding[CAST(gd + 1 AS INT)] AS DOUBLE) * 1000 + 0.5)
              AS BIGINT) AS val
  FROM (SELECT vec_id, embedding, unnest(range(0, 64)) AS gd
        FROM embeddings WHERE embedding IS NOT NULL)
),
d AS (
  SELECT vec_id, gd // 8 AS subspace, cc.c AS c,
         sum((val - ((cc.c * 31 + gd * 17) % 21 - 10) * 1000)
             * (val - ((cc.c * 31 + gd * 17) % 21 - 10) * 1000)) AS dist
  FROM v CROSS JOIN (SELECT unnest(range(0, {PQ_CENTS})) AS c) cc
  GROUP BY 1, 2, 3
)
SELECT vec_id, CAST(subspace AS INT) AS subspace,
       CAST(min(dist * {PQ_CENTS} + c) % {PQ_CENTS} AS INT) AS code
FROM d GROUP BY 1, 2
""",
    category=CAT,
)
def embed_pq_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization code assignment: 64-dim embeddings split
    into 8 subvectors, each assigned to its nearest of 16 fixed
    centroids — the index-build step of a PQ/IVF-PQ ANN system (codes
    compress each vector 64 floats -> 8 nibbles for in-memory search).

    The codebook is a deterministic integer lattice
    (cent[c][gd] = (c*31 + gd*17) % 21 - 10, scaled x1000 to match
    millis-quantized vectors), distances are exact integer sums of
    squares, and the argmin ties break to the lowest code via the
    ``min(dist*16 + c) % 16`` encoding — bit-identical in both
    engines, so assignment membership can never flip.

    Scale: posexplode -> one shuffle keyed (vec_id, subspace); the
    16-row centroid table broadcasts; output is 8 rows per vector.
    A trained codebook would arrive the same way — a small broadcast
    relation — leaving the plan unchanged."""
    e = spread(load(spark, sf_dir, "embeddings"))
    v = e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("gd", "x")
    ).select(
        "vec_id",
        "gd",
        F.floor(F.col("x").cast("double") * 1000 + 0.5).cast("bigint").alias("val"),
    )
    cents = spark.range(PQ_CENTS).select(F.col("id").cast("int").alias("c"))
    cent_val = ((F.col("c") * 31 + F.col("gd") * 17) % 21 - 10) * 1000
    diff = F.col("val") - cent_val
    d = (
        v.join(F.broadcast(cents))
        .groupBy(
            "vec_id",
            F.expr("gd div 8").cast("int").alias("subspace"),
            "c",
        )
        .agg(F.sum(diff * diff).alias("dist"))
    )
    return d.groupBy("vec_id", "subspace").agg(
        (F.min(F.col("dist") * PQ_CENTS + F.col("c")) % PQ_CENTS)
        .cast("int")
        .alias("code")
    )


# --------------------------------------------------------------------------
# Exact heavy hitters
# --------------------------------------------------------------------------


@op(
    "freq_heavy_hitters_exact",
    oracle=f"""
WITH w AS (
  SELECT unnest({_duck_words()}) AS word FROM documents
),
tot AS (SELECT count(*) AS t FROM w),
cnt AS (SELECT word, count(*) AS n FROM w GROUP BY 1)
SELECT word, CAST(n AS BIGINT) AS cnt,
       CAST(n * 1000000 // t AS BIGINT) AS freq_ppm
FROM cnt, tot
WHERE n * 1000 > t
""",
    category=CAT,
)
def freq_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters: words above 0.1% of total token
    mass — the vocabulary-pruning / stopword-discovery primitive
    (the exact two-pass counterpart of sketch-based heavy hitters:
    same output contract, checkable).

    Frequency is integer parts-per-million (``n*1e6 div total``) and
    the threshold test is cross-multiplied (``n*1000 > total``) — no
    division ever decides membership.

    Scale: one explode + partial/final count per word, plus a 1-row
    global total broadcast into the filter — no corpus-sized state on
    any single node, no second scan of the raw text (the word counts
    are reused for both threshold and output)."""
    d = spread(load(spark, sf_dir, "documents"))
    words = d.select(F.explode(_words()).alias("word"))
    cnt = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    tot = words.agg(F.count(F.lit(1)).alias("t"))
    return (
        cnt.join(F.broadcast(tot))
        .filter(F.col("n") * 1000 > F.col("t"))
        .select(
            "word",
            bigint(F.col("n")).alias("cnt"),
            # DECIMAL(38,0): a stopword's corpus-wide count at 100 TB
            # is ~1e13; 1e6x overflows int64 (round-7 ppm audit).
            bigint(
                F.expr(
                    "CAST((CAST(1000000 AS DECIMAL(38,0)) * n)"
                    " div t AS BIGINT)"
                )
            ).alias("freq_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Winnowing document fingerprints (MOSS-style)
# --------------------------------------------------------------------------

WINNOW_W = 4  # fingerprint window over consecutive shingle hashes
WINNOW_MAX_DF = 50  # common-fingerprint elimination threshold
WINNOW_MIN_SHARED = 3


def _winnow_oracle() -> str:
    from trip_data_pipeline_spark.operators.dedup import _duck_hex28

    return f"""
WITH d AS (SELECT doc_id, {_duck_words()} AS ws FROM documents),
d6 AS (SELECT doc_id, ws FROM d WHERE len(ws) >= 6),
sh AS (SELECT doc_id, i AS pos, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s
       FROM (SELECT doc_id, ws, unnest(range(0, len(ws) - 2)) AS i FROM d6)),
h AS (SELECT doc_id, pos, {_duck_hex28('md5(s)', 1)} AS h FROM sh),
enc AS (SELECT doc_id, pos, h * 2097152 + (1048576 - pos) AS e,
               count(*) OVER (PARTITION BY doc_id) AS ns
        FROM h),
winm AS (SELECT doc_id, pos, ns,
                min(e) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
                  AS me
         FROM enc),
fp AS (SELECT DISTINCT doc_id, me // 2097152 AS fp
       FROM winm WHERE pos <= ns - {WINNOW_W}),
fpk AS (SELECT doc_id, fp FROM
          (SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df FROM fp)
        WHERE df <= {WINNOW_MAX_DF})
SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fpk a JOIN fpk b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {WINNOW_MIN_SHARED}
"""


@op("text_winnowing_fingerprint", oracle=_winnow_oracle(), category=CAT)
def text_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): from each window of W=4
    consecutive shingle hashes keep the minimal hash (rightmost on
    ties), guaranteeing every sufficiently long match contributes at
    least one shared fingerprint while storing only ~1/W of the
    hashes; fingerprints appearing in > 50 docs are dropped (the
    standard common-content elimination), and doc pairs sharing >= 3
    surviving fingerprints are reported.

    Engine-exact: shingle hashes are the md5-derived 28-bit family,
    and the rightmost-min tie-break is encoded arithmetically
    (min over h*2^21 + (2^20 - pos)), so DuckDB replays every
    selection decision bit-identically.

    Scale: the per-doc winnow is a map-side window (partition = doc);
    the only corpus-wide state is the per-fingerprint doc frequency,
    computed as a count() window over the fingerprint partition —
    join-free, nothing corpus-sized broadcasts (same shape as
    text_tfidf_topk).  The pair join is bounded per fingerprint by
    the df <= 50 gate."""
    from trip_data_pipeline_spark.operators.dedup import _hex28

    d = (
        spread(load(spark, sf_dir, "documents"))
        .select("doc_id", _words().alias("ws"))
        .filter(F.size("ws") >= 6)
    )
    sh = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, size(ws) - 3),"
                " i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))"
            )
        ).alias("pos", "s"),
    )
    h = sh.select(
        "doc_id", "pos", _hex28(F.md5("s"), 1).alias("h")
    ).select(
        "doc_id",
        "pos",
        (F.col("h") * 2097152 + (1048576 - F.col("pos"))).alias("e"),
    )
    w_doc = Window.partitionBy("doc_id")
    w_win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    fp = (
        h.select(
            "doc_id",
            "pos",
            F.count(F.lit(1)).over(w_doc).alias("ns"),
            F.min("e").over(w_win).alias("me"),
        )
        .filter(F.col("pos") <= F.col("ns") - WINNOW_W)
        .select("doc_id", F.expr("me div 2097152").alias("fp"))
        .distinct()
    )
    fpk = fp.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
    ).filter(F.col("df") <= WINNOW_MAX_DF)
    a = fpk.select(F.col("doc_id").alias("doc_id1"), "fp")
    b = fpk.select(F.col("doc_id").alias("doc_id2"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_id1") < F.col("doc_id2"))
        .groupBy("doc_id1", "doc_id2")
        .agg(bigint(F.count(F.lit(1))).alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )


# --------------------------------------------------------------------------
# Time-series resampling with linear interpolation
# --------------------------------------------------------------------------

GRID_US = 900_000_000  # 15-minute grid


@op(
    "timeseries_resample_linear",
    oracle=f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc FROM events),
bounds AS (SELECT user_id, min(us) AS mn, max(us) AS mx FROM ev GROUP BY 1),
grid AS (SELECT user_id,
                unnest(range(CAST(ceil(mn / {GRID_US}.0) AS BIGINT),
                             CAST(floor(mx / {GRID_US}.0) AS BIGINT) + 1)) AS g
         FROM bounds),
u AS (
  SELECT user_id, us AS t, vc, 0 AS is_grid FROM ev
  UNION ALL
  SELECT user_id, g * {GRID_US} AS t, NULL AS vc, 1 AS is_grid FROM grid
),
w AS (
  SELECT user_id, t, is_grid,
         last_value(vc IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN vc IS NOT NULL THEN t END IGNORE NULLS) OVER wp AS pt,
         first_value(vc IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN vc IS NOT NULL THEN t END IGNORE NULLS) OVER wn AS nt
  FROM u
  WINDOW wp AS (PARTITION BY user_id ORDER BY t, is_grid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY t, is_grid DESC
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, CAST(t // 1000000 AS BIGINT) AS grid_s,
       CAST(CASE WHEN nt = pt THEN pv
            ELSE (pv * (nt - t) + nv * (t - pt)) // (nt - pt) END AS BIGINT)
         AS v_interp_c
FROM w WHERE is_grid = 1
""",
    category=CAT,
)
def timeseries_resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's irregular event series onto a 15-minute
    grid with LINEAR interpolation between the surrounding
    observations — the other half of gap handling beside
    timeseries_gap_fill_locf (LOCF holds, this one interpolates; both
    are what feature-store time alignment needs).

    Interpolation is exact integer arithmetic on cent values and µs
    timestamps: (pv*(nt-t) + nv*(t-pt)) div (nt-pt) — weights are
    non-negative integers (events.value >= 0, grid inside [min, max]),
    so Spark ``div`` and DuckDB ``//`` agree and the hash cannot
    drift.  An observation exactly on a grid point wins both
    directions (pt == nt -> its value verbatim).

    Scale: the union of events and grid points sorts once per user
    partition; prev/next are two frames over that one sort — no
    self-join, no per-grid-point probe.  Grid density is fixed by the
    time span, so output size is (users x span/15min) regardless of
    event volume."""
    # `tb` (event_id; NULL on grid rows) is a pure tie-break: the µs
    # fixture timestamps are tie-free per (user_id, t), so it changes
    # no output — it makes the two-sided ordering deterministic BY
    # CONSTRUCTION for any input (VERDICT r12 item 8: two non-null
    # events at equal t would otherwise leave both the old and new
    # forms nondeterministic).  It rides both window orders below.
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vc"),
        F.col("event_id").alias("tb"),
    )
    grid = (
        ev.groupBy("user_id")
        .agg(F.min("t").alias("mn"), F.max("t").alias("mx"))
        .select(
            "user_id",
            # guard the inverted range: a single-event user (mn == mx
            # between grid points) has ceil(mn/G) > floor(mx/G), and
            # Spark's sequence() DESCENDS there — minting two phantom
            # grid points outside [mn, mx] with NULL interpolation —
            # while DuckDB's exclusive-upper range() is already empty
            # (round-8 degenerate-shape gate)
            F.explode(
                F.when(
                    F.ceil(F.col("mn") / F.lit(float(GRID_US))).cast("bigint")
                    <= F.floor(F.col("mx") / F.lit(float(GRID_US))).cast("bigint"),
                    F.sequence(
                        F.ceil(F.col("mn") / F.lit(float(GRID_US))).cast("bigint"),
                        F.floor(F.col("mx") / F.lit(float(GRID_US))).cast("bigint"),
                    ),
                ).otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)"))
            ).alias("g"),
        )
        .select("user_id", (F.col("g") * GRID_US).alias("t"),
                F.lit(None).cast("bigint").alias("vc"),
                F.lit(1).alias("is_grid"),
                F.lit(None).cast("bigint").alias("tb"))
    )
    u = ev.select("user_id", "t", "vc", F.lit(0).alias("is_grid"), "tb").unionByName(
        grid
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t"), F.col("is_grid"), F.col("tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "Next observation" via a GROWING frame over the REVERSED sort
    # (r12 optimization, guide §2/§7): the natural formulation —
    # first_value IGNORE NULLS over ROWS BETWEEN CURRENT ROW AND
    # UNBOUNDED FOLLOWING — executes as Spark's
    # UnboundedFollowingWindowFunctionFrame, which RESCANS from the
    # current row to the partition end for every row: O(rows^2) per
    # user partition (~2,900 grid+event rows/user at sf0.1 -> 42 s for
    # the whole op; 4.2 s at sf0.01).  last_value over
    # [UNBOUNDED PRECEDING, CURRENT ROW] on the exact reverse ordering
    # — (t DESC NULLS LAST, is_grid ASC), the mirror of
    # (t ASC NULLS FIRST, is_grid DESC) — visits the identical row set
    # per frame but runs as the incremental O(rows) growing frame.
    # Value-identical by construction (same rows in frame), locked by
    # the oracle hash and test_resample_next_frame_equivalence.  The
    # reversed order is the exact MIRROR of the forward one
    # (t ASC, is_grid DESC, tb ASC) -> (t DESC, is_grid ASC, tb DESC);
    # Spark's ASC = NULLS FIRST mirrors DESC = NULLS LAST, so the NULL
    # tb of grid rows keeps its relative position under reversal.
    wn = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").desc(), F.col("is_grid"), F.col("tb").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev_t = F.when(F.col("vc").isNotNull(), F.col("t"))
    w = u.select(
        "user_id",
        "t",
        "is_grid",
        F.last("vc", ignorenulls=True).over(wp).alias("pv"),
        F.last(ev_t, ignorenulls=True).over(wp).alias("pt"),
        F.last("vc", ignorenulls=True).over(wn).alias("nv"),
        F.last(ev_t, ignorenulls=True).over(wn).alias("nt"),
    )
    interp = F.when(F.col("nt") == F.col("pt"), F.col("pv")).otherwise(
        F.expr("(pv * (nt - t) + nv * (t - pt)) div (nt - pt)")
    )
    return (
        w.filter(F.col("is_grid") == 1)
        .select(
            "user_id",
            F.expr("t div 1000000").cast("bigint").alias("grid_s"),
            interp.cast("bigint").alias("v_interp_c"),
        )
    )


# --------------------------------------------------------------------------
# Grid-density clustering (DBSCAN-lite: core cells + neighbor merge)
# --------------------------------------------------------------------------


def _dbscan_oracle() -> str:
    from trip_data_pipeline_spark.operators.geo import _LAT_CENTI, _LON_CENTI

    return f"""
WITH RECURSIVE
pts AS (SELECT {_LAT_CENTI} // 100 AS cl, {_LON_CENTI} // 100 AS co FROM events),
tot AS (SELECT count(*) AS t FROM pts),
cells AS (SELECT cl, co, count(*) AS cnt FROM pts GROUP BY 1, 2),
core AS (SELECT cl * 360 + co AS node, cl, co, cnt
         FROM cells, tot WHERE cnt * 61200 > 2 * t),
e0 AS (SELECT a.node AS src, b.node AS dst
       FROM core a JOIN core b
         ON abs(a.cl - b.cl) <= 1 AND abs(a.co - b.co) <= 1
        AND a.node <> b.node),
reach(node, r) AS (
  SELECT src, src FROM e0
  UNION
  SELECT re.node, e.dst FROM reach re JOIN e0 e ON re.r = e.src
),
lab AS (SELECT node, min(r) AS component FROM reach GROUP BY 1)
SELECT CAST(COALESCE(lab.component, core.node) AS BIGINT) AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(core.cnt) AS BIGINT) AS n_points
FROM core LEFT JOIN lab ON lab.node = core.node
GROUP BY 1
"""


@op("geo_grid_density_cluster", oracle=_dbscan_oracle(), category=CAT)
def geo_grid_density_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density clustering (DBSCAN-lite) over the derived trip
    coordinates: cells whose point count exceeds 2x the uniform mean
    (cross-multiplied integer predicate — adapts to any SF with no
    float division) are 'core'; core cells adjacent in the
    8-neighborhood merge into clusters via the same pointer-jumping
    connected components the dedup pipeline uses; isolated core cells
    stay singleton clusters.

    Scale: the density pass is a partial+final aggregate onto the
    fixed 170x360 cell domain (tiny, whatever the input size); the
    neighbor join explodes each core cell into its <= 8 in-bounds
    neighbor ids and equi-joins on the neighbor id — never an all-pairs
    distance join (the DuckDB oracle can afford the abs-diff theta
    join because core cells are few; the Spark side uses the
    formulation that survives a dense grid).  Cell ids guard the
    domain bounds BEFORE encoding (cl*360+co is only bijective inside
    the domain — an unguarded co = -1 would alias the previous row's
    easternmost cell)."""
    from trip_data_pipeline_spark.operators.geo import _LAT_CENTI, _LON_CENTI
    from trip_data_pipeline_spark.operators.graph import connected_components

    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        F.expr(f"{_LAT_CENTI} div 100").alias("cl"),
        F.expr(f"{_LON_CENTI} div 100").alias("co"),
    )
    cells = pts.groupBy("cl", "co").agg(F.count(F.lit(1)).alias("cnt"))
    tot = pts.agg(F.count(F.lit(1)).alias("t"))
    core = (
        cells.join(F.broadcast(tot))
        .filter(F.col("cnt") * 61200 > 2 * F.col("t"))
        .select((F.col("cl") * 360 + F.col("co")).alias("node"), "cl", "co", "cnt")
        .localCheckpoint()  # two consumers: edges (x2) and final agg
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dl).alias("dl"), F.lit(dc).alias("dc"))
            for dl in (-1, 0, 1)
            for dc in (-1, 0, 1)
            if not (dl == 0 and dc == 0)
        ]
    )
    nbrs = (
        core.select("node", "cl", "co", F.explode(offsets).alias("o"))
        .select(
            "node",
            (F.col("cl") + F.col("o.dl")).alias("ncl"),
            (F.col("co") + F.col("o.dc")).alias("nco"),
        )
        .filter(
            (F.col("ncl") >= 0) & (F.col("ncl") <= 169)
            & (F.col("nco") >= 0) & (F.col("nco") <= 359)
        )
        .select("node", (F.col("ncl") * 360 + F.col("nco")).alias("nbr"))
    )
    edges = nbrs.join(
        core.select(F.col("node").alias("nbr")), "nbr"
    ).select(F.col("node").alias("src"), F.col("nbr").alias("dst"))
    lab = connected_components(edges).withColumnRenamed("node", "lnode")
    return (
        core.join(lab, core.node == F.col("lnode"), "left")
        .select(
            F.coalesce(F.col("component"), F.col("node")).alias("cluster_id"),
            "cnt",
        )
        .groupBy("cluster_id")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_cells"),
            bigint(F.sum("cnt")).alias("n_points"),
        )
    )


# --------------------------------------------------------------------------
# Chunk-level exact dedup (C4-style paragraph dedup)
# --------------------------------------------------------------------------

CHUNK_W = 16  # words per non-overlapping chunk


@op(
    "dedup_chunk_exact",
    oracle=f"""
WITH d AS (SELECT doc_id, {_duck_words()} AS ws FROM documents),
ch AS (
  SELECT doc_id, i AS chunk_idx,
         md5(array_to_string(ws[i * {CHUNK_W} + 1 : (i + 1) * {CHUNK_W}], ' ')) AS h
  FROM (SELECT doc_id, ws,
               unnest(range(0, CAST(ceil(len(ws) / {CHUNK_W}.0) AS BIGINT))) AS i
        FROM d WHERE len(ws) > 0)
),
freq AS (SELECT doc_id, chunk_idx, h,
                count(*) OVER (PARTITION BY h) AS gf
         FROM ch)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN gf > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       CAST(sum(CASE WHEN gf > 1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
         AS dup_ppm
FROM freq GROUP BY 1
""",
    category="2.11 deduplication",
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup accounting (the C4/RefinedWeb
    'paragraph dedup' pass): split each document into non-overlapping
    16-word chunks, hash each chunk, and mark chunks whose hash occurs
    more than once ANYWHERE in the corpus; per document, report chunk
    counts and the duplicated-chunk share (integer ppm) — the signal a
    curation pipeline uses to strip boilerplate chunks or drop
    template-heavy docs.

    Scale: chunking is map-side (slice the word array — no shuffle of
    raw text); global chunk frequency is a count() window over the
    hash partition — join-free, one hash-keyed shuffle of (doc, idx,
    md5) triples, nothing corpus-sized on any node (same shape as
    tfidf / winnowing df).  The final per-doc rollup shuffles doc
    keys only."""
    d = (
        spread(load(spark, sf_dir, "documents"))
        .select("doc_id", _words().alias("ws"))
        .filter(F.size("ws") > 0)
    )
    ch = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(ws) / {CHUNK_W}.0) as int) - 1),"
                f" i -> md5(array_join(slice(ws, i * {CHUNK_W} + 1, {CHUNK_W}), ' ')))"
            )
        ).alias("chunk_idx", "h"),
    )
    freq = ch.withColumn("gf", F.count(F.lit(1)).over(Window.partitionBy("h")))
    dup = F.when(F.col("gf") > 1, 1).otherwise(0)
    return freq.groupBy("doc_id").agg(
        bigint(F.count(F.lit(1))).alias("n_chunks"),
        bigint(F.sum(dup)).alias("n_dup_chunks"),
    ).select(
        "doc_id", "n_chunks", "n_dup_chunks",
        F.expr("n_dup_chunks * 1000000 div n_chunks").cast("bigint").alias("dup_ppm"),
    )


# --------------------------------------------------------------------------
# RAKE keyword extraction (phrase splitting via gaps-and-islands)
# --------------------------------------------------------------------------

RAKE_STOPS = ("join", "hash", "row", "batch", "scan")
_STOPS_SQL = ", ".join(f"'{s}'" for s in RAKE_STOPS)
RAKE_TOPK = 3


@op(
    "text_rake_keywords",
    oracle=f"""
WITH w AS (
  SELECT doc_id, i - 1 AS pos, ws[i] AS w,
         CASE WHEN ws[i] IN ({_STOPS_SQL}) THEN 1 ELSE 0 END AS stop
  FROM (SELECT doc_id, {_duck_words()} AS ws FROM documents),
       unnest(range(1, len(ws) + 1)) AS t(i)
),
isl AS (
  SELECT doc_id, pos, w, stop,
         sum(stop) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS island
  FROM w
),
mem AS (SELECT doc_id, island, pos, w FROM isl WHERE stop = 0),
phr AS (
  SELECT doc_id, island,
         string_agg(w, ' ' ORDER BY pos) AS phrase,
         count(*) AS n
  FROM mem GROUP BY 1, 2
),
sc AS (
  SELECT m.doc_id, m.w,
         count(*) AS freq,
         sum(p.n) AS deg
  FROM mem m JOIN phr p ON p.doc_id = m.doc_id AND p.island = m.island
  GROUP BY 1, 2
),
ps AS (
  SELECT m.doc_id, m.island,
         sum(sc.deg * 1000000 // sc.freq) AS p_score
  FROM mem m JOIN sc ON sc.doc_id = m.doc_id AND sc.w = m.w
  GROUP BY 1, 2
),
ranked AS (
  SELECT p.doc_id, p.phrase, ps.p_score,
         row_number() OVER (PARTITION BY p.doc_id
                            ORDER BY ps.p_score DESC, p.phrase ASC) AS rnk
  FROM phr p JOIN ps ON ps.doc_id = p.doc_id AND ps.island = p.island
)
SELECT doc_id, phrase, CAST(p_score AS BIGINT) AS score_ppm,
       CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {RAKE_TOPK}
""",
    category="2.11 text analysis",
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal runs of words between delimiter stopwords
    (gaps-and-islands over word positions), each word scores
    degree/frequency within its document, and a phrase scores the sum
    of its word scores; top-3 phrases per doc.

    The synthetic corpus has no natural function words, so the
    delimiter set is a fixed 5-word list from the fixture vocabulary —
    the algorithm's mechanics (phrase segmentation, degree/freq
    scoring, ranked extraction) are what this op pins.  Scores are
    integer ppm (deg*1e6 div freq) summed exactly, and the per-doc
    ranking tie-breaks on the phrase text — deterministic in both
    engines.

    Scale: everything partitions by doc_id — the islands window, the
    phrase rollup, word scores, and the final WindowGroupLimit top-k
    all ride ONE doc-keyed shuffle; no corpus-global state at all."""
    w = (
        spread(load(spark, sf_dir, "documents"))
        .select("doc_id", F.posexplode(_words()).alias("pos", "w"))
        .withColumn("stop", F.col("w").isin(*RAKE_STOPS).cast("int"))
    )
    isl = w.withColumn(
        "island",
        F.sum("stop").over(
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    mem = isl.filter(F.col("stop") == 0).select("doc_id", "island", "pos", "w")
    phr = mem.groupBy("doc_id", "island").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "w"))), lambda s: s.w
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("n"),
    )
    sc = (
        mem.join(phr.select("doc_id", "island", "n"), ["doc_id", "island"])
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("freq"), F.sum("n").alias("deg"))
        .withColumn("w_score", F.expr("deg * 1000000 div freq"))
    )
    ps = (
        mem.join(sc.select("doc_id", "w", "w_score"), ["doc_id", "w"])
        .groupBy("doc_id", "island")
        .agg(F.sum("w_score").alias("p_score"))
    )
    ranked = phr.join(ps, ["doc_id", "island"]).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.col("p_score").desc(), F.col("phrase").asc()
            )
        ),
    )
    return ranked.filter(F.col("rnk") <= RAKE_TOPK).select(
        "doc_id", "phrase", bigint(F.col("p_score")).alias("score_ppm"),
        bigint(F.col("rnk")).alias("rnk"),
    )


# --------------------------------------------------------------------------
# Spark 4 Python DataSource API + iterator-form pandas UDF
# --------------------------------------------------------------------------


@op(
    "scan_python_datasource",
    oracle="""
SELECT CAST(i AS BIGINT) AS i, CAST(i * i AS BIGINT) AS sq
FROM range(0, 1000) t(i)
""",
    category="2.1 scans/sources/sinks",
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom PYTHON DataSource (the Spark 4 `pyspark.sql.datasource`
    API): a user-defined source with its own partition planning and
    per-partition reader — the extension point for ingesting from
    systems Spark has no built-in connector for (internal APIs, custom
    binary stores) while keeping the scan DISTRIBUTED (each
    InputPartition reads independently on an executor).

    The demo source emits a deterministic integer sequence across 8
    planned partitions; the oracle recomputes it relationally, so a
    partition-planning bug (dropped/duplicated partition) breaks the
    hash."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _SquaresReader(DataSourceReader):
        def partitions(self):
            return [InputPartition(p) for p in range(8)]

        def read(self, partition):
            p = partition.value
            for i in range(p * 125, (p + 1) * 125):
                yield (i, i * i)

    class _SquaresSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "deterministic_squares"

        def schema(self) -> str:
            return "i bigint, sq bigint"

        def reader(self, schema):
            return _SquaresReader()

    try:
        spark.dataSource.register(_SquaresSource)
    except Exception:
        pass  # already registered in this session
    return spark.read.format("deterministic_squares").load()


@op(
    "udf_pandas_iter_scalar",
    oracle="""
SELECT event_id,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
FROM events
""",
    category="2.10 UDF surface",
)
def udf_pandas_iter_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF (SCALAR_ITER) — the batch-reuse
    variant of the vectorized UDF: the function body runs ONCE per
    partition around the batch loop, which is where a real pipeline
    amortizes expensive init (model load, tokenizer build) across all
    Arrow batches instead of per batch.  The work itself (half-up
    cent quantization) is numeric so the oracle replays it exactly."""
    @F.pandas_udf("bigint")
    def cents(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # per-partition init would happen here, once
        import numpy as np

        for s in batches:
            # NULL in -> NULL out: astype("int64") on NaN silently
            # yields int64 min (caught by the round-8 NULL-payload
            # sweep as -9223372036854775808 where the oracle has
            # NULL); a masked IntegerArray round-trips NULL through
            # Arrow instead
            mask = s.isna().to_numpy()
            f = np.floor(np.nan_to_num(s.to_numpy(dtype="float64")) * 100 + 0.5)
            yield pd.Series(pd.arrays.IntegerArray(f.astype("int64"), mask))

    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", cents(F.col("value")).alias("vc"))


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4) + native XML source
# --------------------------------------------------------------------------


@op(
    "sql_recursive_cte",
    oracle="""
WITH RECURSIVE months(m) AS (
  SELECT CAST(date_trunc('month', (SELECT min(CAST(o_orderdate AS DATE)) FROM orders)) AS DATE)
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
  WHERE m < (SELECT date_trunc('month', max(CAST(o_orderdate AS DATE))) FROM orders)
)
SELECT m AS month,
       CAST(count(o_orderkey) AS BIGINT) AS n_orders
FROM months
LEFT JOIN orders ON CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) = m
GROUP BY 1
""",
    category="2.8 scalar functions",
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (new in Spark 4): a recursive month spine from
    min to max order date, left-joined to per-month order counts —
    the standard complete-calendar query, expressed with the engine's
    own recursion instead of a driver-side sequence() (the
    calendar_spine_join op is the non-recursive formulation; this op
    pins the recursive-SQL surface itself, which DuckDB shares
    verbatim).

    Scale: the recursion generates O(months) rows on the driver-side
    plan — depth is bounded by the data's time span, and the join +
    aggregate are the usual keyed shuffle.  The date BOUNDS are hoisted
    into literals by one scalar aggregate first (round-4: leaving them
    as subqueries inside the recursive arm re-ran the full orders scan
    once PER RECURSION STEP — ~80 scans, 17.6 s at 10x; with hoisted
    bounds the op is one bounds scan + one join scan, 1.6 s).  The
    2-value collect is a scalar, not data, on the driver."""
    orders = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_rcte")
    lo, hi = orders.select(
        F.date_trunc("month", F.min(F.col("o_orderdate").cast("date"))).cast("date"),
        F.date_trunc("month", F.max(F.col("o_orderdate").cast("date"))).cast("date"),
    ).first()
    # Recursion depth must not scale 1:1 with the data's time span:
    # Spark's cteRecursionLevelLimit defaults to 100 levels, and a
    # month-per-step spine dies on any warehouse spanning >100 months
    # (round-8 degenerate-shape gate: one appended 2023 order against
    # the 1992-min fixture span raised RECURSION_LEVEL_LIMIT_EXCEEDED).
    # The spine now strides 12 months per recursive step and explodes
    # each stride into its months — same output, depth = span/12
    # (level-limit-safe to a 100-year span), recursive surface still
    # exercised.  The DuckDB oracle keeps the plain month recursion
    # (no level limit there).
    return spark.sql(
        f"""
WITH RECURSIVE strides(y) AS (
  SELECT DATE'{lo.isoformat()}'
  UNION ALL
  SELECT CAST(y + INTERVAL 12 MONTH AS DATE) FROM strides
  WHERE CAST(y + INTERVAL 12 MONTH AS DATE) <= DATE'{hi.isoformat()}'
),
months AS (
  SELECT explode(sequence(
           y,
           least(CAST(y + INTERVAL 11 MONTH AS DATE), DATE'{hi.isoformat()}'),
           INTERVAL 1 MONTH)) AS m
  FROM strides
)
SELECT m AS month,
       CAST(count(o_orderkey) AS BIGINT) AS n_orders
FROM months
LEFT JOIN orders_rcte
  ON CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) = m
GROUP BY 1
"""
    )


@op(
    "scan_xml_roundtrip",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders WHERE o_orderkey % 7 = 0
GROUP BY 1
""",
    category="2.1 scans/sources/sinks",
)
def scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML publish + schema-on-read ingest round trip (XML
    support is built into Spark 4 — no spark-xml package): write a
    deterministic orders slice as row-tagged XML, read it back with an
    explicit schema, aggregate, and hash-check against the same
    aggregate on the source table (the lossless-cycle oracle class) —
    a row dropped by tag mismatch or a double mangled by text
    round-tripping breaks the hash."""
    out = scratch_dir(prefix="xmlsrc_") + "/orders"
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    (
        o.write.format("xml")
        .option("rootTag", "orders")
        .option("rowTag", "order")
        .mode("overwrite")
        .save(out)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "order")
        .schema("o_orderkey bigint, o_orderpriority string, o_totalprice double")
        .load(out)
    )
    return back.groupBy("o_orderpriority").agg(
        bigint(F.count(F.lit(1))).alias("n"),
        r2(F.sum("o_totalprice")).alias("total"),
    )
