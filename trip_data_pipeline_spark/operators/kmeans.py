"""Iterative k-means (Lloyd) over the embedding column — exact
integer arithmetic so the full iterative algorithm hash-checks
against a DuckDB oracle.

The parity trick: float distance sums are order-dependent, so instead
every vector component is quantized ONCE to integer micro-units
(`round(v * 1e6)` — identical IEEE product + round on both engines),
and from there distances are exact BIGINT sums of squares and
centroids are exact integer floor-division means.  No float exists in
the loop, so assignment argmins can never flip cross-engine.

Init is deterministic (the k lowest vec_ids); ITERS is fixed so both
engines run the same number of Lloyd steps (the oracle unrolls them
as CTEs).

Scale notes (100 TB): per iteration, assignment is a broadcast join
of the k×dims centroid table against the flattened vectors (map-side,
no shuffle of the big side) followed by one groupBy (vec_id) shuffle;
the centroid update aggregates k×dims cells — partial aggregation
does almost all of it map-side.  `localCheckpoint` per iteration
truncates the growing lineage exactly like graph.py's component loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import bigint
from trip_data_pipeline_spark.registry import op

K = 4
ITERS = 3


def _flat_sql() -> str:
    return """
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS vi
  FROM embeddings
"""


def _iter_sql(i: int) -> str:
    """One unrolled Lloyd step: assign to nearest centroid c{i-1},
    then recompute centroids c{i} as exact integer floor-div means."""
    return f"""
a{i} AS (
  SELECT vec_id, c, d FROM (
    SELECT f.vec_id, c.c, sum((f.vi - c.ci) * (f.vi - c.ci)) AS d,
           row_number() OVER (PARTITION BY f.vec_id
                              ORDER BY sum((f.vi - c.ci) * (f.vi - c.ci)), c.c)
             AS rk
    FROM flat f JOIN c{i - 1} c ON f.pos = c.pos
    GROUP BY f.vec_id, c.c
  ) WHERE rk = 1
),
c{i} AS (
  SELECT a.c, f.pos, sum(f.vi) // count(*) AS ci
  FROM a{i} a JOIN flat f ON a.vec_id = f.vec_id
  GROUP BY a.c, f.pos
)"""


@op(
    "kmeans_lloyd_int",
    oracle=f"""
WITH flat AS ({_flat_sql()}),
c0 AS (SELECT vec_id AS c, pos, vi AS ci FROM flat WHERE vec_id < {K}),
{",".join(_iter_sql(i).lstrip() for i in range(1, ITERS + 1))}
SELECT CAST(c AS BIGINT) AS cluster,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(d) AS BIGINT) AS inertia_sq_micro
FROM a{ITERS} GROUP BY c ORDER BY cluster
""",
    category="graph / iterative",
)
def kmeans_lloyd_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means via Lloyd iterations in exact integer micro-space
    (module docstring): deterministic init, fixed {ITERS} iterations,
    output = per-cluster size + exact integer inertia.  The DuckDB
    oracle unrolls the identical iterations as CTEs, so the hash
    check covers every assignment of every round."""
    emb = load(spark, sf_dir, "embeddings")
    flat = (
        emb.select("vec_id", F.posexplode("embedding"))
        .select(
            "vec_id",
            (F.col("pos") + 1).alias("pos"),
            F.round(F.col("col").cast("double") * 1_000_000)
            .cast("bigint")
            .alias("vi"),
        )
        .localCheckpoint()
    )
    cent = flat.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("c"), "pos", F.col("vi").alias("ci")
    )
    assign = None
    for _ in range(ITERS):
        dist = (
            flat.join(F.broadcast(cent), "pos")
            .groupBy("vec_id", "c")
            .agg(F.sum((F.col("vi") - F.col("ci")) * (F.col("vi") - F.col("ci"))).alias("d"))
        )
        w = Window.partitionBy("vec_id").orderBy("d", "c")
        assign = (
            dist.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vec_id", "c", "d")
            .localCheckpoint()
        )
        cent = (
            assign.join(flat, "vec_id")
            .groupBy("c", "pos")
            .agg(F.expr("sum(vi) div count(*)").alias("ci"))
        )
    return (
        assign.groupBy(bigint(F.col("c")).alias("cluster"))
        .agg(
            bigint(F.count("*")).alias("n_members"),
            bigint(F.sum("d")).alias("inertia_sq_micro"),
        )
        .orderBy("cluster")
    )
