"""Iterative graph operators: connected components over a
co-occurrence graph.

This is the dedup-cluster-resolution shape for a training-data
pipeline: near-dup candidate pairs (from MinHash/SimHash banding)
form edges, and connected components give the duplicate clusters from
which one survivor per cluster is kept.  The fixture graph links parts
that co-occur in the same (sampled) order — sparse, many components.

Spark has no recursive CTE, so components are computed by Pregel-style
iterative min-label propagation: every node starts labelled with its
own id, and each round every node takes the min of its own label and
its neighbors' labels (one hop), then short-cuts via pointer jumping
(label := label-of-label), so chains collapse exponentially and the
loop converges in O(log diameter) rounds.  Both tricks are the classic
MapReduce/Spark formulation (cf. Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14; pointer jumping from
Shiloach-Vishkin).

Scale notes (100 TB): each superstep is one shuffle-join of the edge
list with the (node,label) map on `node` plus a min-aggregate on
`dst` — both hash-partitioned on the same keys, so with a persisted,
co-partitioned edge list the per-round cost is one co-located join +
one partial/final agg.  `localCheckpoint()` truncates the lineage each
round so the plan does not grow with iteration count (driver-side
iteration is inherent to the algorithm, not a collect of data rows:
only the 1-row convergence aggregate comes back to the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import bigint
from trip_data_pipeline_spark.registry import op

CAT = "graph / iterative"

MAX_ROUNDS = 50


def _drop_plan_stats(df: DataFrame) -> DataFrame:
    """Rebuild `df` over its own internal row RDD, dropping propagated
    plan statistics and column metadata (round-12 optimization).

    `Dataset.localCheckpoint` carries the optimized plan's statistics
    into the resulting `LogicalRDD` (`originStats`), and the
    size-in-bytes estimate of a join is the PRODUCT of its children's
    — so in an iterative self-join loop the propagated `sizeInBytes`
    SQUARES every round.  The estimate is a `BigInteger`; after ~15
    rounds it holds hundreds of thousands of digits and Catalyst spends
    seconds per round on big-integer arithmetic (measured: round times
    grow geometrically while rows, plan size and lineage stay constant;
    flat after this rebuild).  `internalCreateDataFrame` wraps the SAME
    internal RDD — no data movement, no extra job — in a fresh
    `LogicalRDD` with no origin stats, so each round starts from the
    default size estimate again.  The default estimate is conservative
    (`spark.sql.defaultSizeInBytes`), which also suppresses accidental
    broadcast of the unbounded label table — the safe choice at 100 TB.
    Falls back to the plain DataFrame when the classic JVM handles are
    unavailable (e.g. Spark Connect)."""
    try:
        j = df._jdf
        spark = df.sparkSession
        new_j = spark._jsparkSession.internalCreateDataFrame(
            j.queryExecution().toRdd(), j.schema(), False
        )
        return DataFrame(new_j, spark)
    except Exception:  # pragma: no cover — classic mode always has _jdf
        return df


def _copart_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected edge list (both directions): parts co-occurring in
    the same sampled order (l_orderkey % 97 == 0 keeps the graph
    sparse enough to have many components)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 97 == 0)
        .select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    other = li.select("k", F.col("p").alias("p2"))
    return (
        li.join(other, "k")
        .filter(F.col("p") != F.col("p2"))
        .select(F.col("p").alias("src"), F.col("p2").alias("dst"))
        .distinct()
    )


def connected_components(edges: DataFrame, max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """Min-label propagation to a fixed point.

    `edges` must contain both directions of every undirected edge.
    Returns (node, component) where component == min node id reachable.
    Convergence detector: labels only ever decrease, so an unchanged
    sum(label) between rounds proves the fixed point (monotone +
    bounded below) without a row-level diff join.
    """
    # materialize the edge list once — every round re-joins it, and a
    # checkpointed copy avoids re-running the distinct-pairs build.
    # _drop_plan_stats on every checkpoint keeps the per-round
    # Catalyst cost constant (see its docstring).  Self-loops (v, v)
    # are unioned in ONCE so the hop step below is a single
    # join+aggregate: min(own label, neighbor labels) falls out of the
    # same groupBy instead of needing a per-round left join back onto
    # the label table (round 12: one fewer join per round).
    nodes = edges.select(F.col("src").alias("node")).distinct()
    edges = _drop_plan_stats(
        edges.union(nodes.select(F.col("node").alias("src"), F.col("node").alias("dst")))
        .localCheckpoint()
    )
    obs0 = Observation("cc_round_init")
    labels = _drop_plan_stats(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .observe(obs0, F.sum("label").alias("s"))
        .localCheckpoint()
    )
    # Observation piggybacks sum(label) on the checkpoint job's task
    # metrics — no separate agg job, and no partial/final shuffle
    # stage per convergence probe (round-12: one job per round instead
    # of checkpoint job + 2-stage agg job; loop 11.3 s -> 6.2 s sf0.1).
    prev_sum = obs0.get["s"]
    for rnd in range(max_rounds):
        # superstep 1: neighbor propagation (one hop along edges).
        # The self-loops in `edges` make the aggregate cover the
        # node's own label too, so this is hop = min(own, neighbors)
        # in one join + one agg.
        hop = (
            edges.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("label"))
        )
        # superstep 2: pointer jumping (label := label-of-label) —
        # collapses chains exponentially, so total rounds are
        # O(log diameter) instead of O(diameter).  Every label is a
        # node, so the self-join always matches (left join is defensive).
        jump = hop.select(F.col("node").alias("j_node"), F.col("label").alias("j_label"))
        # eager checkpoint with an Observation rider: the checkpoint
        # materialization is the round's ONLY job, and the convergence
        # sum arrives through task metrics (no agg job, no extra
        # partial/final shuffle stage).
        obs = Observation(f"cc_round_{rnd}")
        labels = _drop_plan_stats(
            hop.join(jump, hop.label == jump.j_node, "left")
            .select(
                "node",
                F.least("label", F.coalesce("j_label", "label")).alias("label"),
            )
            .observe(obs, F.sum("label").alias("s"))
            .localCheckpoint(eager=True)
        )
        cur_sum = obs.get["s"]
        # superseded label checkpoints are unpersisted asynchronously by
        # the ContextCleaner once this loop drops its reference — no
        # manual unpersist needed, at most a couple of live snapshots.
        if cur_sum == prev_sum:
            return labels.select("node", F.col("label").alias("component"))
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components: no fixed point in {max_rounds} rounds")


@op(
    "graph_connected_components",
    oracle="""
WITH RECURSIVE
op_ AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p
        FROM lineitem WHERE l_orderkey % 97 = 0),
e0 AS (SELECT a.p AS src, b.p AS dst FROM op_ a JOIN op_ b
       ON a.k = b.k AND a.p <> b.p),
n AS (SELECT DISTINCT src AS node FROM e0),
reach(node, r) AS (
  SELECT node, node FROM n
  UNION
  SELECT re.node, e.dst FROM reach re JOIN e0 e ON re.r = e.src
)
SELECT CAST(node AS BIGINT) AS node, CAST(min(r) AS BIGINT) AS component
FROM reach GROUP BY node ORDER BY node
""",
    category=CAT,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the co-part graph by iterative min-label
    propagation; the DuckDB oracle computes the same labelling via a
    recursive-CTE transitive closure (component id == min reachable
    node id on both sides).

    At-scale parity (round 9): the recursive-CTE closure materializes
    every (node, reachable-node) pair — O(sum component_size^2), 307 s
    at 3x — so the 10x and 100x records (docs/PARITY_10x.json,
    docs/PARITY_100x_subset.json, both HASH-OK) use the iterative
    temp-table label-propagation oracle in tools/parity_sweep.py
    SCALED_ORACLES, locked value-identical to this oracle at sf0.01 by
    tests/test_scaled_oracles.py."""
    edges = _copart_edges(spark, sf_dir)
    return connected_components(edges).select(
        bigint(F.col("node")).alias("node"),
        bigint(F.col("component")).alias("component"),
    ).orderBy("node")
