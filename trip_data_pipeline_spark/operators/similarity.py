"""§2.11 similarity search + multimodal vector ops (SURVEY.md §2.11)
plus the IVF-bucketed ANN scale path the task brief asks for.

Vector math is pure higher-order functions (zip_with/aggregate) over
double-cast arrays — JVM-side, no UDFs (FIXTURES.md gotcha 5: cast
float->double BEFORE arithmetic on both engines).

Ranking parity rule (round 3, per ADVICE): ops whose RANKING (top-k /
nearest / threshold order) depends on cosine compute it from
integer-quantized vectors (``qvec``) and round it with the portable
``fr4`` — every intermediate is then bit-identical across engines, so
a rank can never flip at a rounding boundary.  Ops that merely OUTPUT
a similarity keep plain ``r4`` (a last-ulp output difference is
absorbed by rounding except at measure-zero half-boundaries, verified
empty at 3 SFs)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import bigint, nz, r4, spread
from trip_data_pipeline_spark.registry import op

CAT = "2.11 similarity search"


def as_double_vec(col: str = "embedding") -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def qvec(col: str = "embedding") -> Column:
    """Embedding quantized to integer millis — floor(x*1000 + 0.5) —
    kept as doubles.  Dot products and squared norms of these are
    exact integers well under 2^53, so their sums are EXACT in any
    partial-agg order, sqrt/divide are correctly-rounded IEEE ops on
    bit-identical inputs, and the resulting cosine is bit-identical
    across Spark and DuckDB: rankings computed on it cannot flip at a
    float boundary (round-3 ADVICE fix)."""
    return F.transform(
        F.col(col),
        lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("double"),
    )


def fr4(c: Column) -> Column:
    """Engine-portable 4-dp half-up round: floor(x*10000 + 0.5)/10000.
    Multiply/add/floor/divide are single IEEE ops, identical on both
    engines for a bit-identical input — unlike round(), whose decimal
    re-rounding path is engine-specific.  Never produces -0.0."""
    return F.floor(c * 10000 + F.lit(0.5)).cast("double") / F.lit(10000.0)


_DUCK_EMB = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
# SQL mirrors of qvec / fr4 (see qvec docstring for the exactness
# argument; list_inner_product(q, q) == l2norm-squared, both exact)
_DUCK_QEMB = "list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5))"
_DUCK_QNORM = f"sqrt(list_inner_product({_DUCK_QEMB}, {_DUCK_QEMB}))"


def duck_fr4(x: str) -> str:
    return f"floor({x} * 10000 + 0.5) / 10000.0"


@op(
    "sim_cosine_pairwise_topk",
    oracle=f"""
WITH q AS (SELECT vec_id AS q_id, {_DUCK_QEMB} AS qe, {_DUCK_QNORM} AS qn
           FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS c_id, {_DUCK_QEMB} AS ce, {_DUCK_QNORM} AS cn
           FROM embeddings),
     s AS (SELECT q_id, c_id,
                  {duck_fr4('list_inner_product(qe, ce) / (qn * cn)')} AS cos
           FROM q CROSS JOIN c
           WHERE c_id <> q_id AND qn > 0 AND cn > 0),
     r AS (SELECT q_id, c_id, cos,
                  CAST(row_number() OVER (PARTITION BY q_id
                         ORDER BY cos DESC, c_id ASC) AS BIGINT) AS rn
           FROM s)
SELECT q_id, c_id AS neighbor_id, cos, rn FROM r WHERE rn <= 5
""",
    category=CAT,
    pure=True,
)
def sim_cosine_pairwise_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 per query vector — SURVEY.md §2.11
    row 6.  Ranks on the integer-exact quantized cosine (see qvec).

    The query side (vec_id < 10) is broadcast against the candidate
    scan; per-candidate work is one fused HOF expression.  At 100 TB
    brute force is the correctness baseline; sim_ann_ivf_bucket is the
    pruned path.

    Round-10 ratio decomposition at 1000x (20M candidates, one
    session): embeddings scan floor 2.2-3.0 s, the per-row norm pass
    4.8-5.3 s, the full all-pairs fold 22-26 s — the interpreted HOF
    dot over 200M pairs IS the cost, exactly the HOF class the repo's
    crossover rule predicts.  That is the declared contract of this
    row (brute-force baseline, r4/r5 ruling): the Arrow-matmul
    evaluation of the same ranking ships as sim_cosine_topk_vectorized
    and the pruned scale path as the ANN ops, so this op stays the
    readable exact-semantics reference rather than a third copy of
    the fast path."""
    e = spread(load(spark, sf_dir, "embeddings"))
    # normalize-once: norms are computed per SIDE (n + q rows), not per
    # pair (n*q) — one fold per pair (the dot) instead of three.
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        qvec().alias("qe"),
        l2norm(qvec()).alias("qn"),
    )
    c = e.select(
        F.col("vec_id").alias("c_id"),
        qvec().alias("ce"),
        l2norm(qvec()).alias("cn"),
    )
    s = (
        F.broadcast(q.filter(F.col("qn") > 0))
        .crossJoin(c.filter(F.col("cn") > 0))
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            "c_id",
            fr4(dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        s.withColumn("rn", bigint(F.row_number().over(w)))
        .filter(F.col("rn") <= 5)
        .select("q_id", F.col("c_id").alias("neighbor_id"), "cos", "rn")
    )


@op(
    "sim_cosine_topk_vectorized",
    oracle=f"""
WITH q AS (SELECT vec_id AS q_id, {_DUCK_QEMB} AS qe, {_DUCK_QNORM} AS qn
           FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS c_id, {_DUCK_QEMB} AS ce, {_DUCK_QNORM} AS cn
           FROM embeddings),
     s AS (SELECT q_id, c_id,
                  {duck_fr4('list_inner_product(qe, ce) / (qn * cn)')} AS cos
           FROM q CROSS JOIN c
           WHERE c_id <> q_id AND qn > 0 AND cn > 0),
     r AS (SELECT q_id, c_id, cos,
                  CAST(row_number() OVER (PARTITION BY q_id
                         ORDER BY cos DESC, c_id ASC) AS BIGINT) AS rn
           FROM s)
SELECT q_id, c_id AS neighbor_id, cos, rn FROM r WHERE rn <= 5
""",
    category=CAT,
)
def sim_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5, Arrow/numpy path — the task brief's
    'vectorized Pandas UDF' variant beside sim_cosine_pairwise_topk's
    pure-HOF fold.  Identical semantics and oracle.

    Design (measured in docs/SCALE.md): a first attempt ran an einsum
    scalar UDF over the pair-expanded crossJoin — SLOWER than the HOF
    fold, because Arrow then ships O(pairs x dim) bytes (each query
    vector re-serialized once per candidate).  The right shape ships
    every candidate vector ONCE: the bounded probe block (10 vectors —
    the same rows F.broadcast(q) ships JVM-side) is collected and
    broadcast as a numpy matrix, and candidates stream through
    mapInPandas batch matmuls (C @ Q.T), O(n x dim) transfer + one
    BLAS call per batch.  At 100 TB this is the canonical embedding
    scorer: broadcast the probe block, stream candidates, keep top-k.

    Exactness: all math runs on the integer-quantized vectors — the
    matmul/norm sums are float64 sums of exact integers (exact in any
    order), sqrt/divide/floor-round are IEEE-identical — so this op,
    the HOF-fold op, and DuckDB are bit-identical."""
    import numpy as np

    e = spread(load(spark, sf_dir, "embeddings"))
    # bounded probe block: 10 rows, the exact rows F.broadcast(q)
    # would ship — materialized so numpy can hold them as a matrix
    qrows = (
        e.filter(F.col("vec_id") < 10)
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", qvec().alias("qe"))
        .orderBy("vec_id")
        .collect()
    )
    q_ids = np.array([r["vec_id"] for r in qrows], dtype="int64")
    qmat = np.array([r["qe"] for r in qrows])
    qn = np.sqrt((qmat * qmat).sum(axis=1))
    # zero-norm exclusion (round-8 degenerate-shape gate): cosine is
    # undefined for a zero vector — drop such queries/candidates on
    # BOTH engines (the HOF twin and the oracle carry the same filter;
    # before this, the numpy path silently emitted NaN cosines while
    # the ANSI HOF path raised DIVIDE_BY_ZERO on the same input)
    keep = qn > 0
    q_ids, qmat, qn = q_ids[keep], qmat[keep], qn[keep]
    bc = spark.sparkContext.broadcast((q_ids, qmat, qn))

    def score(batches):
        ids, qm, qnorm = bc.value
        for pdf in batches:
            cm = np.stack(pdf["ce"].to_numpy())
            cn = np.sqrt((cm * cm).sum(axis=1))
            ok = cn > 0  # zero-norm candidates excluded (see above)
            cm, cn = cm[ok], cn[ok]
            c_ids = pdf["c_id"].to_numpy()[ok]
            cos = cm @ qm.T / np.outer(cn, qnorm)
            cos = np.floor(cos * 10000 + 0.5) / 10000.0
            yield pd.DataFrame(
                {
                    "q_id": np.tile(ids, len(cm)),
                    "c_id": np.repeat(c_ids, len(ids)),
                    "cos": cos.reshape(-1),
                }
            )

    # NULL embeddings dropped before the kernel (np.stack(None)
    # raises; the HOF twin and the oracle drop them via the NULL-
    # propagating norm > 0 filter — same row set, round-8 NULL sweep)
    c = (
        e.filter(F.col("embedding").isNotNull())
        .select(F.col("vec_id").alias("c_id"), qvec().alias("ce"))
    )
    s = c.mapInPandas(score, "q_id bigint, c_id bigint, cos double").filter(
        F.col("c_id") != F.col("q_id")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        s.withColumn("rn", bigint(F.row_number().over(w)))
        .filter(F.col("rn") <= 5)
        .select("q_id", F.col("c_id").alias("neighbor_id"), "cos", "rn")
    )


@op(
    "sim_knn_label_vote",
    oracle=f"""
WITH q AS (SELECT vec_id AS q_id, {_DUCK_QEMB} AS qe, {_DUCK_QNORM} AS qn
           FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS c_id, label, {_DUCK_QEMB} AS ce, {_DUCK_QNORM} AS cn
           FROM embeddings),
     s AS (SELECT q_id, c_id, label,
                  {duck_fr4('list_inner_product(qe, ce) / (qn * cn)')} AS cos
           FROM q CROSS JOIN c
           WHERE c_id <> q_id AND qn > 0 AND cn > 0),
     r AS (SELECT q_id, c_id, label, cos,
                  row_number() OVER (PARTITION BY q_id
                         ORDER BY cos DESC, c_id ASC) AS rn
           FROM s)
SELECT q_id, c_id AS neighbor_id, label AS predicted_label, cos
FROM r WHERE rn = 1
""",
    category=CAT,
)
def sim_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-NN label assignment per query vector — SURVEY.md §2.11 row 7.
    Ranks on the integer-exact quantized cosine (see qvec)."""
    e = spread(load(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        qvec().alias("qe"),
        l2norm(qvec()).alias("qn"),
    )
    c = e.select(
        F.col("vec_id").alias("c_id"),
        "label",
        qvec().alias("ce"),
        l2norm(qvec()).alias("cn"),
    )
    s = (
        F.broadcast(q.filter(F.col("qn") > 0))
        .crossJoin(c.filter(F.col("cn") > 0))
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            "c_id",
            "label",
            fr4(dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "q_id",
            F.col("c_id").alias("neighbor_id"),
            F.col("label").alias("predicted_label"),
            "cos",
        )
    )


@op(
    "sim_ann_ivf_bucket",
    oracle=f"""
WITH e AS (SELECT vec_id, label, {_DUCK_QEMB} AS emb, {_DUCK_QNORM} AS nrm,
                  CAST(embedding[1] > 0 AS INT) * 4
                + CAST(embedding[2] > 0 AS INT) * 2
                + CAST(embedding[3] > 0 AS INT) AS bucket
           FROM embeddings),
     q AS (SELECT vec_id AS q_id, emb AS qe, nrm AS qn, bucket
           FROM e WHERE vec_id < 20),
     s AS (SELECT q.q_id, e.vec_id AS c_id,
                  {duck_fr4('list_inner_product(q.qe, e.emb) / (q.qn * e.nrm)')} AS cos
           FROM q JOIN e ON e.bucket = q.bucket AND e.vec_id <> q.q_id
           WHERE q.qn > 0 AND e.nrm > 0),
     r AS (SELECT q_id, c_id, cos,
                  CAST(row_number() OVER (PARTITION BY q_id
                         ORDER BY cos DESC, c_id ASC) AS BIGINT) AS rn
           FROM s)
SELECT q_id, c_id AS neighbor_id, cos, rn FROM r WHERE rn <= 3
""",
    category=CAT,
)
def sim_ann_ivf_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate NN: octant coarse quantizer (sign of the
    first 3 dims) -> equi-join on bucket -> per-bucket brute force —
    the task-brief ANN scale path.

    The O(n^2) cross join becomes an equality join on the bucket key:
    at 100 TB candidates are co-partitioned by bucket and each probe
    touches ~n/2^b of the corpus.  A real IVF uses learned centroids;
    the octant quantizer keeps it deterministic and SQL-checkable
    (recall vs brute force is property-tested).  Ranks on the
    integer-exact quantized cosine (see qvec)."""
    e = spread(load(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "label",
        qvec().alias("emb"),
        (
            (F.col("embedding").getItem(0) > 0).cast("int") * 4
            + (F.col("embedding").getItem(1) > 0).cast("int") * 2
            + (F.col("embedding").getItem(2) > 0).cast("int")
        ).alias("bucket"),
    )
    e = e.withColumn("nrm", l2norm(F.col("emb")))
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("qe"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    s = (
        F.broadcast(q.filter(F.col("qn") > 0))
        .join(e.filter(F.col("nrm") > 0), ["bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            fr4(dot(F.col("qe"), F.col("emb")) / (F.col("qn") * F.col("nrm"))).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        s.withColumn("rn", bigint(F.row_number().over(w)))
        .filter(F.col("rn") <= 3)
        .select("q_id", F.col("c_id").alias("neighbor_id"), "cos", "rn")
    )


@op(
    "multimodal_vector_norm",
    oracle=f"""
WITH e AS (SELECT vec_id, label, {_DUCK_EMB} AS emb FROM embeddings)
SELECT vec_id, label,
       round(sqrt(list_aggregate(list_transform(emb, x -> x * x), 'sum')), 4) AS l2,
       CASE WHEN round(list_aggregate(emb, 'sum') / len(emb), 4) = 0
            THEN CAST(0.0 AS DOUBLE)
            ELSE round(list_aggregate(emb, 'sum') / len(emb), 4) END          AS mean_val,
       list_aggregate(emb, 'min')                                             AS min_val,
       list_aggregate(emb, 'max')                                             AS max_val
FROM e
""",
    category=CAT,
)
def multimodal_vector_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm and dim stats via HOFs — SURVEY.md §2.11
    row 8.  min/max are raw float-origin elements: projected UNROUNDED
    (exact across engines; rounding them at 4 dp hits shortest-repr
    half-boundaries — observed at sf0.1).  l2/mean are derived reals
    where 4 dp rounding is tie-free."""
    e = spread(load(spark, sf_dir, "embeddings"))
    emb = as_double_vec()
    return e.select(
        "vec_id",
        "label",
        r4(l2norm(emb)).alias("l2"),
        nz(
            r4(
                F.aggregate(emb, F.lit(0.0), lambda s, x: s + x)
                / F.size("embedding")
            )
        ).alias("mean_val"),
        F.array_min(emb).alias("min_val"),
        F.array_max(emb).alias("max_val"),
    )


@op(
    "multimodal_join_doc_vec",
    oracle=f"""
SELECT doc_id, lang, label, n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       round(sqrt(list_aggregate(
         list_transform({_DUCK_EMB}, x -> x * x), 'sum')), 4) AS l2
FROM documents JOIN embeddings ON vec_id = doc_id
""",
    category=CAT,
)
def multimodal_join_doc_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join text table with its embedding table (1:1 on id), combining
    text stats and vector stats — SURVEY.md §2.11 row 9."""
    d = spread(load(spark, sf_dir, "documents"))
    e = spread(load(spark, sf_dir, "embeddings"))
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "label",
        "n_chars",
        bigint(F.size(F.split(F.col("text"), " "))).alias("n_tokens"),
        r4(l2norm(as_double_vec())).alias("l2"),
    )


@op(
    "embed_quantize_int8",
    oracle="""
SELECT vec_id,
       CAST(floor(CAST(list_aggregate(embedding, 'min') AS DOUBLE) * 10000 + 0.5)
            AS BIGINT) AS v_min_1e4,
       CAST(floor(CAST(list_aggregate(embedding, 'max') AS DOUBLE) * 10000 + 0.5)
            AS BIGINT) AS v_max_1e4,
       array_to_string(list_transform(embedding, x -> CAST(CAST(coalesce(
           floor((CAST(x AS DOUBLE) - CAST(list_aggregate(embedding, 'min') AS DOUBLE))
                 / nullif(CAST(list_aggregate(embedding, 'max') AS DOUBLE)
                          - CAST(list_aggregate(embedding, 'min') AS DOUBLE), 0)
                 * 255 + 0.5) - 128, 0) AS INTEGER) AS VARCHAR)), ',') AS q
FROM embeddings
""",
    category=CAT,
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization (embedding storage compression):
    min/max scale to [-128, 127] via floor(x+0.5) — floor-based so the
    rounding rule is engine-independent, all arithmetic in float64 on
    both sides.  The int8 code vector is projected comma-joined (the
    driver's pandas canonicalizer cannot sort raw ArrayType cells —
    CORRECTNESS_r03 ERR).  Pure array HOFs: one codegen projection, no shuffle,
    no Python — at 100 TB this is a map-only pass that cuts vector
    bytes 4x before the ANN index build."""
    emb = load(spark, sf_dir, "embeddings")
    # every intermediate in float64 on BOTH engines: float32 arithmetic
    # vs float64 promotion disagrees by 1 ulp exactly at a floor
    # boundary on ~1/2000 vectors (found by the sf0.1 gate)
    mn = F.array_min("embedding").cast("double")
    mx = F.array_max("embedding").cast("double")
    rng = F.nullif(mx - mn, F.lit(0.0))
    return emb.select(
        "vec_id",
        F.floor(mn * 10000 + 0.5).cast("bigint").alias("v_min_1e4"),
        F.floor(mx * 10000 + 0.5).cast("bigint").alias("v_max_1e4"),
        F.array_join(
            F.transform(
                "embedding",
                lambda x: F.coalesce(
                    F.floor((x.cast("double") - mn) / rng * 255 + 0.5) - 128,
                    F.lit(0),
                )
                .cast("int")
                .cast("string"),
            ),
            ",",
        ).alias("q"),
    )
