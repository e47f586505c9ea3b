"""Training-data preparation operators, second tranche: blocked
fuzzy dedup, deterministic hash-based dataset splits, per-dimension
embedding normalization, and market-basket co-occurrence.

These extend the §2.11 training-pipeline surface (dedup / similarity /
text) with the remaining prep patterns a 100 TB corpus pipeline runs:

- **Blocking** is the scale story for fuzzy dedup: pairwise edit
  distance is O(n²), so candidates are first partitioned into cheap
  blocks (language × length bucket) and the quadratic comparison only
  happens WITHIN a block.  At 100 TB the block key is the shuffle key;
  block sizes are bounded by construction, so no executor ever sees a
  quadratic blow-up (cf. standard entity-resolution blocking).
- **Hash splits** must be deterministic and engine-independent: md5 is
  bit-identical everywhere (unlike engine-native `hash()`), so
  train/valid/holdout membership is reproducible across engines, runs,
  and cluster sizes — the property a training pipeline actually needs.
- **Z-score normalization** of an embedding column is one explode +
  one 64-row stats aggregate joined back (broadcast) — no UDF.
- **Basket affinity** bounds its self-join fan-out by the per-order
  distinct-brand count (small by construction), the standard trick
  that keeps pairwise co-occurrence linear in orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import bigint, nz, r4
from trip_data_pipeline_spark.registry import op

EDIT_MAX = 20  # head-40-chars edit distance at/below this = near-dup pair


@op(
    "dedup_blocked_editdist",
    oracle=f"""
WITH b AS (
  SELECT doc_id, lang, n_chars // 50 AS bkt, substr(text, 1, 3) AS pfx,
         substr(text, 1, 40) AS head
  FROM documents
)
SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
       CAST(levenshtein(a.head, b2.head) AS BIGINT) AS dist
FROM b a
JOIN b b2 ON a.lang = b2.lang AND a.bkt = b2.bkt AND a.pfx = b2.pfx
         AND a.doc_id < b2.doc_id
WHERE levenshtein(a.head, b2.head) <= {EDIT_MAX}
ORDER BY doc_a, doc_b
""",
    category="2.11 deduplication",
)
def dedup_blocked_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup pairs via blocked edit distance: block documents
    by (lang, length-bucket, 3-char head prefix), compare 40-char
    heads pairwise only within a block, keep pairs at distance <= 20.
    The block key bounds the quadratic stage — the join shuffles both
    sides on the key and each block's pair expansion happens locally,
    so cost is sum(block²), not corpus².  The prefix component is the
    part that keeps block sizes (and join parallelism = #distinct
    keys) growing WITH the corpus instead of blocks growing
    quadratically inside a fixed key set — measured 10x-replica
    evidence in docs/SCALE.md.  Recall trade-off (near-dups differing
    in the first 3 chars are missed) is the standard blocking
    compromise; multi-pass blocking on different keys is the recall
    fix, same plan shape per pass."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.expr("n_chars div 50").alias("bkt"),
        F.substring("text", 1, 3).alias("pfx"),
        F.substring("text", 1, 40).alias("head"),
    )
    a = d.alias("a")
    b = d.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.pfx") == F.col("b.pfx"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(dist <= EDIT_MAX)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            bigint(dist).alias("dist"),
        )
        .orderBy("doc_a", "doc_b")
    )


@op(
    "split_train_holdout",
    oracle="""
WITH bucketed AS (
  SELECT doc_id, n_chars,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
           % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'valid'
            ELSE 'holdout' END          AS split,
       CAST(count(*) AS BIGINT)        AS n_docs,
       CAST(sum(n_chars) AS BIGINT)    AS total_chars,
       CAST(min(doc_id) AS BIGINT)     AS min_doc_id,
       CAST(max(doc_id) AS BIGINT)     AS max_doc_id
FROM bucketed GROUP BY split ORDER BY split
""",
    category="2.11 text analysis",
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/holdout split: bucket =
    first 16 md5 bits of the doc id, mod 100.  md5 is bit-identical
    across engines/JVMs/runs (engine-native hash() is NOT), so the
    SAME document lands in the SAME split on any engine at any
    cluster size — the reproducibility property a training pipeline
    needs.  Pure narrow projection + one tiny aggregate: the split
    itself never shuffles the corpus."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    return (
        d.select(
            F.when(bucket < 80, "train")
            .when(bucket < 90, "valid")
            .otherwise("holdout")
            .alias("split"),
            "n_chars",
            "doc_id",
        )
        .groupBy("split")
        .agg(
            bigint(F.count("*")).alias("n_docs"),
            bigint(F.sum("n_chars")).alias("total_chars"),
            bigint(F.min("doc_id")).alias("min_doc_id"),
            bigint(F.max("doc_id")).alias("max_doc_id"),
        )
        .orderBy("split")
    )


@op(
    "embed_zscore_normalize",
    oracle="""
WITH flat AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
stats AS (
  SELECT pos, round(avg(v), 6) AS mu, round(stddev_pop(v), 6) AS sigma
  FROM flat GROUP BY pos
)
SELECT vec_id, CAST(f.pos AS BIGINT) AS pos,
       CASE WHEN round((v - mu) / sigma, 4) = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE round((v - mu) / sigma, 4) END AS z
FROM flat f JOIN stats s ON f.pos = s.pos
ORDER BY vec_id, pos
""",
    category="2.11 similarity search",
)
def embed_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score feature normalization of the embedding
    column: posexplode -> 64-row (mean, stddev_pop) aggregate ->
    broadcast join back -> standardize.  No UDF anywhere; the stats
    table is O(dims) regardless of corpus size, so the join is always
    a broadcast and the whole op is one shuffle (the stats groupBy).
    Mean/stddev are rounded to 6 dp BEFORE the division so both
    engines standardize with bit-identical parameters (sum-order noise
    lives below 1e-12, far under the grid)."""
    emb = load(spark, sf_dir, "embeddings")
    flat = emb.select("vec_id", F.posexplode("embedding")).select(
        "vec_id",
        (F.col("pos") + 1).alias("pos"),
        F.col("col").cast("double").alias("v"),
    )
    stats = flat.groupBy("pos").agg(
        F.round(F.avg("v"), 6).alias("mu"),
        F.round(F.stddev_pop("v"), 6).alias("sigma"),
    )
    return (
        flat.join(F.broadcast(stats), "pos")
        .select(
            "vec_id",
            bigint(F.col("pos")).alias("pos"),
            nz(r4((F.col("v") - F.col("mu")) / F.col("sigma"))).alias("z"),
        )
        .orderBy("vec_id", "pos")
    )


MIN_SUPPORT = 5


@op(
    "basket_pair_affinity",
    oracle=f"""
WITH ob AS (
  SELECT DISTINCT l_orderkey AS ok, p_brand AS b
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
n AS (SELECT count(DISTINCT ok) AS n_orders FROM ob),
freq AS (SELECT b, count(*) AS c FROM ob GROUP BY b),
pairs AS (
  SELECT a.b AS brand_a, b2.b AS brand_b, count(*) AS n_ab
  FROM ob a JOIN ob b2 ON a.ok = b2.ok AND a.b < b2.b
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, CAST(n_ab AS BIGINT) AS n_ab,
       round(CAST(n_ab * n_orders AS DOUBLE) / (fa.c * fb.c), 4) AS lift
FROM pairs
JOIN freq fa ON fa.b = brand_a
JOIN freq fb ON fb.b = brand_b, n
WHERE n_ab >= {MIN_SUPPORT}
ORDER BY brand_a, brand_b
""",
    category="composite queries",
)
def basket_pair_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair affinity: for every brand pair co-occurring
    in >= 5 orders, the co-occurrence count and lift
    (P(ab)/(P(a)P(b))).  The self-join is keyed on the order — both
    sides share the l_orderkey shuffle partitioning, and per-order
    fan-out is bounded by the distinct-brand count of one basket, so
    the pair stage stays linear in orders at any scale.  Lift divides
    exact integer operands once, then rounds — engine-identical."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    # materialize the distinct basket relation once: four consumers
    # (both self-join sides, freq, n_orders) would otherwise each
    # re-scan lineitem and re-run the distinct shuffle.
    ob = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .distinct()
        .localCheckpoint()
    )
    n_orders = ob.agg(F.count_distinct("ok").alias("n_orders"))
    freq = ob.groupBy("b").agg(F.count("*").alias("c"))
    a = ob.alias("a")
    b2 = ob.alias("b2")
    pairs = (
        a.join(b2, (F.col("a.ok") == F.col("b2.ok")) & (F.col("a.b") < F.col("b2.b")))
        .groupBy(F.col("a.b").alias("brand_a"), F.col("b2.b").alias("brand_b"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= MIN_SUPPORT)
    )
    fa = freq.select(F.col("b").alias("brand_a"), F.col("c").alias("ca"))
    fb = freq.select(F.col("b").alias("brand_b"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(fa), "brand_a")
        .join(F.broadcast(fb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            bigint(F.col("n_ab")).alias("n_ab"),
            F.round(
                (F.col("n_ab") * F.col("n_orders")).cast("double")
                / (F.col("ca") * F.col("cb")),
                4,
            ).alias("lift"),
        )
        .orderBy("brand_a", "brand_b")
    )
