"""§2.20 round-5 additions (SURVEY.md §2.20): training-data pipeline
operators a 100-TB corpus build runs between crawl and tokenizer.

Provenance: the reference checkout is empty (SURVEY §0), so these rows
are specified by the task brief's training-data mandate and public
algorithm sources cited per-op (Gopher rules — Rae et al. 2021; DSIR —
Xie et al. 2023; count-min sketch — Cormode & Muthukrishnan 2005; ViT
patchify — Dosovitskiy et al. 2021).  Every op pairs a Spark plan with
a DuckDB value-hash oracle; all arithmetic is integer/ppm or 2-dp
money, per the SURVEY §5.3 parity rules.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import (
    bigint,
    r2,
    range_parts,
    scratch_dir,
    spread,
)
from trip_data_pipeline_spark.operators.dedup import _duck_hex28, _hex28
from trip_data_pipeline_spark.operators.text_ops import (
    _duck_norm,
    _duck_words,
    _norm,
    _words,
)
from trip_data_pipeline_spark.registry import OPS, op

CAT = "2.20 round-5 additions"

# Gopher-style rule thresholds (Rae et al. 2021, Table A1 shape —
# integer-exact variants): word-count band, mean-word-length band
# (cross-multiplied, no division), minimum stopword hits, max word
# length.  Failed rules accumulate into a bitmask so downstream
# filtering can attribute drops per rule, not just per doc.
_GOPHER_STOPWORDS = ("the", "a", "of", "to", "and")


@op(
    "corpus_gopher_quality_rules",
    oracle=f"""
WITH w AS (
  SELECT doc_id, {_duck_words()} AS ws, {_duck_norm()} AS nt FROM documents
),
m AS (
  SELECT doc_id,
         len(ws) AS n_words,
         length(nt) - (len(ws) - 1) AS n_tok_chars,
         len(list_filter(ws, x -> x IN ('the','a','of','to','and'))) AS stop_hits,
         list_aggregate(list_transform(ws, x -> length(x)), 'max') AS max_wlen
  FROM w
),
f AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words BETWEEN 20 AND 100000 THEN 0 ELSE 1 END
       + CASE WHEN 3 * n_words <= n_tok_chars
               AND n_tok_chars <= 10 * n_words THEN 0 ELSE 2 END
       + CASE WHEN stop_hits >= 2 THEN 0 ELSE 4 END
       + CASE WHEN max_wlen <= 15 THEN 0 ELSE 8 END AS failed_mask
  FROM m
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(failed_mask AS BIGINT) AS failed_mask,
       failed_mask = 0 AS passes
FROM f
""",
    category=CAT,
)
def corpus_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021): per
    doc, a bitmask of failed rules — word-count band [20, 1e5] (bit 1),
    mean word length in [3, 10] via the cross-multiplied band
    3n <= chars <= 10n (bit 2), >= 2 stopword hits (bit 4), max word
    length <= 15 (bit 8) — and the pass verdict.  The bitmask is the
    production shape: drop ATTRIBUTION per rule is what tunes a filter
    stack, not a bare boolean.

    Scale: map-only — one narrow projection per doc, no shuffle at
    all; the rules are integer arithmetic over the token array, so the
    whole pass rides the scan."""
    d = spread(load(spark, sf_dir, "documents"))
    ws = _words()
    m = d.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        (F.length(_norm()) - (F.size(ws) - 1)).alias("n_tok_chars"),
        F.size(
            F.filter(ws, lambda x: x.isin(*_GOPHER_STOPWORDS))
        ).alias("stop_hits"),
        F.array_max(F.transform(ws, F.length)).alias("max_wlen"),
    )
    failed = (
        F.when(F.col("n_words").between(20, 100000), 0).otherwise(1)
        + F.when(
            (3 * F.col("n_words") <= F.col("n_tok_chars"))
            & (F.col("n_tok_chars") <= 10 * F.col("n_words")),
            0,
        ).otherwise(2)
        + F.when(F.col("stop_hits") >= 2, 0).otherwise(4)
        + F.when(F.col("max_wlen") <= 15, 0).otherwise(8)
    )
    return m.select(
        "doc_id",
        bigint(F.col("n_words")).alias("n_words"),
        bigint(failed).alias("failed_mask"),
        (failed == 0).alias("passes"),
    )


# DSIR feature space: hashed unigram buckets.  64 buckets keeps the
# bucket-weight relation broadcast-sized at ANY corpus scale (the
# paper uses 10^4 hashed bigrams — same plan, bigger broadcast).
_DSIR_BUCKETS = 64


@op(
    "corpus_dsir_importance",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({_duck_words()}) AS w FROM documents
),
tb AS (
  SELECT doc_id, lang, {_duck_hex28('md5(w)', 1)} % {_DSIR_BUCKETS} AS b
  FROM tok
),
bc AS (
  SELECT b,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS en_cnt,
         count(*) AS all_cnt
  FROM tb GROUP BY b
),
bw AS (
  SELECT b,
         (1000000 * en_cnt // NULLIF(sum(en_cnt) OVER (), 0))
       - (1000000 * all_cnt // sum(all_cnt) OVER ()) AS wt
  FROM bc
)
SELECT tb.doc_id, any_value(tb.lang) AS lang,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(bw.wt) AS BIGINT) AS score
FROM tb JOIN bw USING (b)
GROUP BY tb.doc_id
ORDER BY score DESC, tb.doc_id ASC
LIMIT 100
""",
    category=CAT,
)
def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance scoring (Xie et al. 2023): rank raw docs
    by how target-like their hashed-feature distribution is.  Features
    are md5-hashed unigram buckets (engine-portable _hex28 % 64);
    bucket weight = target ppm - raw ppm as exact integers (target =
    the 'en' slice standing in for the high-quality target corpus);
    doc score = sum of its tokens' bucket weights; top-100 selection
    with doc_id tie-break.

    Scale: the feature dictionary is FIXED-SIZE (64 rows here, 10^4 in
    the paper) — it aggregates with one tiny shuffle and then
    BROADCASTS back onto the token stream, so scoring is map-side; the
    only corpus-sized shuffle is the per-doc score aggregation.  The
    ppm totals ride a window over the 64-row relation (scale-free)."""
    tok = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", "lang", F.explode(_words()).alias("w")
    )
    tb = tok.select(
        "doc_id", "lang", (_hex28(F.md5("w"), 1) % _DSIR_BUCKETS).alias("b")
    )
    bc = tb.groupBy("b").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("en_cnt"),
        F.count(F.lit(1)).alias("all_cnt"),
    )
    bw = bc.select(
        "b",
        F.expr(
            "1000000 * en_cnt div nullif(sum(en_cnt) over (), 0) "
            "- 1000000 * all_cnt div sum(all_cnt) over ()"
        ).alias("wt"),
    )
    return (
        tb.join(F.broadcast(bw), "b")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            bigint(F.count(F.lit(1))).alias("n_tokens"),
            bigint(F.sum("wt")).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(100)
    )


@op(
    "text_readability_scores",
    oracle=f"""
WITH w AS (
  SELECT doc_id, {_duck_words()} AS ws, {_duck_norm()} AS nt FROM documents
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(len(regexp_extract_all(nt, '[aeiou]+')) AS BIGINT) AS vowel_groups,
       CAST(1000000 * len(list_filter(ws, x -> length(x) >= 7)) // len(ws)
            AS BIGINT) AS long_word_ppm,
       CAST(1000000 * len(regexp_extract_all(nt, '[aeiou]+')) // len(ws)
            AS BIGINT) AS syll_word_ppm
FROM w
""",
    category=CAT,
)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer readability proxies per doc: vowel-run count (the
    classic syllable proxy — '[aeiou]+' runs cannot span the space
    separator, so the text-level count equals the per-word sum),
    long-word share (len >= 7) in ppm, and syllables-per-word in ppm.
    These are the Flesch-family inputs; with integer ppm encodings the
    scores stay engine-exact where the float formulas would not.

    Scale: map-only narrow projection (regexp_count + one array
    filter), no shuffle."""
    d = spread(load(spark, sf_dir, "documents"))
    ws = _words()
    base = d.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        F.regexp_count(_norm(), F.lit("[aeiou]+")).alias("vowel_groups"),
        F.size(F.filter(ws, lambda x: F.length(x) >= 7)).alias("n_long"),
    )
    return base.select(
        "doc_id",
        bigint(F.col("n_words")).alias("n_words"),
        bigint(F.col("vowel_groups")).alias("vowel_groups"),
        bigint(F.expr("1000000 * n_long div n_words")).alias("long_word_ppm"),
        bigint(F.expr("1000000 * vowel_groups div n_words")).alias(
            "syll_word_ppm"
        ),
    )


# ViT-style patchify grid over the PPM fixture images (16 px wide,
# 1..13 px tall): 8x4 tiles, ragged bottom tile kept (a production
# pipeline pads instead; the stats contract is identical).
_TILE_W, _TILE_H = 8, 4


@op(
    "multimodal_image_tiles",
    oracle=f"""
WITH g AS (SELECT doc_id, (doc_id % 13) + 1 AS h FROM documents),
t AS (
  SELECT doc_id, h, tx.x AS tx, ty.y AS ty
  FROM g
  CROSS JOIN (SELECT unnest(range(0, 2)) AS x) tx
  CROSS JOIN (SELECT unnest(range(0, 4)) AS y) ty
  WHERE ty.y * {_TILE_H} < h
),
py AS (
  SELECT doc_id, tx, ty,
         unnest(range(ty * {_TILE_H}, least(ty * {_TILE_H} + {_TILE_H}, h))) AS y
  FROM t
),
px AS (
  SELECT doc_id, tx, ty, y,
         unnest(range(tx * {_TILE_W}, tx * {_TILE_W} + {_TILE_W})) AS x
  FROM py
),
c AS (SELECT doc_id, tx, ty, y, x, unnest(range(0, 3)) AS ch FROM px)
SELECT doc_id,
       CAST(tx AS INT) AS tile_x, CAST(ty AS INT) AS tile_y,
       CAST(count(*) // 3 AS BIGINT) AS n_px,
       CAST(sum(CASE WHEN ch = 0
                THEN (doc_id * 31 + ((y * 16 + x) * 3 + ch)) % 256 END)
            AS BIGINT) AS sum_r,
       CAST(sum(CASE WHEN ch = 1
                THEN (doc_id * 31 + ((y * 16 + x) * 3 + ch)) % 256 END)
            AS BIGINT) AS sum_g,
       CAST(sum(CASE WHEN ch = 2
                THEN (doc_id * 31 + ((y * 16 + x) * 3 + ch)) % 256 END)
            AS BIGINT) AS sum_b
FROM c GROUP BY doc_id, tx, ty
""",
    category=CAT,
)
def multimodal_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patchify (Dosovitskiy et al. 2021): decode each PPM
    through the REAL byte-level parser, cut the pixel plane into 8x4
    tiles (ragged bottom edge kept), and emit per-tile pixel count +
    per-channel integer sums — the patch-statistics pass that feeds
    patch normalization / dead-patch filtering before ViT training.
    The oracle replays the deterministic pixel lattice arithmetically;
    the Spark side round-trips actual bytes through the decoder and a
    numpy (h, w, 3) reshape.

    Scale: map-only mapInPandas (zero exchanges) — decode + tiling
    never leaves the mapper; tiles-per-image is a constant, so output
    is O(corpus)."""
    from trip_data_pipeline_spark.operators.multimodal import (
        _decode_ppm,
        _encode_ppm,
    )

    import numpy as np

    def tile_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "tile_x": [], "tile_y": [],
                "n_px": [], "sum_r": [], "sum_g": [], "sum_b": [],
            }
            for d in pdf["doc_id"]:
                f = _decode_ppm(_encode_ppm(int(d)))
                arr = np.frombuffer(f["px"], dtype=np.uint8).reshape(
                    f["height"], f["width"], 3
                )
                for ty in range((f["height"] + _TILE_H - 1) // _TILE_H):
                    for tx in range(f["width"] // _TILE_W):
                        tile = arr[
                            ty * _TILE_H : ty * _TILE_H + _TILE_H,
                            tx * _TILE_W : tx * _TILE_W + _TILE_W,
                            :,
                        ].astype(np.int64)
                        out["doc_id"].append(int(d))
                        out["tile_x"].append(tx)
                        out["tile_y"].append(ty)
                        out["n_px"].append(tile.shape[0] * tile.shape[1])
                        out["sum_r"].append(int(tile[:, :, 0].sum()))
                        out["sum_g"].append(int(tile[:, :, 1].sum()))
                        out["sum_b"].append(int(tile[:, :, 2].sum()))
            yield pd.DataFrame(out)

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        tile_batches,
        schema=(
            "doc_id bigint, tile_x int, tile_y int, n_px bigint, "
            "sum_r bigint, sum_g bigint, sum_b bigint"
        ),
    )


@op(
    "scan_parquet_row_group_prune",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
""",
    category=CAT,
)
def scan_parquet_row_group_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-group (zone-map) pruning round trip: write orders
    range-partitioned + sorted by o_orderdate with SMALL parquet row
    groups (parquet.block.size=128 KiB), then read back through a raw
    timestamp range predicate.  Because the layout is date-sorted,
    parquet min/max statistics prune whole row groups before
    decompression — with the pushed filter asserted in
    tests/test_plans.py.  Hash-checked lossless against the same
    filter+agg on the source table.

    At 100 TB this sort-on-write + stats-prune-on-read pair is the
    single highest-leverage scan optimization there is: a day's query
    over a year's table touches ~1/365 of the row groups.  The same
    sorted layout is what layout_partition_sort publishes at directory
    granularity; this op proves the WITHIN-file granularity."""
    out = scratch_dir(prefix="rg_prune_")
    o = load(spark, sf_dir, "orders")
    (
        # Write fan-out derives from the session (range_parts — VERDICT
        # r8 item 6): a literal 4 pins the sort+write stage to 4 tasks
        # at any scale.  Pruning effectiveness is layout-local (each
        # range partition is date-sorted regardless of how many there
        # are), so the count only affects write parallelism.
        o.repartitionByRange(range_parts(spark), "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.option("parquet.block.size", 131072)
        .mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return back.groupBy("o_orderpriority").agg(
        bigint(F.count(F.lit(1))).alias("n_orders"),
        r2(F.sum("o_totalprice")).alias("revenue"),
    )


# Count-min sketch geometry: 4 hash rows x 64 counters.  The hash
# family reuses the md5-substring integers every MinHash op shares, so
# DuckDB replays the sketch bit-for-bit — a sketch op with a FULL
# value-hash oracle (vs the declared-rows-only HLL/approx ops).
_CMS_D, _CMS_W = 4, 64
_CMS_STARTS = (1, 8, 15, 22)
_CMS_PROBES = ("a", "the", "value", "data", "table")


def _duck_cms_bucket(expr: str) -> str:
    return (
        "(CASE j "
        + " ".join(
            f"WHEN {j} THEN {_duck_hex28(expr, s)}"
            for j, s in enumerate(_CMS_STARTS)
        )
        + f" END) % {_CMS_W}"
    )


@op(
    "agg_count_min_sketch",
    oracle=f"""
WITH tok AS (SELECT unnest({_duck_words()}) AS w FROM documents),
js AS (SELECT unnest(range(0, {_CMS_D})) AS j),
h AS (SELECT w, j, {_duck_cms_bucket('md5(w)')} AS b FROM tok CROSS JOIN js),
sk AS (SELECT j, b, count(*) AS c FROM h GROUP BY j, b),
pr AS (SELECT unnest(['a','the','value','data','table']) AS w),
ph AS (SELECT w, j, {_duck_cms_bucket('md5(w)')} AS b FROM pr CROSS JOIN js),
est AS (
  SELECT ph.w, min(sk.c) AS cms_est
  FROM ph JOIN sk ON sk.j = ph.j AND sk.b = ph.b
  GROUP BY ph.w
),
tr AS (SELECT w, count(*) AS true_n FROM tok GROUP BY w)
SELECT est.w AS word,
       CAST(coalesce(tr.true_n, 0) AS BIGINT) AS true_n,
       CAST(est.cms_est AS BIGINT) AS cms_est,
       CAST(est.cms_est - coalesce(tr.true_n, 0) AS BIGINT) AS overcount
FROM est LEFT JOIN tr ON tr.w = est.w
""",
    category=CAT,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) with a FULL
    value-hash oracle: 4x64 counters over the corpus token stream,
    hash family = the md5-substring integers the MinHash ops already
    share with DuckDB, so the sketch — and its one-sided overcounts —
    replay bit-for-bit in both engines.  Probes 5 common words and
    reports estimate vs truth (overcount >= 0 always; the sketch
    guarantee).  This is the counterpoint to agg_approx_distinct /
    agg_hll_sketch: when the hash family is portable, a sketch is NOT
    structurally rows-only.

    Scale: the sketch state is CONSTANT-SIZE (256 counters) — the
    groupBy(j, b) partial-aggregates map-side down to <= 256 rows per
    partition before one tiny shuffle; probes then hit a broadcast of
    the 256-row sketch.  This is exactly how a heavy-hitters pass over
    100 TB bounds memory."""
    tok = spread(load(spark, sf_dir, "documents"), min_fraction=0.25).select(
        F.explode(_words()).alias("w")
    )

    def buckets(wcol):
        return F.posexplode(
            F.array(
                *[
                    (_hex28(F.md5(wcol), s) % _CMS_W)
                    for s in _CMS_STARTS
                ]
            )
        ).alias("j", "b")

    sk = (
        tok.select(buckets(F.col("w")))
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pr = spark.createDataFrame([(w,) for w in _CMS_PROBES], "w string")
    ph = pr.select("w", buckets(F.col("w")))
    est = (
        ph.join(F.broadcast(sk), ["j", "b"])
        .groupBy("w")
        .agg(F.min("c").alias("cms_est"))
    )
    # Round-12 (guide §2.3: don't compute things you throw away): the
    # truth arm used to aggregate the WHOLE token stream by word — a
    # full distinct-token shuffle — while the left join consumes true
    # counts for exactly the 5 probe words.  Filtering to the probe set
    # before counting leaves those counts identical and turns the
    # truth arm into a constant-width aggregation; at 100 TB that is
    # the difference between a corpus-vocabulary shuffle and a 5-row
    # one (locally neutral: the sketch arm dominates at sf0.1).
    tr = (
        tok.filter(F.col("w").isin(list(_CMS_PROBES)))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    return (
        est.join(tr, "w", "left")
        .select(
            F.col("w").alias("word"),
            bigint(F.coalesce(F.col("true_n"), F.lit(0))).alias("true_n"),
            bigint(F.col("cms_est")).alias("cms_est"),
            bigint(
                F.col("cms_est") - F.coalesce(F.col("true_n"), F.lit(0))
            ).alias("overcount"),
        )
    )


# IVF list geometry: sampled seed centroids (vec_id % 50 == 0, capped
# below 400 -> at most 8 lists, >= 1 at every fixture SF).
_IVF_SEED_MOD, _IVF_SEED_CAP = 50, 400


@op(
    "embed_ivf_balance_report",
    oracle=f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS v
  FROM embeddings
),
c AS (
  SELECT vec_id AS cid, v AS cv FROM q
  WHERE vec_id % {_IVF_SEED_MOD} = 0 AND vec_id < {_IVF_SEED_CAP}
),
d AS (
  SELECT q.vec_id, c.cid,
         list_sum(list_transform(range(1, len(q.v) + 1),
           i -> (q.v[i] - c.cv[i]) * (q.v[i] - c.cv[i]))) AS dist
  FROM q CROSS JOIN c
),
a AS (
  SELECT vec_id, min(dist * {_IVF_SEED_CAP} + cid) % {_IVF_SEED_CAP} AS cid
  FROM d GROUP BY vec_id
),
n AS (SELECT cid, count(*) AS n_assigned FROM a GROUP BY cid),
tot AS (SELECT count(*) AS n_lists FROM c),
tv AS (SELECT count(*) AS n_vecs FROM a)
SELECT CAST(n.cid AS BIGINT) AS centroid_id,
       CAST(n.n_assigned AS BIGINT) AS n_assigned,
       n.n_assigned * tot.n_lists > 2 * tv.n_vecs AS over_2x_mean
FROM n, tot, tv
""",
    category=CAT,
)
def embed_ivf_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF list-balance report — the index-health check an ANN build
    runs before committing a centroid set: assign every vector to its
    nearest seed centroid (sampled rows, integer-lattice distances,
    argmin tie-broken to the lowest centroid id via the
    min(dist*CAP + cid) % CAP encoding) and report per-list occupancy
    plus a cross-multiplied >2x-mean skew flag.  Skewed lists are the
    ANN equivalent of a hot shuffle key: probe latency concentrates
    there, and the fix (split the list / re-seed) needs exactly this
    report.

    Scale: the centroid side is nlist rows (<= 8 here, 10^4-10^5 in a
    real IVF) — always broadcast; assignment is then map-side argmin
    per vector with ONE shuffle for the per-list counts.  The totals
    attach via 1-row global aggregates (bounded crossJoin)."""
    q = spread(load(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000 + 0.5).cast("bigint"),
        ).alias("v"),
    )
    c = (
        q.filter(
            (F.col("vec_id") % _IVF_SEED_MOD == 0)
            & (F.col("vec_id") < _IVF_SEED_CAP)
        )
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    d = q.crossJoin(F.broadcast(c)).select(
        "vec_id",
        "cid",
        F.aggregate(
            F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("dist"),
    )
    a = d.groupBy("vec_id").agg(
        (F.min(F.col("dist") * _IVF_SEED_CAP + F.col("cid")) % _IVF_SEED_CAP)
        .alias("cid")
    )
    n = a.groupBy("cid").agg(F.count(F.lit(1)).alias("n_assigned"))
    tot = c.agg(F.count(F.lit(1)).alias("n_lists"))
    tv = a.agg(F.count(F.lit(1)).alias("n_vecs"))
    return (
        n.crossJoin(tot)
        .crossJoin(tv)
        .select(
            bigint(F.col("cid")).alias("centroid_id"),
            bigint(F.col("n_assigned")).alias("n_assigned"),
            (
                F.col("n_assigned") * F.col("n_lists")
                > 2 * F.col("n_vecs")
            ).alias("over_2x_mean"),
        )
    )


@op(
    "corpus_dedup_survivor_quality",
    oracle=f"""
WITH q AS (
  SELECT doc_id,
         md5(array_to_string({_duck_words()}[1:4], ' ')) AS h,
         1000000 * len(list_distinct({_duck_words()}))
           // len({_duck_words()}) AS quality
  FROM documents
),
r AS (
  SELECT doc_id, h, quality,
         row_number() OVER (PARTITION BY h
                            ORDER BY quality DESC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY h) AS n_copies
  FROM q
)
SELECT h AS template_key,
       CAST(n_copies AS BIGINT) AS n_copies,
       CAST(doc_id AS BIGINT) AS survivor_id,
       CAST(quality AS BIGINT) AS survivor_quality
FROM r WHERE rn = 1 AND n_copies >= 2
""",
    category=CAT,
)
def corpus_dedup_survivor_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivorship dedup: group docs by a lead-shingle
    template key (md5 of the first 4 normalized words — the
    boilerplate-lead grouping a crawl dedup uses for page templates)
    and keep the HIGHEST-quality copy (unique-token ppm, doc_id
    tie-break) instead of first-seen.  First-seen survivorship
    (dedup_exact_hash, dedup_cluster_canonical) discards formatting
    quality; production corpus builds keep the best-rendered copy —
    this op is that policy as a query.

    Scale: one template-keyed shuffle shared by BOTH windows
    (row_number + count over the same partition key — single
    Exchange, plan-locked); quality is computed map-side before the
    shuffle, so only (key, quality) metadata moves."""
    d = spread(load(spark, sf_dir, "documents"))
    ws = _words()
    q = d.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(ws, 1, 4))).alias("h"),
        F.size(F.array_distinct(ws)).alias("n_distinct"),
        F.size(ws).alias("n_words"),
    ).select(
        "doc_id",
        "h",
        F.expr("1000000 * n_distinct div n_words").alias("quality"),
    )
    win = Window.partitionBy("h")
    r = q.select(
        "doc_id",
        "h",
        "quality",
        F.row_number()
        .over(win.orderBy(F.col("quality").desc(), F.col("doc_id").asc()))
        .alias("rn"),
        F.count(F.lit(1)).over(win).alias("n_copies"),
    )
    return r.filter((F.col("rn") == 1) & (F.col("n_copies") >= 2)).select(
        F.col("h").alias("template_key"),
        bigint(F.col("n_copies")).alias("n_copies"),
        bigint(F.col("doc_id")).alias("survivor_id"),
        bigint(F.col("quality")).alias("survivor_quality"),
    )


@op(
    "corpus_type_token_ratio",
    oracle=f"""
WITH tok AS (
  SELECT lang, unnest({_duck_words()}) AS w FROM documents
),
wc AS (SELECT lang, w, count(*) AS c FROM tok GROUP BY lang, w)
SELECT lang,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(1000000 * count(*) // sum(c) AS BIGINT) AS ttr_ppm
FROM wc GROUP BY lang
""",
    category=CAT,
)
def corpus_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-richness report per language: token count, type
    (distinct-word) count, hapax legomena (words seen once), and
    type-token ratio in exact ppm.  These are the Heaps'-law inputs
    that size a tokenizer vocabulary per language and flag synthetic /
    template-generated slices (anomalously low TTR) before they skew a
    training mixture.

    Scale: one (lang, word)-keyed shuffle with map-side partial
    counts; the per-lang rollup then aggregates word rows — both
    stages are classic partial/final aggs, nothing corpus-sized is
    ever collected or broadcast."""
    tok = spread(load(spark, sf_dir, "documents"), min_fraction=0.25).select(
        "lang", F.explode(_words()).alias("w")
    )
    wc = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    return (
        wc.groupBy("lang")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
        .select(
            "lang",
            bigint(F.col("n_tokens")).alias("n_tokens"),
            bigint(F.col("n_types")).alias("n_types"),
            bigint(F.col("n_hapax")).alias("n_hapax"),
            bigint(F.expr("1000000 * n_types div n_tokens")).alias("ttr_ppm"),
        )
    )


@op(
    "timeseries_ewma_int",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CAST(round(value * 100) AS BIGINT) AS x
  FROM events
),
l AS (
  SELECT user_id, list(x ORDER BY us, event_id) AS xs, count(*) AS n
  FROM e GROUP BY user_id
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       CAST(xs[1] AS BIGINT) AS first_x100,
       CAST(list_reduce(xs, (acc, x) -> (3 * acc + x) // 4) AS BIGINT)
         AS ewma_x100
FROM l
""",
    category=CAT,
)
def timeseries_ewma_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer EWMA per user (alpha = 1/4 as the exact rational
    recurrence s_t = (3*s_{t-1} + x_t) div 4, seeded s_0 = x_0): the
    smoothing pass behind rate limiting / anomaly baselines, computed
    with NO floats so the result is engine-exact — float EWMA would
    drift between engines through rounding order.  x >= 0 on this
    table, so floor (DuckDB //) and truncating (Spark div) integer
    division agree everywhere.

    Scale: one user-keyed shuffle into the same sorted state-collapse
    the sessionize/CEP ops use (sort_array(collect_list) -> one
    aggregate() fold per user); per-user history is bounded by the
    CEP-documented cap reasoning.  A streaming deployment carries the
    single integer s_t as its state — this is the batch replay of
    exactly that operator."""
    ev = load(spark, sf_dir, "events")
    seq = (
        ev.select(
            "user_id",
            F.struct(
                F.expr("unix_micros(ts)").alias("us"),
                "event_id",
                F.round(F.col("value") * 100).cast("bigint").alias("x"),
            ).alias("rec"),
        )
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("rec")), lambda r: r["x"]
            ).alias("xs")
        )
    )
    return seq.select(
        "user_id",
        bigint(F.size("xs")).alias("n_events"),
        bigint(F.element_at("xs", 1)).alias("first_x100"),
        bigint(
            F.aggregate(
                F.slice("xs", 2, 1_000_000_000),
                F.element_at("xs", 1),
                # floor((3s+x)/4) on exact small ints == DuckDB's //;
                # x >= 0 keeps the state nonnegative so floor==trunc
                lambda acc, x: F.floor((acc * 3 + x) / F.lit(4)).cast("long"),
            )
        ).alias("ewma_x100"),
    )


# Synthetic "video": a concatenation of real P6/PPM frames (that IS
# what raw video is — a frame sequence), 16x4 px per frame, frame
# count (doc_id % 7) + 2.  The pixel lattice shifts per frame and the
# per-frame gradient changes every 3rd frame, so genuine cuts exist.
_VID_W, _VID_H = 16, 4


def _encode_video(doc_id: int) -> bytes:
    frames = []
    n_frames = (doc_id % 7) + 2
    for f in range(n_frames):
        header = f"P6\n{_VID_W} {_VID_H}\n255\n".encode("ascii")
        npx = _VID_W * _VID_H * 3
        frames.append(
            header
            + bytes(
                (doc_id * 31 + f * 64 + i * ((f // 3) + 1)) % 256
                for i in range(npx)
            )
        )
    return b"".join(frames)


@op(
    "multimodal_video_scene_cut",
    oracle=f"""
WITH g AS (SELECT doc_id, (doc_id % 7) + 2 AS nf FROM documents),
fp AS (
  SELECT doc_id, f.f AS f, i.i AS i,
         (doc_id * 31 + f.f * 64 + i.i * ((f.f // 3) + 1)) % 256 AS v
  FROM g
  CROSS JOIN (SELECT unnest(range(0, 8)) AS f) f
  CROSS JOIN (SELECT unnest(range(0, {_VID_W * _VID_H * 3})) AS i) i
  WHERE f.f < nf
),
d AS (
  SELECT a.doc_id, a.f, sum(abs(a.v - b.v)) AS diff
  FROM fp a
  JOIN fp b ON b.doc_id = a.doc_id AND b.f = a.f - 1 AND b.i = a.i
  GROUP BY a.doc_id, a.f
)
SELECT doc_id,
       CAST(count(*) + 1 AS BIGINT) AS n_frames,
       CAST(sum(CASE WHEN diff > {_VID_W * _VID_H * 3} * 80 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_cuts,
       CAST(max(diff) AS BIGINT) AS max_diff
FROM d GROUP BY doc_id
""",
    category=CAT,
)
def multimodal_video_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over a REAL decoded frame sequence: each
    'video' payload is a concatenation of valid P6/PPM frames (which
    is literally what raw video is); the Spark side walks the byte
    stream frame by frame through the same _decode_ppm parser the
    image ops use, then flags a cut wherever the inter-frame
    sum-of-absolute-differences exceeds a mean-per-pixel-80 threshold
    — the shot-boundary pass a video-curation pipeline runs before
    sampling keyframes for captioning.  The oracle replays the
    deterministic pixel lattice arithmetically.

    Scale: map-only mapInPandas — decode + frame differencing never
    leave the mapper and per-doc state is two frames (current +
    previous), so memory is O(frame), not O(video)."""
    import numpy as np

    from trip_data_pipeline_spark.operators.multimodal import _decode_ppm

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        thresh = _VID_W * _VID_H * 3 * 80
        out = {"doc_id": [], "n_frames": [], "n_cuts": [], "max_diff": []}
        for pdf in batches:
            for d in pdf["doc_id"]:
                payload = _encode_video(int(d))
                pos, prev, n_frames, n_cuts, max_diff = 0, None, 0, 0, 0
                while pos < len(payload):
                    # frame-by-frame walk: decode one P6 stream, advance
                    f = _decode_ppm(payload[pos:])
                    hdr_end = payload.index(b"255\n", pos) + 4
                    pos = hdr_end + f["n_px"]
                    cur = np.frombuffer(f["px"], dtype=np.uint8).astype(
                        np.int64
                    )
                    if prev is not None:
                        diff = int(np.abs(cur - prev).sum())
                        max_diff = max(max_diff, diff)
                        if diff > thresh:
                            n_cuts += 1
                    prev = cur
                    n_frames += 1
                out["doc_id"].append(int(d))
                out["n_frames"].append(n_frames)
                out["n_cuts"].append(n_cuts)
                out["max_diff"].append(max_diff)
            yield pd.DataFrame(out)
            out = {k: [] for k in out}

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        cuts,
        schema="doc_id bigint, n_frames bigint, n_cuts bigint, max_diff bigint",
    )


# SemDeDup geometry: a FIXED-SIZE seed codebook (every 25th vector
# below id 2000 -> at most 80 centroids at any SF; a trained k-means
# codebook is the production equivalent — same plan).  Fixed k keeps
# coarse assignment LINEAR in the corpus (n * k * 16 dims); the known
# SemDeDup cost is the within-cluster pair stage, O(n^2/k) — the paper
# picks k ~ sqrt(n) to balance the two, which here means raising the
# cap, not changing the plan.  Coarse assignment uses only the first
# 16 dims — exactly a coarse quantizer's job.
_SEM_SEED_MOD = 25
_SEM_SEED_CAP = 2000
_SEM_COARSE_DIMS = 16
# drop threshold cos >= 0.35 as the exact rational 7/20, tested by the
# cross-multiplied integer predicate 400*dot^2 >= 49*|a|^2*|b|^2 (with
# dot > 0) — no sqrt/float anywhere NEAR the decision boundary.
_SEM_NUM, _SEM_DEN = 7, 20


@op(
    "corpus_semdedup_bucket",
    oracle=f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS v
  FROM embeddings
),
c AS (SELECT vec_id AS cid, v AS cv FROM q
      WHERE vec_id % {_SEM_SEED_MOD} = 0 AND vec_id < {_SEM_SEED_CAP}),
d AS (
  SELECT q.vec_id, c.cid,
         list_sum(list_transform(range(1, {_SEM_COARSE_DIMS} + 1),
           i -> (q.v[i] - c.cv[i]) * (q.v[i] - c.cv[i]))) AS dist
  FROM q CROSS JOIN c
),
a AS (
  SELECT vec_id, min(dist * 100000 + cid) % 100000 AS cid
  FROM d GROUP BY vec_id
),
p AS (
  SELECT a1.cid, a1.vec_id AS v1, a2.vec_id AS v2
  FROM a a1 JOIN a a2 ON a1.cid = a2.cid AND a1.vec_id < a2.vec_id
),
flag AS (
  SELECT p.cid, p.v1, p.v2,
         CAST(list_sum(list_transform(range(1, 65),
           i -> q1.v[i] * q2.v[i])) AS BIGINT) AS dt,
         CAST(list_sum(list_transform(range(1, 65),
           i -> q1.v[i] * q1.v[i])) AS BIGINT) AS na2,
         CAST(list_sum(list_transform(range(1, 65),
           i -> q2.v[i] * q2.v[i])) AS BIGINT) AS nb2
  FROM p JOIN q q1 ON q1.vec_id = p.v1 JOIN q q2 ON q2.vec_id = p.v2
),
hits AS (
  SELECT cid, v1, v2 FROM flag
  WHERE dt > 0
    AND {_SEM_DEN} * {_SEM_DEN} * dt * dt
        >= {_SEM_NUM} * {_SEM_NUM} * na2 * nb2
)
SELECT v2 AS dropped_id,
       CAST(min(v1) AS BIGINT) AS kept_id,
       CAST(any_value(cid) AS BIGINT) AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_matches
FROM hits GROUP BY v2
""",
    category=CAT,
)
def corpus_semdedup_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): coarse-
    quantize every embedding to its nearest seed centroid (first 16
    dims only — the coarse quantizer's job), form pairs ONLY within a
    cluster, and drop the higher id of any pair whose full-64-dim
    cosine clears 0.35 — tested by the cross-multiplied integer
    predicate 400*dot^2 >= 49*|a|^2|b|^2 with dot > 0, so the drop
    decision has no float anywhere near the boundary.  Output: each
    dropped vector with its lowest-id keeper, cluster, and match
    count.

    Scale: cluster-then-pair is THE shape that makes semantic dedup
    tractable: with a fixed-k codebook (capped sampled seeds here, a
    trained k-means at 100 TB — kmeans_lloyd_int — same plan)
    assignment is linear in the corpus, the centroid relation
    broadcasts, and pairs ride one cluster-keyed shuffle.  The honest
    cost accounting: within-cluster pairs are O(n^2/k) — SemDeDup's
    intrinsic term — so k scales ~sqrt(n) in production (raise the
    cap; the plan is unchanged).  Never all-pairs.

    Pair-stage rework (round 8, VERDICT r7 item 3): the round-7 shape
    self-joined the assignment and ran three full-64-dim interpreted
    HOF folds on every candidate pair — 27.1 s at 10x (~250M pairs).
    The suggested partial-dot/Cauchy-Schwarz prefilter is provably
    non-selective on this data: the fixture embeddings carry exactly
    proportional energy (prefix-16 fraction measured 0.251), so the
    C-S slack on the 48 suffix dims is ~0.87|a||b| — it can never
    refute a 0.35-cosine threshold, and the prefilter would pass
    ~every pair.  Instead the pair stage follows the repo's
    measured HOF->Arrow crossover rule (docs/SCALE.md, the MinHash
    family): one applyInPandas per cluster, a row-blocked exact
    float64 matmul (every product <= 577^2 and every 64-term sum
    <= 2.1e7 — far inside 2^53, so the matmul is EXACT integer
    arithmetic), and the SAME cross-multiplied int64 drop predicate
    400*dt^2 >= 49*|a|^2|b|^2 with dt > 0 — the decision boundary
    stays float-free, output hash-identical.  Per-vector norms are
    computed once (the old shape re-folded them per pair), and the
    magnitude guard fails loudly outside the int64-safe envelope,
    mirroring ANSI overflow discipline.  The cluster groups are the
    same one cluster-keyed shuffle; blocked matmul bounds memory to
    O(block * cluster) regardless of cluster size."""
    q = spread(load(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000 + 0.5).cast("bigint"),
        ).alias("v"),
    )
    c = q.filter(
        (F.col("vec_id") % _SEM_SEED_MOD == 0)
        & (F.col("vec_id") < _SEM_SEED_CAP)
    ).select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    coarse_dist = F.aggregate(
        F.zip_with(
            F.slice("v", 1, _SEM_COARSE_DIMS),
            F.slice("cv", 1, _SEM_COARSE_DIMS),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    a = (
        q.crossJoin(F.broadcast(c))
        .select("vec_id", "v", "cid", coarse_dist.alias("dist"))
        .groupBy("vec_id")
        .agg(
            (F.min(F.col("dist") * 100000 + F.col("cid")) % 100000).alias("cid"),
            F.first("v").alias("v"),
        )
    )
    num2, den2 = _SEM_NUM * _SEM_NUM, _SEM_DEN * _SEM_DEN

    def _cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        out_schema = {
            "dropped_id": np.int64,
            "kept_id": np.int64,
            "cluster_id": np.int64,
            "n_matches": np.int64,
        }
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({k: np.empty(0, t) for k, t in out_schema.items()})
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy(np.int64)
        V = np.stack(pdf["v"].to_numpy()).astype(np.float64)  # n x 64
        # int64-safe envelope: |v_i| <= 1500 keeps 400*dt^2 and the
        # float64 matmul exact (products <= 2.25e6, 64-term sums
        # <= 1.45e8 << 2^53; 400*dt^2 <= 8.3e18 < 2^63).  Outside it,
        # fail loudly like ANSI overflow would — never wrap silently.
        if np.abs(V).max() > 1500:
            raise ValueError(
                "corpus_semdedup_bucket: quantized magnitude exceeds the "
                "int64-safe envelope (|v_i| > 1500); rescale quantization"
            )
        norms = np.rint((V * V).sum(axis=1)).astype(np.int64)
        kept_min = np.full(n, np.iinfo(np.int64).max, np.int64)
        n_match = np.zeros(n, np.int64)
        block = 256
        for s in range(0, n - 1, block):
            e = min(s + block, n - 1)
            G = V[s:e] @ V.T  # exact: all values integer, < 2^53
            dt = np.rint(G).astype(np.int64)
            for r in range(e - s):
                i = s + r
                row = dt[r, i + 1 :]
                nb = norms[i + 1 :]
                hit = (row > 0) & (
                    den2 * row * row >= num2 * norms[i] * nb
                )
                idx = np.nonzero(hit)[0] + (i + 1)
                n_match[idx] += 1
                np.minimum.at(kept_min, idx, ids[i])
        dropped = np.nonzero(n_match)[0]
        return pd.DataFrame(
            {
                "dropped_id": ids[dropped],
                "kept_id": kept_min[dropped],
                "cluster_id": np.full(
                    len(dropped), int(pdf["cid"].iloc[0]), np.int64
                ),
                "n_matches": n_match[dropped],
            }
        )

    return a.groupBy("cid").applyInPandas(
        _cluster_pairs,
        schema="dropped_id bigint, kept_id bigint, cluster_id bigint, "
        "n_matches bigint",
    )


@op(
    "multimodal_audio_zcr",
    oracle="""
WITH s AS (
  SELECT doc_id, i.i AS i,
         ((doc_id * 131 + i.i * 17) % 65536) - 32768 AS s
  FROM documents
  CROSS JOIN (SELECT unnest(range(0, 60)) AS i) i
  WHERE i.i < (doc_id % 50) + 10
),
z AS (
  SELECT doc_id, i, s,
         lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM s
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(CASE WHEN prev IS NOT NULL
                      AND (s >= 0) != (prev >= 0) THEN 1 ELSE 0 END)
            AS BIGINT) AS zc_count,
       CAST(1000000 * sum(CASE WHEN prev IS NOT NULL
                      AND (s >= 0) != (prev >= 0) THEN 1 ELSE 0 END)
            // (count(*) - 1) AS BIGINT) AS zcr_ppm
FROM z GROUP BY doc_id
""",
    category=CAT,
)
def multimodal_audio_zcr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-crossing rate over the REAL RIFF/WAVE decode chain: count
    of sign flips between consecutive PCM samples (nonnegative vs
    negative), as count + exact ppm rate — the classic cheap
    speech-vs-music / silence-vs-tone discriminator an audio-curation
    pipeline runs alongside energy VAD (multimodal_audio_vad).  The
    oracle replays the deterministic PCM lattice through a lag window;
    the Spark side decodes actual RIFF bytes.

    Scale: map-only mapInPandas — one pass, per-doc state is one
    previous sample."""
    import numpy as np

    from trip_data_pipeline_spark.operators.multimodal import (
        _decode_wav,
        _encode_wav,
    )

    def zcr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = {"doc_id": [], "n_samples": [], "zc_count": [], "zcr_ppm": []}
        for pdf in batches:
            for d in pdf["doc_id"]:
                f = _decode_wav(_encode_wav(int(d)))
                s = np.asarray(f["samples"], dtype=np.int64)
                nn = s >= 0
                zc = int((nn[1:] != nn[:-1]).sum())
                out["doc_id"].append(int(d))
                out["n_samples"].append(len(s))
                out["zc_count"].append(zc)
                out["zcr_ppm"].append(1_000_000 * zc // (len(s) - 1))
            yield pd.DataFrame(out)
            out = {k: [] for k in out}

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        zcr,
        schema="doc_id bigint, n_samples bigint, zc_count bigint, zcr_ppm bigint",
    )


@op(
    "sql_group_order_by_all",
    oracle="""
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY ALL
ORDER BY ALL NULLS LAST
LIMIT 40
""",
    category="2.8 scalar functions",
)
def sql_group_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUP BY ALL / ORDER BY ALL syntax surface (Spark 3.4+ /
    DuckDB-originated sugar): every non-aggregate select item groups,
    every output column orders — the form analysts actually write.
    Compiles to exactly the explicit-list plan (one partial/final agg
    + output sort), proven by the value-hash against DuckDB's native
    GROUP BY ALL."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("docs_gba")
    return spark.sql(
        """
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM docs_gba
GROUP BY ALL
ORDER BY ALL NULLS LAST
LIMIT 40
"""
    )


@op(
    "multimodal_image_histogram_stats",
    oracle=f"""
WITH px AS (
  SELECT doc_id,
         unnest(range(0, {16} * ((doc_id % 13) + 1))) AS p
  FROM documents
),
g AS (
  SELECT doc_id, p,
         ((doc_id * 31 + p * 3) % 256)
       + ((doc_id * 31 + p * 3 + 1) % 256)
       + ((doc_id * 31 + p * 3 + 2) % 256) AS gray
  FROM px
),
b AS (SELECT doc_id, (gray * 8) // 766 AS bin FROM g),
h AS (SELECT doc_id, bin, count(*) AS c FROM b GROUP BY doc_id, bin)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_px,
       CAST(count(*) AS BIGINT) AS n_nonzero_bins,
       CAST(1000000 * max(c) // sum(c) AS BIGINT) AS max_bin_share_ppm
FROM h GROUP BY doc_id
""",
    category=CAT,
)
def multimodal_image_histogram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gray-level histogram shape stats over the REAL PPM decode: 8-bin
    histogram of per-pixel gray sums (r+g+b in 0..765), reporting
    occupied-bin count and the max bin's share in ppm — the
    blank/corrupt-image detector (a screenshot of one color peaks one
    bin; a natural image spreads) that gates images before captioning
    spend.  Oracle replays the pixel lattice; Spark decodes bytes and
    histograms in numpy.

    Scale: map-only mapInPandas, constant 8-int state per image."""
    import numpy as np

    from trip_data_pipeline_spark.operators.multimodal import (
        _decode_ppm,
        _encode_ppm,
    )

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = {
            "doc_id": [], "n_px": [], "n_nonzero_bins": [],
            "max_bin_share_ppm": [],
        }
        for pdf in batches:
            for d in pdf["doc_id"]:
                f = _decode_ppm(_encode_ppm(int(d)))
                arr = np.frombuffer(f["px"], dtype=np.uint8).astype(np.int64)
                gray = arr.reshape(-1, 3).sum(axis=1)
                bins = np.bincount(gray * 8 // 766, minlength=8)
                n = int(gray.size)
                out["doc_id"].append(int(d))
                out["n_px"].append(n)
                out["n_nonzero_bins"].append(int((bins > 0).sum()))
                out["max_bin_share_ppm"].append(1_000_000 * int(bins.max()) // n)
            yield pd.DataFrame(out)
            out = {k: [] for k in out}

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        hist,
        schema=(
            "doc_id bigint, n_px bigint, n_nonzero_bins bigint, "
            "max_bin_share_ppm bigint"
        ),
    )


@op(
    "eval_langid_quality",
    oracle="""
WITH p AS (
  SELECT lang, CASE
    WHEN regexp_matches(lower(text), '(^| )(the|and|of)( |$)') THEN 'en'
    WHEN regexp_matches(lower(text), '(^| )(der|und|die)( |$)') THEN 'de'
    WHEN regexp_matches(lower(text), '(^| )(le|et|la)( |$)') THEN 'fr'
    WHEN regexp_matches(lower(text), '(^| )(el|los|una)( |$)') THEN 'es'
    WHEN regexp_matches(lower(text), '(^| )(de5|shi4|le5)( |$)') THEN 'zh'
    ELSE 'und' END AS predicted
  FROM documents
),
r AS (
  SELECT lang, count(*) AS n_labeled,
         sum(CASE WHEN predicted = lang THEN 1 ELSE 0 END) AS n_correct
  FROM p GROUP BY lang
),
q AS (
  SELECT predicted AS lang, count(*) AS n_predicted
  FROM p WHERE predicted != 'und' GROUP BY predicted
)
SELECT r.lang,
       CAST(r.n_labeled AS BIGINT) AS n_labeled,
       CAST(r.n_correct AS BIGINT) AS n_correct,
       CAST(1000000 * r.n_correct // r.n_labeled AS BIGINT) AS recall_ppm,
       CAST(coalesce(q.n_predicted, 0) AS BIGINT) AS n_predicted,
       CAST(CASE WHEN q.n_predicted > 0
                 THEN 1000000 * r.n_correct // q.n_predicted
                 ELSE 0 END AS BIGINT) AS precision_ppm
FROM r LEFT JOIN q ON q.lang = r.lang
""",
    category=CAT,
)
def eval_langid_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-quality eval-as-query for the marker-word lang-ID
    heuristic (text_lang_id emits the raw confusion counts; this op
    computes the metrics a model card reports): per labeled language,
    recall and precision in exact ppm — run ENTIRELY inside the engine
    so the quality numbers themselves hash-match, the same
    eval-as-query discipline as the ANN/MinHash recall evals.

    Scale: one map-side classification pass feeding two small
    aggregates joined on the 5-row language key — nothing corpus-sized
    moves after the scan."""
    from trip_data_pipeline_spark.operators.text_ops import (
        _LANG_MARKERS,
        _marker_regex,
    )

    d = spread(load(spark, sf_dir, "documents"))
    expr = None
    for lg, ws in _LANG_MARKERS.items():
        cond = F.lower(F.col("text")).rlike(_marker_regex(ws))
        expr = F.when(cond, lg) if expr is None else expr.when(cond, lg)
    p = d.select("lang", expr.otherwise("und").alias("predicted"))
    r = p.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_labeled"),
        F.sum(
            F.when(F.col("predicted") == F.col("lang"), 1).otherwise(0)
        ).alias("n_correct"),
    )
    q = (
        p.filter(F.col("predicted") != "und")
        .groupBy(F.col("predicted").alias("lang"))
        .agg(F.count(F.lit(1)).alias("n_predicted"))
    )
    return r.join(q, "lang", "left").select(
        "lang",
        bigint(F.col("n_labeled")).alias("n_labeled"),
        bigint(F.col("n_correct")).alias("n_correct"),
        bigint(F.expr("1000000 * n_correct div n_labeled")).alias("recall_ppm"),
        bigint(F.coalesce(F.col("n_predicted"), F.lit(0))).alias("n_predicted"),
        bigint(
            F.when(
                F.col("n_predicted") > 0,
                F.expr("1000000 * n_correct div n_predicted"),
            ).otherwise(0)
        ).alias("precision_ppm"),
    )


# Same sampled part-co-occurrence edge derivation as the graph family
# (graph.py:_copart_edges / scale3 PageRank oracle) so the degree
# numbers are directly comparable across the graph ops.
_DEG_EDGES_DUCK = """
op_ AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p
        FROM lineitem WHERE l_orderkey % 97 = 0),
e AS (SELECT DISTINCT a.p AS src, b.p AS dst
      FROM op_ a JOIN op_ b ON a.k = b.k AND a.p <> b.p)
"""


@op(
    "graph_degree_distribution",
    oracle=f"""
WITH {_DEG_EDGES_DUCK},
deg AS (SELECT src, count(*) AS d FROM e GROUP BY src)
SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(d) AS BIGINT) AS min_deg,
       CAST(max(d) AS BIGINT) AS max_deg,
       CAST(sum(d) AS BIGINT) AS sum_deg
FROM deg GROUP BY 1
""",
    category=CAT,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution health check over the shared co-occurrence
    graph: per log2 degree bucket (bucket = len(bin(d)) - 1, an
    integer-exact floor(log2) both engines compute identically), node
    count and min/max/sum degree.  This is the report that validates
    the power-law assumption the triangle-counting orientation
    (graph_triangle_count docstring) and skew-handling strategies rest
    on — run it BEFORE committing a partitioning strategy for a new
    graph.

    Scale: edge build (equi-join on sampled orders) -> one degree agg
    -> one constant-size bucket agg; the distribution itself is <= 64
    rows no matter the graph."""
    from trip_data_pipeline_spark.operators.graph import _copart_edges

    deg = (
        _copart_edges(spark, sf_dir)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    bucket = (F.length(F.bin(F.col("d"))) - 1).cast("bigint")
    return deg.groupBy(bucket.alias("log2_bucket")).agg(
        bigint(F.count(F.lit(1))).alias("n_nodes"),
        bigint(F.min("d")).alias("min_deg"),
        bigint(F.max("d")).alias("max_deg"),
        bigint(F.sum("d")).alias("sum_deg"),
    )


@op(
    "sql_values_inline_table",
    oracle="""
WITH sev(pri, severity) AS (
  VALUES ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 3),
         ('4-NOT SPECIFIED', 4), ('5-LOW', 5)
)
SELECT severity,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders JOIN sev ON sev.pri = o_orderpriority
GROUP BY severity
""",
    category="2.8 scalar functions",
)
def sql_values_inline_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES relation joined to a fact table — the config/seed
    -table-in-the-query surface (severity mapping here) every SQL user
    reaches for before a dim table exists.  The 5-row VALUES relation
    broadcasts; the plan is otherwise the plain dim-join aggregate."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_vit")
    return spark.sql(
        """
SELECT severity,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders_vit
JOIN (VALUES ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 3),
             ('4-NOT SPECIFIED', 4), ('5-LOW', 5)) AS sev(pri, severity)
  ON sev.pri = o_orderpriority
GROUP BY severity
"""
    )


@op(
    "agg_weighted_avg_exact",
    oracle=f"""
WITH q AS (
  SELECT lang,
         len({_duck_words()}) AS w,
         1000000 * len(list_distinct({_duck_words()}))
           // len({_duck_words()}) AS x_ppm
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(w) AS BIGINT) AS w_total,
       CAST(sum(w * x_ppm) // sum(w) AS BIGINT) AS wmean_ppm
FROM q GROUP BY lang
""",
    category=CAT,
)
def agg_weighted_avg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted mean of a per-doc quality score (unique-token
    ppm), per language, as the exact integer sum(w*x) div sum(w) —
    corpus statistics must be token-weighted, not doc-weighted (a
    10-token doc must not count like a 10k-token doc), and the
    cross-multiplied integer form keeps the report engine-exact where
    a float weighted mean drifts with partial-agg order.

    Scale: map-side (w, w*x) products, one partial/final agg —
    mergeable integer state, the same shape as any weighted metric
    rollup."""
    d = spread(load(spark, sf_dir, "documents"))
    ws = _words()
    q = d.select(
        "lang",
        F.size(ws).alias("w"),
        F.size(F.array_distinct(ws)).alias("nd"),
    ).select("lang", "w", F.expr("1000000 * nd div w").alias("x_ppm"))
    return (
        q.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("w").alias("w_total"),
            F.sum(F.col("w") * F.col("x_ppm")).alias("wx"),
        )
        .select(
            "lang",
            bigint(F.col("n_docs")).alias("n_docs"),
            bigint(F.col("w_total")).alias("w_total"),
            bigint(F.expr("wx div w_total")).alias("wmean_ppm"),
        )
    )


@op(
    "dedup_truncated_variants",
    oracle=f"""
WITH q AS (
  SELECT doc_id,
         md5(array_to_string({_duck_words()}[1:2], ' ')) AS h,
         len({_duck_words()}) AS n
  FROM documents
)
SELECT a.doc_id AS short_id,
       b.doc_id AS long_id,
       CAST(a.n AS BIGINT) AS short_words,
       CAST(b.n AS BIGINT) AS long_words,
       CAST(1000000 * a.n // b.n AS BIGINT) AS len_ratio_ppm
FROM q a JOIN q b
  ON a.h = b.h AND a.doc_id <> b.doc_id
WHERE 10 * a.n <= 9 * b.n
""",
    category=CAT,
)
def dedup_truncated_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-variant detection — the crawl pattern doc-level
    near-dup misses in the OTHER direction from containment: the same
    page captured cut short (paywall folds, render timeouts) shares
    its lead bigram but is >=10% shorter.  Pairs form ONLY within
    lead-bigram template groups (md5 of the first 2 normalized words);
    the cross-multiplied integer test 10*short <= 9*long flags the
    shorter side with its length ratio in ppm, feeding a keep-longest
    survivorship policy (the mirror of corpus_dedup_survivor_quality's
    keep-best-quality).

    Scale: one template-keyed self-join — group sizes are bounded by
    template frequency exactly like the shingle inverted index, and
    only (key, n_words) metadata shuffles; text never moves."""
    d = spread(load(spark, sf_dir, "documents"))
    ws = _words()
    q = d.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(ws, 1, 2))).alias("h"),
        F.size(ws).alias("n"),
    )
    a = q.select(F.col("doc_id").alias("short_id"), "h", F.col("n").alias("sn"))
    b = q.select(F.col("doc_id").alias("long_id"), F.col("h"), F.col("n").alias("ln"))
    return (
        a.join(b, "h")
        .filter(
            (F.col("short_id") != F.col("long_id"))
            & (10 * F.col("sn") <= 9 * F.col("ln"))
        )
        .select(
            "short_id",
            "long_id",
            bigint(F.col("sn")).alias("short_words"),
            bigint(F.col("ln")).alias("long_words"),
            bigint(F.expr("1000000 * sn div ln")).alias("len_ratio_ppm"),
        )
    )


@op(
    "dq_benford_first_digit",
    oracle="""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                     AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
),
c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit)
SELECT digit,
       CAST(n AS BIGINT) AS n_orders,
       CAST(1000000 * n // sum(n) OVER () AS BIGINT) AS share_ppm
FROM c
""",
    category=CAT,
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals (in exact
    cents): per leading digit, order count and corpus share in ppm.
    Fabricated or unit-mangled money columns drift visibly from the
    log10(1+1/d) profile — this is the one-glance data-forensics gate
    run before a new source's prices are trusted (Benford 1938; Nigrini
    1996 for the audit usage).

    Scale: map-side digit extraction (integer cast chain, no float
    formatting), one partial/final agg to <= 9 rows, then a window
    total over those 9 rows — constant-size output regardless of
    input."""
    o = spread(load(spark, sf_dir, "orders"))
    digit = F.expr(
        "CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)"
        " AS STRING), 1, 1) AS BIGINT)"
    )
    c = o.groupBy(digit.alias("digit")).agg(F.count(F.lit(1)).alias("n"))
    withtot = c.select(
        "digit", "n", F.sum("n").over(Window.partitionBy()).alias("total")
    )
    return withtot.select(
        "digit",
        bigint(F.col("n")).alias("n_orders"),
        bigint(F.expr("1000000 * n div total")).alias("share_ppm"),
    )


@op(
    "agg_hhi_concentration",
    oracle="""
WITH rev AS (
  SELECT l_suppkey AS sk,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS sc
  FROM lineitem GROUP BY l_suppkey
),
j AS (
  SELECT s_nationkey AS nk, sc,
         1000000 * sc // sum(sc) OVER (PARTITION BY s_nationkey)
           AS share_ppm
  FROM rev JOIN supplier ON s_suppkey = sk
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(sc) AS BIGINT) AS total_cents,
       CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm
FROM j JOIN nation ON n_nationkey = nk
GROUP BY n_name
""",
    category=CAT,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman revenue-concentration index per nation:
    each supplier's revenue share of its nation in exact ppm (floor
    div on integer cents), HHI = sum(share^2) rescaled back to ppm.
    The concentration report behind 'is this market/source dominated
    by one supplier' — for corpus work the identical shape answers
    'is this language slice dominated by one domain' before a
    dedup/mixture decision.

    Scale: one supplier-keyed partial/final agg over the fact (the
    only fact-sized shuffle), a broadcast dim join, a nation-keyed
    window over supplier rows (dim-sized), and a <= 25-row final agg.
    Floor-div share quantization is deterministic in both engines."""
    li = spread(load(spark, sf_dir, "lineitem"))
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    cents = F.expr(
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
    )
    rev = (
        li.select(F.col("l_suppkey").alias("sk"), cents.alias("c"))
        .groupBy("sk")
        .agg(F.sum("c").alias("sc"))
    )
    j = rev.join(F.broadcast(sup), rev.sk == sup.s_suppkey).select(
        F.col("s_nationkey").alias("nk"), "sc"
    )
    shared = j.select(
        "nk",
        "sc",
        F.expr("1000000 * sc").alias("scaled"),
        F.sum("sc").over(Window.partitionBy("nk")).alias("nat_total"),
    ).select("nk", "sc", F.expr("scaled div nat_total").alias("share_ppm"))
    per_nat = shared.groupBy("nk").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("sc").alias("total_cents"),
        F.sum(F.expr("share_ppm * share_ppm")).alias("hhi_raw"),
    )
    return per_nat.join(
        F.broadcast(nat), per_nat.nk == nat.n_nationkey
    ).select(
        "n_name",
        bigint(F.col("n_suppliers")).alias("n_suppliers"),
        bigint(F.col("total_cents")).alias("total_cents"),
        bigint(F.expr("hhi_raw div 1000000")).alias("hhi_ppm"),
    )


@op(
    "geo_trip_speed_gate",
    oracle="""
WITH pts AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         ((user_id * 7919 + event_id * 13) % 17000) / 100.0 - 85.0  AS lat,
         ((user_id * 104729 + event_id * 31) % 36000) / 100.0 - 180.0 AS lon
  FROM events
),
legs AS (
  SELECT user_id, lat, lon, us,
         lag(lat) OVER w AS plat,
         lag(lon) OVER w AS plon,
         lag(us)  OVER w AS pus
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
sp AS (
  SELECT user_id,
         CAST(round(2 * 6371000 * asin(sqrt(
             pow(sin(radians(lat - plat) / 2), 2)
             + cos(radians(plat)) * cos(radians(lat))
               * pow(sin(radians(lon - plon) / 2), 2)))) AS BIGINT)
           * 1000000000 // (us - pus) AS mm_s
  FROM legs WHERE plat IS NOT NULL AND us > pus
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_legs,
       CAST(sum(CASE WHEN mm_s > 70000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_impossible,
       CAST(max(mm_s) AS BIGINT) AS max_mm_s
FROM sp GROUP BY user_id
""",
    category="2.13 geo trip analytics",
)
def geo_trip_speed_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physically-impossible-trip gate: implied speed of each
    consecutive leg per user (integer-metre haversine over derived
    coordinates, duration in exact microseconds), legs above 70 m/s
    (~250 km/h) flagged.  The classic GPS-noise / clock-skew data
    quality filter a trip pipeline runs before any distance-derived
    metric is trusted; speeds are integer mm/s (floor div) so the
    report is engine-exact.

    Scale: same single user-keyed window sort as the haversine op
    (geo.py), then a partial/final agg per user; zero-duration legs
    (timestamp ties) are excluded by us > pus in both engines."""
    from trip_data_pipeline_spark.operators.geo import _HAVERSINE_M, _with_coords

    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pts = _with_coords(load(spark, sf_dir, "events"))
    legs = pts.select(
        "user_id",
        "lat",
        "lon",
        "us",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
        F.lag("us").over(w).alias("pus"),
    ).filter(F.col("plat").isNotNull() & (F.col("us") > F.col("pus")))
    leg_m = F.round(F.expr(_HAVERSINE_M)).cast("bigint")
    sp = legs.select(
        "user_id",
        (leg_m * F.lit(1000000000)).alias("mm"),
        (F.col("us") - F.col("pus")).alias("dt"),
    ).select("user_id", F.expr("mm div dt").alias("mm_s"))
    return sp.groupBy("user_id").agg(
        bigint(F.count(F.lit(1))).alias("n_legs"),
        bigint(F.sum(F.when(F.col("mm_s") > 70000, 1).otherwise(0))).alias(
            "n_impossible"
        ),
        bigint(F.max("mm_s")).alias("max_mm_s"),
    )


_RI_EDGES = (
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
)


@op(
    "dq_referential_integrity",
    oracle="""
SELECT 'lineitem->orders' AS fk,
       CAST(count(*) AS BIGINT) AS n_child,
       CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans
FROM lineitem c
LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) p
  ON p.k = c.l_orderkey
UNION ALL
SELECT 'lineitem->supplier',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem c
LEFT JOIN (SELECT DISTINCT s_suppkey AS k FROM supplier) p
  ON p.k = c.l_suppkey
UNION ALL
SELECT 'lineitem->part',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem c
LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p
  ON p.k = c.l_partkey
UNION ALL
SELECT 'orders->customer',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders c
LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) p
  ON p.k = c.o_custkey
""",
    category=CAT,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: one row per foreign-key edge of
    the star schema with child row count and orphan count (child keys
    with no parent).  The ingest smoke report every warehouse load
    runs before downstream joins silently drop rows — inner joins eat
    orphans without a trace, so this gate is how the drop becomes a
    number someone owns.

    Scale: each edge is a left join against the DISTINCT parent keys
    (key column only — parents never move their payload), aggregated
    to one row before the union; Catalyst/AQE picks broadcast for
    dim-sized parents and a shuffle join for fact-sized ones (orders),
    exactly the per-edge strategy a 100-TB audit wants.  A bloom-filter
    pre-probe would cut the orders edge further; at fixture scale the
    plain plan is already 4 aggregates over 4 joins."""
    parts = []
    for fk, child_t, ck, parent_t, pk in _RI_EDGES:
        child = spread(load(spark, sf_dir, child_t))
        parent = load(spark, sf_dir, parent_t).select(
            F.col(pk).alias("__pk")
        ).distinct()
        j = child.select(F.col(ck).alias("__ck")).join(
            parent, F.col("__ck") == F.col("__pk"), "left"
        )
        parts.append(
            j.agg(
                bigint(F.count(F.lit(1))).alias("n_child"),
                bigint(
                    F.sum(F.when(F.col("__pk").isNull(), 1).otherwise(0))
                ).alias("n_orphans"),
            ).select(F.lit(fk).alias("fk"), "n_child", "n_orphans")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@op(
    "stats_chi2_lang_source",
    oracle="""
WITH o AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
  FROM documents GROUP BY lang, source
),
m AS (
  SELECT lang, source, obs,
         sum(obs) OVER (PARTITION BY lang)   AS r_tot,
         sum(obs) OVER (PARTITION BY source) AS c_tot,
         sum(obs) OVER ()                    AS g_tot
  FROM o
),
cell AS (
  SELECT lang,
         CAST(floor(
           1000000
           * (obs - CAST(r_tot AS DOUBLE) * c_tot / g_tot)
           * (obs - CAST(r_tot AS DOUBLE) * c_tot / g_tot)
           / (CAST(r_tot AS DOUBLE) * c_tot / g_tot)
         ) AS BIGINT) AS chi2_ppm
  FROM m
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(chi2_ppm) AS BIGINT) AS chi2_ppm
FROM cell GROUP BY lang
""",
    category=CAT,
)
def stats_chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence test between language and source over
    the observed (lang, source) contingency table: per-cell
    (obs - exp)^2 / exp with exp = row_total * col_total / grand,
    each cell floored to integer ppm BEFORE the per-language sum so
    the statistic is engine-exact (floor avoids the round-half
    semantics gap; the doubles feeding it derive from exact integer
    counts via identical IEEE mul/div, the same parity argument as the
    haversine ops).  A high per-language chi2 says that language's
    sources are skewed vs the corpus — the signal behind
    source-stratified sampling decisions.

    Scale: the contingency table is one (lang, source) partial/final
    agg over the corpus; everything after runs on table-sized rows
    (|langs| x |sources|), where three window totals and the final
    rollup are negligible."""
    d = spread(load(spark, sf_dir, "documents"), min_fraction=0.25)
    o = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("obs")
    )
    m = o.select(
        "lang",
        "obs",
        F.sum("obs").over(Window.partitionBy("lang")).alias("r_tot"),
        F.sum("obs").over(Window.partitionBy("source")).alias("c_tot"),
        F.sum("obs").over(Window.partitionBy()).alias("g_tot"),
    )
    exp = F.expr("CAST(r_tot AS DOUBLE) * c_tot / g_tot")
    cell = m.select(
        "lang",
        F.floor(1000000 * (F.col("obs") - exp) * (F.col("obs") - exp) / exp)
        .cast("bigint")
        .alias("chi2_ppm"),
    )
    return cell.groupBy("lang").agg(
        bigint(F.count(F.lit(1))).alias("n_cells"),
        bigint(F.sum("chi2_ppm")).alias("chi2_ppm"),
    )


@op(
    "abtest_two_proportion",
    oracle="""
WITH u AS (
  SELECT user_id, user_id % 2 AS arm,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 14 THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
),
arms AS (
  SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)    AS n_a,
         sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS c_a,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)    AS n_b,
         sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS c_b
  FROM u
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS c_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS c_b,
       CAST(CASE WHEN n_a = 0 THEN NULL
                 ELSE 1000000 * c_a // n_a END AS BIGINT) AS cvr_a_ppm,
       CAST(CASE WHEN n_b = 0 THEN NULL
                 ELSE 1000000 * c_b // n_b END AS BIGINT) AS cvr_b_ppm,
       CAST(CASE WHEN n_a = 0 OR n_b = 0
                   OR c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN NULL
         ELSE floor(1000 * (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
         / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                * (1.0 / n_a + 1.0 / n_b))) END AS BIGINT) AS z_milli
FROM arms
""",
    category=CAT,
)
def abtest_two_proportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B split (arm = user_id parity,
    conversion = a heavy purchaser, >= 14 purchase events — the
    threshold sits at the fixture's per-user mean so both outcomes
    occur in every arm at every SF): per-arm user and conversion
    counts, conversion rates in exact ppm, and the pooled z statistic
    floored to milli-units.  The experiment-readout query an analytics
    engine must answer natively; every float feeding z derives from
    exact integers through identical IEEE mul/div/sqrt in both engines
    (floor, not round, at the boundary).

    Scale: one user-keyed partial/final agg (conversion flags), then a
    single global agg to one row — the per-user agg is the only
    corpus-sized shuffle."""
    ev = spread(load(spark, sf_dir, "events"))
    u = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 14,
            1,
        )
        .otherwise(0)
        .alias("conv")
    )
    arms = u.select(
        (F.col("user_id") % 2).alias("arm"), "conv"
    ).agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias("c_b"),
    )
    # Degenerate-input guards (round-8 at-scale parity sweep: the 10x
    # replication multiplies per-user event counts, every user crosses
    # the conversion threshold, pooled p hits 1 and the z denominator
    # sqrt(p*(1-p)*...) is 0 — ANSI mode raises DIVIDE_BY_ZERO.  The
    # statistic is mathematically undefined at zero pooled variance
    # (or an empty arm), so both engines return NULL there; on data
    # where both outcomes occur in both arms — every sf fixture —
    # values are unchanged.)
    z_defined = (
        "n_a > 0 AND n_b > 0 AND c_a + c_b > 0 AND c_a + c_b < n_a + n_b"
    )
    return arms.select(
        bigint(F.col("n_a")).alias("n_a"),
        bigint(F.col("c_a")).alias("c_a"),
        bigint(F.col("n_b")).alias("n_b"),
        bigint(F.col("c_b")).alias("c_b"),
        bigint(
            F.expr("CASE WHEN n_a = 0 THEN NULL ELSE 1000000 * c_a div n_a END")
        ).alias("cvr_a_ppm"),
        bigint(
            F.expr("CASE WHEN n_b = 0 THEN NULL ELSE 1000000 * c_b div n_b END")
        ).alias("cvr_b_ppm"),
        bigint(
            F.expr(
                f"CASE WHEN {z_defined} THEN "
                "floor(1000 * (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)"
                " / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))"
                "        * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))"
                "        * (1.0 / n_a + 1.0 / n_b))) END"
            )
        ).alias("z_milli"),
    )


@op(
    "corpus_shard_assign",
    oracle=f"""
WITH d AS (
  SELECT {_duck_hex28("md5(CAST(doc_id AS VARCHAR))", 1)} % 16 AS shard,
         len({_duck_words()}) AS n_tokens
  FROM documents
),
s AS (
  SELECT shard, count(*) AS n_docs, sum(n_tokens) AS toks
  FROM d GROUP BY shard
)
SELECT shard,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(toks AS BIGINT) AS n_tokens,
       CAST(1000000 * 16 * toks // sum(toks) OVER () AS BIGINT)
         AS share_x16_ppm
FROM s
""",
    category=CAT,
)
def corpus_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic output-shard assignment + balance report: docs
    hash (md5 of the id, content-independent) into 16 shards; per
    shard, doc count, token total, and the shard's share of tokens
    scaled so 1,000,000 ppm == a perfectly balanced 1/16.  This is the
    write-side layout op for a 100-TB corpus export — balanced shards
    are what keep downstream tokenizer / training readers from
    stragglers, and the report is the check that the hash actually
    balanced the TOKEN mass, not just the doc count.

    Scale: map-side hash + token count, one 16-group partial/final
    agg, window total over 16 rows.  The same expression passed to
    DataFrameWriter.partitionBy/repartition does the actual write."""
    d = spread(load(spark, sf_dir, "documents"), min_fraction=0.25)
    shard = (
        _hex28(F.md5(F.col("doc_id").cast("string")), 1) % 16
    ).alias("shard")
    s = d.select(shard, F.size(_words()).alias("n_tokens")).groupBy(
        "shard"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("toks"),
    )
    withtot = s.select(
        "shard",
        "n_docs",
        "toks",
        F.sum("toks").over(Window.partitionBy()).alias("total"),
    )
    return withtot.select(
        "shard",
        bigint(F.col("n_docs")).alias("n_docs"),
        bigint(F.col("toks")).alias("n_tokens"),
        bigint(F.expr("1000000 * 16 * toks div total")).alias("share_x16_ppm"),
    )


@op(
    "dq_freshness_lag",
    oracle="""
WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
per AS (
  SELECT event_type,
         count(*) AS n_events,
         max(us) AS latest_us
  FROM e GROUP BY event_type
)
SELECT event_type,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(latest_us AS BIGINT) AS latest_us,
       CAST((max(latest_us) OVER () - latest_us) // 1000000 AS BIGINT)
         AS lag_s
FROM per
""",
    category=CAT,
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness audit: for each event type, event count,
    latest timestamp (exact microseconds), and how many whole seconds
    it lags the freshest stream.  The pipeline-health report that
    catches a stalled upstream producer before its staleness poisons
    a time-windowed join or a training cutoff.

    Scale: one event_type-keyed partial/final agg (max/count are
    mergeable), then a window over the handful of type rows —
    constant-size output."""
    ev = load(spark, sf_dir, "events")
    per = ev.select(
        "event_type", F.expr("unix_micros(ts)").alias("us")
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("us").alias("latest_us"),
    )
    withmax = per.select(
        "event_type",
        "n_events",
        "latest_us",
        F.max("latest_us").over(Window.partitionBy()).alias("freshest"),
    )
    return withmax.select(
        "event_type",
        bigint(F.col("n_events")).alias("n_events"),
        bigint(F.col("latest_us")).alias("latest_us"),
        bigint(F.expr("(freshest - latest_us) div 1000000")).alias("lag_s"),
    )


@op(
    "dq_reconcile_order_totals",
    oracle="""
WITH li AS (
  SELECT l_orderkey AS k,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                        * 100) AS BIGINT)) AS line_cents
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS o_cents, line_cents
  FROM orders JOIN li ON li.k = o_orderkey
)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN o_cents = line_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched,
       CAST(sum(CASE WHEN o_cents <> line_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mismatched,
       CAST(sum(abs(o_cents - line_cents)) AS BIGINT) AS drift_cents,
       CAST(max(abs(o_cents - line_cents)) AS BIGINT) AS max_drift_cents
FROM j
""",
    category=CAT,
)
def dq_reconcile_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation: each order's header total against
    the sum of its line amounts (extendedprice x (1-discount) x
    (1+tax), per-line rounded to exact cents) — match/mismatch counts
    plus total and max absolute drift.  The two-system consistency
    check every warehouse runs between an ingested header feed and its
    detail feed; drift as a number is what turns 'the totals look off'
    into a pageable defect.

    Scale: one orderkey-keyed partial/final agg over the fact, then an
    equi-join to the header (both sides keyed on the join key, and at
    TPC-H-like layouts co-partitioned), collapsing to a 1-row report."""
    li = spread(load(spark, sf_dir, "lineitem"))
    o = load(spark, sf_dir, "orders")
    line = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.sum(
            F.expr(
                "CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)"
                " * 100) AS BIGINT)"
            )
        ).alias("line_cents")
    )
    j = o.select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("o_cents"),
    ).join(line, F.col("o_orderkey") == F.col("k"))
    diff = F.abs(F.col("o_cents") - F.col("line_cents"))
    return j.agg(
        bigint(F.count(F.lit(1))).alias("n_orders"),
        bigint(
            F.sum(F.when(F.col("o_cents") == F.col("line_cents"), 1).otherwise(0))
        ).alias("n_matched"),
        bigint(
            F.sum(F.when(F.col("o_cents") != F.col("line_cents"), 1).otherwise(0))
        ).alias("n_mismatched"),
        bigint(F.sum(diff)).alias("drift_cents"),
        bigint(F.max(diff)).alias("max_drift_cents"),
    )


@op(
    "text_bigram_pmi_lift",
    oracle=f"""
WITH d AS (SELECT {_duck_words()} AS ws FROM documents),
uni AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(ws) AS w FROM d) GROUP BY w
),
n AS (SELECT sum(c) AS n_uni FROM uni),
bi AS (
  SELECT x, y, count(*) AS cxy
  FROM (
    SELECT unnest(ws[1:-2]) AS x,
           unnest(ws[2:-1]) AS y
    FROM d WHERE len(ws) >= 2
  ) GROUP BY x, y
)
SELECT bi.x, bi.y,
       CAST(bi.cxy AS BIGINT) AS c_xy,
       CAST(ux.c AS BIGINT) AS c_x,
       CAST(uy.c AS BIGINT) AS c_y,
       CAST(1000000 * bi.cxy * n.n_uni // (ux.c * uy.c) AS BIGINT)
         AS lift_ppm
FROM bi, n
JOIN uni ux ON ux.w = bi.x
JOIN uni uy ON uy.w = bi.y
WHERE bi.cxy >= 5
""",
    category=CAT,
)
def text_bigram_pmi_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: exponentiated-PMI lift for every bigram seen
    >= 5 times — lift_ppm = 10^6 * c(x,y) * N / (c(x) * c(y)), all
    integer (floor div), where N is the unigram token total.  Lift >>
    1e6 marks collocations ('machine learning'-style units a tokenizer
    or phrase-dedup pass should treat atomically); the integer form is
    the engine-exact stand-in for log-PMI, ordering identically.

    Scale: unigram and bigram counts are two token-keyed partial/final
    aggs; the bigram->unigram joins broadcast the vocabulary (counts
    only — vocab is tiny next to the corpus, the classic
    big-fact/small-dim shape), and the 1-row N attaches as a literal
    crossed constant."""
    d = spread(load(spark, sf_dir, "documents"), min_fraction=0.25).select(
        _words().alias("ws")
    )
    uni = d.select(F.explode("ws").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    pairs = d.filter(F.size("ws") >= 2).select(
        F.explode(
            F.zip_with(
                F.slice(F.col("ws"), 1, F.size("ws") - 1),
                F.slice(F.col("ws"), 2, F.size("ws") - 1),
                lambda a, b: F.struct(a.alias("x"), b.alias("y")),
            )
        ).alias("p")
    )
    bi = pairs.select("p.x", "p.y").groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("cxy")
    ).filter(F.col("cxy") >= 5)
    n = uni.agg(F.sum("c").alias("n_uni"))
    ux = uni.select(F.col("w").alias("xw"), F.col("c").alias("cx"))
    uy = uni.select(F.col("w").alias("yw"), F.col("c").alias("cy"))
    return (
        bi.join(F.broadcast(ux), bi.x == ux.xw)
        .join(F.broadcast(uy), bi.y == uy.yw)
        .crossJoin(F.broadcast(n))
        .select(
            "x",
            "y",
            bigint(F.col("cxy")).alias("c_xy"),
            bigint(F.col("cx")).alias("c_x"),
            bigint(F.col("cy")).alias("c_y"),
            bigint(F.expr("1000000 * cxy * n_uni div (cx * cy)")).alias(
                "lift_ppm"
            ),
        )
    )


_PK_TABLES = (
    ("orders", "o_orderkey"),
    ("customer", "c_custkey"),
    ("part", "p_partkey"),
    ("supplier", "s_suppkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
)


@op(
    "dq_primary_key_uniqueness",
    oracle="\nUNION ALL\n".join(
        f"""
SELECT '{t}' AS table_name,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
       CAST(max(c) AS BIGINT) AS max_multiplicity
FROM (SELECT {k}, count(*) AS c FROM {t} GROUP BY {k})
"""
        for t, k in _PK_TABLES
    ),
    category=CAT,
)
def dq_primary_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit: per table, row count, distinct
    key count, duplicated-key count, and worst multiplicity.  The
    companion gate to the referential-integrity audit — duplicate keys
    silently FAN OUT downstream joins exactly where orphans silently
    drop rows, and a fan-out found after a 100-TB join re-run is the
    expensive way to find it.

    Scale: one key-keyed partial/final agg per table (count-distinct
    as a two-level exact agg, never a global distinct), each collapsing
    to a 1-row report before the union."""
    parts = []
    for t, k in _PK_TABLES:
        keyed = (
            spread(load(spark, sf_dir, t), min_fraction=0.25)
            .groupBy(F.col(k))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        parts.append(
            keyed.agg(
                bigint(F.sum("c")).alias("n_rows"),
                bigint(F.count(F.lit(1))).alias("n_keys"),
                bigint(F.sum(F.when(F.col("c") > 1, 1).otherwise(0))).alias(
                    "n_dup_keys"
                ),
                bigint(F.max("c")).alias("max_multiplicity"),
            ).select(
                F.lit(t).alias("table_name"),
                "n_rows",
                "n_keys",
                "n_dup_keys",
                "max_multiplicity",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@op(
    "events_time_to_convert",
    oracle="""
WITH s AS (
  SELECT user_id, min(epoch_us(ts)) AS t_signup
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.t_signup
  GROUP BY e.user_id
),
d AS (
  SELECT (p.t_purchase - s.t_signup) // 1000000 AS dt_s
  FROM s JOIN p ON p.user_id = s.user_id
)
SELECT CAST(length(bin(dt_s + 1)) - 1 AS BIGINT) AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(min(dt_s) AS BIGINT) AS min_s,
       CAST(max(dt_s) AS BIGINT) AS max_s
FROM d GROUP BY 1
""",
    category=CAT,
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, first signup to first
    subsequent purchase in whole seconds, histogrammed into log2
    buckets (bucket = len(bin(dt+1))-1, integer-exact in both
    engines).  The funnel op counts who converts; this one answers HOW
    LONG conversion takes — the latency view product teams read next,
    with constant-size output no matter the user count.

    Scale: two conditional min-aggregates per user (signup floor, then
    purchase gated on it) — user-keyed shuffles all the way, then the
    <= 64-bucket rollup."""
    ev = spread(load(spark, sf_dir, "events"))
    us = F.expr("unix_micros(ts)")
    s = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min(us).alias("t_signup")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", us.alias("t"))
        .join(s, "user_id")
        .filter(F.col("t") >= F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"), F.min("t_signup").alias("t_signup"))
    )
    d = p.select(
        F.expr("(t_purchase - t_signup) div 1000000").alias("dt_s")
    )
    bucket = (F.length(F.bin(F.col("dt_s") + 1)) - 1).cast("bigint")
    return d.groupBy(bucket.alias("log2_bucket")).agg(
        bigint(F.count(F.lit(1))).alias("n_users"),
        bigint(F.min("dt_s")).alias("min_s"),
        bigint(F.max("dt_s")).alias("max_s"),
    )


@op(
    "graph_jaccard_neighbors",
    oracle=f"""
WITH {_DEG_EDGES_DUCK},
deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
cn AS (
  SELECT l.src AS a, r.src AS b, count(*) AS common
  FROM e l JOIN e r ON l.dst = r.dst AND l.src < r.src
  GROUP BY 1, 2
),
cand AS (
  SELECT cn.a, cn.b, cn.common FROM cn
  WHERE cn.common >= 2
    AND NOT EXISTS (SELECT 1 FROM e WHERE e.src = cn.a AND e.dst = cn.b)
)
SELECT a, b,
       CAST(common AS BIGINT) AS n_common,
       CAST(1000000 * common // (da.d + db.d - common) AS BIGINT)
         AS jaccard_ppm
FROM cand
JOIN deg da ON da.src = a
JOIN deg db ON db.src = b
""",
    category=CAT,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by common-neighbor Jaccard over the shared
    co-occurrence graph: for NON-adjacent pairs with >= 2 common
    neighbors, jaccard_ppm = 10^6 * |N(a) cap N(b)| div
    |N(a) cup N(b)| — the candidate-edge scores a recommender ranks.

    Scale: the wedge self-join (edges joined on the shared neighbor)
    is the canonical bounded-by-degree-squared step; the degree
    distribution op is the pre-flight check that bounds it, and the
    a < b orientation halves the work exactly as in triangle counting.
    The adjacency exclusion is a left-anti join on the edge key, and
    degree lookups broadcast (node-count-sized)."""
    from trip_data_pipeline_spark.operators.graph import _copart_edges

    e = _copart_edges(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    l = e.select(F.col("src").alias("a"), F.col("dst").alias("n"))
    r = e.select(F.col("src").alias("b"), F.col("dst").alias("n"))
    cn = (
        l.join(r, "n")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= 2)
    )
    cand = cn.join(
        e.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    da = deg.select(F.col("src").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("src").alias("b"), F.col("d").alias("db"))
    return (
        cand.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            "a",
            "b",
            bigint(F.col("common")).alias("n_common"),
            bigint(
                F.expr("1000000 * common div (da + db - common)")
            ).alias("jaccard_ppm"),
        )
    )


_SENT_POS = ("fast", "big", "value")
_SENT_NEG = ("slow", "small", "dup")


@op(
    "text_sentiment_lexicon",
    oracle=f"""
WITH w AS (SELECT lang, {_duck_words()} AS ws FROM documents),
s AS (
  SELECT lang,
         len(ws) AS n_words,
         len(list_filter(ws, x -> x IN ('fast','big','value'))) AS pos,
         len(list_filter(ws, x -> x IN ('slow','small','dup'))) AS neg
  FROM w
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(pos) AS BIGINT) AS pos_hits,
       CAST(sum(neg) AS BIGINT) AS neg_hits,
       CAST(1000000 * (sum(pos) - sum(neg)) // sum(n_words) AS BIGINT)
         AS net_ppm
FROM s GROUP BY lang
""",
    category=CAT,
)
def text_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based sentiment scoring (the pre-neural baseline every
    text engine still ships): positive/negative token hits per doc
    against small word lists, rolled up per language with the exact
    token-weighted net score in ppm (cross-multiplied integer — the
    same immune-to-partial-agg-order form as the weighted-mean op).
    In a corpus pipeline the identical shape scores toxicity / policy
    lexicons, where per-slice drift gates a source.

    Scale: map-side array filters against broadcast-literal lists (no
    join — the lexicon folds into the expression), one lang-keyed
    partial/final agg."""
    d = spread(load(spark, sf_dir, "documents"), min_fraction=0.25)
    ws = _words()
    s = d.select(
        "lang",
        F.size(ws).alias("n_words"),
        F.size(
            F.filter(ws, lambda x: x.isin(*_SENT_POS))
        ).alias("pos"),
        F.size(
            F.filter(ws, lambda x: x.isin(*_SENT_NEG))
        ).alias("neg"),
    )
    return (
        s.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pos").alias("pos_hits"),
            F.sum("neg").alias("neg_hits"),
            F.sum("n_words").alias("nw"),
        )
        .select(
            "lang",
            bigint(F.col("n_docs")).alias("n_docs"),
            bigint(F.col("pos_hits")).alias("pos_hits"),
            bigint(F.col("neg_hits")).alias("neg_hits"),
            bigint(
                F.expr("1000000 * (pos_hits - neg_hits) div nw")
            ).alias("net_ppm"),
        )
    )


@op(
    "features_multi_horizon",
    oracle="""
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
w AS (
  SELECT user_id,
         count(*) OVER (PARTITION BY user_id ORDER BY us
                        RANGE BETWEEN 3600000000 PRECEDING
                              AND CURRENT ROW) AS c1h,
         count(*) OVER (PARTITION BY user_id ORDER BY us
                        RANGE BETWEEN 21600000000 PRECEDING
                              AND CURRENT ROW) AS c6h,
         count(*) OVER (PARTITION BY user_id ORDER BY us
                        RANGE BETWEEN 86400000000 PRECEDING
                              AND CURRENT ROW) AS c24h
  FROM e
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(c1h) AS BIGINT) AS peak_1h,
       CAST(max(c6h) AS BIGINT) AS peak_6h,
       CAST(max(c24h) AS BIGINT) AS peak_24h
FROM w GROUP BY user_id
""",
    category=CAT,
)
def features_multi_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-horizon trailing-window features in ONE pass: per event,
    trailing 1h/6h/24h event counts via three RANGE frames over the
    same user-keyed sort, rolled up to each user's PEAK per horizon —
    the feature-store pattern (and the burst/bot signal: a peak_1h
    near peak_24h is a burst account).  RANGE frames make timestamp
    ties frame-peers in both engines, so the counts are order-stable
    without a tiebreaker.

    Scale: the three frames share one window sort (one Exchange + one
    Sort, three frame evaluators), then a user-keyed partial/final
    agg — adding horizons costs no extra shuffle."""
    ev = spread(load(spark, sf_dir, "events"))
    e = ev.select("user_id", F.expr("unix_micros(ts)").alias("us"))

    def frame(preceding_us: int):
        return (
            Window.partitionBy("user_id")
            .orderBy("us")
            .rangeBetween(-preceding_us, Window.currentRow)
        )

    w = e.select(
        "user_id",
        F.count(F.lit(1)).over(frame(3_600_000_000)).alias("c1h"),
        F.count(F.lit(1)).over(frame(21_600_000_000)).alias("c6h"),
        F.count(F.lit(1)).over(frame(86_400_000_000)).alias("c24h"),
    )
    return w.groupBy("user_id").agg(
        bigint(F.count(F.lit(1))).alias("n_events"),
        bigint(F.max("c1h")).alias("peak_1h"),
        bigint(F.max("c6h")).alias("peak_6h"),
        bigint(F.max("c24h")).alias("peak_24h"),
    )


@op(
    "sample_negatives_hash_ring",
    oracle="""
WITH n AS (SELECT count(*) AS n_docs FROM documents),
pos AS (SELECT doc_id, lang FROM documents),
neg AS (
  SELECT p.doc_id, j.j AS neg_rank,
         (p.doc_id + j.j * 104729) % n.n_docs AS neg_id
  FROM pos p, n, (SELECT unnest([1, 2, 3]) AS j) j
  WHERE (p.doc_id + j.j * 104729) % n.n_docs <> p.doc_id
)
SELECT neg.doc_id, neg.neg_rank, CAST(neg.neg_id AS BIGINT) AS neg_id,
       CAST(CASE WHEN p.lang = q.lang THEN 1 ELSE 0 END AS BIGINT)
         AS same_lang
FROM neg
JOIN pos p ON p.doc_id = neg.doc_id
JOIN pos q ON q.doc_id = neg.neg_id
""",
    category=CAT,
)
def sample_negatives_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    doc gets k=3 negatives at fixed prime strides around the dense-id
    ring ((id + j*104729) mod N — reproducible across runs and
    engines, no RNG), annotated with a same-language flag so the
    training mix can control easy-vs-hard negative ratios.  Requires
    dense ids; the ids_global_contiguous op is the densifier when a
    corpus lacks them (its docstring carries the premise).

    Scale: the 1-row corpus count broadcasts, the 3-way explode is
    map-side, and the negative's features arrive via one equi-join on
    the ring id — no shuffle beyond that join; self-pairs (N divides
    the stride ring onto itself) are excluded identically in both
    engines."""
    docs = spread(load(spark, sf_dir, "documents"), min_fraction=0.25).select(
        "doc_id", "lang"
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    neg = (
        docs.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "lang",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("neg_rank"),
            "n_docs",
        )
        .select(
            "doc_id",
            "lang",
            "neg_rank",
            F.expr("(doc_id + neg_rank * 104729) % n_docs").alias("neg_id"),
        )
        .filter(F.col("neg_id") != F.col("doc_id"))
    )
    q = docs.select(
        F.col("doc_id").alias("neg_id"), F.col("lang").alias("neg_lang")
    )
    return neg.join(q, "neg_id").select(
        "doc_id",
        "neg_rank",
        bigint(F.col("neg_id")).alias("neg_id"),
        bigint(
            F.when(F.col("lang") == F.col("neg_lang"), 1).otherwise(0)
        ).alias("same_lang"),
    )


@op(
    "events_peak_concurrency",
    oracle="""
WITH iv AS (
  SELECT event_type, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
  FROM events WHERE event_type IS NOT NULL
),
pts AS (
  SELECT event_type, s AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT event_type, e AS t, -1 AS delta FROM iv
),
run AS (
  SELECT event_type,
         sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS live
  FROM pts
)
SELECT event_type,
       CAST((SELECT count(*) FROM iv i WHERE i.event_type = run.event_type)
            AS BIGINT) AS n_intervals,
       CAST(max(live) AS BIGINT) AS peak_concurrent
FROM run GROUP BY event_type
""",
    category=CAT,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency by sweep-line: each event opens a 5-minute
    half-open interval; +1/-1 boundary points sorted by (t, delta)
    (ends before starts at the same instant, so back-to-back intervals
    never double-count), running sum, max per event type.  The
    max-concurrent-viewers / peak-open-sessions query — the capacity
    number a trip or streaming platform plans against.

    The running sum's per-row values among identical (t, delta) peers
    are order-dependent, but the partition MAX is not: within a tie
    run of +1s the max sits at the run's end, within -1s at its start
    — both engines agree (property the test pins).

    Scale: one event_type-keyed window sort over 2x the events.  For
    a single global timeline (no type key) the standard trick is a
    two-level sweep: per-shard running sums plus a tiny prefix-offset
    recombine; the per-key form here is the shape that parallelizes
    for free."""
    ev = spread(load(spark, sf_dir, "events"))
    # untyped (NULL event_type) events belong to no concurrency class
    # — excluded in BOTH engines (round-8 NULL-payload sweep: the
    # oracle's correlated count is 3-valued-false for the NULL group
    # while groupBy keeps it, so the engines disagreed on that row)
    iv = ev.filter(F.col("event_type").isNotNull()).select(
        "event_type",
        F.expr("unix_micros(ts)").alias("s"),
        F.expr("unix_micros(ts) + 300000000").alias("e"),
    )
    pts = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select("event_type", F.sum("delta").over(w).alias("live"))
    peaks = run.groupBy("event_type").agg(
        bigint(F.max("live")).alias("peak_concurrent")
    )
    counts = iv.groupBy("event_type").agg(
        bigint(F.count(F.lit(1))).alias("n_intervals")
    )
    return peaks.join(counts, "event_type").select(
        "event_type", "n_intervals", "peak_concurrent"
    )


@op(
    "agg_weighted_median_exact",
    oracle=f"""
WITH q AS (
  SELECT doc_id, lang,
         len({_duck_words()}) AS w,
         1000000 * len(list_distinct({_duck_words()}))
           // len({_duck_words()}) AS x
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT lang, w, x,
         sum(w) OVER (PARTITION BY lang ORDER BY x, doc_id
                      ROWS UNBOUNDED PRECEDING) AS cumw,
         sum(w) OVER (PARTITION BY lang) AS total_w
  FROM q
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_qualifying,
       CAST(min(total_w) AS BIGINT) AS w_total,
       CAST(min(x) AS BIGINT) AS wmedian_ppm
FROM c WHERE 2 * cumw >= total_w
GROUP BY lang
""",
    category=CAT,
)
def agg_weighted_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-weighted MEDIAN of per-doc quality per language:
    sort docs by (score, doc_id) within language, running weight sum,
    the median is the first score whose cumulative weight reaches half
    the total — expressed as min(x) over qualifying rows, which is
    deterministic because cumw is monotone along the sort.  The robust
    companion to the weighted mean (agg_weighted_avg_exact): one
    mega-doc can drag a mean but not this.

    Scale: one lang-keyed window sort + running sum, then a
    partial/final agg — the classic exact-distributed-median shape
    (no collect, no iterative quantile probing); the doc_id tiebreak
    makes the sort total so the answer is replayable."""
    # NULL-text docs have no weight/score — excluded in BOTH engines
    # (round-8 NULL-payload sweep: the NULL x row shifts cumw
    # positions differently under each engine's NULL ordering)
    d = spread(load(spark, sf_dir, "documents"), min_fraction=0.25).filter(
        F.col("text").isNotNull()
    )
    ws = _words()
    q = d.select(
        "doc_id",
        "lang",
        F.size(ws).alias("w"),
        F.size(F.array_distinct(ws)).alias("nd"),
    ).select(
        "doc_id", "lang", "w", F.expr("1000000 * nd div w").alias("x")
    )
    cum = (
        Window.partitionBy("lang")
        .orderBy("x", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = q.select(
        "lang",
        "w",
        "x",
        F.sum("w").over(cum).alias("cumw"),
        F.sum("w").over(Window.partitionBy("lang")).alias("total_w"),
    )
    return (
        c.filter(2 * F.col("cumw") >= F.col("total_w"))
        .groupBy("lang")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_qualifying"),
            bigint(F.min("total_w")).alias("w_total"),
            bigint(F.min("x")).alias("wmedian_ppm"),
        )
    )


@op(
    "dq_partition_drift",
    oracle="""
WITH m AS (
  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
         count(*) AS n,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
g AS (
  SELECT ym, n, cents,
         cents // n AS mean_cents,
         sum(cents) OVER () // sum(n) OVER () AS global_mean
  FROM m
)
SELECT CAST(ym AS BIGINT) AS ym,
       CAST(n AS BIGINT) AS n_orders,
       CAST(mean_cents AS BIGINT) AS mean_cents,
       CAST(1000000 * abs(mean_cents - global_mean) // global_mean
            AS BIGINT) AS drift_ppm,
       CAST(CASE WHEN mean_cents >= global_mean THEN 1 ELSE -1 END
            AS BIGINT) AS drift_sign
FROM g
""",
    category=CAT,
)
def dq_partition_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level drift audit: mean order value (exact integer
    cents, floor-div) per year-month partition vs the global mean,
    absolute drift in ppm plus its sign.  The table-health scan that
    catches a bad backfill or a unit change landing in ONE partition —
    global stats stay plausible while a single month is 10x off.

    Scale: one partition-key agg (mergeable sum/count), window totals
    over the handful of partition rows; at a real lakehouse this reads
    partition column + one metric column only, pruned at the scan."""
    o = spread(load(spark, sf_dir, "orders"))
    m = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
        ).alias("cents"),
    )
    g = m.select(
        "ym",
        "n",
        "cents",
        F.expr("cents div n").alias("mean_cents"),
        F.sum("cents").over(Window.partitionBy()).alias("tc"),
        F.sum("n").over(Window.partitionBy()).alias("tn"),
    ).select("ym", "n", "mean_cents", F.expr("tc div tn").alias("global_mean"))
    return g.select(
        bigint(F.col("ym")).alias("ym"),
        bigint(F.col("n")).alias("n_orders"),
        bigint(F.col("mean_cents")).alias("mean_cents"),
        bigint(
            F.expr("1000000 * abs(mean_cents - global_mean) div global_mean")
        ).alias("drift_ppm"),
        bigint(
            F.when(F.col("mean_cents") >= F.col("global_mean"), 1).otherwise(-1)
        ).alias("drift_sign"),
    )


@op(
    "geo_od_flow_imbalance",
    oracle="""
WITH pts AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         ((user_id * 7919 + event_id * 13) % 17000) // 100 AS cell_lat,
         ((user_id * 104729 + event_id * 31) % 36000) // 100 AS cell_lon
  FROM events
),
legs AS (
  SELECT lag(cell_lat) OVER w AS o_lat, lag(cell_lon) OVER w AS o_lon,
         cell_lat AS d_lat, cell_lon AS d_lon
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
dep AS (
  SELECT o_lat AS lat, o_lon AS lon, count(*) AS departures
  FROM legs WHERE o_lat IS NOT NULL GROUP BY 1, 2
),
arr AS (
  SELECT d_lat AS lat, d_lon AS lon, count(*) AS arrivals
  FROM legs WHERE o_lat IS NOT NULL GROUP BY 1, 2
)
SELECT CAST(coalesce(dep.lat, arr.lat) AS BIGINT) AS lat,
       CAST(coalesce(dep.lon, arr.lon) AS BIGINT) AS lon,
       CAST(coalesce(departures, 0) AS BIGINT) AS departures,
       CAST(coalesce(arrivals, 0) AS BIGINT) AS arrivals,
       CAST(coalesce(arrivals, 0) - coalesce(departures, 0) AS BIGINT)
         AS net_inflow
FROM dep FULL OUTER JOIN arr ON dep.lat = arr.lat AND dep.lon = arr.lon
WHERE abs(coalesce(arrivals, 0) - coalesce(departures, 0)) >= 2
""",
    category="2.13 geo trip analytics",
)
def geo_od_flow_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-destination flow imbalance per 1-degree grid cell:
    departures vs arrivals over consecutive-event trips, keeping cells
    with |net inflow| >= 2 — the rebalancing report (where do vehicles
    / riders accumulate) that complements the OD matrix's top flows.

    Scale: the same single user-keyed window as the OD matrix builds
    legs once; departures and arrivals are two cell-keyed partial/final
    aggs over it, recombined with a cell-keyed full outer join (both
    sides already cell-partitioned, grid domain is fixed 360x170 so
    the join is bounded)."""
    from trip_data_pipeline_spark.operators.geo import _LAT_CENTI, _LON_CENTI

    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts)").alias("us"),
        F.expr(f"{_LAT_CENTI} div 100").alias("cell_lat"),
        F.expr(f"{_LON_CENTI} div 100").alias("cell_lon"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    legs = pts.select(
        F.lag("cell_lat").over(w).alias("o_lat"),
        F.lag("cell_lon").over(w).alias("o_lon"),
        F.col("cell_lat").alias("d_lat"),
        F.col("cell_lon").alias("d_lon"),
    ).filter(F.col("o_lat").isNotNull())
    dep = legs.groupBy(
        F.col("o_lat").alias("lat"), F.col("o_lon").alias("lon")
    ).agg(F.count(F.lit(1)).alias("departures"))
    arr = legs.groupBy(
        F.col("d_lat").alias("lat"), F.col("d_lon").alias("lon")
    ).agg(F.count(F.lit(1)).alias("arrivals"))
    j = dep.join(arr, ["lat", "lon"], "full_outer").select(
        "lat",
        "lon",
        F.coalesce("departures", F.lit(0)).alias("departures"),
        F.coalesce("arrivals", F.lit(0)).alias("arrivals"),
    )
    return (
        j.select(
            bigint(F.col("lat")).alias("lat"),
            bigint(F.col("lon")).alias("lon"),
            bigint(F.col("departures")).alias("departures"),
            bigint(F.col("arrivals")).alias("arrivals"),
            bigint(F.col("arrivals") - F.col("departures")).alias("net_inflow"),
        )
        .filter(F.abs(F.col("net_inflow")) >= 2)
    )


@op(
    "join_asof_forward",
    oracle="""
WITH o AS (
  SELECT o_orderkey,
         o_custkey % 150 AS uid,
         1704067200 + (o_orderkey * 1700) % 2592000 AS order_s
  FROM orders WHERE o_orderkey < 2000
), e AS (
  SELECT user_id, event_id, (epoch_us(ts) // 1000000) AS ev_s FROM events
), j AS (
  SELECT o.o_orderkey, o.order_s, e.event_id, e.ev_s,
         row_number() OVER (PARTITION BY o.o_orderkey
                            ORDER BY e.ev_s ASC, e.event_id ASC) AS rn
  FROM o JOIN e ON e.user_id = o.uid AND e.ev_s >= o.order_s
)
SELECT o_orderkey, order_s, event_id AS next_event_id, ev_s AS next_ev_s,
       CAST(ev_s - order_s AS BIGINT) AS lag_s
FROM j WHERE rn = 1
""",
    category="2.3 joins",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: EARLIEST event at-or-after each order (the
    mirror of join_asof_latest's backward lookup) plus the response
    lag in seconds — the SLA / next-touch query: 'how long until the
    system reacted'.  Same user-key + inequality + row_number()=1
    formulation; the same coarse-time-bucket bounding strategy from
    the backward op (joins.py:330) is the 100-TB path.

    Scale: candidate fan-out is bounded by the probe-side filter per
    the backward op's contract; the shuffle keys on the user id and
    the per-order top-1 is a window over the candidates."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 150).alias("uid"),
            (F.lit(1704067200) + (F.col("o_orderkey") * 1700) % 2592000).alias(
                "order_s"
            ),
        )
    )
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts) div 1000000").alias("ev_s"),
    )
    j = o.join(
        e,
        (e.user_id == o.uid) & (e.ev_s >= o.order_s),
    )
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("ev_s").asc(), F.col("event_id").asc()
    )
    return (
        j.select(
            "o_orderkey", "order_s", "event_id", "ev_s",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            "order_s",
            F.col("event_id").alias("next_event_id"),
            F.col("ev_s").alias("next_ev_s"),
            bigint(F.col("ev_s") - F.col("order_s")).alias("lag_s"),
        )
    )


# Watermark detection reuses the tiles op wholesale: its DataFrame on
# the Spark side, its arithmetic-replay oracle (embedded as a derived
# table) on the DuckDB side.
_TILES_ORACLE = OPS["multimodal_image_tiles"].oracle


@op(
    "multimodal_tile_watermark_detect",
    oracle=f"""
WITH q AS (
  SELECT tile_x, tile_y,
         (sum_r * 4) // (n_px * 256) AS qr,
         (sum_g * 4) // (n_px * 256) AS qg,
         (sum_b * 4) // (n_px * 256) AS qb
  FROM ({_TILES_ORACLE}) tiles
)
SELECT tile_x, tile_y,
       CAST(qr AS BIGINT) AS qr,
       CAST(qg AS BIGINT) AS qg,
       CAST(qb AS BIGINT) AS qb,
       CAST(count(*) AS BIGINT) AS n_docs
FROM q GROUP BY tile_x, tile_y, qr, qg, qb
HAVING count(*) >= 5
""",
    category=CAT,
)
def multimodal_tile_watermark_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark / logo / banner detection by coarse tile signatures:
    each decoded tile's per-channel mean quantized to 2 bits, then
    (position, signature) buckets appearing in >= 5 distinct images
    are flagged — repeated same-looking content at the same position
    is how overlay watermarks surface in a crawl, and removing them
    before dedup stops a shared banner from gluing unrelated pages
    into one near-dup cluster.

    Scale: consumes the tiles op's map-only decode (zero exchanges),
    adds one (position, signature)-keyed partial/final agg; the
    signature space is constant (32 positions x 64 signatures) so the
    output is bounded regardless of corpus size."""
    tiles = multimodal_image_tiles(spark, sf_dir)
    q = tiles.select(
        "tile_x",
        "tile_y",
        F.expr("(sum_r * 4) div (n_px * 256)").alias("qr"),
        F.expr("(sum_g * 4) div (n_px * 256)").alias("qg"),
        F.expr("(sum_b * 4) div (n_px * 256)").alias("qb"),
    )
    return (
        q.groupBy("tile_x", "tile_y", "qr", "qg", "qb")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
        .select(
            "tile_x",
            "tile_y",
            bigint(F.col("qr")).alias("qr"),
            bigint(F.col("qg")).alias("qg"),
            bigint(F.col("qb")).alias("qb"),
            bigint(F.col("n")).alias("n_docs"),
        )
    )


@op(
    "orders_interpurchase_gap",
    oracle="""
WITH g AS (
  SELECT o_custkey,
         date_diff('day',
                   CAST(lag(o_orderdate) OVER w AS DATE),
                   CAST(o_orderdate AS DATE)) AS gap_d
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
)
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_d) AS BIGINT) AS min_gap_d,
       CAST(max(gap_d) AS BIGINT) AS max_gap_d,
       CAST(sum(gap_d) // count(*) AS BIGINT) AS mean_gap_d
FROM g WHERE gap_d IS NOT NULL
GROUP BY o_custkey
""",
    category=CAT,
)
def orders_interpurchase_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase interval stats per customer: whole-day gaps
    between consecutive orders ((orderdate, orderkey)-ordered for a
    total sort), min/max/floor-mean per customer — the cadence signal
    behind churn prediction and replenishment timing, complementing
    RFM's how-much with how-regularly.

    Scale: one customer-keyed window sort (same shape as
    sessionization: a customer's orders fit a partition) + a
    partial/final agg; whole-day gaps via date-boundary datediff on
    the NAIVE date part, timezone-free in both engines (the fixture
    column is TIMESTAMP_NTZ — epoch arithmetic would drag the session
    TZ in)."""
    o = spread(load(spark, sf_dir, "orders"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.to_date("o_orderdate")
    g = o.select(
        "o_custkey", F.datediff(d, F.lag(d).over(w)).alias("gap_d")
    ).filter(F.col("gap_d").isNotNull())
    return g.groupBy("o_custkey").agg(
        bigint(F.count(F.lit(1))).alias("n_gaps"),
        bigint(F.min("gap_d")).alias("min_gap_d"),
        bigint(F.max("gap_d")).alias("max_gap_d"),
        bigint(F.expr("sum(gap_d) div count(1)")).alias("mean_gap_d"),
    )


@op(
    "agg_pareto_coverage",
    oracle="""
WITH rev AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT row_number() OVER (ORDER BY cents DESC, o_custkey) AS rn,
         sum(cents) OVER (ORDER BY cents DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cents) OVER () AS total
  FROM rev
),
share AS (SELECT rn, 1000000 * cum // total AS share_ppm FROM ranked),
thr(threshold_ppm) AS (VALUES (500000), (800000), (900000))
SELECT CAST(thr.threshold_ppm AS BIGINT) AS threshold_ppm,
       CAST(min(rn) AS BIGINT) AS n_customers,
       CAST(min(share_ppm) AS BIGINT) AS share_ppm
FROM thr JOIN share ON share.share_ppm >= thr.threshold_ppm
GROUP BY thr.threshold_ppm
""",
    category=CAT,
)
def agg_pareto_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / concentration-curve coverage: how many top customers
    (revenue-ranked, custkey tiebreak) cover 50% / 80% / 90% of total
    revenue, with the exact share reached at that head count — the
    80/20 readout behind account-tiering and the long-tail view HHI's
    single number hides.  min(rn) and min(share_ppm) over qualifying
    rows are deterministic because cumulative share is monotone along
    the rank order.

    Scale: customer-keyed partial/final agg over the fact, then ONE
    global sort of customer rows for the running share — at 100 TB the
    curve is computed on the aggregate (customers), not the fact, and
    a two-level sampled-quantile variant bounds even that; the 3-row
    threshold relation broadcasts into the inequality probe."""
    o = spread(load(spark, sf_dir, "orders"))
    rev = o.groupBy("o_custkey").agg(
        F.sum(
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
        ).alias("cents")
    )
    order = [F.col("cents").desc(), F.col("o_custkey")]
    ranked = rev.select(
        F.row_number().over(Window.orderBy(*order)).alias("rn"),
        F.sum("cents")
        .over(
            Window.orderBy(*order).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cum"),
        F.sum("cents").over(Window.partitionBy()).alias("total"),
    )
    # ppm share via DECIMAL(38,0): `1000000 * cum` on bigint cents
    # overflows int64 once cumulative revenue passes ~9.2e12 cents
    # (caught by the 10x profile sweep, round 7 — sf0.01 never
    # triggers it, 100 TB always would).  Decimal widening keeps the
    # arithmetic exact and `div` keeps DuckDB's `//` floor semantics;
    # values are unchanged wherever the old expression didn't overflow.
    share = ranked.select(
        "rn",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * cum) div total AS BIGINT)"
        ).alias("share_ppm"),
    )
    thr = spark.createDataFrame(
        [(500000,), (800000,), (900000,)], "threshold_ppm int"
    )
    return (
        F.broadcast(thr)
        .join(share, share.share_ppm >= thr.threshold_ppm)
        .groupBy("threshold_ppm")
        .agg(
            bigint(F.min("rn")).alias("n_customers"),
            bigint(F.min("share_ppm")).alias("share_ppm"),
        )
        .select(
            bigint(F.col("threshold_ppm")).alias("threshold_ppm"),
            "n_customers",
            "share_ppm",
        )
    )


@op(
    "corpus_tokenizer_fertility",
    oracle=r"""
WITH t AS (
  SELECT lang,
         len(string_split(text, ' ')) AS n_ws,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
           AS n_bpe
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_ws) AS BIGINT) AS ws_tokens,
       CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens,
       CAST(1000000 * sum(n_bpe) // sum(n_ws) AS BIGINT)
         AS fertility_ppm
FROM t GROUP BY lang
""",
    category=CAT,
)
def corpus_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish subword tokens per
    whitespace word in exact ppm — the multilingual-tokenizer health
    metric (a language with 2-3x the fertility of English pays 2-3x
    the context budget for the same content, the signal that drives
    vocab-size and per-language budget decisions).  Reuses the exact
    token definitions of text_token_count_bpe, aggregated corpus-wide.

    Scale: map-side regex counting (constant state per doc), one
    lang-keyed partial/final agg; the corpus never re-tokenizes twice
    because both counts come from the same projection."""
    d = spread(load(spark, sf_dir, "documents"), min_fraction=0.25)
    from trip_data_pipeline_spark.operators.text_ops import _BPE_RE

    t = d.select(
        "lang",
        F.size(F.split(F.col("text"), " ")).alias("n_ws"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_RE), 0)
        ).alias("n_bpe"),
    )
    return (
        t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws").alias("ws_tokens"),
            F.sum("n_bpe").alias("bpe_tokens"),
        )
        .select(
            "lang",
            bigint(F.col("n_docs")).alias("n_docs"),
            bigint(F.col("ws_tokens")).alias("ws_tokens"),
            bigint(F.col("bpe_tokens")).alias("bpe_tokens"),
            bigint(F.expr("1000000 * bpe_tokens div ws_tokens")).alias(
                "fertility_ppm"
            ),
        )
    )


@op(
    "timeseries_downsample_ltob",
    oracle="""
WITH p AS (
  SELECT user_id, epoch_us(ts) AS x,
         CAST(round(value * 100) AS BIGINT) AS y,
         event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS rn
  FROM events
),
n AS (
  SELECT user_id, x, y, event_id, rn, rn // 8 AS bucket,
         lag(x)  OVER w AS px, lag(y)  OVER w AS py,
         lead(x) OVER w AS nx, lead(y) OVER w AS ny
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY rn)
),
a AS (
  SELECT user_id, bucket, event_id, y,
         abs((px - nx) * (y - py) - (px - x) * (ny - py)) AS area2
  FROM n WHERE px IS NOT NULL AND nx IS NOT NULL
),
r AS (
  SELECT user_id, bucket, event_id, y, area2,
         row_number() OVER (PARTITION BY user_id, bucket
                            ORDER BY area2 DESC, event_id) AS pick
  FROM a
)
SELECT user_id, CAST(bucket AS BIGINT) AS bucket,
       event_id AS kept_event_id,
       CAST(y AS BIGINT) AS kept_y_cents,
       CAST(area2 AS BIGINT) AS area2
FROM r WHERE pick = 1
""",
    category=CAT,
)
def timeseries_downsample_ltob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-One-Bucket downsampling (Steinarsson 2013's
    LTOB variant): per user, split the series into 8-point buckets and
    keep the point with the largest doubled-triangle area against its
    immediate neighbors — the chart-fidelity downsampler dashboards
    run before plotting millions of points.  The area is an exact
    integer cross product on (epoch us, cents), so selection —
    including the event_id tiebreak — replays exactly in both engines
    (unlike true LTTB, whose previous-selected-point recurrence is
    sequential; LTOB is the parallelizable variant).

    Scale: one user-keyed window sort shared by row_number + lag/lead,
    then a (user, bucket)-keyed top-1 — rank pushdown
    (WindowGroupLimit) keeps only candidates per bucket pre-shuffle."""
    ev = spread(load(spark, sf_dir, "events"))
    worder = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        "user_id",
        F.expr("unix_micros(ts)").alias("x"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("y"),
        "event_id",
        (F.row_number().over(worder) - 1).alias("rn"),
    )
    wrn = Window.partitionBy("user_id").orderBy("rn")
    n = p.select(
        "user_id",
        "x",
        "y",
        "event_id",
        F.expr("rn div 8").alias("bucket"),
        F.lag("x").over(wrn).alias("px"),
        F.lag("y").over(wrn).alias("py"),
        F.lead("x").over(wrn).alias("nx"),
        F.lead("y").over(wrn).alias("ny"),
    )
    a = n.filter(F.col("px").isNotNull() & F.col("nx").isNotNull()).select(
        "user_id",
        "bucket",
        "event_id",
        "y",
        F.abs(
            (F.col("px") - F.col("nx")) * (F.col("y") - F.col("py"))
            - (F.col("px") - F.col("x")) * (F.col("ny") - F.col("py"))
        ).alias("area2"),
    )
    pick = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("area2").desc(), F.col("event_id")
    )
    return (
        a.select(
            "user_id", "bucket", "event_id", "y", "area2",
            F.row_number().over(pick).alias("pk"),
        )
        .filter(F.col("pk") == 1)
        .select(
            "user_id",
            bigint(F.col("bucket")).alias("bucket"),
            F.col("event_id").alias("kept_event_id"),
            bigint(F.col("y")).alias("kept_y_cents"),
            bigint(F.col("area2")).alias("area2"),
        )
    )


@op(
    "events_run_length_encode",
    oracle="""
WITH o AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM o
)
SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
       CAST(count(*) AS BIGINT) AS run_len
FROM runs GROUP BY user_id, run_id, event_type
""",
    category=CAT,
)
def events_run_length_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of per-user event-type sequences: the
    gaps-and-islands change-flag + running-sum trick compresses
    consecutive same-type events into (run_id, type, length) — the
    sequence-compression pass before pattern mining (a 40-click run
    becomes one token for the CEP/Markov ops), and the islands
    primitive itself, distinct from the daily-streak op's
    calendar form.

    Scale: one user-keyed window sort shared by the change flag and
    the running sum, then a partial/final agg on (user, run) — output
    is one row per run, never wider than the input."""
    ev = spread(load(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
        "event_id",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    wrun = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    runs = o.select(
        "user_id", "event_type", F.sum("brk").over(wrun).alias("run_id")
    )
    return runs.groupBy("user_id", "run_id", "event_type").agg(
        bigint(F.count(F.lit(1))).alias("run_len")
    ).select(
        "user_id",
        bigint(F.col("run_id")).alias("run_id"),
        "event_type",
        "run_len",
    )


@op(
    "multimodal_audio_clipping",
    oracle="""
WITH s AS (
  SELECT doc_id, i.i AS i,
         ((doc_id * 131 + i.i * 17) % 65536) - 32768 AS s
  FROM documents
  CROSS JOIN (SELECT unnest(range(0, 60)) AS i) i
  WHERE i.i < (doc_id % 50) + 10
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(max(abs(s)) AS BIGINT) AS peak_abs,
       CAST(sum(CASE WHEN abs(s) >= 32256 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped,
       CAST(1000000 * sum(CASE WHEN abs(s) >= 32256 THEN 1 ELSE 0 END)
            // count(*) AS BIGINT) AS clip_ppm
FROM s GROUP BY doc_id
""",
    category=CAT,
)
def multimodal_audio_clipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clipping / loudness QA over the REAL RIFF/WAVE decode chain:
    per clip, sample count, peak absolute amplitude, and the count +
    exact ppm of samples within 512 of full scale (|s| >= 32256, about
    -0.14 dBFS) — the hard-clipping gate an audio-curation pipeline
    applies before spending ASR/captioning compute, next to the energy
    VAD and ZCR ops.  The oracle replays the deterministic PCM
    lattice; the Spark side decodes actual RIFF bytes.

    Scale: map-only mapInPandas, constant per-doc state."""
    import numpy as np

    from trip_data_pipeline_spark.operators.multimodal import (
        _decode_wav,
        _encode_wav,
    )

    def clip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "n_samples", "peak_abs", "n_clipped", "clip_ppm"]
        out = {k: [] for k in cols}
        for pdf in batches:
            for d in pdf["doc_id"]:
                f = _decode_wav(_encode_wav(int(d)))
                s = np.abs(np.asarray(f["samples"], dtype=np.int64))
                nc = int((s >= 32256).sum())
                out["doc_id"].append(int(d))
                out["n_samples"].append(len(s))
                out["peak_abs"].append(int(s.max()))
                out["n_clipped"].append(nc)
                out["clip_ppm"].append(1_000_000 * nc // len(s))
            yield pd.DataFrame(out)
            out = {k: [] for k in cols}

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        clip,
        schema=(
            "doc_id bigint, n_samples bigint, peak_abs bigint,"
            " n_clipped bigint, clip_ppm bigint"
        ),
    )


@op(
    "geo_colocation_pairs",
    oracle="""
WITH pts AS (
  SELECT DISTINCT user_id,
         ((user_id * 7919 + event_id * 13) % 17000) // 100 AS cell_lat,
         ((user_id * 104729 + event_id * 31) % 36000) // 100 AS cell_lon,
         epoch_us(ts) // 3600000000 AS hour_bucket
  FROM events
)
SELECT a.user_id AS user_a, b.user_id AS user_b,
       CAST(count(*) AS BIGINT) AS n_colocations,
       CAST(count(DISTINCT a.hour_bucket) AS BIGINT) AS n_distinct_hours
FROM pts a JOIN pts b
  ON a.cell_lat = b.cell_lat AND a.cell_lon = b.cell_lon
 AND a.hour_bucket = b.hour_bucket AND a.user_id < b.user_id
GROUP BY a.user_id, b.user_id
HAVING count(*) >= 3
""",
    category="2.13 geo trip analytics",
)
def geo_colocation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-location mining: user pairs repeatedly in the same 1-degree
    grid cell during the same hour (>= 3 co-occurrences) — the
    contact-graph / shared-ride-candidate analysis famous from taxi
    datasets, and the privacy-review query that shows WHY coordinate
    coarsening (geo_grid_cell_density's anonymization note) matters
    before publishing trips.

    Scale: self-join keyed on (cell, hour) — the spatiotemporal
    blocking that bounds pair formation to co-bucket groups exactly
    like the dedup band joins; DISTINCT first so a user's repeated
    pings in one cell-hour count once."""
    ev = load(spark, sf_dir, "events")
    from trip_data_pipeline_spark.operators.geo import _LAT_CENTI, _LON_CENTI

    pts = ev.select(
        "user_id",
        F.expr(f"{_LAT_CENTI} div 100").alias("cell_lat"),
        F.expr(f"{_LON_CENTI} div 100").alias("cell_lon"),
        F.expr("unix_micros(ts) div 3600000000").alias("hour_bucket"),
    ).distinct()
    a = pts.select(
        F.col("user_id").alias("user_a"), "cell_lat", "cell_lon", "hour_bucket"
    )
    b = pts.select(
        F.col("user_id").alias("user_b"), "cell_lat", "cell_lon", "hour_bucket"
    )
    return (
        a.join(b, ["cell_lat", "cell_lon", "hour_bucket"])
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_colocations"),
            bigint(F.countDistinct("hour_bucket")).alias("n_distinct_hours"),
        )
        .filter(F.col("n_colocations") >= 3)
    )


@op(
    "dq_sequence_gaps",
    oracle="""
WITH k AS (
  SELECT o_orderkey AS k,
         lag(o_orderkey) OVER (ORDER BY o_orderkey) AS pk
  FROM orders
)
SELECT CAST(pk + 1 AS BIGINT) AS gap_start,
       CAST(k - 1 AS BIGINT) AS gap_end,
       CAST(k - pk - 1 AS BIGINT) AS gap_len
FROM k WHERE pk IS NOT NULL AND k - pk > 1
""",
    category=CAT,
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap audit over a supposedly-sequential key: every
    missing-id range in o_orderkey as (start, end, length) — the
    lost-batch detector for ingest feeds that promise contiguous ids
    (a gap of exactly one file's worth of rows is a dropped file, not
    noise).  TPC-H orderkeys are deliberately sparse, so the fixture
    exercises real gaps.

    Scale (round-7 rework): the naive ``lag() OVER (ORDER BY k)`` is a
    partitionless window — Spark moves EVERY key into one task
    (WindowExec's own warning), a single-partition sort of the whole
    key column at 100 TB.  This is the ids_global_contiguous two-pass
    shape instead: range-partition the key, lag WITHIN each partition
    (every group bounded by rows/partition), then close the seams
    with a #partitions-row boundary pass (per-partition min/max, lag
    over that tiny relation).  A gap is either interior to one range
    or spans two adjacent ranges, so the union is exactly the global
    lag's output wherever the boundaries land."""
    o = spread(load(spark, sf_dir, "orders")).select(
        F.col("o_orderkey").alias("k")
    )
    p = o.repartitionByRange(range_parts(spark), "k").withColumn(
        "pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("pid").orderBy("k")
    interior = p.select("pid", "k", F.lag("k").over(w_in).alias("pk")).filter(
        F.col("pk").isNotNull() & (F.col("k") - F.col("pk") > 1)
    )
    seams = (
        p.groupBy("pid")
        .agg(F.min("k").alias("mn"), F.max("k").alias("mx"))
        .select(
            F.col("mn").alias("k"),
            F.lag("mx").over(Window.orderBy("pid")).alias("pk"),
        )
        .filter(F.col("pk").isNotNull() & (F.col("k") - F.col("pk") > 1))
    )
    g = interior.select("k", "pk").unionByName(seams)
    return g.select(
        bigint(F.col("pk") + 1).alias("gap_start"),
        bigint(F.col("k") - 1).alias("gap_end"),
        bigint(F.col("k") - F.col("pk") - 1).alias("gap_len"),
    )


@op(
    "embed_centroid_drift",
    oracle="""
WITH q AS (
  SELECT vec_id % 2 AS half,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS iv
  FROM embeddings
),
cells AS (
  SELECT half, i.i AS dim, q.iv[i.i + 1] AS v
  FROM q CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i
),
m AS (
  SELECT dim,
         sum(CASE WHEN half = 0 THEN v END)
           // sum(CASE WHEN half = 0 THEN 1 END) AS mean_a,
         sum(CASE WHEN half = 1 THEN v END)
           // sum(CASE WHEN half = 1 THEN 1 END) AS mean_b
  FROM cells GROUP BY dim
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(mean_a AS BIGINT) AS mean_a_milli,
       CAST(mean_b AS BIGINT) AS mean_b_milli,
       CAST(abs(mean_a - mean_b) AS BIGINT) AS shift_milli
FROM m
""",
    category=CAT,
)
def embed_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-centroid drift between two corpus halves (vec_id
    parity stands in for before/after an encoder upgrade): per
    dimension, both centroid means in exact quantized milli-units and
    the absolute shift — the drift monitor that catches a silently
    retrained/requantized embedding model before mixed-version vectors
    poison an ANN index.  Same floor(x*1000+0.5) quantization contract
    as the covariance op.

    Scale: posexplode to (half, dim, v) then ONE partial/final agg on
    the 64-dim key with conditional sums — both halves aggregate in a
    single pass, no join, constant-size output."""
    raw = spread(load(spark, sf_dir, "embeddings"), min_fraction=0.25)
    cells = raw.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * 1000 + 0.5).cast("bigint"),
            )
        ).alias("dim", "v"),
    )
    m = cells.groupBy("dim").agg(
        F.sum(F.when(F.col("half") == 0, F.col("v"))).alias("sa"),
        F.sum(F.when(F.col("half") == 0, 1)).alias("na"),
        F.sum(F.when(F.col("half") == 1, F.col("v"))).alias("sb"),
        F.sum(F.when(F.col("half") == 1, 1)).alias("nb"),
    )
    return m.select(
        bigint(F.col("dim")).alias("dim"),
        bigint(F.expr("sa div na")).alias("mean_a_milli"),
        bigint(F.expr("sb div nb")).alias("mean_b_milli"),
        bigint(F.expr("abs(sa div na - sb div nb)")).alias("shift_milli"),
    )


@op(
    "dq_double_fire_events",
    oracle="""
WITH g AS (
  SELECT event_type, user_id, epoch_us(ts) // 1000000 AS sec,
         count(*) AS c
  FROM events
  GROUP BY event_type, user_id, epoch_us(ts) // 1000000
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_groups,
       CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
         AS n_extra_rows
FROM g GROUP BY event_type
""",
    category=CAT,
)
def dq_double_fire_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-fire telemetry audit: events identical on (type, user,
    whole second) — the retry/at-least-once duplicate class the
    PK-uniqueness audit CANNOT see (each dup has a fresh event_id) —
    reported per type as duplicated groups and excess rows.  This
    number is what decides whether a pipeline needs the
    dedup-by-semantic-key pass (stream_dedup_watermark is the
    streaming form).

    Scale: one (type, user, sec)-keyed partial/final agg, then a
    per-type rollup — both mergeable, no join."""
    ev = spread(load(spark, sf_dir, "events"))
    g = ev.groupBy(
        "event_type",
        "user_id",
        F.expr("unix_micros(ts) div 1000000").alias("sec"),
    ).agg(F.count(F.lit(1)).alias("c"))
    return g.groupBy("event_type").agg(
        bigint(F.count(F.lit(1))).alias("n_groups"),
        bigint(F.sum(F.when(F.col("c") > 1, 1).otherwise(0))).alias(
            "n_dup_groups"
        ),
        bigint(
            F.sum(F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0))
        ).alias("n_extra_rows"),
    )


@op(
    "orders_shipping_sla",
    oracle="""
WITH last AS (
  SELECT l_orderkey, max(l_shipdate) AS last_ship
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o_orderpriority AS pri,
         date_diff('day', CAST(o_orderdate AS DATE),
                   CAST(last_ship AS DATE)) AS days_to_ship
  FROM orders JOIN last ON l_orderkey = o_orderkey
)
SELECT pri,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN days_to_ship > 90 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_breached,
       CAST(1000000 * sum(CASE WHEN days_to_ship > 90 THEN 1 ELSE 0 END)
            // count(*) AS BIGINT) AS breach_ppm,
       CAST(max(days_to_ship) AS BIGINT) AS max_days
FROM j GROUP BY pri
""",
    category=CAT,
)
def orders_shipping_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-SLA breach report: per order priority, orders whose
    LAST line shipped more than 90 days after order date (count, exact
    ppm rate, worst case) — the fulfillment-ops readout; 'last line'
    makes it the complete-order SLA, not the first-box SLA.
    Date-boundary day arithmetic, TZ-free on the NTZ columns.

    Scale: orderkey-keyed max over the fact (partial/final), one
    equi-join to the header, then a tiny priority rollup — the same
    header-detail shape as the reconciliation op."""
    li = spread(load(spark, sf_dir, "lineitem"))
    o = load(spark, sf_dir, "orders")
    last = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("last_ship"))
    j = o.join(last, o.o_orderkey == last.l_orderkey).select(
        F.col("o_orderpriority").alias("pri"),
        F.datediff(
            F.to_date("last_ship"), F.to_date("o_orderdate")
        ).alias("days_to_ship"),
    )
    return j.groupBy("pri").agg(
        bigint(F.count(F.lit(1))).alias("n_orders"),
        bigint(
            F.sum(F.when(F.col("days_to_ship") > 90, 1).otherwise(0))
        ).alias("n_breached"),
        bigint(
            F.expr(
                "1000000 * sum(CASE WHEN days_to_ship > 90 THEN 1 ELSE 0 END)"
                " div count(1)"
            )
        ).alias("breach_ppm"),
        bigint(F.max("days_to_ship")).alias("max_days"),
    )


@op(
    "orders_rank_movers",
    oracle="""
WITH rev AS (
  SELECT o_custkey, year(o_orderdate) AS y,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey, year(o_orderdate)
),
rk AS (
  SELECT o_custkey, y,
         rank() OVER (PARTITION BY y ORDER BY cents DESC, o_custkey) AS r
  FROM rev
),
nxt AS (
  SELECT o_custkey, y, r,
         lead(y) OVER w AS ny, lead(r) OVER w AS nr
  FROM rk WINDOW w AS (PARTITION BY o_custkey ORDER BY y)
)
SELECT o_custkey, CAST(ny AS BIGINT) AS year,
       CAST(r AS BIGINT) AS prev_rank,
       CAST(nr AS BIGINT) AS rank,
       CAST(r - nr AS BIGINT) AS places_up
FROM nxt WHERE ny = y + 1 AND abs(r - nr) >= 100
""",
    category=CAT,
)
def orders_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard rank movers: each customer's revenue rank per year
    (deterministic custkey tiebreak), adjacent years paired by a
    lead() over the customer timeline (no self-join — the rank pass
    runs ONCE), keeping moves of >= 100 places — the biggest
    climbers/fallers view every account dashboard ships, and the
    reusable rank-shift shape for term trends or supplier churn.

    Scale: (customer, year) agg over the fact, a year-keyed window
    rank on the aggregate (small), then a customer-keyed lead() —
    all three stages run on customer-count-sized data, never the
    fact, and the rank is computed once (a naive self-join would
    execute the rank window twice)."""
    o = spread(load(spark, sf_dir, "orders"))
    rev = o.groupBy(
        "o_custkey", F.year("o_orderdate").alias("y")
    ).agg(
        F.sum(
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
        ).alias("cents")
    )
    rk = rev.select(
        "o_custkey",
        "y",
        F.rank()
        .over(
            Window.partitionBy("y").orderBy(
                F.col("cents").desc(), F.col("o_custkey")
            )
        )
        .alias("r"),
    )
    wcust = Window.partitionBy("o_custkey").orderBy("y")
    nxt = rk.select(
        "o_custkey",
        "y",
        "r",
        F.lead("y").over(wcust).alias("ny"),
        F.lead("r").over(wcust).alias("nr"),
    )
    return (
        nxt.filter(
            (F.col("ny") == F.col("y") + 1)
            & (F.abs(F.col("r") - F.col("nr")) >= 100)
        )
        .select(
            "o_custkey",
            bigint(F.col("ny")).alias("year"),
            bigint(F.col("r")).alias("prev_rank"),
            bigint(F.col("nr")).alias("rank"),
            bigint(F.col("r") - F.col("nr")).alias("places_up"),
        )
    )


@op(
    "text_prefix_autocomplete",
    oracle=f"""
WITH tok AS (SELECT unnest({_duck_words()}) AS w FROM documents),
freq AS (
  SELECT w, count(*) AS c FROM tok WHERE length(w) >= 3 GROUP BY w
),
rk AS (
  SELECT substr(w, 1, 3) AS prefix, w, c,
         row_number() OVER (PARTITION BY substr(w, 1, 3)
                            ORDER BY c DESC, w) AS rn
  FROM freq
)
SELECT prefix, CAST(rn AS BIGINT) AS rank, w AS completion,
       CAST(c AS BIGINT) AS freq
FROM rk WHERE rn <= 3
""",
    category=CAT,
)
def text_prefix_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete index build: top-3 completions per 3-char prefix
    by corpus frequency (deterministic word tiebreak) — the
    search-box suggestion table, materialized as a query.  The same
    build runs per-language or per-surface by adding a key.

    Scale: one token-keyed partial/final count (the only corpus-sized
    shuffle), then a prefix-keyed top-3 over the VOCABULARY (tiny) —
    rank-limit pushdown truncates each prefix group pre-shuffle."""
    tok = spread(load(spark, sf_dir, "documents"), min_fraction=0.25).select(
        F.explode(_words()).alias("w")
    )
    freq = (
        tok.filter(F.length("w") >= 3)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rk = freq.select(
        F.substring("w", 1, 3).alias("prefix"),
        "w",
        "c",
        F.row_number()
        .over(
            Window.partitionBy(F.substring("w", 1, 3)).orderBy(
                F.col("c").desc(), F.col("w")
            )
        )
        .alias("rn"),
    ).filter(F.col("rn") <= 3)
    return rk.select(
        "prefix",
        bigint(F.col("rn")).alias("rank"),
        F.col("w").alias("completion"),
        bigint(F.col("c")).alias("freq"),
    )


@op(
    "dq_ship_before_order",
    oracle="""
SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
            AS BIGINT) AS n_impossible,
       CAST(1000000 * sum(CASE WHEN l_shipdate < o_orderdate
                               THEN 1 ELSE 0 END) // count(*) AS BIGINT)
         AS impossible_ppm
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1
""",
    category=CAT,
)
def dq_ship_before_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-field temporal-consistency audit: lines shipped BEFORE
    their order existed, per order month — the impossible-timestamp
    class (clock skew, timezone double-conversion, backfill with the
    wrong epoch) that single-table range checks can't see because each
    column alone looks plausible.  The synthetic fixture violates it
    heavily, which is exactly the point: the audit MEASURES the
    violation instead of assuming it away.

    Scale: one fact-to-header equi-join (both keyed on orderkey) and
    a month rollup; the flag is evaluated inside the join projection,
    so only two date columns move."""
    li = spread(load(spark, sf_dir, "lineitem")).select(
        "l_orderkey", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym")
    return j.groupBy(ym).agg(
        bigint(F.count(F.lit(1))).alias("n_lines"),
        bigint(
            F.sum(
                F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
            )
        ).alias("n_impossible"),
        bigint(
            F.expr(
                "1000000 * sum(CASE WHEN l_shipdate < o_orderdate"
                " THEN 1 ELSE 0 END) div count(1)"
            )
        ).alias("impossible_ppm"),
    )


@op(
    "sessions_entry_exit_matrix",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
g AS (
  SELECT user_id, us, event_id, event_type,
         CASE WHEN lag(us) OVER w IS NULL
               OR us - lag(us) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT user_id, us, event_id, event_type,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
),
r AS (
  SELECT user_id, sid, event_type,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY us, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY us DESC, event_id DESC) AS rd
  FROM s
),
ee AS (
  SELECT user_id, sid,
         max(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
         max(CASE WHEN rd = 1 THEN event_type END) AS exit_type
  FROM r GROUP BY user_id, sid
)
SELECT entry_type, exit_type,
       CAST(count(*) AS BIGINT) AS n_sessions
FROM ee GROUP BY entry_type, exit_type
""",
    category=CAT,
)
def sessions_entry_exit_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session entry/exit matrix: first and last event type of every
    gap-sessionized session (the sessionize_batch islands, 30-min
    gap), counted per (entry, exit) pair — the landing-page ->
    exit-page view web analytics runs to find where journeys start and
    die.  Endpoints come from forward/backward row_numbers over the
    (us, event_id) total order — deterministic in both engines (DuckDB
    min_by lacks composite keys, so the rank formulation is the
    portable one).

    Scale: one user-keyed window sort (shared by gap flag + running
    session id), a (user, session) agg with argmin/argmax state, then
    a constant-size (5x5 types) rollup."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev = F.lag("us").over(w)
    new_s = F.when(prev.isNull() | (F.col("us") - prev >= 1800000000), 1).otherwise(0)
    s = ev.withColumn("sid", F.sum(new_s).over(run))
    wf = Window.partitionBy("user_id", "sid").orderBy("us", "event_id")
    wl = Window.partitionBy("user_id", "sid").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    r = s.select(
        "user_id",
        "sid",
        "event_type",
        F.row_number().over(wf).alias("rn"),
        F.row_number().over(wl).alias("rd"),
    )
    ee = r.groupBy("user_id", "sid").agg(
        F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias("entry_type"),
        F.max(F.when(F.col("rd") == 1, F.col("event_type"))).alias("exit_type"),
    )
    return ee.groupBy("entry_type", "exit_type").agg(
        bigint(F.count(F.lit(1))).alias("n_sessions")
    )


@op(
    "text_stem_naive",
    oracle=f"""
WITH t AS (SELECT lang, unnest({_duck_words()}) AS w FROM documents),
s AS (
  SELECT lang, w,
         regexp_replace(w, '(ing|ed|es|s)$', '') AS stem
  FROM t WHERE length(w) >= 4
)
SELECT lang,
       CAST(count(DISTINCT w) AS BIGINT) AS vocab_raw,
       CAST(count(DISTINCT stem) AS BIGINT) AS vocab_stemmed,
       CAST(1000000 * (count(DISTINCT w) - count(DISTINCT stem))
            // count(DISTINCT w) AS BIGINT) AS reduction_ppm
FROM s GROUP BY lang
""",
    category=CAT,
)
def text_stem_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-stripping stemmer (the Porter-step-1 shape) with a vocab
    impact report: per language, distinct surface forms vs distinct
    stems after stripping (ing|ed|es|s)$ from words of length >= 4,
    and the vocabulary reduction in exact ppm — the measurement that
    decides whether stemming is worth applying before index build or
    term-frequency analysis for that language (it collapses English
    far more than Mandarin pinyin, and the report shows it).

    Scale: map-side regexp per token, one lang-keyed agg with two
    exact count-distincts (Spark expands to the two-level
    distinct-expand plan, still mergeable)."""
    t = spread(load(spark, sf_dir, "documents"), min_fraction=0.25).select(
        "lang", F.explode(_words()).alias("w")
    ).filter(F.length("w") >= 4)
    s = t.select(
        "lang", "w", F.regexp_replace("w", r"(ing|ed|es|s)$", "").alias("stem")
    )
    return s.groupBy("lang").agg(
        bigint(F.countDistinct("w")).alias("vocab_raw"),
        bigint(F.countDistinct("stem")).alias("vocab_stemmed"),
        bigint(
            (
                F.lit(1000000)
                * (F.countDistinct("w") - F.countDistinct("stem"))
            )
            / F.countDistinct("w")
        ).alias("_tmp_reduction"),
    ).withColumnRenamed("_tmp_reduction", "reduction_ppm")


@op(
    "text_skipgram_pairs",
    oracle=f"""
WITH d AS (SELECT {_duck_words()} AS ws FROM documents),
p AS (
  SELECT unnest(ws[1:-2]) AS a, unnest(ws[2:-1]) AS b FROM d
  WHERE len(ws) >= 2
  UNION ALL
  SELECT unnest(ws[1:-3]) AS a, unnest(ws[3:-1]) AS b FROM d
  WHERE len(ws) >= 3
)
SELECT least(a, b) AS w1, greatest(a, b) AS w2,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM p WHERE a <> b
GROUP BY 1, 2
HAVING count(*) >= 50
""",
    category=CAT,
)
def text_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence counting (the word2vec / GloVe
    preprocessing pass): unordered word pairs within a +-2 token
    window, self-pairs excluded, kept at count >= 50 — the
    co-occurrence matrix embedding pretraining consumes, built as
    offset-1 and offset-2 pair streams (map-side array slicing, the
    same zip pattern as the bigram op) rather than a positions
    self-join.

    Scale: pair generation is map-side; ONE (w1, w2)-keyed
    partial/final agg is the only shuffle — the positions-self-join
    formulation would shuffle the corpus twice and explode on
    high-frequency tokens."""
    d = spread(load(spark, sf_dir, "documents"), min_fraction=0.25).select(
        _words().alias("ws")
    )

    def offset_pairs(k: int):
        return d.filter(F.size("ws") > k).select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, F.size("ws") - k),
                    F.slice(F.col("ws"), 1 + k, F.size("ws") - k),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p")
        ).select("p.a", "p.b")

    p = offset_pairs(1).unionAll(offset_pairs(2)).filter(F.col("a") != F.col("b"))
    return (
        p.select(
            F.least("a", "b").alias("w1"), F.greatest("a", "b").alias("w2")
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 50)
        .select("w1", "w2", bigint(F.col("n")).alias("n_pairs"))
    )


@op(
    "events_bot_score",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         epoch_us(ts) // 3600000000 % 24 AS hod
  FROM events
),
w AS (
  SELECT user_id, event_type, hod,
         count(*) OVER (PARTITION BY user_id ORDER BY us
                        RANGE BETWEEN 3600000000 PRECEDING
                              AND CURRENT ROW) AS c1h
  FROM e
),
u AS (
  SELECT user_id,
         count(*) AS n_events,
         max(c1h) AS peak_1h,
         1000000 * count(DISTINCT event_type) // 5 AS type_div_ppm,
         1000000 * sum(CASE WHEN hod < 6 THEN 1 ELSE 0 END) // count(*)
           AS night_ppm
  FROM w GROUP BY user_id
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(peak_1h AS BIGINT) AS peak_1h,
       CAST(night_ppm AS BIGINT) AS night_ppm,
       CAST(CASE WHEN peak_1h >= 10 THEN 40 ELSE 0 END
          + CASE WHEN night_ppm >= 400000 THEN 30 ELSE 0 END
          + CASE WHEN type_div_ppm <= 400000 THEN 30 ELSE 0 END
          AS BIGINT) AS bot_score
FROM u
""",
    category=CAT,
)
def events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite bot score: three integer signals — burstiness (peak
    events in any trailing hour, the multi-horizon op's 1h leg),
    night-time share (00:00-06:00 UTC activity ppm), and low
    event-type diversity — combined into a 0-100 rule score per user.
    The rule-ensemble shape (signals -> thresholds -> weighted sum)
    mirrors the Gopher quality gate: attribution stays per-rule, so
    'why flagged' is a column, not a model artifact.

    Scale: one user-keyed window sort for the burst leg, then one
    user agg computing all three signals together — the signals share
    the pass, not one scan each."""
    ev = spread(load(spark, sf_dir, "events"))
    e = ev.select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
        F.expr("unix_micros(ts) div 3600000000 % 24").alias("hod"),
    )
    wburst = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    w = e.select(
        "user_id",
        "event_type",
        "hod",
        F.count(F.lit(1)).over(wburst).alias("c1h"),
    )
    u = w.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("c1h").alias("peak_1h"),
        F.expr("1000000 * count(DISTINCT event_type) div 5").alias(
            "type_div_ppm"
        ),
        F.expr(
            "1000000 * sum(CASE WHEN hod < 6 THEN 1 ELSE 0 END) div count(1)"
        ).alias("night_ppm"),
    )
    score = (
        F.when(F.col("peak_1h") >= 10, 40).otherwise(0)
        + F.when(F.col("night_ppm") >= 400000, 30).otherwise(0)
        + F.when(F.col("type_div_ppm") <= 400000, 30).otherwise(0)
    )
    return u.select(
        "user_id",
        bigint(F.col("n_events")).alias("n_events"),
        bigint(F.col("peak_1h")).alias("peak_1h"),
        bigint(F.col("night_ppm")).alias("night_ppm"),
        bigint(score).alias("bot_score"),
    )


@op(
    "geo_trip_detour_ratio",
    oracle="""
WITH pts AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         ((user_id * 7919 + event_id * 13) % 17000) / 100.0 - 85.0  AS lat,
         ((user_id * 104729 + event_id * 31) % 36000) / 100.0 - 180.0 AS lon
  FROM events
),
legs AS (
  SELECT user_id, lat, lon,
         lag(lat) OVER w AS plat, lag(lon) OVER w AS plon,
         first_value(lat) OVER w AS flat, first_value(lon) OVER w AS flon,
         row_number() OVER (PARTITION BY user_id ORDER BY us DESC,
                            event_id DESC) AS rd
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
path AS (
  SELECT user_id,
         sum(CASE WHEN plat IS NOT NULL THEN
           CAST(round(2 * 6371000 * asin(sqrt(
               pow(sin(radians(lat - plat) / 2), 2)
               + cos(radians(plat)) * cos(radians(lat))
                 * pow(sin(radians(lon - plon) / 2), 2)))) AS BIGINT)
           ELSE 0 END) AS path_m,
         max(CASE WHEN rd = 1 THEN
           CAST(round(2 * 6371000 * asin(sqrt(
               pow(sin(radians(lat - flat) / 2), 2)
               + cos(radians(flat)) * cos(radians(lat))
                 * pow(sin(radians(lon - flon) / 2), 2)))) AS BIGINT)
           END) AS direct_m
  FROM legs GROUP BY user_id
)
SELECT user_id,
       CAST(path_m AS BIGINT) AS path_m,
       CAST(direct_m AS BIGINT) AS direct_m,
       CAST(1000000 * path_m // direct_m AS BIGINT) AS detour_ppm
FROM path WHERE direct_m >= 1000
""",
    category="2.13 geo trip analytics",
)
def geo_trip_detour_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detour ratio per user trace: summed leg distance over the
    straight-line first-to-last distance, in exact ppm (both distances
    integer-metre haversine; the direct leg is evaluated at the LAST
    point via first_value + reverse row_number, so one window pass
    feeds both) — the routing-quality metric that separates wandering
    traces from direct ones, with sub-kilometre direct distances
    excluded as ratio-unstable.

    Scale: one user-keyed window sort feeds lag, first_value, AND the
    last-row marker; then a per-user agg — identical shuffle budget to
    the plain haversine op despite computing two path metrics."""
    from trip_data_pipeline_spark.operators.geo import _HAVERSINE_M, _with_coords

    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    wd = Window.partitionBy("user_id").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    pts = _with_coords(load(spark, sf_dir, "events"))
    legs = pts.select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
        F.first("lat").over(w).alias("flat"),
        F.first("lon").over(w).alias("flon"),
        F.row_number().over(wd).alias("rd"),
    )
    leg_m = F.round(F.expr(_HAVERSINE_M)).cast("bigint")
    direct_expr = _HAVERSINE_M.replace("plat", "flat").replace("plon", "flon")
    direct_m = F.round(F.expr(direct_expr)).cast("bigint")
    path = legs.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("plat").isNotNull(), leg_m).otherwise(0)
        ).alias("path_m"),
        F.max(F.when(F.col("rd") == 1, direct_m)).alias("direct_m"),
    )
    return path.filter(F.col("direct_m") >= 1000).select(
        "user_id",
        bigint(F.col("path_m")).alias("path_m"),
        bigint(F.col("direct_m")).alias("direct_m"),
        bigint(F.expr("1000000 * path_m div direct_m")).alias("detour_ppm"),
    )


@op(
    "events_demand_by_hour",
    oracle="""
WITH e AS (
  SELECT event_type, epoch_us(ts) // 3600000000 % 24 AS hod FROM events
),
c AS (SELECT event_type, hod, count(*) AS n FROM e GROUP BY 1, 2)
SELECT event_type, CAST(hod AS BIGINT) AS hod,
       CAST(n AS BIGINT) AS n_events,
       CAST(1000000 * n // sum(n) OVER (PARTITION BY event_type)
            AS BIGINT) AS share_ppm,
       CAST(rank() OVER (PARTITION BY event_type
                         ORDER BY n DESC, hod) AS BIGINT) AS hour_rank
FROM c
""",
    category=CAT,
)
def events_demand_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day demand profile per event type: count, exact share
    ppm of the type's traffic, and the hour's demand rank (count-desc,
    hour tiebreak) — the canonical taxi-demand curve that drives
    surge/rebalancing schedules and, for pipelines, when to run the
    daily batch (the trough is in the data).

    Scale: one (type, hour) partial/final agg over the events; the
    share/rank windows run on the constant 5x24 profile rows."""
    ev = spread(load(spark, sf_dir, "events"))
    c = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000 % 24").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return c.select(
        "event_type",
        bigint(F.col("hod")).alias("hod"),
        bigint(F.col("n")).alias("n_events"),
        bigint(
            F.expr("1000000 * n").cast("bigint")
        ).alias("_scaled"),
        F.sum("n").over(Window.partitionBy("event_type")).alias("_tot"),
        F.rank()
        .over(
            Window.partitionBy("event_type").orderBy(
                F.col("n").desc(), F.col("hod")
            )
        )
        .alias("hour_rank"),
    ).select(
        "event_type",
        "hod",
        "n_events",
        bigint(F.expr("_scaled div _tot")).alias("share_ppm"),
        bigint(F.col("hour_rank")).alias("hour_rank"),
    )


@op(
    "geo_fleet_utilization",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
),
g AS (
  SELECT user_id, us - lag(us) OVER w AS gap_us
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(CASE WHEN gap_us < 1800000000 THEN gap_us ELSE 0 END)
            AS BIGINT) AS active_us,
       CAST(sum(gap_us) AS BIGINT) AS span_us,
       CAST(1000000 * sum(CASE WHEN gap_us < 1800000000 THEN gap_us
                               ELSE 0 END) // sum(gap_us) AS BIGINT)
         AS util_ppm
FROM g WHERE gap_us IS NOT NULL AND gap_us > 0
GROUP BY user_id
""",
    category="2.13 geo trip analytics",
)
def geo_fleet_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleet-utilization ratio per unit: time covered by sub-30-minute
    inter-ping gaps (in service) over the total observed span, in
    exact ppm — the idle-time decomposition behind 'how many vehicles
    do we actually need', and the mirror of sessionization (the gaps
    BETWEEN sessions are the metric here, not the sessions).

    Scale: one user-keyed window sort for the gap stream, then a
    per-user agg — zero-length gaps (duplicate pings) excluded
    identically in both engines."""
    ev = load(spark, sf_dir, "events")
    e = ev.select("user_id", F.unix_micros("ts").alias("us"), "event_id")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    g = e.select(
        "user_id", (F.col("us") - F.lag("us").over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
    active = F.sum(
        F.when(F.col("gap_us") < 1800000000, F.col("gap_us")).otherwise(0)
    )
    return g.groupBy("user_id").agg(
        bigint(F.count(F.lit(1))).alias("n_gaps"),
        bigint(active).alias("active_us"),
        bigint(F.sum("gap_us")).alias("span_us"),
        # DECIMAL(38,0) widening: per-user microsecond sums reach
        # ~3e14 over a multi-year span; 1e6x that overflows int64
        # (same defect class as agg_pareto_coverage, round-7 audit).
        bigint(
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0))"
                " * sum(CASE WHEN gap_us < 1800000000 THEN gap_us"
                " ELSE 0 END)) div sum(gap_us) AS BIGINT)"
            )
        ).alias("util_ppm"),
    )


@op(
    "geo_heading_octant_turns",
    oracle="""
WITH pts AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(((user_id * 7919 + event_id * 13) % 17000) AS BIGINT)
           AS laty,
         CAST(((user_id * 104729 + event_id * 31) % 36000) AS BIGINT)
           AS lonx
  FROM events
),
legs AS (
  SELECT user_id, us, event_id,
         lonx - lag(lonx) OVER w AS dx,
         laty - lag(laty) OVER w AS dy
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
oct AS (
  SELECT user_id, us, event_id,
         CASE
           WHEN dx >= 0 AND dy >= 0 AND abs(dx) >= abs(dy) THEN 0
           WHEN dx >= 0 AND dy >= 0 THEN 1
           WHEN dx < 0 AND dy >= 0 AND abs(dx) < abs(dy) THEN 2
           WHEN dx < 0 AND dy >= 0 THEN 3
           WHEN dx < 0 AND dy < 0 AND abs(dx) >= abs(dy) THEN 4
           WHEN dx < 0 AND dy < 0 THEN 5
           WHEN dx >= 0 AND dy < 0 AND abs(dx) < abs(dy) THEN 6
           ELSE 7
         END AS o
  FROM legs WHERE dx IS NOT NULL AND NOT (dx = 0 AND dy = 0)
),
turns AS (
  SELECT (o - lag(o) OVER (PARTITION BY user_id ORDER BY us, event_id)
          + 8) % 8 AS turn
  FROM oct
)
SELECT CAST(turn AS BIGINT) AS turn_octants,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(1000000 * count(*) // sum(count(*)) OVER () AS BIGINT)
         AS share_ppm
FROM turns WHERE turn IS NOT NULL
GROUP BY turn
""",
    category="2.13 geo trip analytics",
)
def geo_heading_octant_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn-behavior distribution from GPS traces: each leg's heading
    quantized to an octant by PURE SIGN/MAGNITUDE comparisons on the
    integer centi-degree deltas (no atan2 — the one decision an engine
    can make exactly), then consecutive-leg turn angles (octant
    difference mod 8) histogrammed corpus-wide with exact ppm shares.
    Zero-length legs (duplicate positions) are excluded in both
    engines; turn=0 is straight-on, 4 is a U-turn — a trace corpus
    full of U-turns is GPS noise, not driving.

    Scale: one user-keyed window sort shared by the delta lag and the
    octant lag (same ordering), then a constant 8-row rollup."""
    ev = load(spark, sf_dir, "events")
    from trip_data_pipeline_spark.operators.geo import _LAT_CENTI, _LON_CENTI

    pts = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.expr(f"CAST({_LAT_CENTI} AS BIGINT)").alias("laty"),
        F.expr(f"CAST({_LON_CENTI} AS BIGINT)").alias("lonx"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    legs = pts.select(
        "user_id",
        "us",
        "event_id",
        (F.col("lonx") - F.lag("lonx").over(w)).alias("dx"),
        (F.col("laty") - F.lag("laty").over(w)).alias("dy"),
    ).filter(
        F.col("dx").isNotNull() & ~((F.col("dx") == 0) & (F.col("dy") == 0))
    )
    o = (
        F.when(
            (F.col("dx") >= 0)
            & (F.col("dy") >= 0)
            & (F.abs("dx") >= F.abs("dy")),
            0,
        )
        .when((F.col("dx") >= 0) & (F.col("dy") >= 0), 1)
        .when(
            (F.col("dx") < 0)
            & (F.col("dy") >= 0)
            & (F.abs("dx") < F.abs("dy")),
            2,
        )
        .when((F.col("dx") < 0) & (F.col("dy") >= 0), 3)
        .when(
            (F.col("dx") < 0)
            & (F.col("dy") < 0)
            & (F.abs("dx") >= F.abs("dy")),
            4,
        )
        .when((F.col("dx") < 0) & (F.col("dy") < 0), 5)
        .when(
            (F.col("dx") >= 0)
            & (F.col("dy") < 0)
            & (F.abs("dx") < F.abs("dy")),
            6,
        )
        .otherwise(7)
    )
    oct_df = legs.select("user_id", "us", "event_id", o.alias("o"))
    turns = oct_df.select(
        ((F.col("o") - F.lag("o").over(w) + 8) % 8).alias("turn")
    ).filter(F.col("turn").isNotNull())
    c = turns.groupBy("turn").agg(F.count(F.lit(1)).alias("n"))
    return c.select(
        bigint(F.col("turn")).alias("turn_octants"),
        bigint(F.col("n")).alias("n_turns"),
        F.sum("n").over(Window.partitionBy()).alias("_tot"),
        F.expr("1000000 * n").alias("_scaled"),
    ).select(
        "turn_octants",
        "n_turns",
        bigint(F.expr("_scaled div _tot")).alias("share_ppm"),
    )


@op(
    "events_forecast_naive_eval",
    oracle="""
WITH h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS n
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT event_type, n,
         lag(n, 24) OVER (PARTITION BY event_type ORDER BY hr) AS pred
  FROM h
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(sum(abs(n - pred)) AS BIGINT) AS abs_err_total,
       CAST(sum(abs(n - pred)) // count(*) AS BIGINT) AS mae_floor,
       CAST(1000000 * sum(abs(n - pred)) // sum(n) AS BIGINT)
         AS wape_ppm
FROM p WHERE pred IS NOT NULL
GROUP BY event_type
""",
    category=CAT,
)
def events_forecast_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline eval-as-query: predict each hour's event
    volume with the naive-seasonal rule (same hour yesterday, lag 24
    on the hourly series) and score it in exact integers — total/mean
    absolute error and WAPE in ppm, per event type.  This is the
    baseline every capacity forecast must beat, computed in-engine
    with the same eval discipline as the ANN/MinHash/lang-ID evals:
    the metric itself hash-matches.

    Scale: one (type, hour) partial/final agg over events, a lag-24
    window on the tiny hourly series, a per-type rollup."""
    ev = spread(load(spark, sf_dir, "events"))
    h = ev.groupBy(
        "event_type", F.expr("unix_micros(ts) div 3600000000").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("hr")
    p = h.select(
        "event_type", "n", F.lag("n", 24).over(w).alias("pred")
    ).filter(F.col("pred").isNotNull())
    err = F.abs(F.col("n") - F.col("pred"))
    return p.groupBy("event_type").agg(
        bigint(F.count(F.lit(1))).alias("n_hours"),
        bigint(F.sum(err)).alias("abs_err_total"),
        bigint(F.expr("sum(abs(n - pred)) div count(1)")).alias("mae_floor"),
        bigint(F.expr("1000000 * sum(abs(n - pred)) div sum(n)")).alias(
            "wape_ppm"
        ),
    )


@op(
    "orders_repurchase_curve",
    oracle="""
WITH g AS (
  SELECT date_diff('day',
                   CAST(lag(o_orderdate) OVER w AS DATE),
                   CAST(o_orderdate AS DATE)) AS gap_d
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
t(threshold_d) AS (VALUES (30), (60), (90), (180))
SELECT CAST(t.threshold_d AS BIGINT) AS threshold_d,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(CASE WHEN gap_d <= t.threshold_d THEN 1 ELSE 0 END)
            AS BIGINT) AS n_within,
       CAST(1000000 * sum(CASE WHEN gap_d <= t.threshold_d
                               THEN 1 ELSE 0 END) // count(*) AS BIGINT)
         AS within_ppm
FROM g CROSS JOIN t
WHERE gap_d IS NOT NULL
GROUP BY t.threshold_d
""",
    category=CAT,
)
def orders_repurchase_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repurchase retention curve: the share of inter-order gaps that
    land within 30/60/90/180 days, in exact ppm — the
    time-to-repurchase distribution read as a curve (the survival-view
    companion to the inter-purchase gap stats; product teams quote
    'X% reorder within 30 days' straight off this row set).

    Scale: the same single customer-keyed window as the gap op; the
    4-row threshold relation cross-joins (broadcast) into the gap
    stream, collapsing to 4 rows."""
    o = spread(load(spark, sf_dir, "orders"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.to_date("o_orderdate")
    g = o.select(F.datediff(d, F.lag(d).over(w)).alias("gap_d")).filter(
        F.col("gap_d").isNotNull()
    )
    t = spark.createDataFrame([(30,), (60,), (90,), (180,)], "threshold_d int")
    return (
        g.crossJoin(F.broadcast(t))
        .groupBy("threshold_d")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_gaps"),
            bigint(
                F.sum(
                    F.when(F.col("gap_d") <= F.col("threshold_d"), 1).otherwise(0)
                )
            ).alias("n_within"),
            bigint(
                F.expr(
                    "1000000 * sum(CASE WHEN gap_d <= threshold_d"
                    " THEN 1 ELSE 0 END) div count(1)"
                )
            ).alias("within_ppm"),
        )
        .select(
            bigint(F.col("threshold_d")).alias("threshold_d"),
            "n_gaps",
            "n_within",
            "within_ppm",
        )
    )


@op(
    "text_vocab_growth",
    oracle=f"""
WITH n AS (SELECT max(doc_id) AS max_id FROM documents),
firstseen AS (
  SELECT w, min(doc_id) AS first_doc
  FROM (SELECT doc_id, unnest({_duck_words()}) AS w FROM documents)
  GROUP BY w
),
cut(pct) AS (VALUES (10), (25), (50), (100))
SELECT CAST(cut.pct AS BIGINT) AS corpus_pct,
       CAST(sum(CASE WHEN firstseen.first_doc * 100 <= n.max_id * cut.pct
                     THEN 1 ELSE 0 END) AS BIGINT) AS vocab_size
FROM firstseen CROSS JOIN n CROSS JOIN cut
GROUP BY cut.pct
""",
    category=CAT,
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: distinct words first seen
    within the leading 10/25/50/100% of the corpus (doc_id order,
    cross-multiplied percent test — no float cutoffs) — the curve that
    says whether vocabulary is saturating or still growing, i.e.
    whether more data buys new tokens or just repetition (the
    flattening point feeds the TTR op's tokenizer-sizing call).

    Scale: first-seen is one (word)-keyed min agg over the exploded
    corpus — the only big shuffle; the 1-row max and 4-row cutoffs
    broadcast-cross into the vocabulary."""
    d = spread(load(spark, sf_dir, "documents"), min_fraction=0.25)
    firstseen = d.select(
        "doc_id", F.explode(_words()).alias("w")
    ).groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    n = d.agg(F.max("doc_id").alias("max_id"))
    cut = spark.createDataFrame([(10,), (25,), (50,), (100,)], "pct int")
    return (
        firstseen.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(cut))
        .groupBy("pct")
        .agg(
            bigint(
                F.sum(
                    F.when(
                        F.col("first_doc") * 100 <= F.col("max_id") * F.col("pct"),
                        1,
                    ).otherwise(0)
                )
            ).alias("vocab_size")
        )
        .select(bigint(F.col("pct")).alias("corpus_pct"), "vocab_size")
    )


@op(
    "dq_volume_dod_change",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
  FROM orders GROUP BY 1
),
c AS (
  SELECT day, n, lag(n) OVER (ORDER BY day) AS prev_n
  FROM d
)
SELECT CAST(epoch_us(CAST(day AS TIMESTAMP)) // 86400000000 AS BIGINT)
         AS day_idx,
       CAST(n AS BIGINT) AS n_orders,
       CAST(prev_n AS BIGINT) AS prev_orders,
       CAST(1000000 * abs(n - prev_n) // prev_n AS BIGINT) AS change_ppm,
       CAST(CASE WHEN n >= prev_n THEN 1 ELSE -1 END AS BIGINT) AS sign,
       CAST(CASE WHEN 10 * abs(n - prev_n) >= 5 * prev_n
                 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM c WHERE prev_n IS NOT NULL
""",
    category=CAT,
)
def dq_volume_dod_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day volume anomaly feed: per day, order count vs the
    previous day, absolute change in exact ppm with its sign, and a
    cross-multiplied >= 50% flag (10*|delta| >= 5*prev — no float
    threshold) — the pager alert for a collapsed or doubled ingest,
    complementing the vs-global partition-drift audit with the
    adjacent-day view that catches gradual drifts' step edges.

    Scale: one day-keyed agg over the fact, then a lag over the tiny
    daily series — the alert computation never touches fact rows
    twice."""
    o = spread(load(spark, sf_dir, "orders"))
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    c = d.select(
        "day", "n", F.lag("n").over(Window.orderBy("day")).alias("prev_n")
    ).filter(F.col("prev_n").isNotNull())
    return c.select(
        bigint(
            F.expr("unix_micros(CAST(day AS TIMESTAMP)) div 86400000000")
        ).alias("day_idx"),
        bigint(F.col("n")).alias("n_orders"),
        bigint(F.col("prev_n")).alias("prev_orders"),
        bigint(F.expr("1000000 * abs(n - prev_n) div prev_n")).alias(
            "change_ppm"
        ),
        bigint(F.when(F.col("n") >= F.col("prev_n"), 1).otherwise(-1)).alias(
            "sign"
        ),
        bigint(
            F.when(
                10 * F.abs(F.col("n") - F.col("prev_n")) >= 5 * F.col("prev_n"),
                1,
            ).otherwise(0)
        ).alias("flagged"),
    )


@op(
    "search_inverted_index_build",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_duck_words()}) AS w FROM documents
),
tf AS (SELECT w, doc_id, count(*) AS tf FROM tok GROUP BY w, doc_id)
SELECT w AS term,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS total_tf,
       CAST(max(tf) AS BIGINT) AS max_tf,
       CAST(min(doc_id) AS BIGINT) AS first_posting
FROM tf GROUP BY w
""",
    category=CAT,
)
def search_inverted_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build statistics: per term, document frequency
    (df — postings count), total and max term frequency, and the first
    posting — the lexicon row a search engine writes next to each
    posting list, and the df/tf split the BM25 op consumes.  Building
    it as a query makes index construction just another aggregation.

    Scale: (term, doc) partial/final count then a term-level rollup —
    the posting lists themselves would be collect_list per term
    (size-bounded by df); the stats here are the mergeable part."""
    tok = spread(load(spark, sf_dir, "documents"), min_fraction=0.25).select(
        "doc_id", F.explode(_words()).alias("w")
    )
    tf = tok.groupBy("w", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return tf.groupBy(F.col("w").alias("term")).agg(
        bigint(F.count(F.lit(1))).alias("df"),
        bigint(F.sum("tf")).alias("total_tf"),
        bigint(F.max("tf")).alias("max_tf"),
        bigint(F.min("doc_id")).alias("first_posting"),
    )


@op(
    "text_boolean_retrieval",
    oracle=f"""
WITH d AS (SELECT doc_id, lang, {_duck_words()} AS ws FROM documents)
SELECT doc_id, lang,
       CAST(len(list_filter(ws, x -> x = 'spark')) AS BIGINT) AS tf_spark,
       CAST(len(list_filter(ws, x -> x = 'join')) AS BIGINT) AS tf_join
FROM d
WHERE list_contains(ws, 'spark') AND list_contains(ws, 'join')
  AND NOT list_contains(ws, 'slow')
""",
    category=CAT,
)
def text_boolean_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean retrieval: documents matching (spark AND join AND NOT
    slow), with per-term frequencies — the filter stage of every
    search stack (candidate generation before ranking; the BM25 op is
    the ranking stage).  Conjunction/negation evaluate map-side as
    array predicates; on an indexed store the same query is posting-
    list intersection, and the WHERE clause here is its algebraic
    contract.

    Scale: map-only scan with array predicates — no shuffle at all;
    predicate order puts the rarest term first for short-circuit."""
    d = spread(load(spark, sf_dir, "documents"), min_fraction=0.25)
    ws = _words()
    return d.select(
        "doc_id",
        "lang",
        bigint(F.size(F.filter(ws, lambda x: x == "spark"))).alias("tf_spark"),
        bigint(F.size(F.filter(ws, lambda x: x == "join"))).alias("tf_join"),
        ws.alias("_ws"),
    ).filter(
        F.array_contains("_ws", "spark")
        & F.array_contains("_ws", "join")
        & ~F.array_contains("_ws", "slow")
    ).drop("_ws")


@op(
    "text_bm25_rational_topk",
    oracle=f"""
WITH d AS (SELECT doc_id, {_duck_words()} AS ws FROM documents),
dl AS (SELECT doc_id, len(ws) AS dl FROM d),
consts AS (SELECT count(*) AS n, sum(dl) AS s FROM dl),
tf AS (
  SELECT doc_id, w, count(*) AS tf
  FROM (SELECT doc_id, unnest(ws) AS w FROM d)
  WHERE w IN ('spark', 'join', 'fast')
  GROUP BY doc_id, w
),
df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
scored AS (
  SELECT tf.doc_id,
         sum(
           (1000000 * (consts.n - df.df) // df.df)
           * (1000000 * 22 * consts.s * tf.tf
              // (10 * consts.s * tf.tf + 3 * consts.s
                  + 9 * consts.n * dl.dl))
           // 1000000
         ) AS score_ppm
  FROM tf
  JOIN df ON df.w = tf.w
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN consts
  GROUP BY tf.doc_id
)
SELECT doc_id, CAST(score_ppm AS BIGINT) AS score_ppm,
       CAST(row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS BIGINT)
         AS rank
FROM scored
ORDER BY score_ppm DESC, doc_id
LIMIT 20
""",
    category=CAT,
)
def text_bm25_rational_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-shaped relevance ranking in EXACT rational arithmetic:
    query ('spark', 'join', 'fast'), per-term score = idf-odds
    ((N-df)/df, the exponentiated IDF — orders identically to log-IDF)
    times the k1=1.2 / b=0.75 tf-saturation term, with the rationals
    cleared by multiplying through by 10*S (S = total corpus tokens):
    sat_ppm = 10^6 * 22*S*tf / (10*S*tf + 3*S + 9*N*dl).  Every floor
    happens at a declared ppm boundary, so the top-20 — the RANKING
    stage over boolean retrieval's candidates — replays exactly.

    Scale: tf for the 3 query terms only (the scan filter IS the
    inverted-index probe), df and the (N, S) constants broadcast,
    dl joins on the doc key; top-20 via TakeOrderedAndProject."""
    d = spread(load(spark, sf_dir, "documents"), min_fraction=0.25).select(
        "doc_id", _words().alias("ws")
    )
    dl = d.select("doc_id", F.size("ws").alias("dl"))
    consts = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    )
    tf = (
        d.select("doc_id", F.explode("ws").alias("w"))
        .filter(F.col("w").isin("spark", "join", "fast"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            F.expr(
                "(1000000 * (n - df) div df)"
                " * (1000000 * 22 * s * tf"
                "    div (10 * s * tf + 3 * s + 9 * n * dl))"
                " div 1000000"
            ).alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(F.sum("term_score").alias("score_ppm"))
    )
    ranked = scored.select(
        "doc_id",
        bigint(F.col("score_ppm")).alias("score_ppm"),
        bigint(
            F.row_number().over(
                Window.orderBy(F.col("score_ppm").desc(), F.col("doc_id"))
            )
        ).alias("rank"),
    )
    return ranked.orderBy(F.col("score_ppm").desc(), "doc_id").limit(20)


@op(
    "multimodal_aspect_buckets",
    oracle="""
WITH dims AS (
  SELECT doc_id, 16 AS w, (doc_id % 13) + 1 AS h FROM documents
),
assigned AS (
  SELECT doc_id, w, h,
         CASE WHEN h <= 4 THEN 4 WHEN h <= 8 THEN 8 ELSE 13 END AS canon_h
  FROM dims
)
SELECT CAST(canon_h AS BIGINT) AS canon_h,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(w * h) AS BIGINT) AS native_px,
       CAST(sum(w * canon_h) AS BIGINT) AS padded_px,
       CAST(1000000 * (sum(w * canon_h) - sum(w * h))
            // sum(w * canon_h) AS BIGINT) AS waste_ppm
FROM assigned GROUP BY canon_h
""",
    category=CAT,
)
def multimodal_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing (the SDXL/NovelAI training technique):
    assign each decoded image to the smallest canonical height bucket
    that fits (4 / 8 / 13 here), and report per bucket the image
    count, native vs padded pixel mass, and padding waste in exact
    ppm — the number that tunes the bucket list (too few buckets
    wastes compute on padding; too many starves batches).  The Spark
    side reads REAL dimensions out of the PPM decode chain; the oracle
    replays the deterministic size lattice.

    Scale: map-only mapInPandas decode to (w, h), then a constant-size
    bucket agg."""
    from trip_data_pipeline_spark.operators.multimodal import (
        _decode_ppm,
        _encode_ppm,
    )

    def dims(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = {"doc_id": [], "w": [], "h": []}
        for pdf in batches:
            for d in pdf["doc_id"]:
                img = _decode_ppm(_encode_ppm(int(d)))
                out["doc_id"].append(int(d))
                out["w"].append(img["width"])
                out["h"].append(img["height"])
            yield pd.DataFrame(out)
            out = {k: [] for k in out}

    d = load(spark, sf_dir, "documents").select("doc_id")
    wh = d.mapInPandas(dims, schema="doc_id bigint, w bigint, h bigint")
    assigned = wh.select(
        "w",
        "h",
        F.when(F.col("h") <= 4, 4)
        .when(F.col("h") <= 8, 8)
        .otherwise(13)
        .alias("canon_h"),
    )
    return assigned.groupBy("canon_h").agg(
        bigint(F.count(F.lit(1))).alias("n_images"),
        bigint(F.sum(F.col("w") * F.col("h"))).alias("native_px"),
        bigint(F.sum(F.col("w") * F.col("canon_h"))).alias("padded_px"),
        bigint(
            F.expr(
                "1000000 * (sum(w * canon_h) - sum(w * h))"
                " div sum(w * canon_h)"
            )
        ).alias("waste_ppm"),
    ).select(
        bigint(F.col("canon_h")).alias("canon_h"),
        "n_images",
        "native_px",
        "padded_px",
        "waste_ppm",
    )


@op(
    "orders_cohort_ltv",
    oracle="""
WITH first AS (
  SELECT o_custkey, min(year(o_orderdate)) AS cohort
  FROM orders GROUP BY o_custkey
),
rev AS (
  SELECT f.cohort,
         year(o.o_orderdate) - f.cohort AS yr_offset,
         sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o JOIN first f ON f.o_custkey = o.o_custkey
  GROUP BY f.cohort, year(o.o_orderdate) - f.cohort
)
SELECT CAST(cohort AS BIGINT) AS cohort,
       CAST(yr_offset AS BIGINT) AS yr_offset,
       CAST(cents AS BIGINT) AS rev_cents,
       CAST(sum(cents) OVER (PARTITION BY cohort ORDER BY yr_offset
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_cents
FROM rev
""",
    category=CAT,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: customers grouped by first-order year, revenue
    accumulated by years-since-first — the cumulative-value-per-cohort
    view that answers 'do newer cohorts monetize faster', the revenue
    companion to the count-based retention_cohort op.  Exact cents all
    the way; the cumulative window runs over the tiny (cohort, offset)
    grid.

    Scale: first-order year is one customer agg; the cohort join keys
    on the customer (broadcast-able — it is one int per customer);
    then a (cohort, offset) agg and a constant-size window."""
    o = spread(load(spark, sf_dir, "orders"))
    first = o.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).alias("cohort")
    )
    rev = (
        o.join(first, "o_custkey")
        .groupBy(
            "cohort",
            (F.year("o_orderdate") - F.col("cohort")).alias("yr_offset"),
        )
        .agg(
            F.sum(
                F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
            ).alias("cents")
        )
    )
    cum = Window.partitionBy("cohort").orderBy("yr_offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return rev.select(
        bigint(F.col("cohort")).alias("cohort"),
        bigint(F.col("yr_offset")).alias("yr_offset"),
        bigint(F.col("cents")).alias("rev_cents"),
        bigint(F.sum("cents").over(cum)).alias("cum_cents"),
    )


@op(
    "search_query_expansion",
    oracle=f"""
WITH d AS (SELECT {_duck_words()} AS ws FROM documents),
p AS (
  SELECT unnest(ws[1:-2]) AS a, unnest(ws[2:-1]) AS b FROM d
  WHERE len(ws) >= 2
  UNION ALL
  SELECT unnest(ws[2:-1]) AS a, unnest(ws[1:-2]) AS b FROM d
  WHERE len(ws) >= 2
),
cnt AS (
  SELECT a AS q, b AS cand, count(*) AS c
  FROM p WHERE a IN ('spark', 'join') AND a <> b
  GROUP BY a, b
),
rk AS (
  SELECT q, cand, c,
         row_number() OVER (PARTITION BY q ORDER BY c DESC, cand) AS rn
  FROM cnt
)
SELECT q AS query_term, CAST(rn AS BIGINT) AS rank,
       cand AS expansion, CAST(c AS BIGINT) AS cooc_count
FROM rk WHERE rn <= 5
""",
    category=CAT,
)
def search_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query expansion by adjacency co-occurrence: for each query term
    ('spark', 'join'), the top-5 neighboring terms by count (both
    directions of the bigram stream, deterministic term tiebreak) —
    the synonym/related-term suggestions a search stack mines offline
    and serves next to results; the third member of the search family
    (retrieve -> rank -> expand).

    Scale: the query-term filter lands INSIDE the pair stream before
    the count agg, so only candidate pairs shuffle; the top-5 gets
    rank-limit pushdown on the per-term candidate lists."""
    d = spread(load(spark, sf_dir, "documents"), min_fraction=0.25).select(
        _words().alias("ws")
    )

    def adj(flip: bool):
        a, b = ("ws2", "ws1") if flip else ("ws1", "ws2")
        return d.filter(F.size("ws") >= 2).select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1),
                    F.slice(F.col("ws"), 2, F.size("ws") - 1),
                    lambda x, y: F.struct(x.alias("ws1"), y.alias("ws2")),
                )
            ).alias("p")
        ).select(F.col(f"p.{a}").alias("q"), F.col(f"p.{b}").alias("cand"))

    p = adj(False).unionAll(adj(True)).filter(
        F.col("q").isin("spark", "join") & (F.col("q") != F.col("cand"))
    )
    cnt = p.groupBy("q", "cand").agg(F.count(F.lit(1)).alias("c"))
    rk = cnt.select(
        "q",
        "cand",
        "c",
        F.row_number()
        .over(
            Window.partitionBy("q").orderBy(F.col("c").desc(), F.col("cand"))
        )
        .alias("rn"),
    ).filter(F.col("rn") <= 5)
    return rk.select(
        F.col("q").alias("query_term"),
        bigint(F.col("rn")).alias("rank"),
        F.col("cand").alias("expansion"),
        bigint(F.col("c")).alias("cooc_count"),
    )


@op(
    "dedup_cluster_size_histogram",
    oracle=f"""
WITH g AS (
  SELECT md5({_duck_norm()}) AS h, count(*) AS sz
  FROM documents GROUP BY md5({_duck_norm()})
)
SELECT CAST(length(bin(sz)) - 1 AS BIGINT) AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(sz) AS BIGINT) AS n_docs,
       CAST(sum(sz - 1) AS BIGINT) AS n_removable
FROM g GROUP BY 1
""",
    category=CAT,
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster shape report: exact-hash cluster sizes
    histogrammed into log2 buckets with the removable-row mass
    (size - 1 per cluster) — the planning table every dedup paper
    opens with ('X% of the corpus sits in clusters of 2, Y% in mega-
    clusters'), and the number that predicts the exact-dedup pass's
    yield BEFORE running it.  Bucket arithmetic matches the degree-
    distribution op (len(bin(n))-1).

    Scale: one content-hash agg (map-side md5), then a constant-size
    bucket rollup — strictly cheaper than the dedup itself."""
    d = spread(load(spark, sf_dir, "documents"), min_fraction=0.25)
    g = d.groupBy(F.md5(_norm()).alias("h")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    bucket = (F.length(F.bin(F.col("sz"))) - 1).cast("bigint")
    return g.groupBy(bucket.alias("log2_bucket")).agg(
        bigint(F.count(F.lit(1))).alias("n_clusters"),
        bigint(F.sum("sz")).alias("n_docs"),
        bigint(F.sum(F.col("sz") - 1)).alias("n_removable"),
    )


@op(
    "corpus_df_band_prune",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct({_duck_words()})) AS w FROM documents
),
n AS (SELECT count(*) AS n_docs FROM documents),
df AS (SELECT w, count(*) AS df FROM tok GROUP BY w),
tf AS (
  SELECT w, count(*) AS total_tf
  FROM (SELECT unnest({_duck_words()}) AS w FROM documents) GROUP BY w
),
banded AS (
  SELECT df.w, df.df, tf.total_tf,
         CASE WHEN 2 * df.df > n.n_docs THEN 'stop'
              WHEN df.df = 1 THEN 'hapax'
              WHEN 100 * df.df < n.n_docs THEN 'rare'
              ELSE 'core' END AS band
  FROM df JOIN tf ON tf.w = df.w CROSS JOIN n
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(total_tf) AS BIGINT) AS token_mass,
       CAST(min(df) AS BIGINT) AS min_df,
       CAST(max(df) AS BIGINT) AS max_df
FROM banded GROUP BY band
""",
    category=CAT,
)
def corpus_df_band_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency band report — the min_df/max_df pruning
    decision table: terms banded as stop (df > 50% of docs), core,
    rare (df < 1%), and hapax (df = 1), with term counts and token
    mass per band (all thresholds cross-multiplied, no float ratios).
    Token mass is the column that matters: pruning stopwords kills few
    TERMS but most TOKENS, and this table shows both before anyone
    commits an index or vocab size.

    Scale: df from the per-doc-distinct token stream, tf from the raw
    stream — two word-keyed aggs joined on the (small) vocabulary,
    with the 1-row doc count broadcast-crossed in."""
    d = spread(load(spark, sf_dir, "documents"), min_fraction=0.25)
    ws = _words()
    tok = d.select("doc_id", F.explode(F.array_distinct(ws)).alias("w"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    df = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    tf = d.select(F.explode(ws).alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("total_tf")
    )
    banded = (
        df.join(tf, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "w",
            "df",
            "total_tf",
            F.when(2 * F.col("df") > F.col("n_docs"), "stop")
            .when(F.col("df") == 1, "hapax")
            .when(100 * F.col("df") < F.col("n_docs"), "rare")
            .otherwise("core")
            .alias("band"),
        )
    )
    return banded.groupBy("band").agg(
        bigint(F.count(F.lit(1))).alias("n_terms"),
        bigint(F.sum("total_tf")).alias("token_mass"),
        bigint(F.min("df")).alias("min_df"),
        bigint(F.max("df")).alias("max_df"),
    )


@op(
    "orders_revenue_waterfall",
    oracle="""
SELECT CAST(year(l_shipdate) AS BIGINT) AS year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS gross_cents,
       CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
            AS BIGINT) AS discount_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * l_tax
                           * 100) AS BIGINT)) AS BIGINT) AS tax_cents,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
          - sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
            AS BIGINT) AS net_before_tax_cents
FROM lineitem GROUP BY year(l_shipdate)
""",
    category=CAT,
)
def orders_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue waterfall by ship year: gross, discount given, tax
    collected, and net-before-tax, each summed from PER-LINE exact
    cents (every component rounded at the line before aggregation, so
    the waterfall's steps add up EXACTLY — the property finance
    reconciliation demands and floating-point waterfalls never have).

    Scale: single fact scan, one year-keyed partial/final agg
    computing all four components together — a component-per-query
    formulation would scan the fact four times."""
    li = spread(load(spark, sf_dir, "lineitem"))
    gross = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    disc = F.expr("CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)")
    tax = F.expr(
        "CAST(round(l_extendedprice * (1 - l_discount) * l_tax * 100)"
        " AS BIGINT)"
    )
    return li.groupBy(F.year("l_shipdate").alias("year")).agg(
        bigint(F.sum(gross)).alias("gross_cents"),
        bigint(F.sum(disc)).alias("discount_cents"),
        bigint(F.sum(tax)).alias("tax_cents"),
        bigint(F.sum(gross) - F.sum(disc)).alias("net_before_tax_cents"),
    ).select(
        bigint(F.col("year")).alias("year"),
        "gross_cents",
        "discount_cents",
        "tax_cents",
        "net_before_tax_cents",
    )


@op(
    "events_dau_wau_stickiness",
    oracle="""
WITH e AS (
  SELECT user_id,
         epoch_us(ts) // 86400000000 AS day,
         epoch_us(ts) // 604800000000 AS week
  FROM events
),
dau AS (
  SELECT week, day, count(DISTINCT user_id) AS dau
  FROM e GROUP BY week, day
),
wau AS (
  SELECT week, count(DISTINCT user_id) AS wau FROM e GROUP BY week
)
SELECT CAST(dau.week AS BIGINT) AS week,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(dau.dau) AS BIGINT) AS sum_dau,
       CAST(min(wau.wau) AS BIGINT) AS wau,
       CAST(1000000 * sum(dau.dau) // (count(*) * min(wau.wau))
            AS BIGINT) AS stickiness_ppm
FROM dau JOIN wau ON wau.week = dau.week
GROUP BY dau.week
""",
    category=CAT,
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per week: mean daily actives over weekly
    actives in exact ppm (cross-multiplied — sum_dau over n_days*wau,
    no float mean) — THE product-engagement ratio ('what fraction of
    weekly users show up on a given day'), computed on epoch-derived
    day/week buckets so both engines bucket identically.

    Scale: two exact distinct-count aggs (day-level and week-level —
    each a two-level exact agg, no global distinct), joined on the
    week key; everything after the fact aggs is week-count-sized."""
    ev = spread(load(spark, sf_dir, "events"))
    e = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        F.expr("unix_micros(ts) div 604800000000").alias("week"),
    )
    dau = e.groupBy("week", "day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    wau = e.groupBy("week").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "week")
        .groupBy("week")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("dau").alias("sum_dau"),
            F.min("wau").alias("wau"),
        )
        .select(
            bigint(F.col("week")).alias("week"),
            bigint(F.col("n_days")).alias("n_days"),
            bigint(F.col("sum_dau")).alias("sum_dau"),
            bigint(F.col("wau")).alias("wau"),
            bigint(
                F.expr("1000000 * sum_dau div (n_days * wau)")
            ).alias("stickiness_ppm"),
        )
    )


@op(
    "graph_resource_allocation_index",
    oracle=f"""
WITH {_DEG_EDGES_DUCK},
deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
wedge AS (
  SELECT l.src AS a, r.src AS b, l.dst AS z
  FROM e l JOIN e r ON l.dst = r.dst AND l.src < r.src
),
scored AS (
  SELECT w.a, w.b,
         count(*) AS common,
         sum(1000000 // dz.d) AS ra_ppm
  FROM wedge w JOIN deg dz ON dz.src = w.z
  GROUP BY w.a, w.b
  HAVING count(*) >= 2
)
SELECT s.a, s.b,
       CAST(s.common AS BIGINT) AS n_common,
       CAST(s.ra_ppm AS BIGINT) AS ra_ppm
FROM scored s
WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = s.a AND e.dst = s.b)
""",
    category=CAT,
)
def graph_resource_allocation_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-Allocation link-prediction index (Zhou, Lu & Zhang
    2009): for non-adjacent pairs with >= 2 common neighbors, sum
    1/deg(z) over the SHARED neighbors z, in exact ppm (integer floor
    per neighbor) — unlike Jaccard, RA down-weights hub-mediated
    evidence (a shared neighbor with degree 1000 says little), and
    the rational form makes it hash-exact where Adamic-Adar's log
    cannot be.

    Scale: the same wedge self-join as the Jaccard op, but the degree
    weight joins on the WEDGE CENTER (broadcast, node-sized) BEFORE
    the pair agg — per-pair state stays one integer sum."""
    from trip_data_pipeline_spark.operators.graph import _copart_edges

    e = _copart_edges(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    l = e.select(F.col("src").alias("a"), F.col("dst").alias("z"))
    r = e.select(F.col("src").alias("b"), F.col("dst").alias("z"))
    wedge = l.join(r, "z").filter(F.col("a") < F.col("b"))
    dz = deg.select(F.col("src").alias("z"), F.col("d").alias("dz"))
    scored = (
        wedge.join(F.broadcast(dz), "z")
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(F.expr("1000000 div dz")).alias("ra_ppm"),
        )
        .filter(F.col("common") >= 2)
    )
    cand = scored.join(
        e.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    return cand.select(
        "a",
        "b",
        bigint(F.col("common")).alias("n_common"),
        bigint(F.col("ra_ppm")).alias("ra_ppm"),
    )


@op(
    "timeseries_theil_sen_int",
    oracle="""
WITH d AS (
  SELECT epoch_us(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP))
           // 86400000000 AS x,
         count(*) AS y
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT (b.y - a.y) * 1000000 // (b.x - a.x) AS slope_micro
  FROM d a JOIN d b ON b.x > a.x
),
ranked AS (
  SELECT slope_micro,
         row_number() OVER (ORDER BY slope_micro) AS rn,
         count(*) OVER () AS n
  FROM pairs
)
SELECT CAST(min(n) AS BIGINT) AS n_pairs,
       CAST(min(slope_micro) AS BIGINT) AS theil_sen_micro
FROM ranked WHERE 2 * rn >= n + 1
""",
    category=CAT,
)
def timeseries_theil_sen_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator over the daily order-count
    series: the MEDIAN of all pairwise slopes, each slope floored to
    integer micro-units/day — the trend line outliers cannot drag
    (one crazy ingest day moves an OLS slope but not this), computed
    exactly: median = first slope whose rank reaches the ceiling
    half, deterministic because the rank order is total.

    Scale: the day series is an aggregate (one fact shuffle); the
    O(days^2) pair join runs on aggregate rows — for decade-long
    series the standard move is Theil-Sen on a coarse (weekly) series
    or the repeated-median variant, both the same shape."""
    o = spread(load(spark, sf_dir, "orders"))
    d = o.groupBy(
        F.expr(
            "unix_micros(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP))"
            " div 86400000000"
        ).alias("x")
    ).agg(F.count(F.lit(1)).alias("y"))
    a = d.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = d.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    pairs = a.join(b, F.col("xb") > F.col("xa")).select(
        F.expr("(yb - ya) * 1000000 div (xb - xa)").alias("slope_micro")
    )
    # Round-12 (guide §2.3/§2.4): the old form ranked every pairwise
    # slope with row_number() over a GLOBAL order — a single-partition
    # Sort + two Window nodes over all O(days^2) pair rows.  The rank
    # test only needs each slope VALUE's highest rank, which is the
    # cumulative frequency: rank(last occurrence of s) = cum(s), so
    # `exists rn of s with 2*rn >= n+1` <=> `2*cum(s) >= n+1`, and the
    # median is the smallest such s.  groupBy(slope) aggregates the
    # pair stream distributed (map-side partial agg); only the
    # distinct-slope frequency table — O(value range), not O(pairs) —
    # crosses into the single-partition cumulative window.
    freq = pairs.groupBy("slope_micro").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("slope_micro").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = freq.select(
        "slope_micro",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    return ranked.filter(2 * F.col("cum") >= F.col("n") + 1).agg(
        bigint(F.min("n")).alias("n_pairs"),
        bigint(F.min("slope_micro")).alias("theil_sen_micro"),
    )


@op(
    "orders_abc_classification",
    oracle="""
WITH rev AS (
  SELECT l_partkey AS pk,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS cents
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT pk, cents,
         sum(cents) OVER (ORDER BY cents DESC, pk
                          ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cents) OVER () AS total
  FROM rev
),
classed AS (
  SELECT pk, cents,
         CASE WHEN 10 * cum <= 8 * total THEN 'A'
              WHEN 100 * cum <= 95 * total THEN 'B'
              ELSE 'C' END AS cls
  FROM ranked
)
SELECT cls,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS revenue_cents,
       CAST(1000000 * sum(cents) // sum(sum(cents)) OVER () AS BIGINT)
         AS revenue_share_ppm
FROM classed GROUP BY cls
""",
    category=CAT,
)
def orders_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A
    while cumulative share <= 80%, B to 95%, C beyond (thresholds
    cross-multiplied — 10*cum <= 8*total — so the class boundary is
    exact), reported as part counts and revenue mass per class — the
    named supply-chain op behind cycle-count frequency and stocking
    policy, the CLASSIFICATION over the Pareto op's curve.

    Scale: part-keyed agg over the fact, then one global sort of part
    rows for the cumulative share — same key-only-sort discipline as
    the Pareto and gap ops."""
    li = spread(load(spark, sf_dir, "lineitem"))
    rev = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(
            F.expr(
                "CAST(round(l_extendedprice * (1 - l_discount) * 100)"
                " AS BIGINT)"
            )
        ).alias("cents")
    )
    order = [F.col("cents").desc(), F.col("pk")]
    ranked = rev.select(
        "pk",
        "cents",
        F.sum("cents")
        .over(
            Window.orderBy(*order).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cum"),
        F.sum("cents").over(Window.partitionBy()).alias("total"),
    )
    classed = ranked.select(
        "cents",
        F.when(10 * F.col("cum") <= 8 * F.col("total"), "A")
        .when(100 * F.col("cum") <= 95 * F.col("total"), "B")
        .otherwise("C")
        .alias("cls"),
    )
    per = classed.groupBy("cls").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("cents").alias("revenue_cents"),
    )
    return per.select(
        "cls",
        bigint(F.col("n_parts")).alias("n_parts"),
        bigint(F.col("revenue_cents")).alias("revenue_cents"),
        F.sum("revenue_cents").over(Window.partitionBy()).alias("_tot"),
    ).select(
        "cls",
        "n_parts",
        "revenue_cents",
        # DECIMAL(38,0): class revenue reaches ~1e16 cents at 100 TB;
        # 1e6x overflows int64 (round-7 ppm-overflow audit).
        bigint(
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * revenue_cents)"
                " div _tot AS BIGINT)"
            )
        ).alias("revenue_share_ppm"),
    )


@op(
    "text_kwic_contexts",
    oracle=f"""
WITH d AS (SELECT {_duck_words()} AS ws FROM documents),
hits AS (
  SELECT ws[i - 1] AS left_w, ws[i + 1] AS right_w
  FROM d, unnest(range(2, len(ws))) AS t(i)
  WHERE len(ws) >= 3 AND ws[i] = 'spark'
)
SELECT left_w, right_w,
       CAST(count(*) AS BIGINT) AS n_contexts
FROM hits GROUP BY left_w, right_w
HAVING count(*) >= 3
""",
    category=CAT,
)
def text_kwic_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KWIC (keyword-in-context) concordance for 'spark': the
    (left word, right word) context frames around every interior
    occurrence, counted (>= 3) — the corpus-linguistics view that
    shows HOW a term is used (collocational frames), feeding sense
    disambiguation and phrase-template discovery; boundary
    occurrences (first/last token) have no full frame and are
    excluded identically in both engines.

    Scale: map-side position scan via array HOFs (filter on the
    keyword, slice neighbors) — one (left, right) agg is the only
    shuffle."""
    d = (
        spread(load(spark, sf_dir, "documents"), min_fraction=0.25)
        .select(_words().alias("ws"))
        # guard BEFORE sequence(): Spark's sequence(2, n) DESCENDS when
        # n < 2, which would probe wrong positions on 1-2 word docs
        .filter(F.size("ws") >= 3)
    )
    # interior positions i (1-based, 2..len-1) where ws[i] == keyword
    hits = d.select(
        F.explode(
            F.filter(
                F.transform(
                    F.sequence(F.lit(2), F.size("ws") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("ws"), i - 1).alias("left_w"),
                        F.element_at(F.col("ws"), i).alias("kw"),
                        F.element_at(F.col("ws"), i + 1).alias("right_w"),
                    ),
                ),
                lambda s: s["kw"] == "spark",
            )
        ).alias("h")
    )
    return (
        hits.select("h.left_w", "h.right_w")
        .groupBy("left_w", "right_w")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
        .select("left_w", "right_w", bigint(F.col("n")).alias("n_contexts"))
    )


@op(
    "events_growth_accounting",
    oracle="""
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
  FROM events
),
fw AS (SELECT user_id, min(week) AS first_week FROM uw GROUP BY user_id),
lagw AS (
  SELECT uw.user_id, uw.week, fw.first_week,
         lag(uw.week) OVER (PARTITION BY uw.user_id ORDER BY uw.week)
           AS prev_active_week
  FROM uw JOIN fw ON fw.user_id = uw.user_id
)
SELECT CAST(week AS BIGINT) AS week,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(sum(CASE WHEN week = first_week THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(sum(CASE WHEN prev_active_week = week - 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_retained,
       CAST(sum(CASE WHEN week > first_week
                      AND (prev_active_week IS NULL
                           OR prev_active_week < week - 1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
FROM lagw GROUP BY week
""",
    category=CAT,
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting (the Social-Capital MAU-accounting
    framework, weekly form): every active (user, week) classified as
    NEW (first week ever), RETAINED (also active the previous week),
    or RESURRECTED (active before, but not last week) — the
    decomposition that tells a product team whether growth is
    acquisition or reactivation, and the engagement mirror of the
    dedup survivorship reports.  new + retained + resurrected =
    active, by construction, every week.

    Scale: one distinct (user, week) projection, a user-keyed min
    (first week) and lag (previous active week) sharing the user
    partitioning, then a week rollup — no fact re-scan."""
    ev = spread(load(spark, sf_dir, "events"))
    uw = ev.select(
        "user_id", F.expr("unix_micros(ts) div 604800000000").alias("week")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("week")
    lagw = uw.select(
        "user_id",
        "week",
        F.min("week").over(Window.partitionBy("user_id")).alias("first_week"),
        F.lag("week").over(w).alias("prev_active_week"),
    )
    return lagw.groupBy("week").agg(
        bigint(F.count(F.lit(1))).alias("n_active"),
        bigint(
            F.sum(F.when(F.col("week") == F.col("first_week"), 1).otherwise(0))
        ).alias("n_new"),
        bigint(
            F.sum(
                F.when(
                    F.col("prev_active_week") == F.col("week") - 1, 1
                ).otherwise(0)
            )
        ).alias("n_retained"),
        bigint(
            F.sum(
                F.when(
                    (F.col("week") > F.col("first_week"))
                    & (
                        F.col("prev_active_week").isNull()
                        | (F.col("prev_active_week") < F.col("week") - 1)
                    ),
                    1,
                ).otherwise(0)
            )
        ).alias("n_resurrected"),
    ).select(
        bigint(F.col("week")).alias("week"),
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
    )


@op(
    "join_null_safe_equi",
    oracle="""
WITH c AS (
  SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg, c_acctbal
  FROM customer
),
s AS (
  SELECT nullif(seg, 'BUILDING') AS seg, count(*) AS seg_n
  FROM (SELECT c_mktsegment AS seg FROM customer) GROUP BY 1
)
SELECT c.c_custkey, coalesce(c.seg, '<null>') AS seg_key,
       CAST(s.seg_n AS BIGINT) AS seg_population
FROM c JOIN s ON c.seg IS NOT DISTINCT FROM s.seg
WHERE c.c_custkey < 300
""",
    category="2.3 joins",
)
def join_null_safe_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (IS NOT DISTINCT FROM / <=>): NULL keys
    match NULL keys — the join SQL users reach for when a dimension
    key is legitimately absent on both sides (here the 'BUILDING'
    segment is nulled on both sides to exercise it; a plain equi-join
    would silently DROP every such row).  The §2.3 surface row plain
    equi/outer joins cannot express.

    Scale: Spark plans <=> as a hash join on a null-safe key wrapper
    (still an equi-join — no BNLJ penalty); the probe side is bounded
    per the as-of ops' contract."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr("nullif(c_mktsegment, 'BUILDING')").alias("seg"),
    ).filter(F.col("c_custkey") < 300)
    s = (
        load(spark, sf_dir, "customer")
        .select(F.expr("nullif(c_mktsegment, 'BUILDING')").alias("sseg"))
        .groupBy("sseg")
        .agg(F.count(F.lit(1)).alias("seg_n"))
    )
    return (
        c.join(F.broadcast(s), c.seg.eqNullSafe(s.sseg))
        .select(
            "c_custkey",
            F.coalesce(F.col("seg"), F.lit("<null>")).alias("seg_key"),
            bigint(F.col("seg_n")).alias("seg_population"),
        )
    )


@op(
    "multimodal_image_symmetry_score",
    oracle="""
WITH px AS (
  SELECT doc_id, (doc_id % 13) + 1 AS h, y.y AS y, x.x AS x
  FROM documents
  CROSS JOIN (SELECT unnest(range(0, 13)) AS y) y
  CROSS JOIN (SELECT unnest(range(0, 8)) AS x) x
  WHERE y.y < (doc_id % 13) + 1
),
d AS (
  SELECT doc_id, h,
         abs(
           ((doc_id * 31 + ((y * 16 + x) * 3 + 0)) % 256)
           - ((doc_id * 31 + ((y * 16 + (15 - x)) * 3 + 0)) % 256)
         ) AS dr
  FROM px
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(dr) AS BIGINT) AS abs_diff_sum,
       CAST(1000000 * sum(dr) // (count(*) * 255) AS BIGINT)
         AS asymmetry_ppm
FROM d GROUP BY doc_id
""",
    category=CAT,
)
def multimodal_image_symmetry_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horizontal-mirror symmetry score over the REAL PPM decode: mean
    absolute red-channel difference between each pixel and its
    mirrored column (left half vs flipped right half), normalized to
    exact ppm of full scale — near-zero marks mirrored/symmetric
    content (logos, borders, flipped-augmentation dupes the pHash op
    can miss because aHash is mirror-sensitive).  The oracle replays
    the deterministic pixel lattice; the Spark side flips actual
    decoded pixel arrays with numpy.

    Scale: map-only mapInPandas, constant state per image."""
    import numpy as np

    from trip_data_pipeline_spark.operators.multimodal import (
        _decode_ppm,
        _encode_ppm,
    )

    def sym(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "n_pairs", "abs_diff_sum", "asymmetry_ppm"]
        out = {k: [] for k in cols}
        for pdf in batches:
            for d in pdf["doc_id"]:
                img = _decode_ppm(_encode_ppm(int(d)))
                w, h = img["width"], img["height"]
                px = (np.frombuffer(bytes(img["px"]), dtype=np.uint8)
                      .astype(np.int64).reshape(h, w, 3))
                red = px[:, :, 0]
                half = w // 2
                left = red[:, :half]
                right = np.flip(red[:, w - half:], axis=1)
                diff = np.abs(left - right)
                s = int(diff.sum())
                n = int(diff.size)
                out["doc_id"].append(int(d))
                out["n_pairs"].append(n)
                out["abs_diff_sum"].append(s)
                out["asymmetry_ppm"].append(1_000_000 * s // (n * 255))
            yield pd.DataFrame(out)
            out = {k: [] for k in cols}

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        sym,
        schema=(
            "doc_id bigint, n_pairs bigint, abs_diff_sum bigint,"
            " asymmetry_ppm bigint"
        ),
    )


@op(
    "parts_single_source_risk",
    oracle="""
WITH ps AS (
  SELECT l_partkey AS pk,
         count(DISTINCT l_suppkey) AS n_suppliers,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS cents
  FROM lineitem GROUP BY l_partkey
),
banded AS (
  SELECT CASE WHEN n_suppliers = 1 THEN 1
              WHEN n_suppliers = 2 THEN 2 ELSE 3 END AS supplier_band,
         cents
  FROM ps
)
SELECT CAST(supplier_band AS BIGINT) AS supplier_band,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS revenue_cents,
       CAST(1000000 * sum(cents) // sum(sum(cents)) OVER () AS BIGINT)
         AS revenue_share_ppm
FROM banded GROUP BY supplier_band
""",
    category=CAT,
)
def parts_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source supply risk: parts banded by how many distinct
    suppliers actually shipped them (1 / 2 / 3+), with the revenue
    mass riding each band — the concentration-risk table procurement
    reads before a resilience push ('X% of revenue moves through
    single-sourced parts'), the supply-side mirror of the HHI demand
    view.

    Scale: one part-keyed agg with an exact distinct-supplier count
    (two-level, no global distinct) + the revenue sum in the same
    pass, then a 3-row band rollup."""
    li = spread(load(spark, sf_dir, "lineitem"))
    ps = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.sum(
            F.expr(
                "CAST(round(l_extendedprice * (1 - l_discount) * 100)"
                " AS BIGINT)"
            )
        ).alias("cents"),
    )
    banded = ps.select(
        F.when(F.col("n_suppliers") == 1, 1)
        .when(F.col("n_suppliers") == 2, 2)
        .otherwise(3)
        .alias("supplier_band"),
        "cents",
    )
    per = banded.groupBy("supplier_band").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("cents").alias("revenue_cents"),
    )
    return per.select(
        bigint(F.col("supplier_band")).alias("supplier_band"),
        bigint(F.col("n_parts")).alias("n_parts"),
        bigint(F.col("revenue_cents")).alias("revenue_cents"),
        F.sum("revenue_cents").over(Window.partitionBy()).alias("_tot"),
    ).select(
        "supplier_band",
        "n_parts",
        "revenue_cents",
        # DECIMAL(38,0): band revenue 1e6x overflows int64 at 100 TB
        # (round-7 ppm-overflow audit).
        bigint(
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * revenue_cents)"
                " div _tot AS BIGINT)"
            )
        ).alias("revenue_share_ppm"),
    )


@op(
    "graph_local_clustering",
    oracle=f"""
WITH op_ AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p
        FROM lineitem WHERE l_orderkey % 97 = 0),
e AS (SELECT DISTINCT a.p AS src, b.p AS dst
      FROM op_ a JOIN op_ b ON a.k = b.k AND a.p <> b.p),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
o AS (SELECT e.src AS u, e.dst AS v
      FROM e JOIN deg du ON du.node = e.src JOIN deg dv ON dv.node = e.dst
      WHERE du.d < dv.d OR (du.d = dv.d AND e.src < e.dst)),
tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM o e1
        JOIN o e2 ON e2.u = e1.v
        JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v),
nodes AS (SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri),
ntri AS (SELECT node, count(*) AS n_tri FROM nodes GROUP BY node),
cc AS (
  SELECT deg.node, deg.d,
         1000000 * 2 * coalesce(ntri.n_tri, 0) // (deg.d * (deg.d - 1))
           AS cc_ppm
  FROM deg LEFT JOIN ntri ON ntri.node = deg.node
  WHERE deg.d >= 2
)
SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS log2_degree,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(cc_ppm) // count(*) AS BIGINT) AS mean_cc_ppm,
       CAST(max(cc_ppm) AS BIGINT) AS max_cc_ppm
FROM cc GROUP BY 1
""",
    category=CAT,
)
def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient by degree band: per node,
    cc = 2*triangles / (deg*(deg-1)) in exact ppm, summarized as
    mean/max per log2-degree bucket — the clustering-vs-degree plot
    every graph paper shows (flat = random graph, falling = hierarchy),
    using the SAME degree-ordered triangle orientation as
    graph_triangle_count so each triangle counts once per member node.

    Scale: the oriented wedge join bounds work at O(m^1.5) exactly as
    the triangle op argues; everything after the per-node triangle
    count runs on node-sized rows, and the report is <= 64 bands."""
    from trip_data_pipeline_spark.operators.graph import _copart_edges

    e = _copart_edges(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("src").alias("u_"), F.col("d").alias("du"))
    dv = deg.select(F.col("src").alias("v_"), F.col("d").alias("dv"))
    o = (
        e.join(du, e.src == du.u_)
        .join(dv, e.dst == dv.v_)
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("src") < F.col("dst")))
        )
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    e1 = o.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = o.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = o.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    ntri = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))
    cc = (
        deg.filter(F.col("d") >= 2)
        .join(ntri, deg.src == ntri.node, "left")
        .select(
            "d",
            F.expr(
                "1000000 * 2 * coalesce(n_tri, 0) div (d * (d - 1))"
            ).alias("cc_ppm"),
        )
    )
    bucket = (F.length(F.bin(F.col("d"))) - 1).cast("bigint")
    return cc.groupBy(bucket.alias("log2_degree")).agg(
        bigint(F.count(F.lit(1))).alias("n_nodes"),
        bigint(F.expr("sum(cc_ppm) div count(1)")).alias("mean_cc_ppm"),
        bigint(F.max("cc_ppm")).alias("max_cc_ppm"),
    )


@op(
    "events_winsorize_int",
    oracle="""
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT event_type, cents,
         row_number() OVER (ORDER BY cents, event_type) AS rn,
         count(*) OVER () AS n
  FROM v
),
bounds AS (
  SELECT min(CASE WHEN 20 * rn >= n THEN cents END) AS p05,
         min(CASE WHEN 20 * rn >= 19 * n THEN cents END) AS p95
  FROM ranked
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS sum_raw_cents,
       CAST(sum(greatest(least(cents, p95), p05)) AS BIGINT)
         AS sum_winsorized_cents,
       CAST(sum(CASE WHEN cents < p05 OR cents > p95 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clamped
FROM v CROSS JOIN bounds
GROUP BY event_type
""",
    category=CAT,
)
def events_winsorize_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization with EXACT percentile bounds: global p05/p95 of
    the value column picked by cross-multiplied rank (20*rn >= n —
    percentile_disc semantics, no interpolation), values clamped into
    [p05, p95], reported per event type as raw vs winsorized sums and
    the clamp count — the robust-preprocessing step before any
    mean-based metric, with bounds that replay exactly (a float
    quantile sketch would not).

    Scale (round-7 rework): the naive ``row_number() OVER (ORDER BY
    cents)`` is a partitionless window — ALL rows into one task at
    100 TB.  The bounds only depend on the VALUE HISTOGRAM, so the
    rework partial-aggregates to distinct cents values first (domain-
    bounded: integer cents, not row count) and takes the cumulative
    count over that histogram; a value c has a qualifying row in the
    old row-ranking exactly when its last row's rank cum(c) clears
    the threshold, so min-qualifying-cents is identical (the
    event_type tiebreak only ordered equal-cents rows and never
    changed which VALUE qualified).  The remaining single-partition
    window runs over the histogram — the Benford/digit discipline,
    bounded by the value domain; the 1-row bounds broadcast back and
    the clamp is map-side."""
    # NULL values are not measurements: excluded from histogram,
    # bounds AND counts in BOTH engines (round-8 NULL-payload sweep —
    # the engines disagreed on whether NULL cents shift the rank
    # thresholds)
    ev = spread(load(spark, sf_dir, "events")).filter(F.col("value").isNotNull())
    v = ev.select(
        "event_type", F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents")
    )
    hist = v.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    ranked = hist.select(
        "cents",
        F.sum("c")
        .over(
            Window.orderBy("cents").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    bounds = ranked.agg(
        F.min(F.when(20 * F.col("cum") >= F.col("n"), F.col("cents"))).alias(
            "p05"
        ),
        F.min(
            F.when(20 * F.col("cum") >= 19 * F.col("n"), F.col("cents"))
        ).alias("p95"),
    )
    clamped = F.greatest(F.least(F.col("cents"), F.col("p95")), F.col("p05"))
    return (
        v.crossJoin(F.broadcast(bounds))
        .groupBy("event_type")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_events"),
            bigint(F.sum("cents")).alias("sum_raw_cents"),
            bigint(F.sum(clamped)).alias("sum_winsorized_cents"),
            bigint(
                F.sum(
                    F.when(
                        (F.col("cents") < F.col("p05"))
                        | (F.col("cents") > F.col("p95")),
                        1,
                    ).otherwise(0)
                )
            ).alias("n_clamped"),
        )
    )


@op(
    "dq_duplicate_invoices",
    oracle="""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(o_orderdate AS DATE) AS d
  FROM orders
)
SELECT a.o_orderkey AS order_a, b.o_orderkey AS order_b,
       a.o_custkey AS custkey,
       CAST(a.cents AS BIGINT) AS cents,
       CAST(abs(date_diff('day', a.d, b.d)) AS BIGINT) AS days_apart
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.cents = b.cents
 AND a.o_orderkey < b.o_orderkey
WHERE abs(date_diff('day', a.d, b.d)) <= 7
""",
    category=CAT,
)
def dq_duplicate_invoices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-invoice audit: order pairs from the SAME customer
    with the IDENTICAL total (exact cents) within 7 days — the
    double-billing / double-submission pattern finance reconciliation
    hunts (exact-amount coincidence within a window is the standard
    heuristic).  Pair formation blocks on (customer, cents) — the
    dedup band-join discipline — so only same-key groups ever meet;
    the date window is a residual filter.

    Scale: self-join keyed on (custkey, cents): group sizes are tiny
    (amount collisions within one customer), identical in shape to
    the URL-canonical and truncated-variant dedup blocks."""
    o = spread(load(spark, sf_dir, "orders")).select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.to_date("o_orderdate").alias("d"),
    )
    a = o.select(
        F.col("o_orderkey").alias("order_a"),
        F.col("o_custkey").alias("custkey"),
        "cents",
        F.col("d").alias("da"),
    )
    b = o.select(
        F.col("o_orderkey").alias("order_b"),
        F.col("o_custkey").alias("custkey"),
        "cents",
        F.col("d").alias("db"),
    )
    return (
        a.join(b, ["custkey", "cents"])
        .filter(
            (F.col("order_a") < F.col("order_b"))
            & (F.abs(F.datediff(F.col("da"), F.col("db"))) <= 7)
        )
        .select(
            "order_a",
            "order_b",
            "custkey",
            bigint(F.col("cents")).alias("cents"),
            bigint(F.abs(F.datediff(F.col("db"), F.col("da")))).alias(
                "days_apart"
            ),
        )
    )


@op(
    "sql_offset_fetch",
    oracle="""
SELECT o_orderkey,
       round(o_totalprice, 2) AS total
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15 OFFSET 30
""",
    category="2.8 scalar functions",
)
def sql_offset_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-less pagination surface: ORDER BY ... LIMIT 15 OFFSET 30
    (page 3 of a 15-row listing, deterministic orderkey tiebreak) —
    the SQL pagination every BI tool emits.  The docstring carries the
    scale caveat the op exists to teach: OFFSET n scans and discards n
    rows per page, so deep pagination at 100 TB belongs to keyset
    (WHERE key > last_seen) pagination; this op is the surface, the
    limit_topk family is the plan discipline.

    Scale: Spark compiles limit+offset to a bounded global take
    (CollectLimit with offset), not a full sort materialization."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_pg")
    return spark.sql(
        """
SELECT o_orderkey,
       round(o_totalprice, 2) AS total
FROM orders_pg
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15 OFFSET 30
"""
    )


@op(
    "dedup_phash_banded",
    oracle="""
WITH g AS (
  SELECT doc_id, t.i AS i,
         ((t.i // 8) * ((doc_id % 13) + 1)) // 8 AS gy,
         (t.i % 8) * 2 AS gx
  FROM documents CROSS JOIN (SELECT unnest(range(0, 64)) AS i) t
  WHERE doc_id % 10 = 0
),
cells AS (
  SELECT doc_id, i,
         (doc_id * 31 + (gy * 16 + gx) * 3) % 256
         + (doc_id * 31 + (gy * 16 + gx) * 3 + 1) % 256
         + (doc_id * 31 + (gy * 16 + gx) * 3 + 2) % 256 AS cell
  FROM g
),
b AS (SELECT doc_id, i, cell,
             sum(cell) OVER (PARTITION BY doc_id) AS total FROM cells),
ph AS (SELECT doc_id,
              string_agg(CASE WHEN 64 * cell > total THEN '1' ELSE '0' END,
                         '' ORDER BY i) AS bits
       FROM b GROUP BY doc_id),
bands AS (
  SELECT doc_id, substr(bits, bi.b * 16 + 1, 16) AS band,
         bi.b AS band_idx, bits
  FROM ph CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bi
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.bits AS ba, y.bits AS bb
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band = y.band AND x.doc_id < y.doc_id
),
ham AS (
  SELECT a, b,
         (SELECT count(*) FROM unnest(range(1, 65)) t(i)
          WHERE substr(ba, i, 1) <> substr(bb, i, 1)) AS ham
  FROM cand
)
SELECT a, b, CAST(ham AS BIGINT) AS hamming
FROM ham WHERE ham <= 6
""",
    category=CAT,
)
def dedup_phash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection by pHash banding — the image
    analog of the SimHash text dedup: each 64-bit aHash (same real-
    decode derivation as multimodal_image_phash) splits into 4x16-bit
    bands, candidates collide on any band (16 surviving bits bound the
    false-candidate rate), pairs dedupe across bands, and exact
    Hamming <= 6 confirms.  Runs on the doc_id % 10 == 0 sample with
    the sample predicate applied BEFORE the decode (pushdown a
    post-mapInPandas filter could never get).

    Scale: band equi-join on 16-bit keys — the LSH blocking shape
    shared with MinHash/SimHash; the exact-verify compares 64-char
    strings only for candidates."""
    import numpy as np

    from trip_data_pipeline_spark.operators.multimodal import (
        _decode_ppm,
        _encode_ppm,
    )

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = {"doc_id": [], "bits": []}
        for pdf in batches:
            for d in pdf["doc_id"]:
                f = _decode_ppm(_encode_ppm(int(d)))
                w, h = f["width"], f["height"]
                px = (
                    np.frombuffer(bytes(f["px"]), dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(h, w, 3)
                )
                gy = (np.arange(8)[:, None] * h) // 8
                gx = np.arange(8)[None, :] * 2
                cell = px[gy, gx, :].sum(axis=2).ravel()
                bits = "".join(
                    "1" if 64 * c > cell.sum() else "0" for c in cell
                )
                out["doc_id"].append(int(d))
                out["bits"].append(bits)
            yield pd.DataFrame(out)
            out = {k: [] for k in out}

    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 10 == 0
    )
    ph = docs.mapInPandas(phash, schema="doc_id bigint, bits string")
    bands = ph.select(
        "doc_id",
        "bits",
        F.explode(
            F.array(*[F.lit(i) for i in range(4)])
        ).alias("band_idx"),
    ).select(
        "doc_id",
        "bits",
        "band_idx",
        F.expr("substr(bits, band_idx * 16 + 1, 16)").alias("band"),
    )
    x = bands.select(
        F.col("doc_id").alias("a"),
        F.col("bits").alias("ba"),
        "band_idx",
        "band",
    )
    y = bands.select(
        F.col("doc_id").alias("b"),
        F.col("bits").alias("bb"),
        "band_idx",
        "band",
    )
    cand = (
        x.join(y, ["band_idx", "band"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ba", "bb")
        .distinct()
    )
    ham = F.size(
        F.filter(
            F.zip_with(
                F.split("ba", ""),
                F.split("bb", ""),
                lambda p, q: p != q,
            ),
            lambda v: v,
        )
    )
    return (
        cand.select("a", "b", ham.alias("hamming"))
        .filter(F.col("hamming") <= 6)
        .select("a", "b", bigint(F.col("hamming")).alias("hamming"))
    )


@op(
    "text_term_burstiness",
    oracle=f"""
WITH tf AS (
  SELECT w, doc_id, count(*) AS tf
  FROM (SELECT doc_id, unnest({_duck_words()}) AS w FROM documents)
  GROUP BY w, doc_id
)
SELECT w AS term,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS total_tf,
       CAST(1000000 * sum(tf) // count(*) AS BIGINT) AS mean_tf_ppm,
       CAST(1000000 * max(tf) // sum(tf) AS BIGINT) AS max_doc_share_ppm
FROM tf GROUP BY w
HAVING sum(tf) >= 50
""",
    category=CAT,
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church & Gale 1995's dispersion question in
    exact integers): per term with >= 50 occurrences, document
    frequency, total frequency, mean occurrences-per-containing-doc
    (ppm), and the share of the term's mass sitting in its single
    heaviest doc — a high max-doc share marks bursty/topical terms
    (and template artifacts) that df alone scores like evenly-spread
    function words; the signal behind burst-aware TF weighting.

    Scale: the same (term, doc) partial/final count as the index
    build, then a term rollup — mergeable max/sum/count state."""
    tok = spread(load(spark, sf_dir, "documents"), min_fraction=0.25).select(
        "doc_id", F.explode(_words()).alias("w")
    )
    tf = tok.groupBy("w", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tf.groupBy(F.col("w").alias("term"))
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.max("tf").alias("max_tf"),
        )
        .filter(F.col("total_tf") >= 50)
        .select(
            "term",
            bigint(F.col("df")).alias("df"),
            bigint(F.col("total_tf")).alias("total_tf"),
            # DECIMAL(38,0): a stopword's corpus-wide tf at 100 TB is
            # ~1e13+; 1e6x overflows int64 (round-7 ppm-overflow audit).
            bigint(
                F.expr(
                    "CAST((CAST(1000000 AS DECIMAL(38,0)) * total_tf)"
                    " div df AS BIGINT)"
                )
            ).alias("mean_tf_ppm"),
            bigint(F.expr("1000000 * max_tf div total_tf")).alias(
                "max_doc_share_ppm"
            ),
        )
    )


@op(
    "events_gap_log2_histogram",
    oracle="""
WITH g AS (
  SELECT epoch_us(ts)
         - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id)
           AS gap_us
  FROM events
)
SELECT CAST(length(bin(gap_us // 1000000 + 1)) - 1 AS BIGINT)
         AS log2_gap_s,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us
FROM g WHERE gap_us IS NOT NULL AND gap_us > 0
GROUP BY 1
""",
    category=CAT,
)
def events_gap_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap distribution: per-user consecutive-event gaps
    histogrammed into log2 whole-second buckets — the
    exponentiality check behind every sessionization threshold (the
    30-minute gap the session ops hard-code is defensible exactly when
    this histogram shows a valley there) and the empirical input to
    retry/timeout tuning.

    Scale: one user-keyed window sort for the gap stream, then a
    constant <= 64-bucket rollup."""
    ev = spread(load(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    g = (
        ev.select("user_id", F.unix_micros("ts").alias("us"), "event_id")
        .select((F.col("us") - F.lag("us").over(w)).alias("gap_us"))
        .filter(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
    )
    bucket = (
        F.length(F.bin(F.expr("gap_us div 1000000 + 1"))) - 1
    ).cast("bigint")
    return g.groupBy(bucket.alias("log2_gap_s")).agg(
        bigint(F.count(F.lit(1))).alias("n_gaps"),
        bigint(F.min("gap_us")).alias("min_gap_us"),
        bigint(F.max("gap_us")).alias("max_gap_us"),
    )


@op(
    "text_char_trigram_profile",
    oracle=f"""
WITH n AS (SELECT lang, {_duck_norm()} AS t FROM documents),
tri AS (
  SELECT lang, substr(t, i.i, 3) AS g
  FROM n CROSS JOIN (SELECT unnest(range(1, 4001)) AS i) i
  WHERE i.i + 2 <= length(t) AND substr(t, i.i, 3) NOT LIKE '% %'
),
c AS (SELECT lang, g, count(*) AS c FROM tri GROUP BY lang, g),
rk AS (
  SELECT lang, g, c,
         row_number() OVER (PARTITION BY lang ORDER BY c DESC, g) AS rn
  FROM c
)
SELECT lang, CAST(rn AS BIGINT) AS rank, g AS trigram,
       CAST(c AS BIGINT) AS n_occurrences
FROM rk WHERE rn <= 10
""",
    category=CAT,
)
def text_char_trigram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language signature (the TextCat / n-gram-
    profile method, Cavnar & Trenkle 1994): top-10 space-free char
    trigrams per language by count — the classifier feature table the
    marker-word lang-ID op approximates, built at the CHARACTER level
    where the word ops cannot see (diacritic and orthography patterns
    live here on real corpora).  Position cap 4000 bounds the
    per-doc work identically in both engines.

    Scale: map-side trigram explosion (position HOF), one (lang,
    gram) partial/final count, rank-pushdown top-10 per language."""
    d = spread(load(spark, sf_dir, "documents"), min_fraction=0.25).select(
        "lang", _norm().alias("t")
    )
    tri = d.select(
        "lang",
        F.explode(
            F.filter(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.least(F.length("t") - 2, F.lit(4000)),
                    ),
                    lambda i: F.col("t").substr(i, F.lit(3)),
                ),
                lambda g: ~g.contains(" "),
            )
        ).alias("g"),
    ).filter(F.length("t") >= 3)
    c = tri.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("c"))
    rk = c.select(
        "lang",
        "g",
        "c",
        F.row_number()
        .over(Window.partitionBy("lang").orderBy(F.col("c").desc(), "g"))
        .alias("rn"),
    ).filter(F.col("rn") <= 10)
    return rk.select(
        "lang",
        bigint(F.col("rn")).alias("rank"),
        F.col("g").alias("trigram"),
        bigint(F.col("c")).alias("n_occurrences"),
    )


@op(
    "array_explode_outer",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         list_filter({_duck_words()}, x -> x = 'nonexistent_zz') AS hits
  FROM documents WHERE doc_id < 50
),
x AS (
  SELECT doc_id, unnest(CASE WHEN len(hits) = 0 THEN [NULL] ELSE hits END)
           AS hit
  FROM d
)
SELECT doc_id, coalesce(hit, '<none>') AS hit,
       CAST(CASE WHEN hit IS NULL THEN 0 ELSE 1 END AS BIGINT) AS matched
FROM x
""",
    category="2.8 scalar functions",
)
def array_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer NULL semantics: rows whose array is EMPTY survive
    the explode as a single NULL row — the LEFT-JOIN-like flattening
    every "find matches but keep non-matching parents" query needs
    (plain explode silently drops empty-array parents, the classic
    row-loss bug).  The filter here matches nothing, so every parent
    row exercises the outer path; DuckDB lacks unnest-outer and
    emulates with a CASE-to-[NULL] wrap, which is exactly the
    documented rewrite for engines without it.

    Scale: map-side — explode_outer is a generator, no shuffle."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.filter(_words(), lambda x: x == "nonexistent_zz").alias("hits"),
    )
    x = d.select("doc_id", F.explode_outer("hits").alias("hit"))
    return x.select(
        "doc_id",
        F.coalesce(F.col("hit"), F.lit("<none>")).alias("hit"),
        bigint(F.when(F.col("hit").isNull(), 0).otherwise(1)).alias("matched"),
    )


@op(
    "orders_order_size_distribution",
    oracle="""
WITH sz AS (
  SELECT l_orderkey, count(*) AS n_lines,
         sum(CAST(round(l_quantity) AS BIGINT)) AS qty
  FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(n_lines AS BIGINT) AS n_lines,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(qty) AS BIGINT) AS total_qty,
       CAST(1000000 * count(*) // sum(count(*)) OVER () AS BIGINT)
         AS order_share_ppm
FROM sz GROUP BY n_lines
""",
    category=CAT,
)
def orders_order_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size distribution: orders histogrammed by line count
    (TPC-H caps at 7, so the output is constant-size) with quantity
    mass and exact order-share ppm per size — the order-profile table
    behind picking/packing capacity models and the fan-out estimate
    for any order-keyed join (expected lines per order is read
    straight off it).

    Scale: orderkey agg then a constant-size rollup; the share window
    runs on <= 7 rows."""
    li = spread(load(spark, sf_dir, "lineitem"))
    sz = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.expr("CAST(round(l_quantity) AS BIGINT)")).alias("qty"),
    )
    per = sz.groupBy("n_lines").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("qty").alias("total_qty"),
    )
    return per.select(
        bigint(F.col("n_lines")).alias("n_lines"),
        bigint(F.col("n_orders")).alias("n_orders"),
        bigint(F.col("total_qty")).alias("total_qty"),
        F.sum("n_orders").over(Window.partitionBy()).alias("_tot"),
    ).select(
        "n_lines",
        "n_orders",
        "total_qty",
        bigint(F.expr("1000000 * n_orders div _tot")).alias(
            "order_share_ppm"
        ),
    )


@op(
    "events_metronome_score",
    oracle="""
WITH g AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
           // 1000000 AS gap_s
  FROM events
),
c AS (
  SELECT user_id, gap_s, count(*) AS c
  FROM g WHERE gap_s IS NOT NULL GROUP BY user_id, gap_s
),
tot AS (SELECT user_id, sum(c) AS n_gaps FROM c GROUP BY user_id),
rk AS (
  SELECT user_id, gap_s, c,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY c DESC, gap_s) AS rn
  FROM c
)
SELECT rk.user_id,
       CAST(tot.n_gaps AS BIGINT) AS n_gaps,
       CAST(rk.gap_s AS BIGINT) AS top_gap_s,
       CAST(rk.c AS BIGINT) AS top_gap_count,
       CAST(1000000 * rk.c // tot.n_gaps AS BIGINT) AS top_gap_share_ppm
FROM rk JOIN tot ON tot.user_id = rk.user_id
WHERE rk.rn = 1
""",
    category=CAT,
)
def events_metronome_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metronome (periodicity) score: each user's modal whole-second
    inter-event gap and the share of all their gaps it accounts for,
    in exact ppm — humans are bursty, cron jobs are metronomic, and a
    top-gap share near 10^6 is the cadence signal the burst/night/
    diversity rules in events_bot_score cannot see (a slow, perfectly
    regular scraper never bursts).  Modal gap picks deterministically
    by (count desc, gap asc).

    Scale: one user-keyed window for the gap stream, a (user, gap)
    count, a rank-pushdown top-1 per user, and a user-keyed join of
    two aggregates of the SAME keyed data (co-partitioned)."""
    ev = spread(load(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    g = (
        ev.select("user_id", F.unix_micros("ts").alias("us"), "event_id")
        .select(
            "user_id",
            F.expr(
                "(us - lag(us) over (partition by user_id"
                " order by us, event_id)) div 1000000"
            ).alias("gap_s"),
        )
        .filter(F.col("gap_s").isNotNull())
    )
    c = g.groupBy("user_id", "gap_s").agg(F.count(F.lit(1)).alias("c"))
    tot = c.groupBy("user_id").agg(F.sum("c").alias("n_gaps"))
    rk = c.select(
        "user_id",
        "gap_s",
        "c",
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(F.col("c").desc(), "gap_s")
        )
        .alias("rn"),
    ).filter(F.col("rn") == 1)
    return rk.join(tot, "user_id").select(
        "user_id",
        bigint(F.col("n_gaps")).alias("n_gaps"),
        bigint(F.col("gap_s")).alias("top_gap_s"),
        bigint(F.col("c")).alias("top_gap_count"),
        bigint(F.expr("1000000 * c div n_gaps")).alias("top_gap_share_ppm"),
    )


@op(
    "multimodal_grayscale_detect",
    oracle="""
WITH px AS (
  SELECT doc_id, (doc_id % 13) + 1 AS h, y.y AS y, x.x AS x,
         (doc_id * 31 + ((y.y * 16 + x.x) * 3 + 0)) % 256 AS r,
         (doc_id * 31 + ((y.y * 16 + x.x) * 3 + 1)) % 256 AS g
  FROM documents
  CROSS JOIN (SELECT unnest(range(0, 13)) AS y) y
  CROSS JOIN (SELECT unnest(range(0, 16)) AS x) x
  WHERE y.y < (doc_id % 13) + 1
),
m AS (
  SELECT doc_id,
         count(*) AS n,
         sum(r) AS sr, sum(g) AS sg,
         sum(r * r) AS srr, sum(g * g) AS sgg, sum(r * g) AS srg
  FROM px GROUP BY doc_id
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_px,
       CAST(floor(1000000.0 * (n * srg - sr * sg)
            / sqrt(CAST((n * srr - sr * sr) AS DOUBLE)
                   * (n * sgg - sg * sg))) AS BIGINT) AS rg_corr_ppm,
       CAST(CASE WHEN 1000000.0 * (n * srg - sr * sg)
                      / sqrt(CAST((n * srr - sr * sr) AS DOUBLE)
                             * (n * sgg - sg * sg)) > 990000
                 THEN 1 ELSE 0 END AS BIGINT) AS grayscale_like
FROM m
""",
    category=CAT,
)
def multimodal_grayscale_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grayscale-stored-as-RGB detection over the real PPM decode:
    Pearson correlation between the R and G channel samples (exact
    integer moment sums; the single sqrt runs on integers well below
    2^53, so the double is the same in both engines), floored to ppm —
    corr near 10^6 means the three channels carry one channel's
    information and the image can be stored/processed at a third the
    cost.  The left-half sample of the channel-stats op's discipline,
    extended to a second moment.

    Scale: map-only mapInPandas computing the six moment sums,
    constant state per image."""
    import numpy as np

    from trip_data_pipeline_spark.operators.multimodal import (
        _decode_ppm,
        _encode_ppm,
    )

    def moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "n_px", "rg_corr_ppm", "grayscale_like"]
        out = {k: [] for k in cols}
        for pdf in batches:
            for d in pdf["doc_id"]:
                f = _decode_ppm(_encode_ppm(int(d)))
                w, h = f["width"], f["height"]
                px = (
                    np.frombuffer(bytes(f["px"]), dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(h, w, 3)
                )
                r = px[:, :, 0].ravel()
                g = px[:, :, 1].ravel()
                n = len(r)
                num = n * int((r * g).sum()) - int(r.sum()) * int(g.sum())
                d1 = n * int((r * r).sum()) - int(r.sum()) ** 2
                d2 = n * int((g * g).sum()) - int(g.sum()) ** 2
                import math

                corr = math.floor(1000000.0 * num / math.sqrt(float(d1) * d2))
                out["doc_id"].append(int(d))
                out["n_px"].append(n)
                out["rg_corr_ppm"].append(corr)
                out["grayscale_like"].append(
                    1 if 1000000.0 * num / math.sqrt(float(d1) * d2) > 990000
                    else 0
                )
            yield pd.DataFrame(out)
            out = {k: [] for k in cols}

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        moments,
        schema=(
            "doc_id bigint, n_px bigint, rg_corr_ppm bigint,"
            " grayscale_like bigint"
        ),
    )


@op(
    "join_existence_flags",
    oracle="""
WITH flags AS (
  SELECT o.o_orderkey,
         year(o.o_orderdate) * 100 + month(o.o_orderdate) AS ym,
         max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_return,
         max(CASE WHEN l.l_quantity >= 45 THEN 1 ELSE 0 END) AS has_bulk,
         max(CASE WHEN l.l_discount >= 0.08 THEN 1 ELSE 0 END)
           AS has_deep_discount
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, year(o.o_orderdate) * 100 + month(o.o_orderdate)
)
SELECT CAST(ym AS BIGINT) AS ym,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(has_return) AS BIGINT) AS n_with_return,
       CAST(sum(has_bulk) AS BIGINT) AS n_with_bulk,
       CAST(sum(has_deep_discount) AS BIGINT) AS n_with_deep_discount,
       CAST(sum(has_return * has_bulk * has_deep_discount) AS BIGINT)
         AS n_all_three
FROM flags GROUP BY ym
""",
    category="2.3 joins",
)
def join_existence_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-existence flags in ONE pass: three EXISTS-style questions
    (any returned line? any bulk line? any deeply discounted line?)
    answered as max(CASE) flags over a single fact join + group-by —
    where the naive formulation runs three separate semi-joins
    (3 fact shuffles); the flag form also yields the conjunction
    (orders hitting all three) for free, which semi-joins cannot
    compose without a fourth pass.

    Scale: one orderkey-keyed join + agg (both sides keyed on the
    join key), then a month rollup — 1 fact shuffle instead of 3."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"),
    )
    li = spread(load(spark, sf_dir, "lineitem")).select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_discount"
    )
    flags = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "ym")
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("has_return"),
            F.max(
                F.when(F.col("l_quantity") >= 45, 1).otherwise(0)
            ).alias("has_bulk"),
            F.max(
                F.when(F.col("l_discount") >= 0.08, 1).otherwise(0)
            ).alias("has_deep_discount"),
        )
    )
    return flags.groupBy("ym").agg(
        bigint(F.count(F.lit(1))).alias("n_orders"),
        bigint(F.sum("has_return")).alias("n_with_return"),
        bigint(F.sum("has_bulk")).alias("n_with_bulk"),
        bigint(F.sum("has_deep_discount")).alias("n_with_deep_discount"),
        bigint(
            F.sum(
                F.col("has_return")
                * F.col("has_bulk")
                * F.col("has_deep_discount")
            )
        ).alias("n_all_three"),
    ).select(
        bigint(F.col("ym")).alias("ym"),
        "n_orders",
        "n_with_return",
        "n_with_bulk",
        "n_with_deep_discount",
        "n_all_three",
    )


@op(
    "events_demand_dow_hour",
    oracle="""
WITH e AS (
  SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
         epoch_us(ts) // 3600000000 % 24 AS hod
  FROM events
),
c AS (SELECT dow, hod, count(*) AS n FROM e GROUP BY dow, hod)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
       CAST(n AS BIGINT) AS n_events,
       CAST(1000000 * n // sum(n) OVER () AS BIGINT) AS share_ppm,
       CAST(rank() OVER (ORDER BY n DESC, dow, hod) AS BIGINT)
         AS demand_rank
FROM c
""",
    category=CAT,
)
def events_demand_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day-of-week x hour-of-day demand heatmap (THE canonical
    taxi-demand figure): per (dow, hod) cell, count, exact corpus
    share ppm, and global demand rank — dow derived arithmetically
    from the epoch day (1970-01-01 + 4 ≡ Thursday-anchored, identical
    in both engines; no locale-dependent dayofweek()), which is the
    portability trick the op exists to record.

    Scale: one (dow, hod) partial/final agg; the share/rank windows
    run on the constant 7x24 grid."""
    ev = spread(load(spark, sf_dir, "events"))
    c = ev.select(
        F.expr("(unix_micros(ts) div 86400000000 + 4) % 7").alias("dow"),
        F.expr("unix_micros(ts) div 3600000000 % 24").alias("hod"),
    ).groupBy("dow", "hod").agg(F.count(F.lit(1)).alias("n"))
    return c.select(
        bigint(F.col("dow")).alias("dow"),
        bigint(F.col("hod")).alias("hod"),
        bigint(F.col("n")).alias("n_events"),
        F.sum("n").over(Window.partitionBy()).alias("_tot"),
        F.rank()
        .over(Window.orderBy(F.col("n").desc(), "dow", "hod"))
        .alias("_rk"),
    ).select(
        "dow",
        "hod",
        "n_events",
        bigint(F.expr("1000000 * n_events div _tot")).alias("share_ppm"),
        bigint(F.col("_rk")).alias("demand_rank"),
    )


@op(
    "dq_unit_price_outliers",
    oracle="""
WITH u AS (
  SELECT l_partkey AS pk,
         CAST(round(100 * l_extendedprice / l_quantity) AS BIGINT)
           AS unit_cents
  FROM lineitem WHERE l_quantity > 0
),
ranked AS (
  SELECT pk, unit_cents,
         row_number() OVER (PARTITION BY pk ORDER BY unit_cents) AS rn,
         count(*) OVER (PARTITION BY pk) AS n
  FROM u
),
med AS (
  SELECT pk, min(n) AS n_lines,
         min(CASE WHEN 2 * rn >= n + 1 THEN unit_cents END) AS median_cents
  FROM ranked GROUP BY pk
  HAVING min(n) >= 8
)
SELECT med.pk AS partkey,
       CAST(med.n_lines AS BIGINT) AS n_lines,
       CAST(med.median_cents AS BIGINT) AS median_unit_cents,
       CAST(sum(CASE WHEN u.unit_cents > 2 * med.median_cents
                       OR 2 * u.unit_cents < med.median_cents
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM med JOIN u ON u.pk = med.pk
GROUP BY med.pk, med.n_lines, med.median_cents
HAVING sum(CASE WHEN u.unit_cents > 2 * med.median_cents
                  OR 2 * u.unit_cents < med.median_cents
                THEN 1 ELSE 0 END) > 0
""",
    category=CAT,
)
def dq_unit_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part unit-price anomaly audit: exact per-part MEDIAN unit
    price (rank pick, no sketch) and the count of lines priced more
    than 2x off it (cross-multiplied comparisons) — the pricing-feed
    corruption detector (decimal shifts, currency mixups) that a
    GLOBAL outlier gate misses because every part has its own price
    level; only parts with >= 8 lines and >= 1 outlier report.

    Scale: one part-keyed window sort for the median (key + one
    metric column), then a re-join of the same part-keyed data
    (co-partitioned) for the deviation count."""
    li = spread(load(spark, sf_dir, "lineitem"))
    u = li.filter(F.col("l_quantity") > 0).select(
        F.col("l_partkey").alias("pk"),
        F.expr(
            "CAST(round(100 * l_extendedprice / l_quantity) AS BIGINT)"
        ).alias("unit_cents"),
    )
    wr = Window.partitionBy("pk").orderBy("unit_cents")
    ranked = u.select(
        "pk",
        "unit_cents",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("pk")).alias("n"),
    )
    med = (
        ranked.groupBy("pk")
        .agg(
            F.min("n").alias("n_lines"),
            F.min(
                F.when(2 * F.col("rn") >= F.col("n") + 1, F.col("unit_cents"))
            ).alias("median_cents"),
        )
        .filter(F.col("n_lines") >= 8)
    )
    j = u.join(med, "pk")
    out = j.groupBy("pk", "n_lines", "median_cents").agg(
        F.sum(
            F.when(
                (F.col("unit_cents") > 2 * F.col("median_cents"))
                | (2 * F.col("unit_cents") < F.col("median_cents")),
                1,
            ).otherwise(0)
        ).alias("n_outliers")
    ).filter(F.col("n_outliers") > 0)
    return out.select(
        F.col("pk").alias("partkey"),
        bigint(F.col("n_lines")).alias("n_lines"),
        bigint(F.col("median_cents")).alias("median_unit_cents"),
        bigint(F.col("n_outliers")).alias("n_outliers"),
    )


@op(
    "geo_quadkey_index",
    oracle="""
WITH pts AS (
  SELECT ((user_id * 7919 + event_id * 13) % 17000) AS latc,
         ((user_id * 104729 + event_id * 31) % 36000) AS lonc
  FROM events
),
q AS (
  SELECT (latc * 256) // 17000 AS qy, (lonc * 256) // 36000 AS qx
  FROM pts
),
keyed AS (
  SELECT
    CAST(2 * ((qy // 128) % 2) + ((qx // 128) % 2) AS VARCHAR) ||
    CAST(2 * ((qy // 64) % 2) + ((qx // 64) % 2) AS VARCHAR) ||
    CAST(2 * ((qy // 32) % 2) + ((qx // 32) % 2) AS VARCHAR) ||
    CAST(2 * ((qy // 16) % 2) + ((qx // 16) % 2) AS VARCHAR) AS quadkey4
  FROM q
)
SELECT quadkey4,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(1000000 * count(*) // sum(count(*)) OVER () AS BIGINT)
         AS share_ppm
FROM keyed GROUP BY quadkey4
HAVING count(*) >= 5
""",
    category="2.13 geo trip analytics",
)
def geo_quadkey_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadkey spatial indexing (the Bing-Maps tile scheme): points
    quantized to a 256x256 grid, the y/x bits interleaved into a
    base-4 quadkey, truncated to level 4 — quadkey PREFIX = spatial
    containment, which is what makes it the partition/sort key for
    spatial data at scale (prefix range scan = region query; the
    z-order layout op is the write side of this exact trick).  All
    arithmetic is integer div/mod bit extraction, engine-exact.

    Scale: map-side key construction, one quadkey partial/final agg;
    the level is a constant so output is bounded by 4^level."""
    ev = load(spark, sf_dir, "events")
    from trip_data_pipeline_spark.operators.geo import _LAT_CENTI, _LON_CENTI

    q = ev.select(
        F.expr(f"({_LAT_CENTI}) * 256 div 17000").alias("qy"),
        F.expr(f"({_LON_CENTI}) * 256 div 36000").alias("qx"),
    )
    digit = lambda s: F.expr(
        f"CAST(2 * ((qy div {s}) % 2) + ((qx div {s}) % 2) AS STRING)"
    )
    keyed = q.select(
        F.concat(digit(128), digit(64), digit(32), digit(16)).alias("quadkey4")
    )
    c = keyed.groupBy("quadkey4").agg(F.count(F.lit(1)).alias("n"))
    return (
        c.filter(F.col("n") >= 5)
        .select(
            "quadkey4",
            bigint(F.col("n")).alias("n_points"),
            F.sum("n").over(Window.partitionBy()).alias("_tot"),
        )
        .select(
            "quadkey4",
            "n_points",
            bigint(F.expr("1000000 * n_points div _tot")).alias("share_ppm"),
        )
    )


@op(
    "orders_tier_migration",
    oracle="""
WITH rev AS (
  SELECT o_custkey, year(o_orderdate) AS y,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey, year(o_orderdate)
),
tiered AS (
  SELECT o_custkey, y,
         ntile(3) OVER (PARTITION BY y ORDER BY cents DESC, o_custkey)
           AS tier
  FROM rev
),
paired AS (
  SELECT tier AS tier_from,
         lead(tier) OVER w AS tier_to,
         lead(y) OVER w AS ny, y
  FROM tiered WINDOW w AS (PARTITION BY o_custkey ORDER BY y)
)
SELECT CAST(tier_from AS BIGINT) AS tier_from,
       CAST(tier_to AS BIGINT) AS tier_to,
       CAST(count(*) AS BIGINT) AS n_customers
FROM paired WHERE ny = y + 1
GROUP BY tier_from, tier_to
""",
    category=CAT,
)
def orders_tier_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer tier-migration matrix: revenue terciles per year
    (ntile over a deterministic (cents desc, custkey) order), adjacent
    years paired by lead() over each customer's timeline, counted into
    the 3x3 from->to matrix — the CRM upgrade/downgrade flow view
    (diagonal = stable, below = churn risk), the categorical
    counterpart of the rank-movers op.

    Scale: (customer, year) agg, year-keyed ntile on the aggregate,
    customer-keyed lead — the fact is touched once; output is 9
    cells."""
    o = spread(load(spark, sf_dir, "orders"))
    rev = o.groupBy(
        "o_custkey", F.year("o_orderdate").alias("y")
    ).agg(
        F.sum(
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
        ).alias("cents")
    )
    tiered = rev.select(
        "o_custkey",
        "y",
        F.ntile(3)
        .over(
            Window.partitionBy("y").orderBy(
                F.col("cents").desc(), F.col("o_custkey")
            )
        )
        .alias("tier"),
    )
    wc = Window.partitionBy("o_custkey").orderBy("y")
    paired = tiered.select(
        F.col("tier").alias("tier_from"),
        F.lead("tier").over(wc).alias("tier_to"),
        F.lead("y").over(wc).alias("ny"),
        "y",
    ).filter(F.col("ny") == F.col("y") + 1)
    return paired.groupBy("tier_from", "tier_to").agg(
        bigint(F.count(F.lit(1))).alias("n_customers")
    ).select(
        bigint(F.col("tier_from")).alias("tier_from"),
        bigint(F.col("tier_to")).alias("tier_to"),
        "n_customers",
    )


@op(
    "dedup_wordset_exact",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         md5({_duck_norm()}) AS text_h,
         md5(array_to_string(list_sort(list_distinct({_duck_words()})),
                             ' ')) AS set_h
  FROM documents
)
SELECT set_h AS wordset_hash,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT text_h) AS BIGINT) AS n_distinct_texts,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc
FROM d
GROUP BY set_h
HAVING count(DISTINCT text_h) > 1
""",
    category=CAT,
)
def dedup_wordset_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-order-invariant exact dedup: documents grouped by the hash
    of their SORTED DISTINCT word set, keeping groups that contain
    MORE THAN ONE distinct literal text — these are reordered/
    shuffled template variants that byte-exact dedup calls unique and
    MinHash only catches probabilistically (identical sets collide
    with certainty here).  The canonical survivor is the min doc_id,
    the same survivorship convention as the exact-hash op.

    Scale: map-side set-hash (sort within the doc's own array — no
    corpus sort), one hash-keyed partial/final agg with an exact
    distinct-text count."""
    d = spread(load(spark, sf_dir, "documents"), min_fraction=0.25)
    ws = _words()
    h = d.select(
        "doc_id",
        F.md5(_norm()).alias("text_h"),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(ws)))
        ).alias("set_h"),
    )
    return (
        h.groupBy(F.col("set_h").alias("wordset_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("text_h").alias("n_distinct_texts"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_distinct_texts") > 1)
        .select(
            "wordset_hash",
            bigint(F.col("n_docs")).alias("n_docs"),
            bigint(F.col("n_distinct_texts")).alias("n_distinct_texts"),
            bigint(F.col("canonical_doc")).alias("canonical_doc"),
        )
    )


@op(
    "graph_degree_assortativity",
    oracle=f"""
WITH {_DEG_EDGES_DUCK},
deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
ed AS (
  SELECT du.d AS dx, dv.d AS dy
  FROM e JOIN deg du ON du.src = e.src JOIN deg dv ON dv.src = e.dst
),
m AS (
  SELECT count(*) AS n,
         sum(dx) AS sx, sum(dy) AS sy,
         sum(dx * dx) AS sxx, sum(dy * dy) AS syy, sum(dx * dy) AS sxy
  FROM ed
)
SELECT CAST(n AS BIGINT) AS n_directed_edges,
       CAST(floor(1000000.0 * (n * sxy - sx * sy)
            / sqrt(CAST((n * sxx - sx * sx) AS DOUBLE)
                   * (n * syy - sy * sy))) AS BIGINT)
         AS assortativity_ppm
FROM m
""",
    category=CAT,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002): Pearson correlation of
    endpoint degrees over all directed edges, floored to ppm — the
    one-number answer to 'do hubs connect to hubs' (positive: social
    networks; negative: hub-and-spoke/technological graphs), which
    picks between the skew strategies the degree-distribution op's
    histogram motivates.  Exact integer moment sums; the single sqrt
    runs on integers below 2^53 so the double is engine-identical
    (same argument as the grayscale correlation op).

    Scale: two broadcast degree lookups onto the edge list, one
    global moment agg — the edge list is scanned once."""
    from trip_data_pipeline_spark.operators.graph import _copart_edges

    e = _copart_edges(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("src").alias("u_"), F.col("d").alias("dx"))
    dv = deg.select(F.col("src").alias("v_"), F.col("d").alias("dy"))
    ed = e.join(F.broadcast(du), e.src == du.u_).join(
        F.broadcast(dv), e.dst == dv.v_
    )
    m = ed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.expr("dx * dx")).alias("sxx"),
        F.sum(F.expr("dy * dy")).alias("syy"),
        F.sum(F.expr("dx * dy")).alias("sxy"),
    )
    return m.select(
        bigint(F.col("n")).alias("n_directed_edges"),
        bigint(
            F.expr(
                "floor(1000000.0 * (n * sxy - sx * sy)"
                " / sqrt(CAST((n * sxx - sx * sx) AS DOUBLE)"
                "        * (n * syy - sy * sy)))"
            )
        ).alias("assortativity_ppm"),
    )


@op(
    "sql_named_window_clause",
    oracle="""
SELECT o_custkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
            AS BIGINT) AS running_cents
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    category="2.8 scalar functions",
)
def sql_named_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL WINDOW clause: one NAMED window definition shared by
    several window functions (row_number + a running sum; the
    (orderdate, orderkey) ordering is total, so the default RANGE
    frame equals ROWS and both engines agree row-exactly) — the
    define-once-use-many surface that keeps analyst SQL maintainable,
    and the declaration that lets the planner prove both functions
    share ONE sort.  Identical syntax in Spark and DuckDB.

    Scale: both functions evaluate in a single Window operator over
    one user-keyed sort — the named clause is the textual form of the
    shared-window discipline the DataFrame ops in this repo apply via
    reused Window specs."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_nw")
    return spark.sql(
        """
SELECT o_custkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
            AS BIGINT) AS running_cents
FROM orders_nw
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""
    )


@op(
    "sql_cluster_by_surface",
    oracle="""
SELECT event_type,
       epoch_us(ts) // 3600000000 % 24 AS hod,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY event_type, epoch_us(ts) // 3600000000 % 24
""",
    category="2.8 scalar functions",
)
def sql_cluster_by_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark-specific DISTRIBUTE BY / CLUSTER BY SQL surface:
    declaratively requests the output be hash-partitioned (and
    within-partition sorted) on a key — the SQL-text way to
    pre-partition ahead of a downstream co-partitioned consumer
    (bucketed writes, repeated self-joins), where DataFrame code
    would call repartition+sortWithinPartitions.  The RESULT SET is
    identical to the plain GROUP BY (the oracle), which is the point:
    CLUSTER BY changes layout, never semantics.

    Scale: adds exactly one declared Exchange (the one the consumer
    would otherwise trigger implicitly); no extra data movement."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events_cb")
    return spark.sql(
        """
SELECT event_type,
       unix_micros(ts) div 3600000000 % 24 AS hod,
       CAST(count(*) AS BIGINT) AS n
FROM events_cb
GROUP BY event_type, unix_micros(ts) div 3600000000 % 24
CLUSTER BY event_type
"""
    )
