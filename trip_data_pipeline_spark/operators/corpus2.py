"""Round-2 training-data pipeline tranche (SURVEY.md §2.15).

Corpus-curation operators a large-scale LLM data pipeline needs beyond
the round-1 dedup/similarity/text families: cross-corpus boilerplate
removal, eval-set contamination detection, intra-document repetition
metrics (Gopher-style quality signals), language-balanced resampling,
shard-local sequence packing, source-reputation gating, and a
random-hyperplane LSH ANN variant.

All operate on the ``documents`` / ``embeddings`` fixtures and carry
DuckDB oracles (hash check).  Scale designs are noted per op; the
common theme is: corpus-wide statistics either reduce to a genuinely
small set (per-source stats) that broadcasts, or — when the set grows
with the corpus (boilerplate grams, eval grams) — the statistic is
computed IN PLACE on the keyed gram stream via a window over the gram
partition, so no corpus-sized structure is ever broadcast or
collected (round-3 ADVICE fix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import bigint, nz, r2, r4, spread
from trip_data_pipeline_spark.registry import op

CAT = "2.15 corpus curation (round-2 additions)"


def words_of(col: str = "text") -> Column:
    """Space-separated word array; fixtures are single-space separated
    (DuckDB mirror: ``string_split(text, ' ')``)."""
    return F.split(F.col(col), " ")


def word_ngrams(w: Column, n: int) -> Column:
    """All n-word grams joined by spaces, with multiplicity, in
    document order.  Guarded for docs shorter than n (Spark's
    ``sequence(1, k)`` DESCENDS for k < 1 — an unguarded short doc
    would silently produce garbage grams).

    DuckDB mirror: ``list_transform(range(1, len(w) - {n-2}),
    i -> array_to_string(w[i:i+{n-1}], ' '))`` (range is
    exclusive-upper; slice is inclusive 1-based on both engines).

    Round-12 shape (guide §1.1/§4): built as a ZIP of n shifted
    slices, not ``transform(sequence(...), i -> slice(w, i, n))``.
    Higher-order lambdas are interpreted, and an interpreted lambda
    body re-evaluates non-lambda subexpressions PER ELEMENT — when the
    optimizer inlines `w = split(text)` into the lambda (projection
    collapse, and the inferred `size(grams) > 0` pre-explode filter
    pushed to the scan does it unconditionally), each gram re-split
    the whole document: O(words²) per doc, ~5x the runtime of the
    consuming operators.  In the zip form every slice is evaluated
    once per ROW under the same inlining, so the worst case stays
    O(n·words).  Element j is w[j..j+n-1] joined by single spaces in
    both forms (split() yields no NULL elements, so concat_ws ==
    array_join here), and the short-doc guard is unchanged."""
    cnt = F.size(w) - F.lit(n - 1)
    grams = F.slice(w, 1, cnt)
    for i in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(w, i + 1, cnt),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(F.size(w) >= n, grams).otherwise(
        F.expr("CAST(array() AS ARRAY<STRING>)")
    )


def _duck_ngrams(n: int, w: str = "w") -> str:
    return (
        f"list_transform(range(1, len({w}) - {n - 2}), "
        f"i -> array_to_string({w}[i:i+{n - 1}], ' '))"
    )


@op(
    "corpus_boilerplate_ngram_prune",
    oracle=f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id, unnest({_duck_ngrams(5)}) AS gram FROM d),
boiler AS (
  SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram)
  WHERE df >= 4
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(b.gram) AS BIGINT) AS n_boiler,
       round(1.0 - count(b.gram) / count(*), 4) AS keep_ratio
FROM g LEFT JOIN boiler b USING (gram)
GROUP BY g.doc_id
""",
    category=CAT,
)
def corpus_boilerplate_ngram_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-corpus boilerplate removal, reported as per-doc
    prune stats: a 5-gram occurring in >=4 distinct documents is
    boilerplate; each document reports how much of it survives.

    Scale (round 3, per ADVICE): the boilerplate-gram set grows with
    corpus size (more sources -> more repeated templates), so the old
    forced-broadcast mark-join was an OOM risk at large SF.  Rewritten
    join-free: collapse to (doc_id, gram, n) once, then the document
    frequency is a count() window over the gram partition — the gram
    stream is shuffled by gram exactly once, the flag rides along, and
    the final per-doc stats shuffle carries only (doc_id, n, flag).
    No corpus-sized structure ever lands on one node."""
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", word_ngrams(words_of(), 5).alias("grams")
    )
    gc = (
        d.select("doc_id", F.explode("grams").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # one row per (doc, gram) -> count over the gram partition IS the
    # distinct-document frequency
    df_w = F.count(F.lit(1)).over(Window.partitionBy("gram"))
    marked = gc.withColumn("boiler_n", F.when(df_w >= 4, F.col("n")).otherwise(F.lit(0)))
    return marked.groupBy("doc_id").agg(
        bigint(F.sum("n")).alias("n_grams"),
        bigint(F.sum("boiler_n")).alias("n_boiler"),
        r4(1.0 - F.sum("boiler_n") / F.sum("n")).alias("keep_ratio"),
    )


@op(
    "eval_contamination_ngram",
    oracle=f"""
WITH d AS (SELECT doc_id, md5(text) AS h, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id, h, unnest({_duck_ngrams(6)}) AS gram FROM d),
eval_grams AS (SELECT DISTINCT gram FROM g WHERE substr(h, 1, 1) IN ('0','1','2','3')),
train AS (SELECT doc_id, gram FROM g WHERE substr(h, 1, 1) NOT IN ('0','1','2','3'))
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(e.gram) AS BIGINT) AS n_contam,
       round(count(e.gram) / count(*), 4) AS contam_ratio
FROM train t LEFT JOIN eval_grams e USING (gram)
GROUP BY t.doc_id
""",
    category=CAT,
)
def eval_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check: held-out docs (content-addressed
    md5 split, ~25%) contribute a distinct 6-gram set; every training
    doc reports how many of its 6-gram instances also appear in eval.

    Scale (round 3, per ADVICE): the eval split is a content-addressed
    ~25% of the WHOLE corpus, so its distinct-gram set grows linearly
    with corpus size — the old forced broadcast would OOM the driver at
    large SF.  Rewritten join-free: one shuffle of the gram stream
    keyed by gram, where a max(is_eval) window computes "this gram
    appears in some eval doc" in place; the per-doc aggregation then
    shuffles only (doc_id, hit).  Nothing is ever collected to one
    node, and the gram table needs no materialization (single
    consumer)."""
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id",
        F.md5("text").alias("h"),
        word_ngrams(words_of(), 6).alias("grams"),
    )
    g = d.select(
        "doc_id",
        F.substring("h", 1, 1).isin("0", "1", "2", "3").alias("is_eval"),
        F.explode("grams").alias("gram"),
    )
    hit = F.max(F.col("is_eval").cast("int")).over(Window.partitionBy("gram"))
    marked = g.withColumn("hit", hit).filter(~F.col("is_eval"))
    return marked.groupBy("doc_id").agg(
        bigint(F.count(F.lit(1))).alias("n_grams"),
        bigint(F.sum("hit")).alias("n_contam"),
        r4(F.sum("hit") / F.count(F.lit(1))).alias("contam_ratio"),
    )


@op(
    "text_repetition_metrics",
    oracle="""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id, w,
             list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' ')) AS bg
      FROM d)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_words,
       CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
       round(1.0 - len(list_distinct(w)) / len(w), 4) AS word_rep_ratio,
       CASE WHEN len(bg) = 0 THEN NULL
            ELSE round(1.0 - len(list_distinct(bg)) / len(bg), 4)
       END AS bigram_rep_ratio,
       CAST(list_max(list_transform(list_distinct(w),
              x -> len(list_filter(w, y -> y = x)))) AS BIGINT) AS max_word_freq
FROM g
""",
    category=CAT,
)
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition signals: duplicate-word
    and duplicate-bigram ratios plus the hottest word's frequency —
    standard quality-filter features for pretraining corpora.

    Scale: narrow map work (no keyed shuffle, plan-asserted) behind a
    round-robin spread — see common.spread.  max_word_freq is a single
    O(n) run-length fold over the SORTED word array (the max
    multiplicity is the longest equal-run), not the naive
    O(distinct x words) nested filter, which measured ~50x slower."""
    w = words_of()
    bg = word_ngrams(words_of(), 2)
    dw = F.array_distinct(w)
    sw = F.sort_array(w)
    zero = F.lit(0).cast("bigint")
    run_state = F.struct(
        F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("bigint")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    max_freq = F.aggregate(sw, run_state, step, lambda acc: acc["best"])
    return spread(load(spark, sf_dir, "documents")).select(
        "doc_id",
        bigint(F.size(w)).alias("n_words"),
        bigint(F.size(dw)).alias("n_distinct"),
        r4(1.0 - F.size(dw) / F.size(w)).alias("word_rep_ratio"),
        # <2 words -> no bigrams: ratio undefined, NULL in both engines
        # (round-8 degenerate-shape gate; ANSI raised 0/0 here)
        F.when(F.size(bg) == 0, F.lit(None).cast("double"))
        .otherwise(r4(1.0 - F.size(F.array_distinct(bg)) / F.size(bg)))
        .alias("bigram_rep_ratio"),
        bigint(max_freq).alias("max_word_freq"),
    )


@op(
    "corpus_lang_balance_resample",
    oracle="""
WITH r AS (
  SELECT doc_id, lang,
         CAST(row_number() OVER (PARTITION BY lang
                ORDER BY md5(text) NULLS LAST, doc_id) AS BIGINT) AS rk
  FROM documents
)
SELECT doc_id, lang, rk FROM r WHERE rk <= 60
""",
    category=CAT,
)
def corpus_lang_balance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced downsampling: keep at most 60 docs per
    language, chosen content-addressed (md5 rank) so the sample is
    deterministic and partitioning-independent — the standard rebalance
    step before mixing a multilingual training corpus.

    Scale: one shuffle keyed by lang; per-key top-k compiles to
    WindowGroupLimit (rank prune before the full sort).  A skewed
    dominant language is bounded by the same quota it is being
    resampled to."""
    # NULLS LAST explicit: md5(NULL text) is NULL and the engines
    # disagree on default null placement (round-8 NULL-payload sweep)
    w = Window.partitionBy("lang").orderBy(
        F.md5("text").asc_nulls_last(), "doc_id"
    )
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", bigint(F.row_number().over(w)).alias("rk"))
        .filter(F.col("rk") <= 60)
    )


@op(
    "pack_sequences_greedy",
    oracle="""
WITH d AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
  FROM documents
),
c AS (
  SELECT shard, tokens,
         sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM d
)
SELECT shard, CAST((cum - tokens) // 2048 AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tokens) AS BIGINT) AS total_tokens,
       round(sum(tokens) / 2048.0, 4) AS fill_ratio
FROM c
GROUP BY shard, (cum - tokens) // 2048
""",
    category=CAT,
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chunk): documents are concatenated
    in deterministic order and cut into 2048-token bins; reports bin
    occupancy per shard.  A doc starts in the bin its running prefix
    ends in — exactly the greedy packing a tokenizer pipeline applies.

    Scale: packing is SHARD-LOCAL by construction (doc_id % 8) — the
    running sum never needs a global single-partition window, which is
    the classic scaling trap for packing; each shard's window runs
    independently after one hash shuffle."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        bigint(F.size(words_of())).alias("tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("cum", F.sum("tokens").over(w))
    return (
        c.withColumn("bin", bigint(F.expr("(cum - tokens) div 2048")))
        .groupBy("shard", "bin")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_docs"),
            bigint(F.sum("tokens")).alias("total_tokens"),
            r4(F.sum("tokens") / 2048.0).alias("fill_ratio"),
        )
    )


@op(
    "corpus_source_reputation_gate",
    oracle="""
WITH per_doc AS (
  SELECT source, len(string_split(text, ' ')) AS nw,
         len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')) AS uniq
  FROM documents
),
stats AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         round(avg(nw), 2) AS avg_words, round(avg(uniq), 4) AS avg_uniq
  FROM per_doc GROUP BY source
)
SELECT source, n_docs, avg_words, avg_uniq,
       CASE WHEN source IN ('src7', 'src13') THEN 'blocklist'
            WHEN avg_words < 40 THEN 'low_quality'
            ELSE 'ok' END AS verdict
FROM stats
""",
    category=CAT,
)
def corpus_source_reputation_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/source-level gating (RefinedWeb-style): per-source volume
    and quality aggregates, each source ruled blocklist / low-quality /
    ok.  The verdict table is what a curation pipeline joins back onto
    the corpus as its source filter.

    Scale: one groupBy(source) over map-side-computed per-doc features;
    the verdict table is dimension-sized and broadcastable."""
    w = words_of()
    per_doc = load(spark, sf_dir, "documents").select(
        "source",
        F.size(w).alias("nw"),
        (F.size(F.array_distinct(w)) / F.size(w)).alias("uniq"),
    )
    stats = per_doc.groupBy("source").agg(
        bigint(F.count(F.lit(1))).alias("n_docs"),
        r2(F.avg("nw")).alias("avg_words"),
        r4(F.avg("uniq")).alias("avg_uniq"),
    )
    return stats.select(
        "source",
        "n_docs",
        "avg_words",
        "avg_uniq",
        F.when(F.col("source").isin("src7", "src13"), "blocklist")
        .when(F.col("avg_words") < 40, "low_quality")
        .otherwise("ok")
        .alias("verdict"),
    )


def _lsh_planes_sql() -> str:
    """DuckDB bucket expression for the 6 deterministic hyperplanes."""
    bits = []
    for j in range(6):
        s = (
            "list_aggregate(list_transform(range(0, 64), i -> "
            f"CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000 + 0.5) AS BIGINT)"
            f" * ((((i * 31) + {j * 17}) % 7) - 3)), 'sum')"
        )
        bits.append(f"CAST({s} > 0 AS INT) * {1 << j}")
    return " + ".join(bits)


@op(
    "sim_ann_lsh_hyperplane",
    oracle=f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5)) AS emb,
         {_lsh_planes_sql()} AS bucket
  FROM embeddings
),
n AS (SELECT vec_id, emb, bucket, sqrt(list_inner_product(emb, emb)) AS nrm FROM e),
q AS (SELECT vec_id AS q_id, emb AS qe, nrm AS qn, bucket FROM n WHERE vec_id < 20),
s AS (SELECT q.q_id, n.vec_id AS c_id,
             floor(list_inner_product(q.qe, n.emb) / (q.qn * n.nrm) * 10000 + 0.5)
               / 10000.0 AS cos
      FROM q JOIN n ON n.bucket = q.bucket AND n.vec_id <> q.q_id),
r AS (SELECT q_id, c_id, cos,
             CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY cos DESC, c_id ASC) AS BIGINT) AS rn
      FROM s)
SELECT q_id, c_id AS neighbor_id, cos, rn FROM r WHERE rn <= 3
""",
    category=CAT,
)
def sim_ann_lsh_hyperplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: 6 deterministic integer-weight
    hyperplanes (weight(i, j) = ((i*31 + j*17) % 7) - 3 over the 64
    dims) sign-quantize each embedding into a 6-bit bucket; neighbors
    are searched only within the bucket via an equality join.

    Complements `sim_ann_ivf_bucket` (data-dependent octant quantizer)
    with the data-INDEPENDENT quantizer real LSH uses.  The plane
    projections use floor(x*1000 + 0.5) integer dot products, so the bucket
    assignment is bit-exact across engines — no float sign boundary.

    Scale: identical shape to the IVF variant — bucket equi-join
    bounds candidates to ~n/2^b per probe; plane count trades recall
    for probe cost without changing the plan.  The plane projections
    run as posexplode -> 6 integer conditional sums in ONE
    groupBy(vec_id) — plain whole-stage-codegen arithmetic.  (Both a
    per-element aggregate() fold and a 384-term unrolled expression
    measured ~20x slower: the fold is interpreted per step, the unroll
    blows Janino's 64 KB method limit and falls back to interpreted.)
    Integer sums are order-independent, so the groupBy's partial-agg
    ordering cannot perturb the bucket, unlike a float projection.
    Neighbor RANKING uses the integer-exact quantized cosine
    (similarity.qvec — round-3 ADVICE fix)."""
    from trip_data_pipeline_spark.operators.similarity import (
        dot,
        fr4,
        l2norm,
        qvec,
    )

    raw = spread(load(spark, sf_dir, "embeddings"))
    exploded = raw.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id",
        "pos",
        F.floor(F.col("val").cast("double") * 1000 + 0.5).cast("bigint").alias("iv"),
    )
    plane_sums = [
        F.sum(
            F.col("iv") * (((F.col("pos") * 31 + F.lit(j * 17)) % 7) - 3)
        ).alias(f"s{j}")
        for j in range(6)
    ]
    buckets = exploded.groupBy("vec_id").agg(*plane_sums)
    bucket = sum(
        ((F.col(f"s{j}") > 0).cast("int") * (1 << j) for j in range(6)), F.lit(0)
    )
    e = raw.join(buckets.select("vec_id", bucket.alias("bucket")), "vec_id").select(
        "vec_id", qvec().alias("emb"), "bucket"
    )
    e = e.withColumn("nrm", l2norm(F.col("emb")))
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("qe"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    s = (
        F.broadcast(q)
        .join(e, ["bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            fr4(
                dot(F.col("qe"), F.col("emb")) / (F.col("qn") * F.col("nrm"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        s.withColumn("rn", bigint(F.row_number().over(w)))
        .filter(F.col("rn") <= 3)
        .select(
            "q_id",
            F.col("c_id").alias("neighbor_id"),
            "cos",
            "rn",
        )
    )


@op(
    "vocab_topk_coverage",
    oracle="""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM w),
freq AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY word),
ranked AS (
  SELECT word, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, word ASC) AS BIGINT) AS rk,
         sum(cnt) OVER (ORDER BY cnt DESC, word ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM freq
)
SELECT rk, word, cnt, round(cum / (SELECT n FROM tot), 4) AS coverage
FROM ranked WHERE rk <= 50
""",
    category=CAT,
)
def vocab_topk_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building with coverage accounting: corpus word
    frequencies ranked, with the cumulative fraction of all tokens the
    top-k vocabulary covers — the decision curve for sizing a
    tokenizer vocab (keep adding entries until coverage plateaus).

    Scale (round 3): one shuffle on word for the frequency table, then
    the top-50 is taken FIRST via orderBy+limit — which compiles to
    TakeOrderedAndProject (distributed per-task heaps) — and only the
    bounded 50-row result enters the single-partition rank/cumsum
    window.  (The previous formulation ranked the FULL vocabulary in
    one partition before filtering; vocabulary grows with the corpus,
    so that sort would serialize at 100 TB.)  The global token count
    is a broadcast scalar."""
    words = spread(load(spark, sf_dir, "documents")).select(
        F.explode(words_of()).alias("word")
    )
    freq = words.groupBy("word").agg(bigint(F.count(F.lit(1))).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("n"))
    top = freq.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(50)
    wr = Window.orderBy(F.col("cnt").desc(), F.col("word").asc())
    wc = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = top.select(
        bigint(F.row_number().over(wr)).alias("rk"),
        "word",
        "cnt",
        F.sum("cnt").over(wc).alias("cum"),
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        "rk", "word", "cnt", r4(F.col("cum") / F.col("n")).alias("coverage")
    )


@op(
    "corpus_quality_weighted_sample",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang,
         CAST((len(list_distinct(string_split(text, ' '))) * 1000)
           // len(string_split(text, ' ')) AS BIGINT) AS uniq_ppm,
         CAST(('0x' || substr(md5(text), 1, 4))::BIGINT AS BIGINT) AS h16
  FROM documents
)
SELECT doc_id, lang, uniq_ppm
FROM scored
WHERE h16 * 2000 < uniq_ppm * 65536
""",
    category=CAT,
)
def corpus_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling: each doc's keep
    probability is proportional to its lexical-diversity score
    (distinct/total words), decided by comparing a 16-bit md5 slice
    against the integer-scaled score — deterministic, partitioning-
    independent, and engine-exact (the inequality is cross-multiplied
    so no float division is compared).

    Scale: pure map-side predicate — the sample decision needs no
    corpus statistics, so it composes with any upstream filter at zero
    shuffle cost (the shape importance-resampling needs at 100 TB)."""
    w = words_of()
    # integer floor division on BOTH engines: a double divide then cast
    # truncates in Spark but ROUNDS in DuckDB — `div` / `//` are exact
    uniq_ppm = F.expr(
        "CAST((size(array_distinct(split(text, ' '))) * 1000)"
        " div size(split(text, ' ')) AS BIGINT)"
    )
    h16 = F.conv(F.substring(F.md5("text"), 1, 4), 16, 10).cast("bigint")
    return (
        spread(load(spark, sf_dir, "documents"))
        .select("doc_id", "lang", uniq_ppm.alias("uniq_ppm"), h16.alias("h16"))
        .filter(F.col("h16") * 2000 < F.col("uniq_ppm") * 65536)
        .select("doc_id", "lang", "uniq_ppm")
    )


@op(
    "embed_covariance_int",
    oracle="""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS iv
  FROM embeddings
),
cells AS (
  SELECT i.i AS di, j.j AS dj, q.iv[i.i + 1] AS vi, q.iv[j.j + 1] AS vj
  FROM q
  CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i
  CROSS JOIN (SELECT unnest(range(0, 64)) AS j) j
  WHERE j.j >= i.i
)
SELECT CAST(di AS BIGINT) AS di, CAST(dj AS BIGINT) AS dj,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(vi) AS BIGINT) AS sum_i,
       CAST(sum(vj) AS BIGINT) AS sum_j,
       CAST(sum(vi * vj) AS BIGINT) AS sum_ij
FROM cells
GROUP BY di, dj
""",
    category=CAT,
)
def embed_covariance_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding covariance accumulators (PCA/whitening prep): the
    upper-triangular 64x64 grid of (n, sum_i, sum_j, sum_i*j) over
    round(x*1000) integer-quantized components — the exact sufficient
    statistics cov(i,j) = sum_ij/n - sum_i*sum_j/n^2 needs, kept in
    integers so the result is bit-exact regardless of aggregation
    order (a float covariance would hash-mismatch on partial-agg
    ordering).

    Scale: one map-side explode to (vector x upper-tri pair) rows and
    ONE aggregation keyed by the fixed 2,080-cell grid — partial aggs
    reduce each partition to at most 2,080 rows before the shuffle, so
    network cost is constant in corpus size (the textbook
    sufficient-statistics pattern for distributed PCA).

    Overflow bound (round-7 ppm audit): |vi*vj| <= 1e6 per vector, so
    int64 sum_ij holds to ~9.2e12 vectors (~2 PB of 64-dim float32) —
    an order of magnitude past the 100 TB target; past that, widen the
    accumulator to DECIMAL(38,0) exactly as the ppm ops do."""
    # floor(x*1000 + 0.5): engine-independent rounding — DuckDB round()
    # and Spark round() disagree at exact .5 boundaries (hit at sf0.1)
    q = spread(load(spark, sf_dir, "embeddings")).select(
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000 + 0.5).cast("bigint"),
        ).alias("iv")
    )
    pairs = q.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, 63), i ->"
                " transform(sequence(i, 63), j ->"
                " struct(i AS di, j AS dj, iv[i] AS vi, iv[j] AS vj))))"
            )
        ).alias("c")
    ).select("c.di", "c.dj", "c.vi", "c.vj")
    return pairs.groupBy(
        bigint(F.col("di")).alias("di"), bigint(F.col("dj")).alias("dj")
    ).agg(
        bigint(F.count(F.lit(1))).alias("n"),
        bigint(F.sum("vi")).alias("sum_i"),
        bigint(F.sum("vj")).alias("sum_j"),
        bigint(F.sum(F.col("vi") * F.col("vj"))).alias("sum_ij"),
    )


@op(
    "knn_eval_confusion",
    oracle="""
WITH e0 AS (SELECT vec_id, label,
                   list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5)) AS emb
            FROM embeddings),
e AS (SELECT vec_id, label, emb, sqrt(list_inner_product(emb, emb)) AS nrm FROM e0),
q AS (SELECT vec_id AS q_id, label AS true_label, emb AS qe, nrm AS qn
      FROM e WHERE vec_id < 50),
s AS (SELECT q.q_id, q.true_label, e.label AS cand_label,
             floor(list_inner_product(q.qe, e.emb) / (q.qn * e.nrm) * 10000 + 0.5)
               / 10000.0 AS cos,
             e.vec_id AS c_id
      FROM q JOIN e ON e.vec_id <> q.q_id
      WHERE q.qn > 0 AND e.nrm > 0),
r AS (SELECT q_id, true_label, cand_label, cos, c_id,
             row_number() OVER (PARTITION BY q_id
                    ORDER BY cos DESC, c_id ASC) AS rn
      FROM s),
votes AS (
  SELECT q_id, true_label, cand_label, count(*) AS v, min(rn) AS best
  FROM r WHERE rn <= 5 GROUP BY q_id, true_label, cand_label
),
pred AS (
  SELECT q_id, true_label, cand_label AS pred_label,
         row_number() OVER (PARTITION BY q_id ORDER BY v DESC, best ASC) AS pr
  FROM votes
)
SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n
FROM pred WHERE pr = 1
GROUP BY true_label, pred_label
""",
    category=CAT,
)
def knn_eval_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classifier evaluation: 5-NN majority vote (deterministic
    nearest-rank tie-break) for 50 held-out queries, reported as the
    (true_label, predicted_label) confusion matrix — the quality gate
    a label-propagation / auto-labeling pipeline runs before trusting
    its labels.

    Scale: same broadcast-bounded-query shape as the other brute-force
    sim ops (the eval set is small by construction); the vote and
    confusion aggregations act on k x |eval| rows — negligible.
    Neighbor RANKING uses the integer-exact quantized cosine
    (similarity.qvec — round-3 ADVICE fix)."""
    e = spread(load(spark, sf_dir, "embeddings"))
    from trip_data_pipeline_spark.operators.similarity import (
        dot,
        fr4,
        l2norm,
        qvec,
    )

    base = e.select(
        "vec_id", "label", qvec().alias("emb"), l2norm(qvec()).alias("nrm")
    )
    q = base.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("true_label"),
        F.col("emb").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    # zero-norm exclusion on both sides (round-8 degenerate gate)
    s = (
        F.broadcast(q.filter(F.col("qn") > 0))
        .crossJoin(base.filter(F.col("nrm") > 0))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "true_label",
            F.col("label").alias("cand_label"),
            F.col("vec_id").alias("c_id"),
            fr4(dot(F.col("qe"), F.col("emb")) / (F.col("qn") * F.col("nrm"))).alias(
                "cos"
            ),
        )
    )
    wr = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    top5 = s.withColumn("rn", F.row_number().over(wr)).filter(F.col("rn") <= 5)
    votes = top5.groupBy("q_id", "true_label", "cand_label").agg(
        F.count(F.lit(1)).alias("v"), F.min("rn").alias("best")
    )
    wp = Window.partitionBy("q_id").orderBy(F.col("v").desc(), F.col("best").asc())
    pred = (
        votes.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") == 1)
        .select("true_label", F.col("cand_label").alias("pred_label"))
    )
    return pred.groupBy("true_label", "pred_label").agg(
        bigint(F.count(F.lit(1))).alias("n")
    )
