"""§2.11 deduplication operators (SURVEY.md §2.11) + task-brief
additions: exact hash, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

100 TB design notes:
- exact dedup = hash-groupBy: shuffle carries (hash, min_id) only.
- MinHash/LSH and SimHash avoid the O(n^2) pair space by banding:
  candidate pairs come from equality joins on band keys, so the
  shuffle is keyed by band hash and the blowup is bounded by bucket
  sizes (tune bands/rows b,r for the target Jaccard threshold).
- verification joins fetch shingle sets only for candidate pairs.
All stages are plain DataFrame ops (explode/groupBy/join) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import bigint, nz, r4, spread
from trip_data_pipeline_spark.operators.text_ops import (
    _duck_norm,
    _duck_words,
    _norm,
    _words,
)
from trip_data_pipeline_spark.registry import op

CAT = "2.11 deduplication"

MINHASH_PERMS = 64
LSH_BANDS = 16  # r = 64/16 = 4 rows per band -> ~0.5 Jaccard threshold
SHINGLE_K = 3


@op(
    "dedup_exact_hash",
    oracle=f"""
SELECT md5({_duck_norm()}) AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS survivor_id,
       CAST(count(*) AS BIGINT)    AS n_copies
FROM documents
GROUP BY 1
""",
    category=CAT,
    pure=True,
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized-text md5, deterministic survivor —
    SURVEY.md §2.11 row 4.  Round 3: normalization is the shared
    translate() char-map (text_ops._norm) — the old Java regex was
    ~75% of this op's wall time at the 10x probe (2.03 s -> 0.63 s).
    Light per-row work: relaxed spread guard (common.spread r4 note)."""
    d = spread(load(spark, sf_dir, "documents"), min_fraction=0.25)
    h = F.md5(_norm())
    return (
        d.select(h.alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            bigint(F.min("doc_id")).alias("survivor_id"),
            bigint(F.count(F.lit(1))).alias("n_copies"),
        )
    )


def shingle_col(ws: Column, k: int = SHINGLE_K) -> Column:
    """k-word shingles of a token array, as strings — TOTAL for any
    input length (empty array below k words).

    The guard is load-bearing even though every call site filters
    size(ws) >= k first: the round-8 degenerate-shape gate caught
    codegen SUBEXPRESSION ELIMINATION evaluating this transform
    eagerly inside a Filter predicate (an inferred isnotnull
    constraint on a shingle-derived column lands in the same Filter
    as the size guard, and subExpr_0$ runs before the conjunct
    short-circuit), where a 1-word doc made sequence(0, size-k)
    DESCEND and element_at(ws, 2) raise.  CASE-WHEN branches are
    exempt from subexpression elimination, so guarding INSIDE the
    expression is the only placement the optimizer cannot reorder."""
    return F.when(
        F.size(ws) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws, i + j + 1) for j in range(k)]
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))


# Engine-portable universal-hash MinHash (SURVEY §2.11 / §5.3): one
# md5 per shingle yields two 28-bit integers (a, b) parsed from hex;
# permutation j is h_j = (a + (j+1)*b) mod M.  Both Spark (conv) and
# DuckDB (strpos fold, see _DUCK_HEX28) compute the identical integers,
# which is what upgrades this op from rows-only to a full value-hash
# oracle.  28-bit a/b keeps (a + 64*b) < 2^35 — no overflow in either
# engine — and MinHash only needs a consistent pseudo-random total
# order per permutation, not a cryptographic one.
MINHASH_MOD = 2_147_483_647  # 2^31 - 1


def _hex28(md5_col: Column, start: int) -> Column:
    """Spark side: parse 7 hex chars of an md5 string as a bigint."""
    return F.conv(F.substring(md5_col, start, 7), 16, 10).cast("bigint")


def _duck_hex28(h: str, start: int) -> str:
    """DuckDB side: identical 7-hex-char parse as a positional fold
    (DuckDB has no base-16 string->int conversion function)."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {start + i}, 1)) - 1)"
        f" * {16 ** (6 - i)}"
        for i in range(7)
    ) + ")"


def minhash_signatures_arrow(docs: DataFrame) -> DataFrame:
    """docs(doc_id, ws) -> (doc_id, sig: array<bigint>) with the
    64-perm fold done as a numpy batch kernel instead of Catalyst
    lambdas.  Round-4 measurement (10x layout, 50k docs x ~58
    shingles): the interpreted HOF fold costs 17 s — higher-order
    lambdas are NOT codegen'd, so 185M modular ops run on the
    expression interpreter — while md5 (codegen'd) is only 1.9 s.
    This keeps the md5 (a, b) parse JVM-side and ships two small
    int arrays per doc through Arrow for a (64 x n) vectorized
    min-fold: same integers, same signature, ~8x faster fold (the
    JVM-fold-vs-Arrow-matmul crossover rule in docs/SCALE.md — this
    kernel is firmly in the Arrow regime)."""
    from typing import Iterator as _Iter

    import numpy as np
    import pandas as pd

    sh = shingle_col(F.col("ws"))
    # Round-12 (guide §1.2 per-task work, §4.1): ONE md5 + ONE conv per
    # shingle instead of two.  The old shape ran two separate transform
    # lambdas — ha = conv(substring(md5(s), 1, 7)) and
    # hb = conv(substring(md5(s), 8, 7)) — and higher-order lambdas are
    # interpreted expression trees with no cross-lambda subexpression
    # sharing, so every shingle was md5'd twice.  Parsing the first 14
    # hex chars as one 56-bit long (the exact trick simhash_bits_arrow
    # already uses) and splitting hab = a * 2^28 + b inside the numpy
    # kernel yields bit-identical (a, b): substring(1,14) is the
    # concatenation of substring(1,7) and substring(8,7), so
    # hab >> 28 == a and hab & (2^28 - 1) == b by construction.
    ab = docs.select(
        "doc_id",
        F.transform(
            sh,
            lambda s: F.conv(F.substring(F.md5(s), 1, 14), 16, 10).cast(
                "bigint"
            ),
        ).alias("hab"),
    )

    def fold(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        ks = np.arange(1, MINHASH_PERMS + 1, dtype=np.int64).reshape(-1, 1)
        for pdf in batches:
            sigs = []
            for hab in pdf["hab"]:
                hab = np.asarray(hab, dtype=np.int64)
                a = hab >> 28
                b = hab & ((1 << 28) - 1)
                # a, b < 2^28 and k <= 64 -> a + k*b < 2^35: no overflow
                sigs.append(((a + ks * b) % MINHASH_MOD).min(axis=1).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})

    return ab.mapInPandas(fold, schema="doc_id bigint, sig array<bigint>")


def minhash_candidate_pairs(docs: DataFrame) -> DataFrame:
    """docs(doc_id, ws: array<string>) -> candidate pairs from LSH band
    equality (doc_id1 < doc_id2, distinct)."""
    r = MINHASH_PERMS // LSH_BANDS
    sigs = minhash_signatures_arrow(docs)
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        *[
                            F.element_at("sig", b * r + i + 1).cast("string")
                            for i in range(r)
                        ],
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    b1 = bands.alias("b1")
    b2 = bands.alias("b2")
    return (
        b1.join(
            b2,
            (F.col("b1.band_idx") == F.col("b2.band_idx"))
            & (F.col("b1.band_hash") == F.col("b2.band_hash"))
            & (F.col("b1.doc_id") < F.col("b2.doc_id")),
        )
        .select(
            F.col("b1.doc_id").alias("doc_id1"),
            F.col("b2.doc_id").alias("doc_id2"),
        )
        .distinct()
    )


def verified_jaccard_pairs(docs: DataFrame, pairs: DataFrame, tau: float) -> DataFrame:
    """Join candidate pairs back to shingle sets and keep those with
    true Jaccard >= tau."""
    sets_ = docs.select(
        "doc_id", F.array_distinct(shingle_col(F.col("ws"))).alias("sset")
    )
    j = (
        pairs.join(sets_.withColumnRenamed("doc_id", "doc_id1").withColumnRenamed("sset", "s1"), "doc_id1")
        .join(sets_.withColumnRenamed("doc_id", "doc_id2").withColumnRenamed("sset", "s2"), "doc_id2")
    )
    inter = F.size(F.array_intersect("s1", "s2")).cast("double")
    union = F.size(F.array_union("s1", "s2")).cast("double")
    return (
        j.select(
            "doc_id1",
            "doc_id2",
            r4(inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= tau)
    )


# DuckDB mirror of the full MinHash/LSH pipeline.  Feasible because the
# permutation family is md5-derived integer arithmetic (see module
# note) rather than an engine-private hash: DuckDB parses the same two
# 28-bit ints from the same md5 hex, folds the same 64 permutation
# mins, bands them with the same '_'-joined keys, and verifies the same
# exact Jaccard — full value-hash parity, not rows-only.
_SHINGLES_DUCK = (
    "[ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] "
    "for i in range(1, len(ws) - 1)]"
)

_MINHASH_ORACLE = f"""
WITH d AS (SELECT doc_id, {_duck_words()} AS ws FROM documents),
d3 AS (SELECT doc_id, ws FROM d WHERE len(ws) >= {SHINGLE_K}),
sh AS (
  SELECT DISTINCT doc_id, unnest({_SHINGLES_DUCK}) AS s FROM d3
),
hx AS (
  SELECT doc_id,
         {_duck_hex28('md5(s)', 1)} AS a,
         {_duck_hex28('md5(s)', 8)} AS b
  FROM sh
),
hj AS (
  SELECT doc_id, j, min((a + (j + 1) * b) % {MINHASH_MOD}) AS mh
  FROM hx CROSS JOIN (SELECT unnest(range(0, {MINHASH_PERMS})) AS j) perms
  GROUP BY doc_id, j
),
bands AS (
  SELECT doc_id, j // {MINHASH_PERMS // LSH_BANDS} AS band_idx,
         string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j) AS band_key
  FROM hj GROUP BY doc_id, band_idx
),
cand AS (
  SELECT DISTINCT b1.doc_id AS doc_id1, b2.doc_id AS doc_id2
  FROM bands b1
  JOIN bands b2 ON b1.band_idx = b2.band_idx
               AND b1.band_key = b2.band_key
               AND b1.doc_id < b2.doc_id
),
sets_ AS (
  SELECT doc_id, list_distinct({_SHINGLES_DUCK}) AS sset FROM d3
)
SELECT doc_id1, doc_id2, jaccard FROM (
  SELECT c.doc_id1, c.doc_id2,
         round(CAST(len(list_intersect(s1.sset, s2.sset)) AS DOUBLE)
               / len(list_distinct(list_concat(s1.sset, s2.sset))), 4)
           AS jaccard
  FROM cand c
  JOIN sets_ s1 ON s1.doc_id = c.doc_id1
  JOIN sets_ s2 ON s2.doc_id = c.doc_id2
) WHERE jaccard >= 0.5
"""


@op("dedup_near_minhash", oracle=_MINHASH_ORACLE, category=CAT)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: 3-shingles -> 64-perm MinHash -> 16-band LSH
    -> candidate pairs -> verified Jaccard >= 0.5 — SURVEY.md §2.11
    row 5.  Hash-checked since round 3: the portable md5-universal-hash
    permutation family lets DuckDB replay the exact LSH pipeline (see
    _MINHASH_ORACLE); recall properties stay covered by
    tests/test_properties.py."""
    d = spread(load(spark, sf_dir, "documents"))
    docs = d.select("doc_id", _words().alias("ws")).filter(F.size("ws") >= SHINGLE_K)
    pairs = minhash_candidate_pairs(docs)
    return verified_jaccard_pairs(docs, pairs, tau=0.5)


def simhash_bits_expr(ws_sql: str, nbits: int = 56) -> str:
    """SQL-expression SimHash (bit shifts on a lambda variable need the
    SQL dialect; the DataFrame lambda API can't shift by a column).

    The per-word hash is the first 14 hex chars of md5 parsed as a
    56-bit non-negative integer — the same engine-portable family the
    MinHash ops use — so the whole signature replays in DuckDB and the
    op hash-checks (round-3 upgrade from the xxhash64 rows-only form;
    56 bits keeps the 4-band split at an even 14 bits per band)."""
    return f"""
    array_join(
      transform(
        aggregate(
          transform({ws_sql},
                    w -> cast(conv(substring(md5(w), 1, 14), 16, 10) as long)),
          array_repeat(0L, {nbits}),
          (acc, h) -> zip_with(
            acc,
            transform(sequence(0, {nbits - 1}),
                      i -> CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END),
            (a, b) -> a + CAST(b AS LONG))),
        v -> CASE WHEN v > 0 THEN '1' ELSE '0' END),
      '')
    """


def simhash_bits_arrow(docs: DataFrame, nbits: int = 56) -> DataFrame:
    """docs(doc_id, ws) -> (doc_id, sh: 56-char bit string, shl: the
    same 56 bits as ONE bigint — char i+1 of sh == bit i of shl), with
    the bit-vote fold as a numpy batch kernel.  Downstream band keys
    and hamming distances work on shl ((shl >> 14b) & 0x3FFF band
    extraction, bit_count(xor) hamming — both codegen'd) instead of
    56-char strings: identical values by construction, far cheaper
    join keys.  Same round-4 lesson as
    minhash_signatures_arrow: the aggregate+zip_with fold above runs
    on the expression interpreter (HOF lambdas are never codegen'd)
    and cost ~25 s of dedup_simhash's 33 s at the 10x layout; the md5
    word hash (codegen'd conv/substring) stays JVM-side and only one
    small long array per doc crosses Arrow.  Bit-identical by
    construction: votes are the same +/-1 integer sums, threshold the
    same strict > 0.  simhash_bits_expr remains the single-expression
    SQL-dialect form (property-tested; it is also the documentation of
    the portable hash family the DuckDB oracle replays)."""
    from typing import Iterator as _Iter

    import numpy as np
    import pandas as pd

    hs = docs.select(
        "doc_id",
        F.expr(
            "transform(ws, w -> cast(conv(substring(md5(w), 1, 14), 16, 10) as long))"
        ).alias("hv"),
    )

    def fold(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        shifts = np.arange(nbits, dtype=np.int64)
        weights = (np.int64(1) << shifts)
        for pdf in batches:
            out_s, out_l = [], []
            for hv in pdf["hv"]:
                h = np.asarray(hv, dtype=np.int64)
                votes = (((h[:, None] >> shifts) & 1) * 2 - 1).sum(axis=0)
                bits = votes > 0
                out_s.append("".join("1" if b else "0" for b in bits))
                out_l.append(int((weights * bits).sum()))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "sh": out_s, "shl": out_l}
            )

    return hs.mapInPandas(fold, schema="doc_id bigint, sh string, shl bigint")


_HAMMING_DUCK = "len([i for i in range(1, 57) if sh1[i] != sh2[i]])"

_SIMHASH_ORACLE = f"""
WITH d AS (SELECT doc_id, {_duck_words()} AS ws FROM documents),
w AS (SELECT doc_id, unnest(ws) AS w FROM d WHERE len(ws) > 0),
h AS (
  SELECT doc_id,
         ({_duck_hex28('md5(w)', 1)} * 268435456 + {_duck_hex28('md5(w)', 8)}) AS h
  FROM w
),
bits AS (
  SELECT doc_id, bi.i AS i,
         sum(CASE WHEN (h >> bi.i) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h CROSS JOIN (SELECT unnest(range(0, 56)) AS i) bi
  GROUP BY doc_id, bi.i
),
sh AS (
  SELECT doc_id,
         string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY i) AS sh
  FROM bits GROUP BY doc_id
),
bands AS (
  SELECT doc_id, sh, bb.b AS band_idx, substr(sh, 1 + 14 * bb.b, 14) AS band_bits
  FROM sh CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bb
),
cand AS (
  SELECT DISTINCT b1.doc_id AS doc_id1, b2.doc_id AS doc_id2,
         b1.sh AS sh1, b2.sh AS sh2
  FROM bands b1
  JOIN bands b2 ON b1.band_idx = b2.band_idx
              AND b1.band_bits = b2.band_bits
              AND b1.doc_id < b2.doc_id
)
SELECT doc_id1, doc_id2,
       CAST({_HAMMING_DUCK} AS BIGINT) AS hamming
FROM cand
WHERE {_HAMMING_DUCK} <= 6
"""


@op("dedup_simhash", oracle=_SIMHASH_ORACLE, category=CAT)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates — task-brief dedup addition.

    Pipeline: 56-bit SimHash per doc (aggregate fold, no explode) ->
    4 bands of 14 bits -> equality join per band -> hamming distance
    <= 6 verification.  Banding guarantees recall for hamming <= 3
    (pigeonhole: one of 4 bands must match exactly).

    Hash-checked since round 3: the per-word hash is md5-derived
    integer arithmetic (see simhash_bits_expr), so the oracle replays
    the ENTIRE pipeline — word hashes, bit votes, banding, candidate
    join, hamming verify — and must land on the identical pair set."""
    d = spread(load(spark, sf_dir, "documents"))
    # normalize via the shared translate() char-map first (DataFrame
    # API — no SQL-literal escaping of the punctuation set needed),
    # then the Arrow bit-vote fold; banding + hamming run on the
    # single-long signature (shl) — int band keys and a codegen'd
    # bit_count(xor) instead of 56-char string comparisons.
    docs = simhash_bits_arrow(
        d.select("doc_id", _words().alias("ws")).filter(F.size("ws") > 0)
    )
    bands = docs.select(
        "doc_id",
        "shl",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("shl"), 14 * b).bitwiseAND(F.lit(16383))
                    for b in range(4)
                ]
            )
        ).alias("band_idx", "band_bits"),
    )
    b1, b2 = bands.alias("b1"), bands.alias("b2")
    cand = (
        b1.join(
            b2,
            (F.col("b1.band_idx") == F.col("b2.band_idx"))
            & (F.col("b1.band_bits") == F.col("b2.band_bits"))
            & (F.col("b1.doc_id") < F.col("b2.doc_id")),
        )
        .select(
            F.col("b1.doc_id").alias("doc_id1"),
            F.col("b2.doc_id").alias("doc_id2"),
            F.col("b1.shl").alias("shl1"),
            F.col("b2.shl").alias("shl2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("shl1").bitwiseXOR(F.col("shl2")))
    return cand.select(
        "doc_id1", "doc_id2", bigint(hamming).alias("hamming")
    ).filter(F.col("hamming") <= 6)


@op(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH t AS (SELECT doc_id, list_distinct({_duck_words()}) AS ws FROM documents)
SELECT t1.doc_id AS doc_id1, t2.doc_id AS doc_id2,
       CAST(len(list_intersect(t1.ws, t2.ws)) AS BIGINT) AS n_common,
       round(CAST(len(list_intersect(t1.ws, t2.ws)) AS DOUBLE)
             / len(list_distinct(list_concat(t1.ws, t2.ws))), 4) AS jaccard
FROM t t1 JOIN t t2 ON t2.doc_id = t1.doc_id + 1
""",
    category=CAT,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-gram (word-set) Jaccard between consecutive doc pairs —
    task-brief dedup addition, hash-checked (the bounded pair set makes
    an exact SQL oracle possible; the LSH variant above is the
    all-pairs scale path)."""
    d = spread(load(spark, sf_dir, "documents"))
    t = d.select("doc_id", F.array_distinct(_words()).alias("ws"))
    t1, t2 = t.alias("t1"), t.alias("t2")
    inter = F.size(F.array_intersect(F.col("t1.ws"), F.col("t2.ws")))
    union = F.size(F.array_union(F.col("t1.ws"), F.col("t2.ws")))
    return t1.join(t2, F.col("t2.doc_id") == F.col("t1.doc_id") + 1).select(
        F.col("t1.doc_id").alias("doc_id1"),
        F.col("t2.doc_id").alias("doc_id2"),
        bigint(inter).alias("n_common"),
        r4(inter.cast("double") / union).alias("jaccard"),
    )


@op(
    "dedup_embedding_cosine",
    oracle="""
WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5)) AS emb
           FROM embeddings WHERE vec_id < 200),
     n AS (SELECT vec_id, emb, sqrt(list_inner_product(emb, emb)) AS nrm FROM e)
SELECT e1.vec_id AS vec_id1, e2.vec_id AS vec_id2,
       floor(list_inner_product(e1.emb, e2.emb) / (e1.nrm * e2.nrm) * 10000 + 0.5)
         / 10000.0 AS cos
FROM n e1 JOIN n e2 ON e1.vec_id < e2.vec_id
ORDER BY cos DESC, vec_id1 ASC, vec_id2 ASC
LIMIT 10
""",
    category=CAT,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: top-10 most similar pairs in a
    bounded id range — task-brief dedup addition.  The top-10
    membership RANKS on cosine, so it uses the integer-exact quantized
    cosine (similarity.qvec) — see the round-3 ADVICE fix.

    Brute-force within the bound; at 100 TB the same query runs after
    an LSH/IVF bucket join (see sim_ann_ivf_bucket) so pairs are only
    formed within buckets."""
    from trip_data_pipeline_spark.operators.similarity import dot, fr4, l2norm, qvec

    e = (
        spread(load(spark, sf_dir, "embeddings"))
        .filter(F.col("vec_id") < 200)
        .select("vec_id", qvec().alias("emb"))
        .withColumn("nrm", l2norm(F.col("emb")))  # normalize-once per side
    )
    e1, e2 = e.alias("e1"), e.alias("e2")
    return (
        e1.join(e2, F.col("e1.vec_id") < F.col("e2.vec_id"))
        .select(
            F.col("e1.vec_id").alias("vec_id1"),
            F.col("e2.vec_id").alias("vec_id2"),
            fr4(
                dot(F.col("e1.emb"), F.col("e2.emb"))
                / (F.col("e1.nrm") * F.col("e2.nrm"))
            ).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id1").asc(), F.col("vec_id2").asc())
        .limit(10)
    )
