"""§2.8 Scalar functions: string / date / math / array / map / json /
struct (SURVEY.md §2.8).

This is where Spark<->DuckDB dialect hazards concentrate; each operator
docstring records the normalization applied (day-of-week numbering,
0/1-based positions, floor-based precision reduction, decimal-grid
rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import as_date, bigint, epoch_s, nz, r2
from trip_data_pipeline_spark.registry import op

CAT = "2.8 scalar functions"


@op(
    "str_basics",
    oracle="""
SELECT p_partkey,
       upper(p_name)                              AS up,
       lower(p_brand)                             AS lo,
       CAST(length(p_name) AS BIGINT)             AS ln,
       substring(p_name, 1, 5)                    AS sub5,
       concat_ws('-', p_brand, p_type)            AS cw,
       replace(p_name, ' ', '_')                  AS rep,
       lpad(CAST(p_size AS VARCHAR), 4, '0')      AS lp,
       trim(concat(' ', p_name, ' '))             AS trm
FROM part
""",
    category=CAT,
)
def str_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/length/substr/concat_ws/replace/lpad/trim —
    SURVEY.md §2.8 row 1."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        bigint(F.length("p_name")).alias("ln"),
        F.substring("p_name", 1, 5).alias("sub5"),
        F.concat_ws("-", "p_brand", "p_type").alias("cw"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("rep"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("lp"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trm"),
    )


@op(
    "str_split_part",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderpriority IS NULL THEN NULL
            ELSE split_part(o_orderpriority, '-', 1) END AS pri_num,
       CASE WHEN o_orderpriority IS NULL THEN NULL
            ELSE split_part(o_orderpriority, '-', 2) END AS pri_word
FROM orders
""",
    category=CAT,
)
def str_split_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + element access (Spark 0-based getItem vs DuckDB 1-based
    split_part, aligned) — SURVEY.md §2.8 row 2."""
    o = load(spark, sf_dir, "orders")
    parts = F.split(F.col("o_orderpriority"), "-")
    return o.select(
        "o_orderkey",
        parts.getItem(0).alias("pri_num"),
        parts.getItem(1).alias("pri_word"),
    )


@op(
    "str_regexp",
    oracle="""
SELECT o_orderkey,
       CAST(regexp_extract(o_orderpriority, '^(\\d+)', 1) AS INTEGER) AS pri,
       o_orderpriority
FROM orders
WHERE regexp_matches(o_orderpriority, 'URGENT|HIGH')
""",
    category=CAT,
)
def str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract + rlike filter (Java regex vs RE2 agree on this
    subset) — SURVEY.md §2.8 row 3."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority").rlike("URGENT|HIGH"))
        .select(
            "o_orderkey",
            F.regexp_extract(F.col("o_orderpriority"), r"^(\d+)", 1)
            .cast("int")
            .alias("pri"),
            "o_orderpriority",
        )
    )


@op(
    "date_parts",
    oracle="""
SELECT o_orderkey,
       CAST(year(CAST(o_orderdate AS DATE))  AS BIGINT) AS y,
       CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS m,
       CAST(day(CAST(o_orderdate AS DATE))   AS BIGINT) AS d,
       CAST(isodow(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS wd_mon0
FROM orders
""",
    category=CAT,
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/day-of-week extraction — SURVEY.md §2.8 row 4.

    Day-of-week numbering differs across engines (§5.3 rule 5):
    normalized to Monday=0 via Spark ``weekday`` vs DuckDB
    ``isodow - 1``."""
    o = load(spark, sf_dir, "orders")
    d = as_date(F.col("o_orderdate"))
    return o.select(
        "o_orderkey",
        bigint(F.year(d)).alias("y"),
        bigint(F.month(d)).alias("m"),
        bigint(F.dayofmonth(d)).alias("d"),
        bigint(F.weekday(d)).alias("wd_mon0"),
    )


@op(
    "date_arith",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(date_diff('day', CAST(o_orderdate AS DATE),
                      CAST(l_shipdate AS DATE)) AS BIGINT)  AS ship_delay_days,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30,
       CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
       last_day(CAST(o_orderdate AS DATE))                 AS month_end
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
""",
    category=CAT,
)
def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datediff / date_add / date_trunc / last_day — SURVEY.md §2.8
    row 5."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    od = as_date(F.col("o_orderdate"))
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        bigint(F.datediff(as_date(F.col("l_shipdate")), od)).alias("ship_delay_days"),
        F.date_add(od, 30).alias("plus30"),
        F.trunc(od, "month").alias("month_start"),
        F.last_day(od).alias("month_end"),
    )


@op(
    "time_bucket_15min",
    oracle="""
WITH e AS (SELECT (epoch_us(ts) // 1000000) AS s, value FROM events)
SELECT CAST(s - s % 900 AS BIGINT) AS bucket_s,
       CAST(count(*) AS BIGINT)    AS n,
       round(sum(value), 2)        AS total_value
FROM e GROUP BY 1
""",
    category=CAT,
)
def time_bucket_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute time bucketing — SURVEY.md §2.8 row 6: the reference's
    temporal-precision-reduction anonymization op generalized.
    Projected as integer epoch (never raw timestamps, §5.3 rule 2)."""
    ev = load(spark, sf_dir, "events").select(epoch_s("ts").alias("s"), "value")
    return (
        ev.groupBy(bigint(F.col("s") - F.col("s") % 900).alias("bucket_s"))
        .agg(
            bigint(F.count(F.lit(1))).alias("n"),
            r2(F.sum("value")).alias("total_value"),
        )
    )


@op(
    "math_suite",
    oracle="""
SELECT event_id,
       CAST(floor(value) AS BIGINT)        AS fl,
       CAST(ceil(value)  AS BIGINT)        AS ce,
       round(abs(value - 100), 2)          AS ab,
       round(power(value, 2), 4)           AS p2,
       round(sqrt(value), 6)               AS sq,
       round(ln(1 + value), 6)             AS lg,
       round(log10(1 + value), 6)          AS l10,
       CAST(event_id % 7 AS BIGINT)        AS md,
       CAST(sign(value - 250) AS INTEGER)  AS sg
FROM events
""",
    category=CAT,
)
def math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """floor/ceil/abs/pow/sqrt/ln/log10/mod/sign — SURVEY.md §2.8 row 7.

    sqrt is IEEE-correctly-rounded (identical across engines); ln/log10
    are libm (<=1 ulp apart) — rounded at 6 dp where a 1-ulp gap cannot
    flip the result except on a measure-zero boundary."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        bigint(F.floor(v)).alias("fl"),
        bigint(F.ceil(v)).alias("ce"),
        r2(F.abs(v - 100)).alias("ab"),
        F.round(F.pow(v, 2), 4).alias("p2"),
        F.round(F.sqrt(v), 6).alias("sq"),
        F.round(F.log(F.lit(1) + v), 6).alias("lg"),
        F.round(F.log10(F.lit(1) + v), 6).alias("l10"),
        bigint(F.col("event_id") % 7).alias("md"),
        F.signum(v - 250).cast("int").alias("sg"),
    )


@op(
    "precision_reduce_round",
    oracle="""
WITH r AS (SELECT event_type, floor(value * 10) / 10 AS v1 FROM events)
SELECT event_type,
       round(sum(v1), 2)        AS total_reduced,
       round(avg(v1), 2)        AS avg_reduced,
       CAST(count(*) AS BIGINT) AS n
FROM r GROUP BY event_type
""",
    category=CAT,
)
def precision_reduce_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision reduction + re-aggregate — SURVEY.md §2.8 row 8: the
    reference's spatial-precision anonymization generalized.

    Uses floor(x*10)/10 (truncation to 1 dp) rather than round(x, 1):
    the raw values live on a 2 dp grid, so .x5 values are EXACT halves
    at 1 dp and Spark (decimal HALF_UP) and DuckDB (binary round) would
    legitimately disagree.  Truncation is pure IEEE arithmetic —
    bit-identical everywhere — and is the semantics an anonymizer
    actually wants (bucket, don't nearest-round)."""
    ev = load(spark, sf_dir, "events")
    v1 = F.floor(F.col("value") * 10) / 10
    return (
        ev.select("event_type", v1.alias("v1"))
        .groupBy("event_type")
        .agg(
            r2(F.sum("v1")).alias("total_reduced"),
            r2(F.avg("v1")).alias("avg_reduced"),
            bigint(F.count(F.lit(1))).alias("n"),
        )
    )


@op(
    "hash_id_stable",
    oracle="""
SELECT c_custkey,
       md5(c_name)     AS name_md5,
       sha256(c_name)  AS name_sha256
FROM customer
""",
    category=CAT,
)
def hash_id_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic identifier hashing (anonymize IDs) — SURVEY.md
    §2.8 row 9."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name")).alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
    )


@op(
    "array_ops",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT)        AS n_words,
       list_contains(string_split(text, ' '), 'join')      AS has_join,
       array_to_string(list_slice(string_split(text, ' '), 1, 3), ',')
                                                           AS first3,
       array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',')
                                                           AS uniq_words
FROM documents
""",
    category=CAT,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/contains/slice/distinct/sort over word arrays — SURVEY.md
    §2.8 row 10.  array_distinct keeps first-occurrence order (engine-
    specific) so it is always wrapped in sort_array before hashing.
    Array results are projected comma-joined (array_join both engines):
    the driver's pandas canonicalizer cannot sort raw ArrayType cells,
    and both sides join identically so equality is unchanged."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        bigint(F.size(words)).alias("n_words"),
        F.array_contains(words, "join").alias("has_join"),
        F.array_join(F.slice(words, 1, 3), ",").alias("first3"),
        F.array_join(F.sort_array(F.array_distinct(words)), ",").alias("uniq_words"),
    )


@op(
    "array_explode",
    oracle="""
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
GROUP BY word
""",
    category=CAT,
)
def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (lateral view) to word counts — SURVEY.md §2.8 row 11."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(bigint(F.count(F.lit(1))).alias("n"))
    )


@op(
    "array_posexplode",
    oracle="""
SELECT vec_id,
       CAST(generate_subscripts(list_slice(embedding, 1, 8), 1) AS BIGINT) AS pos,
       CAST(unnest(list_slice(embedding, 1, 8)) AS DOUBLE)                 AS val
FROM embeddings
""",
    category=CAT,
)
def array_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode of the first 8 embedding dims — SURVEY.md
    §2.8 row 12 (Spark posexplode is 0-based, DuckDB subscripts are
    1-based: +1 on the Spark side).

    Raw elements are projected UNROUNDED: both engines widen the same
    float32 to the same double, so equality is exact — while rounding
    a float-origin value at 4 dp hits shortest-repr half-boundaries
    (e.g. 0.01235) that Spark (decimal HALF_UP) and DuckDB (binary
    round) resolve differently (observed at sf0.1)."""
    e = load(spark, sf_dir, "embeddings")
    sliced = F.slice(F.col("embedding"), 1, 8)
    return e.select("vec_id", F.posexplode(sliced).alias("pos0", "v")).select(
        "vec_id",
        bigint(F.col("pos0") + 1).alias("pos"),
        F.col("v").cast("double").alias("val"),
    )


@op(
    "array_higher_order",
    oracle="""
WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings)
SELECT vec_id,
       CASE WHEN round(list_aggregate(emb, 'sum'), 4) = 0
            THEN CAST(0.0 AS DOUBLE)
            ELSE round(list_aggregate(emb, 'sum'), 4) END     AS vec_sum,
       CAST(len(list_filter(emb, x -> x > 0)) AS BIGINT)     AS n_pos,
       array_to_string(list_transform(list_slice(emb, 1, 4),
           x -> CAST(CAST(floor(x * 2 * 10000 + 0.5) AS BIGINT) AS VARCHAR)),
           ',')                                              AS first4_doubled
FROM e
""",
    category=CAT,
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions (transform/aggregate/filter) for vector
    math without UDFs — SURVEY.md §2.8 row 13.  Elements are cast
    float->double BEFORE arithmetic on both engines (FIXTURES.md gotcha
    5).  The x*2 slice is still computed with transform/slice HOFs but
    is PROJECTED as a comma-joined string of floor-scaled bigints: the
    driver's pandas canonicalizer cannot sort raw ArrayType cells
    (CORRECTNESS_r03 `unhashable type: 'list'`), and float64->string
    formatting differs across engines, so each element is
    floor(x*2*1e4+0.5) — deterministic in float64 on both sides."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        nz(
            F.round(F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x), 4)
        ).alias("vec_sum"),
        bigint(F.size(F.filter(emb, lambda x: x > 0))).alias("n_pos"),
        F.array_join(
            F.transform(
                F.slice(emb, 1, 4),
                lambda x: F.floor(x * 2 * 10000 + 0.5).cast("bigint").cast("string"),
            ),
            ",",
        ).alias("first4_doubled"),
    )


@op(
    "map_from_entries",
    oracle="""
SELECT user_id,
       CAST(NULLIF(count(CASE WHEN event_type = 'click' THEN 1 END), 0)
            AS BIGINT) AS n_clicks
FROM events WHERE event_type IS NOT NULL GROUP BY user_id
""",
    category=CAT,
)
def map_from_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build MapType event_type->count per user, read one key back —
    SURVEY.md §2.8 row 14.  Only the element_at lookup is projected
    (map hashing across engines is not portable); a user with no clicks
    yields NULL, mirrored by NULLIF(count, 0) in the oracle."""
    # a NULL event_type cannot be a map key (Spark raises
    # NULL_MAP_KEY) — rows with NULL keys are excluded before map
    # construction in BOTH engines (round-8 NULL-payload sweep)
    ev = load(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    per_type = ev.groupBy("user_id", "event_type").agg(
        bigint(F.count(F.lit(1))).alias("n")
    )
    maps = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("type_counts")
    )
    return maps.select(
        "user_id", F.element_at(F.col("type_counts"), "click").alias("n_clicks")
    )


@op(
    "json_extract_props",
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2)     AS total_value
FROM events GROUP BY 1
""",
    category=CAT,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object + aggregate on the extracted key — SURVEY.md
    §2.8 row 15."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            bigint(F.count(F.lit(1))).alias("n"),
            r2(F.sum("value")).alias("total_value"),
        )
    )


@op(
    "struct_nested",
    oracle="""
SELECT o_orderkey, d, p,
       CAST(row_number() OVER (ORDER BY d, p, o_orderkey) AS BIGINT) AS rn
FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d, o_totalprice AS p
      FROM orders WHERE o_orderkey < 3000) t
""",
    category=CAT,
)
def struct_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a struct, project its fields, order BY the struct —
    SURVEY.md §2.8 row 16 (struct comparison = lexicographic field
    order, mirrored as ORDER BY d, p in the oracle)."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 3000)
        .select(
            "o_orderkey",
            F.struct(
                as_date(F.col("o_orderdate")).alias("d"),
                F.col("o_totalprice").alias("p"),
            ).alias("s"),
        )
    )
    w = Window.orderBy(F.col("s").asc(), F.col("o_orderkey").asc())
    return o.select(
        "o_orderkey",
        F.col("s.d").alias("d"),
        F.col("s.p").alias("p"),
        bigint(F.row_number().over(w)).alias("rn"),
    )


@op(
    "conditional_funcs",
    oracle="""
SELECT o_orderkey,
       coalesce(NULLIF(o_orderstatus, 'P'), 'unknown')     AS st,
       greatest(o_totalprice, 200000.0)                    AS hi,
       least(o_totalprice, 200000.0)                       AS lo,
       coalesce(NULLIF(o_orderpriority, '5-LOW'), 'none')  AS pri
FROM orders
""",
    category=CAT,
)
def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / greatest / least — SURVEY.md §2.8 row 17."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("unknown")).alias(
            "st"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(200000.0)).alias("hi"),
        F.least(F.col("o_totalprice"), F.lit(200000.0)).alias("lo"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")), F.lit("none")
        ).alias("pri"),
    )


@op(
    "error_safe_funcs",
    oracle="""
SELECT o_orderkey,
       TRY_CAST(o_orderpriority AS INTEGER) AS pri_int,
       TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER) AS pri_num,
       CASE WHEN o_custkey % 3 = 0 THEN NULL
            ELSE round(o_totalprice / (o_custkey % 3), 4) END AS per_unit,
       string_split(o_orderpriority, '-')[99] AS oob_elem
FROM orders
""",
    category=CAT,
)
def error_safe_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe evaluation under ANSI mode (Spark 4 defaults ANSI on,
    where bad casts / div-by-zero / out-of-bounds THROW): try_cast,
    try_divide, try_element_at return NULL instead — the semantics a
    quarantine-style pipeline needs to not die on one bad record.
    DuckDB mirrors via TRY_CAST / CASE guard / permissive indexing."""
    o = load(spark, sf_dir, "orders")
    denom = F.col("o_custkey") % 3
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("pri_int"),
        F.split(F.col("o_orderpriority"), "-").getItem(0).try_cast("int").alias(
            "pri_num"
        ),
        F.round(F.try_divide(F.col("o_totalprice"), denom), 4).alias("per_unit"),
        F.try_element_at(F.split(F.col("o_orderpriority"), "-"), F.lit(99)).alias(
            "oob_elem"
        ),
    )


@op(
    "json_variant_ops",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
       CAST(json_extract(props, '$.k') AS INTEGER) > 50 AS is_large
FROM events
""",
    category=CAT,
)
def json_variant_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType semi-structured path: parse_json ->
    variant_get typed extraction — the successor to string-based
    get_json_object (binary variant encoding, no re-parse per access).
    Oracle uses DuckDB's JSON extraction on the same column."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "int")
    return ev.select(
        "event_id",
        k.alias("k_int"),
        (k > 50).alias("is_large"),
    )


@op(
    "map_higher_order",
    oracle="""
WITH per_type AS (
  SELECT user_id, event_type, round(sum(value), 2) AS total
  FROM events WHERE event_type IS NOT NULL GROUP BY user_id, event_type
)
SELECT user_id,
       CAST(count(*) AS BIGINT)                                   AS n_types,
       CAST(count(CASE WHEN total > 100 THEN 1 END) AS BIGINT)    AS big_types,
       round(sum(total), 2)                                       AS all_total
FROM per_type GROUP BY user_id
""",
    category=CAT,
)
def map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: build MapType event_type->total,
    then size / map_filter / aggregate-over-values — MapType analytics
    without exploding back to rows.  Oracle expresses the same answers
    relationally (map internals are not portable across engines,
    §2.8 map_from_entries note)."""
    # NULL event_type excluded before map construction in BOTH
    # engines (NULL_MAP_KEY — same contract as map_from_entries)
    ev = load(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    per_type = ev.groupBy("user_id", "event_type").agg(
        r2(F.sum("value")).alias("total")
    )
    maps = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "total"))
        ).alias("m")
    )
    return maps.select(
        "user_id",
        bigint(F.size("m")).alias("n_types"),
        bigint(F.size(F.map_filter(F.col("m"), lambda k, v: v > 100))).alias(
            "big_types"
        ),
        # SQL-aggregate NULL semantics for the HOF fold: sum() skips
        # NULL addends (a NULL-value event leaves a NULL per-type
        # total), while acc + NULL would poison the whole fold; an
        # all-NULL value set stays NULL like SQL sum (round-8
        # NULL-payload sweep)
        F.when(
            F.size(F.filter(F.map_values("m"), lambda x: x.isNotNull())) == 0,
            F.lit(None).cast("double"),
        )
        .otherwise(
            r2(
                F.aggregate(
                    F.filter(F.map_values("m"), lambda x: x.isNotNull()),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
        )
        .alias("all_total"),
    )


_VOCAB = ["join", "filter", "window", "spark", "merge", "batch", "data", "query"]
_VOCAB_SQL = "[" + ", ".join(f"'{w}'" for w in _VOCAB) + "]"


@op(
    "array_set_ops",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         list_distinct(string_split(text, ' ')) AS toks,
         {_VOCAB_SQL} AS vocab
  FROM documents
)
SELECT doc_id,
       CASE WHEN toks IS NULL THEN NULL
            ELSE coalesce(array_to_string(list_sort(list_intersect(toks, vocab)),
                                          ','), '') END AS inter,
       CAST(CASE WHEN toks IS NULL THEN NULL
            ELSE len(list_distinct(list_concat(toks, vocab))) END
            AS BIGINT) AS n_union,
       CAST(len(list_filter(toks, x -> NOT list_contains(vocab, x)))
            AS BIGINT) AS n_except
FROM t
""",
    category=CAT,
)
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra against a literal vocabulary:
    intersect / union / except with explicit distinct+sort
    normalization on both engines (Spark's array_* set fns dedup;
    DuckDB's list fns are normalized to match).  The intersection is
    projected comma-joined — the driver's pandas canonicalizer cannot
    sort raw ArrayType cells.  Map-only — no shuffle; at 100 TB this
    is a pure codegen projection pass."""
    docs = load(spark, sf_dir, "documents")
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    toks = F.array_distinct(F.split(F.col("text"), " "))
    return docs.select(
        "doc_id",
        F.array_join(F.sort_array(F.array_intersect(toks, vocab)), ",").alias(
            "inter"
        ),
        bigint(F.size(F.array_union(toks, vocab))).alias("n_union"),
        bigint(F.size(F.array_except(toks, vocab))).alias("n_except"),
    )


@op(
    "str_encode_hex_base64",
    oracle="""
SELECT c_custkey,
       lower(hex(c_name)) AS name_hex,
       to_base64(encode(c_name)) AS name_b64,
       CAST(bit_count(c_custkey) AS BIGINT) AS key_bits
FROM customer
""",
    category=CAT,
)
def str_encode_hex_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encodings of strings/ints: hex (case-normalized — Spark
    emits uppercase, DuckDB upper too, lower() both), RFC-4648 base64
    (no line wrapping in either engine), and popcount of the integer
    key.  Map-only projection."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower(F.hex(F.col("c_name"))).alias("name_hex"),
        F.base64(F.col("c_name").cast("binary")).alias("name_b64"),
        F.expr("CAST(bit_count(c_custkey) AS BIGINT)").alias("key_bits"),
    )
