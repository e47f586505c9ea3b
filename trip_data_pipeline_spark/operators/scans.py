"""§2.1 Scans, sources, sinks (SURVEY.md §2.1).

Scale notes: parquet scans get predicate pushdown, column pruning and
row-group skipping from Catalyst for free; the partitioned sink writes
the directory layout (partitionBy date) that enables partition pruning
at 100 TB — the publish step of the reference pipeline generalized.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import SCHEMAS, load, table_path
from trip_data_pipeline_spark.operators.common import (
    as_date,
    bigint,
    r2,
    range_parts,
    scratch_dir,
)
from trip_data_pipeline_spark.registry import op

CAT = "2.1 scans/sources/sinks"


@op(
    "scan_parquet",
    oracle="""
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
       CAST(l_shipdate AS DATE) AS l_shipdate
FROM lineitem
""",
    category=CAT,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table parquet scan, all columns — SURVEY.md §2.1 row 1.

    Raw doubles are bit-identical across engines (no aggregation);
    only the timestamp is normalized to DATE (§5.3 rule 2)."""
    li = load(spark, sf_dir, "lineitem")
    cols = [c for c in li.columns if c != "l_shipdate"]
    return li.select(*cols, as_date(F.col("l_shipdate")).alias("l_shipdate"))


@op(
    "scan_explicit_schema",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
    category=CAT,
)
def scan_explicit_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read with an explicit StructType (no inference) — SURVEY.md §2.1
    row 2."""
    return spark.read.schema(SCHEMAS["customer"]).parquet(
        table_path(sf_dir, "customer")
    )


@op(
    "scan_multi_sf_union",
    oracle="""
SELECT c_name AS name, 'customer' AS src, c_acctbal AS acctbal FROM customer
UNION ALL
SELECT s_name AS name, 'supplier' AS src, s_acctbal AS acctbal FROM supplier
""",
    category=CAT,
)
def scan_multi_sf_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two files unioned by name — multi-feed ingestion — SURVEY.md §2.1
    row 3."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.lit("customer").alias("src"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("src"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionByName(s)


@op(
    "sink_parquet_partitioned",
    oracle="""
SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY 1
""",
    category=CAT,
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write partitioned-by-year parquet, read back, count per partition
    — SURVEY.md §2.1 row 4.

    Hash-checked since round 3: parquet round-trips losslessly, so the
    per-partition aggregate over the read-back directory must equal the
    same aggregate computed directly on the source table — the oracle
    verifies the write+read cycle end to end, not just that it ran.

    The partition column becomes the directory key: at 100 TB this
    layout gives static+dynamic partition pruning on the publish side.
    """
    out = scratch_dir(prefix="sink_parquet_")
    o = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year(as_date(F.col("o_orderdate")))
    )
    o.write.mode("overwrite").partitionBy("o_year").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.groupBy("o_year")
        .agg(bigint(F.count(F.lit(1))).alias("n"), r2(F.sum("o_totalprice")).alias("total"))
    )


@op(
    "sink_csv_roundtrip",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands,
       round(sum(p_retailprice), 2) AS total_price
FROM part
""",
    category=CAT,
)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV publish + schema-on-read ingest round trip — SURVEY.md §2.1
    row 5.

    Hash-checked since round 3: Spark writes doubles via Java's
    shortest-round-trip Double.toString and parses them back exactly,
    so the post-roundtrip aggregate must equal the source-table
    aggregate — a lossy CSV cycle would hash-mismatch."""
    out = scratch_dir(prefix="sink_csv_")
    p = load(spark, sf_dir, "part")
    p.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(SCHEMAS["part"]).option("header", True).csv(out)
    return back.agg(
        bigint(F.count(F.lit(1))).alias("n"),
        bigint(F.countDistinct("p_brand")).alias("n_brands"),
        r2(F.sum("p_retailprice")).alias("total_price"),
    )


@op(
    "scan_json_props",
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1
""",
    category=CAT,
)
def scan_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column parsed with an explicit schema —
    SURVEY.md §2.1 row 6."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(F.from_json(F.col("props"), "k INT").getField("k").alias("k"))
        .groupBy("k")
        .agg(bigint(F.count(F.lit(1))).alias("n"))
    )


@op(
    "scan_csv_options",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       o_totalprice
FROM orders
""",
    category=CAT,
)
def scan_csv_options(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-default CSV dialect round trip, hash-checked against the
    source table: '|' delimiter, explicit null token, header, explicit
    schema on read (no inference — inference is a full extra pass at
    scale).  Doubles survive exactly because Spark's CSV writer emits
    shortest-roundtrip decimal strings; the oracle is simply the
    original table, so the whole write+read dialect path must be
    lossless."""
    out = scratch_dir(prefix="scan_csv_opts_")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_totalprice",
    )
    (
        o.write.mode("overwrite")
        .option("header", True)
        .option("sep", "|")
        .option("nullValue", "\\N")
        .csv(out)
    )
    return (
        spark.read.schema(
            "o_orderkey bigint, o_orderstatus string, o_orderdate date, o_totalprice double"
        )
        .option("header", True)
        .option("sep", "|")
        .option("nullValue", "\\N")
        .csv(out)
    )


@op(
    "layout_partition_sort",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
FROM orders WHERE extract(year FROM o_orderdate) = 1995
""",
    category=CAT,
)
def layout_partition_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-side data layout: range-repartition by (year, custkey),
    sort within partitions, write partitioned-by-year parquet; read
    back one partition.  Hash-checked lossless vs a direct filter of
    the source.  At 100 TB this is the publish layout that makes the
    read side cheap: directory-level partition pruning on o_year
    (asserted in tests/test_plans.py) plus clustered o_custkey so
    parquet row-group min/max statistics prune within files."""
    out = scratch_dir(prefix="layout_psort_")
    o = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year(as_date(F.col("o_orderdate")))
    )
    (
        # Session-derived write fan-out (same fixed-parallelism class
        # as scan_parquet_row_group_prune, VERDICT r8 item 6): values
        # and pruning are layout-local, the count is parallelism only.
        o.repartitionByRange(range_parts(spark), "o_year", "o_custkey")
        .sortWithinPartitions("o_year", "o_custkey")
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("o_year") == 1995)
    return back.select(
        "o_orderkey", "o_custkey", r2(F.col("o_totalprice")).alias("o_totalprice")
    )


def _duck_zval() -> str:
    """DuckDB-side 16-bit Morton (z-order) interleave of
    (o_custkey % 256, floor(o_totalprice/2000) % 256)."""
    xs = "(o_custkey % 256)"
    ys = "(CAST(floor(o_totalprice / 2000) AS BIGINT) % 256)"
    terms = []
    for i in range(8):
        terms.append(f"((({xs} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ys} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _spark_zval():
    """Spark-side Morton interleave, same bit layout as _duck_zval."""
    xs = F.col("o_custkey") % 256
    ys = F.floor(F.col("o_totalprice") / 2000).cast("bigint") % 256
    z = F.lit(0)
    for i in range(8):
        z = z + F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


@op(
    "layout_zorder_cluster",
    oracle=f"""
WITH z AS (SELECT o_custkey, {_duck_zval()} AS zval FROM orders)
SELECT CAST(zval // 1024 AS BIGINT)      AS z_bucket,
       CAST(count(*) AS BIGINT)          AS n,
       CAST(min(o_custkey) AS BIGINT)    AS min_custkey,
       CAST(max(o_custkey) AS BIGINT)    AS max_custkey,
       CAST(min(zval) AS BIGINT)         AS min_z,
       CAST(max(zval) AS BIGINT)         AS max_z
FROM z GROUP BY 1 ORDER BY z_bucket
""",
    category=CAT,
)
def layout_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional clustering key: 16-bit Morton (z-order)
    interleave of two dimensions, then per-z-range stats.  This is the
    Delta/Iceberg OPTIMIZE ZORDER layout primitive: range-partitioning
    on zval keeps BOTH o_custkey and o_totalprice locally dense in each
    file, so min/max statistics prune on either dimension.  The
    interleave is pure integer bit arithmetic — identical on both
    engines, hash-checked per bucket."""
    o = load(spark, sf_dir, "orders")
    z = o.select("o_custkey", _spark_zval().alias("zval"))
    return (
        z.groupBy((F.col("zval") / 1024).cast("bigint").alias("z_bucket"))
        .agg(
            bigint(F.count(F.lit(1))).alias("n"),
            bigint(F.min("o_custkey")).alias("min_custkey"),
            bigint(F.max("o_custkey")).alias("max_custkey"),
            bigint(F.min("zval")).alias("min_z"),
            bigint(F.max("zval")).alias("max_z"),
        )
        .orderBy("z_bucket")
    )


@op("layout_compact_small_files", oracle=None, category=CAT)
def layout_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: a 64-way fragmented events table is
    rewritten to 4 right-sized files with row-count parity asserted in
    the output.  The 100 TB housekeeping op — streaming ingest leaves
    thousands of small files per partition; periodic compaction
    restores scan efficiency (fewer tasks, bigger sequential reads).
    Rows-only: side-effecting."""
    import os as _os

    frag = scratch_dir(prefix="layout_frag_")
    compact = scratch_dir(prefix="layout_compact_")
    ev = load(spark, sf_dir, "events")
    ev.repartition(64).write.mode("overwrite").parquet(frag)
    n_files_before = len([f for f in _os.listdir(frag) if f.endswith(".parquet")])
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(compact)
    n_files_after = len([f for f in _os.listdir(compact) if f.endswith(".parquet")])
    back = spark.read.parquet(compact)
    return spark.createDataFrame(
        [(n_files_before, n_files_after, ev.count(), back.count())],
        "n_files_before int, n_files_after int, n_rows_src long, n_rows_compacted long",
    )


@op(
    "scan_schema_evolution_merge",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_qty,
       CAST(sum(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_price,
       CAST(sum(CASE WHEN l_orderkey % 2 = 0
                     THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
         AS total_qty,
       CAST(sum(CASE WHEN l_orderkey % 2 = 1
                     THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS total_price_cents
FROM lineitem
""",
    category=CAT,
)
def scan_schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two parquet generations with different
    column sets (an old writer without l_extendedprice, a new one
    without l_quantity) land in one directory; `mergeSchema=true`
    unifies them, null-filling the missing columns per file.  The
    oracle recomputes the same totals from the base table, so the
    merged read must be lossless.  At scale, schema merge costs one
    footer pass over files (not data) — the standard upgrade path when
    a pipeline adds columns without rewriting history."""
    li = load(spark, sf_dir, "lineitem")
    out = scratch_dir(prefix="schema_evo_")
    old_gen = li.filter(F.col("l_orderkey") % 2 == 0).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    new_gen = li.filter(F.col("l_orderkey") % 2 == 1).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    old_gen.write.mode("overwrite").parquet(f"{out}/gen=0")
    new_gen.write.mode("overwrite").parquet(f"{out}/gen=1")
    merged = spark.read.option("mergeSchema", True).parquet(f"{out}/gen=0", f"{out}/gen=1")
    return merged.agg(
        bigint(F.count("*")).alias("n_rows"),
        bigint(F.count("l_quantity")).alias("n_with_qty"),
        bigint(F.count("l_extendedprice")).alias("n_with_price"),
        bigint(F.sum(F.coalesce(F.col("l_quantity").cast("bigint"), F.lit(0)))).alias(
            "total_qty"
        ),
        bigint(
            F.sum(
                F.coalesce(
                    F.round(F.col("l_extendedprice") * 100).cast("bigint"), F.lit(0)
                )
            )
        ).alias("total_price_cents"),
    )


N_CORRUPT = 3


@op(
    "scan_csv_malformed_permissive",
    oracle=f"""
SELECT CAST(count(*) AS BIGINT) AS n_good,
       CAST({N_CORRUPT} AS BIGINT) AS n_corrupt,
       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
FROM nation
""",
    category=CAT,
)
def scan_csv_malformed_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record ingestion: a CSV publish of `nation` plus 3
    injected garbage lines, read back in PERMISSIVE mode with a
    `_corrupt_record` column — good rows parse, bad rows quarantine
    instead of failing the job.  The oracle pins the expected good /
    corrupt split against the base table.  This is the ingest contract
    a 100 TB pipeline needs at the edge: schema-on-read with explicit
    quarantine, never inference, never abort-on-first-error."""
    import os

    out = scratch_dir(prefix="csv_malformed_")
    n = load(spark, sf_dir, "nation")
    n.coalesce(1).write.mode("overwrite").csv(f"{out}/data")
    # NB: must not start with "_" or "." — Spark's file index skips
    # those as metadata/hidden files and the garbage would never load.
    with open(os.path.join(out, "data", "zz-garbage.csv"), "w") as fh:
        for i in range(N_CORRUPT):
            fh.write(f"not-a-key,garbage-row-{i},also-not-a-key\n")
    schema = (
        "n_nationkey int, n_name string, n_regionkey int, _corrupt_record string"
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(f"{out}/data")
        .cache()
    )
    good = back.filter(F.col("_corrupt_record").isNull())
    bad = back.filter(F.col("_corrupt_record").isNotNull())
    return good.agg(
        bigint(F.count("*")).alias("n_good"),
        bigint(F.sum("n_nationkey")).alias("key_sum"),
    ).crossJoin(bad.agg(bigint(F.count("*")).alias("n_corrupt"))).select(
        "n_good", "n_corrupt", "key_sum"
    )


# Deterministic region->event_type map shared by the op and its oracle
# (both engines derive the probe set from the SAME filtered dim).
_DPP_TYPES = ["click", "error", "purchase", "signup", "view"]


@op(
    "scan_partitioned_dpp",
    oracle=f"""
WITH dim AS (
  SELECT CASE r_regionkey
           WHEN 0 THEN '{_DPP_TYPES[0]}' WHEN 1 THEN '{_DPP_TYPES[1]}'
           WHEN 2 THEN '{_DPP_TYPES[2]}' WHEN 3 THEN '{_DPP_TYPES[3]}'
           ELSE '{_DPP_TYPES[4]}' END AS event_type,
         r_name
  FROM region WHERE r_regionkey IN (1, 3)
)
SELECT e.event_type, d.r_name,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(floor(e.value * 100 + 0.5)) AS BIGINT) AS value_cents
FROM events e JOIN dim d USING (event_type)
GROUP BY e.event_type, d.r_name
""",
    category=CAT,
)
def scan_partitioned_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact is published PARTITIONED BY
    event_type, the probe set comes from a FILTERED dim (not a literal
    predicate), and Catalyst injects the dim's join keys as a runtime
    PartitionFilter on the fact scan — only the matching partition
    directories are ever read (`dynamicpruningexpression` in the scan,
    locked in tests/test_plans.py).

    At 100 TB this is the difference between scanning 2 of 1000 date
    partitions and scanning them all when the date set comes from a
    lookup table: static pruning cannot see through the join, DPP
    reuses the broadcast dim to prune at file-listing time.  The
    partitioned publish uses the same layout as
    sink_parquet_partitioned; integer-cent sums keep the aggregate
    order-exact."""
    out = scratch_dir(prefix="dpp_events_")
    ev = load(spark, sf_dir, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    fact = spark.read.parquet(out)
    dim = load(spark, sf_dir, "region").filter(
        F.col("r_regionkey").isin(1, 3)
    ).select(
        F.element_at(
            F.array(*[F.lit(t) for t in _DPP_TYPES]),
            F.col("r_regionkey").cast("int") + 1,
        ).alias("event_type"),
        "r_name",
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    return (
        fact.join(F.broadcast(dim), "event_type")
        .groupBy("event_type", "r_name")
        .agg(
            bigint(F.count(F.lit(1))).alias("n"),
            bigint(F.sum(cents)).alias("value_cents"),
        )
    )
