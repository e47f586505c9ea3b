"""Scaling probe (docs/SCALE.md evidence): replicate the sf0.1 fixtures
10x into /tmp (6M lineitem / 1.5M orders / 1M events rows, keys shifted
so cardinalities scale realistically), then time representative
operators at both scales.  Near-linear wall-clock growth (<<10x at 10x
data on fixed cores = the fixed per-stage overhead amortizing) is the
evidence that the plans are work-bound, not overhead-bound, and
partition correctly.

Usage: python tools/scale_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trip_data_pipeline_spark import get_session
from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.registry import OPS, queries

SRC = os.environ.get("PROBE_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("PROBE_DST", "/tmp/scale_probe_sf1")
COPIES = int(os.environ.get("PROBE_COPIES", "10"))
NFILES = int(os.environ.get("PROBE_NFILES", "16"))

PROBE_QUERIES = [
    "agg_pricing_summary",
    "join_star_5way",
    "sessionize_batch",
    "win_topk_per_group",
    "dedup_exact_hash",
    "text_term_freq",
    "graph_connected_components",
    "q21_suppliers_kept_waiting",
    "pipeline_training_data_prep",
    "layout_zorder_cluster",
    # round-1 final tranches
    "interval_merge_overlaps",
    "events_markov_transition",
    "basket_pair_affinity",
    "orders_backlog_sweep",
    "dedup_cluster_canonical",
    "kmeans_lloyd_int",
    # round-2 corpus-curation tranche
    "corpus_boilerplate_ngram_prune",
    "eval_contamination_ngram",
    "text_repetition_metrics",
    "pack_sequences_greedy",
    "sim_ann_lsh_hyperplane",
    # round-3 tranche
    "bpe_pair_counts",
    "lm_bigram_condprob",
    "text_entropy_char",
    "doc_overlap_chain",
    "multimodal_ppm_channel_stats",
    "sim_cosine_topk_vectorized",
    # round-3 §2.18 tranche
    "graph_triangle_count",
    "lm_doc_quality_ppm",
    "corpus_ngram_novelty",
    "sessionize_gap_and_cap",
    "timeseries_seasonal_residual",
    "ids_global_contiguous",
    "agg_bitmap_distinct",
    "geo_nearest_hub",
    "udf_map_in_arrow",
    "graph_bfs_distance",
    "graph_label_propagation",
    "interval_max_concurrency",
    "geo_fence_dwell_time",
    "timeseries_cusum_drift",
    "corpus_quality_ensemble_gate",
    "bpe_apply_merge_recount",
    "sim_ann_recall_eval",
]


def build(spark) -> None:
    """Fact tables are written as 16 files (round-robin repartition)
    so the replicated layout models a real multi-split table: a
    single-file single-row-group fact makes every downstream shuffle
    single-MAPPER, which silently disables AQE skew-partition
    splitting (splits happen at mapper granularity) and serializes
    scans — neither happens on a real 100 TB table."""
    if os.path.exists(f"{DST}/_DONE"):
        return
    os.makedirs(DST, exist_ok=True)
    copies = F.explode(F.array(*[F.lit(i) for i in range(COPIES)])).alias("cp")
    # The sf0.1 source tables are single parquet files = single scan
    # splits, so without a pre-split the COPIES-x explode (and the
    # map side of the repartition(NFILES) shuffle behind the write)
    # runs in ONE task — fine at 10x, a single-core wall at 1000x
    # (1B exploded events through one mapper).  Widening the source
    # BEFORE the explode keeps the replication embarrassingly
    # parallel; a round-robin repartition does not change content.
    pre = spark.sparkContext.defaultParallelism

    def wide(df):
        return df.repartition(pre)

    o = wide(load(spark, SRC, "orders"))
    n_orders = o.count()
    (
        o.select("*", copies)
        .select(
            (F.col("o_orderkey") + F.col("cp") * n_orders).alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .repartition(NFILES)
        .write.mode("overwrite")
        .parquet(f"{DST}/orders.parquet")
    )
    li = wide(load(spark, SRC, "lineitem"))
    (
        li.select("*", copies)
        .select(
            (F.col("l_orderkey") + F.col("cp") * n_orders).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .repartition(NFILES)
        .write.mode("overwrite")
        .parquet(f"{DST}/lineitem.parquet")
    )
    ev = wide(load(spark, SRC, "events"))
    n_events = ev.count()
    (
        ev.select("*", copies)
        .select(
            (F.col("event_id") + F.col("cp") * n_events).alias("event_id"),
            # shift each copy by cp seconds: preserves per-user session
            # structure while keeping events distinct in time
            F.expr("timestamp_micros(unix_micros(ts) + cp * 1000000)").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .repartition(NFILES)
        .write.mode("overwrite")
        .parquet(f"{DST}/events.parquet")
    )
    # documents/embeddings are "facts" for the text/dedup/sim ops —
    # scale them too (ids shifted per copy, text/vec payloads repeat)
    docs = wide(load(spark, SRC, "documents"))
    n_docs = docs.count()
    (
        docs.select("*", copies)
        .select(
            (F.col("doc_id") + F.col("cp") * n_docs).alias("doc_id"),
            *[c for c in docs.columns if c != "doc_id"],
        )
        .repartition(NFILES)
        .write.mode("overwrite")
        .parquet(f"{DST}/documents.parquet")
    )
    emb = wide(load(spark, SRC, "embeddings"))
    n_emb = emb.count()
    (
        emb.select("*", copies)
        .select(
            (F.col("vec_id") + F.col("cp") * n_emb).alias("vec_id"),
            *[c for c in emb.columns if c != "vec_id"],
        )
        .repartition(NFILES)
        .write.mode("overwrite")
        .parquet(f"{DST}/embeddings.parquet")
    )
    # small dims: copy as-is (dims don't scale with the fact tables)
    for t in ["region", "nation", "customer", "supplier", "part"]:
        load(spark, SRC, t).write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    open(f"{DST}/_DONE", "w").close()


def time_query(spark, name: str, sf_dir: str) -> float:
    fn = OPS[name].fn

    def run() -> None:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    run()  # warm
    t0 = time.perf_counter()
    run()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    queries()
    spark = get_session("scale-probe")
    build(spark)
    probe = PROBE_QUERIES
    if os.environ.get("PROBE_QUERIES"):
        probe = os.environ["PROBE_QUERIES"].split(",")
    out = {"copies": COPIES, "src": SRC, "dst": DST, "queries": {}}
    for name in probe:
        t_small = time_query(spark, name, SRC)
        t_big = time_query(spark, name, DST)
        out["queries"][name] = {
            "sf0.1_sec": t_small,
            "x10_sec": t_big,
            "scaling": round(t_big / t_small, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
