"""Round-13 decomposition probe for dedup_minhash_recall_eval at 10x.

Measures (noop sink, wall-clock):
  1. shingle document-frequency distribution + sum(df^2) by df decile
     (the truth arm's join-row count is sum over shingles of df^2)
  2. the truth arm alone
  3. the candidate arm alone
  4. the full op

Usage: python tools/mh_probe_r13.py /tmp/scale_probe_x10
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def t(label, df):
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    print(f"[probe] {label}: {dt:.2f}s", flush=True)
    return dt


def main():
    sf_dir = sys.argv[1]
    from trip_data_pipeline_spark import get_session
    from trip_data_pipeline_spark.io import load
    from trip_data_pipeline_spark.operators.dedup import SHINGLE_K, shingle_col
    from trip_data_pipeline_spark.operators.text_ops import _words
    from trip_data_pipeline_spark.registry import OPS, queries

    queries()
    spark = get_session("mh-probe-r13")
    spark.sparkContext.setJobDescription("mh_probe_r13")

    d3 = (
        load(spark, sf_dir, "documents")
        .select("doc_id", _words().alias("ws"))
        .filter(F.size("ws") >= SHINGLE_K)
    )
    sh = shingle_col(F.col("ws"))
    a = (
        d3.select(
            F.col("doc_id").alias("doc_id1"),
            F.coalesce(F.size(F.array_distinct(sh)), F.lit(0)).alias("n1"),
            F.explode(sh).alias("s"),
        )
        .distinct()
    )
    # 1. df distribution
    df_tab = a.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    stats = df_tab.agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("df").alias("index_rows"),
        F.sum(F.col("df") * F.col("df")).alias("sum_df2"),
        F.max("df").alias("max_df"),
        F.expr("percentile_approx(df, array(0.5,0.9,0.99,0.999), 10000)").alias("p"),
    ).collect()[0]
    print(f"[probe] shingles={stats['n_shingles']} index_rows={stats['index_rows']} "
          f"sum_df2={stats['sum_df2']} max_df={stats['max_df']} "
          f"p50/p90/p99/p999={stats['p']}", flush=True)
    # sum(df^2) contribution by df threshold
    for thr in (2, 5, 10, 20, 50, 100, 200, 500, 1000):
        row = df_tab.filter(F.col("df") > thr).agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.col("df") * F.col("df")), F.lit(0)).alias("s2"),
        ).collect()[0]
        print(f"[probe] df>{thr}: shingles={row['n']} sum_df2={row['s2']}", flush=True)

    # 2. truth arm
    b = a.select(F.col("doc_id1").alias("doc_id2"), F.col("n1").alias("n2"), "s")
    truth = (
        a.join(b, "s")
        .filter(
            (F.col("doc_id1") < F.col("doc_id2"))
            & (F.col("n2") <= 2 * F.col("n1"))
            & (F.col("n1") <= 2 * F.col("n2"))
        )
        .groupBy("doc_id1", "doc_id2", "n1", "n2")
        .agg(F.count(F.lit(1)).alias("i_"))
        .filter(2 * F.col("i_") >= F.col("n1") + F.col("n2") - F.col("i_"))
        .select("doc_id1", "doc_id2")
    )
    print(f"[probe] n_truth={truth.count()}", flush=True)
    t("truth arm (noop)", truth)

    # 3. cand arm
    from trip_data_pipeline_spark.operators.dedup import minhash_candidate_pairs
    t("cand arm (noop)", minhash_candidate_pairs(d3))

    # 4. full op
    fn = OPS["dedup_minhash_recall_eval"].fn
    t("full op (noop)", fn(spark, sf_dir))
    t("full op rep2 (noop)", fn(spark, sf_dir))


if __name__ == "__main__":
    main()
