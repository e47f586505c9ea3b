"""Skew-join evidence probe (VERDICT r2 item 7 / docs/SCALE.md).

Builds a deterministically skewed join at the 10x scale
(/tmp/scale_probe_sf1 events, 1M rows): fact key k where 40% of all
rows share k=0 (the classic hot-key distribution), joined to a 10-rows
-per-key build side, aggregated.  Three executions of the SAME logical
query:

  A. shuffle join, AQE skew-join splitting OFF  — the hot key's
     partition serializes on one task;
  B. shuffle join, AQE skew-join splitting ON   — AQE splits the hot
     partition at runtime (executed plan shows ``skew=true``);
  C. manually salted join (the join_skew_salted pattern: fact adds
     salt = event_id % 8, build side explodes x8).

plus the correctness check that all three produce identical results.

Broadcast is disabled for the probe (autoBroadcastJoinThreshold=-1):
at 100 TB the build side of a skewed join is routinely over the
broadcast threshold — locally we must disable it or Spark (correctly)
broadcasts the small side and no shuffle join exists to skew.  The AQE
skew thresholds are scaled down to match the scaled-down data (the hot
partition here is ~10 MB; the defaults only split >256 MB partitions):
a real cluster keeps the defaults and sees the same behavior at its
own scale.

Usage: python tools/skew_probe.py   (prints one JSON line)
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

SRC = "/tmp/scale_probe_sf1"
NSALT = 8


def fact(spark):
    """1M-row fact with a 40%-hot key: k=0 for event_id%10<4, else a
    hashed spread over 300 keys (all deterministic)."""
    return load(spark, SRC, "events").select(
        F.when(F.col("event_id") % 10 < 4, F.lit(0))
        .otherwise((F.col("user_id") * 7919) % 300)
        .alias("k"),
        "event_id",
        "value",
    )


def build_side(spark):
    """10 rows per key, 300 keys — too big to salt-free broadcast at
    real scale (here broadcast is disabled to model that)."""
    return (
        load(spark, SRC, "orders")
        .filter(F.col("o_orderkey") <= 3000)
        .select(
            (F.col("o_orderkey") % 300).alias("k"),
            F.col("o_totalprice").alias("price"),
        )
    )


def unsalted(spark):
    f, b = fact(spark), build_side(spark)
    return (
        f.join(b, "k")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value") + F.col("price")), 2).alias("total"),
        )
    )


def salted(spark):
    f = fact(spark).withColumn("salt", (F.col("event_id") % NSALT).cast("int"))
    b = build_side(spark).withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(NSALT)]))
    )
    return (
        f.join(b, ["k", "salt"])
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value") + F.col("price")), 2).alias("total"),
        )
    )


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_session("skew-probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # scale the skew thresholds to the scaled-down data (see module doc)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    out = {}

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    unsalted(spark).write.format("noop").mode("overwrite").save()  # warm
    out["unsalted_skewjoin_off_s"] = timed(unsalted(spark))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    df_on = unsalted(spark)
    out["unsalted_skewjoin_on_s"] = timed(df_on)
    plan = df_on._jdf.queryExecution().executedPlan().toString()
    out["skew_split_fired"] = "skew=true" in plan

    out["salted_s"] = timed(salted(spark))

    rows_a = sorted(tuple(r) for r in unsalted(spark).collect())
    rows_c = sorted(tuple(r) for r in salted(spark).collect())
    out["salted_equals_unsalted"] = rows_a == rows_c
    out["n_groups"] = len(rows_a)
    out["hot_key_share"] = round(
        fact(spark).filter(F.col("k") == 0).count() / fact(spark).count(), 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
