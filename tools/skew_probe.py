"""Skew-join evidence probe (VERDICT r2 item 7 / docs/SCALE.md).

Builds a deterministically skewed join at the 10x scale
(/tmp/scale_probe_sf1 events, 1M rows): fact key k where 40% of all
rows share k=0 (the classic hot-key distribution), joined to a
10-rows-per-key build side (output ~10M rows to a noop sink).  Three
executions of the SAME logical join:

  A. shuffle join, AQE skew-join splitting OFF  — the hot key's
     partition serializes on one task;
  B. shuffle join, AQE skew-join splitting ON   — AQE splits the hot
     partition at runtime (executed plan shows ``skew=true``);
  C. manually salted join (the join_skew_salted pattern: fact adds
     salt = event_id % 8, build side explodes x8).

plus the correctness check that unsalted and salted produce identical
per-key aggregates.  Two measurement-honesty notes:

- The timed query is the bare join (no groupBy on the join key): AQE
  will NOT split a skewed partition when a downstream operator needs
  the join's hashpartitioning (it would have to re-shuffle — see
  ``forceOptimizeSkewedJoin``), which is itself a scale lesson: keyed
  skew mitigation composes with a FOLLOWING aggregation only if the
  agg key differs, partial aggs absorb the skew, or you opt into the
  forced extra shuffle.
- The equivalence check sums integer cents (floor(x*100+0.5) as
  BIGINT), not doubles: the hot key aggregates ~4M doubles whose
  sum-order noise (~1e-13 relative) otherwise flips the 2-dp rounding
  — integer sums are order-exact, so salted == unsalted exactly.

Broadcast is disabled for the probe (autoBroadcastJoinThreshold=-1):
at 100 TB the build side of a skewed join is routinely over the
broadcast threshold — locally we must disable it or Spark (correctly)
broadcasts the small side and no shuffle join exists to skew.  The AQE
skew thresholds are scaled down to match the scaled-down data (the hot
partition here is ~1-2 MB of compressed shuffle bytes; the defaults
only split >256 MB partitions): a real cluster keeps the defaults and
sees the same behavior at its own scale.

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

SRC = os.environ.get("PROBE_SRC", "/tmp/scale_probe_sf1")
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
    """10 rows per key, 300 keys — modeling a build side too big to
    broadcast at real scale (broadcast is disabled in the probe)."""
    return (
        load(spark, SRC, "orders")
        .filter(F.col("o_orderkey") <= 3000)
        .select(
            (F.col("o_orderkey") % 300).alias("k"),
            F.col("o_totalprice").alias("price"),
        )
    )


def join_unsalted(spark):
    return fact(spark).join(build_side(spark), "k").select(
        "k", "event_id", "value", "price"
    )


def join_salted(spark):
    f = fact(spark).withColumn("salt", (F.col("event_id") % NSALT).cast("int"))
    b = build_side(spark).withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(NSALT)]))
    )
    return f.join(b, ["k", "salt"]).select("k", "event_id", "value", "price")


def agg_cents(df):
    """Order-exact per-key aggregate: counts + integer-cent sums."""
    cents = F.floor(F.col("value") * 100 + 0.5) + F.floor(F.col("price") * 100 + 0.5)
    return df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).cast("bigint").alias("total_cents"),
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
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    out = {}

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    join_unsalted(spark).write.format("noop").mode("overwrite").save()  # warm
    out["unsalted_skewjoin_off_s"] = timed(join_unsalted(spark))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    df_on = join_unsalted(spark)
    out["unsalted_skewjoin_on_s"] = timed(df_on)
    # the noop write executes a CLONE of the df's QueryExecution, so
    # the AQE-final plan (with the skew markers) must be read from the
    # SQL status store, not from df_on's own (never-executed) plan
    time.sleep(1)
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    plan = execs.apply(execs.size() - 1).physicalPlanDescription()
    out["skew_split_fired"] = "skew=true" in plan

    out["salted_s"] = timed(join_salted(spark))

    rows_a = sorted(tuple(r) for r in agg_cents(join_unsalted(spark)).collect())
    rows_c = sorted(tuple(r) for r in agg_cents(join_salted(spark)).collect())
    out["salted_equals_unsalted"] = rows_a == rows_c
    out["n_groups"] = len(rows_a)
    out["join_rows"] = int(sum(r[1] for r in rows_a))
    out["hot_key_share"] = round(
        fact(spark).filter(F.col("k") == 0).count() / fact(spark).count(), 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
