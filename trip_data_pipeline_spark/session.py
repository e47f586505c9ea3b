"""SparkSession factory (SURVEY.md §7 M0).

One shared session for tests/bench: JVM startup dominates at small scale
(SURVEY.md §6), and the settings below are the 100-TB-minded defaults:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  broadcast conversion from observed sizes).
- Arrow on (JVM->Python collection via Arrow IPC batches).
- shuffle.partitions sized to cores, not the 200 default — at cluster
  scale this would be set ~2-3x total cores / autotuned by AQE.
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle (naive-UTC).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession


def parse_extra_conf(extra: str) -> list[tuple[str, str]]:
    """Parse SPARK_GRAFT_EXTRA_CONF ('k=v;k=v').  Values may not
    contain ';' (the separator — no escaping).  Malformed entries (no
    '=', or an empty key) raise rather than silently becoming `k=''`
    (ADVICE r2/r3 hygiene item; unit-tested in test_edges.py)."""
    out: list[tuple[str, str]] = []
    for kv in filter(None, (s.strip() for s in extra.split(";"))):
        if "=" not in kv:
            raise ValueError(
                f"SPARK_GRAFT_EXTRA_CONF entry {kv!r} has no '='; "
                "expected 'k=v;k=v' (values may not contain ';')"
            )
        k, _, v = kv.partition("=")
        if not k.strip():
            raise ValueError(
                f"SPARK_GRAFT_EXTRA_CONF entry {kv!r} has an empty key"
            )
        out.append((k.strip(), v.strip()))
    return out


def get_session(app_name: str = "trip-data-pipeline-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # 16 measured fastest for the sf0.1 bench on this box (vs 8/32);
    # a real cluster deployment sets ~2-3x total cores and lets AQE
    # coalesce down — this knob is local-mode-scale only.
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "16")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # Tuning escape hatch: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" applies
    # additional session confs (used by bench experiments; a cluster
    # deployment would set these in spark-defaults instead).  Applied
    # keys are logged to stderr because they can override the pinned
    # defaults above (e.g. the UTC session timezone the oracle needs).
    applied = []
    for k, v in parse_extra_conf(os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")):
        builder = builder.config(k, v)
        applied.append(k)
    if applied:
        print(f"[session] SPARK_GRAFT_EXTRA_CONF applied: {applied}", file=sys.stderr)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
