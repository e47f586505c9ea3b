"""Benchmark harness (BASELINE.md / SURVEY.md §6).

Runs the headline query set at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], warm shared session, and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Protocol: 1 warm-up execution per query, then 2 timed runs, report the
min.  Execution = full plan to a no-op sink (df.write format noop) so
nothing is skipped by lazy collection, mirroring DuckDB's fetchall
materialization without Python transfer overhead.

Env:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] (default *)
  BENCH_DUCKDB=1       also time the DuckDB oracle per query (prints a
                       second JSON line, used to fill BASELINE.md)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "agg_pricing_summary",
    "join_star_5way",
    "join_theta_band",
    "win_topk_per_group",
    "agg_grouping_sets",
    "sessionize_batch",
    "text_term_freq",
    "sim_cosine_pairwise_topk",
    "dedup_exact_hash",
    "limit_topk",
]


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from trip_data_pipeline_spark import get_session
    from trip_data_pipeline_spark.registry import OPS, queries

    queries()
    spark = get_session("bench")

    results: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = OPS[name].fn

        def run() -> None:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        run()  # warm-up: JVM/code-gen/file-listing caches
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        results[name] = round(min(times), 3)

    total = round(sum(results.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": _sf_of(sf_dir),
            }
        )
    )

    if os.environ.get("BENCH_DUCKDB") == "1":
        from tests.oracle import duck_connect

        con = duck_connect(sf_dir)
        duck: dict[str, float] = {}
        for name in BENCH_QUERIES:
            sql = OPS[name].oracle
            if sql is None:
                continue
            con.execute(sql).fetchall()  # warm
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                times.append(time.perf_counter() - t0)
            duck[name] = round(min(times), 3)
        print(
            json.dumps(
                {
                    "metric": "duckdb_oracle_total_runtime",
                    "value": round(sum(duck.values()), 3),
                    "unit": "sec",
                    "queries": duck,
                    "sf": _sf_of(sf_dir),
                }
            )
        )


if __name__ == "__main__":
    main()
