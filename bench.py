"""Benchmark harness (BASELINE.md / SURVEY.md §6).

Runs the headline query set at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], warm shared session, and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} plus drift-protocol fields
(round 11, VERDICT r10 item 2): "load_1m_at_start" /
"load_1m_after_gate" (1-minute loadavg before and after the bounded
quiet-host wait), "reps" and per-query "spread" (max-min over the
timed reps) — so a noisy-host day is visible INSIDE the artifact
instead of being inferred from round-over-round swings (the r9/r10
sf0.1 totals moved 4.4 <-> 6.9 s on host drift alone).

Protocol (strengthened round 12, VERDICT r11 item 6: BENCH_r11 passed
the old 1-min-only gate at 1.92 while the 5-min load was still ~8.8
and the official total read 63% over a quiet-host re-run of the same
code): bounded wait until BOTH the 1-min load < BENCH_LOAD_GATE
(default 2.0) AND the 5-min load < BENCH_LOAD_GATE_5M (default 3.0),
SUSTAINED — a second sample 30 s later must also pass, else the wait
resumes (the 1-min average dips below 2.0 long before page cache and
CPU queues actually drain).  Bounded at 8 min total — a persistently
busy host proceeds anyway and the recorded loads say so.  Then 1
warm-up execution per query and THREE timed runs; report the min (the
least-interfered run) and the spread.  Execution = full plan to a
no-op sink (df.write format noop) so nothing is skipped by lazy
collection, mirroring DuckDB's fetchall materialization without
Python transfer overhead.

Env:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] (default *)
  BENCH_LOAD_GATE      1-min loadavg threshold for the quiet-host wait
                       (default 2.0; 0 disables the wait)
  BENCH_LOAD_GATE_5M   5-min loadavg threshold (default 3.0) — both
                       averages must clear their gate, twice, 30 s
                       apart, before timing starts
  BENCH_REPS           timed reps per query (default 3)
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


def _timed(run, reps: int) -> tuple[float, float]:
    """(min, max-min spread) over `reps` timed executions."""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return round(min(times), 3), round(max(times) - min(times), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("BENCH_REPS", "3"))
    gate = float(os.environ.get("BENCH_LOAD_GATE", "2.0"))

    gate5 = float(os.environ.get("BENCH_LOAD_GATE_5M", "3.0"))

    # Quiet-host gate BEFORE the JVM comes up: a still-draining box
    # (writeback, a just-killed sweep's python workers) inflates the
    # first timed runs 2-3x.  Round 12: the 1-min average alone is too
    # weak — it dips under 2.0 while the box is still draining (judge
    # measured 1-min 0.33 with 5-min at 8.8, and the r11 official
    # total read 63% over a quiet-host re-run) — so BOTH averages must
    # clear their gate on TWO samples 30 s apart.  Bounded at 8 min —
    # a persistently busy host is recorded, not waited out forever.
    l1, l5 = os.getloadavg()[0], os.getloadavg()[1]
    load_start, load5_start = round(l1, 2), round(l5, 2)
    gate_t0 = time.time()
    if gate > 0:
        def quiet() -> bool:
            a, b, _ = os.getloadavg()
            return a < gate and b < gate5

        while time.time() - gate_t0 < 480:
            if not quiet():
                time.sleep(5)
                continue
            time.sleep(30)  # sustained: must still be quiet 30 s later
            if quiet():
                break
    gate_waited = round(time.time() - gate_t0, 1)
    l1, l5, _ = os.getloadavg()
    load_after, load5_after = round(l1, 2), round(l5, 2)

    from trip_data_pipeline_spark import get_session
    from trip_data_pipeline_spark.registry import OPS, queries

    queries()
    spark = get_session("bench")

    results: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = OPS[name].fn

        def run() -> None:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        run()  # warm-up: JVM/code-gen/file-listing caches
        results[name], spreads[name] = _timed(run, reps)

    total = round(sum(results.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": results,
                "spread": spreads,
                "reps": reps,
                "load_1m_at_start": load_start,
                "load_5m_at_start": load5_start,
                "load_1m_after_gate": load_after,
                "load_5m_after_gate": load5_after,
                "gate_waited_s": gate_waited,
                "sf": _sf_of(sf_dir),
            }
        )
    )

    if os.environ.get("BENCH_DUCKDB") == "1":
        from tests.oracle import duck_connect

        con = duck_connect(sf_dir)
        duck: dict[str, float] = {}
        dspread: dict[str, float] = {}
        for name in BENCH_QUERIES:
            sql = OPS[name].oracle
            if sql is None:
                continue
            con.execute(sql).fetchall()  # warm
            duck[name], dspread[name] = _timed(
                lambda: con.execute(sql).fetchall(), reps
            )
        print(
            json.dumps(
                {
                    "metric": "duckdb_oracle_total_runtime",
                    "value": round(sum(duck.values()), 3),
                    "unit": "sec",
                    "queries": duck,
                    "spread": dspread,
                    "reps": reps,
                    "sf": _sf_of(sf_dir),
                }
            )
        )


if __name__ == "__main__":
    main()
