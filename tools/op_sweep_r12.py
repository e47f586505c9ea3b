"""Round-12 per-op wall-clock sweep at sf0.1 (optimization guide §1:
measure first).  Times EVERY registered operator with the noop sink
(full computation, no sink cost — same methodology as bench.py) on a
warm session and writes one JSON file {op: {"sec": min_of_reps,
"spread": max-min, "reps": n}} so the optimization round can rank
operators by measured cost instead of guessing.

Streaming/side-effecting ops that cannot run through a cold noop write
are executed via their normal path and timed the same way; ops that
raise are recorded with "err".

Usage: python tools/op_sweep_r12.py [out.json] [reps]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trip_data_pipeline_spark import get_session
from trip_data_pipeline_spark.registry import OPS, queries


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/op_sweep_r12.json"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = queries()
    spark = get_session("op-sweep-r12")
    sc = spark.sparkContext

    results: dict[str, dict] = {}
    t_all = time.time()
    for i, name in enumerate(qs):
        fn = OPS[name].fn
        sc.setJobDescription(f"sweep:{name}")
        try:
            def run() -> None:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

            run()  # warm-up (listing caches, codegen, broadcast builds)
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                run()
                times.append(time.perf_counter() - t0)
            results[name] = {
                "sec": round(min(times), 3),
                "spread": round(max(times) - min(times), 3),
                "reps": reps,
            }
        except Exception as e:  # noqa: BLE001 — record and continue
            results[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
        finally:
            sc.setJobDescription(None)
        if (i + 1) % 25 == 0:
            print(f"[{i + 1}/{len(qs)}] {round(time.time() - t_all, 1)}s",
                  file=sys.stderr, flush=True)

    payload = {
        "sf_dir": sf_dir,
        "reps": reps,
        "total_wall_s": round(time.time() - t_all, 1),
        "ops": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    timed = {k: v["sec"] for k, v in results.items() if "sec" in v}
    print(json.dumps({
        "n_ops": len(results),
        "n_err": sum(1 for v in results.values() if "err" in v),
        "sum_sec": round(sum(timed.values()), 1),
        "top20": sorted(timed.items(), key=lambda kv: -kv[1])[:20],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
