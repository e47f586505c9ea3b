"""Time a single registered operator at a given SF with the noop sink
(optimization guide §1.4) — the per-op companion to op_sweep_r12.py.

Usage: python tools/time_op.py <op> [reps] [--plan out.txt]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trip_data_pipeline_spark import get_session, queries
from trip_data_pipeline_spark.registry import OPS


def main() -> int:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 3
    plan_out = None
    if "--plan" in sys.argv:
        plan_out = sys.argv[sys.argv.index("--plan") + 1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries()  # import side effect: registers all operators
    spark = get_session("time-op")
    spark.sparkContext.setJobDescription(f"time_op:{name}")
    fn = OPS[name].fn

    def run() -> None:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    if plan_out:
        df = fn(spark, sf_dir)
        with open(plan_out, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(f"plan -> {plan_out}")

    run()  # warm-up
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    print({"op": name, "min": round(min(times), 3),
           "times": [round(t, 3) for t in times], "sf_dir": sf_dir})
    return 0


if __name__ == "__main__":
    sys.exit(main())
