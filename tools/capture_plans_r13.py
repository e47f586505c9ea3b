"""Capture `.explain("formatted")` for named operators into
plans/r13/<op>_<tag>.txt (optimization-round deliverable: the judge
checks plan claims against these files).

Usage: python tools/capture_plans_r13.py before|after [op1,op2,...]
Default op list: the bench.py headline set.
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trip_data_pipeline_spark import get_session
from trip_data_pipeline_spark.registry import OPS, queries


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    if len(sys.argv) > 2 and sys.argv[2].strip():
        names = [n for n in sys.argv[2].split(",") if n]
    else:
        from bench import BENCH_QUERIES

        names = list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    qs = queries()
    spark = get_session("capture-plans-r13")
    for name in names:
        df = OPS[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') @ {sf_dir} [{tag}]\n")
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
