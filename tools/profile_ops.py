"""Per-op 10x wall-clock profiler (docs/SCALE.md tranche-profile
protocol): run named registry operators against the replicated 10x
layout (built by tools/scale_probe.py, default /tmp/scale_probe_x10)
on a warm local[32] session and print one JSON line of
{op: {sec, rows}}.

"Warm" = the session is started and one throwaway query has run
before any timing, so JVM/codegen startup is excluded; each op is
timed as plan-construction + full count() materialization, same as
every prior tranche profile in docs/SCALE.md.

Usage: python tools/profile_ops.py op_a,op_b[,...] [tenx_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trip_data_pipeline_spark import get_session
from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.registry import queries


def main() -> int:
    if len(sys.argv) < 2 or not sys.argv[1].strip():
        print(__doc__.strip(), file=sys.stderr)
        print("\nerror: missing op list (comma-separated)", file=sys.stderr)
        return 2
    names = [n for n in sys.argv[1].split(",") if n]
    tenx = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe_x10"
    if not os.path.exists(f"{tenx}/_DONE"):
        raise SystemExit(f"10x layout missing at {tenx} — run tools/scale_probe.py")
    spark = get_session(app_name="profile-ops")
    qs = queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown ops: {unknown}")
    load(spark, tenx, "lineitem").count()  # warm the session
    out: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        rows = qs[name](spark, tenx).count()
        out[name] = {"sec": round(time.time() - t0, 2), "rows": rows}
        print(f"{name}: {out[name]['sec']} s, {rows} rows", file=sys.stderr)
    print(json.dumps({"tenx_dir": tenx, "profile": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
