"""Verify a subset of registered ops against their DuckDB oracles,
exactly like tests/driver_sim.py but for named ops only — the fast
inner loop when iterating on one operator.

Usage: python tools/verify_ops.py op1 op2 ... [--sf /root/testdata/sf0.01]
       (repeat --sf for multiple scale factors)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from tests.oracle import (
    canon_rows,
    driver_sort_check,
    duck_connect,
    duck_result,
    spark_result,
)
from trip_data_pipeline_spark.registry import OPS, queries


def main() -> int:
    args = sys.argv[1:]
    sfs: list[str] = []
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sfs.append(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not sfs:
        sfs = ["/root/testdata/sf0.01"]
    queries()
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify-ops")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for sf_dir in sfs:
        con = duck_connect(sf_dir)
        for name in names:
            o = OPS[name]
            t0 = time.time()
            try:
                rdf = o.fn(spark, sf_dir)
                if o.oracle is not None:
                    s_cols, s_raw = spark_result(rdf)
                    d_cols, d_raw = duck_result(con, o.oracle)
                    driver_sort_check(s_cols, s_raw)  # harness parity:
                    driver_sort_check(d_cols, d_raw)  # list cells crash here
                    s_rows = canon_rows(s_cols, s_raw)
                    d_rows = canon_rows(d_cols, d_raw)
                    ok = sorted(s_cols) == sorted(d_cols) and s_rows == d_rows
                    if not ok:
                        bad += 1
                        print(f"FAIL {name} @ {sf_dir}: "
                              f"cols {s_cols == d_cols} rows {len(s_rows)}/{len(d_rows)}")
                        if sorted(s_cols) != sorted(d_cols):
                            print(f"  spark cols: {s_cols}\n  duck  cols: {d_cols}")
                        else:
                            diffs = [
                                (a, b)
                                for a, b in zip(s_rows, d_rows)
                                if a != b
                            ][:3]
                            for a, b in diffs:
                                print(f"  spark: {a}\n  duck : {b}")
                    else:
                        print(f"ok   {name} @ {sf_dir} "
                              f"({len(s_rows)} rows, {time.time()-t0:.1f}s)")
                else:
                    n = rdf.count()
                    print(f"ok   {name} @ {sf_dir} (rows-only, {n} rows, "
                          f"{time.time()-t0:.1f}s)")
            except Exception as e:  # noqa: BLE001
                bad += 1
                print(f"ERR  {name} @ {sf_dir}: {type(e).__name__}: {e}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
