"""Paced 1000x value check for the stream-stream joins (VERDICT r11
item 3) -> docs/PARITY_STREAM_1000x.json.

The 1000x magnitude subset excludes `stream_stream_join` /
`stream_outer_join_watermark` because `Trigger.AvailableNow` over the
static replicated fixture drains 30 days of history in ONE micro-batch:
the watermark never advances mid-batch, so the join state store must
hold both sides' 100M raw events (measured >70 min without one of 16
tasks completing — docs/SCALE.md §Round-11).  That is the harness's
drain pattern, not the plan: in production arrivals span micro-batches
and the 1h watermark bounds state to about one hour of events per side.

This tool reproduces the production regime and turns the exclusion into
a measured record:

1. Re-partition the 1000x events fact into PARTS range-partitions BY
   EVENT TIME (`repartitionByRange(PARTS, "ts")` — part-00000 holds
   the earliest range) and stamp ascending modification times on the
   part files, because the streaming file source admits files oldest-
   mtime-first.  Content is identical to the source layout — only the
   file boundaries change.
2. Drain both ops with `STREAM_MAX_FILES_PER_TRIGGER` set, so
   AvailableNow processes the history in many small micro-batches;
   the watermark advances between batches and state stays bounded to
   ~1 h of events per side.  `STREAM_SINK_DIR` routes the drained
   append output to parquet (the memory sink would hold the ~10^8-row
   join output on the driver).
3. Compare against the registry DuckDB oracle evaluated on the SAME
   rows (the source 1000x layout — re-partitioning changes no
   content) with the standard parity protocol (tools/parity_sweep.py
   check_op: fingerprint + stratified exact-sample, oracle budget
   honored).

This is also the first measured exercise of the hash contract's
documented ordered-arrival assumption (streaming_ops.py, ADVICE r10):
"matched subset == batch inner join" requires that no matched row is
lost to watermark eviction, which holds when files arrive in event-time
order — exactly what the mtime-stamped range layout guarantees.  The
1 h join window equals the 1 h watermark delay, so a pair spanning a
micro-batch boundary is always still in state when its partner arrives:
after batch i the watermark is max_ts(batch i) - 1h, and any view a
batch-(i+1) purchase can match has v_ts > p_ts - 1h >= watermark.

Usage:
  python tools/stream_paced_1000x.py [src_1000x_dir] [out_json]
  python tools/stream_paced_1000x.py --recheck [src_1000x_dir] [out_json]
Env:
  PACED_PARTS (default 128)   time-range part files
  PACED_MFPT  (default 4)     maxFilesPerTrigger per micro-batch
  PARITY_ORACLE_BUDGET        DuckDB budget per oracle read (default 300)

--recheck re-runs ONLY the oracle comparison against the parquet
output a prior paced drain saved in <PACED_DIR>/sink (oldest out_* dir
= stream_stream_join, next = the outer variant, matching OPS_UNDER_TEST
order) — for when the Spark drain completed but the DuckDB read of the
~10^8-row oracle exceeded the default budget: raise
PARITY_ORACLE_BUDGET and re-compare without paying the ~30-min drain
again.  The artifact records recheck=True and the budget used on those
records."""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PARTS = int(os.environ.get("PACED_PARTS", "128"))
MFPT = int(os.environ.get("PACED_MFPT", "4"))
PACED_DIR = os.environ.get("PACED_DIR", "/tmp/stream_paced_x1000")

OPS_UNDER_TEST = ["stream_stream_join", "stream_outer_join_watermark"]


def build_paced(spark, src_dir: str) -> None:
    """Write src events as PARTS time-range parts with ascending
    mtimes; content-identical to the source fact."""
    dst = os.path.join(PACED_DIR, "events.parquet")
    if os.path.exists(os.path.join(PACED_DIR, "_DONE")):
        return
    os.makedirs(PACED_DIR, exist_ok=True)
    (
        spark.read.parquet(os.path.join(src_dir, "events.parquet"))
        .repartitionByRange(PARTS, "ts")
        .write.mode("overwrite")
        .parquet(dst)
    )
    parts = sorted(glob.glob(os.path.join(dst, "part-*")))
    t0 = time.time() - len(parts) - 60
    for i, p in enumerate(parts):
        os.utime(p, (t0 + i, t0 + i))
    open(os.path.join(PACED_DIR, "_DONE"), "w").close()
    print(f"paced layout: {len(parts)} time-range parts at {dst}",
          file=sys.stderr)


def _recheck(spark, con, out_path: str) -> int:
    """Oracle-only re-comparison over a prior drain's saved parquet."""
    import dataclasses

    from pyspark.sql import functions as F

    from tools.parity_sweep import ORACLE_BUDGET_S, OracleBudgetExceeded, check_op
    from trip_data_pipeline_spark.registry import OPS

    sink = os.path.join(PACED_DIR, "sink")
    outs = sorted(
        (d for d in glob.glob(os.path.join(sink, "out_*"))
         if not d.endswith("_ckpt")),
        key=os.path.getmtime,
    )
    assert len(outs) == len(OPS_UNDER_TEST), (
        f"expected {len(OPS_UNDER_TEST)} drain outputs in {sink}, "
        f"found {len(outs)} — run the drain first"
    )
    art = json.load(open(out_path)) if os.path.exists(out_path) else {
        "results": {}}
    for name, out_dir in zip(OPS_UNDER_TEST, outs):
        df = spark.read.parquet(out_dir)
        if name == "stream_outer_join_watermark":
            # the registered op filters the drained LEFT OUTER output
            # to the boundary-invariant matched subset — replicate it
            df = df.filter(F.col("view_id").isNotNull())
        print(f"recheck: {name} over {out_dir} "
              f"(budget {ORACLE_BUDGET_S:.0f}s) ...", file=sys.stderr)
        t0 = time.time()
        orig = OPS[name]
        OPS[name] = dataclasses.replace(orig, fn=lambda s, d, _df=df: _df)
        try:
            rec = check_op(spark, con, name, PACED_DIR)
        except OracleBudgetExceeded:
            rec = {"status": "ORACLE-BUDGET-NA",
                   "detail": "DuckDB oracle exceeded the raised budget"}
        except Exception as e:  # noqa: BLE001
            rec = {"status": "ERR",
                   "detail": f"{type(e).__name__}: {str(e)[:400]}"}
        finally:
            OPS[name] = orig
        rec.update(recheck=True, oracle_budget_s=ORACLE_BUDGET_S,
                   wall_secs=round(time.time() - t0, 2))
        prior = art["results"].get(name, {})
        if "wall_secs" in prior:
            rec["drain_wall_secs"] = prior["wall_secs"]
        art["results"][name] = rec
        with open(out_path, "w") as f:
            json.dump(art, f, indent=1)
            f.write("\n")
        print(f"  {rec['status']} in {rec['wall_secs']}s", file=sys.stderr)
    print(json.dumps({k: v["status"] for k, v in art["results"].items()}))
    bad = [k for k, v in art["results"].items()
           if v["status"] not in ("HASH-OK", "FP-OK", "FP-INT-OK",
                                  "FLOAT-TOL-OK")]
    return 1 if bad else 0


def main() -> int:
    recheck = "--recheck" in sys.argv
    argv = [a for a in sys.argv if a != "--recheck"]
    src_dir = argv[1] if len(argv) > 1 else "/tmp/scale_probe_x1000"
    out_path = argv[2] if len(argv) > 2 else os.path.join(
        REPO, "docs", "PARITY_STREAM_1000x.json"
    )
    if not os.path.exists(os.path.join(src_dir, "_DONE")):
        raise SystemExit(f"layout missing at {src_dir} — run tools/bench_scale.py")

    from tests.oracle import duck_connect
    from tools.parity_sweep import OracleBudgetExceeded, check_op
    from trip_data_pipeline_spark import get_session
    from trip_data_pipeline_spark.registry import OPS, queries

    queries()
    spark = get_session("stream-paced-1000x")
    spark.sparkContext.setLogLevel("ERROR")
    if recheck:
        return _recheck(spark, duck_connect(src_dir), out_path)
    build_paced(spark, src_dir)

    sink = os.path.join(PACED_DIR, "sink")
    shutil.rmtree(sink, ignore_errors=True)
    os.makedirs(sink, exist_ok=True)
    # Oracle over the SOURCE layout: identical rows, and DuckDB reads
    # the original 64-file fact with its own parallelism.
    con = duck_connect(src_dir)

    results: dict[str, dict] = {}
    os.environ["STREAM_MAX_FILES_PER_TRIGGER"] = str(MFPT)
    os.environ["STREAM_SINK_DIR"] = sink
    try:
        for name in OPS_UNDER_TEST:
            print(f"paced drain: {name} ...", file=sys.stderr)
            t0 = time.time()
            try:
                rec = check_op(spark, con, name, PACED_DIR)
            except OracleBudgetExceeded:
                rec = {
                    "status": "ORACLE-BUDGET-NA",
                    "detail": (
                        "Spark paced drain completed; DuckDB oracle "
                        "exceeded the budget on the ~10^8-row join output"
                    ),
                    "spark_drain_secs": round(time.time() - t0, 2),
                }
            except Exception as e:  # noqa: BLE001
                rec = {"status": "ERR",
                       "detail": f"{type(e).__name__}: {str(e)[:400]}"}
            rec["wall_secs"] = round(time.time() - t0, 2)
            results[name] = rec
            print(f"  {rec['status']} in {rec['wall_secs']}s", file=sys.stderr)
    finally:
        os.environ.pop("STREAM_MAX_FILES_PER_TRIGGER", None)
        os.environ.pop("STREAM_SINK_DIR", None)

    out = {
        "protocol": (
            f"tools/stream_paced_1000x.py: events re-partitioned into "
            f"{PARTS} event-time range parts (ascending mtimes), both "
            f"stream-stream joins drained with maxFilesPerTrigger={MFPT} "
            f"(AvailableNow, ~{PARTS // MFPT} micro-batches, watermark "
            "advancing between batches so join state stays ~1h per side), "
            "append output to parquet, compared against the registry "
            "DuckDB oracle on the source layout via parity_sweep.check_op "
            "(fingerprint + stratified exact-sample).  First measured "
            "exercise of the ordered-arrival assumption documented in "
            "streaming_ops.py."
        ),
        "src_dir": src_dir,
        "paced_dir": PACED_DIR,
        "parts": PARTS,
        "max_files_per_trigger": MFPT,
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v["status"] for k, v in results.items()}))
    bad = [k for k, v in results.items()
           if v["status"] not in ("HASH-OK", "FP-OK", "FP-INT-OK",
                                  "FLOAT-TOL-OK", "ORACLE-BUDGET-NA")]
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
