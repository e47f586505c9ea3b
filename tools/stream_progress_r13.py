"""Drain the streaming family; record batch count + durations per op.

Round-13 state-store provider A/B (VERDICT r12 item 5): pass a third
argument `rocksdb` to run the same drains under the RocksDB state
store provider (spark.sql.streaming.stateStore.providerClass) —
otherwise the default HDFSBackedStateStoreProvider runs.  The conf is
set on THIS probe session only; no engine path hardcodes a provider.

Usage: python tools/stream_progress_r13.py <repo_root> <out.json> [rocksdb] [sf_dir]"""
import os, sys, time, json, uuid
root = sys.argv[1]; out_path = sys.argv[2]
provider = sys.argv[3] if len(sys.argv) > 3 else ""
sys.path.insert(0, root)
from trip_data_pipeline_spark import get_session
from trip_data_pipeline_spark.registry import queries
from trip_data_pipeline_spark.streaming import read_events_stream
import trip_data_pipeline_spark.streaming as S
from pyspark.sql import functions as F
sf = sys.argv[4] if len(sys.argv) > 4 else '/root/testdata/sf0.1'
qs = queries(); spark = get_session('stream-progress')
if provider == 'rocksdb':
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

# patch run_to_memory to capture the query progress
orig = S.run_to_memory
CAP = {}
def capture(stream_df, output_mode='complete', **kw):
    spark_ = stream_df.sparkSession
    name = f"cap_{uuid.uuid4().hex[:8]}"
    key = 'spark.sql.streaming.noDataMicroBatches.enabled'
    old = spark_.conf.get(key)
    if not kw.get('final_no_data_batch', True):
        spark_.conf.set(key, 'false')
    try:
        t0=time.perf_counter()
        q = (stream_df.writeStream.outputMode(output_mode).format('memory')
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination()
        dt=time.perf_counter()-t0
        CAP['last'] = {
            'drain_s': round(dt,3),
            'n_batches': len(q.recentProgress),
            'batches': [{'numInputRows': p['numInputRows'],
                         'addBatch_ms': p['durationMs'].get('addBatch'),
                         'trigger_ms': p['durationMs'].get('triggerExecution')}
                        for p in q.recentProgress],
        }
        return spark_.table(name)
    finally:
        spark_.conf.set(key, old)
S.run_to_memory = capture
import trip_data_pipeline_spark.operators.streaming_ops as SO
SO.run_to_memory = capture

from trip_data_pipeline_spark.registry import OPS
names = ['stream_tumbling_count','stream_sliding_sum','stream_session_window',
         'stream_dedup_watermark','stream_stateful_runstate','stream_stream_join',
         'stream_outer_join_watermark','stream_session_dynamic_gap',
         'stream_transform_with_state','stream_two_level_window',
         'stream_watermark_late','stream_checkpoint_resume','stream_static_join']
res = {}
for n in names:
    OPS[n].fn(spark, sf).write.format('noop').mode('overwrite').save()  # warm
    t0=time.perf_counter()
    OPS[n].fn(spark, sf).write.format('noop').mode('overwrite').save()
    res[n] = {'op_wall_s': round(time.perf_counter()-t0,3), **CAP.get('last', {})}
json.dump(res, open(out_path,'w'), indent=1)
print(json.dumps({k: (v['op_wall_s'], v.get('n_batches')) for k,v in res.items()}))
