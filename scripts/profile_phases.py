#!/usr/bin/env python
"""Phase profile with per-phase Spark job counts (DAGScheduler nextJobId)."""
import collections, functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
PH = collections.defaultdict(lambda: [0.0, 0, 0])  # name -> [sec, calls, jobs]
_sc = None
def _jobid():
    return _sc._jsc.sc().dagScheduler().nextJobId()
def timed(mod, name):
    fn = getattr(mod, name)
    @functools.wraps(fn)
    def wrap(*a, **k):
        j0 = _jobid(); t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            p = PH[name]; p[0] += time.perf_counter()-t0; p[1] += 1; p[2] += _jobid()-j0
    setattr(mod, name, wrap)

def main():
    global _sc
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    target = sys.argv[1]
    from ez_cdc_spark.session import get_spark
    from ez_cdc_spark.queries import load_all
    import ez_cdc_spark.sources.manifest as man
    import ez_cdc_spark.streaming.cdc as cdc
    for nm in ("merge_mor","merge_cow","compact_mor","compact","compact_partial","publish_append",
               "publish_hidden_partitioned","append_hidden_partitioned","read_transform_pruned","publish_partitioned",
               "change_feed_mor","change_feed","read_committed","publish","gc","vacuum",
               "_collect_stats","stage_only","_enforce_constraints","_bucket64_counts",
               "_commit_manifest","read_mor","_collect_blooms","read_point_lookup","publish_hidden_partitioned","append_hidden_partitioned"):
        if hasattr(man, nm): timed(man, nm)
    for nm in ("consume_feed_step",):
        if hasattr(cdc, nm): timed(cdc, nm)
    spark = get_spark("phases")
    _sc = spark.sparkContext
    registry = load_all()
    registry["a2_global_agg"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    from ez_cdc_spark.streaming.cdc import envelopes_jsonl
    from ez_cdc_spark.streaming.replay import events_parquet
    events_parquet(spark, sf_dir); envelopes_jsonl(spark, sf_dir)
    j0=_jobid(); t0 = time.perf_counter()
    registry[target].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter()-t0; jobs=_jobid()-j0
    print(f"\n=== {target}: {wall:.2f}s, {jobs} jobs ===")
    print(f"{'phase':22s} {'sec':>8s} {'calls':>6s} {'jobs':>5s} {'s/call':>7s}")
    for nm,(sec,calls,js) in sorted(PH.items(), key=lambda kv:-kv[1][0]):
        print(f"{nm:22s} {sec:8.2f} {calls:6d} {js:5d} {sec/calls:7.3f}")

if __name__ == "__main__":
    main()
