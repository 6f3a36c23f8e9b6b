#!/usr/bin/env python
"""Run one registry query with event logging on; print wall."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
from ez_cdc_spark.session import _BASE_CONF, get_spark
_BASE_CONF["spark.eventLog.enabled"] = "true"
_BASE_CONF["spark.eventLog.dir"] = "file:///root/bench_logs/evlog"
from ez_cdc_spark.queries import load_all
spark = get_spark("evlog-" + sys.argv[1])
registry = load_all()
registry["a2_global_agg"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
from ez_cdc_spark.streaming.cdc import envelopes_jsonl
from ez_cdc_spark.streaming.replay import events_parquet
events_parquet(spark, sf_dir); envelopes_jsonl(spark, sf_dir)
t0=time.perf_counter()
registry[sys.argv[1]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
print(f"wall: {time.perf_counter()-t0:.2f}s  app: {spark.sparkContext.applicationId}")
spark.stop()
