#!/usr/bin/env python
import cProfile, pstats, os, sys, io
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from ez_cdc_spark.session import get_spark
from ez_cdc_spark.queries import load_all
spark = get_spark("prof")
registry = load_all()
registry["a2_global_agg"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
from ez_cdc_spark.streaming.cdc import envelopes_jsonl
from ez_cdc_spark.streaming.replay import events_parquet
events_parquet(spark, sf_dir); envelopes_jsonl(spark, sf_dir)
name = sys.argv[1]
pr = cProfile.Profile()
pr.enable()
registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
pr.disable()
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(45)
print(s.getvalue())
s2 = io.StringIO()
ps2 = pstats.Stats(pr, stream=s2).sort_stats("tottime")
ps2.print_stats(30)
print(s2.getvalue())
