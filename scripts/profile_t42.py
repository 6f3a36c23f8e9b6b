#!/usr/bin/env python
import os, re, shutil, sys, tempfile, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from pyspark.sql import functions as F
from ez_cdc_spark.session import get_spark
from ez_cdc_spark.queries._util import t
from ez_cdc_spark.sources.manifest import publish, publish_append
from ez_cdc_spark.sources.pyds import register_ezmanifest
from ez_cdc_spark.streaming.replay import checkpoint_dir
spark = get_spark("prof-t42")
spark.range(10).write.format("noop").mode("overwrite").save()
register_ezmanifest(spark)
c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
table_dir = tempfile.mkdtemp(prefix="t42prof-")
shutil.rmtree(table_dir, ignore_errors=True)
key = F.col("c_custkey")
T0=time.perf_counter()
def mark(s):
    print(f"{time.perf_counter()-T0:7.2f}s  {s}", flush=True)
publish(c.filter(key % 3 == 0), table_dir, generation=1); mark("publish gen1")
stream = spark.readStream.format("ezmanifest").option("path", table_dir).load(); mark("stream df built")
agg = stream.groupBy("c_nationkey").agg(F.count("*").cast("bigint").alias("n"), F.sum("c_custkey").cast("bigint").alias("key_sum"))
q = (agg.writeStream.format("memory").queryName("t42_tail").outputMode("complete")
     .option("checkpointLocation", checkpoint_dir()).trigger(processingTime="0 seconds").start()); mark("query started")
batches=[]
def drained(gen, timeout=240):
    deadline = time.time() + timeout
    while time.time() < deadline:
        p = q.lastProgress
        if p and p["sources"]:
            eo = p["sources"][0].get("endOffset")
            m = re.search(r"['\"]gen['\"]\s*:\s*(\d+)", str(eo or ""))
            if m and int(m.group(1)) >= gen and p["numInputRows"] == 0:
                return True
        time.sleep(0.2)
    raise TimeoutError(f"never drained {gen}")
drained(1); mark("drained 1")
publish_append(c.filter(key % 3 == 1), table_dir, generation=2); mark("append gen2")
drained(2); mark("drained 2")
(c.filter(key % 3 == 2).write.format("ezmanifest").option("path", table_dir).mode("append").save()); mark("writer gen3")
drained(3); mark("drained 3")
q.stop(); q.awaitTermination(); mark("stopped")
spark.table("t42_tail").orderBy("c_nationkey").write.format("noop").mode("overwrite").save(); mark("read result")
# dump batch durations from recentProgress
for p in q.recentProgress:
    print(f"  batch {p['batchId']}: rows={p['numInputRows']} trigger={p.get('durationMs',{})}")
