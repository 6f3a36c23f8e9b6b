#!/usr/bin/env python
"""Driver-simulation oracle check for named queries (hostile TZ)."""
import os, sys
os.environ["TZ"] = "America/New_York"
import time as _t; _t.tzset()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sf_dir = os.environ.get("EZ_CDC_TEST_SF_DIR", "/root/testdata/sf0.01")
from ez_cdc_spark.session import get_spark
from ez_cdc_spark.harness.oracle import compare_query
spark = get_spark("oracle-check", master="local[8]")
bad = 0
for name in sys.argv[1:]:
    ok, detail = compare_query(spark, name, sf_dir)
    print(("PASS" if ok else "FAIL"), name, {k: v for k, v in detail.items() if k in ("spark_rows","duck_rows","mode")}, flush=True)
    bad += 0 if ok else 1
sys.exit(1 if bad else 0)
