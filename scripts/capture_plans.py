#!/usr/bin/env python
"""Capture .explain('formatted') for named queries to plans/<round>/<q>_<tag>.txt.
Usage: capture_plans.py <repo_root> <tag> q1 q2 ...
Round dir via EZ_CDC_PLANS_DIR (default plans/r20).
"""
import contextlib, io, os, sys
repo = sys.argv[1]; tag = sys.argv[2]; names = sys.argv[3:]
sys.path.insert(0, repo)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
out_dir = os.environ.get("EZ_CDC_PLANS_DIR", "/root/repo/plans/r20")
os.makedirs(out_dir, exist_ok=True)
from ez_cdc_spark.session import get_spark
from ez_cdc_spark.queries import load_all
spark = get_spark("plans-" + tag)
registry = load_all()
for name in names:
    df = registry[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
        fh.write(buf.getvalue())
    print("captured", name, tag, flush=True)
