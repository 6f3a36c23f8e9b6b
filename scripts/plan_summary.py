#!/usr/bin/env python
"""Print a one-line plan summary per query: Exchange count, join types,
Python eval nodes, pushed-filter presence."""
import contextlib, io, os, sys
sys.path.insert(0, '/root/repo')
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
from ez_cdc_spark.session import get_spark
from ez_cdc_spark.queries import load_all
spark = get_spark("plansum")
registry = load_all()
for name in sys.argv[1:]:
    df = registry[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    print(f"{name}: Exchange={p.count('Exchange')} SMJ={p.count('SortMergeJoin')} "
          f"BHJ={p.count('BroadcastHashJoin')} BNLJ={p.count('BroadcastNestedLoop')} "
          f"Cartesian={p.count('CartesianProduct')} PyEval={p.count('EvalPython')+p.count('MapInPandas')+p.count('FlatMapGroupsInPandas')+p.count('ArrowEval')} "
          f"PushedFilters={'yes' if 'PushedFilters: [' in p and not all(s.strip()=='PushedFilters: []' for s in [l for l in p.splitlines() if 'PushedFilters' in l]) else 'none'}",
          flush=True)
