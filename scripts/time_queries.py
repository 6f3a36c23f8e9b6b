#!/usr/bin/env python
"""Time a list of registry queries in isolation (bench-identical protocol:
same session factory, noop sink, optional repeats). Usage:
    python scripts/time_queries.py q1 q2 ... [--runs N]
Prints one line per query: name, per-run seconds.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 1
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ez_cdc_spark.session import get_spark
    from ez_cdc_spark.queries import load_all

    spark = get_spark("ez_cdc_spark-timeq")
    registry = load_all()

    # bench-identical warmups (worker pools, streaming machinery)
    registry["a2_global_agg"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    import pandas as _pd

    def _warm_workers(batches):
        import numpy as _np  # noqa: F401

        for pdf in batches:
            yield _pd.DataFrame({"n": [len(pdf)]})

    spark.range(0, 1024, 1, 64).mapInPandas(_warm_workers, "n long").write.format(
        "noop"
    ).mode("overwrite").save()
    spark.sparkContext.parallelize(range(64), 32).map(lambda x: x).count()
    from ez_cdc_spark.streaming.cdc import envelopes_jsonl
    from ez_cdc_spark.streaming.replay import events_parquet

    events_parquet(spark, sf_dir)
    envelopes_jsonl(spark, sf_dir)

    for name in args:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: {samples}", flush=True)


if __name__ == "__main__":
    main()
