#!/usr/bin/env python
"""Phase-level profile of t34 (and siblings): wrap manifest ops with timers."""
from __future__ import annotations

import collections
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PHASES: dict[str, list[float]] = collections.defaultdict(list)


def timed(mod, name):
    fn = getattr(mod, name)

    @functools.wraps(fn)
    def wrap(*a, **k):
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            PHASES[name].append(time.perf_counter() - t0)

    setattr(mod, name, wrap)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    target = sys.argv[1] if len(sys.argv) > 1 else "t34_mor_feed_consumer"

    from ez_cdc_spark.session import get_spark
    from ez_cdc_spark.queries import load_all
    import ez_cdc_spark.sources.manifest as man
    import ez_cdc_spark.streaming.cdc as cdc

    for nm in (
        "merge_mor",
        "merge_cow",
        "compact_mor",
        "change_feed_mor",
        "change_feed",
        "read_committed",
        "read_manifest",
        "publish",
        "gc",
        "vacuum",
        "txn_watermark",
        "read_mor",
    ):
        if hasattr(man, nm):
            timed(man, nm)
    if hasattr(cdc, "consume_feed_step"):
        timed(cdc, "consume_feed_step")

    spark = get_spark("ez_cdc_spark-prof")
    registry = load_all()
    registry["a2_global_agg"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    from ez_cdc_spark.streaming.cdc import envelopes_jsonl
    from ez_cdc_spark.streaming.replay import events_parquet

    events_parquet(spark, sf_dir)
    envelopes_jsonl(spark, sf_dir)

    t0 = time.perf_counter()
    registry[target].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(f"\n=== {target}: {wall:.2f}s total ===")
    for nm, vals in sorted(PHASES.items(), key=lambda kv: -sum(kv[1])):
        print(
            f"{sum(vals):8.2f}s  n={len(vals):3d}  avg={sum(vals)/len(vals):6.3f}  {nm}"
            f"  [{', '.join(f'{v:.2f}' for v in vals[:12])}{'...' if len(vals) > 12 else ''}]"
        )


if __name__ == "__main__":
    main()
