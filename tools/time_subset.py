"""Time a NAMED SUBSET of registry queries with the fleet_time methodology
(engine-default session, one warm-up + best-of-N noop writes) — the A/B
harness for targeted optimization work (r16; fleet_time.py sweeps all 290).

Usage: python tools/time_subset.py q_a q_b ... [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from machinelearningalgomapreduce_spark import registry
    from machinelearningalgomapreduce_spark.session import ensure_query_conf, get_spark

    spark = get_spark(app_name="time_subset")
    ensure_query_conf(spark)
    sc = spark.sparkContext
    qs = registry.queries()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    for name in args.names:
        sc.setJobDescription(f"time_subset:{name}")
        t_w0 = time.perf_counter()
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t_w0
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"name": name, "warm": round(warm, 3), "best": round(best, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
