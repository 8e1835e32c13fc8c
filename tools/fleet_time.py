"""Time EVERY registry query once-warm at a tier with the noop sink.

Round-15 measurement pass (guide §1): ranks all 290 oracle-paired queries
by wall time at sf0.1 under the ENGINE DEFAULT session (AQE on — the 100 TB
posture, not the bench tier's latency knobs) so optimization effort goes to
the operators that actually cost something. One warm-up + best-of-N timed
noop writes per query; failures are recorded, never fatal.

Usage: python tools/fleet_time.py [sf_dir] [runs] > fleet_times.jsonl
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from machinelearningalgomapreduce_spark import registry
    from machinelearningalgomapreduce_spark.session import ensure_query_conf, get_spark

    spark = get_spark(app_name="fleet_time")
    ensure_query_conf(spark)
    sc = spark.sparkContext
    qs = registry.queries()
    rows = []
    for name in sorted(qs):
        sc.setJobDescription(f"fleet_time:{name}")
        try:
            t_w0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm = time.perf_counter() - t_w0
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            rec = {"name": name, "warm": round(warm, 3), "best": round(best, 3)}
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            rec = {"name": name, "err": str(exc)[:200]}
        print(json.dumps(rec), flush=True)
        rows.append(rec)
    timed = [r for r in rows if "best" in r]
    timed.sort(key=lambda r: -r["best"])
    print(json.dumps({
        "total_best_sec": round(sum(r["best"] for r in timed), 1),
        "n": len(timed),
        "errors": [r["name"] for r in rows if "err" in r],
        "top25": [(r["name"], r["best"]) for r in timed[:25]],
    }), flush=True)


if __name__ == "__main__":
    main()
