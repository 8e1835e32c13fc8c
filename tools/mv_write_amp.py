"""Write-amplification probe: flat IncrementalAggView vs the two
segmented compaction policies (size-tiered SegmentedAggView, leveled
LeveledAggView).

Feeds the same N delta batches (lineitem split by orderkey residue,
keyed by l_orderkey — a WIDE key domain, the regime the segmented views
exist for) through all three and reports bytes written to disk plus the
read amplification (live segments a read must union). Expected order:
flat write ≈ N/2 · state_size (quadratic in N) ≫ leveled ≈
f·log_f(N) · state_size > size-tiered ≈ log_f(N) · state_size; read amp
inverts — leveled unions the fewest segments.

Usage: python tools/mv_write_amp.py [sf_dir] [n_batches] [fanout]
Prints one JSON line; recorded in EVIDENCE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    fanout = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pyspark.sql import functions as F

    from machinelearningalgomapreduce_spark.operators.matview import (
        IncrementalAggView,
        LeveledAggView,
        SegmentedAggView,
    )
    from machinelearningalgomapreduce_spark.session import ensure_query_conf, get_spark
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    spark = get_spark(app_name="mv_write_amp")
    ensure_query_conf(spark)
    li = load_tables(spark, sf_dir).lineitem
    batches = [li.filter(F.pmod("l_orderkey", F.lit(n)) == i) for i in range(n)]
    spec = dict(
        keys=["l_orderkey"],
        aggs={"n_rows": ("count", "*"), "sum_qty": ("sum", "l_quantity")},
    )

    root = tempfile.mkdtemp(prefix="mv_amp_")
    try:
        flat = IncrementalAggView(os.path.join(root, "flat"), **spec)
        seg = SegmentedAggView(os.path.join(root, "seg"), fanout=fanout, **spec)
        lev = LeveledAggView(os.path.join(root, "lev"), fanout=fanout, **spec)
        written = {"flat": 0, "seg": 0, "lev": 0}
        prev = {"flat": 0, "seg": 0, "lev": 0}
        views = {"flat": flat, "seg": seg, "lev": lev}
        for i, b in enumerate(batches):
            for name, v in views.items():
                v.refresh(spark, b, batch_id=f"b{i}")
                # vacuum each chain so disk deltas isolate WRITE volume
                # (bytes written = growth + bytes the vacuum freed)
                written[name] += _du(v.path) - prev[name]
                v.vacuum(keep_last=1)
                prev[name] = _du(v.path)
        state_rows = flat.read(spark).count()
        base = sorted(map(tuple, flat.read(spark).collect()))
        for v in (seg, lev):
            assert base == sorted(
                map(tuple, v.read(spark).select("l_orderkey", "n_rows", "sum_qty").collect())
            )
        print(json.dumps({
            "probe": "mv_write_amp",
            "sf_dir": sf_dir,
            "n_batches": n,
            "fanout": fanout,
            "state_rows": state_rows,
            "flat_bytes_written": written["flat"],
            "segmented_bytes_written": written["seg"],
            "leveled_bytes_written": written["lev"],
            "ratio_flat_vs_seg": round(written["flat"] / max(written["seg"], 1), 2),
            "ratio_lev_vs_seg": round(written["lev"] / max(written["seg"], 1), 2),
            "live_segments_tiered": len(seg.segments()),
            "live_segments_leveled": len(lev.segments()),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
