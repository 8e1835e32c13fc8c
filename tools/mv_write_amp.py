"""Write-amplification probe: flat IncrementalAggView vs SegmentedAggView.

Feeds the same N delta batches (lineitem split by orderkey residue,
keyed by l_orderkey — a WIDE key domain, the regime the segmented view
exists for) through both views and reports bytes written to disk per
design. The flat view rewrites its full O(groups) state every refresh
(expected total ≈ N/2 · state_size → quadratic in N); the segmented
view writes O(delta) per refresh plus size-tiered compaction merges
(expected total ≈ state_size · log_fanout(N)).

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
        flat_written = seg_written = 0
        flat_prev = seg_prev = 0
        for i, b in enumerate(batches):
            flat.refresh(spark, b, batch_id=f"b{i}")
            seg.refresh(spark, b, batch_id=f"b{i}")
            # vacuum the flat chain so disk deltas isolate WRITE volume
            # (bytes written = growth + bytes the vacuum freed)
            flat_now_pre = _du(flat.path)
            flat_written += flat_now_pre - flat_prev
            flat.vacuum(keep_last=1)
            flat_prev = _du(flat.path)
            seg_now = _du(seg.path)
            seg_written += seg_now - seg_prev
            seg.vacuum(keep_last=1)
            seg_prev = _du(seg.path)
        state_rows = flat.read(spark).count()
        assert sorted(map(tuple, flat.read(spark).collect())) == sorted(
            map(tuple, seg.read(spark).select("l_orderkey", "n_rows", "sum_qty").collect())
        )
        print(json.dumps({
            "probe": "mv_write_amp",
            "sf_dir": sf_dir,
            "n_batches": n,
            "fanout": fanout,
            "state_rows": state_rows,
            "flat_bytes_written": flat_written,
            "segmented_bytes_written": seg_written,
            "ratio": round(flat_written / max(seg_written, 1), 2),
            "live_segments": len(seg.segments()),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
