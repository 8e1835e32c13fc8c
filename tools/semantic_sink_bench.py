"""Throughput record for semantic_dedup_ingest_stream (VERDICT r12
item 6): vectors/s through the streaming SemDeDup sink at a given tier,
for BOTH index kinds — IVFIndexView (full vectors) and IVFPQIndexView
(codes + pruned-log exact re-rank) — plus the on-disk storage delta that
is the PQ index's reason to exist.

Each lane drains the tier's embeddings source with trigger(availableNow)
into a fresh index/out/checkpoint, so the measured wall-clock covers the
sink's whole per-batch protocol: within-batch blocked collapse,
cross-batch index probe, epoch output write, index refresh commit.

Usage: python tools/semantic_sink_bench.py [tier_dir]
       (default /tmp/sf1.0 — built by tools/scale_bench_10x.ensure_tier)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _seg_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        if "seg-" in os.path.basename(root) or "/seg-" in root:
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def run_lane(spark, tier: str, kind: str, work: str) -> dict:
    from machinelearningalgomapreduce_spark.operators.ml import label_centroids
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables
    from machinelearningalgomapreduce_spark.sources.schemas import EMBEDDING_DIM
    from machinelearningalgomapreduce_spark.streaming.sinks import (
        semantic_dedup_ingest_stream,
    )

    t = load_tables(spark, tier)
    n_source = t.embeddings.count()
    cents = [
        (r.label, list(r.centroid))
        for r in label_centroids(t.embeddings).collect()
    ]
    idx_dir = os.path.join(work, f"{kind}-idx")
    out = os.path.join(work, f"{kind}-out")
    ck = os.path.join(work, f"{kind}-ck")
    if kind == "ivf":
        from machinelearningalgomapreduce_spark.operators.ivf_index import (
            IVFIndexView,
        )

        idx = IVFIndexView(idx_dir, cents, dim=EMBEDDING_DIM, n_probe=2)
    else:
        from machinelearningalgomapreduce_spark.operators.ivf_pq import (
            IVFPQIndexView,
        )
        from machinelearningalgomapreduce_spark.operators.similarity import pq_fit

        books, _err = pq_fit(spark, tier, k=8, n_iter=2)
        cbs = [(r.sub, r.code, list(r.centroid)) for r in books.collect()]
        idx = IVFPQIndexView(idx_dir, cents, cbs, dim=EMBEDDING_DIM, n_probe=2)

    t0 = time.perf_counter()
    q = semantic_dedup_ingest_stream(spark, tier, idx, out, ck)
    q.awaitTermination(3600)
    wall = time.perf_counter() - t0
    admitted = spark.read.parquet(out).count()
    return {
        "kind": kind,
        "tier": tier,
        "n_source_vectors": n_source,
        "n_admitted": admitted,
        "wall_s": round(wall, 1),
        "vectors_per_s": round(n_source / wall, 1),
        "index_segment_bytes": _seg_bytes(idx_dir),
    }


def main() -> None:
    tier = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    if tier == "/tmp/sf1.0" and not os.path.exists("/tmp/sf1.0/_BUILT.json"):
        from tools.scale_bench_10x import ensure_tier

        ensure_tier(10, "/tmp/sf1.0")

    from machinelearningalgomapreduce_spark.session import (
        ensure_query_conf,
        get_spark,
    )

    spark = get_spark(
        app_name="semantic-sink-bench",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_BENCH_PARTITIONS", "16")),
    )
    ensure_query_conf(spark)
    work = tempfile.mkdtemp(prefix="semsink-bench-")
    try:
        rows = [run_lane(spark, tier, kind, work) for kind in ("ivf", "pq")]
    finally:
        shutil.rmtree(work, ignore_errors=True)
    ivf, pq = rows
    out = {
        "rows": rows,
        "pq_storage_ratio": round(
            ivf["index_segment_bytes"] / max(1, pq["index_segment_bytes"]), 2
        ),
    }
    print(json.dumps(out))
    print(
        "\n| index kind | source vectors | admitted | wall (s) | vectors/s "
        "| index segment bytes |",
        file=sys.stderr,
    )
    print("| --- | --- | --- | --- | --- | --- |", file=sys.stderr)
    for r in rows:
        print(
            f"| {r['kind']} | {r['n_source_vectors']} | {r['n_admitted']} | "
            f"{r['wall_s']} | **{r['vectors_per_s']}** | "
            f"{r['index_segment_bytes']} |",
            file=sys.stderr,
        )
    print(
        f"\nPQ index segments are {out['pq_storage_ratio']}× smaller on disk.",
        file=sys.stderr,
    )
    spark.stop()


if __name__ == "__main__":
    main()
