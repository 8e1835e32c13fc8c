"""Build an embeddings-heavy tier for the ANN crossover record.

The 10× tier (10 key-offset copies of everything) caps embeddings at
20k vectors — too small for brute q_knn's n²/50 cost to dominate its
fixed overhead, so the ANN twin's win is invisible there (see
BENCH_NOTES round-13). This builds a tier with N_COPIES of the sf0.1
EMBEDDINGS (vec_ids offset; vectors PERTURBED per copy so they stay
distinct and the geometry keeps near-dup structure instead of exact
degeneracy) while symlinking every other table from sf0.1 — q_knn and
knn_ann only read embeddings, so the rest of the catalog just needs to
exist.

Usage: python tools/build_emb_tier.py [n_copies] [out_dir]
       (defaults: 50 copies → /tmp/emb50x, ~100k distinct vectors)
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000
# Tier-format version, stamped into the tier's _BUILT.json (r15, r14
# ADVICE): v2 = the r14 jitter keying xxhash64(lit(d), copy*1_000_003,
# vec_id); v1 = the pre-r14 keying xxhash64(lit(i*1_000_003+d), vec_id).
# A regenerated tier under a DIFFERENT version contains different vectors
# than the tiers earlier rounds measured — consumers (ann_twin_bench)
# warn on mismatch so cross-round bench/parity numbers are never silently
# compared across formats.
TIER_FORMAT_VERSION = 2


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/emb50x"

    from pyspark.sql import functions as F

    from machinelearningalgomapreduce_spark.session import (
        ensure_query_conf,
        get_spark,
    )
    from machinelearningalgomapreduce_spark.sources.schemas import EMBEDDING_DIM

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    for name in os.listdir(SRC):
        if name != "embeddings.parquet":
            os.symlink(os.path.join(SRC, name), os.path.join(out_dir, name))

    spark = get_spark(app_name="emb-tier-build")
    ensure_query_conf(spark)
    base = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    # ONE plan for every copy (r14): the copy index is a COLUMN from a
    # crossJoin against range(n_copies), so the jitter tree is 64
    # expressions total regardless of n_copies — the old per-copy-select
    # union built n_copies·64 Column objects through py4j and ground for
    # >10 min at 250 copies before the analyzer even saw the plan.
    # Deterministic per-(copy, vec, dim) perturbation, small enough to
    # keep cluster structure, large enough that no two copies of a
    # vector are exact duplicates (so the rep-collapse and the quantizer
    # both see the full tier).
    jitter = [
        F.round(
            F.element_at("embedding", d + 1)
            + (
                F.pmod(
                    F.xxhash64(
                        F.lit(d), F.col("copy") * 1_000_003, F.col("vec_id")
                    ),
                    F.lit(2000),
                )
                / 1000.0
                - 1.0
            )
            * 0.01,
            6,
        )
        for d in range(EMBEDDING_DIM)
    ]
    tier = (
        base.crossJoin(
            F.broadcast(
                spark.range(n_copies).select(F.col("id").alias("copy"))
            )
        )
        .select(
            (F.col("vec_id") + F.col("copy") * OFF).alias("vec_id"),
            F.array(*jitter).alias("embedding"),
            "label",
        )
        .repartition(32)
    )
    tier.write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    with open(os.path.join(out_dir, "_BUILT.json"), "w") as fh:
        json.dump(
            {
                "format_version": TIER_FORMAT_VERSION,
                "n_copies": n_copies,
                "src": SRC,
                "jitter": "xxhash64(lit(d), copy*1_000_003, vec_id)",
            },
            fh,
        )
    print(
        f"built {out_dir}: {n_copies} perturbed embedding copies "
        f"(format v{TIER_FORMAT_VERSION})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
