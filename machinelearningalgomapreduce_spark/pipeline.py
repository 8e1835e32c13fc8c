"""End-to-end training-data pipeline: the composition story.

A user of the reference repo runs its jobs as a CHAIN — filter, dedup,
decontaminate, chunk, shard. This module composes the engine's operators
into that exact chain as ONE lazy DataFrame program, returning both the
final export frame and the per-stage funnel counts a production pipeline
logs. Everything is the already-verified operators — no new semantics.

Stage order (the standard pretraining curation order — cheap scan-side
filters first, the expensive near-dup join on the reduced corpus):

1. quality gate      — q_quality_score's keep flag (scan-side heuristics)
2. near-dup removal  — minhash LSH clusters (q_dedup_clusters) with
                       quality-aware survivorship (q_dedup_keep_best):
                       a clustered doc survives only as its cluster's
                       best member
3. decontamination   — drop docs sharing 3-grams with the benchmark set
                       (q_decontaminate, broadcast probe side)
4. chunking          — fixed token windows with overlap
                       (export.chunk_token_streams, zero-shuffle)
5. sharding          — md5-deterministic shard of (doc_id, chunk_id)

Scale shape: stages 1/3/4/5 are scan-side or broadcast-probe (no corpus
shuffle); stage 2 is the band-bucketed LSH + CC loop — the one genuinely
heavy pass, run once. The funnel counts cost one aggregate each and in
production would come from `observe()` metrics on the same plan instead
of separate actions (functions/metrics.py shows that form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from machinelearningalgomapreduce_spark.operators.dedup import (
    q_dedup_clusters,
    q_dedup_keep_best,
)
from machinelearningalgomapreduce_spark.operators.export import chunk_token_streams
from machinelearningalgomapreduce_spark.operators.text import (
    q_decontaminate,
    q_quality_score,
)
from machinelearningalgomapreduce_spark.sources.catalog import load_tables

N_SHARDS = 16


def training_pipeline(
    spark: SparkSession,
    sf_dir: str,
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the full curation chain; returns (chunks, funnel).

    `chunks`: (doc_id, chunk_id, n_tokens, chunk_text, shard).
    `funnel`: docs surviving each stage — raw → quality → deduped →
    decontaminated — plus the final chunk count.
    """
    docs = load_tables(spark, sf_dir).documents
    funnel: dict[str, int] = {"raw": docs.count()}

    quality_keep = q_quality_score(spark, sf_dir).filter("keep").select("doc_id")
    staged = docs.join(quality_keep, "doc_id", "left_semi")
    funnel["quality"] = staged.count()

    clusters = q_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_root")
    winners = q_dedup_keep_best(spark, sf_dir).select(
        F.col("best_doc").alias("doc_id")
    )
    # A clustered doc survives iff it IS its cluster's best member;
    # unclustered docs pass through untouched.
    losers = clusters.join(winners, "doc_id", "left_anti").select("doc_id")
    staged = staged.join(losers, "doc_id", "left_anti")
    funnel["deduped"] = staged.count()

    contaminated = (
        q_decontaminate(spark, sf_dir).filter("contaminated").select("doc_id")
    )
    staged = staged.join(contaminated, "doc_id", "left_anti")
    funnel["decontaminated"] = staged.count()

    shard = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id"), F.col("chunk_id"))), 1, 1
        ),
        16,
        10,
    ).cast("int")
    chunks = chunk_token_streams(staged, chunk_tokens, overlap).withColumn(
        "shard", shard % N_SHARDS
    )
    funnel["chunks"] = chunks.count()
    return chunks, funnel
