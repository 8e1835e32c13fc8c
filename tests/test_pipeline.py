"""End-to-end curation-chain test: the composed pipeline must honor every
stage's contract simultaneously (monotone funnel, no duplicate survivors,
no contaminated survivors, chunk/shard invariants)."""

from __future__ import annotations

import pytest

from machinelearningalgomapreduce_spark.pipeline import N_SHARDS, training_pipeline
from machinelearningalgomapreduce_spark.operators.dedup import (
    q_dedup_clusters,
    q_dedup_keep_best,
)
from machinelearningalgomapreduce_spark.operators.text import q_decontaminate


def test_training_pipeline_funnel_and_invariants(spark, sf_dir):
    chunks, funnel = training_pipeline(spark, sf_dir, chunk_tokens=32, overlap=4)
    # Monotone funnel, nothing degenerate.
    assert funnel["raw"] >= funnel["quality"] >= funnel["deduped"] >= funnel["decontaminated"] > 0
    assert funnel["chunks"] >= funnel["decontaminated"]  # ≥1 chunk per doc

    rows = chunks.collect()
    assert len(rows) == funnel["chunks"]
    surviving_docs = {r.doc_id for r in rows}
    assert len(surviving_docs) == funnel["decontaminated"]

    # No contaminated doc survives.
    contaminated = {
        r.doc_id for r in q_decontaminate(spark, sf_dir).filter("contaminated").collect()
    }
    assert not (surviving_docs & contaminated)

    # Per near-dup cluster: at most one survivor, and if any cluster member
    # survived it is the quality-chosen best.
    clusters = {
        r.doc_id: r.cluster_root for r in q_dedup_clusters(spark, sf_dir).collect()
    }
    best = {
        r.cluster_root: r.best_doc for r in q_dedup_keep_best(spark, sf_dir).collect()
    }
    seen_roots = {}
    for d in surviving_docs:
        if d in clusters:
            root = clusters[d]
            assert best[root] == d  # only the best member survives
            assert root not in seen_roots
            seen_roots[root] = d

    # Shards are well-formed and deterministic.
    assert all(0 <= r.shard < N_SHARDS for r in rows)
    chunks2, _ = training_pipeline(spark, sf_dir, chunk_tokens=32, overlap=4)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, chunks2.collect()))
