"""IVFPQIndexView: codes-only segments must be smaller than full-vector
segments, the re-rank stage exact on any input, recall ≥ the full-vector
IVF at equal probe budget on clustered data, and the whole maintenance
protocol (replay, compaction, spec guard, rebuild) preserved."""

from __future__ import annotations

import hashlib
import math
import os

import pytest
from pyspark.sql import functions as F

from machinelearningalgomapreduce_spark.operators.ivf_index import IVFIndexView
from machinelearningalgomapreduce_spark.operators.ivf_pq import IVFPQIndexView

from tests.conftest import drain

# Heavy PQ-index integration lane (~13 min total): slow-marked, run with -m slow
# (pytest.ini r16 — the driver-default battery must fit the verify window).
pytestmark = pytest.mark.slow

DIM, N, N_CLUSTERS, PQ_M, PQ_K = 64, 500, 5, 16, 25
SUB = DIM // PQ_M


def _u(tag):  # deterministic uniform in [-1, 1) — no RNG state
    h = int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)
    return h / 2**31 - 1.0


def _clustered():
    centers = [[_u(f"c:{c}:{d}") for d in range(DIM)] for c in range(N_CLUSTERS)]
    rows = [
        (
            i,
            [
                centers[i % N_CLUSTERS][d] + 0.05 * _u(f"n:{i}:{d}")
                for d in range(DIM)
            ],
        )
        for i in range(N)
    ]
    return centers, rows


def _quantizers(centers, rows):
    """Coarse cells = the cluster centers; PQ codebooks = the subvectors
    of the first PQ_K data points (cycling all clusters, so every
    subspace gets ~PQ_K/N_CLUSTERS codewords PER cluster — enough
    resolution to rank WITHIN a cluster, which cluster-center codewords
    alone cannot: measured recall collapsed to 0.67 with k=5 codewords
    vs 1.0 at k=25/budget 40·k). Deterministic, no training loop."""
    cents = [(c, [round(x, 6) for x in centers[c]]) for c in range(N_CLUSTERS)]
    cbs = [
        (m, c, [round(x, 6) for x in rows[c][1][m * SUB:(m + 1) * SUB]])
        for m in range(PQ_M)
        for c in range(PQ_K)
    ]
    return cents, cbs


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return round(d / (na * nb), 6)


def _seg_bytes(path):
    total = 0
    for root, _dirs, files in os.walk(path):
        if "/seg-" in root or os.path.basename(root).startswith("seg-"):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def test_pq_segments_measurably_smaller_than_full_vectors(spark, tmp_path):
    """The memory story: M ints/vector vs dim doubles — the PQ index's
    on-disk segment bytes must come in well under the full-vector
    index's for the same corpus."""
    centers, rows = _clustered()
    cents, cbs = _quantizers(centers, rows)
    emb = _emb(spark, rows)
    full = IVFIndexView(str(tmp_path / "full"), cents, dim=DIM)
    full.refresh(spark, emb, batch_id="b0")
    pq = IVFPQIndexView(str(tmp_path / "pq"), cents, cbs, dim=DIM)
    pq.refresh(spark, emb, batch_id="b0")
    fb, pb = _seg_bytes(tmp_path / "full"), _seg_bytes(tmp_path / "pq")
    assert 0 < pb < fb / 3, (pb, fb)


def test_pq_rerank_stage_is_exact_and_equals_full_ivf_at_full_budget(
    spark, tmp_path
):
    """Two exactness pins: (1) with a candidate budget that covers every
    probed-cell candidate, the PQ search returns EXACTLY the full-vector
    index's result (the ADC cut drops nothing; stage 2 is the same
    rounded cosine); (2) at any budget, emitted cos_sim values are the
    exact full-dim cosines and ranks order them desc with id
    tie-breaks."""
    centers, rows = _clustered()
    cents, cbs = _quantizers(centers, rows)
    emb = _emb(spark, rows)
    full = IVFIndexView(str(tmp_path / "full"), cents, dim=DIM, n_probe=2)
    full.refresh(spark, emb, batch_id="b0")
    pq = IVFPQIndexView(str(tmp_path / "pq"), cents, cbs, dim=DIM, n_probe=2)
    pq.refresh(spark, emb, batch_id="b0")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in full.query(spark, queries, k=3).collect()
    }
    # budget ≥ max probed-cell candidate count (2 probes × ~200/cell)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in pq.query(spark, queries, k=3, full_vectors=emb, rerank_mult=200).collect()
    }
    assert got == want and got

    vecs = {i: v for i, v in rows}
    tight = pq.query(spark, queries, k=3, full_vectors=emb, rerank_mult=2).collect()
    by_q: dict = {}
    for r in sorted(tight, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        for r in rs:
            assert r.cos_sim == pytest.approx(_cos(vecs[qid], vecs[r.neighbor_id]))
        order = [(-r.cos_sim, r.neighbor_id) for r in rs]
        assert order == sorted(order)


def test_pq_recall_at_least_full_ivf_on_clustered_set(spark, tmp_path):
    """Equal probe budget, generous re-rank budget (the measured
    ann_projected_rerank lesson — within a tight cluster the coarse
    signal is noise-scale): PQ recall vs the exact brute top-3 must be
    ≥ the full-vector IVF's recall."""
    centers, rows = _clustered()
    cents, cbs = _quantizers(centers, rows)
    emb = _emb(spark, rows)
    full = IVFIndexView(str(tmp_path / "full"), cents, dim=DIM, n_probe=2)
    full.refresh(spark, emb, batch_id="b0")
    pq = IVFPQIndexView(str(tmp_path / "pq"), cents, cbs, dim=DIM, n_probe=2)
    pq.refresh(spark, emb, batch_id="b0")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    vecs = {i: v for i, v in rows}

    def recall(result_rows):
        found: dict = {}
        for r in result_rows:
            found.setdefault(r.query_id, set()).add(r.neighbor_id)
        hits = total = 0
        for qid in found:
            truth = {
                v
                for _s, v in sorted(
                    ((_cos(vecs[qid], vecs[v]), v) for v in vecs if v != qid),
                    reverse=True,
                )[:3]
            }
            hits += len(truth & found[qid])
            total += 3
        return hits / total

    r_full = recall(full.query(spark, queries, k=3).collect())
    # measured budget sweep (2026-08-15): rerank_mult 10 → 0.77,
    # 20 → 0.97, 40 → 1.0 — the standard recall-vs-budget knob, same
    # shape as ann_projected_rerank's documented 3/10/20·k sweep
    r_pq20 = recall(pq.query(spark, queries, k=3, full_vectors=emb, rerank_mult=20).collect())
    assert r_pq20 >= 0.9  # clustered data: the composed path must be good
    r_pq40 = recall(pq.query(spark, queries, k=3, full_vectors=emb, rerank_mult=40).collect())
    assert r_pq40 >= r_full, (r_pq40, r_full)


def test_pq_protocol_replay_compact_spec_and_rebuild(spark, tmp_path):
    """Maintenance parity with the parent: replayed batch is a no-op;
    compaction resolves a re-ingested vec_id newest-wins ON CODES; a
    writer with different codebooks is rejected by the spec guard;
    rebuild from codes is blocked (lossy) and rebuild_pq retrains from
    the supplied corpus."""
    centers, rows = _clustered()
    cents, cbs = _quantizers(centers, rows)
    emb = _emb(spark, rows)
    pq = IVFPQIndexView(str(tmp_path / "pq"), cents, cbs, dim=DIM, n_probe=2)
    assert pq.refresh(spark, emb, batch_id="b0") is True
    assert pq.refresh(spark, emb, batch_id="b0") is False  # replay no-op

    # move vec 0 onto cluster 1's geometry and re-ingest
    moved = [(0, [x + 0.01 for x in centers[1]])]
    pq.refresh(spark, _emb(spark, moved), batch_id="b1")
    pq.compact(spark)
    assert len(pq.segments()) == 1
    row0 = pq.read(spark).filter("vec_id = 0").collect()
    assert len(row0) == 1 and row0[0].cell == 1  # newest assignment won

    # spec guard: same path, different codebooks → loud refusal
    other_cbs = [(m, c, [round(x + 1.0, 6) for x in v]) for m, c, v in cbs]
    clash = IVFPQIndexView(str(tmp_path / "pq"), cents, other_cbs, dim=DIM)
    with pytest.raises(ValueError, match="different quantizer"):
        clash.read(spark)

    with pytest.raises(TypeError, match="rebuild_pq"):
        pq.rebuild(spark, cents, str(tmp_path / "nope"))
    new = pq.rebuild_pq(spark, cents, cbs, emb, str(tmp_path / "pq2"))
    assert {r.vec_id for r in new.read(spark).collect()} == {
        r.vec_id for r in pq.read(spark).collect()
    }


def test_pq_query_empty_corners_and_gate_parity(spark, tmp_path):
    """The parent's probe disciplines carry over: empty query frame
    returns the caller-typed empty schema; forcing the probe gate both
    ways returns identical results."""
    centers, rows = _clustered()
    cents, cbs = _quantizers(centers, rows)
    emb = _emb(spark, rows)
    pq = IVFPQIndexView(str(tmp_path / "pq"), cents, cbs, dim=DIM, n_probe=2)
    pq.refresh(spark, emb, batch_id="b0")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    small = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in pq.query(
            spark, queries, k=3, probe_collect_cap=10**6, full_vectors=emb
        ).collect()
    }
    big = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in pq.query(spark, queries, k=3, probe_collect_cap=1, full_vectors=emb).collect()
    }
    assert small and small == big

    sq = spark.createDataFrame(
        [], "query_id string, embedding array<double>"
    )
    empty = pq.query(spark, sq, k=3, full_vectors=emb)
    assert [f.name for f in empty.schema.fields] == [
        "query_id", "neighbor_id", "cell", "cos_sim", "rank",
    ]
    assert empty.schema["query_id"].dataType.simpleString() == "string"
    assert empty.count() == 0


def test_pq_index_maintained_from_a_stream(spark, tmp_path):
    """Composition with the streaming MV maintainer (the parent's
    contract carries over): embeddings streamed through mv_ingest_stream
    land as codes exactly once, a fresh-checkpoint full replay changes
    nothing, and the streamed state equals a one-shot refresh."""
    from machinelearningalgomapreduce_spark.operators.matview import (
        mv_ingest_stream,
    )

    centers, rows = _clustered()
    cents, cbs = _quantizers(centers, rows)
    emb = _emb(spark, rows)
    src = str(tmp_path / "src")
    emb.repartition(3).write.parquet(src)
    pq = IVFPQIndexView(str(tmp_path / "pq_s"), cents, cbs, dim=DIM)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = mv_ingest_stream(spark, stream, pq, str(tmp_path / "ck1"))
    drain(q, 420)
    state = {(r.vec_id, tuple(r.codes), r.cell) for r in pq.read(spark).collect()}
    assert len(state) == len(rows)
    q2 = mv_ingest_stream(spark, stream, pq, str(tmp_path / "ck2"))
    drain(q2, 420)
    assert {
        (r.vec_id, tuple(r.codes), r.cell) for r in pq.read(spark).collect()
    } == state
    oneshot = IVFPQIndexView(str(tmp_path / "pq_o"), cents, cbs, dim=DIM)
    oneshot.refresh(spark, emb, batch_id="all")
    assert {
        (r.vec_id, tuple(r.codes), r.cell) for r in oneshot.read(spark).collect()
    } == state


def test_pq_query_scan_is_partition_pruned(spark, tmp_path):
    """The probed-cell filter must reach the PQ segment scans as a
    PARTITION filter too — the codes read touches only the probed cells'
    directories (the parent's pruning contract carries over)."""
    centers, rows = _clustered()
    cents, cbs = _quantizers(centers, rows)
    emb = _emb(spark, rows)
    pq = IVFPQIndexView(str(tmp_path / "pq_p"), cents, cbs, dim=DIM, n_probe=2)
    pq.refresh(spark, emb, batch_id="b0")
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq.query(spark, queries, k=3, full_vectors=emb)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_pq_query_callable_full_vectors_matches_eager(spark, tmp_path):
    """r12 ADVICE: a CALLABLE full_vectors receives the distinct ADC
    candidate vec_ids and returns a frame covering them — results must
    be identical to the eager-DataFrame form, and the callable must see
    only a batch-bounded id set (≤ rerank_mult·k per query), which is
    what lets the streaming sink prune its admission-log read."""
    centers, rows = _clustered()
    cents, cbs = _quantizers(centers, rows)
    emb = _emb(spark, rows)
    pq = IVFPQIndexView(str(tmp_path / "pqc"), cents, cbs, dim=DIM, n_probe=2)
    pq.refresh(spark, emb, batch_id="b0")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in pq.query(
            spark, queries, k=3, full_vectors=emb, rerank_mult=3
        ).collect()
    }
    seen = {}

    def fv_for(cand_ids):
        ids = {r.vec_id for r in cand_ids.collect()}
        seen["n"] = len(ids)
        return emb.join(cand_ids, "vec_id", "semi")

    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in pq.query(
            spark, queries, k=3, full_vectors=fv_for, rerank_mult=3
        ).collect()
    }
    assert got == want and got
    n_queries = queries.count()
    assert 0 < seen["n"] <= 3 * 3 * n_queries  # rerank_mult·k per query
