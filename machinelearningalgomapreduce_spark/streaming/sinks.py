"""Streaming ingestion sinks (SURVEY.md §2E library tier).

``dedup_ingest_stream`` is the streaming twin of
operators/incremental.py::q_incremental_dedup — continuous corpus
ingestion where each micro-batch admits only documents whose content hash
has never been seen, maintaining a persistent hash index on disk via
``foreachBatch``. This is the shape a 100 TB training-data pipeline runs
for its landing zone: the heavy state (the seen-hash index) lives in
cheap columnar storage keyed by the hash, NOT in the streaming state
store, so index size is unbounded by executor memory and the stream
restarts for free from the checkpoint + index.

Exactly-once posture: foreachBatch is at-least-once on retry; the sink is
idempotent by construction — a replayed epoch recomputes the identical
survivor set (its own index entries are excluded from the seen-set) and
overwrites its own epoch-keyed output directory. Within one batch the
survivor per hash is the min doc_id (min_by — deterministic).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet — the shared cached-schema
    idiom lives in windows.stream_table (one copy to keep in sync)."""
    from machinelearningalgomapreduce_spark.streaming.windows import stream_table

    return stream_table(spark, sf_dir, "documents.parquet")


def _ingest_batch(spark: SparkSession, index_dir: str, out_dir: str, run_key: str):
    """Build the per-batch merge function over a persistent hash index.

    ``run_key`` scopes batch ids: Structured Streaming numbers epochs from
    0 PER CHECKPOINT, so the epoch identity stamped into the index (and
    the output directory name) is (run_key, batch_id) — otherwise batch 0
    of a second ingestion run would be mistaken for a replay of batch 0 of
    the first and wrongly excluded from the seen-set."""

    run_digest = hashlib.md5(run_key.encode()).hexdigest()[:8]

    def ingest(batch: DataFrame, batch_id: int) -> None:
        _recover_index(index_dir)
        # Zero-padded batch id: the compaction's min_by orders epoch stamps
        # LEXICOGRAPHICALLY, and an unpadded "x/10" sorts before "x/2" — so
        # if multi-epoch rows for one hash ever arise (crash corners), the
        # kept stamp would not be the earliest batch as documented.
        epoch = f"{run_digest}/{batch_id:010d}"
        # NULL text hashes to a sentinel, not NULL: a NULL content_hash
        # would group ALL null-text docs of a batch to one survivor yet
        # never match the seen-set anti-join (NULL != NULL), re-admitting
        # one per batch — dedup outcome would depend on batching. With
        # the sentinel, all null-text docs are one content class,
        # deterministically, within and across batches.
        hashed = batch.withColumn(
            "content_hash",
            F.coalesce(F.md5("text"), F.lit("__NULL_TEXT__")),
        )
        # Within-batch survivor: min doc_id per hash (deterministic).
        survivors = (
            hashed.groupBy("content_hash")
            .agg(F.min_by(F.struct(*hashed.columns), "doc_id").alias("row"))
            .select("row.*")
        )
        if os.path.exists(index_dir):
            # Exclude entries stamped with THIS batch id: a replayed epoch
            # then sees exactly the pre-batch index state and recomputes
            # the identical survivor set no matter where the previous
            # attempt crashed (determinism is what makes the overwrite
            # below safe).
            # Exclusion matches BOTH stamp formats: rows written before the
            # zero-padding change carry the unpadded 'digest/5' form — a
            # replay crossing that upgrade must still see the pre-batch
            # index state, not its own old-format survivors.
            seen = (
                spark.read.parquet(index_dir)
                .filter(
                    ~F.col("epoch").isin(epoch, f"{run_digest}/{batch_id}")
                )
                .select("content_hash")
            )
            survivors = survivors.join(
                F.broadcast(seen) if _index_is_small(index_dir) else seen,
                "content_hash",
                "left_anti",
            )
        # Idempotent two-write protocol (no transactional sink needed):
        # docs land in a BATCH-KEYED directory with overwrite — a replayed
        # epoch rewrites the same directory instead of appending a second
        # copy; the index append MAY duplicate a hash on replay, which is
        # harmless (it is consumed as a set by the anti-join) and
        # compactable offline.
        survivors.persist()
        try:
            # A replay crossing the zero-padding upgrade must supersede the
            # PRE-upgrade output directory too, not write a second copy of
            # the batch under the padded name.
            import shutil as _shutil

            legacy = os.path.join(out_dir, f"epoch={run_digest}_{batch_id}")
            if os.path.exists(legacy):
                _shutil.rmtree(legacy)
            survivors.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"epoch={epoch.replace('/', '_')}")
            )
            survivors.select(
                "content_hash", "doc_id", F.lit(epoch).alias("epoch")
            ).write.mode("append").parquet(index_dir)
        finally:
            survivors.unpersist()

    return ingest


def _index_is_small(index_dir: str, cap_bytes: int | None = None) -> bool:
    """Broadcast the seen-hash index only while it provably fits — the
    shared functions/storage.py discipline; past the cap the anti-join
    falls back to a shuffled hash join (the 100 TB path — at that point
    the index itself is the big side and AQE plans it)."""
    from machinelearningalgomapreduce_spark.functions.storage import (
        BROADCAST_CAP_BYTES,
        dir_size_below,
    )

    return dir_size_below(
        index_dir, BROADCAST_CAP_BYTES if cap_bytes is None else cap_bytes
    )


def _recover_aside(path: str) -> None:
    """Shared rename-aside recovery for the swap protocol users in this
    module (the dedup index and the SCD2 dimension): if a crash left no
    live directory but an `.old-` sibling exists (the window between
    rename-aside and rename-in), restore the newest sibling — otherwise
    the next job would see "nothing here" and silently start over
    (re-admitting every already-ingested document / merging against an
    empty dimension)."""
    import glob

    if os.path.exists(path):
        return
    # glob.escape: a '[' or ']' in the path (pytest tmp dirs, bracketed
    # data paths) would otherwise turn the pattern into a character class
    # that matches nothing — recovery silently no-ops and the pipeline
    # restarts from an empty index/dimension.
    siblings = sorted(glob.glob(glob.escape(path) + ".old-*"))
    if siblings:
        os.rename(siblings[-1], path)


def _clean_stale_siblings(path: str) -> list[str]:
    """Remove crash debris the swap protocol can leave behind: any
    `.staging-*` twin (a swap that died before rename-aside — the live
    dir is still authoritative) and, when the live dir EXISTS, any
    `.old-*` sibling (a swap that died between rename-in and the final
    rmtree — the sibling is a stale full-size copy recovery will never
    consume). Run AFTER _recover_aside, never instead of it."""
    import glob
    import shutil

    removed = []
    for d in glob.glob(glob.escape(path) + ".staging-*"):
        shutil.rmtree(d, ignore_errors=True)
        removed.append(os.path.basename(d))
    if os.path.exists(path):
        for d in glob.glob(glob.escape(path) + ".old-*"):
            shutil.rmtree(d, ignore_errors=True)
            removed.append(os.path.basename(d))
    return removed


def _recover_index(index_dir: str) -> None:
    _recover_aside(index_dir)
    _clean_stale_siblings(index_dir)


def compact_dedup_index(spark: SparkSession, index_dir: str) -> dict:
    """Offline maintenance for the dedup hash index (the "compactable
    offline" promise in _ingest_batch): the index is an append-only pile
    of per-epoch parquet files that accumulates one file set per batch
    forever, plus duplicate rows from replayed epochs (the two-write
    protocol may re-append the same (hash, epoch) rows — harmless for
    correctness, pure bloat). Compaction rewrites it as ONE deduplicated,
    hash-partitioned parquet: one row per content_hash, keeping the
    deterministic min (epoch, doc_id) representative WITH its original
    epoch stamp — the stamp must survive so a future replay of the most
    recent epoch still excludes its own entries from the seen-set.

    Crash-safe swap (the scd2_ingest_stream protocol): write staging,
    rename the live index ASIDE (never delete first), rename staging in,
    then drop the sibling; every crash window leaves either the live dir
    or its `.old-` sibling, and _recover_index (run at the start of every
    ingest batch and every compaction) restores the sibling.

    Single writer: never run concurrently with an active ingestion run —
    same rule as the views in operators/matview.py.

    100 TB shape: one hash aggregate over the index relation (map-side
    combinable, never touches documents), written back hash-partitioned
    on content_hash into a BOUNDED file count (~64 MB per file, sized
    from the pre-compaction bytes) — the compacted layout also makes the
    ingest-side anti-join's big-side scan cheaper (fewer, larger files;
    a single column-pruned read).

    Returns {"rows_before", "rows_after", "files_before", "files_after"}.
    """
    import shutil
    import time

    _recover_index(index_dir)
    if not os.path.exists(index_dir):
        return {"rows_before": 0, "rows_after": 0,
                "files_before": 0, "files_after": 0}

    def _count_files(d: str) -> int:
        return sum(
            1
            for root, _dirs, files in os.walk(d)
            for f in files
            if f.endswith(".parquet")
        )

    idx = spark.read.parquet(index_dir)
    rows_before = idx.count()
    files_before = _count_files(index_dir)
    # Order by the PARSED numeric batch id, not the raw stamp: padded and
    # pre-upgrade unpadded stamps then sort identically, and the kept
    # representative is genuinely the earliest batch (digest ties break on
    # the raw stamp, then doc_id — deterministic).
    batch_no = F.split(F.col("epoch"), "/").getItem(1).cast("long")
    compacted = (
        idx.groupBy("content_hash")
        .agg(
            F.min_by(
                F.struct("doc_id", "epoch"),
                F.struct(batch_no.alias("b"), F.col("epoch"), F.col("doc_id")),
            ).alias("r")
        )
        .select("content_hash", "r.doc_id", "r.epoch")
    )
    stamp = int(time.time() * 1000)
    staging = index_dir + f".staging-{stamp}"
    old = index_dir + f".old-{stamp}"
    # Hash-partitioned into a BOUNDED file count sized from the on-disk
    # bytes (~64 MB per output file): repartition(col) alone would emit
    # spark.sql.shuffle.partitions files — for a small index MORE files
    # than before, the opposite of compaction's fewer-larger promise.
    total_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, files in os.walk(index_dir)
        for f in files
    )
    n_out = max(1, total_bytes // (64 << 20) + (1 if total_bytes % (64 << 20) else 0))
    compacted.repartition(int(n_out), F.col("content_hash")).write.mode(
        "overwrite"
    ).parquet(staging)
    rows_after = spark.read.parquet(staging).count()
    os.rename(index_dir, old)
    os.rename(staging, index_dir)
    shutil.rmtree(old)
    return {
        "rows_before": rows_before,
        "rows_after": rows_after,
        "files_before": files_before,
        "files_after": _count_files(index_dir),
    }


def scd2_ingest_stream(
    spark: SparkSession,
    updates_stream: DataFrame,
    dim_dir: str,
    checkpoint_dir: str,
    key: str,
    tracked: list[str],
    ts_col: str = "ts",
):
    """Streaming dimension maintenance: each micro-batch of updates is
    MERGED into the on-disk SCD2 dimension via
    operators/incremental.py::scd2_apply (composition of verified pieces —
    the foreachBatch twin of a MERGE INTO job chain).

    Within a batch, only the LATEST update per key applies (max_by ts);
    scd2_apply is idempotent on identical updates, so a replayed epoch
    re-merges to the same dimension. Crash-safe swap protocol: the merged
    dimension is written to a staging dir (rewriting a parquet dir in
    place while the merge plan is still reading it would corrupt the
    read), the live dir is renamed ASIDE (never deleted first), staging is
    renamed in, and only then is the old version removed — every crash
    window leaves either the live dir or its `.old-` sibling intact, and
    `_recover_dim` restores the sibling on the next batch. Tracked columns
    are carried as strings in the bootstrap (empty-dimension) schema."""
    import shutil

    from machinelearningalgomapreduce_spark.operators.incremental import scd2_apply

    if not tracked:
        raise ValueError("scd2_ingest_stream needs at least one tracked column")

    def merge(batch: DataFrame, batch_id: int) -> None:
        _recover_dim(dim_dir)
        latest = (
            batch.groupBy(key)
            .agg(F.max_by(F.struct(*batch.columns), ts_col).alias("r"))
            .select("r.*")
        )
        if os.path.exists(dim_dir):
            dim = spark.read.parquet(dim_dir)
        else:
            # TYPED bootstrap derived from this batch's schema: an
            # all-string empty frame would union-widen every tracked
            # column and valid_from/valid_to to STRING permanently (set
            # operations coerce string+T to string), and later ts
            # comparisons would go through lossy double casts.
            proto = latest.select(
                F.col(key),
                *[F.col(c) for c in tracked],
                F.col(ts_col).alias("valid_from"),
                F.col(ts_col).alias("valid_to"),
            )
            dim = spark.createDataFrame([], proto.schema)
        merged = scd2_apply(dim, latest, key, tracked, ts_col)
        # zero-padded suffixes: _recover_aside picks the newest sibling
        # LEXICOGRAPHICALLY, the same ordering hazard the epoch stamps pad
        # against (a stale '.old-2' surviving an ignore_errors rmtree must
        # never outsort a fresh '.old-10')
        staging = dim_dir + f".staging-{batch_id:010d}"
        old = dim_dir + f".old-{batch_id:010d}"
        merged.write.mode("overwrite").parquet(staging)
        if os.path.exists(dim_dir):
            os.rename(dim_dir, old)
        os.rename(staging, dim_dir)
        if os.path.exists(old):
            shutil.rmtree(old)

    return (
        updates_stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _recover_dim(dim_dir: str) -> None:
    _recover_aside(dim_dir)
    _clean_stale_siblings(dim_dir)


def dedup_ingest_stream(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
):
    """Run the incremental-dedup ingestion over the documents stream.
    Default trigger is availableNow — drain everything currently in the
    source and stop. ``processing_time=`` switches to a LIVE
    trigger(processingTime=...) that keeps polling the source (r14: the
    sustained micro-batch serving shape; the caller stops the query);
    ``max_files_per_trigger`` bounds each micro-batch's file intake so a
    directory-layout source arrives as a stream of batches instead of
    one drain. The ADMITTED CONTENT-HASH SET is batch-partitioning-
    independent (the seen-set is the index; exactly one survivor per
    hash under any split — only which doc_id represents a hash can
    shift when its copies straddle a boundary); at equal
    max_files_per_trigger the live-trigger run is row-identical to the
    availableNow run (soak-test-pinned). Returns the StreamingQuery
    (caller awaits termination or stops it)."""
    from machinelearningalgomapreduce_spark.streaming.windows import stream_table

    run_key = os.path.abspath(checkpoint_dir)
    docs = stream_table(
        spark, sf_dir, "documents.parquet",
        max_files_per_trigger=max_files_per_trigger,
    )
    w = (
        docs.writeStream.foreachBatch(_ingest_batch(spark, index_dir, out_dir, run_key))
        .option("checkpointLocation", checkpoint_dir)
    )
    if processing_time is None:
        w = w.trigger(availableNow=True)
    else:
        w = w.trigger(processingTime=processing_time)
    return w.start()


def _semantic_ingest_batch(
    spark: SparkSession,
    index,
    out_dir: str,
    run_key: str,
    threshold: float,
    full_vectors=None,
):
    """Per-batch admission function over a persisted IVF index
    (operators/ivf_index.py::IVFIndexView) — the SEMANTIC twin of
    _ingest_batch's exact-hash admission: a new vector is admitted only
    if the index holds no neighbor with rounded cosine ≥ ``threshold``
    AMONG ITS PROBED CELLS — admission recall is the index's multi-probe
    recall (approximate by IVF construction, unlike the hash twin's
    exact seen-set; size n_probe to the corpus geometry, measured via
    similarity.ann_recall_frame).

    Exactly-once protocol (simpler than the hash path's epoch-stamp
    exclusion, because the index carries its own replay ledger):

    1. ledger short-circuit — if this epoch is already in
       ``index.applied_batches()``, BOTH writes below completed (output
       is written before the index refresh), so the whole batch no-ops;
    2. within-batch collapse — blocked near-dup pairs over the batch
       (dedup.embedding_dedup_blocked_frame) → CC clusters → min-vec_id
       survivor per cluster (deterministic);
    3. cross-batch admission — survivors query the index
       (k=1, exclude_self on vec_id); a top-1 cosine ≥ threshold means a
       near-dup is already indexed → dropped. Works over an
       ``IVFPQIndexView`` too (r12): the PQ re-rank's full-vector frame
       is derived from the admission log (see the inline comment), so
       admission recall then also includes the ADC candidate-selection
       approximation;
    4. accepted rows overwrite the epoch-keyed output directory;
    5. ``index.refresh(accepted, epoch)`` appends ONE cell-partitioned
       segment and commits the epoch to the ledger — the commit point.

    OUTPUT CONTRACT (r11 review): ``out_dir`` is a per-epoch admission
    LOG — each ``batch=…`` directory is exactly that epoch's admitted
    rows, and a vec_id re-sent in a later epoch with a changed (non-
    near-dup) embedding is admitted AGAIN (an upsert), so a flat read of
    out_dir can hold several rows per vec_id across runs. The current
    deduplicated corpus SNAPSHOT is the index (``index.read``, one row
    per vec_id after compaction, newest-wins) — epoch directories cannot
    be ordered across runs (run digests are not monotonic), so the index
    manifest is the only authority on which upsert won.

    A crash anywhere before 5 replays into an UNCHANGED index state, so
    steps 2-4 recompute bit-identically (deterministic plans, rounded
    cosines, id tie-breaks) and the output overwrite is idempotent.

    100 TB shape: admission cost per batch is one blocked self-join over
    the BATCH (cells auto-sized) + one index probe reading ~n_probe/k of
    the index via partition pruning; the index grows O(accepted)."""
    from machinelearningalgomapreduce_spark.operators.dedup import (
        embedding_dedup_blocked_frame,
        min_label_clusters,
    )

    run_digest = hashlib.md5(run_key.encode()).hexdigest()[:8]

    def ingest(batch: DataFrame, batch_id: int) -> None:
        epoch = f"{run_digest}/{batch_id:010d}"
        if epoch in index.applied_batches():
            return  # replay of a fully-committed epoch — both writes done
        batch = batch.select("vec_id", "embedding").localCheckpoint()
        # Within-batch near-dup collapse (min vec_id per CC cluster) at
        # the CALLER's threshold, passed INTO the operator (r12): the
        # old verify=False-then-filter pattern read rep-level candidates
        # only, which after the rep-collapse carried no within-group
        # pairs — two EXACT-duplicate vectors in one batch would both
        # have been admitted. threshold= filters at the rep level and
        # expands member pairs (incl. exact-dup pairs at cos 1.0), so a
        # non-default threshold still governs BOTH stages (r11 review).
        # Checkpoint the pair plan: the CC loop re-walks its edge
        # lineage every iteration, and the kmeans-assignment self-join
        # is far too heavy to recompute per iteration.
        pairs = (
            embedding_dedup_blocked_frame(spark, batch, threshold=threshold)
            .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
            .localCheckpoint()
        )
        # empty pair frame short-circuits inside the CC fixpoint (empty
        # labels converge on the first read) — no branch needed
        losers = (
            min_label_clusters(pairs)
            .filter(~F.col("keep"))
            .select(F.col("doc_id").alias("vec_id"))
        )
        survivors = batch.join(losers, "vec_id", "left_anti")
        # cross-batch: drop survivors whose indexed top-1 ≥ threshold
        if index.current_version() and index.segments():
            qframe = survivors.select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            if getattr(index, "pq_m", None) and full_vectors is not None:
                matches = index.query(
                    spark, qframe, k=1, full_vectors=full_vectors
                )
            elif getattr(index, "pq_m", None):
                # PQ-backed admission (VERDICT r11 item 3): an
                # IVFPQIndexView stores codes only, so its exact re-rank
                # stage needs a full-vector frame. The admission LOG is
                # that corpus — every vector THIS SINK indexed was
                # written to out_dir BEFORE its index commit, so the log
                # covers the index. An index populated OUTSIDE the sink
                # has no log coverage: its vectors would silently drop
                # from the re-rank inner join and their near-dups be
                # admitted — refuse loudly and point at the
                # full_vectors= escape hatch (r12 review). An upserted
                # vec_id can hold several log rows; resolve newest-wins
                # within this run (the zero-padded `batch` partition
                # column sorts lexicographically = numerically),
                # deterministic-but-arbitrary across runs — the same
                # authority caveat the OUTPUT CONTRACT above owns. The
                # CURRENT epoch's own directory is excluded: a crash
                # between the output write and the index refresh must
                # replay bit-identically, and reading the crashed
                # attempt's rows back would let an upserted embedding
                # flip near-threshold admissions (r12 review). At 100 TB
                # this is the index option that fits the storage budget:
                # the hot cell-partitioned index holds M ints/vector;
                # the re-rank touches ≤ rerank_mult rows per query from
                # the cold log.
                if not os.path.isdir(out_dir):
                    raise ValueError(
                        "PQ-backed semantic dedup: the index already has "
                        f"segments but the admission log {out_dir} does "
                        "not exist, so the exact re-rank has no "
                        "full-vector corpus for the indexed vectors. "
                        "Either let THIS sink build the index from "
                        "scratch, or pass full_vectors= covering every "
                        "indexed vec_id."
                    )
                pref = F.struct(
                    F.col("batch")
                    .startswith(run_digest + "-")
                    .cast("int")
                    .alias("cur"),
                    F.col("batch").alias("b"),
                )

                # Pruned-log re-rank corpus (r12 ADVICE): the old eager
                # form groupBy-aggregated the ENTIRE admission log every
                # micro-batch — O(total corpus) shuffle per batch at the
                # 100 TB target. As a callable it receives exactly the
                # ADC candidates the re-rank touches and semi-joins the
                # log on them BEFORE the newest-wins aggregate (the
                # candidate set is batch-bounded, so it broadcasts).
                # Coverage is cross-checked loudly: a candidate the
                # INDEX surfaced but the LOG cannot re-rank means log
                # epochs were deleted out from under the index — the
                # silent failure mode is near-dups getting ADMITTED, so
                # refuse instead (the full_vectors= escape hatch covers
                # externally-populated indexes).
                def fv_for(cand_ids):
                    cand_ids = cand_ids.localCheckpoint()

                    def refuse(n_missing):
                        raise ValueError(
                            "PQ-backed semantic dedup: the admission log "
                            f"{out_dir} has no full vectors for "
                            f"{n_missing} indexed candidate(s) — log "
                            "epochs were deleted or the index was "
                            "populated outside this sink; re-ranking "
                            "without them would silently admit their "
                            "near-duplicates. Restore the log or pass "
                            "full_vectors= covering every indexed vec_id."
                        )

                    # No epoch pre-check (r13 ADVICE): a log with every
                    # prior epoch gone reads as an empty frame and the
                    # n_missing count below issues the same refusal (and
                    # the same empty result when nothing was probed) —
                    # one uniform coverage path, no driver-side listing
                    # that hard-codes the local-fs `batch=` layout. The
                    # one corner the listing caught — a log directory
                    # holding ZERO epochs, where parquet schema inference
                    # itself fails — routes to the identical refusal.
                    # Only THAT failure is expected here (AnalysisException:
                    # path missing / unable to infer schema); anything else
                    # — corrupt epoch file, permissions, transient FS —
                    # must propagate, not masquerade as the coverage
                    # refusal (r14 ADVICE).
                    from pyspark.errors import AnalysisException

                    try:
                        log = spark.read.parquet(out_dir)
                    except AnalysisException:
                        n = cand_ids.count()
                        if n:
                            refuse(n)
                        return spark.createDataFrame(
                            [], "vec_id long, embedding array<double>"
                        )
                    fv = (
                        log
                        .filter(
                            F.col("batch") != f"{run_digest}-{batch_id:010d}"
                        )
                        .join(F.broadcast(cand_ids), "vec_id", "semi")
                        .select("vec_id", "embedding", pref.alias("o"))
                        .groupBy("vec_id")
                        .agg(F.max_by("embedding", "o").alias("embedding"))
                        .localCheckpoint()
                    )
                    n_missing = cand_ids.join(fv, "vec_id", "left_anti").count()
                    if n_missing:
                        refuse(n_missing)
                    return fv

                matches = index.query(spark, qframe, k=1, full_vectors=fv_for)
            else:
                matches = index.query(spark, qframe, k=1)
            hits = matches.filter(F.col("cos_sim") >= threshold).select(
                F.col("query_id").alias("vec_id")
            )
            accepted = survivors.join(hits, "vec_id", "left_anti")
        else:
            accepted = survivors
        accepted = accepted.localCheckpoint()  # pin ONE evaluation for both writes
        accepted.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={run_digest}-{batch_id:010d}")
        )
        index.refresh(spark, accepted, batch_id=epoch)  # THE commit

    return ingest


def semantic_dedup_ingest_stream(
    spark: SparkSession,
    sf_dir: str,
    index,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float | None = None,
    full_vectors=None,
    *,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
):
    """Streaming semantic-dedup ingestion: drain the embeddings source,
    admitting only vectors with no near-dup (rounded cosine ≥ threshold)
    already in the persisted IVF ``index``
    (operators/ivf_index.py::IVFIndexView), and indexing the admitted
    ones. Default trigger is availableNow (drain and stop);
    ``processing_time=``/``max_files_per_trigger=`` follow
    dedup_ingest_stream's live-trigger lane. Admission depends on BATCH
    PARTITIONING (a near-dup pair arriving together collapses to the
    min-vec_id survivor; arriving apart, first-arrival wins) but NOT on
    trigger mode: at equal max_files_per_trigger the live-trigger run
    admits exactly the availableNow run's set (soak-test-pinned).
    Returns the StreamingQuery (caller awaits termination or stops
    it)."""
    from machinelearningalgomapreduce_spark.operators.dedup import (
        EMBEDDING_COSINE_THRESHOLD,
    )
    from machinelearningalgomapreduce_spark.streaming.windows import stream_table

    thr = EMBEDDING_COSINE_THRESHOLD if threshold is None else threshold
    run_key = os.path.abspath(checkpoint_dir)
    vecs = stream_table(
        spark, sf_dir, "embeddings.parquet",
        max_files_per_trigger=max_files_per_trigger,
    )
    w = (
        vecs.writeStream.foreachBatch(
            _semantic_ingest_batch(
                spark, index, out_dir, run_key, thr, full_vectors
            )
        )
        .option("checkpointLocation", checkpoint_dir)
    )
    if processing_time is None:
        w = w.trigger(availableNow=True)
    else:
        w = w.trigger(processingTime=processing_time)
    return w.start()
