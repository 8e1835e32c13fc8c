"""Structured Streaming wrappers agree with their oracle-checked batch
twins when driven to completion with trigger(availableNow)."""

from __future__ import annotations

from pyspark.sql import functions as F

from machinelearningalgomapreduce_spark.operators.events import q_events_tumbling
from machinelearningalgomapreduce_spark.streaming import windows as sw

from tests.conftest import drain


def test_tumbling_stream_matches_batch(spark, sf_dir):
    stream = sw.tumbling_counts(sw.stream_events(spark, sf_dir))
    got = sw.run_to_memory(stream, "t_tumbling")
    batch = q_events_tumbling(spark, sf_dir).select(
        "window_start", "event_type", "n_events", "sum_value"
    )
    g = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in got.collect()}
    b = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in batch.collect()}
    assert g == b


def test_session_stream_counts(spark, sf_dir):
    from machinelearningalgomapreduce_spark.operators.events import q_session_stats

    stream = sw.session_counts(sw.stream_events(spark, sf_dir))
    got = sw.run_to_memory(stream, "t_sessions")
    batch = q_session_stats(spark, sf_dir)
    # Same session partitioning → same number of sessions and same total events.
    assert got.count() == batch.count()
    assert (
        got.agg(F.sum("n_events")).first()[0] == batch.agg(F.sum("n_events")).first()[0]
    )


def test_stream_dedup_drops_duplicates(spark, sf_dir):
    stream = sw.dedup_late_events(sw.stream_events(spark, sf_dir))
    got = sw.run_to_memory(stream, "t_dedup", output_mode="append")
    n_ids = got.select("event_id").distinct().count()
    assert got.count() == n_ids


def test_stream_static_blocklist_filters_users(spark, sf_dir):
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    events = load_tables(spark, sf_dir).events
    blocked = events.select("user_id").distinct().limit(3)
    blocked_ids = {r.user_id for r in blocked.collect()}
    stream = sw.filter_against_blocklist(sw.stream_events(spark, sf_dir), blocked)
    got = sw.run_to_memory(stream, "t_blocklist", output_mode="append")
    # No blocked user survives, and everything else does.
    assert not ({r.user_id for r in got.select("user_id").distinct().collect()} & blocked_ids)
    expected = events.join(blocked, "user_id", "left_anti").count()
    assert got.count() == expected


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """The stream-stream interval join emits exactly the (error, click)
    pairs the batch bucketed range join generates."""
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables
    from machinelearningalgomapreduce_spark.streaming import windows as SW

    out = SW.run_to_memory(
        SW.interval_join_stream(SW.stream_events(spark, sf_dir)),
        "t_interval_join",
        output_mode="append",
    )
    got = {(r.event_id, r.c_ts) for r in out.collect()}

    ev = load_tables(spark, sf_dir).events
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("e_ts")
    )
    batch = errors.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("e_ts") - F.expr("INTERVAL 10 minutes"))
        & (F.col("c_ts") < F.col("e_ts")),
    )
    want = {(r.event_id, r.c_ts) for r in batch.collect()}
    assert got == want
    assert len(got) > 0


def test_foreachbatch_incremental_refresh_matches_batch(spark, sf_dir, tmp_path):
    """The streaming side of operators/incremental.py: partial aggregate
    states merged across micro-batches (foreachBatch) equal the one-pass
    batch aggregate — DECIMAL-exact sums make the merge algebra lossless
    regardless of how the stream was chopped into batches."""
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables

    ev = load_tables(spark, sf_dir).events
    src = str(tmp_path / "events_stream")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    partials = []

    def merge_batch(batch_df, batch_id):
        rows = (
            batch_df.groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
            )
            .collect()
        )
        partials.extend((r.event_type, r.n, r.sv) for r in rows)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(partials) > 5, "expected multiple micro-batch partials"

    merged = {}
    for et, n, sv in partials:
        cn, cs = merged.get(et, (0, 0))
        merged[et] = (cn + n, cs + sv)

    want = {
        r.event_type: (r.n, r.sv)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
        )
        .collect()
    }
    assert {k: (n, s) for k, (n, s) in merged.items()} == want


def test_wilson_ctr_stream_matches_batch(spark, sf_dir):
    """availableNow over the whole fixture ≡ the batch q_wilson_ctr."""
    from machinelearningalgomapreduce_spark.operators.evaluation import q_wilson_ctr
    from machinelearningalgomapreduce_spark.streaming.windows import (
        run_to_memory, stream_events, wilson_ctr_stream,
    )

    got = {
        r["event_type"]: (r["n"], r["x"], r["p_hat"], r["wilson_lo"], r["wilson_hi"])
        for r in run_to_memory(
            wilson_ctr_stream(stream_events(spark, sf_dir)), "wilson_stream"
        ).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["x"], r["p_hat"], r["wilson_lo"], r["wilson_hi"])
        for r in q_wilson_ctr(spark, sf_dir).collect()
    }
    assert got == want


def test_cm_sketch_stream_matches_batch_build(spark, sf_dir):
    """The live sketch over the full stream ≡ a batch md5 Count-Min build
    on the same keys — cell-for-cell (the mergeability contract)."""
    from machinelearningalgomapreduce_spark.operators.sketches import (
        CMQ_DEPTH, CMQ_WIDTH, _md5_hex_int,
    )
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables
    from machinelearningalgomapreduce_spark.streaming.windows import (
        cm_sketch_stream, run_to_memory, stream_events,
    )
    from pyspark.sql import functions as F

    got = {
        (r["row"], r["col_idx"]): r["cnt"]
        for r in run_to_memory(
            cm_sketch_stream(stream_events(spark, sf_dir)), "cm_stream"
        ).collect()
    }
    t = load_tables(spark, sf_dir)
    key = F.col("user_id")
    buckets = F.array(
        *[
            F.pmod(_md5_hex_int(key, f"cm{r}:", 3), F.lit(CMQ_WIDTH))
            for r in range(CMQ_DEPTH)
        ]
    )
    want = {
        (r["row"], r["col_idx"]): r["cnt"]
        for r in t.events.select(F.posexplode(buckets).alias("row", "col_idx"))
        .groupBy("row", "col_idx")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want


def test_compact_dedup_index_preserves_semantics(spark, sf_dir, tmp_path):
    """Compaction of the append-only hash index: replay-duplicated rows
    collapse to one per content_hash, the epoch stamps survive (a replay
    of the most recent epoch still excludes its own entries), and a later
    epoch over the same docs still admits nothing."""
    from machinelearningalgomapreduce_spark.sources.catalog import load_tables
    from machinelearningalgomapreduce_spark.streaming.sinks import (
        _ingest_batch,
        compact_dedup_index,
    )

    index_dir = str(tmp_path / "idx")
    out_dir = str(tmp_path / "out")
    docs = load_tables(spark, sf_dir).documents.filter(F.col("doc_id") < 300)
    half = docs.filter(F.col("doc_id") < 150)
    ingest = _ingest_batch(spark, index_dir, out_dir, "runC")

    ingest(half, 0)
    ingest(half, 0)   # replayed epoch → duplicate (hash, epoch) index rows
    ingest(docs, 1)
    ingest(docs, 1)   # replayed epoch again
    idx_before = spark.read.parquet(index_dir)
    rows_before = idx_before.count()
    n_hashes = idx_before.select("content_hash").distinct().count()
    # materialize the pre-compaction epoch map NOW — the swap replaces the
    # files this plan reads
    before_map = {
        r.content_hash: r.epoch
        for r in idx_before.select("content_hash", "epoch").distinct().collect()
    }
    assert rows_before > n_hashes  # bloat exists

    stats = compact_dedup_index(spark, index_dir)
    assert stats["rows_before"] == rows_before
    assert stats["rows_after"] == n_hashes
    idx_after = spark.read.parquet(index_dir)
    assert idx_after.count() == n_hashes
    # epoch stamps preserved: every hash still carries its ORIGINAL epoch
    for r in idx_after.collect():
        assert before_map[r.content_hash] == r.epoch

    out_docs = sorted(
        r.doc_id for r in spark.read.parquet(out_dir).select("doc_id").collect()
    )
    # post-compaction replay of the LAST epoch: self-exclusion intact,
    # output unchanged
    ingest(docs, 1)
    assert sorted(
        r.doc_id for r in spark.read.parquet(out_dir).select("doc_id").collect()
    ) == out_docs
    # and a NEW epoch over already-seen docs admits nothing
    ingest(docs, 2)
    assert sorted(
        r.doc_id for r in spark.read.parquet(out_dir).select("doc_id").collect()
    ) == out_docs


def test_compact_dedup_index_crash_recovery(spark, sf_dir, tmp_path):
    """A crash between rename-aside and rename-in leaves only the .old-
    sibling; the next ingest (and the next compaction) must restore it
    rather than treating the index as empty and re-admitting everything."""
    import os as _os

    from machinelearningalgomapreduce_spark.sources.catalog import load_tables
    from machinelearningalgomapreduce_spark.streaming.sinks import (
        _ingest_batch,
        compact_dedup_index,
    )

    index_dir = str(tmp_path / "idx2")
    out_dir = str(tmp_path / "out2")
    docs = load_tables(spark, sf_dir).documents.filter(F.col("doc_id") < 100)
    ingest = _ingest_batch(spark, index_dir, out_dir, "runD")
    ingest(docs, 0)
    n = spark.read.parquet(out_dir).count()

    # simulate the crash window
    _os.rename(index_dir, index_dir + ".old-999")
    assert not _os.path.exists(index_dir)
    ingest(docs, 1)  # recovery runs first → index restored → 0 admitted
    assert spark.read.parquet(out_dir).count() == n

    # compaction on an empty path (no index, no sibling) is a no-op
    stats = compact_dedup_index(spark, str(tmp_path / "nothing"))
    assert stats == {
        "rows_before": 0, "rows_after": 0, "files_before": 0, "files_after": 0
    }


def test_compact_dedup_index_cleans_crash_debris(spark, sf_dir, tmp_path):
    """Review fix: .staging-*/.old-* directories left by compaction
    crash windows must be removed by the next recovery pass, not
    accumulate full-size index copies forever."""
    import os as _os

    from machinelearningalgomapreduce_spark.sources.catalog import load_tables
    from machinelearningalgomapreduce_spark.streaming.sinks import (
        _ingest_batch,
        compact_dedup_index,
    )

    index_dir = str(tmp_path / "idx3")
    out_dir = str(tmp_path / "out3")
    docs = load_tables(spark, sf_dir).documents.filter(F.col("doc_id") < 80)
    ingest = _ingest_batch(spark, index_dir, out_dir, "runE")
    ingest(docs, 0)
    # crash window A: staging written, swap never started
    _os.makedirs(index_dir + ".staging-111")
    # crash window B: swap finished but the old copy was never dropped
    _os.makedirs(index_dir + ".old-222")
    stats = compact_dedup_index(spark, index_dir)
    assert stats["rows_after"] > 0
    leftovers = [
        n for n in _os.listdir(str(tmp_path))
        if n.startswith("idx3.") and (".staging-" in n or ".old-" in n)
    ]
    assert leftovers == []
    # ingest-side recovery cleans the same debris
    _os.makedirs(index_dir + ".old-333")
    ingest(docs, 1)
    assert not _os.path.exists(index_dir + ".old-333")


def test_compact_dedup_index_keeps_numerically_earliest_epoch(spark, tmp_path):
    """ADVICE r9: epoch stamps order LEXICOGRAPHICALLY in the compaction's
    min_by, so batch ids must be zero-padded — with unpadded stamps,
    'x/10' < 'x/2' and a multi-epoch hash (crash corners) would keep the
    wrong batch. Synthetic multi-epoch index: batch 2 must win over 10."""
    from machinelearningalgomapreduce_spark.streaming.sinks import (
        _ingest_batch,
        compact_dedup_index,
    )

    index_dir = str(tmp_path / "idx")
    # Stamp epochs through the real ingest path so the test pins the actual
    # format — one doc at batch 2, a different doc at batch 10.
    ingest = _ingest_batch(spark, index_dir, str(tmp_path / "outp"), run_key="k")
    d1 = spark.createDataFrame([("a", "same text")], ["doc_id", "text"])
    d2 = spark.createDataFrame([("b", "other text")], ["doc_id", "text"])
    ingest(d1, 2)
    ingest(d2, 10)
    idx = spark.read.parquet(index_dir)
    epochs = sorted(r.epoch for r in idx.select("epoch").distinct().collect())
    assert all(e.split("/")[1].isdigit() and len(e.split("/")[1]) == 10 for e in epochs)

    # Forge the crash corner: duplicate doc 'a' re-stamped at batch 10.
    forged = idx.filter("doc_id = 'a'").withColumn(
        "epoch", F.regexp_replace("epoch", "/0000000002$", "/0000000010")
    )
    forged.write.mode("append").parquet(index_dir)
    compact_dedup_index(spark, index_dir)
    kept = spark.read.parquet(index_dir).filter("doc_id = 'a'").collect()
    assert len(kept) == 1
    assert kept[0].epoch.endswith("/0000000002"), kept


def test_dedup_ingest_excludes_pre_padding_epoch_stamps(spark, tmp_path):
    """Format-migration corner (r10 review): index rows written BEFORE the
    zero-padding change carry unpadded 'digest/5' stamps. A replay of that
    batch after the upgrade must still exclude its own old-format rows
    (else it anti-joins away its own survivors and writes a wrong set),
    and compaction must order mixed-format stamps by the PARSED batch id."""
    from pyspark.sql import functions as F

    from machinelearningalgomapreduce_spark.streaming.sinks import (
        _ingest_batch,
        compact_dedup_index,
    )

    index_dir = str(tmp_path / "idx")
    out_dir = str(tmp_path / "outp")
    ingest = _ingest_batch(spark, index_dir, out_dir, run_key="mig")
    docs = spark.createDataFrame(
        [("a", "alpha text"), ("b", "beta text")], ["doc_id", "text"]
    )
    ingest(docs, 5)
    # Rewrite the whole index to the PRE-UPGRADE stamp format
    old = spark.read.parquet(index_dir).withColumn(
        "epoch", F.regexp_replace("epoch", "/0+(\\d)", "/$1")
    ).collect()
    import shutil as _sh
    _sh.rmtree(index_dir)
    spark.createDataFrame(old).write.parquet(index_dir)
    assert all(r.epoch.endswith("/5") for r in spark.read.parquet(index_dir).collect())

    # Replay batch 5: must see the PRE-batch state (empty), i.e. both docs
    # survive again, not an empty survivor set.
    ingest(docs, 5)
    out = spark.read.parquet(f"{out_dir}/epoch=*")
    assert out.count() == 2

    # Mixed-format index now holds '/5' and '/0000000005' rows per hash;
    # a forged later batch must LOSE to both under numeric ordering.
    forged = (
        spark.read.parquet(index_dir)
        .limit(1)
        .withColumn("epoch", F.regexp_replace("epoch", "/0*5$", "/0000000012"))
    )
    forged.write.mode("append").parquet(index_dir)
    compact_dedup_index(spark, index_dir)
    for r in spark.read.parquet(index_dir).collect():
        # batch 5 wins in EITHER stamp format; the forged batch 12 never
        assert int(r.epoch.split("/")[1]) == 5, r


def test_scd2_bootstrap_keeps_typed_schema_and_validates_tracked(spark, tmp_path):
    """r10 review: the empty-dimension bootstrap must carry the UPDATE
    batch's types — an all-string bootstrap union-widened every column to
    string permanently (and epoch-nanos longs then compared through lossy
    double casts). tracked=[] fails loudly."""
    import shutil as _sh

    import pytest as _pytest

    from machinelearningalgomapreduce_spark.streaming.sinks import scd2_ingest_stream

    dim_dir = str(tmp_path / "dim_t")
    src = tmp_path / "upd_t"
    src.mkdir()
    u1 = spark.createDataFrame(
        [(1, 100, 1_700_000_000_000_000_000), (2, 200, 1_700_000_000_000_000_000)],
        "key long, price long, ts long",
    )
    u1.coalesce(1).write.parquet(str(tmp_path / "s1"))
    part = next(p for p in (tmp_path / "s1").iterdir() if p.name.endswith(".parquet"))
    _sh.copy(part, src / "b1.parquet")
    stream = spark.readStream.schema("key long, price long, ts long").parquet(str(src))
    with _pytest.raises(ValueError, match="tracked"):
        scd2_ingest_stream(spark, stream, dim_dir, str(tmp_path / "ckx"), "key", [])
    q = scd2_ingest_stream(spark, stream, dim_dir, str(tmp_path / "ck_t"), "key", ["price"])
    drain(q, 420)
    dim = spark.read.parquet(dim_dir)
    types = {f.name: f.dataType.simpleString() for f in dim.schema.fields}
    assert types == {
        "key": "bigint", "price": "bigint",
        "valid_from": "bigint", "valid_to": "bigint",
    }, types
    # a nanos-later update (within double-collapse range of the first)
    # must still be recognized as fresh under the typed comparison
    u2 = spark.createDataFrame(
        [(1, 150, 1_700_000_000_000_000_100)], "key long, price long, ts long"
    )
    u2.coalesce(1).write.parquet(str(tmp_path / "s2"))
    part2 = next(p for p in (tmp_path / "s2").iterdir() if p.name.endswith(".parquet"))
    _sh.copy(part2, src / "b2.parquet")
    stream2 = spark.readStream.schema("key long, price long, ts long").parquet(str(src))
    q2 = scd2_ingest_stream(spark, stream2, dim_dir, str(tmp_path / "ck_t2"), "key", ["price"])
    drain(q2, 420)
    open_row = spark.read.parquet(dim_dir).filter(
        "key = 1 and valid_to is null").collect()
    assert len(open_row) == 1 and open_row[0].price == 150


def test_dedup_ingest_null_text_is_one_content_class(spark, tmp_path):
    """r10 review: NULL-text docs form ONE deterministic content class —
    one survivor ever, independent of batching (a NULL hash would both
    collapse whole batches and leak one doc per batch)."""
    from machinelearningalgomapreduce_spark.streaming.sinks import _ingest_batch

    ingest = _ingest_batch(spark, str(tmp_path / "idx"), str(tmp_path / "out"), "nt")
    b1 = spark.createDataFrame(
        [("a", None), ("b", None), ("c", "real text")],
        "doc_id string, text string",
    )
    b2 = spark.createDataFrame([("d", None)], "doc_id string, text string")
    ingest(b1, 0)
    ingest(b2, 1)
    out = spark.read.parquet(str(tmp_path / "out") + "/epoch=*")
    rows = {r.doc_id for r in out.collect()}
    assert rows == {"a", "c"}  # min-id null survivor once; d excluded


def test_dedup_replay_supersedes_pre_padding_output_dir(spark, tmp_path):
    """r10 review: a replay crossing the zero-padding upgrade must replace
    the PRE-upgrade epoch directory, not leave a duplicate copy of the
    batch in the landing zone."""
    import os as _os

    from machinelearningalgomapreduce_spark.streaming.sinks import _ingest_batch

    out_dir = str(tmp_path / "out_m")
    ingest = _ingest_batch(spark, str(tmp_path / "idx_m"), out_dir, "mig2")
    docs = spark.createDataFrame([("a", "x text")], "doc_id string, text string")
    ingest(docs, 7)
    padded = next(d for d in _os.listdir(out_dir) if d.startswith("epoch="))
    # forge the pre-upgrade layout: rename to the unpadded name
    legacy = padded.replace("_0000000007", "_7")
    _os.rename(_os.path.join(out_dir, padded), _os.path.join(out_dir, legacy))
    # strip the index rows to the legacy stamp too
    idx_dir = str(tmp_path / "idx_m")
    from pyspark.sql import functions as F
    old = spark.read.parquet(idx_dir).withColumn(
        "epoch", F.regexp_replace("epoch", "/0000000007", "/7")).collect()
    import shutil as _sh
    _sh.rmtree(idx_dir)
    spark.createDataFrame(old).write.parquet(idx_dir)

    ingest(docs, 7)  # the replay, post-upgrade
    dirs = [d for d in _os.listdir(out_dir) if d.startswith("epoch=")]
    assert dirs == [padded], dirs  # exactly one copy, the padded dir
