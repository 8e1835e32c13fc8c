"""File-format sources/sinks: round-trips preserve data; bucketed tables
join without a shuffle; partitioned writes prune directories."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from machinelearningalgomapreduce_spark.plans import inspect as P
from machinelearningalgomapreduce_spark.sources import formats
from machinelearningalgomapreduce_spark.sources.catalog import load_tables
from machinelearningalgomapreduce_spark.sources.schemas import SCHEMAS


def test_text_round_trip(spark, sf_dir, tmp_path):
    docs = load_tables(spark, sf_dir).documents
    path = str(tmp_path / "docs_txt")
    formats.write_text(docs, path)
    back = formats.read_text(spark, path)
    assert back.count() == docs.count()
    assert set(r.text for r in back.select("text").collect()) == set(
        r.text for r in docs.select("text").collect()
    )


def test_csv_round_trip_explicit_schema(spark, sf_dir, tmp_path):
    orders = load_tables(spark, sf_dir).orders
    path = str(tmp_path / "orders_csv")
    formats.write_csv(orders, path)
    back = formats.read_csv(spark, path, orders.schema)
    assert back.count() == orders.count()
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in orders.schema.fields
    ]
    assert back.agg(F.sum("o_totalprice")).first()[0] == pytest.approx(
        orders.agg(F.sum("o_totalprice")).first()[0]
    )


def test_json_round_trip(spark, sf_dir, tmp_path):
    events = load_tables(spark, sf_dir).events
    path = str(tmp_path / "events_json")
    formats.write_json(events, path)
    back = formats.read_json(spark, path, SCHEMAS["events"])
    assert back.count() == events.count()
    assert back.select(F.sum("value")).first()[0] == pytest.approx(
        events.select(F.sum("value")).first()[0]
    )


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    events = load_tables(spark, sf_dir).events
    path = str(tmp_path / "events_part")
    formats.write_partitioned(events, path, "event_type")
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    assert back.count() == events.filter(F.col("event_type") == "click").count()
    # Partition pruning: the scan's file listing is restricted to the
    # matching directory (PartitionFilters in the plan).
    assert "PartitionFilters: [isnotnull(event_type" in P.formatted_plan(back)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    import shutil

    t = load_tables(spark, sf_dir)
    # Managed-table locations survive across sessions even though the
    # in-memory catalog doesn't — clean both before writing.
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
    formats.write_bucketed(t.orders, "b_orders", "o_orderkey", n_buckets=4)
    formats.write_bucketed(
        t.lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem",
        "o_orderkey", n_buckets=4,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Force a sort-merge join so the assertion is about bucketing, not
        # about broadcast making the question moot.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        assert P.count_exchanges(joined) == 0
        assert joined.count() == t.lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from machinelearningalgomapreduce_spark.sources.catalog import load_tables
    from machinelearningalgomapreduce_spark.sources.formats import read_orc, write_orc

    orders = load_tables(spark, sf_dir).orders
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)
    # Filter pushdown reaches the ORC scan.
    filtered = back.filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan


def test_custom_python_datasource_deterministic(spark):
    """Spark-4 Python DataSource: partitioned synthetic scan, identical
    across reads (hash-deterministic, no RNG state), schema projected."""
    from pyspark.sql import functions as F

    from machinelearningalgomapreduce_spark.sources.custom import (
        SyntheticEventsSource,
    )

    spark.dataSource.register(SyntheticEventsSource)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 500)
        .option("n_partitions", 3)
        .load()
    )
    assert df.count() == 500
    assert df.select("event_id").distinct().count() == 500
    # DECIMAL-exact sum: double sums differ across partition layouts
    # (exactly the drift the engine's rounding policy exists for).
    exact_sum = F.sum(F.col("value").cast("decimal(18,2)")).alias("s")
    first = df.agg(exact_sum, F.max("user_id").alias("m")).first()
    second = (
        spark.read.format("synthetic_events")
        .option("n_rows", 500)
        .option("n_partitions", 7)  # different layout, same rows
        .load()
        .agg(exact_sum, F.max("user_id").alias("m"))
        .first()
    )
    assert (first.s, first.m) == (second.s, second.m)
    types = {r.event_type for r in df.select("event_type").distinct().collect()}
    assert types <= {"click", "view", "purchase", "signup", "error"}


def test_bmp_codec_round_trip():
    from machinelearningalgomapreduce_spark.multimodal.pipeline import (
        decode_image,
        encode_bmp,
    )

    m = decode_image(encode_bmp(13, 7, seed=5))  # odd width exercises padding
    assert (m["width"], m["height"], m["bpp"]) == (13, 7, 24)
    assert m["n_bytes"] == 54 + 7 * ((3 * 13 + 3) // 4 * 4)


def test_wav_codec_round_trip():
    from machinelearningalgomapreduce_spark.multimodal.pipeline import (
        decode_audio,
        encode_wav,
    )

    m = decode_audio(encode_wav(2, 16000, 25, seed=9))
    assert (m["n_channels"], m["sample_rate"], m["bits"], m["n_samples"]) == (
        2, 16000, 16, 25,
    )
    assert m["n_bytes"] == 44 + 25 * 2 * 2


def test_decoders_reject_unknown_containers():
    import pytest

    from machinelearningalgomapreduce_spark.multimodal.pipeline import (
        decode_audio,
        decode_image,
    )

    # r12: PNG is SUPPORTED now (stdlib-zlib codec) — garbage under the
    # PNG magic fails with a decode-specific error (CRC), while JPEG is
    # the remaining image container that names the missing library
    with pytest.raises(ValueError, match="CRC"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ValueError, match="imaging library"):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)
    with pytest.raises(ValueError, match="audio library"):
        decode_audio(b"ID3\x04" + b"\x00" * 64)


def test_manifest_sink_rejects_overwrite_and_tokens_are_job_unique(spark, tmp_path):
    """r10 review: mode('overwrite') must fail loudly (the manifest is
    append-only — replacement means a fresh directory), and shard names
    carry a job-unique token so a SECOND application's task ids can never
    truncate the first's same-named shards."""
    import pytest as _pytest

    from machinelearningalgomapreduce_spark.sources.custom import (
        ManifestJsonlSink,
        ManifestJsonlWriter,
    )

    spark.dataSource.register(ManifestJsonlSink)
    d = str(tmp_path / "ovr")
    df = spark.createDataFrame([(1, "a")], ["k", "s"])
    with _pytest.raises(Exception, match="append-only"):
        df.write.format("manifest_jsonl").option("path", d).mode("overwrite").save()

    schema = df.schema
    w1 = ManifestJsonlWriter({"path": d}, schema)
    w2 = ManifestJsonlWriter({"path": d}, schema)
    assert w1.token != w2.token  # distinct jobs → distinct shard names


def test_manifest_reader_infers_schema_past_null_first_line(spark, tmp_path):
    """r10 review: a null in line 1 is not a type, and a key absent from
    line 1 must not vanish — inference samples many lines."""
    import json as _json
    import os as _os

    from machinelearningalgomapreduce_spark.sources.custom import (
        ManifestJsonlSink,
        ManifestJsonlSource,
    )

    spark.dataSource.register(ManifestJsonlSink)
    spark.dataSource.register(ManifestJsonlSource)
    d = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(None, None), (2, 1.5), (3, 2.5)], "k long, v double"
    ).coalesce(1)
    df.write.format("manifest_jsonl").option("path", d).mode("append").save()
    back = spark.read.format("manifest_jsonl_read").option("path", d).load()
    got = {f.name: f.dataType.simpleString() for f in back.schema.fields}
    assert got == {"k": "bigint", "v": "double"}, got
    assert back.count() == 3

    # a key appearing only after line 1 (hand-forged extra shard)
    extra = [{"k": 9, "v": 0.5}, {"k": 10, "v": 0.5, "late": "x"}]
    lines = [_json.dumps(o, sort_keys=True) for o in extra]
    from machinelearningalgomapreduce_spark.sources.custom import _h_line
    shard = "shard-manual-99999-0.jsonl"
    with open(_os.path.join(d, shard), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    m_path = _os.path.join(d, "manifest.json")
    m = _json.load(open(m_path))
    m["shards"].insert(0, {
        "path": shard, "n_rows": 2,
        "checksum": sum(_h_line(x) for x in lines) % (1 << 64),
    })
    _json.dump(m, open(m_path, "w"))
    back2 = spark.read.format("manifest_jsonl_read").option("path", d).load()
    assert "late" in back2.columns
    assert back2.filter("late = 'x'").count() == 1


def test_synthetic_source_partition_count_and_validation(spark):
    from machinelearningalgomapreduce_spark.sources.custom import (
        SyntheticEventsReader,
        SyntheticEventsSource,
    )

    spark.dataSource.register(SyntheticEventsSource)
    # ceil division: 10 rows / 4 partitions = exactly 4 ranges, not 5
    r = SyntheticEventsReader({"n_rows": "10", "n_partitions": "4"})
    parts = r.partitions()
    assert len(parts) == 4
    assert sum(p.end - p.start for p in parts) == 10
    # degenerate options fail loudly, not with ZeroDivisionError
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_partitions"):
        SyntheticEventsReader({"n_rows": "10", "n_partitions": "0"})
    with _pytest.raises(ValueError, match="n_rows"):
        SyntheticEventsReader({"n_rows": "-1"})
    # more partitions than rows: exactly n_rows singleton ranges
    assert len(SyntheticEventsReader(
        {"n_rows": "3", "n_partitions": "8"}).partitions()) == 3


def test_manifest_lock_stale_recovery_and_holder_in_error(spark, tmp_path):
    """ADVICE r10: a lock left by a dead driver must self-expire (commit
    breaks locks older than LOCK_STALE_SECONDS and proceeds); a FRESH
    lock still fails loudly, naming its holder and the remediation."""
    import os
    import time

    import pytest as _pytest

    from machinelearningalgomapreduce_spark.sources.custom import (
        ManifestJsonlSink,
        ManifestJsonlWriter,
    )

    spark.dataSource.register(ManifestJsonlSink)
    d = str(tmp_path / "stale")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "s"])

    # stale lock (mtime pushed past the timeout) → broken, commit succeeds
    os.makedirs(d)
    lock = os.path.join(d, "manifest.json.lock")
    with open(lock, "w") as fh:
        fh.write("99999@dead-host")
    old = time.time() - ManifestJsonlWriter.LOCK_STALE_SECONDS - 60
    os.utime(lock, (old, old))
    df.write.format("manifest_jsonl").option("path", d).mode("append").save()
    assert os.path.exists(os.path.join(d, "manifest.json"))
    assert not os.path.exists(lock)  # broken and released

    # fresh lock → loud single-writer failure, holder + lock path named
    with open(lock, "w") as fh:
        fh.write("12345@live-host")
    writer = ManifestJsonlWriter({"path": d}, df.schema)
    with _pytest.raises(RuntimeError) as ei:
        writer.commit([])
    msg = str(ei.value)
    assert "12345@live-host" in msg and "manifest.json.lock" in msg
    os.remove(lock)


# ---- PNG (r12: full decode via stdlib zlib) ------------------------------


def test_png_round_trip_all_filter_types():
    """encode_png cycles row filters through all five spec types, so one
    round-trip pins every unfilter branch: the reconstructed raw pixel
    stream must equal the pre-filter pixel bytes exactly."""
    from machinelearningalgomapreduce_spark.multimodal.pipeline import (
        decode_png_pixels,
        encode_png,
    )

    w, h, seed = 17, 11, 42  # odd width exercises non-aligned strides
    payload = encode_png(w, h, seed)
    header, pixels = decode_png_pixels(payload)
    assert header == {
        "format": "png", "width": w, "height": h, "bpp": 24,
        "n_bytes": len(payload),
    }
    want = bytes((seed * 7 + y * 3 * w + x) % 256 for y in range(h) for x in range(3 * w))
    assert pixels == want


def test_png_decode_image_dispatch_and_corruption():
    """decode_image dispatches PNG by magic with the same field contract
    as BMP; a flipped IDAT byte fails the chunk CRC loudly; JPEG magic
    still raises naming the missing library."""
    import pytest

    from machinelearningalgomapreduce_spark.multimodal.pipeline import (
        decode_image,
        encode_png,
    )

    payload = encode_png(8, 4, 7)
    meta = decode_image(payload)
    assert (meta["format"], meta["width"], meta["height"], meta["bpp"]) == (
        "png", 8, 4, 24
    )
    corrupt = bytearray(payload)
    corrupt[len(payload) // 2] ^= 0xFF  # inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_image(bytes(corrupt))
    with pytest.raises(ValueError, match="JPEG needs PIL"):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)


def test_png_decode_under_arrow_batches(spark, sf_dir):
    """The Spark-side plumbing: synthesize a PNG per doc inside
    mapInPandas (Arrow-batched), decode it in the same batch, and check
    the decoded fields against their closed forms — the q_media_decode
    discipline applied to the new container."""
    import pandas as pd

    from machinelearningalgomapreduce_spark.multimodal.pipeline import (
        decode_png_pixels,
        encode_png,
    )

    docs = load_tables(spark, sf_dir).documents.select("doc_id").limit(64)

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                w, h = 4 + int(doc_id) % 5, 3 + int(doc_id) % 3
                header, pixels = decode_png_pixels(encode_png(w, h, int(doc_id)))
                rows.append(
                    (int(doc_id), header["width"], header["height"],
                     header["bpp"], len(pixels))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "bpp", "n_pixel_bytes"]
            )

    out = docs.mapInPandas(
        batches,
        "doc_id long, width long, height long, bpp long, n_pixel_bytes long",
    ).collect()
    assert len(out) == 64
    for r in out:
        assert (r.width, r.height) == (4 + r.doc_id % 5, 3 + r.doc_id % 3)
        assert r.bpp == 24 and r.n_pixel_bytes == 3 * r.width * r.height


def test_png_error_contract_truncation_and_missing_idat():
    """r12 review: every malformed-PNG path must raise the module's
    ValueError contract — truncation inside a chunk's CRC field must not
    leak struct.error, and a CRC-valid payload with no IDAT must not
    leak zlib.error."""
    import pytest

    from machinelearningalgomapreduce_spark.multimodal.pipeline import (
        _PNG_MAGIC,
        _png_chunk,
        decode_png_pixels,
        encode_png,
    )
    import struct

    with pytest.raises(ValueError, match="truncated PNG chunk"):
        decode_png_pixels(encode_png(4, 4, 1)[:-2])  # cut inside IEND CRC
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    no_idat = _PNG_MAGIC + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="missing IDAT"):
        decode_png_pixels(no_idat)
