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

    with pytest.raises(ValueError, match="imaging library"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ValueError, match="audio library"):
        decode_audio(b"ID3\x04" + b"\x00" * 64)
