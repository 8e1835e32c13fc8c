"""Directory-layout reader audit (VERDICT r13 item 5).

The r13 `stream_table` fix proved the single-file-fixture assumption can
silently match NOTHING on real directory tables: `pathGlobFilter` applies
to LEAF file names, so filtering the parent dir by `events.parquet` never
matches a Spark-written `events.parquet/part-*.parquet` directory. Real
corpora are directories — every fixture-table entry point must read BOTH
layouts identically. Batch `spark.read.parquet` handles file-vs-directory
natively, so the load_table pin is a regression guard; the streaming
entry points are where the layout split is hand-routed and can rot.

Audited read sites (grep: pathGlobFilter | read.parquet | readStream):
- sources/catalog.py::load_table — batch read of sf_dir/<t>.parquet
  (both layouts native to spark.read.parquet; pinned here)
- streaming/windows.py::stream_table — the r13 fix (isdir → stream the
  directory, file → glob-filtered parent); pinned here for both layouts
- streaming/sinks.py::stream_documents — delegates to stream_table
  (pinned here through the delegation)
- streaming/sinks.py:81/228/262/313/554, operators/ivf_index.py:413,
  operators/ivf_pq.py, operators/matview.py — read back their OWN
  Spark-written directories (never a caller-shaped path): layout-safe
  by construction
- sources/formats.py csv/json/orc/text — Spark-native readers over
  caller paths, directory handling native to the DataFrameReader
- tools/check.py DuckDB view registration — directory tables need the
  recursive glob form (fixed alongside this audit)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import drain


def _dir_layout_copy(spark, sf_dir, tmp_path, tables):
    """Rewrite fixture tables as Spark-written DIRECTORY tables (the real
    -corpus layout: <t>.parquet/ holding part files) in a tmp sf dir."""
    out = tmp_path / "sfdir"
    out.mkdir()
    for t in tables:
        (
            spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
            .repartition(2)
            .write.mode("overwrite")
            .parquet(str(out / f"{t}.parquet"))
        )
    return str(out)


def test_load_table_reads_directory_layout_identically(spark, sf_dir, tmp_path):
    from machinelearningalgomapreduce_spark.sources.catalog import load_table

    dir_sf = _dir_layout_copy(spark, sf_dir, tmp_path, ["documents", "events"])
    for t in ("documents", "events"):
        file_df = load_table(spark, sf_dir, t)
        dir_df = load_table(spark, dir_sf, t)
        assert dir_df.columns == file_df.columns
        # full-row parity, not just counts — the timestamp normalization
        # must survive the rewrite (directory copies are TIMESTAMP micros
        # regardless of what encoding the fixture generation used)
        a = {tuple(r) for r in file_df.collect()}
        b = {tuple(r) for r in dir_df.collect()}
        assert a == b and a


@pytest.mark.parametrize("table", ["events", "documents"])
def test_stream_table_reads_both_layouts(spark, sf_dir, tmp_path, table):
    from machinelearningalgomapreduce_spark.streaming.windows import stream_table

    dir_sf = _dir_layout_copy(spark, sf_dir, tmp_path, [table])
    batch_n = spark.read.parquet(
        os.path.join(sf_dir, f"{table}.parquet")
    ).count()
    for i, src in enumerate((sf_dir, dir_sf)):
        sdf = stream_table(spark, src, f"{table}.parquet")
        q = (
            sdf.groupBy().count()
            .writeStream.format("memory")
            .queryName(f"layout_{table}_{i}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", str(tmp_path / f"ck_{table}_{i}")
            )
            .start()
        )
        drain(q, 420)
        got = spark.sql(f"select * from layout_{table}_{i}").first()
        assert got is not None and got["count"] == batch_n, (src, got)


def test_stream_documents_directory_layout(spark, sf_dir, tmp_path):
    """The sinks-side entry point through the same delegation — a
    directory documents table must stream every row (the r13 bug made
    this exact call yield an empty stream)."""
    from machinelearningalgomapreduce_spark.streaming.sinks import stream_documents

    dir_sf = _dir_layout_copy(spark, sf_dir, tmp_path, ["documents"])
    n = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    q = (
        stream_documents(spark, dir_sf)
        .select(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("layout_docs_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_docs"))
        .start()
    )
    drain(q, 420)
    got = spark.sql("select * from layout_docs_sink").first()
    assert got is not None and got["n"] == n
