"""File-format sources and sinks beyond the fixture parquet.

The reference's only I/O is delimited text on HDFS (SURVEY.md §1.1); this
module carries that surface (text lines in/out) plus the formats a modern
pipeline actually uses (CSV, JSON, partitioned and bucketed parquet).
Everything takes/returns DataFrames with explicit schemas — no sampled
schema inference in production paths (inference reads data twice and can
drift between runs).

Scale notes:
- Readers parallelize per file split; writers per partition. Partitioned
  writes (`partitionBy`) give coarse directory pruning on read; BUCKETED
  writes give shuffle-free joins/aggregations on the bucket key — the
  co-located join test asserts the Exchange really disappears.
- Text ingestion assigns line ids per file via a window ordered by line
  content — deterministic across runs, unlike
  monotonically_increasing_id (partition-layout dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W


def write_text(documents: DataFrame, path: str) -> None:
    """Docs → one text line each (the reference's native format)."""
    documents.select(F.col("text").alias("value")).write.mode("overwrite").text(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Text lines → (file, line_no, text); ids assigned per file in
    lexicographic line order (deterministic across runs/partitionings)."""
    w = W.partitionBy("file").orderBy("value")
    return (
        spark.read.text(path)
        .select(F.input_file_name().alias("file"), "value")
        .withColumn("line_no", F.row_number().over(w))
        .select("file", "line_no", F.col("value").alias("text"))
    )


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV with an EXPLICIT schema — no inference pass."""
    return spark.read.schema(schema).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (built-in columnar alternative to parquet; same pushdown
    and pruning machinery on read)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Hive-style partitioned parquet: directory pruning for free on any
    filter over the partition columns."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Bucketed + sorted parquet table (session catalog). Two tables
    bucketed the same way join WITHOUT a shuffle — the physical analog of
    the reference's custom Partitioner co-partitioning (SURVEY.md §2A)."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )
