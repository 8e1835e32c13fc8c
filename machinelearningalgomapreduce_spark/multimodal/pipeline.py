"""Multimodal columns (SURVEY.md §2D q_multimodal; north-star multimodal ops).

Model: media lives in an opaque ``binary`` column with a typed metadata
struct beside it; text and vectors are first-class columns joined by id.
Real image/audio decoding libraries are not in this container, so the
decode kernels are STUBS (clearly marked, raising NotImplementedError);
everything Spark-side — schema, Arrow batch shape, mapInPandas plumbing,
partitioning — is real and oracle-checked via a deterministic feature
extractor (md5 + byte stats computed identically in DuckDB).

Scale notes: feature extraction is mapInPandas over Arrow batches — no
shuffle, linear scan, Python cost amortized per-batch (not per-row). The
modality join (documents ⋈ embeddings) is an equi-join on id; at 100 TB
both sides bucket by id so the join is co-located.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from machinelearningalgomapreduce_spark.functions.vectors import norm
from machinelearningalgomapreduce_spark.sources.catalog import load_tables

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
        T.StructField("fake_frames", T.LongType()),
    ]
)


def attach_binary(documents: DataFrame) -> DataFrame:
    """Opaque payload column + typed metadata struct — the storage shape a
    real image/audio table would have (payload bytes, modality, size)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text").alias("modality"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real decoder (PIL/libjpeg) is not in this container."""
    raise NotImplementedError("image decode requires an imaging library")


def decode_audio(payload: bytes):  # pragma: no cover - stub
    """STUB: real decoder (ffmpeg/soundfile) is not in this container."""
    raise NotImplementedError("audio decode requires an audio library")


def _extract_batches(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
    """Arrow-batched feature extraction. The md5/byte stats are the real
    deterministic part; the width/height/frames are a deterministic FAKE
    standing in for the stubbed decoders (same arithmetic as the oracle)."""
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        out = pdf[["doc_id"]].copy()
        out["n_bytes"] = n_bytes
        out["content_md5"] = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
        out["fake_width"] = 64 + n_bytes % 512
        out["fake_height"] = 64 + (n_bytes // 7) % 512
        out["fake_frames"] = 1 + n_bytes % 5
        yield out


def extract_features(with_binary: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the payload column."""
    return with_binary.select("doc_id", "payload").mapInPandas(
        _extract_batches, schema=FEATURE_SCHEMA
    )


def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality query: join text docs with their embeddings, filter on
    BOTH modalities (token length AND vector norm), roll up per source."""
    t = load_tables(spark, sf_dir)
    joined = t.documents.join(
        t.embeddings, t.documents.doc_id == t.embeddings.vec_id
    ).select(
        "source",
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.round(norm(F.col("embedding")), 6).alias("vec_norm"),
        "label",
    )
    return (
        joined.filter((F.col("n_tokens") >= 20) & (F.col("vec_norm") > 0.5))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
            F.round(F.avg("vec_norm"), 6).alias("avg_norm"),
            F.countDistinct("label").alias("n_labels"),
        )
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The binary pipeline end-to-end: attach payload → Arrow-batched
    pandas feature extraction. Oracle-checked because the extractor is
    deterministic (md5 over the same bytes DuckDB hashes)."""
    t = load_tables(spark, sf_dir)
    return extract_features(attach_binary(t.documents))


FRAME_SAMPLE_STRIDE = 2

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def _frame_batches(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
    """Arrow-batched frame sampling: treat the payload as `fake_frames`
    equal-length frames, emit every STRIDE-th frame's byte slice stats —
    one input row fans out to multiple output rows (the mapInPandas shape
    a real video frame-sampler has)."""
    import hashlib

    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            n = len(data)
            frames = 1 + n % 5  # same deterministic fake as _extract_batches
            flen = n // frames
            for fno in range(1, frames + 1, FRAME_SAMPLE_STRIDE):
                sl = data[(fno - 1) * flen : (fno - 1) * flen + flen]
                rows.append(
                    (doc_id, fno, len(sl), hashlib.md5(sl).hexdigest())
                )
        yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame_bytes", "frame_md5"])


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the binary payload: every 2nd of the payload's
    deterministic fake frames, with per-frame byte slice md5 — the
    row-fan-out mapInPandas pipeline a video frame-sampler runs, fully
    oracle-checked because the slicing arithmetic is exact (the fixture
    payload is ASCII, so DuckDB's char substring hashes the same bytes)."""
    t = load_tables(spark, sf_dir)
    return (
        attach_binary(t.documents)
        .select("doc_id", "payload")
        .mapInPandas(_frame_batches, schema=FRAME_SCHEMA)
    )


QUERIES = {
    "q_multimodal": q_multimodal,
    "q_multimodal_features": q_multimodal_features,
    "q_frame_sample": q_frame_sample,
}

ORACLES = {
    "q_multimodal": """
        WITH joined AS (
            SELECT d.source, d.lang,
                   CAST(len(string_split(d.text, ' ')) AS INTEGER) AS n_tokens,
                   round(sqrt(list_sum(list_transform(range(1, 65),
                       i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))),
                       6) AS vec_norm,
                   e.label
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        )
        SELECT source,
               count(*) AS n_docs,
               round(avg(n_tokens), 6) AS avg_tokens,
               round(avg(vec_norm), 6) AS avg_norm,
               count(DISTINCT label) AS n_labels
        FROM joined
        WHERE n_tokens >= 20 AND vec_norm > 0.5
        GROUP BY source
    """,
    "q_frame_sample": f"""
        WITH base AS (
            SELECT doc_id, text,
                   strlen(text) AS n,
                   1 + strlen(text) % 5 AS frames,
                   strlen(text) // (1 + strlen(text) % 5) AS flen
            FROM documents
        )
        SELECT doc_id,
               CAST(fno AS BIGINT) AS frame_no,
               CAST(flen AS BIGINT) AS frame_bytes,
               md5(substring(text, CAST((fno - 1) * flen + 1 AS INTEGER),
                             CAST(flen AS INTEGER))) AS frame_md5
        FROM base, unnest(range(1, frames + 1, {FRAME_SAMPLE_STRIDE})) AS t(fno)
    """,
    "q_multimodal_features": """
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               md5(text) AS content_md5,
               CAST(64 + strlen(text) % 512 AS BIGINT) AS fake_width,
               CAST(64 + (strlen(text) // 7) % 512 AS BIGINT) AS fake_height,
               CAST(1 + strlen(text) % 5 AS BIGINT) AS fake_frames
        FROM documents
    """,
}
