"""Multimodal columns (SURVEY.md §2D q_multimodal; north-star multimodal ops).

Model: media lives in an opaque ``binary`` column with a typed metadata
struct beside it; text and vectors are first-class columns joined by id.
The decode kernels are REAL pure-Python parsers for the container
formats that need no third-party library: BMP images and RIFF/WAV audio
(header parses), and — since r12 — 8-bit non-interlaced PNG (FULL
decode via stdlib zlib: chunk CRCs, IDAT inflate, all five unfilter
types; encode_png/decode_png_pixels round-trip pixel-exactly under
pytest). q_media_decode synthesizes deterministic payloads, round-trips
them through encode→decode inside mapInPandas, and the oracle checks
the decoded fields against their closed forms, so a wrong writer OR
parser fails the hash. Remaining compressed formats (JPEG/MP3/…) raise
a clear ValueError naming the missing library; everything Spark-side —
schema, Arrow batch shape, mapInPandas plumbing, partitioning — is
identical for them.

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


def encode_bmp(width: int, height: int, seed: int) -> bytes:
    """Minimal 24-bpp uncompressed BMP (BITMAPINFOHEADER) with
    deterministic pixel bytes — the fixture adapter for decode_image."""
    import struct

    stride = (3 * width + 3) // 4 * 4  # rows pad to 4 bytes
    data_size = stride * height
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + data_size, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    pixels = bytes((seed * 7 + i) % 256 for i in range(data_size))
    return header + pixels


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type -> channel count (spec, public)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def encode_png(width: int, height: int, seed: int) -> bytes:
    """Minimal but REAL 8-bit RGB PNG (zlib stdlib, no imaging library):
    IHDR + one zlib-compressed IDAT + IEND with correct CRCs. Row filters
    CYCLE through all five spec types (none/sub/up/average/paeth) so a
    decoder round-trip exercises every unfilter branch, not just the
    trivial one. Deterministic pixel bytes — the fixture adapter for
    decode_png_pixels."""
    import struct
    import zlib

    stride = 3 * width
    raw = bytearray()
    for y in range(height):
        row = bytes((seed * 7 + y * stride + x) % 256 for x in range(stride))
        ft = y % 5
        raw.append(ft)
        prev = (
            bytes((seed * 7 + (y - 1) * stride + x) % 256 for x in range(stride))
            if y
            else bytes(stride)
        )
        if ft == 0:
            raw.extend(row)
        elif ft == 1:  # sub
            raw.extend(
                (row[i] - (row[i - 3] if i >= 3 else 0)) % 256
                for i in range(stride)
            )
        elif ft == 2:  # up
            raw.extend((row[i] - prev[i]) % 256 for i in range(stride))
        elif ft == 3:  # average
            raw.extend(
                (row[i] - ((row[i - 3] if i >= 3 else 0) + prev[i]) // 2) % 256
                for i in range(stride)
            )
        else:  # paeth
            raw.extend(
                (row[i] - _paeth(row[i - 3] if i >= 3 else 0, prev[i],
                                 prev[i - 3] if i >= 3 else 0)) % 256
                for i in range(stride)
            )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The PNG Paeth predictor (spec, public): nearest of left/up/up-left
    to the linear estimate a + b − c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png_pixels(payload: bytes) -> tuple[dict, bytes]:
    """FULL pure-Python PNG decode via stdlib zlib (r12 — closes the
    'PNG needs PIL' gap for the common case): chunk walk with CRC
    verification, IHDR parse, IDAT inflate, and per-row UNFILTERING of
    all five spec filter types. Returns (header dict, reconstructed raw
    pixel bytes — height·width·channels). Supports 8-bit depth,
    non-interlaced, non-palette color types (gray/RGB/gray+alpha/RGBA —
    palette and interlace raise naming the gap; JPEG still needs PIL).

    Per-row byte loops are Python, but the call sits under mapInPandas'
    Arrow batching like every decode kernel here — per-batch, not
    per-row, plumbing cost; swap in PIL for production pixel rates."""
    import struct
    import zlib

    if len(payload) < 8 or payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        # bound check covers the CRC field too — a payload truncated
        # inside the 4-byte CRC must raise the contract ValueError, not
        # leak struct.error to mapInPandas callers (r12 review)
        if pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != zlib.crc32(tag + body):
            raise ValueError(f"PNG chunk {tag!r} failed CRC")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace or color not in _PNG_CHANNELS:
        raise ValueError(
            "unsupported PNG variant (8-bit non-interlaced gray/RGB/"
            "gray+alpha/RGBA decode here; palette/16-bit/interlaced "
            "need PIL or equivalent)"
        )
    ch = _PNG_CHANNELS[color]
    stride = width * ch
    if not idat:
        raise ValueError("PNG missing IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # keep the module's ValueError contract
        raise ValueError(f"PNG IDAT inflate failed: {e}") from None
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data size mismatch")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ft == 1:  # sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) % 256
        elif ft == 2:  # up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) % 256
        elif ft == 3:  # average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (a + prev[i]) // 2) % 256
        elif ft == 4:  # paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) % 256
        elif ft != 0:
            raise ValueError(f"invalid PNG filter type {ft}")
        out.extend(line)
        prev = bytes(line)
    header = {
        "format": "png",
        "width": width,
        "height": height,
        "bpp": 8 * ch,
        "n_bytes": len(payload),
    }
    return header, bytes(out)


def decode_image(payload: bytes) -> dict:
    """Pure-Python image decode: (width, height, bpp, n_bytes) for the
    containers parseable without an imaging library — uncompressed BMP
    (header parse) and, since r12, 8-bit non-interlaced PNG (FULL decode
    incl. CRC + unfiltering, via decode_png_pixels). Other magics raise
    ValueError naming what is needed."""
    import struct

    if len(payload) >= 8 and payload[:8] == _PNG_MAGIC:
        header, _pixels = decode_png_pixels(payload)
        return header
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError(
            "unsupported image container (BMP and 8-bit PNG decode "
            "without an imaging library; JPEG needs PIL or equivalent)"
        )
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    return {
        "format": "bmp",
        "width": width,
        "height": abs(height),  # negative height = top-down rows
        "bpp": bpp,
        "n_bytes": len(payload),
    }


def encode_wav(n_channels: int, sample_rate: int, n_samples: int, seed: int) -> bytes:
    """Minimal PCM16 RIFF/WAVE with deterministic samples — the fixture
    adapter for decode_audio."""
    import struct

    block_align = n_channels * 2
    data_size = n_samples * block_align
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + data_size, b"WAVE", b"fmt ", 16,
        1, n_channels, sample_rate, sample_rate * block_align, block_align, 16,
        b"data", data_size,
    )
    samples = struct.pack(
        "<%dh" % (n_samples * n_channels),
        *(((seed * 13 + i) % 65536) - 32768 for i in range(n_samples * n_channels)),
    )
    return hdr + samples


def decode_audio(payload: bytes) -> dict:
    """Pure-Python RIFF/WAV header decode: (channels, sample rate, bits,
    sample count). Compressed codecs raise ValueError naming the need."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(
            "unsupported audio container (only RIFF/WAV decodes without an "
            "audio library; MP3/OGG need ffmpeg or equivalent)"
        )
    fmt, n_channels, sample_rate = struct.unpack_from("<HHI", payload, 20)
    (bits,) = struct.unpack_from("<H", payload, 34)
    (data_size,) = struct.unpack_from("<I", payload, 40)
    block_align = n_channels * bits // 8
    return {
        "format": "wav",
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "bits": bits,
        "n_samples": data_size // block_align if block_align else 0,
        "n_bytes": len(payload),
    }


def _extract_batches(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
    """Arrow-batched feature extraction. The md5/byte stats are the real
    deterministic part; the width/height/frames are a deterministic FAKE
    stand-in feature columns (same arithmetic as the oracle); the real
    header decoders are exercised by q_media_decode."""
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


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _media_decode_batches(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
    """Synthesize a real BMP or WAV payload per doc (parameters are doc_id
    arithmetic), then run the REAL header decoders on the bytes. The
    decoded values — not the synthesis parameters — are emitted, so a bug
    in either the writer or the parser breaks the oracle match."""
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            if d % 2 == 0:
                payload = encode_bmp(8 + d % 32, 8 + (d // 3) % 32, seed=d)
                m = decode_image(payload)
                rows.append(
                    (d, "image", m["width"], m["height"], None, None, None, m["n_bytes"])
                )
            else:
                payload = encode_wav(1 + d % 2, 8000 + (d % 4) * 4000, 16 + d % 64, seed=d)
                m = decode_audio(payload)
                rows.append(
                    (d, "audio", None, None, m["n_channels"], m["sample_rate"],
                     m["n_samples"], m["n_bytes"])
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "modality", "width", "height",
                "n_channels", "sample_rate", "n_samples", "n_bytes",
            ],
        )


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real media decode round-trip over the corpus: every doc gets a
    synthesized BMP (even ids) or PCM16 WAV (odd ids) payload whose
    parameters are doc_id arithmetic; the payload bytes then pass through
    the real pure-Python header decoders inside Arrow-batched mapInPandas.
    The oracle recomputes each decoded field's closed form (including the
    BMP row-stride padding and WAV block-align byte math), so the
    encode→decode round-trip must be byte-faithful to pass."""
    t = load_tables(spark, sf_dir)
    return t.documents.select("doc_id").mapInPandas(
        _media_decode_batches, schema=MEDIA_SCHEMA
    )


QUERIES = {
    "q_multimodal": q_multimodal,
    "q_multimodal_features": q_multimodal_features,
    "q_frame_sample": q_frame_sample,
    "q_media_decode": q_media_decode,
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
    # Closed forms of the decoded fields: BMP rows pad to 4 bytes
    # (stride = (3w+3)//4*4, file = 54-byte headers + height*stride);
    # WAV is 44 header bytes + n_samples * channels * 2 (PCM16).
    "q_media_decode": """
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
               CASE WHEN doc_id % 2 = 0 THEN 8 + doc_id % 32 END AS width,
               CASE WHEN doc_id % 2 = 0 THEN 8 + (doc_id // 3) % 32 END AS height,
               CASE WHEN doc_id % 2 = 1 THEN 1 + doc_id % 2 END AS n_channels,
               CASE WHEN doc_id % 2 = 1 THEN 8000 + (doc_id % 4) * 4000 END AS sample_rate,
               CASE WHEN doc_id % 2 = 1 THEN 16 + doc_id % 64 END AS n_samples,
               CASE WHEN doc_id % 2 = 0
                    THEN 54 + (8 + (doc_id // 3) % 32)
                             * ((3 * (8 + doc_id % 32) + 3) // 4 * 4)
                    ELSE 44 + (16 + doc_id % 64) * (1 + doc_id % 2) * 2
               END AS n_bytes
        FROM documents
    """,
}


def decode_pcm(payload: bytes) -> list[int]:
    """Full PCM16 data-section decode (not just the header): validates the
    RIFF/WAVE container via decode_audio, then unpacks the data chunk as
    little-endian int16 samples. The payload-level counterpart of
    decode_audio — a corrupted byte anywhere in the stream changes the
    returned samples."""
    import struct

    meta = decode_audio(payload)
    n = meta["n_samples"] * meta["n_channels"]
    return list(struct.unpack_from("<%dh" % n, payload, 44))


AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, n_samples bigint, sum_sq bigint, peak int, "
    "zero_cross bigint, rms_milli bigint"
)


def _audio_feature_batches(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
    """Synthesize a mono PCM16 WAV per doc, decode the FULL sample stream
    back from the bytes, and compute real signal features from the decoded
    samples (never from the synthesis parameters)."""
    import math

    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            payload = encode_wav(1, 8000 + (d % 4) * 4000, 64 + d % 64, seed=d)
            s = decode_pcm(payload)
            sum_sq = sum(x * x for x in s)
            peak = max(abs(x) for x in s)
            zc = sum(1 for a, b in zip(s, s[1:]) if (a < 0) != (b < 0))
            rms_milli = math.floor(math.sqrt(sum_sq / len(s)) * 1000.0 + 0.5)
            rows.append((d, len(s), sum_sq, peak, zc, rms_milli))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_samples", "sum_sq", "peak", "zero_cross", "rms_milli"],
        )


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction with a PAYLOAD-level round-trip: every doc
    synthesizes a mono PCM16 WAV (sample values are doc_id arithmetic),
    the full sample stream decodes back from the raw bytes inside
    Arrow-batched mapInPandas, and RMS energy / peak amplitude / zero
    crossings compute from the DECODED samples. The oracle recomputes
    every feature from the waveform's closed form, so a single corrupted
    byte in either the writer or the PCM parser breaks the hash —
    q_media_decode checks headers; this checks the data section.

    All features are exact integers (sums of int16 squares; sign-flip
    counts); RMS emits as fixed-point milli via floor(x·1000 + 0.5) on
    identical sqrt/divide expressions.

    Scale shape: linear mapInPandas scan, no shuffle; Python cost
    amortizes per Arrow batch. Real codecs (MP3/OGG) raise a clear
    ValueError naming the missing library (decode_audio contract)."""
    t = load_tables(spark, sf_dir)
    return t.documents.select("doc_id").mapInPandas(
        _audio_feature_batches, schema=AUDIO_FEATURES_SCHEMA
    )


QUERIES["q_audio_features"] = q_audio_features

ORACLES["q_audio_features"] = """
    WITH base AS (
        SELECT doc_id, 64 + doc_id % 64 AS n
        FROM documents
    ),
    samples AS (
        SELECT doc_id, n,
               CAST((doc_id * 13 + i.i) % 65536 - 32768 AS BIGINT) AS s,
               i.i AS idx
        FROM base, (SELECT unnest(range(0, 127)) AS i) i
        WHERE i.i < n
    ),
    feats AS (
        SELECT doc_id,
               CAST(max(n) AS BIGINT) AS n_samples,
               CAST(sum(s * s) AS BIGINT) AS sum_sq,
               CAST(max(abs(s)) AS INTEGER) AS peak,
               CAST(sum(CASE WHEN idx > 0 AND (s < 0) <>
                             ((CAST((doc_id * 13 + idx - 1) % 65536 - 32768 AS BIGINT)) < 0)
                        THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross
        FROM samples
        GROUP BY doc_id
    )
    SELECT doc_id, n_samples, sum_sq, peak, zero_cross,
           CAST(floor(sqrt(CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE))
                      * 1000.0 + 0.5) AS BIGINT) AS rms_milli
    FROM feats
"""
