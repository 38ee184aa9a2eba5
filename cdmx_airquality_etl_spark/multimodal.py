"""Multimodal column support (north-star surface): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The container has no image/audio libraries, so the *general* decode seam is
gated (per the build contract): ``decode_media`` raises NotImplementedError
unless ``fake=True``, in which case it produces deterministic features
derived from the bytes. Everything Spark-side — schemas, partitioning, UDF
signatures, Arrow batch shapes — is real and tested; swapping the stub for
PIL/ffmpeg is a pure executor-side change. Since round 8 one decode IS real
end to end with zero libraries: :func:`decode_ppm` parses genuine P6 PPM
image bytes with a pure-stdlib parser, and q_multimodal_decode hash-checks
its exact channel sums against a DuckDB oracle over the same fixture spec.

Design for 100 TB:
- payloads stay opaque binary; metadata is a separate narrow struct column so
  metadata-only queries never deserialize payloads (column pruning does the
  work — verified by selecting meta.* without touching payload);
- decode runs in ``mapInPandas`` over Arrow record batches: bytes never pass
  through Python row-at-a-time, and ``spark.sql.execution.arrow
  .maxRecordsPerBatch`` bounds executor memory per batch;
- frame sampling emits one row per sampled frame via the iterator interface
  (a flatMap shape), keeping peak memory at one batch of frames;
- resize emits a fixed-size payload per row (width·height bytes in the
  stub), so downstream partition sizing is input-size-independent — the
  property a real resample also provides.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("n_bytes", LongType(), True),
                    StructField("sha256_prefix", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", BinaryType(), True),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def attach_binary(df: DataFrame, id_col: str, text_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Demo payload builder: treat a text column's UTF-8 bytes as an opaque
    payload and attach typed metadata — the schema/partitioning pattern real
    media tables use (payload opaque, metadata narrow)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.substring(F.sha2(payload, 256), 1, 16).alias("sha256_prefix"),
        ).alias("meta"),
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: dim doubles derived from a
    sha256 stream over the payload."""
    out: list[float] = []
    h = hashlib.sha256(payload)
    block = h.digest()
    while len(out) < dim:
        for i in range(0, len(block) - 7, 8):
            out.append(int.from_bytes(block[i : i + 8], "big") / 2**64)
            if len(out) == dim:
                break
        block = hashlib.sha256(block).digest()
    return out


def decode_media(media: DataFrame, dim: int = 8, fake: bool = False) -> DataFrame:
    """payload → feature vector. STUB: the real decoder (image decode +
    embed) needs libraries absent from this container; ``fake=True`` runs a
    deterministic bytes-derived feature so the full pipeline is testable."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decoding requires an image/audio library not present "
                    "in this environment; pass fake=True for the deterministic stub"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": [
                        _fake_feature(bytes(p) if p is not None else b"", dim)
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.select("media_id", "payload").mapInPandas(_decode, FEATURE_SCHEMA)


PPM_FIXTURE_N = 64

PPM_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("maxval", IntegerType(), True),
        StructField("n_pixels", LongType(), True),
        StructField("sum_r", LongType(), True),
        StructField("sum_g", LongType(), True),
        StructField("sum_b", LongType(), True),
    ]
)


def ppm_fixture_payload(i: int) -> bytes:
    """Deterministic binary PPM (P6) image for fixture id ``i``: variable
    dimensions (so header parsing is load-bearing), a comment line (so
    comment handling is load-bearing), and pixel bytes from a closed-form
    modular formula a SQL oracle can recompute exactly. This is a REAL
    image file — any PPM reader (PIL, ImageMagick, netpbm) opens it."""
    w = 8 + (i % 5) * 4  # 8..24
    h = 6 + (i % 7) * 3  # 6..24
    header = f"P6\n# fixture {i}\n{w} {h}\n255\n".encode("ascii")
    body = bytes((i * 7 + p * 13) % 256 for p in range(w * h * 3))
    return header + body


def encode_ppm_fixture(ids: DataFrame) -> DataFrame:
    """``spark.range`` frame → one real P6 payload per id (Arrow-batched)."""

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["id"],
                    "payload": [ppm_fixture_payload(int(i)) for i in pdf["id"]],
                }
            )

    return ids.mapInPandas(_enc, "media_id long, payload binary")


def _parse_ppm(data: bytes) -> tuple[int, int, int, int, int, int, int]:
    """Pure-stdlib P6 parser, written against the netpbm spec (not the
    fixture writer): magic, then three whitespace-separated decimal fields
    with ``#`` comments allowed anywhere in the header, exactly one
    whitespace byte after maxval, then ``3*w*h`` raw sample bytes. Returns
    (width, height, maxval, n_pixels, sum_r, sum_g, sum_b) with exact
    integer channel sums."""
    pos = 0

    def _token() -> bytes:
        nonlocal pos
        while pos < len(data):
            c = data[pos : pos + 1]
            if c in (b" ", b"\t", b"\r", b"\n"):
                pos += 1
            elif c == b"#":
                while pos < len(data) and data[pos : pos + 1] != b"\n":
                    pos += 1
            else:
                break
        start = pos
        while pos < len(data) and data[pos : pos + 1] not in (
            b" ",
            b"\t",
            b"\r",
            b"\n",
        ):
            pos += 1
        return data[start:pos]

    if _token() != b"P6":
        raise ValueError("not a P6 PPM payload")
    width, height, maxval = int(_token()), int(_token()), int(_token())
    if maxval > 255:
        raise ValueError("2-byte-sample PPM not supported")
    pos += 1  # the single whitespace byte terminating the header
    body = data[pos : pos + width * height * 3]
    if len(body) != width * height * 3:
        raise ValueError("truncated PPM body")
    return (
        width,
        height,
        maxval,
        width * height,
        sum(body[0::3]),
        sum(body[1::3]),
        sum(body[2::3]),
    )


def decode_ppm(media: DataFrame) -> DataFrame:
    """REAL binary image decode (no fake flag, no gated library): parse
    each payload as a P6 PPM with :func:`_parse_ppm` and emit exact header
    fields + per-channel integer sums. Same mapInPandas batch shape as
    :func:`decode_media`; this is the decode seam actually executing
    against real image bytes, using nothing beyond the stdlib."""

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [
                _parse_ppm(bytes(p)) if p is not None else (None,) * 7
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [t[0] for t in parsed],
                    "height": [t[1] for t in parsed],
                    "maxval": [t[2] for t in parsed],
                    "n_pixels": [t[3] for t in parsed],
                    "sum_r": [t[4] for t in parsed],
                    "sum_g": [t[5] for t in parsed],
                    "sum_b": [t[6] for t in parsed],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _dec, PPM_DECODE_SCHEMA
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 4,
                  fake: bool = False) -> DataFrame:
    """Frame sampling STUB (video → every-Nth-frame): slices the payload at
    fixed offsets, one output row per 'frame' (flatMap shape)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame extraction requires a video library not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(p) if p is not None else b""
                for k in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(data[k * every_n_bytes : (k + 1) * every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_bytes": frames})

    return media.select("media_id", "payload").mapInPandas(_frames, FRAME_SCHEMA)


def resize_media(
    media: DataFrame, width: int = 32, height: int = 32, fake: bool = False
) -> DataFrame:
    """Resize STUB (image → width×height): 1-row-per-row mapInPandas with the
    real operator's schema and batch shape. The real path (decode → resample
    → re-encode) needs an image library absent from this container; the
    ``fake=True`` stand-in emits a deterministic width·height-byte payload
    (sha256 byte stream over the original) so output size — the property
    downstream partition sizing depends on — behaves like a real resize:
    fixed per row, independent of input size."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resizing requires an image library not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            outs = []
            for p in pdf["payload"]:
                data = bytes(p) if p is not None else b""
                block, buf = hashlib.sha256(data).digest(), b""
                while len(buf) < target:
                    buf += block
                    block = hashlib.sha256(block).digest()
                outs.append(buf[:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": outs,
                }
            )

    return media.select("media_id", "payload").mapInPandas(_resize, RESIZE_SCHEMA)
