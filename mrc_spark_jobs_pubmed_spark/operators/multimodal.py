"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata
(SURVEY.md §2 Part B / north-star multimodal).

Design: media travels as `content BINARY` with a `meta STRUCT` column in
Parquet (columnar binary storage, metadata predicate-pushdown-able); all
per-item processing is Arrow-batched `mapInPandas` — one Python crossing
per batch of blobs, schema declared up front, and row multiplicity under
the operator's control (frame sampling yields N rows per input).

The decode kernels themselves are STUBBED: the container has no
image/audio libs, so `_decode_bytes` raises NotImplementedError when
`strict=True` and otherwise produces a DETERMINISTIC fake decode derived
from the blob's md5 (documented, test-covered). The Spark-side plumbing —
schemas, batch iteration, explode shape, partition preservation — is the
real contract and is what the tests pin down. Swapping in PIL/ffmpeg
means replacing `_decode_bytes` only.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def make_mock_media(spark: SparkSession, n: int = 20, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media blobs (md5-stream bytes)."""
    rows = []
    for i in range(n):
        blob = b"".join(
            hashlib.md5(f"{kind}:{i}:{j}".encode()).digest() for j in range(8)
        )
        meta = (64 + i % 4 * 16, 48 + i % 3 * 16, 16_000, 1_000 + 100 * i, "mock")
        rows.append((i, kind, bytearray(blob), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_bytes(content: bytes, strict: bool = False) -> dict:
    """STUB decode kernel. Real implementation would be e.g.
    PIL.Image.open(io.BytesIO(content)); not available in this
    container, so `strict=True` surfaces NotImplementedError and the
    default is a deterministic md5-derived fake (stable across runs,
    engines, and partitionings)."""
    if strict:
        raise NotImplementedError(
            "real media decode requires an image/audio library not present "
            "in this environment; deterministic fake used in tests"
        )
    h = hashlib.md5(content).digest()
    return {
        "width": 16 + h[0],
        "height": 16 + h[1],
        "features": [round(b / 255.0, 6) for b in h[: FEATURE_DIM]],
    }


def decode_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """Batch decode + feature extraction: media → (id, dims, features).

    One Arrow batch of blobs per Python crossing; output schema fixed by
    DECODE_SCHEMA regardless of kernel.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_bytes(bytes(c), strict) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "n_bytes": [len(bytes(c)) for c in pdf["content"]],
                    "features": [d["features"] for d in decoded],
                }
            )

    return df.mapInPandas(run, DECODE_SCHEMA)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """binary→binary transform with meta update (resize plumbing).

    The fake kernel truncates/extends bytes deterministically to the
    'resized' length; the contract is schema-stable binary out + updated
    meta, which is all downstream stages depend on.
    """
    target_len = width * height // 64 + 16

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["content"] = [
                (bytes(c) * (target_len // max(len(bytes(c)), 1) + 1))[:target_len]
                for c in pdf["content"]
            ]
            meta = pd.DataFrame(list(pdf["meta"]))
            meta["width"], meta["height"] = width, height
            out["meta"] = meta.to_dict("records")
            yield out

    return df.mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame sampling: one input row → N frame rows (duration/step).

    The row-expansion shape (UDTF-like) is the real contract; fake frames
    are md5-derived slices keyed by (media_id, frame_idx) so results are
    stable under any partitioning.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for row in pdf.itertuples(index=False):
                duration = row.meta["duration_ms"]
                for k, ts in enumerate(range(0, duration, every_ms)):
                    ids.append(row.media_id)
                    idxs.append(k)
                    tss.append(ts)
                    frames.append(
                        hashlib.md5(f"{row.media_id}:{k}".encode()).digest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return df.mapInPandas(run, FRAME_SCHEMA)
