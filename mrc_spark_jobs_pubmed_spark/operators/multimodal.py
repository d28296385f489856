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

    r11 (guide §4.1/§4.2): the input is projected to the two columns the
    kernel reads BEFORE the opaque crossing (kind/meta no longer ship to
    Python — Spark cannot prune into a mapInPandas), and the per-batch
    body is vectorized: the md5 calls remain per row (that is the priced
    decode stand-in), but dims/features derive from ONE (n, 16) uint8
    view of the concatenated digests instead of per-row dict/list
    building. Values are bit-identical: round(b/255, 6) on float64 is
    the same double the old per-element Python round produced, and the
    float32 narrowing happens at the same place (Arrow column cast).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if strict:  # surface the stub contract exactly as _decode_bytes
            for pdf in batches:
                for c in pdf["content"]:
                    _decode_bytes(bytes(c), strict=True)
            return
        for pdf in batches:
            blobs = [bytes(c) for c in pdf["content"]]
            n = len(blobs)
            if n == 0:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": [],
                        "height": [],
                        "n_bytes": [],
                        "features": [],
                    }
                )
                continue
            digests = b"".join(hashlib.md5(b).digest() for b in blobs)
            h = np.frombuffer(digests, dtype=np.uint8).reshape(n, 16)
            feats = np.round(h[:, :FEATURE_DIM].astype(np.float64) / 255.0, 6)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": (16 + h[:, 0].astype(np.int32)),
                    "height": (16 + h[:, 1].astype(np.int32)),
                    "n_bytes": np.fromiter(
                        (len(b) for b in blobs), dtype=np.int64, count=n
                    ),
                    "features": list(feats),
                }
            )

    return df.select("media_id", "content").mapInPandas(run, DECODE_SCHEMA)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """binary→binary transform with meta update (resize plumbing).

    The fake kernel truncates/extends bytes deterministically to the
    'resized' length; the contract is schema-stable binary out + updated
    meta, which is all downstream stages depend on.
    """
    target_len = width * height // 64 + 16

    # r11 (guide §4.2): the kernel is pure byte re-slicing, so it runs
    # as mapInArrow on the columnar buffers — tile via binary_repeat
    # (a new offsets walk over mostly the same data) and cut via
    # binary_slice, never materializing per-row Python bytes objects;
    # the meta struct update swaps two constant child arrays. The
    # Python crossing (one Arrow batch per task) is unchanged — this
    # changes only what happens inside the batch.
    def run(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            names = batch.schema.names
            cols = {nm: batch.column(i) for i, nm in enumerate(names)}
            content = cols["content"]
            lens = pc.max_element_wise(
                pc.cast(pc.binary_length(content), pa.int64()),
                pa.scalar(1, pa.int64()),
            )
            reps = pc.add(
                pc.divide(pa.scalar(target_len, pa.int64()), lens),
                pa.scalar(1, pa.int64()),
            )
            resized = pc.binary_slice(
                pc.binary_repeat(content, pc.cast(reps, pa.int32())),
                0,
                target_len,
            )
            meta = cols["meta"]
            n = len(batch)
            const_w = pa.array([width] * n, pa.int32())
            const_h = pa.array([height] * n, pa.int32())
            new_meta = pa.StructArray.from_arrays(
                [
                    const_w,
                    const_h,
                    meta.field("sample_rate"),
                    meta.field("duration_ms"),
                    meta.field("format"),
                ],
                names=[
                    "width",
                    "height",
                    "sample_rate",
                    "duration_ms",
                    "format",
                ],
                mask=meta.is_null() if meta.null_count else None,
            )
            out = {nm: cols[nm] for nm in names}
            out["content"] = resized
            out["meta"] = new_meta
            yield pa.RecordBatch.from_arrays(
                [out[nm] for nm in names], names=names
            )

    return df.mapInArrow(run, MEDIA_SCHEMA)


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
