"""Multimodal column plumbing: opaque binary + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct (modality, byte size, content hash). Decode / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the payload
never round-trips through Python row-by-row.

The decode step itself is STUBBED: the real image/audio codecs are not in
this container. ``extract_features`` dispatches to a clearly-marked
deterministic fake (content-hash-derived features) unless a real decoder
is injected — the Spark-side contract (schema, batching, partitioning) is
real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, source_col: str, modality: str = "image", id_col: str = "doc_id"
) -> DataFrame:
    """Wrap a column as an opaque binary payload + metadata struct.

    (In production the payload arrives as real bytes — e.g. parquet binary
    from an object-store manifest; here we encode a text column so the
    pipeline shape is exercised end-to-end.)
    """
    payload = F.encode(F.col(source_col), "utf-8")
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("content_sha"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB decoder: deterministic pseudo-features from the content hash.

    Raises nothing — but a real deployment would replace this via the
    ``decoder`` argument of :func:`extract_features` with e.g. a PIL/ffmpeg
    batch decode. Marked fake on purpose: this container has no codecs.
    """
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 4], dtype="<u4").astype(np.float64)
    return np.round(raw / 2**32, 6)


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``df`` must have (doc_id, payload, meta) as produced by
    :func:`attach_binary_payload`. Runs as ``mapInPandas``: one Python
    invocation per Arrow batch (not per row), schema pinned to
    FEATURES_SCHEMA.
    """
    if decoder is None:
        # Inline (nested) copy of _fake_decode: cloudpickle serializes
        # nested functions BY VALUE, so executors don't need the
        # clickhouse_etl_spark package importable — a module-level default
        # would pickle by reference and break on bare workers.
        def decoder(payload: bytes) -> np.ndarray:
            digest = hashlib.sha256(payload).digest()
            raw = np.frombuffer(digest[: FEATURE_DIM * 4], dtype="<u4").astype(
                np.float64
            )
            return np.round(raw / 2**32, 6)

    decode = decoder

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": [int(m["n_bytes"]) for m in pdf["meta"]],
                    "content_sha": [m["content_sha"] for m in pdf["meta"]],
                    "features": feats,
                }
            )

    return df.mapInPandas(batches, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Arrow-batched image resize over binary payloads.

    ``resizer(payload, w, h) -> bytes`` is the injection seam for a real
    codec (PIL/libvips — not in this container). The default STUB is a
    deterministic fake that emits a w*h-byte pseudo-image derived from the
    content hash, so the Spark contract — schema, batch shape, payload
    size ∝ w*h — is real and testable.
    """
    if resizer is None:

        def resizer(payload: bytes, w: int, h: int) -> bytes:
            digest = hashlib.sha256(payload).digest()
            reps = (w * h) // len(digest) + 1
            return (digest * reps)[: w * h]

    resize = resizer

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [resize(p, width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                    "n_bytes": [len(b) for b in out],
                }
            )

    return df.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_frames_total", T.IntegerType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_nth: int = 10,
    decoder: Callable[[bytes], list] | None = None,
) -> DataFrame:
    """Frame sampling for video payloads: 1 row in → N frame rows out.

    The fan-out shape (mapInPandas may yield MORE rows than it receives)
    is the part Spark must get right — schema, ordering column, and the
    per-frame binary. The STUB ``decoder`` fakes a 32-'frame' video by
    chunking the payload; a real ffmpeg-backed decoder plugs into the
    same seam.
    """
    if decoder is None:

        def decoder(payload: bytes) -> list:
            n = 32
            chunk = max(1, len(payload) // n)
            return [payload[i * chunk : (i + 1) * chunk] for i in range(n)]

    decode = decoder

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_no": [], "frame": [], "n_frames_total": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode(payload)
                for i in range(0, len(frames), every_nth):
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(i)
                    rows["frame"].append(frames[i])
                    rows["n_frames_total"].append(len(frames))
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=FRAMES_SCHEMA)
