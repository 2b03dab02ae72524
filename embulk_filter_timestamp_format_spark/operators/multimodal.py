"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata struct
(modality, width/height or sample_rate/duration, codec). The Spark-side
plumbing — schema, partitioning, Arrow batch shape, UDF signatures — is
real and tested; the actual media decode is STUBBED because no
image/audio libraries exist in this container:

* ``decode_image`` raises NotImplementedError when ``real_decode=True``
  (the integration point for PIL/libvips on a real cluster);
* by default it produces a DETERMINISTIC FAKE decode (pixel stats derived
  from the payload bytes) so downstream operators (feature extraction,
  resize bookkeeping, frame sampling) can be exercised end-to-end.

All kernels are `mapInPandas` over Arrow batches — payload bytes never
pass through per-row Python loops on the driver, and batch size is
governed by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synth_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table from the documents table (payload =
    utf-8 bytes of the text; metadata derived from its length)."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(c, "UTF-8").alias("payload"),
        F.struct(
            F.when(F.length(c) % 2 == 0, F.lit("image")).otherwise(F.lit("audio")).alias("modality"),
            (F.length(c) % 64 + 1).cast("int").alias("width"),
            (F.length(c) % 48 + 1).cast("int").alias("height"),
            F.lit("fake/v1").alias("codec"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake 'pixels': payload bytes tiled to width×height."""
    if payload is None or len(payload) == 0:
        return np.zeros((height or 1, width or 1), dtype=np.uint8)
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = max(width, 1) * max(height, 1)
    tiled = np.resize(arr, need)
    return tiled.reshape(max(height, 1), max(width, 1))


def _pil_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Real image decode via Pillow (optional dependency): payload bytes →
    grayscale pixel array, resized to the metadata dims when present —
    the integration point a real cluster exercises; import stays inside
    the Arrow kernel so the dependency is executor-side only."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L")
    if width and height:
        img = img.resize((width, height))
    return np.asarray(img, dtype=np.uint8)


def extract_features(
    df: DataFrame, n_features: int = 8, real_decode: bool = False
) -> DataFrame:
    """Decode + feature extraction over Arrow batches.

    Features: byte-histogram moments of the decoded payload — a stand-in
    with the exact UDF signature/batch shape a real CNN/spectrogram
    extractor would use. ``real_decode=True`` decodes payloads as real
    images through Pillow when it is installed (pytest covers this path
    with a skip-unless marker) and raises NotImplementedError with a
    clear install hint otherwise; the default stays the deterministic
    fake so sandboxed environments exercise the full plumbing.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _fake_decode
        if real_decode:
            try:
                import PIL  # noqa: F401
            except ImportError as ex:
                raise NotImplementedError(
                    "real media decode requires Pillow (PIL) on the "
                    "executors; install it or use the deterministic fake "
                    "decode (real_decode=False)"
                ) from ex
            decode = _pil_decode
        for pdf in batches:
            out_rows = {
                "media_id": pdf["media_id"],
                "modality": pdf["meta"].map(lambda m: m["modality"]),
                "payload_sha256": pdf["payload"].map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                ),
                "n_bytes": pdf["payload"].map(lambda b: len(b or b"")).astype("int32"),
            }
            feats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                px = decode(payload, meta["width"], meta["height"]).astype(np.float64)
                mom = [
                    px.mean(),
                    px.std(),
                    px.min(),
                    px.max(),
                    float(np.median(px)),
                    px.shape[0],
                    px.shape[1],
                    px.sum() % 997,
                ]
                feats.append(np.asarray(mom[:n_features], dtype=np.float32))
            out_rows["features"] = pd.Series(feats, index=pdf.index, dtype=object)
            yield pd.DataFrame(out_rows)

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 4) -> DataFrame:
    """'Video' frame sampling stand-in: splits the payload into fixed-size
    frames and keeps every n-th — the partition/batch plumbing of a real
    frame sampler (payload slicing stays vectorized per Arrow batch)."""
    frame_size = 16

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = payload or b""
                for fi in range(0, len(b) // frame_size, every_n):
                    ids.append(mid)
                    nos.append(fi)
                    frames.append(b[fi * frame_size : (fi + 1) * frame_size])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return df.mapInPandas(kernel, schema=out_schema)
