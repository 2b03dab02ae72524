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


# ---------------------------------------------------------------------------
# real in-sandbox decode: PPM (P6) — binary netpbm needs no native libs
# ---------------------------------------------------------------------------

PPM_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_px", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_min", T.IntegerType()),
        T.StructField("byte_max", T.IntegerType()),
    ]
)


def synth_ppm_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL image table: each document becomes a valid
    binary PPM (P6) file — `P6\\n{w} {h}\\n255\\n` header + w*h*3 pixel
    bytes (the document's utf-8 bytes tiled). Built entirely in Catalyst
    (string repeat + binary substring — JVM-side, scales with the scan);
    any netpbm tool can open the payloads. Dims derive from the byte
    length, so a SQL oracle can recompute every pixel."""
    c = F.col(text_col)
    blen = F.octet_length(F.encode(c, "UTF-8"))
    # stage len/dims in their own projection (CSE-safe: downstream exprs
    # reference cheap attributes, not the repeated encode subtree)
    staged = df.filter(blen > 0).select(
        F.col(id_col).cast("long").alias("media_id"),
        c.alias("__text"),
        blen.alias("__len"),
        (blen % 64 + 1).cast("int").alias("__w"),
        (blen % 48 + 1).cast("int").alias("__h"),
    ).withColumn("__need", (F.col("__w") * F.col("__h") * 3).cast("int"))
    header = F.encode(
        F.concat(
            F.lit("P6\n"), F.col("__w").cast("string"), F.lit(" "),
            F.col("__h").cast("string"), F.lit("\n255\n"),
        ),
        "UTF-8",
    )
    # tile the text's BYTES to w*h*3: repeating the string repeats its
    # utf-8 byte sequence; substring on binary slices bytes
    pixels = F.expr(
        "substring(encode(repeat(__text, cast(ceil(__need / __len) as int)), "
        "'UTF-8'), 1, __need)"
    )
    return staged.select(
        F.col("media_id"),
        F.concat(header, pixels).alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.col("__w").alias("width"),
            F.col("__h").alias("height"),
            F.lit("image/x-portable-pixmap").alias("codec"),
        ).alias("meta"),
    )


def decode_ppm(payload: bytes) -> "tuple[int, int, np.ndarray]":
    """Pure-Python binary PPM (P6) decoder — a REAL decode that runs in
    this sandbox (no native image libs needed): parses the netpbm header
    per spec (magic, whitespace- and comment-tolerant tokens, maxval)
    and returns (width, height, pixels[h, w, 3] uint8). Raises
    ValueError on malformed or truncated files."""
    if payload is None or len(payload) < 2 or payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        ch = payload[pos : pos + 1]
        if ch == b"#":  # comment runs to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif ch.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(payload[start:pos])
    width, height, maxval = (int(t) for t in tokens)
    if not (0 < maxval < 65536):
        raise ValueError(f"invalid PPM maxval {maxval}")
    pos += 1  # single whitespace after maxval, then raster
    bpc = 1 if maxval < 256 else 2
    need = width * height * 3 * bpc
    raster = payload[pos : pos + need]
    if len(raster) < need:
        raise ValueError(f"truncated PPM raster: {len(raster)} < {need}")
    dt = np.uint8 if bpc == 1 else np.dtype(">u2")
    return width, height, np.frombuffer(raster, dtype=dt).reshape(height, width, 3)


def ppm_features(df: DataFrame) -> DataFrame:
    """Decode PPM payloads (REAL decode, see :func:`decode_ppm`) and emit
    integer-exact pixel statistics — dims from the parsed header (not the
    metadata struct, so the decode itself is what's verified) plus
    byte sum/min/max over the raster. Integer outputs make the operator
    oracle-checkable to the last bit: the DuckDB twin recomputes every
    pixel from the source text via hex-extraction arithmetic
    (__spark_entry__.oracle_sql()['multimodal_features'])."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, ns, sums, mins, maxs = [], [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = decode_ppm(payload)
                flat = px.reshape(-1).astype(np.int64)
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                ns.append(flat.size)
                sums.append(int(flat.sum()))
                mins.append(int(flat.min()))
                maxs.append(int(flat.max()))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_px": pd.Series(ns, dtype="int32"),
                    "byte_sum": pd.Series(sums, dtype="int64"),
                    "byte_min": pd.Series(mins, dtype="int32"),
                    "byte_max": pd.Series(maxs, dtype="int32"),
                }
            )

    return df.mapInPandas(kernel, schema=PPM_FEATURE_SCHEMA)


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
