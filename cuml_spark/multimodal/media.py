"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline treats media as ``binary`` payload columns
with a typed metadata struct; decode / resize / feature-extract / frame-
sample run as Arrow-batched pandas kernels over ``mapInPandas`` so each
executor decodes its own partition — no media bytes ever cross the driver.

The image/audio codec libraries are NOT in this container, so the decode
kernels are STUBS: ``decoder='fake'`` (default) is a deterministic
byte-derived pixel generator that exercises the full Spark plumbing
(schemas, batching, partition independence); ``decoder='pil'``-style real
codecs raise NotImplementedError with the dependency named.  Swapping the
fake for a real codec changes ONE numpy function; every schema, partition,
and batch contract stays identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# payload + typed metadata column convention for media tables
MEDIA_SCHEMA = (
    "media_id long, content binary, "
    "meta struct<format string, width int, height int, n_frames int>"
)


def with_media_metadata(df: DataFrame, content_col: str = "content",
                        fmt: str = "raw", width: int = 8, height: int = 8,
                        n_frames: int = 1) -> DataFrame:
    """Attach the typed metadata struct (static here; a real ingest fills it
    from container headers)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(fmt).alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(n_frames).alias("n_frames"),
        ),
    )


def _fake_decode(buf: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a codec: tile the payload bytes into a
    (height, width) uint8 'image'.  STUB — replace with a real decoder."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    need = width * height
    if raw.size == 0:
        raw = np.zeros(1, dtype=np.uint8)
    tiled = np.resize(raw, need)
    return tiled.reshape(height, width)


def _require_real_decoder(name: str):
    raise NotImplementedError(
        f"real {name} decoding needs an image/audio codec library "
        "(e.g. Pillow/ffmpeg) which is not installed in this environment; "
        "use decoder='fake' for the deterministic stub"
    )


def decode_image(df: DataFrame, content_col: str = "content",
                 id_col: str = "media_id", decoder: str = "fake") -> DataFrame:
    """binary → (id, pixels array<int>, width, height), one row per image."""
    if decoder != "fake":
        _require_real_decoder("image")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                w = int(row["meta"]["width"])
                h = int(row["meta"]["height"])
                img = _fake_decode(row[content_col], w, h)
                out.append(
                    {
                        "media_id": row[id_col],
                        "pixels": img.ravel().astype(np.int64).tolist(),
                        "width": w,
                        "height": h,
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(
        kernel, "media_id long, pixels array<bigint>, width int, height int"
    )


def resize_image(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of decoded pixel arrays (pure numpy kernel)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                w, h = int(row["width"]), int(row["height"])
                img = np.asarray(row["pixels"], dtype=np.int64).reshape(h, w)
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                res = img[np.ix_(yi, xi)]
                out.append(
                    {
                        "media_id": row["media_id"],
                        "pixels": res.ravel().tolist(),
                        "width": out_w,
                        "height": out_h,
                    }
                )
            yield pd.DataFrame(out)

    return decoded.mapInPandas(
        kernel, "media_id long, pixels array<bigint>, width int, height int"
    )


def extract_features(decoded: DataFrame) -> DataFrame:
    """Per-image summary features (mean/std/min/max of pixels) — the shape a
    real embedding model would output, computable by the stub."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                px = np.asarray(row["pixels"], dtype=np.float64)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "n_pixels": int(px.size),
                        "mean_px": float(px.mean()),
                        "std_px": float(px.std()),
                        "min_px": float(px.min()),
                        "max_px": float(px.max()),
                    }
                )
            yield pd.DataFrame(out)

    return decoded.mapInPandas(
        kernel,
        "media_id long, n_pixels int, mean_px double, std_px double, "
        "min_px double, max_px double",
    )


def frame_sample(df: DataFrame, every_n: int = 2, content_col: str = "content",
                 id_col: str = "media_id", frame_bytes: int = 64,
                 decoder: str = "fake") -> DataFrame:
    """'Video' payload → every n-th fixed-size frame chunk
    (id, frame_idx, frame binary)."""
    if decoder != "fake":
        _require_real_decoder("video")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                buf = bytes(row[content_col])
                n_frames = max(1, len(buf) // frame_bytes)
                for fi in range(0, n_frames, every_n):
                    out.append(
                        {
                            "media_id": row[id_col],
                            "frame_idx": fi,
                            "frame": buf[fi * frame_bytes : (fi + 1) * frame_bytes],
                        }
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, "media_id long, frame_idx int, frame binary")
