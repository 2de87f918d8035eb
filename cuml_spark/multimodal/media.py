"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline treats media as ``binary`` payload columns
with a typed metadata struct; decode / resize / feature-extract / frame-
sample run as Arrow-batched pandas kernels over ``mapInPandas`` so each
executor decodes its own partition — no media bytes ever cross the driver.

Decode paths:

* ``decoder='fake'`` (default) — deterministic byte-derived pixel generator
  exercising the full Spark plumbing (schemas, batching, partition
  independence) with no container parsing at all;
* ``decoder='auto'|'png'|'bmp'|'ppm'|'jpeg'|'gif'`` — REAL decoding via the pure
  stdlib+numpy codecs in :mod:`cuml_spark.multimodal.codecs` (PNG zlib
  inflate + unfilter, BMP/netpbm header parses) and the JPEG decoders in
  :mod:`cuml_spark.multimodal.jpeg` (baseline SOF0/1: Huffman + IDCT +
  chroma upsampling) and :mod:`cuml_spark.multimodal.jpeg_progressive`
  (SOF2: spectral selection + successive approximation, dispatched by the
  SOF marker); multi-channel images land as integer BT.601 luma so the
  single-channel pixel pipeline downstream (resize / extract_features)
  applies unchanged;
* :func:`decode_audio` — REAL WAV PCM decode (stdlib ``wave``);
* formats that genuinely need an external codec (MP4, compressed audio, …)
  raise ``NotImplementedError`` naming the dependency.
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
        "supported without it: decoder='auto'/'png'/'bmp'/'ppm' (images), "
        "decode_audio (WAV), decoder='fake' (deterministic stub)"
    )


_IMAGE_DECODERS = ("fake", "auto", "png", "bmp", "ppm", "jpeg", "jpg", "gif",
                   "tiff")


def decode_image(df: DataFrame, content_col: str = "content",
                 id_col: str = "media_id", decoder: str = "fake") -> DataFrame:
    """binary → (id, pixels array<int>, width, height), one row per image.

    Real decoders ('auto' sniffs magic bytes; 'png'/'bmp'/'ppm' force a
    container) take dimensions from the FILE HEADERS — the meta struct is
    only consulted by the 'fake' stub.  Multi-channel images are reduced to
    integer BT.601 luma (see codecs.to_luma) so every downstream kernel
    keeps its single-channel contract.
    """
    if decoder not in _IMAGE_DECODERS:
        _require_real_decoder(f"image ({decoder})")
    if decoder != "fake":
        from cuml_spark.multimodal import codecs

        def real_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                ids, pixels, ws, hs = [], [], [], []
                for mid, b in zip(pdf[id_col], pdf[content_col]):
                    buf = bytes(b)
                    fmt = codecs.sniff_format(buf) if decoder == "auto" else decoder
                    if fmt == "png":
                        img = codecs.decode_png(buf)
                    elif fmt == "bmp":
                        img = codecs.decode_bmp(buf)
                    elif fmt == "ppm":
                        img = codecs.decode_ppm(buf)
                    elif fmt in ("jpeg", "jpg"):
                        from cuml_spark.multimodal.jpeg import decode_jpeg

                        img = decode_jpeg(buf)
                    elif fmt == "gif":
                        img = codecs.decode_gif(buf)
                    elif fmt == "tiff":
                        img = codecs.decode_tiff(buf)
                    else:
                        _require_real_decoder(f"image ({fmt or 'unknown format'})")
                    luma = codecs.to_luma(img)
                    ids.append(mid)
                    pixels.append(luma.ravel())
                    hs.append(luma.shape[0])
                    ws.append(luma.shape[1])
                yield pd.DataFrame({
                    "media_id": np.asarray(ids, dtype=np.int64),
                    "pixels": pixels,
                    "width": np.asarray(ws, dtype=np.int32),
                    "height": np.asarray(hs, dtype=np.int32),
                })

        return df.mapInPandas(
            real_kernel, "media_id long, pixels array<bigint>, width int, height int"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            metas = pdf["meta"].to_numpy()
            ws = np.fromiter((m["width"] for m in metas), dtype=np.int64,
                             count=len(pdf))
            hs = np.fromiter((m["height"] for m in metas), dtype=np.int64,
                             count=len(pdf))
            bufs = pdf[content_col].to_numpy()
            if ws.min() == ws.max() and hs.min() == hs.max():
                # uniform dims: one (n, w·h) matrix, single astype — the
                # whole batch decodes as one numpy op per stage
                need = int(ws[0] * hs[0])
                M = np.stack([
                    np.resize(
                        np.frombuffer(b, dtype=np.uint8) if len(b)
                        else np.zeros(1, dtype=np.uint8),
                        need,
                    )
                    for b in bufs
                ]).astype(np.int64)
                pixels = list(M)
            else:
                pixels = [
                    _fake_decode(b, int(w), int(h)).ravel().astype(np.int64)
                    for b, w, h in zip(bufs, ws, hs)
                ]
            yield pd.DataFrame({
                "media_id": pdf[id_col].to_numpy(),
                "pixels": pixels,
                "width": ws.astype(np.int32),
                "height": hs.astype(np.int32),
            })

    return df.mapInPandas(
        kernel, "media_id long, pixels array<bigint>, width int, height int"
    )


def _bilinear_batch(imgs: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(n, h, w) → (n, out_h, out_w) bilinear, half-pixel-center convention
    (the standard align_corners=False mapping), rounded to int."""
    n, h, w = imgs.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[None, :, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, None, :]
    f = imgs.astype(np.float64)
    top = f[:, y0][:, :, x0] * (1 - fx) + f[:, y0][:, :, x1] * fx
    bot = f[:, y1][:, :, x0] * (1 - fx) + f[:, y1][:, :, x1] * fx
    return np.rint(top * (1 - fy) + bot * fy).astype(np.int64)


def _area_batch(imgs: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(n, h, w) → (n, out_h, out_w) box/area average (exact when the scale
    divides evenly, partition-of-rows/cols otherwise) — the anti-aliased
    downsample training pipelines default to."""
    n, h, w = imgs.shape
    ye = (np.arange(out_h + 1) * h) // out_h
    xe = (np.arange(out_w + 1) * w) // out_w
    csum = np.zeros((n, h + 1, w + 1))
    csum[:, 1:, 1:] = imgs.cumsum(axis=1).cumsum(axis=2)
    S = (csum[:, ye[1:]][:, :, xe[1:]] - csum[:, ye[:-1]][:, :, xe[1:]]
         - csum[:, ye[1:]][:, :, xe[:-1]] + csum[:, ye[:-1]][:, :, xe[:-1]])
    areas = ((ye[1:] - ye[:-1])[:, None] * (xe[1:] - xe[:-1])[None, :])
    return np.rint(S / areas[None]).astype(np.int64)


def resize_image(decoded: DataFrame, out_w: int, out_h: int,
                 method: str = "nearest") -> DataFrame:
    """Resize decoded pixel arrays (pure numpy kernels, whole batch at once
    for uniform dims).  ``method``: 'nearest' (exact index pick),
    'bilinear' (half-pixel-center interpolation), or 'area' (box average —
    the anti-aliased downsample training pipelines default to)."""
    if method not in ("nearest", "bilinear", "area"):
        raise ValueError("method must be nearest | bilinear | area")

    def one(img: np.ndarray) -> np.ndarray:
        h, w = img.shape
        if method == "nearest":
            yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
            xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
            return img[np.ix_(yi, xi)]
        if method == "bilinear":
            return _bilinear_batch(img[None], out_h, out_w)[0]
        return _area_batch(img[None], out_h, out_w)[0]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ws = pdf["width"].to_numpy()
            hs = pdf["height"].to_numpy()
            px = pdf["pixels"].to_numpy()
            if ws.min() == ws.max() and hs.min() == hs.max():
                # uniform dims: resize the whole batch with ONE kernel call
                w, h = int(ws[0]), int(hs[0])
                imgs = np.stack([np.asarray(p, dtype=np.int64) for p in px])
                imgs = imgs.reshape(len(pdf), h, w)
                if method == "nearest":
                    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                    res = imgs[:, yi][:, :, xi]
                elif method == "bilinear":
                    res = _bilinear_batch(imgs, out_h, out_w)
                else:
                    res = _area_batch(imgs, out_h, out_w)
                pixels = list(res.reshape(len(pdf), -1))
            else:
                pixels = [
                    one(np.asarray(p, dtype=np.int64).reshape(int(h), int(w))).ravel()
                    for p, w, h in zip(px, ws, hs)
                ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "pixels": pixels,
                "width": np.full(len(pdf), out_w, dtype=np.int32),
                "height": np.full(len(pdf), out_h, dtype=np.int32),
            })

    return decoded.mapInPandas(
        kernel, "media_id long, pixels array<bigint>, width int, height int"
    )


def extract_features(decoded: DataFrame) -> DataFrame:
    """Per-image summary features (mean/std/min/max of pixels) — the shape a
    real embedding model would output, computable by the stub."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            px = pdf["pixels"].to_numpy()
            sizes = np.fromiter((len(p) for p in px), dtype=np.int64,
                                count=len(pdf))
            if sizes.min() == sizes.max():
                # uniform length: one (n, p) matrix, axis-1 reductions
                M = np.stack([np.asarray(p, dtype=np.float64) for p in px])
                yield pd.DataFrame({
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_pixels": sizes.astype(np.int32),
                    "mean_px": M.mean(axis=1),
                    "std_px": M.std(axis=1),
                    "min_px": M.min(axis=1),
                    "max_px": M.max(axis=1),
                })
            else:
                arrs = [np.asarray(p, dtype=np.float64) for p in px]
                yield pd.DataFrame({
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_pixels": sizes.astype(np.int32),
                    "mean_px": np.array([a.mean() for a in arrs]),
                    "std_px": np.array([a.std() for a in arrs]),
                    "min_px": np.array([a.min() for a in arrs]),
                    "max_px": np.array([a.max() for a in arrs]),
                })

    return decoded.mapInPandas(
        kernel,
        "media_id long, n_pixels int, mean_px double, std_px double, "
        "min_px double, max_px double",
    )


def frame_sample(df: DataFrame, every_n: int = 2, content_col: str = "content",
                 id_col: str = "media_id", frame_bytes: int = 64,
                 decoder: str = "fake") -> DataFrame:
    """Video payload → every n-th frame (id, frame_idx, frame binary).

    ``decoder='avi'`` REALLY parses the RIFF container of a Motion-JPEG AVI
    and emits each sampled frame's standalone JPEG payload — feed the result
    to ``decode_image(decoder='auto')`` for pixels.  ``decoder='fake'``
    (default) chunks raw bytes into fixed-size pseudo-frames (plumbing
    stub).  Other containers (MP4/H.264…) raise naming the codec gap.
    """
    if decoder == "avi":
        from cuml_spark.multimodal import codecs

        def avi_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                ids, idxs, frames = [], [], []
                for mid, b in zip(pdf[id_col], pdf[content_col]):
                    fr, _fps = codecs.parse_avi_frames(bytes(b))
                    for fi in range(0, len(fr), every_n):
                        ids.append(mid)
                        idxs.append(fi)
                        frames.append(fr[fi])
                yield pd.DataFrame({
                    "media_id": np.asarray(ids, dtype=np.int64),
                    "frame_idx": np.asarray(idxs, dtype=np.int32),
                    "frame": frames,
                })

        return df.mapInPandas(
            avi_kernel, "media_id long, frame_idx int, frame binary")
    if decoder != "fake":
        _require_real_decoder("video")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            bufs = [bytes(b) for b in pdf[content_col]]
            counts = np.maximum(
                np.fromiter((len(b) for b in bufs), dtype=np.int64,
                            count=len(bufs)) // frame_bytes,
                1,
            )
            kept = -(-counts // every_n)  # frames kept per row (ceil)
            out_ids = np.repeat(ids, kept)
            idxs = np.concatenate(
                [np.arange(0, c, every_n, dtype=np.int64) for c in counts]
            )
            frames = [
                b[fi * frame_bytes:(fi + 1) * frame_bytes]
                for b, c in zip(bufs, counts)
                for fi in range(0, c, every_n)
            ]
            yield pd.DataFrame({
                "media_id": out_ids,
                "frame_idx": idxs.astype(np.int32),
                "frame": frames,
            })

    return df.mapInPandas(kernel, "media_id long, frame_idx int, frame binary")


def extract_audio_features(decoded: DataFrame) -> DataFrame:
    """Per-clip summary features over decoded mono samples — RMS level,
    zero-crossing rate, and FFT spectral centroid (normalized frequency in
    [0, 0.5]); the shape an audio-quality filter or embedding stage consumes.
    Pure numpy per Arrow batch; no per-row Python."""
    from collections.abc import Iterator

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, rms, zcr, cent = [], [], [], []
            for mid, s in zip(pdf["media_id"], pdf["samples"]):
                x = np.asarray(s, dtype=np.float64)
                n = len(x)
                ids.append(mid)
                if n == 0:
                    rms.append(0.0)
                    zcr.append(0.0)
                    cent.append(0.0)
                    continue
                rms.append(float(np.sqrt((x * x).mean())))
                zcr.append(float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean())
                           if n > 1 else 0.0)
                mag = np.abs(np.fft.rfft(x))
                tot = mag.sum()
                freqs = np.arange(len(mag)) / n
                cent.append(float((freqs * mag).sum() / tot) if tot > 0 else 0.0)
            yield pd.DataFrame({
                "media_id": np.asarray(ids, dtype=np.int64),
                "rms": rms,
                "zcr": zcr,
                "spectral_centroid": cent,
            })

    return decoded.mapInPandas(
        kernel,
        "media_id long, rms double, zcr double, spectral_centroid double",
    )


def decode_audio(df: DataFrame, content_col: str = "content",
                 id_col: str = "media_id", decoder: str = "wav") -> DataFrame:
    """binary WAV → (id, samples array<double> mono in [-1,1], sample_rate,
    n_samples).  REAL PCM decode (stdlib ``wave`` — 8/16/32-bit, any channel
    count, channels averaged to mono); compressed audio (mp3/ogg/flac)
    raises naming the missing codec dependency."""
    if decoder != "wav":
        _require_real_decoder(f"audio ({decoder})")
    from cuml_spark.multimodal import codecs

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, samples, rates, ns = [], [], [], []
            for mid, b in zip(pdf[id_col], pdf[content_col]):
                x, rate = codecs.decode_wav(bytes(b))
                ids.append(mid)
                samples.append(x)
                rates.append(rate)
                ns.append(len(x))
            yield pd.DataFrame({
                "media_id": np.asarray(ids, dtype=np.int64),
                "samples": samples,
                "sample_rate": np.asarray(rates, dtype=np.int32),
                "n_samples": np.asarray(ns, dtype=np.int64),
            })

    return df.mapInPandas(
        kernel,
        "media_id long, samples array<double>, sample_rate int, n_samples long",
    )
