"""Perceptual image hashing + image near-dup — the visual analog of the
text dedup tier (text/dedup.py MinHash/SimHash), built on the decoded-pixel
frames that :func:`cuml_spark.multimodal.decode_image` produces.

* ``dhash`` — difference hash: nearest-resize the luma to (8, 9), compare
  horizontally adjacent pixels, pack 64 bits.  Robust to rescaling and
  brightness-preserving edits; the standard first-pass image dedup key.
* ``ahash`` — average hash: nearest-resize to (8, 8), threshold at the
  mean, pack 64 bits.
* :func:`image_near_duplicates` — hamming near-dup at 100 TB shape: the
  64-bit hash splits into ``n_bands`` contiguous bands (pigeonhole: two
  hashes within ``max_distance`` bits share at least one exact band when
  ``max_distance < n_bands``); candidates come from an id-only equi-join on
  (band, band_value) — never an all-pairs scan — and verify with one
  xor+bit_count expression.

Exact-duplicate grouping is just ``groupBy(hash)`` — one shuffle on an
8-byte key, same scale shape as text/dedup.py:49.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _resize_nearest(px: np.ndarray, h: int, w: int, out_h: int, out_w: int) -> np.ndarray:
    img = px.reshape(h, w)
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[np.ix_(yi, xi)]


def _resize_area(px: np.ndarray, h: int, w: int, out_h: int, out_w: int) -> np.ndarray:
    """Box-average resize (anti-aliased) — pHash's downsample, so per-pixel
    noise averages out before the DCT instead of passing straight through."""
    img = px.reshape(h, w).astype(np.float64)
    ye = (np.arange(out_h + 1) * h) // out_h
    xe = (np.arange(out_w + 1) * w) // out_w
    ye = np.maximum(ye, np.arange(out_h + 1))  # ensure nonempty rows upscaling
    xe = np.maximum(xe, np.arange(out_w + 1))
    if h < out_h or w < out_w:  # upscale: fall back to nearest
        return _resize_nearest(px, h, w, out_h, out_w).astype(np.float64)
    csum = np.zeros((h + 1, w + 1))
    csum[1:, 1:] = img.cumsum(0).cumsum(1)
    S = (csum[ye[1:]][:, xe[1:]] - csum[ye[:-1]][:, xe[1:]]
         - csum[ye[1:]][:, xe[:-1]] + csum[ye[:-1]][:, xe[:-1]])
    areas = (ye[1:] - ye[:-1])[:, None] * (xe[1:] - xe[:-1])[None, :]
    return S / areas


def _pack_bits(bits: np.ndarray) -> int:
    """Row-major bit vector → signed int64 (bit 0 = MSB of the hash)."""
    v = 0
    for b in bits.ravel():
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def dhash_py(px: np.ndarray, h: int, w: int) -> int:
    """Difference hash of one luma frame (any input size)."""
    g = _resize_nearest(px, h, w, 8, 9).astype(np.int64)
    return _pack_bits(g[:, 1:] > g[:, :-1])


def ahash_py(px: np.ndarray, h: int, w: int) -> int:
    """Average hash of one luma frame."""
    g = _resize_nearest(px, h, w, 8, 8).astype(np.float64)
    return _pack_bits(g > g.mean())


def phash_py(px: np.ndarray, h: int, w: int) -> int:
    """Perceptual (DCT) hash: nearest-resize to 32×32, 2-D DCT (reusing the
    8-point basis blockwise is wrong here — build the 32-point DCT-II), keep
    the top-left 8×8 low-frequency coefficients minus DC, threshold at
    their median.  The most edit-robust of the three classic hashes."""
    g = _resize_area(px, h, w, 32, 32)
    n = 32
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    C = np.cos((2 * m + 1) * k * np.pi / (2 * n))
    C[0] *= np.sqrt(1.0 / n)
    C[1:] *= np.sqrt(2.0 / n)
    d = C @ g @ C.T
    low = d[:8, :8].ravel()[1:]  # drop DC
    return _pack_bits(np.append(low > np.median(low), False))


def image_hashes(decoded: DataFrame, method: str = "dhash") -> DataFrame:
    """(media_id, pixels, width, height) → (media_id, hash long)."""
    if method not in ("dhash", "ahash", "phash"):
        raise ValueError("method must be 'dhash', 'ahash' or 'phash'")
    fn = {"dhash": dhash_py, "ahash": ahash_py, "phash": phash_py}[method]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            hashes = [
                fn(np.asarray(p, dtype=np.int64), int(h), int(w))
                for p, h, w in zip(pdf["pixels"], pdf["height"], pdf["width"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "hash": np.asarray(hashes, dtype=np.int64),
            })

    return decoded.mapInPandas(kernel, "media_id long, hash long")


def image_dedup_groups(hashes: DataFrame) -> DataFrame:
    """Exact perceptual-duplicate groups: (hash, group_rep = min media_id,
    n_members).  One shuffle on the 8-byte hash; ids only."""
    return (
        hashes.groupBy("hash")
        .agg(F.min("media_id").alias("group_rep"),
             F.count("*").alias("n_members"))
    )


def image_near_duplicates(hashes: DataFrame, max_distance: int = 6,
                          n_bands: int = 8) -> DataFrame:
    """Hamming near-dup pairs → (id_a, id_b, distance ≤ max_distance).

    Pigeonhole guarantee requires ``max_distance < n_bands`` (≤ d bits
    differ over n bands ⇒ some band is untouched); raises otherwise rather
    than silently missing pairs.  Candidates shuffle only (band, 8-byte
    band value, id); verification is one xor + bit_count codegen expression.
    """
    if max_distance >= n_bands:
        raise ValueError(
            f"max_distance={max_distance} needs n_bands > max_distance "
            f"(got {n_bands}): with fewer bands a pair can differ in every "
            "band and the banded join would miss it")
    if 64 % n_bands != 0:
        raise ValueError("n_bands must divide 64")
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = hashes.select(
        F.col("media_id"),
        F.col("hash"),
        F.posexplode(F.array(*[
            F.shiftrightunsigned("hash", b * width).bitwiseAND(F.lit(mask))
            for b in range(n_bands)
        ])).alias("band", "band_val"),
    )
    a = bands.select(F.col("media_id").alias("id_a"),
                     F.col("hash").alias("h_a"), "band", "band_val")
    b = bands.select(F.col("media_id").alias("id_b"),
                     F.col("hash").alias("h_b"), "band", "band_val")
    dist = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        a.join(b, ["band", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("distance"))
        .where(F.col("distance") <= max_distance)
        .distinct()
    )
