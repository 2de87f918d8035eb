"""Harness queries: multimodal plumbing over binary media columns.

``media_decode`` / ``frame_counts`` use the deterministic fake decode
(byte-tiling), so the Spark-side plumbing is D-checkable: pixel 0 is the
first payload byte and frame counts are pure functions of octet_length.

``media_decode_png`` is the REAL-codec round trip: deterministic grayscale
images are PNG-ENCODED on the executors (zlib DEFLATE + CRC chunks), then
DECODED back through ``decode_image(decoder='auto')`` (magic-byte sniff,
inflate, unfilter) — and the per-image pixel checksum matches a plain SQL
reconstruction of the source pixels, proving the codec is bit-exact, not a
stub.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuml_spark.core.session import read_table
from cuml_spark.multimodal import (
    decode_audio,
    decode_image,
    frame_sample,
    with_media_metadata,
)

_PNG_N, _PNG_W, _PNG_H = 64, 16, 12


def _ids(spark, n):
    """Fabricated-media id frame, right-sized to a few partitions.

    Every media query synthesizes 40-64 tiny payloads; at the session
    default (32 partitions) each mapInPandas stage pays ~30 near-empty
    Arrow worker round-trips, which is both slow (measured r8: warm
    image_dedup_groups 1.2s at 32 parts vs 0.4s at 4) and the main
    exposure to late-session worker-pool churn (its 4.3-6.7s r7 bench
    anomaly).  Real media tables take the ensure_parallelism path
    instead -- this sizing is for the fabricated fixtures only."""
    return spark.range(n, numPartitions=4).select(F.col("id").alias("media_id"))



def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, f"{sf_dir}/documents.parquet")
    payload = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    return with_media_metadata(payload, width=8, height=8)


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = decode_image(_media(spark, sf_dir))
    return decoded.select(
        F.col("media_id").alias("doc_id"),
        F.col("width").alias("w"),
        F.col("height").alias("h"),
        F.element_at("pixels", 1).alias("p0"),
    )


_SQL_MEDIA_DECODE = """
SELECT doc_id, 8 AS w, 8 AS h, ascii(substring(text, 1, 1)) AS p0
FROM documents
"""


def q_frame_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = frame_sample(_media(spark, sf_dir), every_n=2, frame_bytes=64)
    return frames.groupBy(F.col("media_id").alias("doc_id")).agg(
        F.count("*").alias("n_frames_sampled")
    )


_SQL_FRAME_COUNTS = """
SELECT doc_id,
       (greatest(octet_length(encode(text)) // 64, 1) + 1) // 2 AS n_frames_sampled
FROM documents
"""


def q_media_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG encode→decode round trip with an exact integer oracle:
    image ``m`` has pixel(j) = (31·m + j) mod 256 over j = 0..w·h−1."""
    from collections.abc import Iterator

    from cuml_spark.multimodal import codecs

    w, h = _PNG_W, _PNG_H

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            bufs = []
            for mid in pdf["media_id"]:
                j = np.arange(w * h, dtype=np.int64)
                img = ((31 * int(mid) + j) % 256).astype(np.uint8).reshape(h, w)
                bufs.append(codecs.encode_png(img))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "content": bufs})

    ids = _ids(spark, _PNG_N)
    media = ids.mapInPandas(enc, "media_id long, content binary")
    dec = decode_image(media, decoder="auto")
    return dec.select(
        "media_id",
        F.size("pixels").alias("n_pixels"),
        F.aggregate("pixels", F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("sum_px"),
        "width",
        "height",
    )


_SQL_MEDIA_DECODE_PNG = f"""
SELECT t.id AS media_id,
       {_PNG_W * _PNG_H} AS n_pixels,
       (SELECT sum((31 * t.id + j.g) % 256)
        FROM generate_series(0, {_PNG_W * _PNG_H - 1}) j(g))::BIGINT AS sum_px,
       {_PNG_W} AS width, {_PNG_H} AS height
FROM range({_PNG_N}) t(id)
"""


_LL_N, _LL_W, _LL_H = 48, 14, 10


def q_media_decode_lossless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless JPEG (SOF3) encode→decode round trip with an exact
    integer oracle: unlike baseline JPEG (bit-exact only for constant
    blocks), lossless is exact for ARBITRARY images, so the fixture is
    a full-gradient image pixel(j) = (47·m + 3·j) mod 256 and the
    checksum is its closed form; the predictor cycles 1..7 by media id
    so every Annex-H predictor is exercised under the Spark decode
    path."""
    from collections.abc import Iterator

    from cuml_spark.multimodal.jpeg_lossless import encode_jpeg_lossless

    w, h = _LL_W, _LL_H

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            bufs = []
            for mid in pdf["media_id"]:
                j = np.arange(w * h, dtype=np.int64)
                img = ((47 * int(mid) + 3 * j) % 256).astype(
                    np.uint8).reshape(h, w)
                bufs.append(encode_jpeg_lossless(
                    img, predictor=1 + int(mid) % 7))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "content": bufs})

    ids = _ids(spark, _LL_N)
    media = ids.mapInPandas(enc, "media_id long, content binary")
    dec = decode_image(media, decoder="auto")
    return dec.select(
        "media_id",
        F.size("pixels").alias("n_pixels"),
        F.aggregate("pixels", F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("sum_px"),
        "width",
        "height",
    )


_SQL_MEDIA_DECODE_LOSSLESS = f"""
SELECT t.id AS media_id,
       {_LL_W * _LL_H} AS n_pixels,
       (SELECT sum((47 * t.id + 3 * j.g) % 256)
        FROM generate_series(0, {_LL_W * _LL_H - 1}) j(g))::BIGINT AS sum_px,
       {_LL_W} AS width, {_LL_H} AS height
FROM range({_LL_N}) t(id)
"""


_JPG_N, _JPG_W, _JPG_H = 48, 24, 16


def q_media_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real JPEG encode→decode round trip with an exact integer oracle.

    Constant-valued images round-trip BIT-EXACTLY through baseline JPEG at
    quality 100 (all-ones quant tables): every 8×8 block's FDCT is a pure
    DC coefficient 8·(v−128) whose IDCT reproduces v exactly, so the decoded
    luma sum is w·h·v — a plain SQL expression.  The query still exercises
    the full marker/Huffman/bit-IO/dequant/IDCT pipeline on the executors.
    """
    from collections.abc import Iterator

    from cuml_spark.multimodal.jpeg import encode_jpeg

    w, h = _JPG_W, _JPG_H

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            bufs = []
            for mid in pdf["media_id"]:
                v = (37 * int(mid)) % 256
                img = np.full((h, w), v, dtype=np.uint8)
                bufs.append(encode_jpeg(img, quality=100))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "content": bufs})

    ids = _ids(spark, _JPG_N)
    media = ids.mapInPandas(enc, "media_id long, content binary")
    dec = decode_image(media, decoder="auto")
    return dec.select(
        "media_id",
        F.size("pixels").alias("n_pixels"),
        F.aggregate("pixels", F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("sum_px"),
        "width",
        "height",
    )


_SQL_MEDIA_DECODE_JPEG = f"""
SELECT t.id AS media_id,
       {_JPG_W * _JPG_H} AS n_pixels,
       ({_JPG_W * _JPG_H}::BIGINT * ((37 * t.id) % 256))::BIGINT AS sum_px,
       {_JPG_W} AS width, {_JPG_H} AS height
FROM range({_JPG_N}) t(id)
"""


_PJPG_N, _PJPG_W, _PJPG_H = 48, 24, 16


def q_media_decode_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive (SOF2) JPEG round trip with an exact integer oracle:
    same constant-image construction as ``media_decode_jpeg`` (quality 100
    → all-ones quant tables → DC-only blocks reconstruct bit-exactly), but
    transported through the multi-scan progressive pipeline — DC first +
    successive-approximation refinement + per-band AC scans with EOB runs
    (jpeg_progressive.py), dispatched by the SOF2 marker inside
    ``decode_image(decoder='auto')`` on the executors."""
    from collections.abc import Iterator

    from cuml_spark.multimodal.jpeg_progressive import encode_jpeg_progressive

    w, h = _PJPG_W, _PJPG_H

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            bufs = []
            for mid in pdf["media_id"]:
                v = (41 * int(mid)) % 256
                img = np.full((h, w), v, dtype=np.uint8)
                bufs.append(encode_jpeg_progressive(img, quality=100, al=1))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "content": bufs})

    ids = _ids(spark, _PJPG_N)
    media = ids.mapInPandas(enc, "media_id long, content binary")
    dec = decode_image(media, decoder="auto")
    return dec.select(
        "media_id",
        F.size("pixels").alias("n_pixels"),
        F.aggregate("pixels", F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("sum_px"),
        "width",
        "height",
    )


_SQL_MEDIA_DECODE_PROGRESSIVE = f"""
SELECT t.id AS media_id,
       {_PJPG_W * _PJPG_H} AS n_pixels,
       ({_PJPG_W * _PJPG_H}::BIGINT * ((41 * t.id) % 256))::BIGINT AS sum_px,
       {_PJPG_W} AS width, {_PJPG_H} AS height
FROM range({_PJPG_N}) t(id)
"""


_WAV_N, _WAV_SAMPLES, _WAV_RATE = 48, 256, 8000


def q_media_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV PCM round trip with an exact integer oracle: clip ``m`` has
    16-bit sample(i) = (13·m + 7·i) mod 200 − 100, written through the
    stdlib ``wave`` container on the executors and decoded back by
    ``decode_audio``; re-quantizing the normalized floats recovers the raw
    integers exactly, so their sum is a plain SQL expression."""
    import io
    import wave
    from collections.abc import Iterator

    ns, rate = _WAV_SAMPLES, _WAV_RATE

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            bufs = []
            for mid in pdf["media_id"]:
                i = np.arange(ns, dtype=np.int64)
                raw = ((13 * int(mid) + 7 * i) % 200 - 100).astype("<i2")
                bio = io.BytesIO()
                with wave.open(bio, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(rate)
                    wf.writeframes(raw.tobytes())
                bufs.append(bio.getvalue())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "content": bufs})

    ids = _ids(spark, _WAV_N)
    media = ids.mapInPandas(enc, "media_id long, content binary")
    dec = decode_audio(media)
    return dec.select(
        "media_id",
        "n_samples",
        "sample_rate",
        F.aggregate(
            "samples", F.lit(0).cast("long"),
            lambda acc, x: acc + F.round(x * 32768.0, 0).cast("long"),
        ).alias("sum_raw"),
    )


_SQL_MEDIA_DECODE_WAV = f"""
SELECT t.id AS media_id,
       {_WAV_SAMPLES}::BIGINT AS n_samples,
       {_WAV_RATE} AS sample_rate,
       (SELECT sum((13 * t.id + 7 * j.g) % 200 - 100)
        FROM generate_series(0, {_WAV_SAMPLES - 1}) j(g))::BIGINT AS sum_raw
FROM range({_WAV_N}) t(id)
"""


def q_media_decode_g711(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711 telephony audio end-to-end with an EXACT oracle: clip ``m``
    plants raw law bytes byte(i) = (11·m + 5·i) mod 256 inside a real WAV
    container (format tag 7 = µ-law for even ids, 6 = A-law for odd),
    decoded by the manual RIFF walk + integer expanders in
    ``codecs.decode_wav``.  Because G.711 expansion is pure integer
    arithmetic, the oracle replays the ITU-T formulas verbatim in SQL —
    container parse AND companding math are both value-checked."""
    from collections.abc import Iterator

    from cuml_spark.multimodal import codecs

    ns, rate = _WAV_SAMPLES, _WAV_RATE

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            bufs = []
            for mid in pdf["media_id"]:
                i = np.arange(ns, dtype=np.int64)
                raw = ((11 * int(mid) + 5 * i) % 256).astype(np.uint8)
                tag = 7 if int(mid) % 2 == 0 else 6
                bufs.append(codecs.wrap_wav_g711(raw.tobytes(), rate, tag))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "content": bufs})

    ids = _ids(spark, _WAV_N)
    media = ids.mapInPandas(enc, "media_id long, content binary")
    dec = decode_audio(media)
    return dec.select(
        "media_id",
        "n_samples",
        "sample_rate",
        F.aggregate(
            "samples", F.lit(0).cast("long"),
            lambda acc, x: acc + F.round(x * 32768.0, 0).cast("long"),
        ).alias("sum_raw"),
    )


# the ITU-T G.711 expanders as SQL: µ-law complements the byte then scales
# the mantissa by the segment; A-law XORs 0x55 then scales — both exact
# integer arithmetic, replayed verbatim
_SQL_MEDIA_DECODE_G711 = f"""
WITH clips AS (
  SELECT t.id AS media_id, j.g AS i,
         (11 * t.id + 5 * j.g) % 256 AS b
  FROM range({_WAV_N}) t(id), generate_series(0, {_WAV_SAMPLES - 1}) j(g)
), lin AS (
  SELECT media_id,
    CASE WHEN media_id % 2 = 0 THEN
      -- u-law: u = ~b; mag = ((mant*8 + 132) << exp) - 132
      CASE WHEN (255 - b) >= 128 THEN -1 ELSE 1 END *
        ((((255 - b) % 16) * 8 + 132)
          * CAST(power(2, ((255 - b) // 16) % 8) AS BIGINT) - 132)
    ELSE
      -- A-law: a = b XOR 0x55; seg 0: mant*16+8, else (mant*16+264)<<(seg-1)
      CASE WHEN xor(b, 85) >= 128 THEN 1 ELSE -1 END *
        (CASE WHEN (xor(b, 85) // 16) % 8 = 0
              THEN (xor(b, 85) % 16) * 16 + 8
              ELSE ((xor(b, 85) % 16) * 16 + 264)
                * CAST(power(2, (xor(b, 85) // 16) % 8 - 1) AS BIGINT)
         END)
    END AS s
  FROM clips
)
SELECT media_id,
       {_WAV_SAMPLES}::BIGINT AS n_samples,
       {_WAV_RATE} AS sample_rate,
       sum(s)::BIGINT AS sum_raw
FROM lin GROUP BY media_id
"""


_IMG_N, _IMG_GROUPS, _IMG_SIDE = 60, 12, 24


def q_image_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visual dedup pipeline end-to-end: deterministic PNGs (12 distinct
    noise-like patterns, 5 copies each) → real decode → difference-hash →
    exact perceptual-duplicate groups.  Oracle: ids 0..59 share a pattern
    iff id mod 12 matches, so every group has 5 members and its min-id
    representative IS the residue."""
    from collections.abc import Iterator

    from cuml_spark.multimodal import codecs
    from cuml_spark.multimodal.imagehash import image_dedup_groups, image_hashes

    side, groups = _IMG_SIDE, _IMG_GROUPS

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            bufs = []
            for mid in pdf["media_id"]:
                r = int(mid) % groups
                j = np.arange(side * side, dtype=np.int64)
                px = ((r + 1) * 2654435761 * (j + 3) * (j + 7)) % 256
                bufs.append(codecs.encode_png(
                    px.astype(np.uint8).reshape(side, side)))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "content": bufs})

    ids = _ids(spark, _IMG_N)
    media = ids.mapInPandas(enc, "media_id long, content binary")
    hashes = image_hashes(decode_image(media, decoder="auto"), method="dhash")
    return image_dedup_groups(hashes).select("group_rep", "n_members")


_SQL_IMAGE_DEDUP_GROUPS = f"""
SELECT t.r AS group_rep, {_IMG_N // _IMG_GROUPS}::BIGINT AS n_members
FROM range({_IMG_GROUPS}) t(r)
"""


_PH_N, _PH_GROUPS, _PH_SIDE = 60, 12, 24


def q_image_phash_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pHash (DCT low-band, imagehash.py:76) grouping under brightness
    edits: each of 12 base patterns gets 5 copies at DIFFERENT brightness
    offsets (+10·k, no clipping), so the PNG bytes — and dhash-free exact
    pixel hashes — differ per copy, yet pHash is provably invariant (a
    constant offset only moves the DC coefficient, which pHash drops) and
    must put each residue class in one group.  Oracle: 12 groups of 5,
    min-id representative = residue."""
    from collections.abc import Iterator

    from cuml_spark.multimodal import codecs
    from cuml_spark.multimodal.imagehash import image_dedup_groups, image_hashes

    side, groups = _PH_SIDE, _PH_GROUPS

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            bufs = []
            for mid in pdf["media_id"]:
                r, k = int(mid) % groups, int(mid) // groups
                j = np.arange(side * side, dtype=np.int64)
                base = ((r + 1) * 2654435761 * (j + 3) * (j + 7)) % 206
                px = base + 10 * k  # brightness shift, stays < 256
                bufs.append(codecs.encode_png(
                    px.astype(np.uint8).reshape(side, side)))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "content": bufs})

    ids = _ids(spark, _PH_N)
    media = ids.mapInPandas(enc, "media_id long, content binary")
    hashes = image_hashes(decode_image(media, decoder="auto"), method="phash")
    return image_dedup_groups(hashes).select("group_rep", "n_members")


_SQL_IMAGE_PHASH_INVARIANCE = f"""
SELECT t.r AS group_rep, {_PH_N // _PH_GROUPS}::BIGINT AS n_members
FROM range({_PH_GROUPS}) t(r)
"""


_ADPCM_N, _ADPCM_NIB = 40, 252
_ADPCM_BA = 4 + _ADPCM_NIB // 2


def q_media_decode_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMA ADPCM (WAV tag 0x11) with an EXACT oracle for a stateful codec:
    clip ``m`` is one block with planted header predictor
    ((m·997) mod 4096) − 2048, step-index m mod 89 and nibble stream
    (7·m + 3·t) mod 16.  Spark decodes via the block-parallel numpy
    recurrence (codecs.adpcm_ima_decode); the oracle replays the SAME
    recurrence as a DuckDB RECURSIVE CTE over the step/index tables — a
    sequential codec value-checked end-to-end in SQL."""
    from collections.abc import Iterator

    from cuml_spark.multimodal import codecs

    n_nib, ba, rate = _ADPCM_NIB, _ADPCM_BA, 8000

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            bufs = []
            for mid in pdf["media_id"]:
                m = int(mid)
                pred0 = ((m * 997) % 4096) - 2048
                nibs = [(7 * m + 3 * t) % 16 for t in range(n_nib)]
                payload = bytes(nibs[i] | (nibs[i + 1] << 4)
                                for i in range(0, n_nib, 2))
                blk = ((pred0 & 0xFFFF).to_bytes(2, "little")
                       + bytes([m % 89, 0]) + payload)
                bufs.append(codecs.wrap_wav_adpcm(blk, rate, ba))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "content": bufs})

    ids = _ids(spark, _ADPCM_N)
    media = ids.mapInPandas(enc, "media_id long, content binary")
    dec = decode_audio(media)
    return dec.select(
        "media_id",
        "n_samples",
        "sample_rate",
        F.aggregate(
            "samples", F.lit(0).cast("long"),
            lambda acc, x: acc + F.round(x * 32768.0, 0).cast("long"),
        ).alias("sum_raw"),
    )


def _sql_media_decode_adpcm() -> str:
    from cuml_spark.multimodal.codecs import _IMA_STEPS

    steps_vals = ", ".join(f"({i}, {int(s)})" for i, s in enumerate(_IMA_STEPS))
    return f"""
WITH RECURSIVE ima_steps(i, s) AS (VALUES {steps_vals}),
rec(m, t, pred, idx, acc) AS (
  SELECT t.id, 0, ((t.id * 997) % 4096) - 2048, t.id % 89,
         ((t.id * 997) % 4096) - 2048
  FROM range({_ADPCM_N}) t(id)
  UNION ALL
  SELECT m, t, npred, nidx, acc + npred FROM (
    SELECT m, t, acc,
           GREATEST(-32768, LEAST(32767,
             pred + CASE WHEN d >= 8 THEN -diff ELSE diff END)) AS npred,
           GREATEST(0, LEAST(88, idx +
             CASE (d % 8) WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 6
                          WHEN 7 THEN 8 ELSE -1 END)) AS nidx
    FROM (
      SELECT r.m, r.t + 1 AS t, r.pred, r.idx, r.acc,
             (7 * r.m + 3 * r.t) % 16 AS d,
             (st.s // 8)
             + CASE WHEN ((7 * r.m + 3 * r.t) % 16) % 8 >= 4
                    THEN st.s ELSE 0 END
             + CASE WHEN (((7 * r.m + 3 * r.t) % 16) % 4) >= 2
                    THEN st.s // 2 ELSE 0 END
             + CASE WHEN ((7 * r.m + 3 * r.t) % 16) % 2 = 1
                    THEN st.s // 4 ELSE 0 END AS diff
      FROM rec r JOIN ima_steps st ON st.i = r.idx
      WHERE r.t < {_ADPCM_NIB}
    )
  )
)
SELECT m AS media_id, {_ADPCM_NIB + 1}::BIGINT AS n_samples,
       8000 AS sample_rate, acc::BIGINT AS sum_raw
FROM rec WHERE t = {_ADPCM_NIB}
"""


_MP4_N = 40


def q_media_probe_mp4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-BMFF container probing with planted metadata: clip ``m`` is a
    structurally valid MP4 skeleton (multimodal/mp4.py writer) carrying a
    video track (avc1 for even ids, hvc1 for odd; width 16·(1+m%8),
    height 16·(1+m%5), 10+m%7 samples) and an mp4a audio track
    (100+m%13 samples).  ``probe_media`` walks the real box tree on the
    executors; the oracle recomputes every planted parameter from the id —
    so parse offsets, fixed-point width decoding and per-track fan-out are
    all value-checked."""
    from collections.abc import Iterator

    from cuml_spark.multimodal.mp4 import build_mp4, probe_media

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            bufs = []
            for mid in pdf["media_id"]:
                m = int(mid)
                bufs.append(build_mp4([
                    {"handler": "vide",
                     "codec": "avc1" if m % 2 == 0 else "hvc1",
                     "width": 16 * (1 + m % 8), "height": 16 * (1 + m % 5),
                     "timescale": 30000, "duration": 1000 * (1 + m % 11),
                     "n_samples": 10 + m % 7},
                    {"handler": "soun", "codec": "mp4a", "width": 0,
                     "height": 0, "timescale": 48000,
                     "duration": 48000 + m, "n_samples": 100 + m % 13},
                ], movie_timescale=1000, movie_duration=600 + m))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "content": bufs})

    ids = _ids(spark, _MP4_N)
    media = ids.mapInPandas(enc, "media_id long, content binary")
    return probe_media(media).select(
        "media_id", "brand", "track_id", "handler", "codec",
        "width", "height", "n_samples", "duration",
    )


_SQL_MEDIA_PROBE_MP4 = f"""
SELECT t.id AS media_id, 'isom' AS brand, 1::BIGINT AS track_id,
       'vide' AS handler,
       CASE WHEN t.id % 2 = 0 THEN 'avc1' ELSE 'hvc1' END AS codec,
       (16 * (1 + t.id % 8))::BIGINT AS width,
       (16 * (1 + t.id % 5))::BIGINT AS height,
       (10 + t.id % 7)::BIGINT AS n_samples,
       (1000 * (1 + t.id % 11))::BIGINT AS duration
FROM range({_MP4_N}) t(id)
UNION ALL
SELECT t.id, 'isom', 2, 'soun', 'mp4a', 0, 0,
       (100 + t.id % 13)::BIGINT, (48000 + t.id)::BIGINT
FROM range({_MP4_N}) t(id)
"""


_AUDIO_N = 64


def q_audio_probe_compressed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-audio header probing with planted metadata: blob ``m``
    cycles formats by ``m % 4`` — MP3 (version by ``m % 3``, CBR bitrate
    from the public Layer III table, Xing tag planted on MPEG-1 streams),
    ADTS AAC (profile/rate/channel fields), FLAC STREAMINFO (20-bit rate,
    36-bit sample total), Ogg (OpusHead / Vorbis-I identification packet
    + EOS granule position).  ``probe_audio`` walks the real frame/page
    structure on the executors; the oracle recomputes every planted
    parameter from the id — so syncword walks, bit-packed field decoding
    and the Xing/granule conventions are all value-checked."""
    from collections.abc import Iterator

    from cuml_spark.multimodal.audio import (ADTS_RATES, MP3_BITRATES_V1,
                                             MP3_BITRATES_V2, MP3_RATES,
                                             build_adts, build_flac,
                                             build_mp3, build_ogg,
                                             probe_audio)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            bufs = []
            for mid in pdf["media_id"]:
                m = int(mid)
                kind = m % 4
                if kind == 0:
                    ver = ("1", "2", "2.5")[m % 3]
                    table = MP3_BITRATES_V1 if ver == "1" else MP3_BITRATES_V2
                    bufs.append(build_mp3(
                        3 + m % 5, ver, table[m % 14],
                        MP3_RATES[ver][(m // 4) % 3], mono=(m % 2 == 0),
                        xing_frames=(2 + m % 5) if ver == "1" else None))
                elif kind == 1:
                    bufs.append(build_adts(
                        2 + m % 6, profile=(m // 4) % 4,
                        sample_rate=ADTS_RATES[m % 13],
                        channels=1 + m % 6))
                elif kind == 2:
                    bufs.append(build_flac(
                        8000 + 137 * m, 1 + m % 8, 8 + m % 25,
                        100000 + 7919 * m))
                elif (m // 4) % 2 == 0:
                    bufs.append(build_ogg("opus", 16000, 1 + m % 2,
                                          1000 + 480 * m))
                else:
                    bufs.append(build_ogg("vorbis", 22050 + 100 * m, 2,
                                          5000 + 31 * m))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "content": bufs})

    ids = _ids(spark, _AUDIO_N)
    media = ids.mapInPandas(enc, "media_id long, content binary")
    return probe_audio(media)


_SQL_AUDIO_PROBE = f"""
SELECT id AS media_id, 'mp3' AS codec,
       CASE id % 3 WHEN 0 THEN 'mpeg1-layer3' WHEN 1 THEN 'mpeg2-layer3'
            ELSE 'mpeg2.5-layer3' END AS profile,
       (CASE id % 3 WHEN 0 THEN ([44100,48000,32000])[1 + (id // 4) % 3]
             WHEN 1 THEN ([22050,24000,16000])[1 + (id // 4) % 3]
             ELSE ([11025,12000,8000])[1 + (id // 4) % 3] END)::BIGINT
           AS sample_rate,
       (CASE WHEN id % 2 = 0 THEN 1 ELSE 2 END)::BIGINT AS channels,
       NULL::BIGINT AS bits_per_sample,
       (3 + id % 5)::BIGINT AS n_frames,
       ((3 + id % 5) * CASE WHEN id % 3 = 0 THEN 1152 ELSE 576 END)::BIGINT
           AS n_samples,
       (CASE id % 3
            WHEN 0 THEN ([32,40,48,56,64,80,96,112,128,160,192,224,256,320]
                        )[1 + id % 14]
            ELSE ([8,16,24,32,40,48,56,64,80,96,112,128,144,160]
                 )[1 + id % 14] END)::BIGINT AS bitrate_kbps,
       (CASE WHEN id % 3 = 0 THEN 2 + id % 5 ELSE NULL END)::BIGINT
           AS xing_frames
FROM range({_AUDIO_N}) t(id) WHERE id % 4 = 0
UNION ALL
SELECT id, 'aac-adts',
       (['aac-main','aac-lc','aac-ssr','aac-ltp'])[1 + (id // 4) % 4],
       ([96000,88200,64000,48000,44100,32000,24000,22050,16000,12000,
         11025,8000,7350])[1 + id % 13]::BIGINT,
       (1 + id % 6)::BIGINT, NULL::BIGINT,
       (2 + id % 6)::BIGINT, (1024 * (2 + id % 6))::BIGINT,
       NULL::BIGINT, NULL::BIGINT
FROM range({_AUDIO_N}) t(id) WHERE id % 4 = 1
UNION ALL
SELECT id, 'flac', NULL,
       (8000 + 137 * id)::BIGINT, (1 + id % 8)::BIGINT,
       (8 + id % 25)::BIGINT, NULL::BIGINT,
       (100000 + 7919 * id)::BIGINT, NULL::BIGINT, NULL::BIGINT
FROM range({_AUDIO_N}) t(id) WHERE id % 4 = 2
UNION ALL
SELECT id,
       CASE WHEN (id // 4) % 2 = 0 THEN 'ogg-opus' ELSE 'ogg-vorbis' END,
       NULL,
       (CASE WHEN (id // 4) % 2 = 0 THEN 48000
             ELSE 22050 + 100 * id END)::BIGINT,
       (CASE WHEN (id // 4) % 2 = 0 THEN 1 + id % 2 ELSE 2 END)::BIGINT,
       NULL::BIGINT, NULL::BIGINT,
       (CASE WHEN (id // 4) % 2 = 0 THEN 1000 + 480 * id
             ELSE 5000 + 31 * id END)::BIGINT,
       NULL::BIGINT, NULL::BIGINT
FROM range({_AUDIO_N}) t(id) WHERE id % 4 = 3
"""


QUERIES_MEDIA = {
    "media_decode": q_media_decode,
    "media_decode_png": q_media_decode_png,
    "media_decode_lossless": q_media_decode_lossless,
    "media_decode_jpeg": q_media_decode_jpeg,
    "media_decode_progressive": q_media_decode_progressive,
    "media_decode_wav": q_media_decode_wav,
    "media_decode_g711": q_media_decode_g711,
    "media_probe_mp4": q_media_probe_mp4,
    "audio_probe_compressed": q_audio_probe_compressed,
    "media_decode_adpcm": q_media_decode_adpcm,
    "image_dedup_groups": q_image_dedup_groups,
    "image_phash_invariance": q_image_phash_invariance,
    "frame_counts": q_frame_counts,
}

ORACLES_MEDIA = {
    "media_decode": _SQL_MEDIA_DECODE,
    "media_decode_png": _SQL_MEDIA_DECODE_PNG,
    "media_decode_lossless": _SQL_MEDIA_DECODE_LOSSLESS,
    "media_decode_jpeg": _SQL_MEDIA_DECODE_JPEG,
    "media_decode_progressive": _SQL_MEDIA_DECODE_PROGRESSIVE,
    "media_decode_wav": _SQL_MEDIA_DECODE_WAV,
    "media_decode_g711": _SQL_MEDIA_DECODE_G711,
    "media_probe_mp4": _SQL_MEDIA_PROBE_MP4,
    "audio_probe_compressed": _SQL_AUDIO_PROBE,
    "media_decode_adpcm": _sql_media_decode_adpcm(),
    "image_dedup_groups": _SQL_IMAGE_DEDUP_GROUPS,
    "image_phash_invariance": _SQL_IMAGE_PHASH_INVARIANCE,
    "frame_counts": _SQL_FRAME_COUNTS,
}
