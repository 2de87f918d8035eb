"""Multimodal plumbing: deterministic fake decode over mapInPandas."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuml_spark.multimodal import (
    decode_image,
    extract_features,
    frame_sample,
    resize_image,
    with_media_metadata,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(i, bytes(range(i % 7, i % 7 + 50)) * 3) for i in range(40)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    return with_media_metadata(df, width=8, height=8).cache()


def test_decode_shapes_and_determinism(media_df):
    out = decode_image(media_df).toPandas().sort_values("media_id")
    assert len(out) == 40
    assert (out["width"] == 8).all() and (out["height"] == 8).all()
    assert out["pixels"].map(len).eq(64).all()
    # repartitioning must not change the decode (partition independence)
    out2 = decode_image(media_df.repartition(7)).toPandas().sort_values("media_id")
    for a, b in zip(out["pixels"], out2["pixels"]):
        assert list(a) == list(b)


def test_decode_matches_manual_tiling(media_df):
    out = decode_image(media_df).toPandas().sort_values("media_id")
    raw = {r["media_id"]: bytes(r["content"]) for r in media_df.collect()}
    for _, row in out.head(5).iterrows():
        expect = np.resize(np.frombuffer(raw[row["media_id"]], np.uint8), 64)
        np.testing.assert_array_equal(np.asarray(row["pixels"]), expect)


def test_resize_nearest_neighbor(media_df):
    dec = decode_image(media_df)
    small = resize_image(dec, 4, 4).toPandas().sort_values("media_id")
    assert small["pixels"].map(len).eq(16).all()
    full = dec.toPandas().sort_values("media_id")
    img = np.asarray(full.iloc[0]["pixels"]).reshape(8, 8)
    got = np.asarray(small.iloc[0]["pixels"]).reshape(4, 4)
    np.testing.assert_array_equal(got, img[::2, ::2])


def test_extract_features_matches_numpy(media_df):
    dec = decode_image(media_df)
    feats = extract_features(dec).toPandas().sort_values("media_id")
    pixels = dec.toPandas().sort_values("media_id")["pixels"]
    for (_, f), px in zip(feats.iterrows(), pixels):
        arr = np.asarray(px, dtype=np.float64)
        assert f["mean_px"] == pytest.approx(arr.mean())
        assert f["std_px"] == pytest.approx(arr.std())


def test_frame_sample_every_other(media_df):
    frames = frame_sample(media_df, every_n=2, frame_bytes=50).toPandas()
    # 150-byte payloads → 3 frames → sampled idx {0, 2}
    per = frames.groupby("media_id")["frame_idx"].apply(list)
    assert all(v == [0, 2] for v in per)
    assert frames["frame"].map(len).eq(50).all()


def test_real_decoder_stubbed(media_df):
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(media_df, decoder="pil")


# ---- real codecs (pure stdlib+numpy, multimodal/codecs.py) -----------------


def _rand_img(rng, h, w, c):
    return rng.randint(0, 256, size=(h, w, c)).astype("uint8")


def test_png_roundtrip_all_color_types():
    import numpy as np

    from cuml_spark.multimodal import codecs

    rng = np.random.RandomState(0)
    for c in (1, 2, 3, 4):
        img = _rand_img(rng, 11, 7, c)
        out = codecs.decode_png(codecs.encode_png(img))
        assert out.shape == (11, 7, c)
        assert (out == img).all()


def test_png_unfilter_types():
    """Hand-build IDAT streams exercising filters 1 (sub), 2 (up),
    3 (average), 4 (paeth) against a direct per-pixel reference."""
    import struct
    import zlib

    import numpy as np

    from cuml_spark.multimodal import codecs

    rng = np.random.RandomState(5)
    h, w, c = 6, 5, 3
    img = _rand_img(rng, h, w, c).astype(np.int64)
    stride = w * c

    # forward-filter each row with its type, like an encoder would
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    ftypes = [0, 1, 2, 3, 4, 1]
    for y, ft in enumerate(ftypes):
        cur = img[y].ravel()
        flt = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            d = prev[x - c] if x >= c else 0
            if ft == 0:
                flt[x] = cur[x]
            elif ft == 1:
                flt[x] = cur[x] - a
            elif ft == 2:
                flt[x] = cur[x] - b
            elif ft == 3:
                flt[x] = cur[x] - (a + b) // 2
            else:
                flt[x] = cur[x] - codecs._paeth(int(a), int(b), int(d))
        raw.append(ft)
        raw.extend((flt & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    buf = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    out = codecs.decode_png(buf)
    assert (out == img.astype("uint8")).all()


def test_bmp_decode_24bpp_bottom_up():
    import struct

    import numpy as np

    from cuml_spark.multimodal import codecs

    rng = np.random.RandomState(1)
    h, w = 4, 3
    img = _rand_img(rng, h, w, 3)
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y][:, [2, 1, 0]].tobytes()  # RGB -> BGR
        body.extend(row + b"\x00" * (stride - len(row)))
    data_off = 14 + 40
    hdr = (b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                         2835, 2835, 0, 0))
    out = codecs.decode_bmp(bytes(hdr) + bytes(body))
    assert (out == img).all()


def test_ppm_decode_with_comment():
    import numpy as np

    from cuml_spark.multimodal import codecs

    rng = np.random.RandomState(2)
    img = _rand_img(rng, 3, 4, 3)
    buf = b"P6\n# a comment\n4 3\n255\n" + img.tobytes()
    assert (codecs.decode_ppm(buf) == img).all()


def test_wav_decode_16bit_stereo():
    import io
    import wave

    import numpy as np

    from cuml_spark.multimodal import codecs

    t = np.arange(200)
    left = (10000 * np.sin(t / 7.0)).astype("<i2")
    right = (8000 * np.cos(t / 11.0)).astype("<i2")
    inter = np.empty(400, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(inter.tobytes())
    x, rate = codecs.decode_wav(bio.getvalue())
    assert rate == 16000 and len(x) == 200
    expect = (left.astype(float) + right.astype(float)) / 2 / 32768.0
    assert np.allclose(x, expect)


def test_decode_image_real_png_distributed(spark):
    """Spark decode_image(decoder='auto') on real PNG bytes must reproduce
    the source luma exactly, and feed resize/extract_features unchanged."""
    import numpy as np

    from cuml_spark.multimodal import codecs, decode_image, extract_features

    rng = np.random.RandomState(7)
    rows = []
    imgs = {}
    for i in range(6):
        img = _rand_img(rng, 8, 10, 3)
        imgs[i] = img
        rows.append((i, bytearray(codecs.encode_png(img))))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in
           decode_image(df, decoder="auto").collect()}
    for i, img in imgs.items():
        luma = codecs.to_luma(img).ravel()
        assert got[i]["width"] == 10 and got[i]["height"] == 8
        assert (np.asarray(got[i]["pixels"]) == luma).all()
    feats = extract_features(decode_image(df, decoder="auto")).collect()
    assert {r["n_pixels"] for r in feats} == {80}


def test_decode_audio_distributed(spark):
    import io
    import wave

    import numpy as np

    from cuml_spark.multimodal import decode_audio

    def mk_wav(seed):
        x = (np.random.RandomState(seed).randint(-3000, 3000, 100)).astype("<i2")
        bio = io.BytesIO()
        with wave.open(bio, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(x.tobytes())
        return bio.getvalue(), x

    rows, refs = [], {}
    for i in range(4):
        buf, x = mk_wav(i)
        rows.append((i, bytearray(buf)))
        refs[i] = x
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in decode_audio(df).collect()}
    for i, x in refs.items():
        assert got[i]["sample_rate"] == 8000
        assert got[i]["n_samples"] == 100
        assert np.allclose(got[i]["samples"], x / 32768.0)


def test_decode_image_unknown_format_raises(spark):
    import pytest
    from pyspark.errors import PythonException

    from cuml_spark.multimodal import decode_image

    df = spark.createDataFrame(
        [(0, bytearray(b"RIFF\x10\x00\x00\x00WEBPVP8 unsupported"))],
        "media_id long, content binary")
    with pytest.raises(PythonException, match="codec library"):
        decode_image(df, decoder="auto").collect()


# ---- baseline JPEG (multimodal/jpeg.py) ------------------------------------
# Validation anchors are independent of the encoder: the IDCT against the
# spec's direct cosine-sum, Huffman tables against hand-computed canonical
# codes, DC-only and subsampled streams hand-assembled byte by byte.


def test_jpeg_idct_matches_spec_formula():
    import numpy as np

    from cuml_spark.multimodal.jpeg import idct_8x8

    rng = np.random.RandomState(0)
    coef = rng.uniform(-100, 100, (8, 8))
    naive = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.125) if u == 0 else 0.5
                    cv = np.sqrt(0.125) if v == 0 else 0.5
                    s += (cu * cv * coef[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            naive[x, y] = s
    assert np.abs(idct_8x8(coef) - naive).max() < 1e-10


def test_jpeg_huffman_canonical_codes():
    """Spec C.2 canonical assignment on a hand-computable table:
    bits=[0,2,1,...] → two 2-bit codes 00,01 then one 3-bit code 100."""
    from cuml_spark.multimodal.jpeg import build_huffman

    t = build_huffman([0, 2, 1] + [0] * 13, [7, 8, 9])
    assert t == {(2, 0b00): 7, (2, 0b01): 8, (3, 0b100): 9}


def test_jpeg_gray_roundtrip_q100():
    import numpy as np

    from cuml_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (13, 17)).astype(np.uint8)  # non-multiple of 8
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (13, 17, 1)
    # quality 100 => all-ones quant tables; only DCT rounding remains
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 2


def test_jpeg_rgb_roundtrip_q100():
    import numpy as np

    from cuml_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (16, 24, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_jpeg_lossy_quality_still_close_on_smooth_signal():
    import numpy as np

    from cuml_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:24, 0:32]
    smooth = (128 + 80 * np.sin(xx / 8.0) * np.cos(yy / 6.0)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(smooth, quality=90))
    assert np.abs(out[:, :, 0].astype(float) - smooth).mean() < 2.0


def _dc_only_block(bw, dc_diff, dc_tab, ac_tab):
    """Append one block: DC category+bits then EOB (no AC)."""
    s = int(dc_diff).bit_length() if dc_diff >= 0 else int(-dc_diff).bit_length()
    ln, code = dc_tab[s]
    bw.write_bits(code, ln)
    if s:
        bw.write_bits(dc_diff if dc_diff > 0 else dc_diff + (1 << s) - 1, s)
    ln, code = ac_tab[0x00]
    bw.write_bits(code, ln)


def test_jpeg_chroma_subsampled_stream_hand_assembled():
    """Decode a hand-built 4:2:0 JPEG (Y 2×2, Cb/Cr 1×1) of a constant
    color — a stream shape the 4:4:4 encoder never produces, so this
    exercises the sampling-factor MCU layout + upsampling independently."""
    import struct

    import numpy as np

    from cuml_spark.multimodal.jpeg import (
        _STD_AC_CHROMA, _STD_AC_LUMA, _STD_DC_CHROMA, _STD_DC_LUMA,
        _BitWriter, _inv_huffman, decode_jpeg,
    )

    def chunk(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    q1 = bytes([0]) + bytes([1] * 64)   # qtab 0: all ones
    q2 = bytes([1]) + bytes([1] * 64)   # qtab 1: all ones
    sof = struct.pack(">BHHB", 8, 16, 16, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])  # Y 2x2, Cb 1x1, Cr 1x1
    dht = b"".join(
        chunk(0xC4, bytes([tid] + bits + huffval))
        for tid, (bits, huffval) in [
            (0x00, _STD_DC_LUMA), (0x10, _STD_AC_LUMA),
            (0x01, _STD_DC_CHROMA), (0x11, _STD_AC_CHROMA)])
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"

    # constant Y=180 (shifted: 52; DC coef = 8*52 = 416), Cb=Cr=128 (DC 0)
    bw = _BitWriter()
    dcl, acl = _inv_huffman(*_STD_DC_LUMA), _inv_huffman(*_STD_AC_LUMA)
    dcc, acc = _inv_huffman(*_STD_DC_CHROMA), _inv_huffman(*_STD_AC_CHROMA)
    _dc_only_block(bw, 416, dcl, acl)       # first Y block: diff 416
    for _ in range(3):
        _dc_only_block(bw, 0, dcl, acl)     # remaining Y blocks: diff 0
    _dc_only_block(bw, 0, dcc, acc)         # Cb
    _dc_only_block(bw, 0, dcc, acc)         # Cr
    bw.flush()

    buf = (b"\xff\xd8" + chunk(0xDB, q1) + chunk(0xDB, q2)
           + chunk(0xC0, sof) + dht + chunk(0xDA, sos)
           + bytes(bw.out) + b"\xff\xd9")
    out = decode_jpeg(buf)
    assert out.shape == (16, 16, 3)
    # constant gray: R=G=B=Y=180 exactly (chroma centered)
    assert np.abs(out.astype(int) - 180).max() <= 1


def test_jpeg_restart_interval_stream():
    """DRI=1 with an RST0 marker between two MCUs, DC predictor reset —
    hand-assembled (the encoder never emits restarts)."""
    import struct

    import numpy as np

    from cuml_spark.multimodal.jpeg import (
        _STD_AC_LUMA, _STD_DC_LUMA, _BitWriter, _inv_huffman, decode_jpeg,
    )

    def chunk(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dcl, acl = _inv_huffman(*_STD_DC_LUMA), _inv_huffman(*_STD_AC_LUMA)
    bw1 = _BitWriter()
    _dc_only_block(bw1, 8 * (100 - 128), dcl, acl)  # MCU 0: value 100
    bw1.flush()
    bw2 = _BitWriter()
    _dc_only_block(bw2, 8 * (200 - 128), dcl, acl)  # MCU 1 after reset: 200
    bw2.flush()

    buf = (b"\xff\xd8"
           + chunk(0xDB, bytes([0]) + bytes([1] * 64))
           + chunk(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
           + chunk(0xC4, bytes([0x00] + _STD_DC_LUMA[0] + _STD_DC_LUMA[1]))
           + chunk(0xC4, bytes([0x10] + _STD_AC_LUMA[0] + _STD_AC_LUMA[1]))
           + chunk(0xDD, struct.pack(">H", 1))
           + chunk(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
           + bytes(bw1.out) + b"\xff\xd0" + bytes(bw2.out) + b"\xff\xd9")
    out = decode_jpeg(buf)[:, :, 0].astype(int)
    assert out.shape == (8, 16)
    assert np.abs(out[:, :8] - 100).max() <= 1
    assert np.abs(out[:, 8:] - 200).max() <= 1


def test_jpeg_sof2_dispatches_and_incomplete_stream_raises():
    """SOF2 now routes to the progressive decoder; a header-only stream
    (no scan) must fail loudly, and arithmetic coding still refuses."""
    import struct

    import pytest

    from cuml_spark.multimodal.jpeg import decode_jpeg

    buf = (b"\xff\xd8"
           + struct.pack(">BBH", 0xFF, 0xC2, 11)
           + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError, match="SOS"):
        decode_jpeg(buf)
    buf9 = (b"\xff\xd8"
            + struct.pack(">BBH", 0xFF, 0xC9, 11)
            + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_jpeg(buf9)


def test_jpeg_progressive_roundtrip_matches_baseline():
    """Progressive transport of the SAME quantized coefficients must decode
    to pixels IDENTICAL to the baseline stream — across quality levels,
    successive-approximation depths, odd sizes, and gray/RGB."""
    import numpy as np

    from cuml_spark.multimodal.jpeg import decode_jpeg, encode_jpeg
    from cuml_spark.multimodal.jpeg_progressive import encode_jpeg_progressive

    rng = np.random.RandomState(7)
    cases = [((16, 16), 100, 1), ((16, 24, 3), 90, 1), ((17, 23), 75, 2),
             ((8, 8), 100, 0), ((24, 16, 3), 95, 0), ((40, 40), 50, 1)]
    for shape, q, al in cases:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q, al=al))
        assert np.array_equal(base, prog), (shape, q, al)


def test_jpeg_progressive_distributed_decode(spark):
    """decode_image(decoder='auto') handles SOF2 payloads on executors."""
    import numpy as np
    import pandas as pd

    from cuml_spark.multimodal import decode_image
    from cuml_spark.multimodal.jpeg import decode_jpeg, encode_jpeg
    from cuml_spark.multimodal.jpeg_progressive import encode_jpeg_progressive

    rng = np.random.RandomState(3)
    rows, refs = [], {}
    for i in range(3):
        img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
        refs[i] = decode_jpeg(encode_jpeg(img, quality=92))[:, :, 0]
        rows.append((i, bytearray(encode_jpeg_progressive(img, quality=92))))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = decode_image(df, decoder="auto").collect()
    for r in out:
        got = np.asarray(r["pixels"]).reshape(r["height"], r["width"])
        assert np.array_equal(got, refs[r["media_id"]])


def test_decode_image_real_jpeg_distributed(spark):
    import numpy as np

    from cuml_spark.multimodal import decode_image
    from cuml_spark.multimodal.jpeg import encode_jpeg

    rng = np.random.RandomState(9)
    rows, refs = [], {}
    for i in range(4):
        yy, xx = np.mgrid[0:16, 0:16]
        img = ((xx * 8 + yy * 4 + i * 16) % 256).astype(np.uint8)
        refs[i] = img
        rows.append((i, bytearray(encode_jpeg(img, quality=95))))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in decode_image(df, decoder="auto").collect()}
    for i, img in refs.items():
        assert got[i]["width"] == 16 and got[i]["height"] == 16
        px = np.asarray(got[i]["pixels"]).reshape(16, 16)
        assert np.abs(px - img.astype(int)).mean() < 4.0


def test_extract_audio_features_matches_numpy(spark):
    import io
    import wave

    import numpy as np

    from cuml_spark.multimodal import decode_audio, extract_audio_features

    rng = np.random.RandomState(2)
    rows, refs = [], {}
    for i in range(3):
        raw = (rng.randint(-20000, 20000, 128)).astype("<i2")
        bio = io.BytesIO()
        with wave.open(bio, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(raw.tobytes())
        rows.append((i, bytearray(bio.getvalue())))
        refs[i] = raw.astype(np.float64) / 32768.0
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in
           extract_audio_features(decode_audio(df)).collect()}
    for i, x in refs.items():
        assert got[i]["rms"] == pytest.approx(np.sqrt((x * x).mean()))
        assert got[i]["zcr"] == pytest.approx(
            (np.signbit(x[1:]) != np.signbit(x[:-1])).mean())
        mag = np.abs(np.fft.rfft(x))
        freqs = np.arange(len(mag)) / len(x)
        assert got[i]["spectral_centroid"] == pytest.approx(
            (freqs * mag).sum() / mag.sum())


def _encode_gif_flood(idx, palette, interlaced=False):
    """Minimal valid GIF writer: CLEAR before every pixel code so the LZW
    table never grows (the classic tiny-GIF trick) — a stream every
    conforming decoder must accept."""
    import struct

    import numpy as np

    h, w = idx.shape
    n = len(palette)
    bits = max(2, (n - 1).bit_length())
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[:n] = palette
    mcs = bits
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    acc = nbits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    rows = idx
    if interlaced:
        order = np.concatenate([
            np.arange(0, h, 8), np.arange(4, h, 8),
            np.arange(2, h, 4), np.arange(1, h, 2)])
        rows = idx[order]
    emit(clear)
    for v in rows.ravel():
        emit(int(v))
        emit(clear)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    flags = 0x80 | (bits - 1)
    buf = (b"GIF89a" + struct.pack("<HHBBB", w, h, flags, 0, 0)
           + pal.tobytes()
           + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
           + bytes([0x40 if interlaced else 0x00, mcs]))
    for i in range(0, len(out), 255):
        chunk = out[i:i + 255]
        buf += bytes([len(chunk)]) + bytes(chunk)
    buf += b"\x00\x3b"
    return buf


def test_gif_decode_flood_and_interlace():
    import numpy as np

    from cuml_spark.multimodal import codecs

    rng = np.random.RandomState(6)
    palette = rng.randint(0, 256, (7, 3)).astype(np.uint8)
    idx = rng.randint(0, 7, (11, 9))
    for interlaced in (False, True):
        buf = _encode_gif_flood(idx, palette, interlaced)
        assert codecs.sniff_format(buf) == "gif"
        out = codecs.decode_gif(buf)
        assert out.shape == (11, 9, 3)
        assert (out == palette[idx]).all()


def test_gif_lzw_table_growth_and_kwkwk():
    """Hand-packed stream [CLEAR, 1, 6, 6, EOI] at min_code_size=2: code 6
    is the not-yet-defined next code both times (the KwKwK case), expanding
    to [1, 1,1, 1,1] — spec 'variable-length-code LZW' behavior, which the
    flood encoder never produces."""
    import numpy as np

    from cuml_spark.multimodal.codecs import _gif_lzw_decode

    codes = [4, 1, 6, 6, 5]
    acc = nbits = 0
    data = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 3
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    out = _gif_lzw_decode(bytes(data), 2, 5)
    assert (out == np.ones(5)).all()


def test_decode_image_gif_distributed(spark):
    import numpy as np

    from cuml_spark.multimodal import codecs, decode_image

    rng = np.random.RandomState(8)
    palette = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    rows, refs = [], {}
    for i in range(3):
        idx = rng.randint(0, 4, (8, 8))
        refs[i] = codecs.to_luma(palette[idx]).ravel()
        rows.append((i, bytearray(_encode_gif_flood(idx, palette))))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in decode_image(df, decoder="auto").collect()}
    for i, luma in refs.items():
        assert (np.asarray(got[i]["pixels"]) == luma).all()


def test_avi_mjpeg_roundtrip_container():
    import numpy as np

    from cuml_spark.multimodal import codecs
    from cuml_spark.multimodal.jpeg import encode_jpeg

    frames_in = [encode_jpeg(np.full((8, 8), 40 * i, dtype=np.uint8),
                             quality=100) for i in range(5)]
    buf = codecs.encode_avi_mjpeg(frames_in, fps=12.0)
    assert codecs.sniff_format(buf) == "avi"
    frames_out, fps = codecs.parse_avi_frames(buf)
    assert frames_out == frames_in
    assert fps == pytest.approx(12.0, rel=1e-4)


def test_frame_sample_avi_to_pixels_distributed(spark):
    """Full real video path: MJPEG AVI → sampled frames → decoded pixels.
    Constant-value frames are bit-exact through baseline JPEG at q100, so
    the decoded values identify each frame."""
    import numpy as np

    from cuml_spark.multimodal import codecs, decode_image, frame_sample
    from cuml_spark.multimodal.jpeg import encode_jpeg

    rows = []
    for vid in range(2):
        frames = [encode_jpeg(np.full((8, 8), 30 * fi + 10 * vid, dtype=np.uint8),
                              quality=100) for fi in range(6)]
        rows.append((vid, bytearray(codecs.encode_avi_mjpeg(frames))))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    sampled = frame_sample(df, every_n=2, decoder="avi")
    got = sampled.collect()
    assert {(r["media_id"], r["frame_idx"]) for r in got} == {
        (v, f) for v in range(2) for f in (0, 2, 4)}
    # decode the sampled frames: value identifies (video, frame)
    dec = decode_image(
        sampled.selectExpr("media_id * 10 + frame_idx AS media_id",
                           "frame AS content"),
        decoder="auto",
    ).collect()
    for r in dec:
        vid, fi = divmod(r["media_id"], 10)
        expect = 30 * fi + 10 * vid
        px = np.asarray(r["pixels"])
        assert px.min() == px.max() == expect


# ---- perceptual image hashing / image near-dup (multimodal/imagehash.py) ---


def test_image_hash_invariance_and_sensitivity():
    import numpy as np

    from cuml_spark.multimodal.imagehash import ahash_py, dhash_py

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (32, 32)).astype(np.int64)
    h = dhash_py(img.ravel(), 32, 32)
    # 2x nearest-upscale keeps the dhash identical (same 9x8 sample grid)
    up = np.repeat(np.repeat(img.reshape(32, 32), 2, 0), 2, 1)
    assert dhash_py(up.ravel(), 64, 64) == h
    # uniform brightness shift keeps both hashes identical (rank-based)
    assert dhash_py((img + 30).ravel(), 32, 32) == h
    a = ahash_py(img.ravel(), 32, 32)
    assert ahash_py((img.ravel() + 30), 32, 32) == a
    # a different random image lands far away
    other = rng.randint(0, 256, (32, 32)).astype(np.int64)
    assert bin(h ^ dhash_py(other.ravel(), 32, 32)).count("1") > 10


def test_image_near_duplicates_banded(spark):
    """Banded hamming join finds all pairs within max_distance and the
    pigeonhole precondition is enforced."""
    import numpy as np
    import pytest

    from cuml_spark.multimodal.imagehash import image_near_duplicates

    rng = np.random.RandomState(11)
    base = rng.randint(-2**62, 2**62, 5).tolist()
    rows = []
    for i, h in enumerate(base):
        rows.append((i * 10, int(h)))
        # near twin: flip 3 bits (distance 3)
        rows.append((i * 10 + 1, int(h) ^ 0b10010001))
    df = spark.createDataFrame(rows, "media_id long, hash long")
    pairs = image_near_duplicates(df, max_distance=6, n_bands=8).collect()
    got = {(r["id_a"], r["id_b"]): r["distance"] for r in pairs}
    for i in range(5):
        assert got[(i * 10, i * 10 + 1)] == 3
    # distant cross-pairs excluded
    assert all(b - a == 1 for a, b in got)

    with pytest.raises(ValueError, match="n_bands"):
        image_near_duplicates(df, max_distance=8, n_bands=8)


def test_image_dedup_groups_distributed(spark):
    import numpy as np

    from cuml_spark.multimodal import codecs, decode_image
    from cuml_spark.multimodal.imagehash import image_dedup_groups, image_hashes

    rows = []
    for i in range(12):
        r = i % 4
        j = np.arange(16 * 16, dtype=np.int64)
        px = ((r + 1) * 2654435761 * (j + 3) * (j + 7)) % 256
        rows.append((i, bytearray(codecs.encode_png(
            px.astype(np.uint8).reshape(16, 16)))))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    groups = image_dedup_groups(
        image_hashes(decode_image(df, decoder="auto"))).collect()
    assert sorted((r["group_rep"], r["n_members"]) for r in groups) == [
        (0, 3), (1, 3), (2, 3), (3, 3)]


def test_resize_bilinear_and_area(spark, media_df):
    import numpy as np

    dec = decode_image(media_df)
    src = {r["media_id"]: np.asarray(r["pixels"]).reshape(8, 8)
           for r in dec.collect()}

    # area 2x downsample of an 8x8 = exact 2x2 block means
    area = {r["media_id"]: np.asarray(r["pixels"]).reshape(4, 4)
            for r in resize_image(dec, 4, 4, method="area").collect()}
    for mid, img in list(src.items())[:5]:
        blocks = img.reshape(4, 2, 4, 2).mean(axis=(1, 3))
        assert (area[mid] == np.rint(blocks)).all()

    # bilinear identity resize returns the image unchanged
    same = {r["media_id"]: np.asarray(r["pixels"]).reshape(8, 8)
            for r in resize_image(dec, 8, 8, method="bilinear").collect()}
    for mid, img in list(src.items())[:5]:
        assert (same[mid] == img).all()

    # bilinear 2x upsample of a horizontal ramp stays a monotone ramp
    ramp = np.tile(np.arange(0, 80, 10), (8, 1))
    rows = [(0, bytearray(bytes(ramp.astype(np.uint8).ravel())))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    d = decode_image(with_media_metadata(df, width=8, height=8))
    up = np.asarray(resize_image(d, 16, 16, method="bilinear")
                    .collect()[0]["pixels"]).reshape(16, 16)
    assert (np.diff(up, axis=1) >= 0).all()
    assert up.min() == 0 and up.max() == 70

    import pytest
    with pytest.raises(ValueError, match="method"):
        resize_image(dec, 4, 4, method="lanczos")


def test_phash_robust_to_noise_but_separates_images():
    """pHash (area resize -> 32-pt DCT -> low-band median threshold) on
    smooth natural-ish content: invariant to per-pixel noise, brightness
    shift and rescaling, far from an independent image."""
    import numpy as np

    from cuml_spark.multimodal.imagehash import phash_py

    rng = np.random.RandomState(13)

    def smooth(base):
        yy, xx = np.mgrid[0:64, 0:64] / 63.0 * 8
        y0, x0 = yy.astype(int), xx.astype(int)
        y1, x1 = np.minimum(y0 + 1, 8), np.minimum(x0 + 1, 8)
        fy, fx = yy - y0, xx - x0
        return ((base[y0, x0] * (1 - fx) + base[y0, x1] * fx) * (1 - fy)
                + (base[y1, x0] * (1 - fx) + base[y1, x1] * fx) * fy
                ).astype(np.int64)

    img = smooth(rng.uniform(30, 225, (9, 9)))
    h0 = phash_py(img.ravel(), 64, 64)
    noisy = np.clip(img + rng.randint(-8, 9, img.shape), 0, 255)
    assert bin(h0 ^ phash_py(noisy.ravel(), 64, 64)).count("1") <= 6
    assert bin(h0 ^ phash_py(np.clip(img + 25, 0, 255).ravel(), 64, 64)
               ).count("1") <= 2
    small = img[::2, ::2]
    assert bin(h0 ^ phash_py(small.ravel(), 32, 32)).count("1") <= 8
    other = smooth(rng.uniform(30, 225, (9, 9)))
    assert bin(h0 ^ phash_py(other.ravel(), 64, 64)).count("1") > 16


def _encode_tiff(img, byte_order="<", rows_per_strip=None):
    """Minimal uncompressed TIFF writer for decoder tests (gray or RGB,
    single or multiple strips, either byte order)."""
    import struct

    import numpy as np

    h, w, c = img.shape
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        strips.append(img[y0:y0 + rps].tobytes())
    bo = byte_order
    n_tags = 8
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_tags + 4
    # strip offsets/counts arrays (after the IFD)
    n_strips = len(strips)
    arr_fmt_size = 4 * n_strips
    offsets_pos = data_off
    counts_pos = data_off + arr_fmt_size
    bits_pos = counts_pos + arr_fmt_size
    bits_size = 2 * c if c > 1 else 0
    pixels_pos = bits_pos + bits_size
    strip_offsets = []
    p = pixels_pos
    for sdata in strips:
        strip_offsets.append(p)
        p += len(sdata)

    def entry(tag, typ, count, value):
        return struct.pack(bo + "HHI", tag, typ, count) + value

    def short_val(v):
        return struct.pack(bo + "HH", v, 0)

    def long_val(v):
        return struct.pack(bo + "I", v)

    entries = [
        entry(256, 4, 1, long_val(w)),
        entry(257, 4, 1, long_val(h)),
        entry(258, 3, c, short_val(8) if c == 1 else long_val(bits_pos)),
        entry(259, 3, 1, short_val(1)),  # uncompressed
        entry(273, 4, n_strips,
              long_val(strip_offsets[0] if n_strips == 1 else offsets_pos)),
        entry(277, 3, 1, short_val(c)),
        entry(278, 4, 1, long_val(rps)),
        entry(279, 4, n_strips,
              long_val(len(strips[0]) if n_strips == 1 else counts_pos)),
    ]
    buf = bytearray()
    buf += (b"II*\x00" if bo == "<" else b"MM\x00*")
    buf += struct.pack(bo + "I", ifd_off)
    buf += struct.pack(bo + "H", n_tags) + b"".join(entries)
    buf += struct.pack(bo + "I", 0)  # next IFD
    buf += b"".join(struct.pack(bo + "I", o) for o in strip_offsets)
    buf += b"".join(struct.pack(bo + "I", len(s)) for s in strips)
    if c > 1:
        buf += struct.pack(bo + "H" * c, *([8] * c))
    for sdata in strips:
        buf += sdata
    return bytes(buf)


def test_tiff_decode_variants():
    import numpy as np

    from cuml_spark.multimodal import codecs

    rng = np.random.RandomState(3)
    rgb = _rand_img(rng, 10, 7, 3)
    gray = _rand_img(rng, 6, 9, 1)
    for bo in ("<", ">"):
        out = codecs.decode_tiff(_encode_tiff(rgb, byte_order=bo))
        assert (out == rgb).all()
    # multi-strip layout
    out = codecs.decode_tiff(_encode_tiff(rgb, rows_per_strip=3))
    assert (out == rgb).all()
    out = codecs.decode_tiff(_encode_tiff(gray))
    assert (out == gray).all()
    assert codecs.sniff_format(_encode_tiff(gray)) == "tiff"
    # compressed TIFF refuses with the codec message
    import struct

    import pytest
    bad = bytearray(_encode_tiff(gray))
    # tag 259 (compression) short value lives in the 4th entry's value slot
    # — rewrite it to 5 (LZW)
    idx = bad.find(struct.pack("<HHI", 259, 3, 1))
    bad[idx + 8:idx + 10] = struct.pack("<H", 5)
    with pytest.raises(NotImplementedError, match="compression"):
        codecs.decode_tiff(bytes(bad))


def test_g711_expanders_exact_and_idempotent():
    """ITU-T G.711 integer expansion: spot values from the standard's
    segment table, full-range idempotence (decode -> encode -> decode is
    the identity on decoded values, all 256 codewords, both laws)."""
    import numpy as np

    from cuml_spark.multimodal.codecs import (alaw_to_linear,
                                              linear_to_alaw,
                                              linear_to_ulaw,
                                              ulaw_to_linear)

    b = np.arange(256)
    u, a = ulaw_to_linear(b), alaw_to_linear(b)
    # standard extremes: u-law 0x00 -> -32124, 0xFF -> 0; A-law +/-32256
    assert ulaw_to_linear(np.array([0x00]))[0] == -32124
    assert ulaw_to_linear(np.array([0xFF]))[0] == 0
    assert u.min() == -32124 and u.max() == 32124
    assert a.min() == -32256 and a.max() == 32256
    assert (ulaw_to_linear(linear_to_ulaw(u)) == u).all()
    assert (alaw_to_linear(linear_to_alaw(a)) == a).all()


def test_g711_wav_container_roundtrip_and_refusal():
    """decode_wav must route format tags 7/6 through the expanders (max
    quantization error bounded by the G.711 segment width) and refuse
    MP3-in-WAV (tag 0x55) naming the tag instead of mis-parsing it."""
    import struct

    import numpy as np
    import pytest

    from cuml_spark.multimodal.codecs import decode_wav, encode_wav_g711

    x = ((13 * 5 + 7 * np.arange(400)) % 200 - 100) * 300
    for law in ("ulaw", "alaw"):
        dec, rate = decode_wav(encode_wav_g711(x, 8000, law))
        assert rate == 8000 and len(dec) == 400
        assert np.abs(dec * 32768 - x).max() < 2100  # top-segment step/2

    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 4)
    mp3wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", 0))
    with pytest.raises(NotImplementedError, match="0x55"):
        decode_wav(mp3wav)

def test_adpcm_stereo_deinterleaves_channel_words():
    """Stereo IMA ADPCM interleaves 4-byte nibble words per channel with
    independent per-channel header state — the stereo decode must equal
    the two mono decodes of the de-interleaved streams, frame-interleaved."""
    import numpy as np

    from cuml_spark.multimodal.codecs import adpcm_ima_decode

    rng = np.random.RandomState(3)
    a = rng.randint(0, 16, 16)  # ch0 nibbles (4 words)
    b = rng.randint(0, 16, 16)  # ch1 nibbles

    def pack(nibs):
        return bytes(int(nibs[i]) | (int(nibs[i + 1]) << 4)
                     for i in range(0, len(nibs), 2))

    hdr0 = (1000).to_bytes(2, "little") + bytes([20, 0])
    hdr1 = (0x10000 - 500).to_bytes(2, "little") + bytes([35, 0])
    pa, pb = pack(a), pack(b)
    stereo = hdr0 + hdr1 + b"".join(
        pa[i:i + 4] + pb[i:i + 4] for i in range(0, len(pa), 4))
    st = adpcm_ima_decode(stereo, len(stereo), nch=2).reshape(-1, 2)
    m0 = adpcm_ima_decode(hdr0 + pa, 4 + len(pa))
    m1 = adpcm_ima_decode(hdr1 + pb, 4 + len(pb))
    assert (st[:, 0] == m0).all() and (st[:, 1] == m1).all()


def test_mp4_box_roundtrip_and_probe(spark):
    """ISO-BMFF skeleton round trip (writer -> parser), 64-bit largesize
    and to-end boxes handled, non-BMFF refused; probe_media fans one row
    out per track and drops unparseable blobs (the pipeline filter
    semantic)."""
    import struct

    import pytest

    from cuml_spark.multimodal.mp4 import build_mp4, parse_mp4, probe_media

    tracks = [
        {"handler": "vide", "codec": "avc1", "width": 128, "height": 96,
         "timescale": 30000, "duration": 90000, "n_samples": 90},
        {"handler": "soun", "codec": "mp4a", "width": 0, "height": 0,
         "timescale": 48000, "duration": 144000, "n_samples": 300},
    ]
    buf = build_mp4(tracks, movie_timescale=1000, movie_duration=3000)
    meta = parse_mp4(buf)
    assert meta["brand"] == "isom" and meta["movie_duration"] == 3000
    assert [t["codec"] for t in meta["tracks"]] == ["avc1", "mp4a"]
    assert meta["tracks"][0]["width"] == 128
    assert meta["tracks"][0]["n_samples"] == 90
    assert meta["tracks"][1]["handler"] == "soun"

    # 64-bit largesize wrapping of the moov box must parse identically
    i = buf.index(b"moov") - 4
    size = struct.unpack(">I", buf[i:i + 4])[0]
    wrapped = (buf[:i] + struct.pack(">I", 1) + b"moov"
               + struct.pack(">Q", size + 8) + buf[i + 8:i + size]
               + buf[i + size:])
    assert parse_mp4(wrapped)["tracks"][0]["width"] == 128

    with pytest.raises(ValueError, match="ISO-BMFF"):
        parse_mp4(b"\x00" * 64)

    rows = [(0, bytearray(buf)), (1, bytearray(b"garbage not a container"))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = probe_media(df).collect()
    assert len(out) == 2  # two tracks from clip 0; the garbage blob dropped
    assert {r["media_id"] for r in out} == {0}
    assert {r["codec"] for r in out} == {"avc1", "mp4a"}


def test_adpcm_ima_matches_stdlib_and_roundtrips():
    """IMA ADPCM: the nibble recurrence must match the stdlib audioop
    reference bit-exactly (same step/index tables, state (0,0)), the
    encoder->decoder loop must track a smooth signal within the coder's
    slew limits, and the WAV tag-0x11 container must route through it."""
    import numpy as np

    from cuml_spark.multimodal.codecs import (adpcm_ima_decode,
                                              adpcm_ima_encode, decode_wav,
                                              wrap_wav_adpcm)

    rng = np.random.RandomState(7)
    t = np.arange(3000)
    x = (8000 * np.sin(t / 20.0) + 3000 * np.sin(t / 7.3)
         + rng.randint(-200, 200, len(t))).astype(np.int64)
    ba = 256
    enc = adpcm_ima_encode(x, ba)
    dec = adpcm_ima_decode(enc, ba)
    n = min(len(dec), len(x))
    err = dec[:n] - x[:n]
    assert np.sqrt(float((err ** 2).mean())) < 500  # tracks the signal

    wav = wrap_wav_adpcm(enc, 8000, ba)
    y, rate = decode_wav(wav)
    assert rate == 8000 and np.allclose(y[:n] * 32768, dec[:n])

    try:
        import audioop  # removed in 3.13 — cross-check only where present
    except ImportError:
        return
    nib = [3, 8, 15, 0, 7, 12, 1, 9, 4, 11, 2, 14]
    hi_first = bytes((a << 4) | b for a, b in zip(nib[0::2], nib[1::2]))
    ref = np.frombuffer(audioop.adpcm2lin(hi_first, 2, None)[0], dtype="<i2")
    blk = b"\x00\x00\x00\x00" + bytes(
        (b << 4) | a for a, b in zip(nib[0::2], nib[1::2]))
    ours = adpcm_ima_decode(blk, 4 + len(nib) // 2)[1:]
    assert (ours == ref).all()


# ---------------------------------------------------------------------------
# Lossless JPEG (SOF3, T.81 Annex H)
# ---------------------------------------------------------------------------

def test_lossless_jpeg_hand_assembled_stream_decodes_per_spec():
    """Decoder anchored to T.81 Annex H independently of the encoder: a
    hand-assembled 2x2 8-bit stream, predictor 1, one Huffman table with
    categories 0..16 at code length 5 (code == symbol).

    Pixels [[130,131],[129,200]]; hand-derived samples:
      (0,0) px=128 (first sample: 1<<(8-0-1)), diff=+2  -> SSSS=2, bits 10
      (0,1) px=Ra=130,                         diff=+1  -> SSSS=1, bit  1
      (1,0) px=Rb=130 (first column),          diff=-1  -> SSSS=1, bit  0
      (1,1) px=Ra=129 (predictor 1),           diff=+71 -> SSSS=7, 1000111
    Bitstream 00010·10·00001·1·00001·0·00111·1000111 + 1-pad
      = 0x14 0x18 0x47 0x8F."""
    import struct

    from cuml_spark.multimodal.jpeg import decode_jpeg
    from cuml_spark.multimodal.jpeg_lossless import decode_jpeg_lossless

    dht = bytes([0x00]) + bytes([0, 0, 0, 0, 17] + [0] * 11) + bytes(range(17))
    sof = bytes([8]) + struct.pack(">HH", 2, 2) + bytes([1, 1, 0x11, 0x00])
    sos = bytes([1, 1, 0x00, 1, 0x00, 0x00])
    buf = (b"\xff\xd8"
           + b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
           + b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
           + b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
           + bytes([0x14, 0x18, 0x47, 0x8F])
           + b"\xff\xd9")
    want = np.array([[130, 131], [129, 200]], dtype=np.uint8)[:, :, None]
    assert np.array_equal(decode_jpeg_lossless(buf), want)
    # the generic entry point dispatches SOF3 to the lossless decoder
    assert np.array_equal(decode_jpeg(buf), want)


def test_lossless_jpeg_round_trip_every_predictor_exact():
    """The format's contract IS exactness: every predictor, gray + RGB,
    8- and 16-bit, including restart intervals, decodes back to the
    identical array."""
    from cuml_spark.multimodal.jpeg_lossless import (decode_jpeg_lossless,
                                                     encode_jpeg_lossless)

    rng = np.random.RandomState(7)
    img8 = rng.randint(0, 256, size=(11, 6, 3)).astype(np.uint8)
    gray = rng.randint(0, 256, size=(5, 9), dtype=np.uint8)
    img16 = rng.randint(0, 65536, size=(6, 7), dtype=np.uint16)
    for pred in range(1, 8):
        assert np.array_equal(
            decode_jpeg_lossless(encode_jpeg_lossless(img8, predictor=pred)),
            img8)
        assert np.array_equal(
            decode_jpeg_lossless(encode_jpeg_lossless(gray, predictor=pred)),
            gray[:, :, None])
    assert np.array_equal(
        decode_jpeg_lossless(encode_jpeg_lossless(img16, predictor=4)),
        img16[:, :, None])
    # restart intervals reset prediction state on BOTH sides
    withrst = encode_jpeg_lossless(img8, predictor=7, restart_interval=5)
    assert np.array_equal(decode_jpeg_lossless(withrst), img8)
    # extreme diffs exercise mod-2^16 wrap and category 16
    extreme = np.array([[0, 65535], [65535, 0]], dtype=np.uint16)
    assert np.array_equal(
        decode_jpeg_lossless(encode_jpeg_lossless(extreme, predictor=1)),
        extreme[:, :, None])


def test_lossless_jpeg_rejects_bad_inputs():
    from cuml_spark.multimodal.jpeg_lossless import encode_jpeg_lossless

    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(np.zeros((2, 2), np.uint8), predictor=0)
    with pytest.raises(ValueError, match="dtype"):
        encode_jpeg_lossless(np.zeros((2, 2), np.float64))
    with pytest.raises(ValueError, match="image"):
        encode_jpeg_lossless(np.zeros((2, 2, 2), np.uint8))


# ---------------------------------------------------------------------------
# compressed-audio header probing (r12)
# ---------------------------------------------------------------------------

def test_mp3_roundtrip_cbr_vbr_id3_and_xing():
    """build→parse round trips for every version; ID3v2 skipped via the
    syncsafe size; mixed bitrates report NULL (VBR); the Xing tag parses
    from the correct side-info offset per (version, mode)."""
    from cuml_spark.multimodal.audio import (MP3_BITRATES_V1, build_mp3,
                                             parse_mp3)

    m = parse_mp3(build_mp3(7, "1", 192, 32000, mono=True, xing_frames=6))
    assert (m["profile"], m["sample_rate"], m["channels"], m["n_frames"],
            m["n_samples"], m["bitrate_kbps"], m["xing_frames"]) == (
        "mpeg1-layer3", 32000, 1, 7, 7 * 1152, 192, 6)
    m = parse_mp3(build_mp3(4, "2", 64, 24000))
    assert (m["profile"], m["n_samples"], m["xing_frames"]) == (
        "mpeg2-layer3", 4 * 576, None)
    # ID3v2 prefix with a syncsafe size (0x01 0x7F = 255 bytes)
    id3 = b"ID3\x04\x00\x00" + bytes((0, 0, 1, 0x7F)) + b"\x00" * 255
    m = parse_mp3(id3 + build_mp3(2, "2.5", 24, 11025))
    assert (m["profile"], m["n_frames"]) == ("mpeg2.5-layer3", 2)
    # VBR: concatenating two CBR runs at different bitrates → NULL kbps
    vbr = build_mp3(2, "1", 128, 44100) + build_mp3(2, "1", 320, 44100)
    m = parse_mp3(vbr)
    assert m["n_frames"] == 4 and m["bitrate_kbps"] is None
    # every V1 bitrate row walks at every V1 rate (frame-length table)
    for kbps in MP3_BITRATES_V1:
        for sr in (44100, 48000, 32000):
            assert parse_mp3(build_mp3(3, "1", kbps, sr))["n_frames"] == 3


def test_adts_flac_ogg_roundtrip_and_cross_rejection():
    from cuml_spark.multimodal.audio import (build_adts, build_flac,
                                             build_mp3, build_ogg,
                                             parse_adts, parse_flac,
                                             parse_mp3, parse_ogg,
                                             probe_stream)

    m = parse_adts(build_adts(5, profile=0, sample_rate=8000, channels=6))
    assert (m["profile"], m["sample_rate"], m["channels"], m["n_frames"],
            m["n_samples"]) == ("aac-main", 8000, 6, 5, 5 * 1024)
    # FLAC bit-packed STREAMINFO extremes: 20-bit rate, 36-bit total
    m = parse_flac(build_flac(655350, 8, 32, (1 << 36) - 1))
    assert (m["sample_rate"], m["channels"], m["bits_per_sample"],
            m["n_samples"]) == (655350, 8, 32, (1 << 36) - 1)
    # Opus: granule is 48k samples incl. pre-skip; vorbis: stream rate
    m = parse_ogg(build_ogg("opus", 16000, 2, 12345, pre_skip=100))
    assert (m["codec"], m["sample_rate"], m["n_samples"]) == (
        "ogg-opus", 48000, 12345)
    m = parse_ogg(build_ogg("vorbis", 11025, 1, 777))
    assert (m["codec"], m["sample_rate"], m["channels"],
            m["n_samples"]) == ("ogg-vorbis", 11025, 1, 777)
    # cross-rejection: the 0xFFF sync collision routes by layer bits
    mp3 = build_mp3(2, "1", 128, 44100)
    with pytest.raises(ValueError):
        parse_adts(mp3)
    with pytest.raises(ValueError):
        parse_mp3(build_adts(2))
    assert probe_stream(mp3)["codec"] == "mp3"
    assert probe_stream(build_adts(2))["codec"] == "aac-adts"
    with pytest.raises(ValueError):
        probe_stream(b"\x00" * 32)


def test_audio_parsers_property_roundtrip():
    """Randomized build→parse agreement across the full planted-parameter
    space of all four formats."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cuml_spark.multimodal.audio import (ADTS_RATES, MP3_BITRATES_V1,
                                             MP3_BITRATES_V2, MP3_RATES,
                                             build_adts, build_flac,
                                             build_mp3, build_ogg,
                                             probe_stream)

    @settings(max_examples=120, deadline=None)
    @given(st.data())
    def inner(data):
        kind = data.draw(st.sampled_from(["mp3", "adts", "flac", "opus",
                                          "vorbis"]))
        if kind == "mp3":
            ver = data.draw(st.sampled_from(["1", "2", "2.5"]))
            table = MP3_BITRATES_V1 if ver == "1" else MP3_BITRATES_V2
            kbps = data.draw(st.sampled_from(table))
            sr = data.draw(st.sampled_from(MP3_RATES[ver]))
            n = data.draw(st.integers(1, 12))
            got = probe_stream(build_mp3(n, ver, kbps, sr))
            spf = 1152 if ver == "1" else 576
            assert (got["codec"], got["n_frames"], got["n_samples"],
                    got["bitrate_kbps"], got["sample_rate"]) == (
                "mp3", n, n * spf, kbps, sr)
        elif kind == "adts":
            n = data.draw(st.integers(1, 12))
            prof = data.draw(st.integers(0, 3))
            sr = data.draw(st.sampled_from(ADTS_RATES))
            ch = data.draw(st.integers(1, 6))
            got = probe_stream(build_adts(n, prof, sr, ch))
            assert (got["codec"], got["sample_rate"], got["channels"],
                    got["n_samples"]) == ("aac-adts", sr, ch, n * 1024)
        elif kind == "flac":
            sr = data.draw(st.integers(1, (1 << 20) - 1))
            ch = data.draw(st.integers(1, 8))
            bps = data.draw(st.integers(4, 32))
            tot = data.draw(st.integers(0, (1 << 36) - 1))
            got = probe_stream(build_flac(sr, ch, bps, tot))
            assert (got["codec"], got["sample_rate"], got["channels"],
                    got["bits_per_sample"], got["n_samples"]) == (
                "flac", sr, ch, bps, tot)
        else:
            sr = data.draw(st.integers(1000, 192000))
            n = data.draw(st.integers(0, 1 << 40))
            ch = data.draw(st.integers(1, 8))
            got = probe_stream(build_ogg(kind, sr, ch, n))
            if kind == "opus":
                assert (got["codec"], got["sample_rate"],
                        got["n_samples"]) == ("ogg-opus", 48000, n)
            else:
                assert (got["codec"], got["sample_rate"], got["channels"],
                        got["n_samples"]) == ("ogg-vorbis", sr, ch, n)

    inner()


def test_probe_audio_distributed_mixed_and_unparseable(spark):
    """probe_audio fans one row per parseable blob, drops garbage rows
    (filter semantic), and keeps planted-NULL columns integer-typed."""
    from cuml_spark.multimodal.audio import (build_flac, build_mp3,
                                             build_ogg, probe_audio)

    rows = [(0, bytearray(build_mp3(3, "1", 128, 44100))),
            (1, bytearray(build_flac(48000, 2, 16, 1000))),
            (2, bytearray(b"not audio at all")),
            (3, bytearray(build_ogg("opus", 48000, 2, 4800)))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r.asDict()
           for r in probe_audio(df.repartition(3)).collect()}
    assert set(out) == {0, 1, 3}  # id 2 filtered
    assert out[0]["codec"] == "mp3" and out[0]["bitrate_kbps"] == 128
    assert out[1]["codec"] == "flac" and out[1]["bits_per_sample"] == 16
    assert out[3]["codec"] == "ogg-opus" and out[3]["n_samples"] == 4800
    assert out[0]["bits_per_sample"] is None  # NULL, not NaN-coerced


def test_audio_parsers_truncation_and_null_robustness(spark):
    """r12 review fixes: truncated ident packets / STREAMINFO raise
    ValueError (not IndexError/struct.error escaping probe_stream), and
    NULL content rows filter instead of crashing the kernel."""
    from cuml_spark.multimodal.audio import (build_flac, build_mp3,
                                             build_ogg, parse_flac,
                                             parse_ogg, probe_audio,
                                             probe_stream)

    # Ogg page whose ident packet is just the magic — must be ValueError
    def page(packet):
        import struct
        lacing = bytes([len(packet)])
        return (b"OggS" + bytes((0, 2))
                + struct.pack("<qIII", 0, 1, 0, 0)
                + bytes((1,)) + lacing + packet)

    for ident in (b"OpusHead", b"OpusHead\x01", b"\x01vorbis",
                  b"\x01vorbis\x00\x00\x00\x00\x02"):
        with pytest.raises(ValueError):
            parse_ogg(page(ident))
        with pytest.raises(ValueError):
            probe_stream(page(ident))
    # FLAC truncated mid-STREAMINFO: declared length 34, actual body
    # shorter — must raise, not return garbage metadata
    whole = build_flac(44100, 2, 16, 1000)
    for cut in (8, 20, 30):
        with pytest.raises(ValueError):
            parse_flac(whole[:cut])
        with pytest.raises(ValueError):
            probe_stream(whole[:cut])
    # NULL payloads and truncated blobs inside the distributed probe
    rows = [(0, bytearray(build_mp3(2, "1", 128, 44100))),
            (1, None),
            (2, bytearray(whole[:20])),
            (3, bytearray(build_ogg("opus", 48000, 1, 10)))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"] for r in probe_audio(df).collect()}
    assert got == {0, 3}


def test_parse_mp4_truncated_box_payloads_raise_valueerror():
    """r12: boxes that pass the walker's size check but carry payloads
    shorter than the fields read from them must raise ValueError —
    struct.error/IndexError would escape probe_media's filter catch."""
    import struct

    from cuml_spark.multimodal.mp4 import parse_mp4

    def box(four, payload):
        return struct.pack(">I", 8 + len(payload)) + four + payload

    for crafted in (box(b"moov", box(b"mvhd", b"\x00" * 4)),
                    box(b"moov", box(b"mvhd", b"")),
                    box(b"moov", box(b"trak", box(b"tkhd", b"\x00" * 3)))):
        with pytest.raises(ValueError, match="truncated ISO-BMFF"):
            parse_mp4(crafted)


# ---------------------------------------------------------------------------
# H.264 Annex-B elementary-stream probing (r12)
# ---------------------------------------------------------------------------

def test_h264_probe_roundtrip_and_semantics():
    """build→parse round trips: SPS exp-Golomb fields, crop equations,
    NAL/frame/IDR counts, emulation-prevention transparency."""
    from cuml_spark.multimodal.h264 import (_add_emulation,
                                            _strip_emulation, build_h264,
                                            parse_h264)

    m = parse_h264(build_h264(8, 6, 10, profile_idc=66, idr_every=4))
    assert (m["profile"], m["width"], m["height"], m["n_frames"],
            m["n_idr"], m["n_nal_units"]) == ("baseline", 128, 96, 10, 3, 12)
    # 1080p needs cropping: 68 mb rows = 1088 luma rows, crop_bottom=4
    # crop units (4:2:0 progressive → 2 rows each) = 1080
    m = parse_h264(build_h264(120, 68, 5, profile_idc=100, level_idc=40,
                              crop_bottom=4))
    assert (m["profile"], m["level_idc"], m["width"], m["height"]) == (
        "high", 40, 1920, 1080)
    # emulation prevention is lossless for every 00 00 0x shape
    for payload in (b"\x00\x00\x01", b"\x00\x00\x00\x00\x00",
                    b"\x00\x00\x02\x00\x00\x03", b"\x00" * 7 + b"\x01"):
        assert _strip_emulation(_add_emulation(payload)) == payload


def test_h264_probe_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cuml_spark.multimodal.h264 import build_h264, parse_h264

    @settings(max_examples=60, deadline=None)
    @given(
        wmbs=st.integers(1, 256), hmbs=st.integers(1, 128),
        n=st.integers(1, 30), idr=st.integers(1, 10),
        prof=st.sampled_from([66, 77, 100, 110]),
        cr=st.integers(0, 7), cb=st.integers(0, 7),
    )
    def inner(wmbs, hmbs, n, idr, prof, cr, cb):
        m = parse_h264(build_h264(wmbs, hmbs, n, profile_idc=prof,
                                  idr_every=idr, crop_right=cr,
                                  crop_bottom=cb))
        assert m["profile_idc"] == prof
        assert m["width"] == wmbs * 16 - 2 * cr
        assert m["height"] == hmbs * 16 - 2 * cb
        assert m["n_frames"] == n
        assert m["n_idr"] == (n + idr - 1) // idr

    inner()


def test_h264_refusals_and_truncation_are_valueerror():
    from cuml_spark.multimodal.h264 import build_h264, parse_h264

    whole = build_h264(4, 4, 3)
    with pytest.raises(ValueError):
        parse_h264(b"\xffnot a stream")
    with pytest.raises(ValueError):  # slices but no SPS
        parse_h264(b"\x00\x00\x01\x41" + b"\x01" * 8)
    # SPS truncated mid-field → ValueError from the bit reader
    with pytest.raises(ValueError):
        parse_h264(whole[:8])


def test_probe_h264_distributed(spark):
    from cuml_spark.multimodal.h264 import build_h264, probe_h264

    rows = [(0, bytearray(build_h264(4, 3, 6, idr_every=3))),
            (1, None),
            (2, bytearray(b"garbage")),
            (3, bytearray(build_h264(10, 10, 2, profile_idc=100)))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r.asDict() for r in probe_h264(df).collect()}
    assert set(out) == {0, 3}
    assert (out[0]["width"], out[0]["height"], out[0]["n_idr"]) == (64, 48, 2)
    assert out[3]["profile"] == "high"
    plan = probe_h264(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "Exchange" not in plan


# ---------------------------------------------------------------------------
# image header probing (r12)
# ---------------------------------------------------------------------------

def _webp(kind: str, w: int, h: int, alpha: bool = False) -> bytes:
    import struct

    if kind == "lossy":
        body = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
                + struct.pack("<HH", w, h))
        four = b"VP8 "
    elif kind == "lossless":
        bits = (w - 1) | ((h - 1) << 14) | (int(alpha) << 28)
        body = bytes((0x2F,)) + struct.pack("<I", bits)
        four = b"VP8L"
    else:
        body = (bytes((0x10 if alpha else 0,)) + b"\x00" * 3
                + (w - 1).to_bytes(3, "little")
                + (h - 1).to_bytes(3, "little"))
        four = b"VP8X"
    chunk = four + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) % 2 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _avif(w: int, h: int, brand: bytes = b"avif") -> bytes:
    import struct

    from cuml_spark.multimodal.mp4 import _box

    ispe = _box(b"ispe", struct.pack(">I", 0) + struct.pack(">II", w, h))
    meta = _box(b"meta", struct.pack(">I", 0)
                + _box(b"iprp", _box(b"ipco", ispe)))
    return _box(b"ftyp", brand + struct.pack(">I", 0) + b"avifmif1") + meta


def test_probe_image_matches_own_encoders():
    """Header probing cross-validated against this repo's own encoders:
    the probe's dimensions must equal what the codec wrote — for PNG
    (gray + RGB), baseline/progressive/lossless JPEG."""
    from cuml_spark.multimodal.codecs import encode_png
    from cuml_spark.multimodal.image_probe import probe_image_bytes
    from cuml_spark.multimodal.jpeg import encode_jpeg
    from cuml_spark.multimodal.jpeg_lossless import encode_jpeg_lossless
    from cuml_spark.multimodal.jpeg_progressive import (
        encode_jpeg_progressive,
    )

    img = (np.arange(17 * 23) % 251).reshape(23, 17).astype(np.uint8)
    rgb = np.stack([img] * 3, axis=-1)
    cases = [
        (encode_png(img), "png", 1), (encode_png(rgb), "png", 3),
        (encode_jpeg(img), "jpeg-baseline", 1),
        (encode_jpeg_progressive(rgb), "jpeg-progressive", 3),
        (encode_jpeg_lossless(img), "jpeg-lossless", 1),
    ]
    for blob, fmt, ch in cases:
        m = probe_image_bytes(blob)
        assert (m["format"], m["width"], m["height"], m["channels"]) == (
            fmt, 17, 23, ch), fmt


def test_probe_image_webp_avif_and_misc_formats():
    import struct

    from cuml_spark.multimodal.image_probe import probe_image_bytes

    m = probe_image_bytes(_webp("lossy", 800, 600))
    assert (m["format"], m["width"], m["height"]) == ("webp-lossy", 800, 600)
    m = probe_image_bytes(_webp("lossless", 1920, 1080, alpha=True))
    assert (m["format"], m["width"], m["height"], m["channels"]) == (
        "webp-lossless", 1920, 1080, 4)
    m = probe_image_bytes(_webp("extended", 256, 128, alpha=True))
    assert (m["format"], m["width"], m["height"]) == (
        "webp-extended", 256, 128)
    m = probe_image_bytes(_avif(1024, 768))
    assert (m["format"], m["width"], m["height"]) == ("avif", 1024, 768)
    m = probe_image_bytes(_avif(32, 16, brand=b"heic"))
    assert (m["format"], m["width"], m["height"]) == ("heif", 32, 16)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + bytes((0xF7, 0, 0))
    assert probe_image_bytes(gif)["width"] == 320
    ppm = b"P6\n# comment\n640 480\n65535\n"
    m = probe_image_bytes(ppm)
    assert (m["width"], m["height"], m["bit_depth"]) == (640, 480, 16)
    # refusals: garbage, WAV RIFF, JPEG with no SOF — ValueError always
    for bad in (b"garbage!", b"RIFF\x00\x00\x00\x00WAVEdata",
                b"\xff\xd8\xff\xd9", _webp("lossy", 8, 8)[:14], b""):
        with pytest.raises(ValueError):
            probe_image_bytes(bad)


def test_probe_image_distributed(spark):
    from cuml_spark.multimodal.codecs import encode_png
    from cuml_spark.multimodal.image_probe import probe_image

    img = np.zeros((6, 9), dtype=np.uint8)
    rows = [(0, bytearray(encode_png(img))),
            (1, bytearray(_webp("lossy", 100, 50))),
            (2, None), (3, bytearray(b"junk")),
            (4, bytearray(_avif(640, 360)))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r.asDict() for r in probe_image(df).collect()}
    assert set(out) == {0, 1, 4}
    assert (out[0]["width"], out[0]["height"]) == (9, 6)
    assert out[1]["format"] == "webp-lossy"
    assert out[4]["format"] == "avif"
    plan = probe_image(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "Exchange" not in plan


def test_probe_tier_review_regressions(spark):
    """r12 second review pass, pinned: (1) JPEG truncated exactly at the
    SOF unpack boundary raises ValueError, not struct.error; (2) crafted
    netpbm/u64 header values past int64 FILTER instead of overflowing
    the Arrow cast; (3) NULL media_id rows drop in every probe; (4) OS/2
    BITMAPCOREHEADER BMPs parse their u16 fields correctly."""
    import struct

    from cuml_spark.multimodal.audio import build_flac, probe_audio
    from cuml_spark.multimodal.h264 import build_h264, probe_h264
    from cuml_spark.multimodal.image_probe import (probe_image,
                                                   probe_image_bytes)
    from cuml_spark.multimodal.mp4 import _box, probe_media

    # (1) the off-by-one: 9 bytes past the SOF marker
    trunc = b"\xff\xd8\xff\xc0\x00\x11\x08\x00\x17\x00\x01"
    with pytest.raises(ValueError):
        probe_image_bytes(trunc)
    # (2a) netpbm with a 10^23 width filters
    with pytest.raises(ValueError):
        probe_image_bytes(b"P6 99999999999999999999999 10 255 ")
    # (2b) mp4 with a u64 duration past int64: the blob filters instead
    # of OverflowError-ing the Int64 cast outside the per-blob try
    mvhd = _box(b"mvhd", struct.pack(">BxxxQQIQ", 1, 0, 0, 1000, 1 << 63))
    bomb = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom"
                ) + _box(b"moov", mvhd)
    rows = [(0, bytearray(bomb)),
            (None, bytearray(build_flac(8000, 1, 8, 5))),  # (3) NULL id
            (2, bytearray(build_flac(8000, 1, 8, 5)))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    assert [r["media_id"] for r in probe_media(df).collect()] == []
    assert [r["media_id"] for r in probe_audio(df).collect()] == [2]
    h_rows = [(None, bytearray(build_h264(4, 4, 2))),
              (1, bytearray(build_h264(4, 4, 2)))]
    hdf = spark.createDataFrame(h_rows, "media_id long, content binary")
    assert [r["media_id"] for r in probe_h264(hdf).collect()] == [1]
    i_rows = [(None, bytearray(_webp("lossy", 8, 8))),
              (1, bytearray(_webp("lossy", 8, 8)))]
    idf = spark.createDataFrame(i_rows, "media_id long, content binary")
    assert [r["media_id"] for r in probe_image(idf).collect()] == [1]
    # (4) OS/2 core-header BMP: u16 width/height at 18/20, bpp at 24
    core = (b"BM" + b"\x00" * 12 + struct.pack("<I", 12)
            + struct.pack("<HHHH", 100, 50, 1, 24))
    m = probe_image_bytes(core)
    assert (m["width"], m["height"], m["channels"]) == (100, 50, 3)


def test_sniff_names_webp_avif_and_decode_refusal_names_format(spark):
    """sniff_format recognizes WebP/AVIF so decode_image's refusal names
    the real format (probe_image still handles their dimensions)."""
    from cuml_spark.multimodal import decode_image
    from cuml_spark.multimodal.codecs import sniff_format

    webp = _webp("lossy", 8, 8)
    avif = _avif(8, 8)
    assert sniff_format(webp) == "webp"
    assert sniff_format(avif) == "avif"
    df = spark.createDataFrame([(0, bytearray(webp))],
                               "media_id long, content binary")
    with pytest.raises(Exception, match="webp"):
        decode_image(df, decoder="auto").collect()


def test_mp4_roundtrip_property():
    """Randomized build_mp4 → parse_mp4 agreement over the planted
    parameter space (brands, track mixes, dimensions, timescales,
    sample counts) — the property-level counterpart of the planted
    oracle query."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cuml_spark.multimodal.mp4 import build_mp4, parse_mp4

    @settings(max_examples=60, deadline=None)
    @given(st.data())
    def inner(data):
        n_tracks = data.draw(st.integers(1, 4))
        brand = data.draw(st.sampled_from(["isom", "mp42", "avc1"]))
        tracks = []
        for _ in range(n_tracks):
            vid = data.draw(st.booleans())
            tracks.append({
                "handler": "vide" if vid else "soun",
                "codec": data.draw(st.sampled_from(
                    ["avc1", "hvc1", "mp4a", "av01"])),
                "width": data.draw(st.integers(0, 8192)) if vid else 0,
                "height": data.draw(st.integers(0, 4320)) if vid else 0,
                "timescale": data.draw(st.integers(1, 96000)),
                "duration": data.draw(st.integers(0, 1 << 31)),
                "n_samples": data.draw(st.integers(0, 1 << 20)),
            })
        ts = data.draw(st.integers(1, 1_000_000))
        dur = data.draw(st.integers(0, 1 << 31))
        meta = parse_mp4(build_mp4(tracks, movie_timescale=ts,
                                   movie_duration=dur, brand=brand))
        assert meta["brand"] == brand
        assert meta["movie_timescale"] == ts
        assert meta["movie_duration"] == dur
        assert len(meta["tracks"]) == n_tracks
        for spec, got in zip(tracks, meta["tracks"]):
            assert got["handler"] == spec["handler"]
            assert got["codec"] == spec["codec"]
            assert got["width"] == spec["width"]
            assert got["height"] == spec["height"]
            assert got["timescale"] == spec["timescale"]
            assert got["duration"] == spec["duration"]
            assert got["n_samples"] == spec["n_samples"]

    inner()


def test_probe_map_bounds_and_fanout_semantics(spark):
    """probe_base.probe_map directly: multi-row fan-out per blob, the
    int64 bounds filter (blob-granular — one bad field drops the whole
    blob, not just its row), and catch-tuple scoping."""
    from cuml_spark.multimodal.probe_base import probe_map

    def rows_fn(mid, buf):
        n = buf[0]
        if n == 0:
            raise ValueError("planted refusal")
        if n == 9:
            raise KeyError("outside the catch tuple")
        # fan out n rows; blob 7 plants one beyond-int64 field
        return [(mid, i, (1 << 63) if (n == 7 and i == 1) else i * 10)
                for i in range(n)]

    df = spark.createDataFrame(
        [(1, bytearray([2])), (2, bytearray([0])), (3, bytearray([7])),
         (4, bytearray([1]))],
        "media_id long, content binary")
    out = probe_map(df, rows_fn, ["media_id", "idx", "val"],
                    "media_id long, idx long, val long", ["idx", "val"])
    got = sorted((r["media_id"], r["idx"], r["val"])
                 for r in out.collect())
    # blob 1 fans out 2 rows; blob 2 refused; blob 3 dropped WHOLE
    # (one row was in-bounds but the blob carries a bad field); blob 4 ok
    assert got == [(1, 0, 0), (1, 1, 10), (4, 0, 0)]
    # an exception outside the catch tuple propagates (not silently eaten)
    bad = spark.createDataFrame([(5, bytearray([9]))],
                                "media_id long, content binary")
    with pytest.raises(Exception):
        probe_map(bad, rows_fn, ["media_id", "idx", "val"],
                  "media_id long, idx long, val long",
                  ["idx", "val"]).collect()
