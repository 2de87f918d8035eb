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
        [(0, bytearray(b"\xff\xd8\xff\xe0 jpeg-ish"))],
        "media_id long, content binary")
    with pytest.raises(PythonException, match="codec library"):
        decode_image(df, decoder="auto").collect()
