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
