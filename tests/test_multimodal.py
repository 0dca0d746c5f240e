from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from landscape_spark.multimodal import binaryops as B


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(1)
    for h, w in [(1, 1), (3, 5), (17, 31), (64, 48)]:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        assert np.array_equal(B.decode_bmp(B.encode_bmp(img)), img)


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(2)
    s = rng.integers(-32768, 32767, size=1234, dtype=np.int16)
    rate, got = B.decode_wav(B.encode_wav(s, rate=8000))
    assert rate == 8000
    assert np.array_equal(got, s)


def test_media_schema_and_determinism(spark):
    a = B.synthesize_media(spark, 50, seed=1).orderBy("media_id").collect()
    b = B.synthesize_media(spark, 50, seed=1).orderBy("media_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert {r.mime for r in a} <= {"image/bmp", "audio/wav", "video/mp4"}


def test_compressed_decode_is_gated(spark):
    # non-BMP magic without fake= -> honestly gated
    with pytest.raises(NotImplementedError):
        B.decode_image(b"\x89PNG" + b"\x00" * 16, 4, 4, fake=False)
    # BMP magic decodes for real
    img = np.zeros((4, 4), dtype=np.uint8)
    assert B.decode_image(B.encode_bmp(img)).shape == (4, 4)


def test_image_features_real_decode(spark):
    m = B.synthesize_media(spark, 60, seed=2)
    f1 = {
        r.media_id: (r.mean_intensity, r.std_intensity)
        for r in B.image_features(m).collect()
    }
    f2 = {
        r.media_id: (r.mean_intensity, r.std_intensity)
        for r in B.image_features(m).collect()
    }
    assert f1 == f2
    assert len(f1) > 0
    for mean, std in f1.values():
        assert 0 <= mean <= 255 and std >= 0


def test_audio_features_real_decode(spark):
    m = B.synthesize_media(spark, 60, seed=2)
    rows = B.audio_features(m).collect()
    assert len(rows) > 0
    for r in rows:
        # pure sine at amplitude 12000/32768: rms ~ 0.37/sqrt(2) ~ 0.26
        assert 0.2 < r.rms < 0.3
        assert 0 < r.zero_cross_rate < 0.5
        assert r.duration_sec == pytest.approx(0.25, abs=1e-6)


def test_resize_image_real_pixels(spark):
    m = B.synthesize_media(spark, 40, seed=3)
    out = B.resize_image(m, target=24).collect()
    assert len(out) > 0
    for r in out:
        assert max(r.out_w, r.out_h) <= 24
        img = B.decode_bmp(bytes(r.payload))
        assert img.shape == (r.out_h, r.out_w)


def test_resize_preserves_aspect(spark):
    m = B.synthesize_media(spark, 40, seed=3)
    out = B.resize_plan(m, target=224)
    for r in out.collect():
        assert max(r.out_w, r.out_h) <= 224
        assert r.out_w >= 1 and r.out_h >= 1


def test_frame_sampling(spark):
    m = B.synthesize_media(spark, 40, seed=4)
    plan = B.frame_sample_plan(m, every_n=10)
    vids = m.where("mime = 'video/mp4'").select("media_id", "n_frames").collect()
    got = plan.groupBy("media_id").agg(F.count(F.lit(1)).alias("k")).collect()
    expect = {r.media_id: (r.n_frames + 9) // 10 for r in vids}
    assert {r.media_id: r.k for r in got} == expect
