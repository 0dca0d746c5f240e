from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from landscape_spark.multimodal import binaryops as B


def test_media_schema_and_determinism(spark):
    a = B.synthesize_media(spark, 50, seed=1).orderBy("media_id").collect()
    b = B.synthesize_media(spark, 50, seed=1).orderBy("media_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert {r.mime for r in a} <= {"image/png", "audio/wav", "video/mp4"}


def test_real_decode_is_gated(spark):
    with pytest.raises(NotImplementedError):
        B.decode_image(b"\x00" * 16, 4, 4, fake=False)


def test_image_features_deterministic(spark):
    m = B.synthesize_media(spark, 60, seed=2)
    f1 = {r.media_id: (r.mean_intensity, r.std_intensity) for r in B.image_features(m).collect()}
    f2 = {r.media_id: (r.mean_intensity, r.std_intensity) for r in B.image_features(m).collect()}
    assert f1 == f2
    assert len(f1) > 0
    for mean, std in f1.values():
        assert 0 <= mean <= 255 and std >= 0


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
