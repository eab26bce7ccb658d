"""Multimodal binary-column plumbing: schemas, determinism, explode shapes.
Codec layer is stubbed (fake FMM0 container); dataframe contracts are real."""

import pytest

from fastie_spark.multimodal import (
    audio_features,
    build_media_rows,
    frame_sample,
    image_features,
    media_df,
    parse_meta,
    resize_image,
    _parse_header,
)


@pytest.fixture(scope="module")
def media(spark):
    return media_df(spark, n=60).persist()


def test_parse_meta(spark, media):
    meta = parse_meta(media).collect()
    assert len(meta) == 60
    by_kind = {}
    for r in meta:
        by_kind.setdefault(r["kind"], 0)
        by_kind[r["kind"]] += 1
        assert r["payload_len"] > 0
    assert by_kind == {"image": 20, "audio": 20, "video": 20}


def test_image_features_deterministic(spark, media):
    a = {r["media_id"]: r["mean_brightness"] for r in image_features(media).collect()}
    b = {r["media_id"]: r["mean_brightness"] for r in image_features(media).collect()}
    assert a == b and len(a) == 20
    assert all(0 <= v <= 255 for v in a.values())


def test_resize_roundtrip(spark, media):
    resized = resize_image(media, 16, 12)
    feats = image_features(resized).collect()
    assert len(feats) == 20
    assert all(r["n_pixels"] == 16 * 12 for r in feats)


def test_frame_sample_counts(spark, media):
    rows = frame_sample(media, every_k=4).collect()
    # per video: ceil(n_frames / 4) frames
    metas = {r["media_id"]: r for r in parse_meta(media).collect()}
    import math

    want = sum(
        math.ceil(m["n_frames"] / 4)
        for m in metas.values() if m["kind"] == "video"
    )
    assert len(rows) == want
    assert all(len(r["frame"]) > 0 for r in rows)


def test_audio_features_shape(spark, media):
    rows = audio_features(media).collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["rms"]) in (20, 40)  # 8000 or 16000 samples / 400
        assert all(0.0 <= v <= 1.0 for v in r["rms"])


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        _parse_header(b"\xff\xd8\xff\xe0 fake jpeg bytes")
