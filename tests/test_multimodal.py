"""Multimodal plumbing tests (decode stubbed, pipeline real)."""

import pytest
import ray.data

from microfts_ray.pipelines.multimodal import (
    MediaDecoder,
    decode_media,
    frame_sample_plan,
    media_features,
    synthesize_media,
)


def test_synthesize_deterministic():
    a = synthesize_media(10)
    b = synthesize_media(10)
    assert a.equals(b)
    assert a.num_rows == 10


def test_decode_pipeline_stub():
    ds = ray.data.from_arrow(synthesize_media(30))
    decoded = decode_media(ds, concurrency=2, batch_size=8)
    out = media_features(decoded).to_pandas().sort_values("media_id")
    assert len(out) == 30
    assert (out["feat_mean"] > 0).all()
    # deterministic end-to-end
    out2 = media_features(decode_media(ray.data.from_arrow(synthesize_media(30)))).to_pandas().sort_values("media_id")
    assert out["feat_mean"].tolist() == out2["feat_mean"].tolist()


def test_decode_real_raises():
    dec = MediaDecoder(decode_stub=False)
    with pytest.raises(NotImplementedError):
        dec._decode(b"xx", "image")


def test_frame_sample_plan():
    ds = ray.data.from_arrow(synthesize_media(12))
    plan = frame_sample_plan(ds, every_ms=5000).to_pandas()
    src = synthesize_media(12).to_pylist()
    want = sum(
        len(range(0, r["duration_ms"], 5000))
        for r in src
        if r["kind"] == "video" and r["duration_ms"] > 0
    )
    assert len(plan) == want
    assert (plan["ts_ms"] % 5000 == 0).all()
