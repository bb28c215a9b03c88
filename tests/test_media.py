"""Multimodal plumbing: decode stub, frame sampling, schema round-trip."""

import numpy as np
import pytest

from raygraph.ops.media import (
    FrameSampler,
    MediaDecoder,
    decode_features,
    synth_media_table,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_synth_media_schema():
    t = synth_media_table(9)
    assert t.num_rows == 9
    assert t.schema.names == ["media_ref", "payload", "media_type", "width", "height"]


def test_decoder_deterministic():
    t = synth_media_table(5)
    d = MediaDecoder(feature_dim=32)
    out1 = d(t)
    out2 = MediaDecoder(feature_dim=32)(t)
    assert out1.column("feature").to_pylist() == out2.column("feature").to_pylist()
    assert len(out1.column("feature")[0].as_py()) == 32


def test_decoder_strict_raises():
    d = MediaDecoder(strict=True)
    if d.have_pillow:  # pragma: no cover - not in this container
        pytest.skip("pillow available; strict path would decode for real")
    with pytest.raises(NotImplementedError):
        d(synth_media_table(1))


def test_frame_sampler_fanout():
    t = synth_media_table(3)
    out = FrameSampler(frame_bytes=128, every=2)(t)
    assert out.num_rows > t.num_rows  # one row fans out to n frames
    assert out.schema.names == ["media_ref", "frame_idx", "frame"]
    # frame indices are the sampled (every 2nd) ones
    idxs = [i for r, i in zip(out.column("media_ref").to_pylist(),
                              out.column("frame_idx").to_pylist())
            if r == "media/obj-0.bin"]
    assert idxs == list(range(0, max(idxs) + 1, 2))


def test_decode_features_actor_pipeline():
    import ray.data as rd

    ds = rd.from_arrow(synth_media_table(20))
    out = decode_features(ds, feature_dim=16, concurrency=(1, 2)).take_all()
    assert len(out) == 20
    assert all(len(r["feature"]) == 16 for r in out)
    # deterministic across the actor pool
    again = decode_features(rd.from_arrow(synth_media_table(20)),
                            feature_dim=16, concurrency=(1, 2)).take_all()
    a = {r["media_ref"]: list(r["feature"]) for r in out}
    b = {r["media_ref"]: list(r["feature"]) for r in again}
    assert a == b
