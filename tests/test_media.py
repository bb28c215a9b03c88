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


def test_parse_image_header_png_roundtrip():
    from raygraph.ops.media import make_png, parse_image_header

    assert parse_image_header(make_png(640, 480)) == ("png", 640, 480)
    assert parse_image_header(make_png(1, 1, b"xyz")) == ("png", 1, 1)
    # a real PNG is parseable by zlib-capable readers: CRC check
    import struct
    import zlib

    p = make_png(12, 34)
    ln = struct.unpack(">I", p[8:12])[0]
    typ_data = p[12:16 + ln]
    crc = struct.unpack(">I", p[16 + ln:20 + ln])[0]
    assert zlib.crc32(typ_data) & 0xFFFFFFFF == crc


def test_parse_image_header_jpeg_and_garbage():
    import struct

    from raygraph.ops.media import parse_image_header

    # SOI + APP0 segment + SOF0 carrying (height=480, width=640)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" \
        + struct.pack(">HH", 480, 640) + b"\x03"
    jpeg = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    assert parse_image_header(jpeg) == ("jpeg", 640, 480)
    assert parse_image_header(b"\xff\xd8\x00") == ("jpeg", None, None)
    assert parse_image_header(b"not an image") == ("unknown", None, None)
    assert parse_image_header(b"") == ("unknown", None, None)


def test_image_dimensions_stage(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.media import image_dimensions, make_png

    tbl = pa.table({
        "media_ref": ["a", "b", "c"],
        "payload": pa.array([make_png(10, 20), make_png(7, 7), b"junk"],
                            pa.binary()),
    })
    out = image_dimensions(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("media_ref").reset_index(drop=True)
    assert out["fmt"].tolist() == ["png", "png", "unknown"]
    assert out["width"].tolist()[:2] == [10, 7]
    assert out["height"].fillna(-1).tolist() == [20, 7, -1]


def test_wav_roundtrip_and_garbage():
    from raygraph.ops.media import make_wav, parse_wav_header

    w = make_wav(44100, 2, 16, b"x" * 441_000)
    m = parse_wav_header(w)
    assert m["sample_rate"] == 44100 and m["n_channels"] == 2
    assert m["bits_per_sample"] == 16
    assert m["n_frames"] == 110_250          # 441000 B / 4 B-per-frame
    assert m["duration_ms"] == 2500
    # zero-padding to a whole frame
    assert parse_wav_header(make_wav(8000, 2, 16, b"abc"))["n_frames"] == 1
    # non-WAV payloads degrade to all-None, never raise
    for junk in (b"", b"RIFF1234WAVX", b"\x89PNG", b"RIFF"):
        assert parse_wav_header(junk)["sample_rate"] is None


def test_dedup_by_digest_groups_identical_payloads(ray_session):
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.media import dedup_by_digest

    ds = rd.from_arrow(pa.table({
        "media_ref": ["m/3", "m/1", "m/2", "m/4", "m/5"],
        "payload": pa.array([b"AAA", b"AAA", b"BBB", b"AAA", b"CCC"],
                            pa.binary()),
    }))
    out = dedup_by_digest(ds).to_pandas().set_index("digest")
    a = hashlib.md5(b"AAA").hexdigest()
    assert len(out) == 1                       # only the duplicated payload
    assert out.loc[a, "n_copies"] == 3
    assert out.loc[a, "keeper"] == "m/1"       # lexicographic min ref
