"""Multimodal (image/audio/video) stages — real Ray plumbing, stubbed codecs.

Media payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample are actor-pool ``map_batches``
stages (codec/model loaded once per actor in ``__init__``). The actual
image/audio libraries are NOT in this container, so the decode kernel is
gated: with ``strict=True`` it raises ``NotImplementedError`` exactly where
PIL/ffmpeg would be called; the default is a deterministic fake decoder so
schema, batch sizing, actor signature and output layout are real and
tested end-to-end.

Batch-size note (SURVEY.md §4.2): wide binary rows must use a small
``batch_size`` (default 64 here vs 4096 for text) so batch × concurrency
fits worker heaps; keep ``media_ref`` as a reference, not inlined bytes,
whenever the payload lives in object storage.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_BATCH_SIZE = 64

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_ref", pa.string()),
        pa.field("payload", pa.binary()),      # opaque encoded bytes
        pa.field("media_type", pa.string()),   # "image" | "audio" | "video"
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)


def _try_import_pillow():
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


class MediaDecoder:
    """Actor-pool stage: payload bytes → fixed-size feature vector.

    With a real imaging stack this would decode + resize + embed; here the
    fake path derives a deterministic pseudo-feature from a blake2b digest
    of the payload, so downstream stages (ANN over media features, dedup
    by feature) are fully exercised.
    """

    def __init__(self, feature_dim: int = 64, strict: bool = False):
        self.feature_dim = feature_dim
        self.strict = strict
        self.have_pillow = _try_import_pillow()

    def _decode_real(self, payload: bytes) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError(
            "real image decode requires PIL/libvips — not available in this "
            "environment; run with strict=False for the deterministic stub"
        )

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        d = hashlib.blake2b(payload, digest_size=self.feature_dim).digest()
        return (np.frombuffer(d, dtype=np.uint8).astype(np.float32) - 127.5) / 127.5

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        if self.strict and not self.have_pillow:
            self._decode_real(payloads[0] if payloads else b"")
        feats = np.stack([self._decode_fake(p or b"") for p in payloads]) if payloads \
            else np.zeros((0, self.feature_dim), dtype=np.float32)
        # n_bytes + a 60-bit md5 digest of the payload: the SQL-verifiable
        # part of the decode output (('0x'||substr(md5(p),1,15))::BIGINT)
        n_bytes = [len(p or b"") for p in payloads]
        digests = [int(hashlib.md5(p or b"").hexdigest()[:15], 16)
                   for p in payloads]
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "media_type": batch.column("media_type"),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "payload_md5_60": pa.array(digests, pa.int64()),
                "feature": pa.array(list(feats), pa.list_(pa.float32())),
            }
        )


class FrameSampler:
    """Actor-pool stage: 'video' payload → every k-th 'frame' (stub frames
    = fixed-size byte windows; the slicing/explode plumbing is the real
    part — one input row fans out to n output rows)."""

    def __init__(self, frame_bytes: int = 256, every: int = 2):
        self.frame_bytes = frame_bytes
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, idxs, frames = [], [], []
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(), batch.column("payload").to_pylist()
        ):
            p = payload or b""
            n_frames = max(1, len(p) // self.frame_bytes)
            for f in range(0, n_frames, self.every):
                refs.append(ref)
                idxs.append(f)
                frames.append(p[f * self.frame_bytes : (f + 1) * self.frame_bytes])
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for tests/bench."""
    rng = np.random.RandomState(seed)
    rows = {
        "media_ref": [f"media/obj-{i}.bin" for i in range(n)],
        "payload": [rng.bytes(512 + (i % 7) * 128) for i in range(n)],
        "media_type": [("image", "audio", "video")[i % 3] for i in range(n)],
        "width": pa.array([64 + (i % 4) * 32 for i in range(n)], pa.int32()),
        "height": pa.array([64 + (i % 3) * 32 for i in range(n)], pa.int32()),
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)


def documents_as_media(docs_ds):
    """documents (doc_id, text) → MEDIA_SCHEMA rows: payload = UTF-8 text
    bytes, media_type cycles by doc_id % 3. Gives the media pipeline an
    input a SQL oracle can reason about (payload digest = md5(text))."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        kinds = ("image", "audio", "video")
        n = len(ids)
        return pa.table(
            {
                "media_ref": pa.array([f"media/{i}" for i in ids], pa.string()),
                "payload": pa.array([(t or "").encode() for t in texts],
                                    pa.binary()),
                "media_type": pa.array([kinds[i % 3] for i in ids], pa.string()),
                "width": pa.array([64] * n, pa.int32()),
                "height": pa.array([64] * n, pa.int32()),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def dedup_by_digest(ds, payload_col: str = "payload",
                    ref_col: str = "media_ref", num_buckets: int = 64):
    """Exact duplicate-media detection by payload content digest (the
    image/audio dedup primitive: identical bytes → one keeper): per
    duplicated digest, the copy count and the lexicographically smallest
    ref. Digesting is per-payload by nature (a hash can't be
    vectorized across rows; the C md5 over a multi-KB payload dwarfs
    the per-row call) and runs inside ``map_batches`` so it streams;
    everything after is a digest-keyed combiner partial (count + min
    ref) plus one hash-bucketed merge — payload bytes never shuffle,
    only 32-char digests do."""
    import hashlib

    from .relational import hash_aggregate

    def digests(batch: pa.Table) -> pa.Table:
        pays = batch.column(payload_col).to_pylist()
        return pa.table({
            "digest": pa.array(
                [hashlib.md5(p or b"").hexdigest() for p in pays],
                pa.string()),
            ref_col: batch.column(ref_col),
        })

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("digest", sort=False).agg(
            n_copies=(ref_col, "size"),
            keeper=(ref_col, "min")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(digests, batch_format="pyarrow") \
        .map_batches(partial, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("digest", sort=False).agg(
            n_copies=("n_copies", "sum"),
            keeper=("keeper", "min")).reset_index()
        return g.loc[g["n_copies"] > 1]

    return hash_aggregate(partials, ["digest"], merge,
                          num_buckets=num_buckets)


PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def make_png(width: int, height: int, payload: bytes = b"") -> bytes:
    """Minimal VALID PNG container (signature + IHDR + IDAT-ish blob +
    IEND, CRCs included) — lets tests and oracles exercise the real
    byte-level parser without any codec library."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", payload)
            + chunk(b"IEND", b""))


def parse_image_header(payload: bytes) -> tuple[str, int | None, int | None]:
    """(format, width, height) from raw bytes — PNG IHDR and JPEG SOFn
    markers, pure byte offsets, no decode. Unknown/truncated payloads →
    ("unknown", None, None); this IS the real metadata-extraction kernel
    a 100 TB media pipeline runs before any expensive decode."""
    import struct

    if payload[:8] == PNG_SIG and len(payload) >= 24 \
            and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return "png", w, h
    if payload[:2] == b"\xff\xd8":                      # JPEG SOI
        i, n = 2, len(payload)
        while i + 9 < n:
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                return "jpeg", w, h
            seg_len = struct.unpack(">H", payload[i + 2:i + 4])[0]
            i += 2 + seg_len
        return "jpeg", None, None
    return "unknown", None, None


def image_dimensions(ds, payload_col: str = "payload",
                     keep_cols: tuple = ("media_ref",)):
    """Per-payload header parse: (keep_cols…, fmt, width, height).
    Stateless map — the per-row cost is a handful of byte comparisons,
    so it runs at read speed; wide rows keep MEDIA_BATCH_SIZE."""

    def fn(batch: pa.Table) -> pa.Table:
        payloads = batch.column(payload_col).to_pylist()
        fmts, ws, hs = [], [], []
        for p in payloads:
            f, w, h = parse_image_header(p or b"")
            fmts.append(f)
            ws.append(w)
            hs.append(h)
        cols = {c: batch.column(c) for c in keep_cols}
        cols["fmt"] = pa.array(fmts, pa.string())
        cols["width"] = pa.array(ws, pa.int32())
        cols["height"] = pa.array(hs, pa.int32())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow",
                          batch_size=MEDIA_BATCH_SIZE)


def decode_features(ds, feature_dim: int = 64, concurrency=(1, 4)):
    """Corpus → per-media feature vectors (actor pool, small batches)."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
    )


def make_wav(sample_rate: int, n_channels: int, bits: int,
             payload: bytes = b"") -> bytes:
    """Minimal VALID RIFF/WAVE container (fmt + data chunks, PCM) —
    the audio twin of :func:`make_png`. The data chunk is ``payload``
    zero-padded to a whole number of frames (block align =
    channels × bits/8), so frame count is exact."""
    import struct

    block = n_channels * (bits // 8)
    pad = (-len(payload)) % block
    data = payload + b"\x00" * pad
    byte_rate = sample_rate * block
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate,
                      block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_header(payload: bytes) -> dict:
    """PCM WAV metadata from raw bytes — RIFF walk over chunks, no
    codec. Returns sample_rate / n_channels / bits_per_sample / n_frames
    / duration_ms, or all-None for non-WAV payloads. Like
    :func:`parse_image_header`, this is the pre-decode kernel an audio
    pipeline runs at read speed."""
    import struct

    none = {k: None for k in ("sample_rate", "n_channels",
                              "bits_per_sample", "n_frames", "duration_ms")}
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return none
    i, n = 12, len(payload)
    rate = channels = bits = None
    data_len = None
    while i + 8 <= n:
        cid = payload[i:i + 4]
        clen = struct.unpack("<I", payload[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 8 + 16 <= n:
            _, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[i + 8:i + 24])
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen & 1)          # chunks are word-aligned
    if rate is None or data_len is None or not channels or not bits:
        return none
    block = channels * (bits // 8)
    frames = data_len // block if block else 0
    return {
        "sample_rate": rate,
        "n_channels": channels,
        "bits_per_sample": bits,
        "n_frames": frames,
        "duration_ms": frames * 1000 // rate if rate else 0,
    }


def audio_metadata(ds, payload_col: str = "payload",
                   keep_cols: tuple = ("media_ref",)):
    """Per-payload WAV header parse: (keep_cols…, sample_rate,
    n_channels, bits_per_sample, n_frames, duration_ms)."""

    def fn(batch: pa.Table) -> pa.Table:
        payloads = batch.column(payload_col).to_pylist()
        metas = [parse_wav_header(p or b"") for p in payloads]
        cols = {c: batch.column(c) for c in keep_cols}
        for k in ("sample_rate", "n_channels", "bits_per_sample",
                  "n_frames", "duration_ms"):
            cols[k] = pa.array([m[k] for m in metas], pa.int64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow",
                          batch_size=MEDIA_BATCH_SIZE)
