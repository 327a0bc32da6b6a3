"""Multimodal column plumbing: image/audio/video as opaque binary.

Treats media as `binary` payload columns with typed metadata, and
implements decode / feature-extract / resize / frame-sample as
actor-pool `map_batches` stages. Codec status:

* REAL decoders (stdlib/numpy only, no external libs): WAV PCM audio
  (`wave`) and binary PPM images (P6) — synthesize_media emits real
  payloads for those, so decode/resize are tested end-to-end on real
  bytes.
* STUBBED formats (PNG/JPEG/MP4 need libraries this container lacks):
  `decode_stub=True` (default) runs a deterministic fake decoder so
  the Ray-side plumbing — schema, batch sizing, actor lifecycle,
  output layout — still exercises every row; `decode_stub=False`
  decodes WAV/PPM for real and raises NotImplementedError at the
  call site for library-dependent mimes (where PIL/av would slot in).

Scale notes: media rows are big, so stages run with small
`batch_size` (payload x batch x concurrency must fit worker heaps)
and `concurrency=N` actor pools so per-actor init (codec setup, model
load) happens once, not per batch.
"""

from __future__ import annotations

import hashlib
import io
import wave

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("mime", pa.string()),
        ("payload", pa.large_binary()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


# -- real stdlib codecs (WAV PCM, binary PPM/P6) ----------------------------

def encode_wav(samples: np.ndarray, framerate: int = 8000) -> bytes:
    """int16 mono PCM -> WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 mono samples, framerate). 16-bit PCM only
    (what encode_wav writes); multi-channel keeps channel 0."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV is supported")
        nch = w.getnchannels()
        raw = w.readframes(w.getnframes())
        fr = w.getframerate()
    samples = np.frombuffer(raw, dtype="<i2")
    if nch > 1:
        samples = samples[::nch]
    return samples, fr


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8."""
    if not payload.startswith(b"P6"):
        raise NotImplementedError("only binary PPM (P6) images are supported")
    # header = magic, width, height, maxval tokens (comments allowed)
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM is supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3)


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) uint8 image."""
    h, w, _ = pixels.shape
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[yi[:, None], xi[None, :]]


def synthesize_media(n: int, seed: int = 99) -> pa.Table:
    """Deterministic media table for tests/demos: REAL payloads for
    the stdlib-decodable kinds (PPM images, WAV audio), fake bytes for
    video (no stdlib container format); metadata consistent with
    `kind`."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
        kind = kinds[i % 3]
        if kind == "image":
            w = int(rng.integers(4, 24))
            h = int(rng.integers(4, 24))
            payload = encode_ppm(
                rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            )
            mime, width, height, dur = "image/x-portable-pixmap", w, h, -1
        elif kind == "audio":
            fr = 8000
            nsamp = int(rng.integers(200, 2000))
            sig = (np.sin(np.arange(nsamp) * (2 * np.pi * 440 / fr)) * 3000)
            payload = encode_wav(sig.astype(np.int16), fr)
            mime, width, height = "audio/wav", -1, -1
            dur = nsamp * 1000 // fr
        else:
            size = int(rng.integers(256, 4096))
            payload = hashlib.blake2b(
                f"{seed}:{i}".encode(), digest_size=32
            ).digest()
            payload = (payload * (size // 32 + 1))[:size]
            mime = "video/mp4"
            width = int(rng.integers(16, 512))
            height = int(rng.integers(16, 512))
            dur = int(rng.integers(1000, 60000))
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "mime": mime,
                "payload": payload,
                "width": width,
                "height": height,
                "duration_ms": dur,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class MediaDecoder:
    """Actor-pool decode stage: __init__ once per actor (codec setup),
    __call__ per batch. decode_stub=True derives a deterministic
    pixel/pcm digest from the payload; decode_stub=False REALLY
    decodes WAV/PPM (stdlib codecs above) into up to 256 uint8
    samples, and raises at the call site for library-dependent mimes
    (PNG/JPEG/MP4 — where PIL/av would slot in)."""

    def __init__(self, decode_stub: bool = True):
        self.decode_stub = decode_stub
        # real impl: import PIL / av here, once per actor
        self.decoded_batches = 0

    def _decode(self, payload: bytes, kind: str, mime: str = "") -> np.ndarray:
        if self.decode_stub:
            # deterministic fake: 16 uint8 'samples' from the payload hash
            h = hashlib.blake2b(payload, digest_size=16).digest()
            return np.frombuffer(h, dtype=np.uint8)
        if mime == "audio/wav":
            samples, _fr = decode_wav(payload)
            stride = max(1, samples.size // 256)
            return (
                (samples[::stride][:256].astype(np.int32) >> 8) + 128
            ).astype(np.uint8)
        if mime == "image/x-portable-pixmap":
            flat = decode_ppm(payload).reshape(-1)
            stride = max(1, flat.size // 256)
            return flat[::stride][:256]
        raise NotImplementedError(
            f"decoding {mime or kind} requires PIL/av/soundfile; "
            "not in this container"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.decoded_batches += 1
        feats = [
            self._decode(p, k, m)
            for p, k, m in zip(
                batch["payload"].to_pylist(),
                batch["kind"].to_pylist(),
                batch["mime"].to_pylist(),
            )
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "samples": pa.array([f.tolist() for f in feats],
                                    pa.list_(pa.uint8())),
                "payload_bytes": pa.array(
                    [len(p) for p in batch["payload"].to_pylist()], pa.int64()
                ),
            }
        )


def decode_media(
    ds: ray.data.Dataset, *, concurrency: int = 2, batch_size: int = 16,
    decode_stub: bool = True,
) -> ray.data.Dataset:
    """Decode stage as an actor pool (stateful setup amortized)."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"decode_stub": decode_stub},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_features(decoded: ray.data.Dataset) -> ray.data.Dataset:
    """Feature-extract stage over decoded samples (vectorized)."""

    def fn(batch: pa.Table) -> pa.Table:
        feats = batch["samples"].to_pylist()
        mean = [float(np.mean(f)) if f else 0.0 for f in feats]
        std = [float(np.std(f)) if f else 0.0 for f in feats]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feat_mean": pa.array(mean, pa.float64()),
                "feat_std": pa.array(std, pa.float64()),
            }
        )

    return decoded.map_batches(fn, batch_format="pyarrow")


class ImageResizer:
    """Actor-pool resize stage: decodes decodable images (PPM today;
    a real build adds PIL here), nearest-neighbor resizes to
    (width, height), re-encodes. Non-image and undecodable rows are
    dropped (the filter belongs upstream at scale; this stage names
    what it skipped in its output counts)."""

    def __init__(self, width: int, height: int):
        self.width = int(width)
        self.height = int(height)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, payloads = [], []
        for mid, kind, mime, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["mime"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "image" or mime != "image/x-portable-pixmap":
                continue
            resized = resize_nearest(decode_ppm(payload), self.width, self.height)
            mids.append(mid)
            payloads.append(encode_ppm(resized))
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "mime": pa.array(
                    ["image/x-portable-pixmap"] * len(mids), pa.string()
                ),
                "payload": pa.array(payloads, pa.large_binary()),
                "width": pa.array([self.width] * len(mids), pa.int32()),
                "height": pa.array([self.height] * len(mids), pa.int32()),
            }
        )


def resize_images(
    ds: ray.data.Dataset, width: int, height: int,
    *, concurrency: int = 2, batch_size: int = 16,
) -> ray.data.Dataset:
    """Resize stage as an actor pool (REAL work on PPM payloads)."""
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample_plan(ds: ray.data.Dataset, every_ms: int = 1000) -> ray.data.Dataset:
    """Frame-sampling stage for video rows: emits one row per planned
    frame timestamp (the decode of each frame is the stubbed part)."""

    def fn(batch: pa.Table) -> pa.Table:
        mid, ts = [], []
        for m, kind, dur in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            if kind != "video" or dur <= 0:
                continue
            for t in range(0, dur, every_ms):
                mid.append(m)
                ts.append(t)
        return pa.table(
            {"media_id": pa.array(mid, pa.int64()), "ts_ms": pa.array(ts, pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")
