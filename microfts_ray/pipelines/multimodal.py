"""Multimodal column plumbing: image/audio/video as opaque binary.

Treats media as `binary` payload columns with typed metadata, and
implements decode / feature-extract / resize / frame-sample as
actor-pool `map_batches` stages. The actual codec work is STUBBED
(this container ships no image/audio libraries): `decode_stub=True`
(default) runs a deterministic fake decoder so the Ray-side plumbing
— schema, batch sizing, actor lifecycle, output layout — is real and
tested; passing `decode_stub=False` raises NotImplementedError at the
decode call site, which is where a real library (PIL/av/soundfile)
would slot in.

Scale notes: media rows are big, so stages run with small
`batch_size` (payload x batch x concurrency must fit worker heaps)
and `concurrency=N` actor pools so per-actor init (codec setup, model
load) happens once, not per batch.
"""

from __future__ import annotations

import hashlib

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


def synthesize_media(n: int, seed: int = 99) -> pa.Table:
    """Deterministic fake media table for tests/demos: payload bytes
    derived from (seed, id); metadata consistent with `kind`."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
        kind = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        payload = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=32).digest()
        payload = (payload * (size // 32 + 1))[:size]
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "mime": {"image": "image/png", "audio": "audio/wav",
                         "video": "video/mp4"}[kind],
                "payload": payload,
                "width": int(rng.integers(16, 512)) if kind != "audio" else -1,
                "height": int(rng.integers(16, 512)) if kind != "audio" else -1,
                "duration_ms": int(rng.integers(1000, 60000)) if kind != "image" else -1,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class MediaDecoder:
    """Actor-pool decode stage: __init__ once per actor (codec setup),
    __call__ per batch. Stub decode derives a deterministic pixel/pcm
    digest from the payload; a real build replaces `_decode`."""

    def __init__(self, decode_stub: bool = True):
        self.decode_stub = decode_stub
        # real impl: import PIL / av here, once per actor
        self.decoded_batches = 0

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.decode_stub:
            raise NotImplementedError(
                "real media decode requires PIL/av/soundfile; not in this container"
            )
        # deterministic fake: 16 uint8 'samples' from the payload hash
        h = hashlib.blake2b(payload, digest_size=16).digest()
        return np.frombuffer(h, dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.decoded_batches += 1
        feats = [
            self._decode(p, k)
            for p, k in zip(batch["payload"].to_pylist(), batch["kind"].to_pylist())
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
