"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The sandbox has no codec libraries, so the DECODE kernels are stubbed behind
import-guards (brief instruction: make the Ray-side plumbing — schema, actor
signature, batch sizing, output layout — real and tested, fake the pixels).

Design for 100 TB:
- media rows are wide → small ``batch_size`` (payload × batch × concurrency
  must fit worker heap; batch sized for worker heap),
- decode/feature stages are ACTOR POOLS (model/codec loaded once per actor),
- outputs are fixed-width feature columns, never re-encoded payloads.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data


MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.large_binary()),   # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),            # typed metadata travels with the blob
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def media_dataset_from_corpus(n_rows: int, seed: int = 7) -> "ray.data.Dataset":
    """Deterministic fake media table with realistic payload sizes."""
    from ..kernels.hashing import splitmix64
    h = splitmix64(n_rows, seed=seed)
    kinds = np.array(["image", "audio", "video"])[(h % np.uint64(3)).astype(int)]
    sizes = (h % np.uint64(4096) + np.uint64(256)).astype(np.int64)
    payloads = [bytes(hashlib.sha256(int(v).to_bytes(8, "little")).digest()
                      * (int(s) // 32 + 1))[:int(s)]
                for v, s in zip(h.tolist(), sizes.tolist())]
    tbl = pa.table({
        "media_id": pa.array(np.arange(n_rows, dtype=np.int64)),
        "kind": pa.array(kinds.tolist()),
        "payload": pa.array(payloads, pa.large_binary()),
        "mime": pa.array(["application/octet-stream"] * n_rows),
        "width": pa.array(((h >> np.uint64(8)) % np.uint64(1920)).astype(np.int32)),
        "height": pa.array(((h >> np.uint64(20)) % np.uint64(1080)).astype(np.int32)),
        "duration_ms": pa.array(((h >> np.uint64(32)) % np.uint64(60000)).astype(np.int32)),
    })
    return ray.data.from_arrow(tbl)


class ImageDecoder:
    """Actor-pool decode/feature stage.

    With a real codec (PIL): decode → resize → channel-mean features.
    In this sandbox: a deterministic fake (sha256-derived "pixels") keeps the
    schema, sizing and actor lifecycle identical so pipelines are testable;
    pass ``strict=True`` to surface NotImplementedError instead.
    """

    def __init__(self, target_size: int = 32, strict: bool = False):
        self._size = target_size
        self._strict = strict
        try:
            from PIL import Image  # noqa: F401  (absent in this container)
            self._pil = True
        except ImportError:
            self._pil = False
        if strict and not self._pil:
            raise NotImplementedError(
                "image decode requires PIL; not available in this environment")

    def _fake_pixels(self, payload: bytes) -> np.ndarray:
        d = hashlib.sha256(payload).digest()
        raw = np.frombuffer((d * ((self._size * self._size * 3) // 32 + 1))
                            [:self._size * self._size * 3], dtype=np.uint8)
        return raw.reshape(self._size, self._size, 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.empty((len(payloads), 3), dtype=np.float64)
        for i, p in enumerate(payloads):
            px = self._fake_pixels(p or b"")
            feats[i] = px.mean(axis=(0, 1))
        out = batch.drop_columns(["payload"])  # features out, blobs dropped
        out = out.append_column("feat_r", pa.array(feats[:, 0]))
        out = out.append_column("feat_g", pa.array(feats[:, 1]))
        out = out.append_column("feat_b", pa.array(feats[:, 2]))
        return out


class FrameSampler:
    """Video frame-sampling stub: emits ``n_frames`` rows per video row with
    deterministic frame offsets — the flat_map-shaped stage a real pipeline
    uses before per-frame decode."""

    def __init__(self, n_frames: int = 4):
        self._n = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        dur = batch.column("duration_ms").to_numpy(zero_copy_only=False)
        rep_ids = np.repeat(ids, self._n)
        frame_idx = np.tile(np.arange(self._n, dtype=np.int32), len(ids))
        offsets = (np.repeat(dur, self._n) * (frame_idx + 1) // (self._n + 1))
        return pa.table({
            "media_id": pa.array(rep_ids),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "offset_ms": pa.array(offsets.astype(np.int32), pa.int32()),
        })


def decode_images(ds: "ray.data.Dataset", concurrency: int = 2,
                  batch_size: int = 256, strict: bool = False) -> "ray.data.Dataset":
    """Image decode pipeline: actor pool, small batches (wide binary rows)."""
    return ds.map_batches(ImageDecoder, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={"strict": strict})
