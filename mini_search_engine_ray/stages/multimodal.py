"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a `media_type`
and metadata; decode / feature-extract / resize / frame-sample run as
actor-pool `map_batches` stages with SMALL batch sizes (a batch of
large binaries must fit the worker heap — size `batch_size` so
batch_size x payload x concurrency < worker memory).

The decode libraries (PIL / torchaudio / ffmpeg) are NOT in this
container, so the decoders are STUBS behind an import-try: with the
library absent, `strict=True` raises NotImplementedError, and the
default deterministic-fake mode derives features from a blake2b of the
payload — keeping the Ray-side plumbing (schema, actor signature,
batching, output layout) real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image/png, audio/wav, video/mp4 ...
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16


def synth_media_table(n: int, seed: int = 11) -> pa.Table:
    rng = np.random.default_rng(seed)
    types = ["image/png", "audio/wav", "video/mp4"]
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array([types[i % 3] for i in range(n)]),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "width": pa.array(rng.integers(16, 256, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 256, n).astype(np.int32)),
            "duration_ms": pa.array(rng.integers(0, 10_000, n).astype(np.int32)),
        }
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real encoder: blake2b -> floats."""
    h = hashlib.blake2b(payload, digest_size=dim).digest()
    return (np.frombuffer(h, dtype=np.uint8).astype(np.float32) - 127.5) / 127.5


class MediaFeatureExtract:
    """Actor-pool stage: payload -> feature vector.

    `__init__` loads the model/codec once per actor; `__call__` handles
    a batch. With no decode library available (this container), the
    deterministic fake path keeps the pipeline testable end to end.
    """

    def __init__(self, *, strict: bool = False, feature_dim: int = FEATURE_DIM) -> None:
        self.strict = strict
        self.feature_dim = feature_dim
        try:  # pragma: no cover - library not present in this container
            import PIL.Image  # noqa: F401

            self._has_decoder = True
        except ImportError:
            self._has_decoder = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and not self._has_decoder:
            raise NotImplementedError(
                "real media decoding requires an image/audio library not present "
                "in this environment; run with strict=False for deterministic fakes"
            )
        payloads = batch["payload"].to_pylist()
        feats = np.stack([_fake_features(p or b"", self.feature_dim) for p in payloads])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), self.feature_dim
                ),
                "payload_bytes": pa.array([len(p or b"") for p in payloads], type=pa.int64()),
            }
        )


def extract_media_features(ds, *, concurrency: int | tuple[int, int] = 2, batch_size: int = 32, strict: bool = False):
    """media Dataset -> feature Dataset (actor pool, small batches)."""
    return ds.map_batches(
        MediaFeatureExtract,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class MediaResize:
    """Actor-pool stage: image payload -> resized payload.

    Geometry math (aspect-preserving fit into target box) is real and
    tested; the pixel resampling itself is the deterministic fake
    (PIL absent in this container; `strict=True` raises). Non-image
    rows pass through untouched."""

    def __init__(self, target_w: int = 224, target_h: int = 224, *, strict: bool = False) -> None:
        self.tw, self.th = int(target_w), int(target_h)
        self.strict = strict
        # no real resampling path is implemented (PIL absent from this
        # container) — strict must ALWAYS raise, even if PIL happens to
        # be importable, so fake payloads can never masquerade as real
        self._has_decoder = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and not self._has_decoder:
            raise NotImplementedError("real image resizing requires PIL")
        import pyarrow.compute as pc

        w = pc.fill_null(batch["width"], 0).to_numpy(zero_copy_only=False).astype(np.float64)
        h = pc.fill_null(batch["height"], 0).to_numpy(zero_copy_only=False).astype(np.float64)
        is_img = np.asarray(
            [(t or "").startswith("image/") for t in batch["media_type"].to_pylist()]
        )
        scale = np.minimum(self.tw / np.maximum(w, 1), self.th / np.maximum(h, 1))
        new_w = np.where(is_img, np.maximum(1, np.round(w * scale)), w).astype(np.int32)
        new_h = np.where(is_img, np.maximum(1, np.round(h * scale)), h).astype(np.int32)
        payloads = batch["payload"].to_pylist()
        out_payloads = [
            hashlib.blake2b(
                (p or b"") + int(nw).to_bytes(4, "big") + int(nh).to_bytes(4, "big"),
                digest_size=32,
            ).digest()
            if img
            else (p or b"")
            for p, nw, nh, img in zip(payloads, new_w, new_h, is_img)
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "payload": pa.array(out_payloads, type=pa.large_binary()),
                "width": pa.array(new_w),
                "height": pa.array(new_h),
                "duration_ms": batch["duration_ms"],
            }
        )


class VideoFrameSample:
    """Actor-pool stage: video row -> n_frames frame rows (explode).

    Frame timestamps are evenly spaced over the clip (real math:
    t_i = duration * i / (n-1), endpoints included); frame payloads are
    the deterministic fake (ffmpeg absent; `strict=True` raises).
    Non-video rows are dropped — run on a filtered dataset or union the
    streams downstream."""

    def __init__(self, n_frames: int = 4, *, strict: bool = False) -> None:
        self.n_frames = max(1, int(n_frames))
        self.strict = strict
        self._has_decoder = False  # no ffmpeg in this container

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and not self._has_decoder:
            raise NotImplementedError("real frame sampling requires ffmpeg")
        ids, frames, t_ms, payloads = [], [], [], []
        rows = batch.to_pylist()
        for r in rows:
            if not (r["media_type"] or "").startswith("video/"):
                continue
            dur = int(r["duration_ms"] or 0)
            for i in range(self.n_frames):
                t = 0 if self.n_frames == 1 else round(dur * i / (self.n_frames - 1))
                ids.append(r["media_id"])
                frames.append(i)
                t_ms.append(t)
                payloads.append(
                    hashlib.blake2b(
                        (r["payload"] or b"") + int(t).to_bytes(4, "big"), digest_size=32
                    ).digest()
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(frames, pa.int32()),
                "t_ms": pa.array(t_ms, pa.int32()),
                "frame_payload": pa.array(payloads, type=pa.large_binary()),
            }
        )
