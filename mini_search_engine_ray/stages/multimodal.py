"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a `media_type`
and metadata; decode / feature-extract / resize / frame-sample run as
actor-pool `map_batches` stages with SMALL batch sizes (a batch of
large binaries must fit the worker heap — size `batch_size` so
batch_size x payload x concurrency < worker memory).

Decode kernels are REAL when their library imports (PIL for image
decode/resize/features, PyAV for video frame sampling) and
deterministic fakes otherwise: each stage probes its library once per
actor in `__init__`; with the library absent, `strict=True` raises
NotImplementedError and the default mode derives outputs from a
blake2b of the payload — keeping the Ray-side plumbing (schema, actor
signature, batching, output layout) real and tested either way. This
container ships neither library, so the real paths are covered by
skip-marked tests (tests/test_multimodal_real.py) that run wherever
PIL/PyAV exist.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pyarrow as pa


def _try_import_pil():
    try:  # pragma: no cover - PIL not present in this container
        from PIL import Image

        return Image
    except ImportError:
        return None


def _try_import_av():
    try:  # pragma: no cover - PyAV not present in this container
        import av

        return av
    except ImportError:
        return None

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

    `__init__` probes the decode library once per actor; `__call__`
    handles a batch. REAL path (PIL importable): image payloads decode
    -> grayscale -> √dim × √dim grid resize -> pixels scaled to [-1,1]
    (a deterministic classical feature; swap in a model encoder the
    same way). Rows the real path can't handle (non-image media_type,
    corrupt payload) fall back to the deterministic blake2b fake —
    unless `strict=True`, which raises instead of faking (and raises
    NotImplementedError up front when no decoder exists at all).
    """

    def __init__(self, *, strict: bool = False, feature_dim: int = FEATURE_DIM) -> None:
        self.strict = strict
        self.feature_dim = feature_dim
        self._pil = _try_import_pil()
        self._has_decoder = self._pil is not None
        side = int(np.sqrt(feature_dim))
        self._grid = (side, max(1, feature_dim // side))

    def _real_image_features(self, payload: bytes) -> np.ndarray:
        img = self._pil.open(io.BytesIO(payload)).convert("L")
        img = img.resize(self._grid)
        px = np.asarray(img, dtype=np.float32).reshape(-1)[: self.feature_dim]
        if len(px) < self.feature_dim:  # degenerate grid (non-square dim)
            px = np.pad(px, (0, self.feature_dim - len(px)))
        return (px - 127.5) / 127.5

    def _features(self, payload: bytes, media_type: str) -> np.ndarray:
        if self._has_decoder and media_type.startswith("image/"):
            try:
                return self._real_image_features(payload)
            except Exception:
                if self.strict:
                    raise ValueError("strict media decode failed") from None
        elif self.strict:
            raise NotImplementedError(
                "strict feature extraction for non-image media requires an "
                "audio/video decoder not present in this environment"
            )
        return _fake_features(payload, self.feature_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and not self._has_decoder:
            raise NotImplementedError(
                "real media decoding requires an image/audio library not present "
                "in this environment; run with strict=False for deterministic fakes"
            )
        if batch.num_rows == 0:  # np.stack([]) raises on empty blocks
            return pa.table({
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "feature": pa.array([], pa.list_(pa.float64(), self.feature_dim)),
                "payload_bytes": pa.array([], pa.int64()),
            })
        payloads = batch["payload"].to_pylist()
        types = batch["media_type"].to_pylist()
        feats = np.stack(
            [self._features(p or b"", mt or "") for p, mt in zip(payloads, types)]
        )
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
    tested in all modes. REAL pixel path (PIL importable): decode ->
    `resize((new_w, new_h))` -> re-encode PNG. Without PIL (this
    container) — or when a payload won't decode in non-strict mode —
    the resampled payload is the deterministic fake (blake2b of
    payload+dims); `strict=True` raises rather than fake. Non-image
    rows pass through untouched."""

    def __init__(self, target_w: int = 224, target_h: int = 224, *, strict: bool = False) -> None:
        self.tw, self.th = int(target_w), int(target_h)
        self.strict = strict
        self._pil = _try_import_pil()
        self._has_decoder = self._pil is not None

    def _resize_payload(self, payload: bytes, nw: int, nh: int) -> bytes:
        if self._has_decoder:
            try:
                img = self._pil.open(io.BytesIO(payload)).resize((int(nw), int(nh)))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                return buf.getvalue()
            except Exception:
                if self.strict:
                    raise ValueError("strict image resize failed") from None
        return hashlib.blake2b(
            payload + int(nw).to_bytes(4, "big") + int(nh).to_bytes(4, "big"),
            digest_size=32,
        ).digest()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and not self._has_decoder:
            raise NotImplementedError("real image resizing requires PIL")
        import pyarrow.compute as pc

        w = pc.fill_null(batch["width"], 0).to_numpy(zero_copy_only=False).astype(np.float64)
        h = pc.fill_null(batch["height"], 0).to_numpy(zero_copy_only=False).astype(np.float64)
        # image rows need KNOWN dims for the aspect-fit math; a row
        # with null/zero metadata dims must pass through untouched, not
        # be "resized" to 1x1 (silent data destruction)
        has_dims = (w > 0) & (h > 0)
        is_img = np.asarray(
            [(t or "").startswith("image/") for t in batch["media_type"].to_pylist()]
        ) & has_dims
        scale = np.minimum(self.tw / np.maximum(w, 1), self.th / np.maximum(h, 1))
        new_w = np.where(is_img, np.maximum(1, np.round(w * scale)), w).astype(np.int32)
        new_h = np.where(is_img, np.maximum(1, np.round(h * scale)), h).astype(np.int32)
        payloads = batch["payload"].to_pylist()
        out_payloads = [
            self._resize_payload(p or b"", nw, nh) if img else (p or b"")
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
    t_i = duration * i / (n-1), endpoints included). REAL decode path
    (PyAV importable): open the container, decode the stream once,
    keep the frame nearest each target timestamp, re-encode PNG.
    Without PyAV (this container) — or on undecodable payloads in
    non-strict mode — frame payloads are the deterministic fake;
    `strict=True` raises. Non-video rows are dropped — run on a
    filtered dataset or union the streams downstream."""

    def __init__(self, n_frames: int = 4, *, strict: bool = False) -> None:
        self.n_frames = max(1, int(n_frames))
        self.strict = strict
        self._av = _try_import_av()
        self._has_decoder = self._av is not None

    def _timestamps(self, dur: int) -> list[int]:
        if self.n_frames == 1:
            return [0]
        return [round(dur * i / (self.n_frames - 1)) for i in range(self.n_frames)]

    def _real_frames(self, payload: bytes, targets_ms: list[int]) -> list[bytes]:
        """One sequential decode pass, keeping ONLY the current-nearest
        frame per target (O(n_targets) frames resident — buffering the
        whole clip would hold every uncompressed plane in memory: a
        2-minute 1080p30 clip is ~10 GB)."""
        container = self._av.open(io.BytesIO(payload))
        stream = container.streams.video[0]
        best: list[tuple[float, object] | None] = [None] * len(targets_ms)
        any_frame = False
        for frame in container.decode(stream):
            any_frame = True
            t_ms = float(frame.pts * stream.time_base * 1000) if frame.pts is not None else 0.0
            for i, tgt in enumerate(targets_ms):
                d = abs(t_ms - tgt)
                if best[i] is None or d < best[i][0]:
                    best[i] = (d, frame)
        if not any_frame:
            raise ValueError("no decodable video frames")
        out = []
        for b in best:
            buf = io.BytesIO()
            b[1].to_image().save(buf, format="PNG")
            out.append(buf.getvalue())
        return out

    def _frames(self, payload: bytes, targets_ms: list[int]) -> list[bytes]:
        if self._has_decoder:
            try:
                return self._real_frames(payload, targets_ms)
            except Exception:
                if self.strict:
                    raise ValueError("strict video decode failed") from None
        return [
            hashlib.blake2b(payload + int(t).to_bytes(4, "big"), digest_size=32).digest()
            for t in targets_ms
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and not self._has_decoder:
            raise NotImplementedError("real frame sampling requires PyAV/ffmpeg")
        ids, frames, t_ms, payloads = [], [], [], []
        rows = batch.to_pylist()
        for r in rows:
            if not (r["media_type"] or "").startswith("video/"):
                continue
            targets = self._timestamps(int(r["duration_ms"] or 0))
            fps = self._frames(r["payload"] or b"", targets)
            for i, (t, fp) in enumerate(zip(targets, fps)):
                ids.append(r["media_id"])
                frames.append(i)
                t_ms.append(t)
                payloads.append(fp)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(frames, pa.int32()),
                "t_ms": pa.array(t_ms, pa.int32()),
                "frame_payload": pa.array(payloads, type=pa.large_binary()),
            }
        )
