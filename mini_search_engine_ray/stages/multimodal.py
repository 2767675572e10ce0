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
