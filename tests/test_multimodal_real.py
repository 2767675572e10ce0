"""REAL multimodal decode kernels (stages/multimodal.py) — exercised
only where the decode library exists: PIL for image features/resize,
PyAV for video frame sampling. This container ships neither, so these
skip here and run wherever the libs are installed; the fake-path
plumbing is covered unconditionally in tests/test_extras.py."""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa
import pytest

from mini_search_engine_ray.stages.multimodal import (
    MediaFeatureExtract,
    MediaResize,
    VideoFrameSample,
)


def _media_row(payload: bytes, w: int, h: int, mt: str = "image/png", dur: int = 0) -> pa.Table:
    return pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "media_type": pa.array([mt]),
            "payload": pa.array([payload], pa.large_binary()),
            "width": pa.array([w], pa.int32()),
            "height": pa.array([h], pa.int32()),
            "duration_ms": pa.array([dur], pa.int32()),
        }
    )


def _png_payload(w: int, h: int, value: int) -> bytes:
    Image = pytest.importorskip("PIL.Image")
    buf = io.BytesIO()
    Image.new("L", (w, h), value).save(buf, format="PNG")
    return buf.getvalue()


def test_real_image_features_reflect_pixels():
    """strict=True with PIL present must use REAL pixels: a white image
    maps near +1 everywhere, a black one near -1 (the blake2b fake
    would give value-independent pseudo-noise)."""
    pytest.importorskip("PIL.Image")
    fe = MediaFeatureExtract(strict=True)
    fw = np.asarray(fe(_media_row(_png_payload(32, 32, 255), 32, 32))["feature"][0].as_py())
    fb = np.asarray(fe(_media_row(_png_payload(32, 32, 0), 32, 32))["feature"][0].as_py())
    assert np.all(fw > 0.98)
    assert np.all(fb < -0.98)


def test_real_resize_produces_decodable_png_with_exact_dims():
    Image = pytest.importorskip("PIL.Image")
    out = MediaResize(64, 48, strict=True)(
        _media_row(_png_payload(100, 50, 128), 100, 50)
    ).to_pylist()[0]
    assert (out["width"], out["height"]) == (64, 32)  # aspect-fit 100x50 -> 64x32
    img = Image.open(io.BytesIO(out["payload"]))
    assert img.size == (64, 32)


def test_real_resize_strict_raises_on_corrupt_payload():
    pytest.importorskip("PIL.Image")
    with pytest.raises(ValueError):
        MediaResize(64, 48, strict=True)(_media_row(b"not an image", 10, 10))
    # non-strict falls back to the deterministic fake
    out = MediaResize(64, 48)(_media_row(b"not an image", 10, 10)).to_pylist()[0]
    assert len(out["payload"]) == 32  # blake2b digest


def test_real_video_frame_sampling():
    av = pytest.importorskip("av")
    Image = pytest.importorskip("PIL.Image")
    buf = io.BytesIO()
    container = av.open(buf, "w", format="mp4")
    stream = container.add_stream("mpeg4", rate=4)
    stream.width = stream.height = 32
    stream.pix_fmt = "yuv420p"
    for i in range(4):
        frame = av.VideoFrame.from_ndarray(
            np.full((32, 32, 3), i * 60, np.uint8), format="rgb24"
        )
        for pkt in stream.encode(frame):
            container.mux(pkt)
    for pkt in stream.encode():
        container.mux(pkt)
    container.close()
    out = VideoFrameSample(n_frames=2, strict=True)(
        _media_row(buf.getvalue(), 32, 32, mt="video/mp4", dur=1000)
    )
    assert out.num_rows == 2
    assert out["t_ms"].to_pylist() == [0, 1000]
    for p in out["frame_payload"].to_pylist():
        Image.open(io.BytesIO(p))  # real decodable PNG frames
