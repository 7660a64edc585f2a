"""End-to-end video pipeline test through the OpenCV backend (this
environment has no ffmpeg; production uses ffmpeg rawvideo pipes with the
same frame flow)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dither_pie_tpu.pipeline import ffio
from dither_pie_tpu.pipeline.video import VideoProcessor, process_single_video
import dither_pie_tpu as dpt


@pytest.fixture()
def synth_video(tmp_path):
    """20-frame 64x48 moving-gradient clip."""
    path = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12.0, (64, 48))
    assert w.isOpened()
    for t in range(20):
        y = np.linspace(0, 255, 48, dtype=np.float32)[:, None]
        x = np.linspace(0, 255, 64, dtype=np.float32)[None, :]
        frame = np.stack([
            np.broadcast_to((x + 3 * t) % 256, (48, 64)),
            np.broadcast_to(y, (48, 64)),
            np.full((48, 64), (t * 10) % 256, np.float32),
        ], axis=-1).astype(np.uint8)
        w.write(frame[:, :, ::-1])
    w.release()
    return path


def test_probe_and_read(synth_video):
    info = ffio.probe_video(synth_video)
    assert (info["width"], info["height"]) == (64, 48)
    assert info["frame_count"] == 20
    frames = list(ffio.read_frames(synth_video, 64, 48))
    assert len(frames) == 20
    assert frames[0].shape == (48, 64, 3)
    single = ffio.read_single_frame(synth_video, 5)
    np.testing.assert_array_equal(single, frames[5])


def test_video_pipeline_end_to_end(synth_video, tmp_path):
    out = str(tmp_path / "out.mp4")
    d = dpt.ImageDitherer(
        num_colors=8, dither_mode=dpt.DitherMode.BAYER,
        palette=[(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 255, 0),
                 (0, 0, 255), (255, 255, 0), (0, 255, 255), (255, 0, 255)])
    progress = []
    proc = VideoProcessor(progress_callback=lambda f, m: progress.append((f, m)))
    ok = proc.process_video_streaming(synth_video, out, d, batch_size=6)
    assert ok
    info = ffio.probe_video(out)
    assert info["frame_count"] == 20
    assert (info["width"], info["height"]) == (64, 48)
    assert progress and progress[-1][0] == 1.0


def test_video_pipeline_with_pixelize_and_resize(synth_video, tmp_path):
    out = str(tmp_path / "out2.mp4")
    d = dpt.ImageDitherer(num_colors=4, dither_mode=dpt.DitherMode.NONE,
                          palette=[(0, 0, 0), (85, 85, 85), (170, 170, 170),
                                   (255, 255, 255)])
    proc = VideoProcessor()
    ok = proc.process_video_streaming(
        synth_video, out, d, pixelize_func=("regular", 24),
        final_resize_multiplier=2)
    assert ok
    info = ffio.probe_video(out)
    # 64x48 -> pixelize(24): h=24, w=32 -> x2 = 64x48
    assert (info["width"], info["height"]) == (64, 48)
    assert info["frame_count"] == 20


def test_process_single_video_config(synth_video, tmp_path):
    out = tmp_path / "cfg_out.mp4"
    config = {
        "input": synth_video,
        "output": str(out),
        "mode": "video",
        "pixelization": {"enabled": False, "method": "regular", "max_size": 64},
        "dithering": {"enabled": True, "mode": "error_diffusion",
                      "parameters": {"variant": "floyd_steinberg",
                                     "serpentine": "false"}},
        "palette": {"source": "median_cut", "num_colors": 8,
                    "use_gamma": False},
        "final_resize": {"enabled": False, "multiplier": 2},
    }
    assert process_single_video(config)
    assert out.exists() and out.stat().st_size > 0
    assert ffio.probe_video(str(out))["frame_count"] == 20


def test_planar_flow_matches_interleaved(synth_video, tmp_path, monkeypatch):
    """The auto-selected planar (channel-major) flow must produce the same
    encoded video as the interleaved flow: same kernels, zero-copy layout.
    Forces the wavefront backend (CPU hosts default to the native engine,
    where no planar kernel exists and the flow correctly stays NHWC)."""
    monkeypatch.setenv("DITHER_PIE_TPU_ED_BACKEND", "wavefront")
    pal = [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 255, 0),
           (0, 0, 255), (255, 255, 0), (0, 255, 255), (255, 0, 255)]
    d = dpt.ImageDitherer(
        num_colors=8, dither_mode=dpt.DitherMode.ERROR_DIFFUSION,
        palette=pal, dither_params={"variant": "floyd_steinberg"})
    assert d.supports_planar_batch()

    out_p = str(tmp_path / "planar.mp4")
    hits = {"planar": 0}
    orig = ffio.read_frames_planar
    monkeypatch.setattr(ffio, "read_frames_planar",
                        lambda *a, **k: hits.__setitem__("planar", 1) or orig(*a, **k))
    assert VideoProcessor().process_video_streaming(synth_video, out_p, d,
                                                    batch_size=6)
    assert hits["planar"] == 1  # the zero-copy flow actually engaged

    out_n = str(tmp_path / "nhwc.mp4")
    monkeypatch.setattr(dpt.ImageDitherer, "supports_planar_batch",
                        lambda self: False)
    assert VideoProcessor().process_video_streaming(synth_video, out_n, d,
                                                    batch_size=6)

    ca, cb = cv2.VideoCapture(out_p), cv2.VideoCapture(out_n)
    n = 0
    while True:
        ra, fa = ca.read()
        rb, fb = cb.read()
        assert ra == rb
        if not ra:
            break
        np.testing.assert_array_equal(fa, fb)
        n += 1
    assert n == 20
