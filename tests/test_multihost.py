"""Multi-host frame-range sharding (parallel/multihost.py + the host-aware
segment pipeline). ffmpeg-free: IO legs are faked; the dither path is real.
"""

import numpy as np
import pytest

import dither_pie_tpu as dpt
from dither_pie_tpu.parallel.multihost import (host_segments, initialize,
                                               parse_shard)
from dither_pie_tpu.pipeline import ffio
from dither_pie_tpu.pipeline import resume as rz
from dither_pie_tpu.pipeline.video import VideoProcessor


def test_host_segments_strided():
    assert host_segments(7, 0, 2) == {0, 2, 4, 6}
    assert host_segments(7, 1, 2) == {1, 3, 5}
    assert host_segments(3, 0, 1) == {0, 1, 2}
    union = set()
    for k in range(3):
        part = host_segments(10, k, 3)
        assert not (union & part)
        union |= part
    assert union == set(range(10))
    with pytest.raises(ValueError):
        host_segments(5, 2, 2)


def test_parse_shard():
    assert parse_shard("0:4") == (0, 4)
    assert parse_shard("3:8") == (3, 8)
    for bad in ("4:4", "-1:2", "1", "a:b", "1:0"):
        with pytest.raises(ValueError):
            parse_shard(bad)


def test_initialize_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize() == (0, 1)


def test_per_host_manifests(tmp_path):
    out = str(tmp_path / "o.mp4")
    expect = {"input": "/a.mp4", "total_frames": 10}
    # fake part files for segments 0 and 1
    for i in (0, 1):
        open(rz.segment_part_path(out, i), "w").write("x")
    rz.save_manifest(out, expect, {0}, host_index=0)
    rz.save_manifest(out, expect, {1}, host_index=1)
    assert rz.load_manifest(out, expect, host_index=0) == {0}
    assert rz.load_manifest(out, expect, host_index=1) == {1}
    assert rz.load_all_manifests(out, expect, host_count=2) == {0, 1}
    # a manifest whose params mismatch is ignored
    assert rz.load_all_manifests(out, {"input": "/b.mp4"}, 2) == set()
    assert not rz.all_parts_present(out, 3)
    open(rz.segment_part_path(out, 2), "w").write("x")
    assert rz.all_parts_present(out, 3)


class _FakeWriter:
    """Stands in for ffio.FrameWriter: counts frames, creates the file."""

    def __init__(self, path, w, h, fps, **kw):
        self.path, self.n = path, 0

    def write(self, frame):
        self.n += 1

    def close(self):
        with open(self.path, "w") as f:
            f.write(f"{self.n}")
        return True


def _fake_io(monkeypatch, frames):
    h, w, _ = frames[0].shape
    monkeypatch.setattr(ffio, "ffmpeg_available", lambda: True)
    monkeypatch.setattr(ffio, "video_available", lambda: True)
    monkeypatch.setattr(
        ffio, "probe_video",
        lambda p: {"fps": 30.0, "width": w, "height": h,
                   "frame_count": len(frames), "duration": len(frames) / 30.0})
    monkeypatch.setattr(ffio, "read_frames",
                        lambda p, w_, h_: iter([f.copy() for f in frames]))


def test_two_host_segmented_flow(tmp_path, monkeypatch):
    """Host 0 processes its share (concat pending), host 1 finishes and the
    concat fires with every part present."""
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)
              for _ in range(10)]
    _fake_io(monkeypatch, frames)
    monkeypatch.setattr(ffio, "FrameWriter", _FakeWriter)

    concats = []

    def fake_concat(output_path, n_seg, source_path=None):
        assert rz.all_parts_present(output_path, n_seg)
        concats.append(n_seg)
        return True

    monkeypatch.setattr(rz, "concat_segments", fake_concat)

    d = dpt.ImageDitherer(num_colors=4, dither_mode=dpt.DitherMode.BAYER,
                          palette=[(0, 0, 0), (255, 0, 0), (0, 255, 0),
                                   (255, 255, 255)])
    out = str(tmp_path / "out.mp4")
    # 10 frames, segment_size 3 -> 4 segments; host 0 owns {0, 2}, host 1
    # owns {1, 3}.
    vp = VideoProcessor(batch_size=4)
    ok0 = vp.process_video_streaming(
        "in.mp4", out, d, segment_size=3, host_index=0, host_count=2)
    assert ok0 and not concats  # own share done, concat pending
    assert rz.load_all_manifests(
        out, {"input": __import__("os").path.abspath("in.mp4"), "fps": 30.0,
              "segment_size": 3, "total_frames": 10}, 2) == {0, 2}

    ok1 = vp.process_video_streaming(
        "in.mp4", out, d, segment_size=3, host_index=1, host_count=2)
    assert ok1 and concats == [4]
    # every segment's frame count landed in its part file
    sizes = [int(open(rz.segment_part_path(out, i)).read()) for i in range(4)]
    assert sizes == [3, 3, 3, 1]


def test_single_host_resume_still_concats(tmp_path, monkeypatch):
    """host_count=1 keeps the original semantics: concat right away."""
    rng = np.random.RandomState(1)
    frames = [rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)
              for _ in range(5)]
    _fake_io(monkeypatch, frames)
    monkeypatch.setattr(ffio, "FrameWriter", _FakeWriter)
    concats = []
    monkeypatch.setattr(rz, "concat_segments",
                        lambda o, n, source_path=None: concats.append(n) or True)

    d = dpt.ImageDitherer(num_colors=2, dither_mode=dpt.DitherMode.BAYER,
                          palette=[(0, 0, 0), (255, 255, 255)])
    out = str(tmp_path / "out.mp4")
    ok = vp_ok = VideoProcessor(batch_size=4).process_video_streaming(
        "in.mp4", out, d, resume=True, segment_size=2)
    assert ok and vp_ok and concats == [3]


def test_folder_sharding(tmp_path, monkeypatch):
    """--shard strides the folder batch's file list across hosts."""
    from PIL import Image

    from dither_pie_tpu.cli.main import process_folder

    src = tmp_path / "in"
    out = tmp_path / "out"
    src.mkdir()
    rng = np.random.RandomState(2)
    for i in range(5):
        Image.fromarray(rng.randint(0, 256, (16, 20, 3), dtype=np.uint8)
                        ).save(src / f"im{i}.png")
    cfg = {
        "input": str(src), "output": str(out), "mode": "folder",
        "pixelization": {"enabled": False, "method": "none", "max_size": 64},
        "dithering": {"enabled": True, "mode": "bayer", "parameters": {}},
        "palette": {"source": "median_cut", "num_colors": 4,
                    "use_gamma": False},
        "final_resize": {"enabled": False, "multiplier": 1},
    }
    assert process_folder(dict(cfg), host_index=0, host_count=2)
    done0 = {p.name for p in out.iterdir()}
    assert done0 == {"im0.png", "im2.png", "im4.png"}
    assert process_folder(dict(cfg), host_index=1, host_count=2)
    done = {p.name for p in out.iterdir()}
    assert done == {f"im{i}.png" for i in range(5)}
    # an out-of-range shard with no files still succeeds (empty share)
    assert process_folder(dict(cfg), host_index=4, host_count=5)


def test_auto_mesh_ed_batch_matches_single(monkeypatch):
    """The auto-mesh path (default ON with >1 device) shards the batch ED
    step over the 8 virtual CPU devices; outputs must be bit-identical to
    the single-device path, which DITHER_PIE_TPU_AUTO_MESH=0 forces
    (padding to the mesh size included: b=10 over 8 devices)."""
    frames = np.random.RandomState(5).randint(
        0, 256, (10, 24, 32, 3), dtype=np.uint8)
    pal = [(0, 0, 0), (255, 255, 255), (200, 40, 40), (30, 90, 200)]
    d = dpt.ImageDitherer(
        num_colors=4, dither_mode=dpt.DitherMode.ERROR_DIFFUSION,
        palette=list(pal), dither_params={"variant": "floyd_steinberg"})
    monkeypatch.setenv("DITHER_PIE_TPU_AUTO_MESH", "0")
    single = d.apply_dithering_batch(frames)
    monkeypatch.setenv("DITHER_PIE_TPU_AUTO_MESH", "1")
    sharded = d.apply_dithering_batch(frames)
    np.testing.assert_array_equal(sharded, single)


@pytest.mark.slow
def test_auto_mesh_dense_palette_shards(monkeypatch):
    """Palettes past the old 256 bail (packed kernel serves up to 1024)
    now shard too — exactly the slowest palettes stayed single-chip
    before (VERDICT r03 item 4)."""
    from dither_pie_tpu.parallel import auto

    frames = np.random.RandomState(8).randint(
        0, 256, (8, 16, 24, 3), dtype=np.uint8).astype(np.float32)
    pal = np.unique(np.random.RandomState(42).randint(0, 256, (700, 3)),
                    axis=0)[:300].astype(np.float32)
    monkeypatch.setenv("DITHER_PIE_TPU_AUTO_MESH", "1")
    sharded = auto.maybe_sharded_ed(frames, pal, "floyd_steinberg", "fixed")
    assert sharded is not None, "dense palette must not bail from the mesh"
    from dither_pie_tpu.ops import wavefront as wf

    monkeypatch.setenv("DITHER_PIE_TPU_AUTO_MESH", "0")
    single = wf.ed_batch_wavefront(frames.copy(), pal, "fixed",
                                   "floyd_steinberg")
    np.testing.assert_array_equal(sharded, single)


def test_auto_mesh_default_on_with_multiple_devices(monkeypatch):
    """With >1 local device and no env override, auto-mesh is the default
    (VERDICT r03 item 4); =0 opts out."""
    from dither_pie_tpu.parallel import auto

    monkeypatch.delenv("DITHER_PIE_TPU_AUTO_MESH", raising=False)
    assert auto._local_device_count() == 8  # conftest's virtual CPU mesh
    assert auto.auto_mesh_enabled()
    monkeypatch.setenv("DITHER_PIE_TPU_AUTO_MESH", "0")
    assert not auto.auto_mesh_enabled()
    monkeypatch.setenv("DITHER_PIE_TPU_AUTO_MESH", "1")
    assert auto.auto_mesh_enabled()


def test_auto_mesh_ordered_batch_matches_single(monkeypatch):
    """Auto-mesh ordered dither over the CPU-8 mesh is bit-identical; a
    non-divisible batch falls through to the single-device path."""
    frames = np.random.RandomState(6).randint(
        0, 256, (16, 24, 32, 3), dtype=np.uint8)
    pal = [(0, 0, 0), (255, 255, 255), (200, 40, 40), (30, 90, 200)]
    d = dpt.ImageDitherer(num_colors=4, dither_mode=dpt.DitherMode.BAYER,
                          palette=list(pal), dither_params={"size": "4x4"})
    monkeypatch.setenv("DITHER_PIE_TPU_AUTO_MESH", "0")
    single = d.apply_dithering_batch(frames)
    monkeypatch.setenv("DITHER_PIE_TPU_AUTO_MESH", "1")
    sharded = d.apply_dithering_batch(frames)
    np.testing.assert_array_equal(sharded, single)
    # non-divisible batch: falls through (still correct)
    odd = d.apply_dithering_batch(frames[:10])
    np.testing.assert_array_equal(odd, single[:10])


@pytest.mark.parametrize("mode,params", [
    ("ostromoukhov", {}),
    ("hybrid", {"lum_factor": 1.0, "col_factor": 0.2}),
    ("perceptual", {}),
    ("adaptive_variance", {"var_threshold": 100.0}),
    ("wavelet", {"wavelet": "haar", "subband_quant": 8}),
    ("halftone", {"cell_size": 4}),
])
def test_auto_mesh_covers_whole_strategy_surface(monkeypatch, mode, params):
    """Every batched strategy honors DITHER_PIE_TPU_AUTO_MESH=1
    bit-identically: ED modes (aux streams shard with their frames),
    wavelet, and halftone (VERDICT round-2 item 5)."""
    frames = np.random.RandomState(7).randint(
        0, 256, (10, 24, 32, 3), dtype=np.uint8)
    pal = [(0, 0, 0), (255, 255, 255), (200, 40, 40), (30, 90, 200)]
    d = dpt.ImageDitherer(num_colors=4, dither_mode=dpt.DitherMode(mode),
                          palette=list(pal), dither_params=dict(params))
    monkeypatch.setenv("DITHER_PIE_TPU_AUTO_MESH", "0")
    single = d.apply_dithering_batch(frames)
    monkeypatch.setenv("DITHER_PIE_TPU_AUTO_MESH", "1")
    sharded = d.apply_dithering_batch(frames)
    np.testing.assert_array_equal(sharded, single)
