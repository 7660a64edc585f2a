"""Pipeline + CLI tests: config validation, image pipeline end-to-end,
video frame streaming (synthetic source — no ffmpeg needed), batch API."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

import dither_pie_tpu as dpt
from dither_pie_tpu.api.config import (ConfigValidationError, detect_mode,
                                       load_config)
from dither_pie_tpu.pipeline.image import process_single_image
from dither_pie_tpu.pipeline.video import process_frames


@pytest.fixture()
def tmp_image(tmp_path):
    rng = np.random.RandomState(3)
    p = tmp_path / "in.png"
    Image.fromarray(rng.randint(0, 256, (40, 60, 3), dtype=np.uint8)).save(p)
    return p


def _write_config(tmp_path, cfg):
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg))
    return p


class TestConfig:
    def test_missing_fields(self, tmp_path):
        p = _write_config(tmp_path, {})
        with pytest.raises(ConfigValidationError) as e:
            load_config(p)
        assert "input" in str(e.value) and "output" in str(e.value)

    def test_invalid_mode_and_dither(self, tmp_path, tmp_image):
        p = _write_config(tmp_path, {
            "input": str(tmp_image), "output": "out.png",
            "mode": "bogus", "dithering": {"mode": "nope"},
            "palette": {"num_colors": -1},
        })
        with pytest.raises(ConfigValidationError) as e:
            load_config(p)
        msg = str(e.value)
        assert "Invalid mode" in msg
        assert "Invalid dither mode" in msg
        assert "num_colors" in msg

    def test_defaults_and_relative_paths(self, tmp_path, tmp_image):
        p = _write_config(tmp_path, {"input": "in.png", "output": "sub/out.png"})
        cfg = load_config(p)
        assert cfg["input"] == str(tmp_image)
        assert cfg["output"].endswith(os.path.join("sub", "out.png"))
        assert cfg["dithering"]["mode"] == "bayer"
        assert cfg["palette"]["num_colors"] == 16
        assert cfg["final_resize"] == {"enabled": False, "multiplier": 2}

    def test_missing_input_rejected(self, tmp_path):
        p = _write_config(tmp_path, {"input": "nope.png", "output": "o.png"})
        with pytest.raises(ConfigValidationError, match="not found"):
            load_config(p)

    def test_custom_palette_source_accepted(self, tmp_path, tmp_image):
        p = _write_config(tmp_path, {
            "input": "in.png", "output": "o.png",
            "palette": {"source": "gb_dmg_palette"},
        })
        cfg = load_config(p)
        assert cfg["palette"]["source"] == "gb_dmg_palette"

    def test_unknown_section_warns(self, tmp_path, tmp_image, caplog):
        # Beats the reference's silent fallback (dither_cli.py:191-341): a
        # misspelled "dither" section must produce a visible warning.
        p = _write_config(tmp_path, {
            "input": "in.png", "output": "o.png",
            "dither": {"mode": "bayer"},          # typo for "dithering"
            "palette": {"source": "median_cut", "n_colors": 8},  # typo key
        })
        import logging
        with caplog.at_level(logging.WARNING, logger="dither_pie_tpu.api.config"):
            cfg = load_config(p)
        msg = " ".join(r.message for r in caplog.records)
        assert "'dither'" in msg and "'palette.n_colors'" in msg
        # Still non-fatal: defaults applied as before.
        assert cfg["dithering"]["mode"] == "bayer"

    def test_known_config_no_warning(self, tmp_path, tmp_image, caplog):
        p = _write_config(tmp_path, {
            "input": "in.png", "output": "o.png",
            "dithering": {"enabled": True, "mode": "bayer", "parameters": {}},
            "palette": {"source": "median_cut", "num_colors": 8,
                        "use_gamma": False},
        })
        import logging
        with caplog.at_level(logging.WARNING, logger="dither_pie_tpu.api.config"):
            load_config(p)
        assert not caplog.records

    def test_comment_keys_do_not_warn(self, tmp_path, tmp_image, caplog):
        # Underscore-prefixed keys are the comment convention every shipped
        # example uses ("_comment"); warning on them would train users to
        # ignore the typo warning.
        p = _write_config(tmp_path, {
            "_comment": "annotation", "input": "in.png", "output": "o.png",
            "dithering": {"_note": "inner annotation", "enabled": True,
                          "mode": "bayer", "parameters": {}},
        })
        import logging
        with caplog.at_level(logging.WARNING, logger="dither_pie_tpu.api.config"):
            load_config(p)
        assert not caplog.records

    def test_detect_mode(self, tmp_path, tmp_image):
        assert detect_mode(tmp_image) == "image"
        assert detect_mode(tmp_path) == "folder"
        v = tmp_path / "x.mp4"
        v.touch()
        assert detect_mode(v) == "video"
        bad = tmp_path / "x.xyz"
        bad.touch()
        with pytest.raises(ConfigValidationError):
            detect_mode(bad)


class TestImagePipeline:
    def test_end_to_end(self, tmp_path, tmp_image):
        out = tmp_path / "out" / "result.png"
        cfg = load_config(_write_config(tmp_path, {
            "input": "in.png", "output": str(out),
            "pixelization": {"enabled": True, "method": "regular", "max_size": 32},
            "dithering": {"enabled": True, "mode": "bayer",
                          "parameters": {"size": "4x4"}},
            "palette": {"source": "median_cut", "num_colors": 8},
            "final_resize": {"enabled": True, "multiplier": 2},
        }))
        assert process_single_image(cfg)
        img = np.array(Image.open(out))
        # 40x60 -> pixelize(max 32): smaller side ~32 -> 32x48, x2 resize
        assert img.shape == (64, 96, 3)
        assert len(np.unique(img.reshape(-1, 3), axis=0)) <= 8

    def test_custom_palette_overrides_num_colors(self, tmp_path, tmp_image):
        out = tmp_path / "o.png"
        cfg = load_config(_write_config(tmp_path, {
            "input": "in.png", "output": str(out),
            "dithering": {"enabled": True, "mode": "none"},
            "palette": {"source": "gb_dmg_palette", "num_colors": 99},
        }))
        assert process_single_image(cfg)
        img = np.array(Image.open(out))
        assert len(np.unique(img.reshape(-1, 3), axis=0)) <= 4  # gb_dmg has 4


class TestVideoFrames:
    def _frames(self, n=10, h=24, w=32):
        rng = np.random.RandomState(0)
        for _ in range(n):
            yield rng.randint(0, 256, (h, w, 3), dtype=np.uint8)

    def test_process_frames_stream(self):
        d = dpt.ImageDitherer(
            num_colors=4, dither_mode=dpt.DitherMode.BAYER,
            palette=[(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 0, 255)])
        outs = list(process_frames(self._frames(), d, batch_size=4))
        assert len(outs) == 10
        for o in outs:
            assert o.shape == (24, 32, 3) and o.dtype == np.uint8
            assert len(np.unique(o.reshape(-1, 3), axis=0)) <= 4

    def test_process_frames_matches_single(self):
        pal = [(0, 0, 0), (255, 255, 255), (0, 255, 0), (255, 0, 255)]
        d = dpt.ImageDitherer(num_colors=4, dither_mode=dpt.DitherMode.BAYER,
                              palette=list(pal))
        frames = list(self._frames(6))
        outs = list(process_frames(iter(frames), d, batch_size=3))
        for f, o in zip(frames, outs):
            single = dpt.ImageDitherer(
                num_colors=4, dither_mode=dpt.DitherMode.BAYER,
                palette=list(pal)).apply_dithering_array(f)
            np.testing.assert_array_equal(o, single)

    def test_final_resize_and_pixelize(self):
        d = dpt.ImageDitherer(num_colors=2, dither_mode=dpt.DitherMode.NONE,
                              palette=[(0, 0, 0), (255, 255, 255)])
        outs = list(process_frames(self._frames(3), d,
                                   pixelize_func=("regular", 16),
                                   final_resize_multiplier=3, batch_size=2))
        # 24x32 -> even-dims pixelize(16): h=16, w=22 (round(32/24*16)=21->22); x3 -> pad to even
        assert all(o.shape[0] % 2 == 0 and o.shape[1] % 2 == 0 for o in outs)

    def test_neural_video_batch_path(self, monkeypatch):
        """Neural video pixelization runs BATCHED on device (one forward per
        frame batch) and matches the per-frame facade output."""
        from dither_pie_tpu.models.inference import PixelizationModel
        from dither_pie_tpu.models.pixelizer import NeuralPixelizer
        from dither_pie_tpu.pipeline import pixelize as pixmod

        model = PixelizationModel()
        model.load_random(0)
        npix = NeuralPixelizer.__new__(NeuralPixelizer)
        npix._model = model
        monkeypatch.setattr(pixmod, "_neural_singleton", npix)

        calls = []
        orig = model.forward_u8

        def counting_forward(in_t, precision=None, **kw):
            calls.append(in_t.shape[0])
            return orig(in_t, precision=precision, **kw)

        monkeypatch.setattr(model, "forward_u8", counting_forward)

        d = dpt.ImageDitherer(
            num_colors=4, dither_mode=dpt.DitherMode.BAYER,
            palette=[(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 0, 255)])
        frames = list(self._frames(6, h=32, w=40))
        outs = list(process_frames(iter(frames), d,
                                   pixelize_func=("neural", 16),
                                   batch_size=3))
        assert len(outs) == 6
        # two batches of 3 -> batched forwards only, no per-frame fan-out
        # (the FIRST batch runs three times: f32-vs-bf16 parity gate +
        # the strided-ds4 candidate gate).
        assert calls == [3, 3, 3, 3]
        single = np.array(npix.pixelize(Image.fromarray(frames[0]), 16)
                          .convert("RGB"))
        batched = np.array(npix.pixelize_batch(
            [Image.fromarray(f) for f in frames[:3]], 16)[0].convert("RGB"))
        np.testing.assert_allclose(batched.astype(np.int16),
                                   single.astype(np.int16), atol=1)

    def test_overlap_matches_serial(self):
        """The pipelined (two-in-flight) path must emit the exact same
        frames in the exact same order as the serialized path."""
        pal = [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 0, 255)]
        frames = list(self._frames(11))
        d1 = dpt.ImageDitherer(num_colors=4, dither_mode=dpt.DitherMode.BAYER,
                               palette=list(pal))
        d2 = dpt.ImageDitherer(num_colors=4, dither_mode=dpt.DitherMode.BAYER,
                               palette=list(pal))
        a = list(process_frames(iter(frames), d1, batch_size=3, overlap=True))
        b = list(process_frames(iter(frames), d2, batch_size=3, overlap=False))
        assert len(a) == len(b) == 11
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_overlap_patches_failed_frames(self, monkeypatch):
        """Retry/patch semantics survive the pipelined path."""
        pal = [(0, 0, 0), (255, 255, 255)]
        d = dpt.ImageDitherer(num_colors=2, dither_mode=dpt.DitherMode.NONE,
                              palette=list(pal))
        frames = list(self._frames(8))
        orig = d.apply_dithering_batch

        def flaky(stacked, **kw):
            # Fail the second BATCH (frames 2-3) — keyed on content, not
            # call order: overlap=True runs batches on two pool threads,
            # so under CPU contention "the second call" can be batch 1
            # or batch 3 (observed flaking in a loaded full-suite run).
            if np.array_equal(stacked[0], frames[2]):
                raise RuntimeError("boom")
            return orig(stacked, **kw)

        monkeypatch.setattr(d, "apply_dithering_batch", flaky)
        outs = list(process_frames(iter(frames), d, batch_size=2,
                                   retries=0, overlap=True))
        # batch 2's frames are patched from the nearest good frame
        assert len(outs) == 8
        np.testing.assert_array_equal(outs[2], outs[1])
        np.testing.assert_array_equal(outs[3], outs[1])

    def test_ed_batch_stream(self, monkeypatch):
        monkeypatch.setenv("DITHER_PIE_TPU_ED_BACKEND", "native")
        d = dpt.ImageDitherer(
            num_colors=3, dither_mode=dpt.DitherMode.ERROR_DIFFUSION,
            palette=[(0, 0, 0), (128, 128, 128), (255, 255, 255)],
            dither_params={"variant": "floyd_steinberg"})
        outs = list(process_frames(self._frames(5), d, batch_size=2))
        assert len(outs) == 5

    def test_index_transfer_matches_rgb_path(self, monkeypatch):
        """Forced index transfer (1 byte/pixel D2H + host palette gather)
        must be bit-identical to the RGB output path — with and without
        the gamma fold (gamma maps fold into the palette exactly because
        output pixels only take palette values)."""
        monkeypatch.setenv("DITHER_PIE_TPU_ED_BACKEND", "wavefront")
        pal = [(0, 0, 0), (250, 250, 250), (200, 40, 40), (30, 90, 200)]
        frames = np.stack(list(self._frames(3)))
        cases = [(dpt.DitherMode.ERROR_DIFFUSION,
                  {"variant": "floyd_steinberg"}, False),
                 (dpt.DitherMode.ERROR_DIFFUSION,
                  {"variant": "floyd_steinberg"}, True),
                 (dpt.DitherMode.BAYER, {"size": "4x4"}, False),
                 (dpt.DitherMode.NONE, {}, False),
                 (dpt.DitherMode.WAVELET,
                  {"wavelet": "haar", "subband_quant": 6, "seed": 3}, False),
                 (dpt.DitherMode.HALFTONE,
                  {"cell_size": 4, "angle": 30.0}, False)]
        for mode, params, gamma in cases:
            d = dpt.ImageDitherer(
                num_colors=4, dither_mode=mode,
                palette=list(pal), use_gamma=gamma, dither_params=params)
            monkeypatch.setenv("DITHER_PIE_TPU_INDEX_TRANSFER", "0")
            rgb = d.apply_dithering_batch(frames.copy())
            monkeypatch.setenv("DITHER_PIE_TPU_INDEX_TRANSFER", "1")
            via_idx = d.apply_dithering_batch(frames.copy())
            np.testing.assert_array_equal(via_idx, rgb, err_msg=str(mode))

    def test_none_batch_matches_single(self):
        """Mode none batches route through the fused ordered kernel with a
        saturated screen — must be bit-identical to the per-frame
        map_to_palette path."""
        pal = [(0, 0, 0), (250, 250, 250), (200, 40, 40), (30, 90, 200)]
        frames = list(self._frames(4))
        d = dpt.ImageDitherer(num_colors=4, dither_mode=dpt.DitherMode.NONE,
                              palette=list(pal))
        batch = d.apply_dithering_batch(np.stack(frames))
        for i, f in enumerate(frames):
            single = d.apply_dithering_array(f)
            np.testing.assert_array_equal(batch[i], single)

    def test_linkspeed_env_and_cpu_probe(self, monkeypatch):
        """Env var forces the stream choice; the CPU backend has no link,
        so the probe reports None and the auto choice stays off."""
        from dither_pie_tpu.api import linkspeed

        monkeypatch.setenv("DITHER_PIE_TPU_INDEX_TRANSFER", "1")
        assert linkspeed.index_transfer_wins()
        monkeypatch.setenv("DITHER_PIE_TPU_INDEX_TRANSFER", "0")
        assert not linkspeed.index_transfer_wins()
        monkeypatch.delenv("DITHER_PIE_TPU_INDEX_TRANSFER")
        assert linkspeed.d2h_bandwidth_mb_s() is None
        assert not linkspeed.index_transfer_wins()

    def test_index_transfer_planar(self, monkeypatch):
        """Planar frames through the index path come back planar."""
        monkeypatch.setenv("DITHER_PIE_TPU_ED_BACKEND", "wavefront")
        pal = [(0, 0, 0), (250, 250, 250), (200, 40, 40), (30, 90, 200)]
        frames = np.stack(list(self._frames(3)))
        planes = np.ascontiguousarray(frames.transpose(3, 0, 1, 2))
        for gamma in (False, True):
            d = dpt.ImageDitherer(
                num_colors=4, dither_mode=dpt.DitherMode.ERROR_DIFFUSION,
                palette=list(pal), use_gamma=gamma,
                dither_params={"variant": "floyd_steinberg"})
            monkeypatch.setenv("DITHER_PIE_TPU_INDEX_TRANSFER", "0")
            rgb = d.apply_dithering_batch(planes.copy(), planar=True)
            monkeypatch.setenv("DITHER_PIE_TPU_INDEX_TRANSFER", "1")
            via_idx = d.apply_dithering_batch(planes.copy(), planar=True)
            assert via_idx.shape == planes.shape
            np.testing.assert_array_equal(via_idx, rgb)

    def test_wavelet_batch_matches_single(self):
        """The batched device wavelet path (one vmapped program per batch)
        must reproduce the per-frame path exactly: the reference re-seeds
        per image, so the noise tensors are frame-invariant."""
        pal = [(0, 0, 0), (255, 255, 255), (200, 40, 40), (30, 90, 200)]
        frames = list(self._frames(3))
        d = dpt.ImageDitherer(
            num_colors=4, dither_mode=dpt.DitherMode.WAVELET,
            palette=list(pal),
            dither_params={"wavelet": "db2", "subband_quant": 6, "seed": 7})
        batch = d.apply_dithering_batch(np.stack(frames))
        for i, f in enumerate(frames):
            single = d.apply_dithering_array(f)
            np.testing.assert_array_equal(batch[i], single)

    def test_gamma_batch_matches_single(self):
        pal = [(0, 0, 0), (255, 255, 255), (200, 40, 40)]
        frames = list(self._frames(4))
        d = dpt.ImageDitherer(num_colors=3, dither_mode=dpt.DitherMode.BAYER,
                              palette=list(pal), use_gamma=True)
        batch = d.apply_dithering_batch(np.stack(frames))
        for i, f in enumerate(frames):
            single = dpt.ImageDitherer(
                num_colors=3, dither_mode=dpt.DitherMode.BAYER,
                palette=list(pal), use_gamma=True).apply_dithering_array(f)
            np.testing.assert_array_equal(batch[i], single)


class TestCLI:
    def _env(self):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        return env

    def test_example_config(self):
        r = subprocess.run([sys.executable, "-m", "dither_pie_tpu.cli.main",
                            "--example-config"], capture_output=True, text=True,
                           env=self._env(), cwd="/root/repo")
        assert r.returncode == 0
        cfg = json.loads(r.stdout)
        assert cfg["dithering"]["mode"] == "bayer"

    def test_cli_package_entry_point(self):
        """`python -m dither_pie_tpu.cli` (the documented surface) works."""
        r = subprocess.run([sys.executable, "-m", "dither_pie_tpu.cli",
                            "--example-config"], capture_output=True, text=True,
                           env=self._env(), cwd="/root/repo")
        assert r.returncode == 0
        assert json.loads(r.stdout)["dithering"]["mode"] == "bayer"

    def test_cli_image_run(self, tmp_path, tmp_image):
        out = tmp_path / "result.png"
        cfgp = _write_config(tmp_path, {
            "input": "in.png", "output": str(out),
            "dithering": {"enabled": True, "mode": "bayer"},
            "palette": {"source": "median_cut", "num_colors": 4},
        })
        r = subprocess.run([sys.executable, "-m", "dither_pie_tpu.cli.main",
                            str(cfgp)], capture_output=True, text=True,
                           env=self._env(), cwd="/root/repo")
        assert r.returncode == 0, r.stdout + r.stderr
        assert out.exists()

    def test_cli_input_override_smart_name(self, tmp_path, tmp_image):
        cfgp = _write_config(tmp_path, {
            "input": "placeholder.png", "output": "placeholder_out.png",
            "dithering": {"enabled": True, "mode": "bayer"},
            "palette": {"source": "kmeans", "num_colors": 8},
        })
        r = subprocess.run([sys.executable, "-m", "dither_pie_tpu.cli.main",
                            str(cfgp), str(tmp_image)], capture_output=True,
                           text=True, env=self._env(), cwd="/root/repo")
        assert r.returncode == 0, r.stdout + r.stderr
        expected = tmp_image.parent / "in_bayer_km8c.png"
        assert expected.exists()

    def test_cli_missing_config(self):
        r = subprocess.run([sys.executable, "-m", "dither_pie_tpu.cli.main",
                            "/nonexistent/config.json"], capture_output=True,
                           text=True, env=self._env(), cwd="/root/repo")
        assert r.returncode == 1

    def test_cli_folder_batch(self, tmp_path):
        rng = np.random.RandomState(0)
        folder = tmp_path / "imgs"
        folder.mkdir()
        for i in range(3):
            Image.fromarray(rng.randint(0, 256, (20, 20, 3), dtype=np.uint8)).save(
                folder / f"img{i}.png")
        cfgp = _write_config(tmp_path, {
            "input": str(folder), "output": str(tmp_path / "out"),
            "mode": "folder",
            "dithering": {"enabled": True, "mode": "none"},
            "palette": {"source": "uniform", "num_colors": 8},
        })
        r = subprocess.run([sys.executable, "-m", "dither_pie_tpu.cli.main",
                            str(cfgp)], capture_output=True, text=True,
                           env=self._env(), cwd="/root/repo")
        assert r.returncode == 0, r.stdout + r.stderr
        assert len(list((tmp_path / "out").glob("*.png"))) == 3


class TestResume:
    def test_plan_segments(self):
        from dither_pie_tpu.pipeline.resume import n_segments, plan_segments

        assert plan_segments(10, 4, set()) == [(0, 0, 4), (1, 4, 8), (2, 8, 10)]
        assert plan_segments(10, 4, {1}) == [(0, 0, 4), (2, 8, 10)]
        assert plan_segments(8, 4, {0, 1}) == []
        assert n_segments(10, 4) == 3
        assert n_segments(8, 4) == 2

    def test_manifest_roundtrip(self, tmp_path):
        from dither_pie_tpu.pipeline import resume as rz

        out = str(tmp_path / "video.mp4")
        expect = {"input": "/a/b.mp4", "fps": 30.0, "segment_size": 300,
                  "total_frames": 900}
        # segments count as done only if their part file exists
        (tmp_path / "video.mp4.seg0001.mp4").write_bytes(b"x")
        rz.save_manifest(out, expect, {0, 1})
        assert rz.load_manifest(out, expect) == {1}
        # mismatched params -> start fresh
        other = dict(expect, segment_size=100)
        assert rz.load_manifest(out, other) == set()

    def test_concat_lock_claim_and_block(self, tmp_path):
        from dither_pie_tpu.pipeline.video import VideoProcessor as VP

        lock = str(tmp_path / "out.mp4.concat.lock")
        assert VP._claim_concat_lock(lock) is True
        # Live holder (this pid, this host): a second claim must lose.
        assert VP._claim_concat_lock(lock) is False
        os.remove(lock)
        assert VP._claim_concat_lock(lock) is True

    def test_concat_lock_reclaims_dead_pid(self, tmp_path):
        import socket
        import subprocess as sp

        from dither_pie_tpu.pipeline.video import VideoProcessor as VP

        lock = str(tmp_path / "out.mp4.concat.lock")
        # A pid that existed and is now certainly gone on this host.
        child = sp.Popen([sys.executable, "-c", "pass"])
        child.wait()
        Path(lock).write_text(f"{child.pid} {socket.gethostname()}")
        assert VP._claim_concat_lock(lock) is True  # reclaimed
        assert Path(lock).read_text().split()[0] == str(os.getpid())

    def test_concat_lock_reclaims_stale_remote(self, tmp_path):
        import socket

        from dither_pie_tpu.pipeline.video import VideoProcessor as VP

        lock = str(tmp_path / "out.mp4.concat.lock")
        # Remote host's pid: liveness unknowable locally, so only the
        # stale-age rule may reclaim it.
        Path(lock).write_text(f"12345 not-{socket.gethostname()}")
        assert VP._claim_concat_lock(lock) is False
        old = os.path.getmtime(lock) - (VP.CONCAT_LOCK_STALE_S + 10)
        os.utime(lock, (old, old))
        assert VP._claim_concat_lock(lock) is True


class TestTools:
    def test_resizer_image(self, tmp_path, tmp_image):
        from dither_pie_tpu.tools.resizer import resize_image

        out = tmp_path / "resized.png"
        resize_image(str(tmp_image), str(out), 20)
        img = Image.open(out)
        # 40x60 -> smaller side ~20, both even
        assert img.size[1] % 2 == 0 and img.size[0] % 2 == 0
        assert min(img.size) == 20

    def test_vid_conc_requires_ffmpeg(self, capsys):
        from dither_pie_tpu.pipeline.ffio import ffmpeg_available
        from dither_pie_tpu.tools.vid_conc import concat_side_by_side

        if not ffmpeg_available():
            assert concat_side_by_side(["a.mp4", "b.mp4"], "out.mp4") is False


class TestFFmpegCommandParity:
    """The encode/compose invocations must carry the reference's flags —
    pinned WITHOUT running ffmpeg (absent in this container)."""

    def test_encode_command_matches_reference_flags(self):
        from dither_pie_tpu.pipeline.ffio import encode_command

        # Reference encoder settings: video_processor.py:361-377.
        cmd = encode_command("out.mp4", 640, 360, 30.0,
                             source_path="src.mp4", total_frames=90)
        s = " ".join(cmd)
        for needle in ["-c:v libx264", "-preset medium", "-crf 18",
                       "-pix_fmt yuv420p", "-vframes 90",
                       "-map 0:v:0", "-map 1:a?", "-map 1:s?",
                       "-c:a copy", "-c:s copy"]:
            assert needle in s, needle
        # -vframes must come before the output path (it applies to it).
        assert cmd.index("-vframes") < cmd.index("out.mp4")

    def test_encode_command_no_source(self):
        from dither_pie_tpu.pipeline.ffio import encode_command

        s = " ".join(encode_command("o.mp4", 64, 64, 24.0))
        assert "-map" not in s and "-c:a copy" not in s
        assert "-c:v libx264" in s

    def test_vid_conc_commands_match_reference(self):
        from dither_pie_tpu.tools.vid_conc import combine_cmd, sanitize_cmd

        # Sanitize: NEIGHBOR scaling preserves pixel art (ref
        # misc/vid_conc.py:52-66 scales with flags=neighbor).
        s = " ".join(sanitize_cmd("a.mp4", "c.mp4", 29.97, 720))
        assert "flags=neighbor" in s and "-c:v libx264" in s

        # Combine, two inputs: reference's exact stereo downmix
        # (misc/vid_conc.py:54-66) and hstack/vstack filters.
        cmd = combine_cmd(["c0.mp4", "c1.mp4"], "out.mp4",
                          vertical=False, merge_audio=True)
        fc = cmd[cmd.index("-filter_complex") + 1]
        assert "hstack=inputs=2[v]" in fc
        assert "amerge=inputs=2,pan=stereo|c0<c0+c2|c1<c1+c3[a]" in fc
        assert "-crf" in cmd and cmd[cmd.index("-crf") + 1] == "18"

        cmd_v = combine_cmd(["c0.mp4", "c1.mp4"], "out.mp4",
                            vertical=True, merge_audio=True)
        assert "vstack=inputs=2[v]" in cmd_v[cmd_v.index("-filter_complex") + 1]

        # No-audio retry path maps only [v].
        cmd_na = combine_cmd(["c0.mp4", "c1.mp4"], "out.mp4",
                             vertical=False, merge_audio=False)
        assert "amerge" not in " ".join(cmd_na)


class TestPlanarIO:
    def test_encode_command_planar_pix_fmt(self):
        from dither_pie_tpu.pipeline import ffio

        cmd = ffio.encode_command("o.mp4", 64, 48, 30.0, in_pix_fmt="gbrp")
        i = cmd.index("-pix_fmt")
        assert cmd[i + 1] == "gbrp"
        # encoder settings unchanged (reference parity)
        assert "libx264" in cmd and "yuv420p" in cmd

    def test_planar_reader_cv2_roundtrip(self, tmp_path):
        """The planar reader yields (3, H, W) R/G/B planes matching the
        interleaved reader's frames."""
        from dither_pie_tpu.pipeline import ffio

        if not ffio.video_available():
            pytest.skip("no video backend")
        p = str(tmp_path / "v.mp4")
        w_ = ffio.FrameWriter(p, 64, 48, 10.0)
        rng = np.random.RandomState(3)
        frames = [rng.randint(0, 256, (48, 64, 3), dtype=np.uint8)
                  for _ in range(4)]
        for f in frames:
            w_.write(f)
        assert w_.close()
        inter = list(ffio.read_frames(p, 64, 48))
        planar = list(ffio.read_frames_planar(p, 64, 48))
        assert len(inter) == len(planar) == 4
        for a, b in zip(inter, planar):
            assert b.shape == (3, 48, 64)
            np.testing.assert_array_equal(b, a.transpose(2, 0, 1))
