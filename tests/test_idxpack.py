"""Index-stream bit-packing (ops/idxpack.py): exact round trip and
bit-identical end-to-end outputs with the pack on vs off."""

import numpy as np
import pytest

from dither_pie_tpu.ops import idxpack


def test_pack_bits_for_thresholds():
    assert idxpack.pack_bits_for(2) == 1
    assert idxpack.pack_bits_for(3) == 2
    assert idxpack.pack_bits_for(4) == 2
    assert idxpack.pack_bits_for(5) == 4
    assert idxpack.pack_bits_for(16) == 4
    assert idxpack.pack_bits_for(17) == 0
    assert idxpack.pack_bits_for(256) == 0


@pytest.mark.parametrize("bpp,p", [(1, 2), (2, 4), (4, 16)])
@pytest.mark.parametrize("w", [1, 7, 8, 13, 128])
def test_roundtrip_exact(bpp, p, w):
    rng = np.random.RandomState(bpp * 100 + w)
    idx = rng.randint(0, p, (3, 5, w)).astype(np.uint8)
    packed = np.asarray(idxpack.pack_indices_device(idx, bpp))
    per = 8 // bpp
    assert packed.shape == (3, 5, -(-w // per))
    out = idxpack.unpack_indices_host(packed, bpp, w)
    np.testing.assert_array_equal(out, idx)
    assert out.dtype == np.uint8


def test_packed_transfer_disabled_paths(monkeypatch):
    rng = np.random.RandomState(0)
    idx = rng.randint(0, 16, (2, 4, 9)).astype(np.uint8)
    # P > 16: no packing, plain transfer.
    np.testing.assert_array_equal(idxpack.packed_transfer(idx, 17, 9), idx)
    # Knob off: plain transfer even for a packable palette.
    monkeypatch.setenv("DITHER_PIE_TPU_INDEX_PACK", "0")
    np.testing.assert_array_equal(idxpack.packed_transfer(idx, 16, 9), idx)
    monkeypatch.setenv("DITHER_PIE_TPU_INDEX_PACK", "1")
    np.testing.assert_array_equal(idxpack.packed_transfer(idx, 16, 9), idx)


def test_first_pixel_in_high_bits():
    idx = np.array([[[1, 0, 1, 1, 0, 0, 1, 0]]], np.uint8)
    packed = np.asarray(idxpack.pack_indices_device(idx, 1))
    assert packed.shape == (1, 1, 1)
    assert packed[0, 0, 0] == 0b10110010


@pytest.mark.parametrize("p", [2, 4, 16])
def test_wavefront_indices_pack_on_off_identical(p, monkeypatch):
    from dither_pie_tpu.ops import wavefront as wf

    rng = np.random.RandomState(p)
    imgs = rng.randint(0, 256, (2, 16, 21, 3)).astype(np.float32)
    pal = np.unique(rng.randint(0, 256, (p * 4, 3)),
                    axis=0)[:p].astype(np.float32)
    monkeypatch.setenv("DITHER_PIE_TPU_INDEX_PACK", "0")
    off = wf.ed_batch_wavefront(imgs.copy(), pal, "fixed",
                                "floyd_steinberg", return_indices=True)
    monkeypatch.setenv("DITHER_PIE_TPU_INDEX_PACK", "1")
    on = wf.ed_batch_wavefront(imgs.copy(), pal, "fixed",
                               "floyd_steinberg", return_indices=True)
    np.testing.assert_array_equal(on, off)
    assert on.dtype == np.uint8 and on.shape == (2, 16, 21)


def test_ordered_indices_pack_on_off_identical(monkeypatch):
    from dither_pie_tpu.api import ditherer as dmod

    rng = np.random.RandomState(7)
    imgs = rng.randint(0, 256, (2, 24, 33, 3)).astype(np.uint8)
    pal = np.array([(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 255, 0)],
                   np.float32)
    from dither_pie_tpu.core.thresholds import bayer_matrix
    from dither_pie_tpu.ops.ordered import screen_for_matrix

    screen = screen_for_matrix(bayer_matrix("4x4"), 24, 33)
    monkeypatch.setenv("DITHER_PIE_TPU_INDEX_PACK", "0")
    off = dmod._ordered_batch_indices(imgs, pal, screen)
    monkeypatch.setenv("DITHER_PIE_TPU_INDEX_PACK", "1")
    on = dmod._ordered_batch_indices(imgs, pal, screen)
    np.testing.assert_array_equal(on, off)


def test_batch_index_transfer_pack_end_to_end(monkeypatch):
    """apply_dithering_batch through the forced index stream must be
    bit-identical with the pack on and off (16-color ED, odd width)."""
    from dither_pie_tpu.api.ditherer import DitherMode, ImageDitherer

    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, (3, 20, 27, 3)).astype(np.uint8)
    pal = [tuple(int(v) for v in rng.randint(0, 256, 3)) for _ in range(16)]
    d = ImageDitherer(num_colors=16, dither_mode=DitherMode.ERROR_DIFFUSION,
                      palette=pal, dither_params={"variant": "stucki",
                                                  "serpentine": "false"})
    monkeypatch.setenv("DITHER_PIE_TPU_INDEX_TRANSFER", "1")
    monkeypatch.setenv("DITHER_PIE_TPU_INDEX_PACK", "0")
    off = d.apply_dithering_batch(frames.copy())
    monkeypatch.setenv("DITHER_PIE_TPU_INDEX_PACK", "1")
    on = d.apply_dithering_batch(frames.copy())
    np.testing.assert_array_equal(on, off)
