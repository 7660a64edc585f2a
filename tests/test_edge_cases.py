"""Edge cases and robustness: tiny images, degenerate palettes, input modes."""

import numpy as np
import pytest
from PIL import Image

import dither_pie_tpu as dpt

BW = [(0, 0, 0), (255, 255, 255)]


@pytest.mark.parametrize("mode", [m for m in dpt.DitherMode])
def test_tiny_image_all_modes(mode):
    """1x1 and 2x3 images must not crash any mode."""
    rng = np.random.RandomState(0)
    for shape in [(1, 1, 3), (2, 3, 3)]:
        arr = rng.randint(0, 256, shape, dtype=np.uint8)
        d = dpt.ImageDitherer(num_colors=2, dither_mode=mode, palette=list(BW))
        out = d.apply_dithering_array(arr)
        assert out.shape == shape
        for px in out.reshape(-1, 3):
            assert tuple(px) in {(0, 0, 0), (255, 255, 255)}


def test_single_color_palette():
    arr = np.random.RandomState(1).randint(0, 256, (8, 8, 3), dtype=np.uint8)
    d = dpt.ImageDitherer(num_colors=1, dither_mode=dpt.DitherMode.BAYER,
                          palette=[(40, 80, 120)])
    out = d.apply_dithering_array(arr)
    assert np.all(out.reshape(-1, 3) == (40, 80, 120))


def test_duplicate_palette_entries():
    arr = np.random.RandomState(2).randint(0, 256, (8, 8, 3), dtype=np.uint8)
    d = dpt.ImageDitherer(num_colors=3, dither_mode=dpt.DitherMode.BAYER,
                          palette=[(0, 0, 0), (0, 0, 0), (255, 255, 255)])
    out = d.apply_dithering_array(arr)
    assert out.shape == (8, 8, 3)


def test_grayscale_and_rgba_inputs():
    g = Image.fromarray(np.random.RandomState(3).randint(
        0, 256, (10, 12), dtype=np.uint8), "L")
    rgba = Image.fromarray(np.random.RandomState(4).randint(
        0, 256, (10, 12, 4), dtype=np.uint8), "RGBA")
    for img in (g, rgba):
        d = dpt.ImageDitherer(num_colors=2, dither_mode=dpt.DitherMode.NONE,
                              palette=list(BW))
        out = d.apply_dithering(img)
        assert out.mode == "RGB" and out.size == (12, 10)


def test_more_colors_than_pixels():
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    d = dpt.ImageDitherer(num_colors=64, dither_mode=dpt.DitherMode.NONE)
    out = d.apply_dithering_array(arr)
    assert out.shape == (2, 2, 3)


def test_palette_autogeneration_cached_on_instance():
    """apply_dithering caches the auto palette on the instance (reference
    behavior: subsequent frames reuse it)."""
    rng = np.random.RandomState(5)
    d = dpt.ImageDitherer(num_colors=4, dither_mode=dpt.DitherMode.NONE)
    assert d.palette is None
    d.apply_dithering_array(rng.randint(0, 256, (16, 16, 3), dtype=np.uint8))
    first = list(d.palette)
    d.apply_dithering_array(rng.randint(0, 256, (16, 16, 3), dtype=np.uint8))
    assert d.palette == first  # not regenerated


def test_unknown_ed_variant_falls_back():
    """Unknown variant name -> floyd_steinberg (reference getter fallback)."""
    arr = np.random.RandomState(6).randint(0, 256, (8, 8, 3), dtype=np.uint8)
    d1 = dpt.ImageDitherer(num_colors=2, dither_mode=dpt.DitherMode.ERROR_DIFFUSION,
                           palette=list(BW), dither_params={"variant": "bogus"})
    d2 = dpt.ImageDitherer(num_colors=2, dither_mode=dpt.DitherMode.ERROR_DIFFUSION,
                           palette=list(BW), dither_params={"variant": "floyd_steinberg"})
    np.testing.assert_array_equal(d1.apply_dithering_array(arr),
                                  d2.apply_dithering_array(arr))


def test_large_palette_ed_uses_v1_path(monkeypatch):
    """>64-color palettes route to the v1 wavefront (packed unrolls per
    entry); output still palette-constrained."""
    rng = np.random.RandomState(7)
    pal = [tuple(c) for c in rng.randint(0, 256, (70, 3))]
    arr = rng.randint(0, 256, (12, 14, 3), dtype=np.uint8)
    d = dpt.ImageDitherer(num_colors=70, dither_mode=dpt.DitherMode.ERROR_DIFFUSION,
                          palette=list(pal),
                          dither_params={"variant": "floyd_steinberg"})
    out = d.apply_dithering_array(arr)
    pal_set = {tuple(c) for c in pal}
    assert all(tuple(px) in pal_set for px in out.reshape(-1, 3))
