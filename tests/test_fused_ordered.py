"""Fused Pallas ordered-dither kernel vs the XLA path (bit-identical)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dither_pie_tpu.core.thresholds import bayer_matrix
from dither_pie_tpu.ops.ordered import ordered_dither_batch, tile_screen_device
from dither_pie_tpu.ops.ordered_pallas import ordered_dither_fused


@pytest.mark.parametrize("shape,p", [((2, 40, 56), 16), ((1, 100, 130), 5),
                                     ((3, 17, 200), 33), ((1, 8, 8), 2)])
def test_fused_matches_xla(shape, p):
    rng = np.random.RandomState(sum(shape) + p)
    b, h, w = shape
    imgs = rng.randint(0, 256, (b, h, w, 3), dtype=np.uint8)
    pal = rng.randint(0, 256, (p, 3)).astype(np.float32)
    screen = tile_screen_device(jnp.asarray(bayer_matrix("8x8")), h, w)
    fused = np.asarray(ordered_dither_fused(jnp.asarray(imgs), jnp.asarray(pal),
                                            screen, interpret=True))
    xla = np.asarray(ordered_dither_batch(jnp.asarray(imgs), jnp.asarray(pal),
                                          screen))
    np.testing.assert_array_equal(fused, xla)


@pytest.mark.parametrize("shape,p", [((2, 40, 56), 16), ((1, 17, 130), 33)])
def test_fused_indices_gather_to_colors(shape, p):
    """The index stream gathers to the color output bit-for-bit (fused
    kernel AND the XLA fallback)."""
    from dither_pie_tpu.ops.ordered import ordered_dither_batch_indices

    rng = np.random.RandomState(sum(shape) + p + 1)
    b, h, w = shape
    imgs = rng.randint(0, 256, (b, h, w, 3), dtype=np.uint8)
    pal = rng.randint(0, 256, (p, 3)).astype(np.float32)
    screen = tile_screen_device(jnp.asarray(bayer_matrix("8x8")), h, w)
    colors = np.asarray(ordered_dither_fused(
        jnp.asarray(imgs), jnp.asarray(pal), screen, interpret=True))
    idx = np.asarray(ordered_dither_fused(
        jnp.asarray(imgs), jnp.asarray(pal), screen, interpret=True,
        return_indices=True))
    assert idx.shape == (b, h, w) and idx.dtype == np.uint8
    np.testing.assert_array_equal(pal.astype(np.uint8)[idx], colors)
    idx_xla = np.asarray(ordered_dither_batch_indices(
        jnp.asarray(imgs), jnp.asarray(pal), screen))
    np.testing.assert_array_equal(idx_xla, idx)


def test_fused_used_only_on_accelerator(monkeypatch):
    """dispatch_ordered_batch stays on the XLA path on CPU."""
    from dither_pie_tpu.ops.ordered import dispatch_ordered_batch

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (1, 64, 64, 3), dtype=np.uint8)
    pal = rng.randint(0, 256, (8, 3)).astype(np.float32)
    screen = tile_screen_device(jnp.asarray(bayer_matrix("4x4")), 64, 64)
    out = np.asarray(dispatch_ordered_batch(jnp.asarray(imgs, jnp.float32),
                                            jnp.asarray(pal), screen))
    ref = np.asarray(ordered_dither_batch(jnp.asarray(imgs, jnp.float32),
                                          jnp.asarray(pal), screen))
    np.testing.assert_array_equal(out, ref)
