"""Fused ordered (threshold-screen) dithering.

One kernel serves every matrix-threshold mode in the reference — Bayer, PSX,
blue-noise, polka-dot (tiled screens), IGN (computed per-pixel screen), and
the wavelet strategy's final randomized pick (random screen):

    factor = d1^2 / (d1^2 + d2^2)         (top-2 palette distances)
    out    = palette[ factor <= screen ? nearest : second ]

matching ``MatrixDitherStrategy.dither`` (/root/reference/dithering_lib.py:
355-378). Everything fuses into a single XLA program per (H, W, P) shape:
u8 -> f32 cast, MXU distance matmul, two-pass argmin, ratio compare, gather,
u8 cast. No host round trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dither_pie_tpu.core.distance import distance_ratio_factor, top2_palette


def tile_screen_device(matrix: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Tile a (th, tw) threshold matrix over an (h, w) canvas on device."""
    th, tw = matrix.shape
    rows = jnp.arange(h) % th
    cols = jnp.arange(w) % tw
    return matrix[rows][:, cols]


@functools.partial(jax.jit, static_argnames=("exact_f64",))
def ordered_dither(
    image: jnp.ndarray,
    palette: jnp.ndarray,
    screen: jnp.ndarray,
    exact_f64: bool = False,
) -> jnp.ndarray:
    """Ordered-dither an (H, W, 3) image against an (H, W) threshold screen.

    ``image``: uint8 or integer-valued float32, (H, W, 3).
    ``palette``: (P, 3) float32, P >= 2.
    ``screen``: (H, W) float32 thresholds in [0, 1].
    Returns (H, W, 3) uint8 of palette colors.
    """
    h, w, _ = image.shape
    px = image.reshape(-1, 3).astype(jnp.float32)
    d1, d2, i1, i2 = top2_palette(px, palette)
    factor = distance_ratio_factor(d1, d2, exact_f64=exact_f64)
    thr = screen.reshape(-1)
    if exact_f64:
        thr = thr.astype(jnp.float64)
    use_nearest = factor <= thr
    idx = jnp.where(use_nearest, i1, i2)
    from dither_pie_tpu.core.distance import take_palette

    out = take_palette(palette, idx)
    return out.reshape(h, w, 3).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("exact_f64",))
def ordered_dither_batch(
    images: jnp.ndarray,
    palette: jnp.ndarray,
    screen: jnp.ndarray,
    exact_f64: bool = False,
) -> jnp.ndarray:
    """Batched ordered dither: (B, H, W, 3) with one shared (H, W) screen."""
    return jax.vmap(lambda im: ordered_dither(im, palette, screen, exact_f64))(images)


@jax.jit
def _ordered_indices_one(image: jnp.ndarray, palette: jnp.ndarray,
                         screen: jnp.ndarray) -> jnp.ndarray:
    """ordered_dither's pick as (H, W) uint8 palette indices (P <= 256)."""
    h, w, _ = image.shape
    px = image.reshape(-1, 3).astype(jnp.float32)
    d1, d2, i1, i2 = top2_palette(px, palette)
    factor = distance_ratio_factor(d1, d2)
    idx = jnp.where(factor <= screen.reshape(-1), i1, i2)
    return idx.reshape(h, w).astype(jnp.uint8)


@jax.jit
def ordered_dither_batch_indices(images: jnp.ndarray, palette: jnp.ndarray,
                                 screen: jnp.ndarray) -> jnp.ndarray:
    """Batched index-emitting ordered dither (XLA path): (B, H, W) u8."""
    return jax.vmap(
        lambda im: _ordered_indices_one(im, palette, screen))(images)


def screen_for_matrix(matrix: np.ndarray, h: int, w: int) -> jnp.ndarray:
    """Host helper: tiled device screen from a small host matrix."""
    return tile_screen_device(jnp.asarray(matrix, dtype=jnp.float32), h, w)


def dispatch_ordered_batch(images: jnp.ndarray, palette: jnp.ndarray,
                           screen: jnp.ndarray,
                           return_indices: bool = False) -> jnp.ndarray:
    """Pick the fused Pallas kernel on accelerators (~5 B/pixel of HBM
    traffic) or the XLA path on CPU (where interpret-mode Pallas is slow).
    Bit-identical results either way.

    ``return_indices=True`` (P <= 256): (B, H, W) u8 palette indices —
    1 byte/pixel leaves the device and the caller gathers colors."""
    import jax

    from dither_pie_tpu.ops.ordered_pallas import ordered_dither_fused

    b, h, w, _ = images.shape
    if return_indices and palette.shape[0] > 256:
        raise ValueError("return_indices requires a palette <= 256 colors")
    on_accel = jax.default_backend() not in ("cpu",)
    if on_accel and b * h * w >= 64 * 64 and palette.shape[0] <= 256:
        return ordered_dither_fused(images, palette, screen, interpret=False,
                                    return_indices=return_indices)
    if return_indices:
        return ordered_dither_batch_indices(images, palette, screen)
    return ordered_dither_batch(images, palette, screen)
