"""Rotated-screen newspaper halftone.

Split TPU-first: the screen + cell-assignment depend only on (H, W, params) —
not on pixel data — so they are precomputed on host in float64 (bit-matching
the reference's /root/reference/dithering_lib.py:1646-1695 math) and cached;
the per-pixel work (luma, cell color averaging via segment-sum, palette
mapping, ink test) runs as one fused jitted device program.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SCREEN_CACHE = {}


def halftone_screen(
    h: int,
    w: int,
    cell_size: int = 8,
    angle: float = 45.0,
    dot_gain: float = 1.0,
    min_dot_size: float = 0.0,
    max_dot_size: float = 1.0,
    shape: str = "circle",
    sharpness: float = 1.5,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """(screen (H,W) f32, cell_idx (H,W) int32 compacted to [0, n_cells), n_cells)."""
    key = (h, w, cell_size, angle, dot_gain, min_dot_size, max_dot_size, shape, sharpness)
    if key in _SCREEN_CACHE:
        return _SCREEN_CACHE[key]

    angle_rad = np.radians(angle)
    cos_a, sin_a = np.cos(angle_rad), np.sin(angle_rad)
    y_coords, x_coords = np.mgrid[0:h, 0:w]
    x_rot = x_coords * cos_a - y_coords * sin_a
    y_rot = x_coords * sin_a + y_coords * cos_a

    cell_x = np.floor(x_rot / cell_size).astype(np.int32)
    cell_y = np.floor(y_rot / cell_size).astype(np.int32)
    cell_x -= cell_x.min()
    cell_y -= cell_y.min()
    max_x = cell_x.max() + 1
    raw_ids = cell_y * max_x + cell_x
    # Compact to consecutive ids (reference uses np.unique + searchsorted).
    unique_ids, cell_idx = np.unique(raw_ids, return_inverse=True)
    cell_idx = cell_idx.reshape(h, w).astype(np.int32)
    n_cells = int(len(unique_ids))

    x_in = (x_rot % cell_size) / cell_size
    y_in = (y_rot % cell_size) / cell_size
    dx, dy = x_in - 0.5, y_in - 0.5
    if shape == "square":
        dist, max_dist = np.maximum(np.abs(dx), np.abs(dy)), 0.5
    elif shape == "diamond":
        dist, max_dist = np.abs(dx) + np.abs(dy), 1.0
    else:  # circle (and unknown-shape fallback)
        dist, max_dist = np.sqrt(dx**2 + dy**2), 0.5
    dist_norm = np.clip(dist / max_dist, 0.0, 1.0)
    threshold = dist_norm ** (1.0 / dot_gain)
    threshold = min_dot_size + threshold * (max_dot_size - min_dot_size)
    if sharpness != 1.0:
        threshold = 0.5 + (threshold - 0.5) * sharpness
    screen = np.clip(threshold, 0.0, 1.0).astype(np.float32)

    result = (screen, cell_idx, n_cells)
    if len(_SCREEN_CACHE) < 16:
        _SCREEN_CACHE[key] = result
    return result


@functools.partial(jax.jit, static_argnames=("n_cells",))
def halftone_dither(
    image: jnp.ndarray,
    palette: jnp.ndarray,
    screen: jnp.ndarray,
    cell_idx: jnp.ndarray,
    n_cells: int,
) -> jnp.ndarray:
    """Device halftone: (H, W, 3) u8/f32 -> (H, W, 3) u8 palette colors."""
    h, w, _ = image.shape
    img = image.astype(jnp.float32)
    gray = (jnp.float32(0.299) * img[..., 0] + jnp.float32(0.587) * img[..., 1]
            + jnp.float32(0.114) * img[..., 2])
    gray_norm = gray / jnp.float32(255.0)

    pal_bright = (jnp.float32(0.299) * palette[:, 0] + jnp.float32(0.587) * palette[:, 1]
                  + jnp.float32(0.114) * palette[:, 2])
    paper_idx = jnp.argmax(pal_bright)

    # Per-cell average color (segment-sum), then nearest palette per cell.
    flat_idx = cell_idx.reshape(-1)
    flat_px = img.reshape(-1, 3)
    sums = jax.ops.segment_sum(flat_px, flat_idx, num_segments=n_cells)
    counts = jax.ops.segment_sum(jnp.ones((h * w,), jnp.float32), flat_idx, num_segments=n_cells)
    avgs = sums / jnp.maximum(counts, 1.0)[:, None]

    a2 = jnp.sum(avgs * avgs, axis=-1, keepdims=True)
    p2 = jnp.sum(palette * palette, axis=-1)[None, :]
    ap = jnp.dot(avgs, palette.T, precision=jax.lax.Precision.HIGHEST)
    cell_pal = jnp.argmin(a2 - 2.0 * ap + p2, axis=-1)  # (n_cells,)

    place_ink = (jnp.float32(1.0) - gray_norm) > screen
    idx_map = jnp.where(place_ink, cell_pal[cell_idx], paper_idx)
    return jnp.take(palette, idx_map.reshape(-1), axis=0).reshape(h, w, 3).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("n_cells",))
def _halftone_indices(image, palette, screen, cell_idx, n_cells):
    """halftone_dither's pick as (H, W) uint8 palette indices (P <= 256):
    identical per-cell argmin + ink/paper select, minus the color take."""
    h, w, _ = image.shape
    img = image.astype(jnp.float32)
    gray = (jnp.float32(0.299) * img[..., 0] + jnp.float32(0.587) * img[..., 1]
            + jnp.float32(0.114) * img[..., 2])
    gray_norm = gray / jnp.float32(255.0)
    pal_bright = (jnp.float32(0.299) * palette[:, 0] + jnp.float32(0.587) * palette[:, 1]
                  + jnp.float32(0.114) * palette[:, 2])
    paper_idx = jnp.argmax(pal_bright)
    flat_idx = cell_idx.reshape(-1)
    flat_px = img.reshape(-1, 3)
    sums = jax.ops.segment_sum(flat_px, flat_idx, num_segments=n_cells)
    counts = jax.ops.segment_sum(jnp.ones((h * w,), jnp.float32), flat_idx, num_segments=n_cells)
    avgs = sums / jnp.maximum(counts, 1.0)[:, None]
    a2 = jnp.sum(avgs * avgs, axis=-1, keepdims=True)
    p2 = jnp.sum(palette * palette, axis=-1)[None, :]
    ap = jnp.dot(avgs, palette.T, precision=jax.lax.Precision.HIGHEST)
    cell_pal = jnp.argmin(a2 - 2.0 * ap + p2, axis=-1)
    place_ink = (jnp.float32(1.0) - gray_norm) > screen
    return jnp.where(place_ink, cell_pal[cell_idx], paper_idx).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("n_cells",))
def halftone_dither_batch(
    images: jnp.ndarray,
    palette: jnp.ndarray,
    screen: jnp.ndarray,
    cell_idx: jnp.ndarray,
    n_cells: int,
) -> jnp.ndarray:
    """Batched halftone: (B, H, W, 3) with shared screen/cell layout."""
    return jax.vmap(
        lambda im: halftone_dither(im, palette, screen, cell_idx, n_cells)
    )(images)


@functools.partial(jax.jit, static_argnames=("n_cells",))
def halftone_dither_batch_indices(
    images: jnp.ndarray,
    palette: jnp.ndarray,
    screen: jnp.ndarray,
    cell_idx: jnp.ndarray,
    n_cells: int,
) -> jnp.ndarray:
    """Batched index-emitting halftone: (B, H, W) u8 (the index transfer
    path — 1 byte/pixel off the device, exact host palette gather)."""
    return jax.vmap(
        lambda im: _halftone_indices(im, palette, screen, cell_idx, n_cells)
    )(images)
