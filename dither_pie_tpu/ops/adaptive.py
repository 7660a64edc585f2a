"""Local-variance gate map for adaptive-variance dithering.

Host path uses scipy.ndimage.uniform_filter (identical to the reference,
/root/reference/dithering_lib.py:1020-1025); the device twin uses
lax.reduce_window mean filters with edge-replicate padding for the fused TPU
pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def variance_map_np(gray: np.ndarray, window_radius: int = 1) -> np.ndarray:
    from scipy.ndimage import uniform_filter

    size = 2 * window_radius + 1
    g = gray.astype(np.float32)
    mean_sq = uniform_filter(g**2, size=size, mode="nearest")
    sq_mean = uniform_filter(g, size=size, mode="nearest") ** 2
    return np.maximum(0.0, mean_sq - sq_mean)


def _uniform_filter_jnp(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Mean filter with 'nearest' (edge-replicate) padding, float32."""
    size = 2 * radius + 1
    padded = jnp.pad(x, ((radius, radius), (radius, radius)), mode="edge")
    s = jax.lax.reduce_window(
        padded, 0.0, jax.lax.add,
        window_dimensions=(size, size), window_strides=(1, 1), padding="VALID",
    )
    return s / jnp.float32(size * size)


def variance_map_jnp(gray: jnp.ndarray, window_radius: int = 1) -> jnp.ndarray:
    g = gray.astype(jnp.float32)
    mean_sq = _uniform_filter_jnp(g * g, window_radius)
    sq_mean = _uniform_filter_jnp(g, window_radius) ** 2
    return jnp.maximum(0.0, mean_sq - sq_mean)
