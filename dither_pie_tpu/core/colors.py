"""Color-space primitives: sRGB transfer functions, Rec.601 luma, hex helpers.

Behavioral parity targets:
  * sRGB <-> linear uses the exact piecewise IEC 61966-2-1 curve
    (reference: /root/reference/dithering_lib.py:1788-1802).
  * Luma uses Rec.601 coefficients (0.299, 0.587, 0.114) as every strategy in
    the reference does.

All device functions are written in jnp and are jit/vmap friendly (static
shapes, no Python branching on traced values).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

# Rec.601 luma weights used throughout the reference strategies.
LUMA_601 = (0.299, 0.587, 0.114)


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """Exact piecewise sRGB electro-optical transfer function, input in [0,1]."""
    c = jnp.asarray(c)
    low = c <= 0.04045
    # Compute both branches; jnp.where selects (branch-free, VPU friendly).
    lin_low = c / 12.92
    lin_high = ((c + 0.055) / 1.055) ** 2.4
    return jnp.where(low, lin_low, lin_high)


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    """Exact piecewise inverse sRGB transfer function, input in [0,1]."""
    c = jnp.asarray(c)
    low = c <= 0.0031308
    srgb_low = c * 12.92
    # Clamp the power-branch operand so the unselected lane never sees
    # negative bases (pow of negative -> nan would poison jnp.where grads/XLA
    # constant folding).
    safe = jnp.maximum(c, 0.0)
    srgb_high = 1.055 * (safe ** (1.0 / 2.4)) - 0.055
    return jnp.where(low, srgb_low, srgb_high)


def srgb_to_linear_np(c: np.ndarray) -> np.ndarray:
    """NumPy twin of :func:`srgb_to_linear` (float32, reference-identical)."""
    c = np.asarray(c, dtype=np.float32)
    low = c <= 0.04045
    out = np.empty_like(c, dtype=np.float32)
    out[low] = c[low] / 12.92
    out[~low] = ((c[~low] + 0.055) / 1.055) ** 2.4
    return out


def linear_to_srgb_np(c: np.ndarray) -> np.ndarray:
    """NumPy twin of :func:`linear_to_srgb` (float32, reference-identical)."""
    c = np.asarray(c, dtype=np.float32)
    low = c <= 0.0031308
    out = np.empty_like(c, dtype=np.float32)
    out[low] = c[low] * 12.92
    out[~low] = 1.055 * (c[~low] ** (1.0 / 2.4)) - 0.055
    return out


def luma_601(rgb: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Rec.601 luma of an (..., 3) array along ``axis``."""
    r, g, b = jnp.split(jnp.asarray(rgb), 3, axis=axis)
    y = LUMA_601[0] * r + LUMA_601[1] * g + LUMA_601[2] * b
    return jnp.squeeze(y, axis=axis)


def hex_to_rgb(hex_color: str) -> Tuple[int, int, int]:
    """``"#a1b2c3"`` or ``"a1b2c3"`` -> ``(161, 178, 195)``."""
    s = hex_color.lstrip("#")
    return tuple(int(s[i : i + 2], 16) for i in (0, 2, 4))


def rgb_to_hex(rgb: Tuple[int, int, int]) -> str:
    """``(161, 178, 195)`` -> ``"#a1b2c3"``."""
    return f"#{rgb[0]:02x}{rgb[1]:02x}{rgb[2]:02x}"
