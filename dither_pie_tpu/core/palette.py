"""Palette extraction: median-cut, k-means (jitted Lloyd's), uniform cube.

Parity notes (vs /root/reference/dithering_lib.py:1807-1872):

* ``median_cut_palette`` mirrors the reference recursion exactly: unique
  colors via a Python ``set`` in row-major insertion order (same hash
  iteration order), dominant-channel stable sort, truncating integer average
  at the leaves, ``depth = floor(log2(num_colors))``.
* The reference's k-means path is *nondeterministic* for images over 10k
  pixels (it subsamples with the unseeded global ``random`` module and runs
  sklearn's KMeans). We instead use a seeded subsample and a jitted
  kmeans++/Lloyd implementation on device — deterministic by construction,
  perceptually equivalent. ``random_state`` seeds both.
  ``DITHER_PIE_TPU_KMEANS=sklearn`` opts into the reference's exact
  algorithm instead (unseeded stdlib subsample + sklearn KMeans +
  truncating int cast, /root/reference/dithering_lib.py:1846-1857) for
  users who need palettes from the reference's own distribution —
  bit-identical to a reference run for images <= 10k pixels, same
  sampling nondeterminism above that. Requires sklearn.
* ``uniform_palette`` reproduces the reference's cube walk including its
  inner-loop-only break quirk.
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

RGB = Tuple[int, int, int]


# ---------------------------------------------------------------------------
# Median cut (host — tiny recursive sort workload, not worth a device kernel)
# ---------------------------------------------------------------------------


def _dominant_channel(colors: List[RGB]) -> int:
    best_rng, best_ch = -1, 0
    for ch in range(3):
        vals = [c[ch] for c in colors]
        rng = max(vals) - min(vals)
        if rng > best_rng:
            best_rng, best_ch = rng, ch
    return best_ch


def _median_cut(colors: List[RGB], depth: int) -> List[RGB]:
    if depth == 0 or len(colors) == 0:
        if not colors:
            return [(0, 0, 0)]
        # Truncating int() average per channel, as the reference does.
        avg = tuple(int(sum(c) / len(c)) for c in zip(*colors))
        return [avg]
    channel = _dominant_channel(colors)
    colors.sort(key=lambda x: x[channel])  # stable
    mid = len(colors) // 2
    return _median_cut(colors[:mid], depth - 1) + _median_cut(colors[mid:], depth - 1)


def median_cut_palette(rgb_u8: np.ndarray, num_colors: int) -> List[RGB]:
    """Median-cut palette from an (H, W, 3) uint8 array."""
    if num_colors < 1:
        num_colors = 1
    # list(set(...)) over row-major python int tuples reproduces the
    # reference's `list(set(image.getdata()))` iteration order.
    flat = rgb_u8.reshape(-1, 3).tolist()
    unique_cols = list(set(map(tuple, flat)))
    depth = int(math.log2(num_colors)) if num_colors > 1 else 0
    return _median_cut(unique_cols, depth)


# ---------------------------------------------------------------------------
# k-means (device)
# ---------------------------------------------------------------------------


def _pairwise_sq(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    c2 = jnp.sum(c * c, axis=-1)[None, :]
    xc = jnp.dot(x, c.T, precision=jax.lax.Precision.HIGHEST)
    return x2 - 2.0 * xc + c2


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans_fit(points: jnp.ndarray, key: jax.Array, k: int, iters: int = 64) -> jnp.ndarray:
    """kmeans++ init + Lloyd iterations, fully on device.

    ``points``: (M, 3) float32. Returns (k, 3) float32 centers.
    """
    m = points.shape[0]

    # --- kmeans++ seeding: sample proportionally to squared distance.
    def seed_step(carry, key_i):
        centers, min_d, i = carry
        logits = jnp.log(jnp.maximum(min_d, 1e-12))
        idx = jax.random.categorical(key_i, logits)
        new_c = points[idx]
        centers = centers.at[i].set(new_c)
        d_new = jnp.sum((points - new_c[None, :]) ** 2, axis=-1)
        return (centers, jnp.minimum(min_d, d_new), i + 1), None

    key0, key_rest = jax.random.split(key)
    first = points[jax.random.randint(key0, (), 0, m)]
    centers0 = jnp.zeros((k, 3), jnp.float32).at[0].set(first)
    min_d0 = jnp.sum((points - first[None, :]) ** 2, axis=-1)
    (centers, _, _), _ = jax.lax.scan(
        seed_step,
        (centers0, min_d0, 1),
        jax.random.split(key_rest, k - 1),
    )

    # --- Lloyd iterations.
    def lloyd(_, centers):
        d = _pairwise_sq(points, centers)  # (M, k)
        assign = jnp.argmin(d, axis=-1)
        one_hot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # (M, k)
        counts = jnp.sum(one_hot, axis=0)  # (k,)
        sums = jnp.dot(one_hot.T, points, precision=jax.lax.Precision.HIGHEST)
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty clusters keep their previous center.
        return jnp.where(counts[:, None] > 0, new_centers, centers)

    return jax.lax.fori_loop(0, iters, lloyd, centers)


def _kmeans_palette_sklearn(
    rgb_u8: np.ndarray, num_colors: int, random_state: int, sample_cap: int
) -> List[RGB]:
    """The reference's exact k-means path
    (/root/reference/dithering_lib.py:1846-1857): unseeded stdlib
    ``random.sample`` subsample above the cap, sklearn KMeans with the
    given random_state, truncating int cast of the centers. Bit-identical
    to a reference run when no sampling happens (<= cap pixels)."""
    import random

    from sklearn.cluster import KMeans

    pix = rgb_u8.reshape(-1, 3)
    if len(pix) > sample_cap:
        idx = random.sample(range(len(pix)), sample_cap)
        pix = pix[idx]
    km = KMeans(n_clusters=max(1, min(int(num_colors), len(pix))),
                random_state=random_state)
    km.fit(pix)
    out = [tuple(int(v) for v in c) for c in km.cluster_centers_.astype(int)]
    while len(out) < num_colors:
        out.append(out[-1])
    return out


def kmeans_palette(
    rgb_u8: np.ndarray,
    num_colors: int,
    random_state: int = 42,
    sample_cap: int = 10_000,
) -> List[RGB]:
    """k-means palette from an (H, W, 3) uint8 array (seeded, deterministic).

    Keeps the reference's <=10k-pixel subsample cap
    (/root/reference/dithering_lib.py:1850-1853) but with a seeded sampler.
    ``DITHER_PIE_TPU_KMEANS=sklearn`` routes to the reference's exact
    sklearn algorithm instead (see module docstring).
    """
    import os

    if os.environ.get("DITHER_PIE_TPU_KMEANS", "").lower() in (
            "sklearn", "reference"):
        return _kmeans_palette_sklearn(rgb_u8, num_colors, random_state,
                                       sample_cap)

    from dither_pie_tpu.api.runtime import jax_platform

    jax_platform()  # resolve backend (CPU fallback) before the jitted fit
    pix = rgb_u8.reshape(-1, 3)
    if len(pix) > sample_cap:
        rng = np.random.RandomState(random_state)
        idx = rng.choice(len(pix), size=sample_cap, replace=False)
        pix = pix[idx]
    k = max(1, min(int(num_colors), len(pix)))
    pts = jnp.asarray(pix, dtype=jnp.float32)
    centers = _kmeans_fit(pts, jax.random.PRNGKey(random_state), k)
    centers_np = np.asarray(jax.device_get(centers)).astype(int)
    out = [tuple(int(v) for v in c) for c in centers_np]
    # Pad (degenerate tiny inputs) so callers always get num_colors entries.
    while len(out) < num_colors:
        out.append(out[-1])
    return out


# ---------------------------------------------------------------------------
# Uniform cube
# ---------------------------------------------------------------------------


def uniform_palette(num_colors: int) -> List[RGB]:
    """Uniform RGB-cube palette, faithful to the reference's walk
    (/root/reference/dithering_lib.py:1860-1872) including the break quirk
    that only exits the innermost loop."""
    c: List[RGB] = []
    cube = int(math.ceil(num_colors ** (1 / 3)))
    for r in range(cube):
        for g in range(cube):
            for b in range(cube):
                if len(c) >= num_colors:
                    break
                rr = int(r * 255 / (cube - 1)) if cube > 1 else 128
                gg = int(g * 255 / (cube - 1)) if cube > 1 else 128
                bb = int(b * 255 / (cube - 1)) if cube > 1 else 128
                c.append((rr, gg, bb))
    return c[:num_colors]


def as_palette_array(palette: List[RGB]) -> np.ndarray:
    """List of RGB tuples -> (P, 3) float32 array; singleton palettes are
    padded by duplicating the color so top-2 queries stay well-defined."""
    arr = np.asarray(palette, dtype=np.float32)
    if arr.ndim != 2 or arr.shape[1] != 3:
        raise ValueError(f"palette must be (P, 3), got {arr.shape}")
    if arr.shape[0] == 1:
        arr = np.concatenate([arr, arr], axis=0)
    return arr
