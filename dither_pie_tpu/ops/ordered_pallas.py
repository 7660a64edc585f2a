"""Fused Pallas ordered-dither kernel — the GPix/s-class path.

The XLA version (ops/ordered.py) materializes the (N, P) distance matrix in
HBM (~P x 4 bytes per pixel, plus re-reads for the two argmin passes) and
finishes with a scalar gather. This kernel streams planar uint8 row-blocks
once and does everything in VMEM: a static palette loop maintains running
(d1, i1, d2, i2), the distance-ratio screen test picks the index, and a
second palette loop materializes the output colors — uint8 in, uint8 out,
~7 bytes of HBM traffic per pixel total.

Semantics identical to ops/ordered.py: exact integer squared distances in
f32, lowest-index tie-break, factor = d1/(d1+d2) <= screen -> nearest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _build(p_count: int, th: int, wp: int, emit_idx: bool = False):
    def kernel(img_ref, screen_ref, pal_ref, out_ref):
        # Mosaic has no direct u8<->f32 casts; hop through int32.
        r = img_ref[0].astype(jnp.int32).astype(jnp.float32)  # (th, wp)
        g = img_ref[1].astype(jnp.int32).astype(jnp.float32)
        b = img_ref[2].astype(jnp.int32).astype(jnp.float32)

        d1 = jnp.full((th, wp), jnp.inf, jnp.float32)
        d2 = jnp.full((th, wp), jnp.inf, jnp.float32)
        i1 = jnp.zeros((th, wp), jnp.int32)
        i2 = jnp.zeros((th, wp), jnp.int32)

        for p in range(p_count):  # static unroll; palette scalars from SMEM
            dr = r - pal_ref[0, p]
            dg = g - pal_ref[1, p]
            db = b - pal_ref[2, p]
            d = dr * dr + dg * dg + db * db
            better1 = d < d1
            better2 = jnp.logical_and(jnp.logical_not(better1), d < d2)
            d2 = jnp.where(better1, d1, jnp.where(better2, d, d2))
            i2 = jnp.where(better1, i1, jnp.where(better2, p, i2))
            d1 = jnp.where(better1, d, d1)
            i1 = jnp.where(better1, p, i1)

        tot = d1 + d2
        factor = jnp.where(tot == 0, 0.0, d1 / tot)
        idx = jnp.where(factor <= screen_ref[...], i1, i2)

        if emit_idx:
            # Index stream: 1 byte/pixel out, no select loop — the host
            # reconstructs colors with one exact palette gather. p_count
            # <= 256 so the u8 cast is lossless (sentinels never win).
            out_ref[0] = idx.astype(jnp.uint8)
            return

        # Materialize palette colors with a second static select loop.
        ro = jnp.zeros((th, wp), jnp.float32)
        go = jnp.zeros((th, wp), jnp.float32)
        bo = jnp.zeros((th, wp), jnp.float32)
        for p in range(p_count):
            hit = idx == p
            ro = jnp.where(hit, pal_ref[0, p], ro)
            go = jnp.where(hit, pal_ref[1, p], go)
            bo = jnp.where(hit, pal_ref[2, p], bo)
        out_ref[0] = ro.astype(jnp.int32).astype(jnp.uint8)
        out_ref[1] = go.astype(jnp.int32).astype(jnp.uint8)
        out_ref[2] = bo.astype(jnp.int32).astype(jnp.uint8)

    return kernel


_W_BUCKETS = [128, 256, 512, 768, 1024, 1280, 1536, 1920, 2560, 3840, 4096,
              5120, 7680, 8192]
_ROW_BUCKETS = [128, 256, 512, 1024, 2048, 4096, 8192, 9216, 16384, 18432,
                32768, 65536]


def _bucketed(x: int, buckets) -> int:
    for b in buckets:
        if x <= b:
            return b
    return _round_up(x, buckets[-1])


@functools.lru_cache(maxsize=32)
def _compiled_padded(p_count: int, rp: int, wp: int, th: int, interpret: bool,
                     emit_idx: bool = False):
    kernel = _build(p_count, th, wp, emit_idx)
    ch = 1 if emit_idx else 3
    return pl.pallas_call(
        kernel,
        grid=(rp // th,),
        in_specs=[
            pl.BlockSpec((3, th, wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # palette (3, p)
        ],
        out_specs=pl.BlockSpec((ch, th, wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ch, rp, wp), jnp.uint8),
        interpret=interpret,
    )


def _compiled(p_count: int, rows: int, w: int, interpret: bool,
              bucket: bool = True, emit_idx: bool = False):
    wp = _round_up(w, LANE)
    if bucket:
        # Collapse nearby shapes onto one compiled program (compiles via the
        # dev tunnel cost minutes; padded lanes/rows just compute garbage
        # that the caller slices off).
        wp = _bucketed(wp, _W_BUCKETS)
        p_count = max(2, 1 << (p_count - 1).bit_length())
    # ~14 live (th, wp) f32 buffers; keep the working set well under VMEM.
    th = max(32, min(256, (5 * 1024 * 1024) // (wp * 4 * 14) // 32 * 32))
    rp = _round_up(rows, th)
    if bucket:
        rp = _round_up(_bucketed(rp, _ROW_BUCKETS), th)
    call = _compiled_padded(p_count, rp, wp, th, interpret, emit_idx)
    return call, th, wp, rp


@functools.partial(jax.jit, static_argnames=("rp", "wp"))
def _prep_planar_u8(images: jnp.ndarray, rp: int, wp: int):
    """(B, H, W, 3) u8 -> (3, rp, wp) planar padded.

    Built from 2D (rows, w) intermediates only: XLA's layout assignment can
    pick a channel-minor layout ({0,2,1}) for a materialized (3, N, W) u8
    array, which tile-pads it 42x (26 GB at 100x1080p). 2D arrays always
    get the sane {1,0} layout, and the final reshape to 3D is layout-free."""
    b, h, w, _ = images.shape
    planes = [jnp.pad(images[..., c].reshape(b * h, w).astype(jnp.uint8),
                      ((0, rp - b * h), (0, wp - w)))
              for c in range(3)]
    return jnp.concatenate(planes, axis=0).reshape(3, rp, wp)


def _pad_palette_sentinel(palette: jnp.ndarray, p_pad: int) -> jnp.ndarray:
    """(P, 3) -> (3, p_pad) with far-away sentinels that never win argmin."""
    pal = jnp.asarray(palette, jnp.float32)
    if p_pad > pal.shape[0]:
        pad = jnp.full((p_pad - pal.shape[0], 3), 1.0e6, jnp.float32)
        pal = jnp.concatenate([pal, pad], axis=0)
    return pal.T


def ordered_dither_fused(images: jnp.ndarray, palette: jnp.ndarray,
                         screen: jnp.ndarray, interpret: bool | None = None,
                         bucket: bool = True,
                         return_indices: bool = False) -> jnp.ndarray:
    """(B, H, W, 3) u8 frames + (P, 3) palette + (H, W) screen -> (B, H, W, 3) u8.

    ``bucket=False`` compiles for the exact shape (steady-state video /
    benchmarks); the default buckets shapes to limit recompiles.

    ``return_indices=True`` (P <= 256): returns (B, H, W) u8 palette
    indices — 1 byte/pixel off the device; ``palette_u8[idx]`` is exactly
    the color output.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, w, _ = images.shape
    p_count = int(palette.shape[0])
    if return_indices and p_count > 256:
        raise ValueError("return_indices requires a palette <= 256 colors")
    call, th, wp, rp = _compiled(p_count, b * h, w, bool(interpret), bucket,
                                 return_indices)

    planar = _prep_planar_u8(jnp.asarray(images), rp, wp)
    screen_full = jnp.tile(jnp.asarray(screen, jnp.float32), (b, 1))
    screen_full = jnp.pad(screen_full, ((0, rp - b * h), (0, wp - w)))
    pal_smem = _pad_palette_sentinel(palette, max(
        p_count, (max(2, 1 << (p_count - 1).bit_length()) if bucket else p_count)))

    out = call(planar, screen_full, pal_smem)  # (ch, rp, wp) u8
    if return_indices:
        return out[0, : b * h, : w].reshape(b, h, w)
    out = out[:, : b * h, : w].reshape(3, b, h, w).transpose(1, 2, 3, 0)
    return out
