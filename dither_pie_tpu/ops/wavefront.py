"""Pallas anti-diagonal wavefront error diffusion for TPU.

Error diffusion is a 2-D sequential recurrence: pixel (x, y) depends on
already-scanned neighbors. Row-major scans admit wavefront parallelism: with
the skew d = x + s*y (s chosen so every kernel offset (dx, dy) satisfies
dx + s*dy >= 1), all pixels on wavefront d depend only on wavefronts < d and
can be processed simultaneously — one vector of up to H pixels per step.

Layout ("skewed image"): column d of the skewed tensor holds pixels
{(y, d - s*y)}. The kernel runs a sequential grid over d; Pallas pipelines
the HBM->VMEM streaming of skewed columns automatically. Carried state is a
circular buffer of future-error slots (delta = dx + s*dy in [1, dmax]) that
lives in VMEM scratch across grid steps.

Batching folds frames into the lane axis (Hp per frame, padded so row-shift
rolls cannot leak across frame boundaries), so a batch of B frames costs the
same number of sequential steps as one frame — the key to video throughput.

Variants are compile-time specializations of one kernel builder:
  * the 8 fixed-weight kernels (weights baked in),
  * Ostromoukhov (256-entry coefficient LUT applied via one-hot matmul),
  * hybrid (3x3 luma/chroma error projection),
  * perceptual (per-source-pixel sensitivity scaling, streamed alongside),
  * adaptive-variance (per-pixel gate, streamed alongside).

Serpentine scans have no wavefront (each reversed row depends on the LAST
pixel of the previous row) and stay on the native engine.

Numerical note: palette search here is float32 (the reference's KDTree is
float64). Error diffusion is chaotic, so isolated argmin flips at near-ties
diverge locally; outputs are perceptually matched, not bit-equal, to the
host engine — see tests/test_wavefront.py for both the bit-exact mechanics
check (vs a NumPy twin of this exact arithmetic) and the perceptual checks.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dither_pie_tpu.ops.ed_kernels import OSTROMOUKHOV_ARRAY, get_kernel

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _skew_params(weights: Sequence[Tuple[int, int, float]]) -> Tuple[int, int]:
    """(s, n_slots): minimal skew s.t. dx + s*dy >= 1 for all offsets, and
    the circular-buffer depth max(dx + s*dy) + 1."""
    s = 1
    for dx, dy, _ in weights:
        if dy > 0:
            s = max(s, math.ceil((1 - dx) / dy))
        elif dx < 1:
            raise ValueError("same-row offsets must have dx >= 1")
    dmax = max(dx + s * dy for dx, dy, _ in weights)
    return s, dmax + 1


# Fixed-weight variants, pre-divided float32 weights.
def _fixed_entries(variant: str):
    k = get_kernel(variant)
    return [(dx, dy, np.float32(w / k["divisor"])) for dx, dy, w in k["weights"]]


_FS_ENTRIES = [(1, 0, np.float32(7 / 16)), (-1, 1, np.float32(3 / 16)),
               (0, 1, np.float32(5 / 16)), (1, 1, np.float32(1 / 16))]


def _chunk_for(n_slots: int) -> int:
    """Steps per grid iteration: a multiple of n_slots (so every chunk
    starts at slot 0 and ALL slot indices are compile-time constants),
    at least 8 to amortize grid/DMA overhead."""
    c = n_slots
    while c < 8:
        c += n_slots
    return c


def _build_kernel(mode: str, variant: str, s: int, n_slots: int, d_pad: int,
                  chunk: int, hp: int, pp: int, h_frame: int, h_real: int,
                  w_real: int, lum_factor: float = 1.0, col_factor: float = 0.2,
                  interpret: bool = False):
    """Returns the pallas_call for a given static configuration.

    mode in {fixed, ostromoukhov, hybrid, perceptual, adaptive}.
    hp: total folded lane extent (frames * h_frame). pp: padded palette size.
    Streams `chunk` skewed columns per grid iteration; the error state
    (n_slots, 3, hp) persists in VMEM scratch across iterations.
    """
    if mode == "fixed":
        entries = _fixed_entries(variant)
    elif mode == "ostromoukhov":
        entries = None  # handled specially
    else:
        entries = _FS_ENTRIES

    clamp_before = mode in ("fixed", "ostromoukhov", "hybrid")
    has_aux_stream = mode in ("perceptual", "adaptive")

    def kernel(img_ref, pal_ref, aux_ref, idx_ref, err_buf):
        g = pl.program_id(0)

        # Scratch is uninitialized; clear every slot on the first iteration.
        @pl.when(g == 0)
        def _():
            err_buf[...] = jnp.zeros((n_slots, 3, hp), jnp.float32)

        pal = pal_ref[:]  # (pp, 3) — padded entries hold +1e6 sentinels
        y_iota = jax.lax.broadcasted_iota(jnp.int32, (1, hp), 1)
        y_local = jax.lax.rem(y_iota, h_frame)
        base = g * chunk

        for j in range(chunk):  # static unroll; slot = j % n_slots (static)
            slot = j % n_slots
            d = base + j
            col = d - s * y_local
            active_f = ((col >= 0) & (col < w_real)
                        & (y_local < h_real)).astype(jnp.float32)

            cur = img_ref[:, j, :] + err_buf[slot]  # (3, hp)
            if clamp_before:
                cur = jnp.clip(cur, 0.0, 255.0)

            # Palette search: (pp, hp) squared distances on the VPU.
            d2 = jnp.zeros((pp, hp), jnp.float32)
            for c in range(3):
                diff = pal[:, c:c + 1] - cur[c:c + 1, :]
                d2 = d2 + diff * diff
            idx = jnp.argmin(d2, axis=0, keepdims=True).astype(jnp.int32)

            p_iota = jax.lax.broadcasted_iota(jnp.int32, (pp, hp), 0)
            onehot = (p_iota == idx).astype(jnp.float32)
            chosen = jnp.concatenate(
                [jnp.sum(pal[:, c:c + 1] * onehot, axis=0, keepdims=True)
                 for c in range(3)], axis=0)  # (3, hp)

            err = (cur - chosen) * active_f
            idx_ref[j, :] = idx[0]

            # Consume (zero) the current slot before pushing future error.
            err_buf[slot] = jnp.zeros((3, hp), jnp.float32)

            if mode == "perceptual" or mode == "adaptive":
                err = err * aux_ref[:, j, :]  # (1, hp) sensitivity / gate
            elif mode == "hybrid":
                lum_err = (jnp.float32(0.299) * err[0:1]
                           + jnp.float32(0.587) * err[1:2]
                           + jnp.float32(0.114) * err[2:3])  # (1, hp)
                err_lum = jnp.concatenate(
                    [jnp.float32(0.299) * lum_err, jnp.float32(0.587) * lum_err,
                     jnp.float32(0.114) * lum_err], axis=0)
                err = (jnp.float32(lum_factor) * err_lum
                       + jnp.float32(col_factor) * (err - err_lum))

            def push(delta: int, dy: int, contrib):
                if dy:
                    contrib = jnp.roll(contrib, dy, axis=1)
                    contrib = jnp.where(y_iota >= dy, contrib, 0.0)
                err_buf[(j + delta) % n_slots] += contrib  # static index

            if mode == "ostromoukhov":
                lum = jnp.clip(
                    jnp.float32(0.299) * cur[0:1] + jnp.float32(0.587) * cur[1:2]
                    + jnp.float32(0.114) * cur[2:3], 0.0, 255.0)
                li = lum.astype(jnp.int32)  # truncation, as the reference
                l_iota = jax.lax.broadcasted_iota(jnp.int32, (256, hp), 0)
                l_onehot = (l_iota == li).astype(jnp.float32)
                table = aux_ref[:]  # (256, 3) float32 raw coefficients
                c0 = jnp.sum(table[:, 0:1] * l_onehot, axis=0, keepdims=True)
                c1 = jnp.sum(table[:, 1:2] * l_onehot, axis=0, keepdims=True)
                c2 = jnp.sum(table[:, 2:3] * l_onehot, axis=0, keepdims=True)
                div = c0 + c1 + c2
                safe = jnp.where(div == 0, 1.0, div)
                w0 = jnp.where(div == 0, 0.0, c0 / safe)
                w1 = jnp.where(div == 0, 0.0, c1 / safe)
                w2 = jnp.where(div == 0, 0.0, c2 / safe)
                push(1, 0, err * w0)       # (x+1, y)      delta = 1
                push(s - 1, 1, err * w1)   # (x-1, y+1)    delta = s-1
                push(s, 1, err * w2)       # (x,   y+1)    delta = s
            else:
                for dx, dy, wq in entries:
                    push(dx + s * dy, dy, err * wq)

    n_chunks = d_pad // chunk
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((3, chunk, hp), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # palette (pp, 3)
            (pl.BlockSpec((1, chunk, hp), lambda g: (0, g, 0), memory_space=pltpu.VMEM)
             if has_aux_stream
             else pl.BlockSpec(memory_space=pltpu.VMEM)),  # table or dummy
        ],
        out_specs=pl.BlockSpec((chunk, hp), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_pad, hp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((n_slots, 3, hp), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


# ---------------------------------------------------------------------------
# Host-facing wrappers: skew / run / unskew, shape-specialized + jitted.
# ---------------------------------------------------------------------------


def _plan(h: int, w: int, p: int, batch: int, s: int, chunk: int):
    h_frame = _round_up(h + 4, LANE)  # +4 dead rows so dy<=2 rolls can't leak
    hp = h_frame * batch
    pp = _round_up(max(p, 8), 8)
    d_pad = _round_up(w + s * (h - 1), chunk)
    return h_frame, hp, pp, d_pad


@functools.partial(jax.jit, static_argnames=("s", "h_frame", "d_pad"))
def _skew(images: jnp.ndarray, s: int, h_frame: int, d_pad: int) -> jnp.ndarray:
    """(B, H, W, C) f32 -> (C, d_pad, B*h_frame) skewed, zeros outside."""
    b, h, w, c = images.shape
    d_idx = jnp.arange(d_pad)[:, None]
    y_idx = jnp.arange(h_frame)[None, :]
    col = d_idx - s * y_idx  # (d_pad, h_frame)
    valid = (col >= 0) & (col < w) & (y_idx < h)
    colc = jnp.clip(col, 0, w - 1)
    rowc = jnp.clip(y_idx, 0, h - 1)
    g = images[:, rowc, colc, :]  # (B, d_pad, h_frame, C)
    g = jnp.where(valid[None, :, :, None], g, 0.0)
    return g.transpose(3, 1, 0, 2).reshape(c, d_pad, b * h_frame)


@functools.partial(jax.jit, static_argnames=("s", "h_frame", "h", "w"))
def _unskew_idx(idx_skew: jnp.ndarray, s: int, h_frame: int, h: int, w: int) -> jnp.ndarray:
    """(d_pad, B*h_frame) int32 -> (B, H, W) palette indices."""
    d_pad = idx_skew.shape[0]
    b = idx_skew.shape[1] // h_frame
    flat = idx_skew.reshape(d_pad, b, h_frame)
    y_idx = jnp.arange(h)[:, None]
    x_idx = jnp.arange(w)[None, :]
    d_of = x_idx + s * y_idx  # (H, W)
    return flat[d_of, :, y_idx].transpose(2, 0, 1)  # (B, H, W)


def _pad_palette(pal: np.ndarray, pp: int) -> np.ndarray:
    """(P, 3) -> (pp, 3) with far-away sentinel colors in the padding."""
    out = np.full((pp, 3), 1.0e6, dtype=np.float32)
    out[: pal.shape[0]] = pal
    return out


@functools.lru_cache(maxsize=64)
def _compiled(mode: str, variant: str, h: int, w: int, p: int, batch: int,
              lum_factor: float, col_factor: float, interpret: bool):
    if mode == "fixed":
        s, n_slots = _skew_params(get_kernel(variant)["weights"])
    elif mode == "ostromoukhov":
        s, n_slots = 2, 3
    else:
        s, n_slots = _skew_params([(1, 0, 7), (-1, 1, 3), (0, 1, 5), (1, 1, 1)])
    chunk = _chunk_for(n_slots)
    h_frame, hp, pp, d_pad = _plan(h, w, p, batch, s, chunk)
    call = _build_kernel(mode, variant, s, n_slots, d_pad, chunk, hp, pp,
                         h_frame, h, w, lum_factor, col_factor,
                         interpret=interpret)
    return call, s, h_frame, hp, pp, d_pad


def _run(mode: str, images: np.ndarray, palette: np.ndarray, variant: str = "",
         aux: Optional[np.ndarray] = None, lum_factor: float = 1.0,
         col_factor: float = 0.2, interpret: Optional[bool] = None) -> np.ndarray:
    """images (B, H, W, 3) f32; aux (B, H, W) f32 or None. Returns (B, H, W, 3)
    f32 palette colors."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, w, _ = images.shape
    p = palette.shape[0]
    call, s, h_frame, hp, pp, d_pad = _compiled(
        mode, variant, h, w, p, b, float(lum_factor), float(col_factor), interpret)

    img_skew = _skew(jnp.asarray(images, jnp.float32), s, h_frame, d_pad)
    pal_dev = jnp.asarray(_pad_palette(palette.astype(np.float32), pp))

    if mode in ("perceptual", "adaptive"):
        aux_skew = _skew(jnp.asarray(aux.astype(np.float32))[..., None],
                         s, h_frame, d_pad)
    elif mode == "ostromoukhov":
        aux_skew = jnp.asarray(OSTROMOUKHOV_ARRAY.astype(np.float32))
    else:
        aux_skew = jnp.zeros((1, 8), jnp.float32)  # unused dummy

    idx_skew = call(img_skew, pal_dev, aux_skew)
    idx = _unskew_idx(idx_skew, s, h_frame, h, w)  # (B, H, W)
    out = jnp.take(jnp.asarray(palette, jnp.float32), idx.reshape(-1), axis=0)
    return np.asarray(out).reshape(b, h, w, 3)


# ---------------------------------------------------------------------------
# Public single-image entry points (strategy dispatch targets).
# ---------------------------------------------------------------------------


def ed_fixed_wavefront(img: np.ndarray, palette: np.ndarray, variant: str) -> np.ndarray:
    return _run("fixed", img[None], palette, variant=variant)[0]


def ed_ostromoukhov_wavefront(img: np.ndarray, palette: np.ndarray) -> np.ndarray:
    return _run("ostromoukhov", img[None], palette)[0]


def ed_hybrid_wavefront(img: np.ndarray, palette: np.ndarray,
                        lum_factor: float, col_factor: float) -> np.ndarray:
    return _run("hybrid", img[None], palette,
                lum_factor=lum_factor, col_factor=col_factor)[0]


def ed_perceptual_wavefront(img: np.ndarray, palette: np.ndarray) -> np.ndarray:
    gray = (np.float32(0.299) * img[:, :, 0] + np.float32(0.587) * img[:, :, 1]
            + np.float32(0.114) * img[:, :, 2])
    sens = np.float32(0.5) + np.float32(0.5) * (gray / np.float32(255.0))
    return _run("perceptual", img[None], palette, aux=sens[None])[0]


def ed_adaptive_wavefront(img: np.ndarray, palette: np.ndarray,
                          gate: np.ndarray) -> np.ndarray:
    return _run("adaptive", img[None], palette, aux=gate.astype(np.float32)[None])[0]


def ed_batch_wavefront(images: np.ndarray, palette: np.ndarray, mode: str = "fixed",
                       variant: str = "floyd_steinberg", **kw) -> np.ndarray:
    """Batched entry for the video pipeline: (B, H, W, 3) in one scan."""
    if mode in ("perceptual",):
        gray = (np.float32(0.299) * images[..., 0] + np.float32(0.587) * images[..., 1]
                + np.float32(0.114) * images[..., 2])
        kw["aux"] = np.float32(0.5) + np.float32(0.5) * (gray / np.float32(255.0))
    return _run(mode, images, palette, variant=variant, **kw)
