"""Host-side error-diffusion entry points.

These wrap the native C++ engine (dither_pie_tpu/native/ed_scan.cpp); when no
compiler is available they fall back to a NumPy scan with identical
semantics. The TPU wavefront kernel (ops/wavefront.py) is layered on
top by the strategy dispatcher in api/ditherer.py.

All functions take/return float32 (H, W, 3) arrays in [0, 255]-ish range
(values may exceed it transiently, as in the reference) and the palette as a
(P, 3) float32 array.
"""

from __future__ import annotations

import numpy as np

from dither_pie_tpu.native.build import get_lib
from dither_pie_tpu.ops.ed_kernels import OSTROMOUKHOV_ARRAY, kernel_arrays
from dither_pie_tpu.ops.hilbert import hilbert_path, next_power_of_two

# Largest palette the C++ f32 twins serve (ed_scan.cpp MAX_PAL): covers the
# packed kernel's PACKED_PALETTE_MAX (1024) AND the v1 fallback beyond it,
# so every device-reachable palette size gates on a tie-robust f32 golden.
F32_TWIN_MAX_PAL = 4096


def _nearest(pal: np.ndarray, v: np.ndarray) -> int:
    d = np.sum((pal.astype(np.float64) - v.astype(np.float64)) ** 2, axis=1)
    return int(np.argmin(d))


def ed_fixed(
    work: np.ndarray,
    palette: np.ndarray,
    variant: str = "atkinson",
    serpentine: bool = False,
) -> np.ndarray:
    """Fixed-weight error diffusion (8 classic kernels)."""
    work = np.ascontiguousarray(work, dtype=np.float32)
    pal = np.ascontiguousarray(palette, dtype=np.float32)
    offs, wts = kernel_arrays(variant)
    lib = get_lib()
    h, w, _ = work.shape
    if lib is not None:
        lib.ed_fixed(work, h, w, pal, pal.shape[0], offs, wts, len(wts), int(serpentine))
        return work
    # NumPy fallback (slow; semantics-identical).
    for y in range(h):
        xs = range(w - 1, -1, -1) if (serpentine and y % 2 == 1) else range(w)
        dirx = -1 if (serpentine and y % 2 == 1) else 1
        for x in xs:
            np.clip(work[y, x], 0, 255, out=work[y, x])
            old = work[y, x].copy()
            bi = _nearest(pal, old)
            work[y, x] = pal[bi]
            err = old - pal[bi]
            for k in range(len(wts)):
                nx, ny = x + int(offs[k, 0]) * dirx, y + int(offs[k, 1])
                if 0 <= nx < w and 0 <= ny < h:
                    work[ny, nx] += err * wts[k]
    np.clip(work, 0, 255, out=work)
    return work


def ed_fixed_fast(
    work: np.ndarray,
    palette: np.ndarray,
    variant: str = "atkinson",
    serpentine: bool = False,
) -> np.ndarray:
    """SIMD f32 fast path (video throughput): distances in float32, matching
    the reference's Numba-path semantics (dithering_lib.py:240-252) instead
    of the exact path's f64 KDTree ordering. Falls back to the exact engine
    for >F32_TWIN_MAX_PAL-color palettes or when the native lib is
    unavailable (4096 covers the packed kernel's PACKED_PALETTE_MAX and
    the v1 fallback beyond it, so every device palette size has a
    tie-robust f32 golden)."""
    if palette.shape[0] > F32_TWIN_MAX_PAL:
        return ed_fixed(work, palette, variant, serpentine)
    lib = get_lib()
    if lib is None:
        return ed_fixed(work, palette, variant, serpentine)
    work = np.ascontiguousarray(work, dtype=np.float32)
    pal = np.ascontiguousarray(palette, dtype=np.float32)
    offs, wts = kernel_arrays(variant)
    h, w, _ = work.shape
    lib.ed_fixed_f32(work, h, w, pal, pal.shape[0], offs, wts, len(wts),
                     int(serpentine))
    return work


def ed_ostromoukhov_fast(
    work: np.ndarray, palette: np.ndarray, serpentine: bool = False
) -> np.ndarray:
    """SIMD f32 fast path for Ostromoukhov (see ed_fixed_fast)."""
    if palette.shape[0] > F32_TWIN_MAX_PAL:
        return ed_ostromoukhov(work, palette, serpentine)
    lib = get_lib()
    if lib is None:
        return ed_ostromoukhov(work, palette, serpentine)
    work = np.ascontiguousarray(work, dtype=np.float32)
    pal = np.ascontiguousarray(palette, dtype=np.float32)
    h, w, _ = work.shape
    lib.ed_ostromoukhov_f32(work, h, w, pal, pal.shape[0],
                            np.ascontiguousarray(OSTROMOUKHOV_ARRAY),
                            int(serpentine))
    return work


def ed_hybrid_fast(
    work: np.ndarray,
    palette: np.ndarray,
    lum_factor: float = 1.0,
    col_factor: float = 0.2,
    clamp_before_lookup: bool = True,
) -> np.ndarray:
    """f32-lookup twin of ed_hybrid (see ed_fixed_fast): the wavefront
    kernel's exact palette-search semantics — agrees with the exact engine
    except on exact half-way palette ties."""
    lib = get_lib()
    if palette.shape[0] > F32_TWIN_MAX_PAL or lib is None:
        return ed_hybrid(work, palette, lum_factor, col_factor,
                         clamp_before_lookup)
    work = np.ascontiguousarray(work, dtype=np.float32)
    pal = np.ascontiguousarray(palette, dtype=np.float32)
    h, w, _ = work.shape
    lib.ed_hybrid_f32(work, h, w, pal, pal.shape[0], float(lum_factor),
                      float(col_factor), int(clamp_before_lookup))
    return work


def ed_perceptual_fast(work: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """f32-lookup twin of ed_perceptual (see ed_hybrid_fast)."""
    lib = get_lib()
    if palette.shape[0] > F32_TWIN_MAX_PAL or lib is None:
        return ed_perceptual(work, palette)
    work = np.ascontiguousarray(work, dtype=np.float32)
    pal = np.ascontiguousarray(palette, dtype=np.float32)
    gray = (np.float32(0.299) * work[:, :, 0]
            + np.float32(0.587) * work[:, :, 1]
            + np.float32(0.114) * work[:, :, 2])
    sens = np.ascontiguousarray(
        np.float32(0.5) + np.float32(0.5) * (gray / np.float32(255.0)))
    h, w, _ = work.shape
    lib.ed_perceptual_f32(work, h, w, pal, pal.shape[0], sens)
    return work


def ed_adaptive_fast(
    work: np.ndarray, palette: np.ndarray, gate: np.ndarray
) -> np.ndarray:
    """f32-lookup twin of ed_adaptive (see ed_hybrid_fast)."""
    lib = get_lib()
    if palette.shape[0] > F32_TWIN_MAX_PAL or lib is None:
        return ed_adaptive(work, palette, gate)
    work = np.ascontiguousarray(work, dtype=np.float32)
    pal = np.ascontiguousarray(palette, dtype=np.float32)
    gate_u8 = np.ascontiguousarray(gate.astype(np.uint8))
    h, w, _ = work.shape
    lib.ed_adaptive_f32(work, h, w, pal, pal.shape[0], gate_u8)
    return work


def ed_riemersma_fast(work: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """SIMD f32 fast path for the Hilbert-curve scan (see ed_fixed_fast)."""
    if palette.shape[0] > F32_TWIN_MAX_PAL:
        return ed_riemersma(work, palette)
    lib = get_lib()
    if lib is None:
        return ed_riemersma(work, palette)
    work = np.ascontiguousarray(work, dtype=np.float32)
    pal = np.ascontiguousarray(palette, dtype=np.float32)
    h, w, _ = work.shape
    dim = next_power_of_two(max(h, w))
    path = np.ascontiguousarray(hilbert_path(dim))
    lib.ed_riemersma_f32(work, h, w, pal, pal.shape[0], path, path.shape[0])
    return work


def ed_ostromoukhov(
    work: np.ndarray, palette: np.ndarray, serpentine: bool = False
) -> np.ndarray:
    work = np.ascontiguousarray(work, dtype=np.float32)
    pal = np.ascontiguousarray(palette, dtype=np.float32)
    lib = get_lib()
    h, w, _ = work.shape
    if lib is not None:
        lib.ed_ostromoukhov(work, h, w, pal, pal.shape[0],
                            np.ascontiguousarray(OSTROMOUKHOV_ARRAY), int(serpentine))
        return work
    for y in range(h):
        xs = range(w - 1, -1, -1) if (serpentine and y % 2 == 1) else range(w)
        dirx = -1 if (serpentine and y % 2 == 1) else 1
        for x in xs:
            np.clip(work[y, x], 0, 255, out=work[y, x])
            old = work[y, x].copy()
            bi = _nearest(pal, old)
            work[y, x] = pal[bi]
            err = old - pal[bi]
            lum = np.float32(0.299) * old[0] + np.float32(0.587) * old[1] + np.float32(0.114) * old[2]
            ii = int(np.clip(lum, 0, 255))
            c0, c1, c2 = (int(v) for v in OSTROMOUKHOV_ARRAY[ii])
            div = c0 + c1 + c2
            if div == 0:
                continue
            nx = x + dirx
            if 0 <= nx < w:
                work[y, nx] += err * np.float32(c0 / div)
            if y + 1 < h:
                mx = x - dirx
                if 0 <= mx < w:
                    work[y + 1, mx] += err * np.float32(c1 / div)
                work[y + 1, x] += err * np.float32(c2 / div)
    np.clip(work, 0, 255, out=work)
    return work


def ed_hybrid(
    work: np.ndarray,
    palette: np.ndarray,
    lum_factor: float = 1.0,
    col_factor: float = 0.2,
    clamp_before_lookup: bool = True,
) -> np.ndarray:
    """Hybrid luma/chroma-split FS diffusion. ``clamp_before_lookup=True``
    matches the reference's Numba fast path; False its pure-Python path."""
    work = np.ascontiguousarray(work, dtype=np.float32)
    pal = np.ascontiguousarray(palette, dtype=np.float32)
    lib = get_lib()
    h, w, _ = work.shape
    if lib is not None:
        lib.ed_hybrid(work, h, w, pal, pal.shape[0],
                      float(lum_factor), float(col_factor), int(clamp_before_lookup))
        return work
    coef = np.array([0.299, 0.587, 0.114], dtype=np.float32)
    fs = [(1, 0, np.float32(7 / 16)), (-1, 1, np.float32(3 / 16)),
          (0, 1, np.float32(5 / 16)), (1, 1, np.float32(1 / 16))]
    lf, cf = np.float32(lum_factor), np.float32(col_factor)
    for y in range(h):
        for x in range(w):
            if clamp_before_lookup:
                np.clip(work[y, x], 0, 255, out=work[y, x])
            old = work[y, x].copy()
            bi = _nearest(pal, old)
            work[y, x] = pal[bi]
            err = old - pal[bi]
            lum_err = np.float32(0.299) * err[0] + np.float32(0.587) * err[1] + np.float32(0.114) * err[2]
            err_lum = coef * lum_err
            final_err = lf * err_lum + cf * (err - err_lum)
            for dx, dy, wq in fs:
                nx, ny = x + dx, y + dy
                if 0 <= nx < w and 0 <= ny < h:
                    work[ny, nx] += final_err * wq
    np.clip(work, 0, 255, out=work)
    return work


def ed_perceptual(work: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """FS diffusion with luminance-scaled weights; sensitivity map comes from
    the ORIGINAL image (reference computes gray_2d before the scan)."""
    work = np.ascontiguousarray(work, dtype=np.float32)
    pal = np.ascontiguousarray(palette, dtype=np.float32)
    gray = (np.float32(0.299) * work[:, :, 0] + np.float32(0.587) * work[:, :, 1]
            + np.float32(0.114) * work[:, :, 2])
    sens = np.float32(0.5) + np.float32(0.5) * (gray / np.float32(255.0))
    sens = np.ascontiguousarray(sens, dtype=np.float32)
    lib = get_lib()
    h, w, _ = work.shape
    if lib is not None:
        lib.ed_perceptual(work, h, w, pal, pal.shape[0], sens)
        return work
    fs = [(1, 0, np.float32(7 / 16)), (-1, 1, np.float32(3 / 16)),
          (0, 1, np.float32(5 / 16)), (1, 1, np.float32(1 / 16))]
    for y in range(h):
        for x in range(w):
            old = work[y, x].copy()
            bi = _nearest(pal, old)
            work[y, x] = pal[bi]
            err = old - pal[bi]
            s = sens[y, x]
            for dx, dy, wq in fs:
                nx, ny = x + dx, y + dy
                if 0 <= nx < w and 0 <= ny < h:
                    work[ny, nx] += err * (wq * s)
    np.clip(work, 0, 255, out=work)
    return work


def ed_adaptive(
    work: np.ndarray, palette: np.ndarray, gate: np.ndarray
) -> np.ndarray:
    """FS diffusion gated by a boolean (H, W) map (local variance test)."""
    work = np.ascontiguousarray(work, dtype=np.float32)
    pal = np.ascontiguousarray(palette, dtype=np.float32)
    gate_u8 = np.ascontiguousarray(gate.astype(np.uint8))
    lib = get_lib()
    h, w, _ = work.shape
    if lib is not None:
        lib.ed_adaptive(work, h, w, pal, pal.shape[0], gate_u8)
        return work
    for y in range(h):
        for x in range(w):
            old = work[y, x].copy()
            bi = _nearest(pal, old)
            work[y, x] = pal[bi]
            if not gate_u8[y, x]:
                continue
            err = old - pal[bi]
            if x + 1 < w:
                work[y, x + 1] += err * np.float32(7 / 16)
            if y + 1 < h and x > 0:
                work[y + 1, x - 1] += err * np.float32(3 / 16)
            if y + 1 < h:
                work[y + 1, x] += err * np.float32(5 / 16)
            if y + 1 < h and x + 1 < w:
                work[y + 1, x + 1] += err * np.float32(1 / 16)
    np.clip(work, 0, 255, out=work)
    return work


def ed_riemersma(work: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Error diffusion along a Hilbert curve covering the padded 2^k grid."""
    work = np.ascontiguousarray(work, dtype=np.float32)
    pal = np.ascontiguousarray(palette, dtype=np.float32)
    h, w, _ = work.shape
    dim = next_power_of_two(max(h, w))
    path = np.ascontiguousarray(hilbert_path(dim))
    lib = get_lib()
    if lib is not None:
        lib.ed_riemersma(work, h, w, pal, pal.shape[0], path, path.shape[0])
        return work
    fs = [np.float32(7 / 16), np.float32(1 / 16), np.float32(5 / 16), np.float32(3 / 16)]
    n = path.shape[0]
    for i in range(n):
        rr, cc = int(path[i, 0]), int(path[i, 1])
        if rr >= h or cc >= w:
            continue
        old = work[rr, cc].copy()
        bi = _nearest(pal, old)
        work[rr, cc] = pal[bi]
        err = old - pal[bi]
        for k in range(4):
            j = i + 1 + k
            if j < n:
                r2, c2 = int(path[j, 0]), int(path[j, 1])
                if r2 < h and c2 < w:
                    work[r2, c2] += err * fs[k]
                    np.clip(work[r2, c2], 0, 255, out=work[r2, c2])
    return work
