"""Wavelet-dither support: a self-contained 2-D single-level DWT/IDWT.

The environment ships no pywt; we implement the filter banks ourselves. The
scaling (rec_lo) coefficients below are the standard published Daubechies /
Symlet / Coiflet / biorthogonal-spline constants; the remaining filters
follow the usual quadrature-mirror relations, validated by the
perfect-reconstruction unit tests in tests/test_core.py.

Conventions follow pywt's defaults (mode='symmetric', single level), since
that is what the reference calls (/root/reference/dithering_lib.py:899-906):
  out_len = floor((n + L - 1) / 2)
and idwt output is cropped back to the original (h, w) by the caller.

The decomposition/reconstruction runs as device-side separable convolutions
(lax.conv_general_dilated with stride/dilation 2) so the wavelet mode stays
on-TPU end to end.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SQRT2 = float(np.sqrt(2.0))

# Scaling (lowpass reconstruction) filters, lowest-index-first.
_REC_LO: Dict[str, np.ndarray] = {
    "haar": np.array([1.0, 1.0]) / _SQRT2,
    "db1": np.array([1.0, 1.0]) / _SQRT2,
    "db2": np.array([
        0.48296291314469025, 0.8365163037378079,
        0.22414386804185735, -0.12940952255092145,
    ]),
    "db4": np.array([
        0.23037781330885523, 0.7148465705525415, 0.6308807679295904,
        -0.02798376941698385, -0.18703481171888114, 0.030841381835986965,
        0.032883011666982945, -0.010597401784997278,
    ]),
    "sym2": np.array([
        0.48296291314469025, 0.8365163037378079,
        0.22414386804185735, -0.12940952255092145,
    ]),
    "sym4": np.array([
        0.03222310060404270, -0.012603967262037833, -0.09921954357684722,
        0.29785779560527736, 0.8037387518059161, 0.49761866763201545,
        -0.02963552764599851, -0.07576571478927333,
    ]),
    "coif1": np.array([
        -0.01565572813546454, -0.0727326195128539, 0.38486484686420286,
        0.8525720202122554, 0.3378976624578092, -0.0727326195128539,
    ]),
}

# Biorthogonal pairs need distinct analysis/synthesis lowpass filters.
_BIOR: Dict[str, Tuple[np.ndarray, np.ndarray]] = {
    # name: (dec_lo, rec_lo)
    "bior1.3": (
        np.array([-0.08838834764831845, 0.08838834764831845,
                  0.7071067811865476, 0.7071067811865476,
                  0.08838834764831845, -0.08838834764831845]),
        np.array([0.0, 0.0, 0.7071067811865476, 0.7071067811865476, 0.0, 0.0]),
    ),
    "bior2.2": (
        np.array([0.0, -0.1767766952966369, 0.3535533905932738,
                  1.0606601717798214, 0.3535533905932738, -0.1767766952966369]),
        np.array([0.0, 0.3535533905932738, 0.7071067811865476,
                  0.3535533905932738, 0.0, 0.0]),
    ),
}

WAVELET_CHOICES = ["haar", "db1", "db2", "db4", "sym2", "sym4", "coif1", "bior1.3", "bior2.2"]


@functools.lru_cache(maxsize=None)
def filter_bank(name: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(dec_lo, dec_hi, rec_lo, rec_hi), each float64 lowest-index-first."""
    if name in _BIOR:
        dec_lo, rec_lo = _BIOR[name]
        n = len(dec_lo)
        k = np.arange(n)
        # Standard biorthogonal QMF relations (pywt convention).
        dec_hi = ((-1.0) ** (k + 1)) * rec_lo
        rec_hi = ((-1.0) ** k) * dec_lo
        return dec_lo, dec_hi, rec_lo, rec_hi
    if name not in _REC_LO:
        raise ValueError(f"unknown wavelet '{name}' (choices: {WAVELET_CHOICES})")
    rec_lo = _REC_LO[name]
    n = len(rec_lo)
    k = np.arange(n)
    dec_lo = rec_lo[::-1].copy()
    dec_hi = ((-1.0) ** (k + 1)) * rec_lo
    rec_hi = ((-1.0) ** k) * dec_lo
    return dec_lo, dec_hi, rec_lo, rec_hi


def _dwt1d_np(x: np.ndarray, dec: np.ndarray, axis: int) -> np.ndarray:
    """Single-axis DWT: symmetric (half-point) extension by L-1 each side,
    full convolution with the analysis filter, downsample at indices
    L, L+2, ... (pywt layout: out_len = floor((n + L - 1) / 2))."""
    x = np.moveaxis(x, axis, -1)
    n = x.shape[-1]
    L = len(dec)
    left = x[..., : L - 1][..., ::-1]
    right = x[..., -(L - 1):][..., ::-1]
    ext = np.concatenate([left, x, right], axis=-1)
    full = np.apply_along_axis(lambda v: np.convolve(v, dec, mode="full"), -1, ext)
    out_len = (n + L - 1) // 2
    idx = L + 2 * np.arange(out_len)
    sel = np.take(full, idx, axis=-1)
    return np.moveaxis(sel, -1, axis)


def dwt2_np(a: np.ndarray, name: str):
    """Single-level 2-D DWT -> (cA, (cH, cV, cD)); float64, pywt-style."""
    dec_lo, dec_hi, _, _ = filter_bank(name)
    a = np.asarray(a, dtype=np.float64)
    lo = _dwt1d_np(a, dec_lo, axis=0)
    hi = _dwt1d_np(a, dec_hi, axis=0)
    cA = _dwt1d_np(lo, dec_lo, axis=1)
    cH = _dwt1d_np(hi, dec_lo, axis=1)
    cV = _dwt1d_np(lo, dec_hi, axis=1)
    cD = _dwt1d_np(hi, dec_hi, axis=1)
    return cA, (cH, cV, cD)


def _idwt1d_np(lo: np.ndarray, hi: np.ndarray, rec_lo: np.ndarray,
               rec_hi: np.ndarray, axis: int) -> np.ndarray:
    lo = np.moveaxis(lo, axis, -1)
    hi = np.moveaxis(hi, axis, -1)
    m = lo.shape[-1]
    L = len(rec_lo)
    # Upsample (zeros at odd positions), full convolve, crop L-2 each side.
    up_shape = lo.shape[:-1] + (2 * m,)
    ulo = np.zeros(up_shape)
    uhi = np.zeros(up_shape)
    ulo[..., ::2] = lo
    uhi[..., ::2] = hi
    rec = (np.apply_along_axis(lambda v: np.convolve(v, rec_lo, mode="full"), -1, ulo)
           + np.apply_along_axis(lambda v: np.convolve(v, rec_hi, mode="full"), -1, uhi))
    # Standard idwt length 2m - L + 2: crop L-2 from the left.
    out = rec[..., L - 2: L - 2 + 2 * m - L + 2] if L > 2 else rec[..., : 2 * m]
    return np.moveaxis(out, -1, axis)


def idwt2_np(cA, cHVD, name: str) -> np.ndarray:
    cH, cV, cD = cHVD
    _, _, rec_lo, rec_hi = filter_bank(name)
    lo = _idwt1d_np(np.asarray(cA, np.float64), np.asarray(cV, np.float64), rec_lo, rec_hi, axis=1)
    hi = _idwt1d_np(np.asarray(cH, np.float64), np.asarray(cD, np.float64), rec_lo, rec_hi, axis=1)
    return _idwt1d_np(lo, hi, rec_lo, rec_hi, axis=0)


# ---------------------------------------------------------------------------
# Device (jnp) twins — used by the fused wavelet dither path.
# ---------------------------------------------------------------------------


def _dwt1d_jnp(x: jnp.ndarray, dec: jnp.ndarray, axis: int) -> jnp.ndarray:
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    L = dec.shape[0]
    left = x[..., : L - 1][..., ::-1]
    right = x[..., -(L - 1):][..., ::-1]
    ext = jnp.concatenate([left, x, right], axis=-1)
    # Correlate-with-reversed == convolve; then pick pywt's output phase.
    kernel = dec[::-1].reshape(1, 1, L)
    batch = ext.reshape(-1, 1, ext.shape[-1])
    out = jax.lax.conv_general_dilated(
        batch, kernel.astype(batch.dtype),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]
    out_len = (n + L - 1) // 2
    sel = out[:, 1::2][:, :out_len]
    return jnp.moveaxis(sel.reshape(x.shape[:-1] + (out_len,)), -1, axis)


def dwt2_jnp(a: jnp.ndarray, name: str):
    dec_lo, dec_hi, _, _ = filter_bank(name)
    f32 = lambda f: jnp.asarray(f, dtype=jnp.float32)
    lo = _dwt1d_jnp(a, f32(dec_lo), 0)
    hi = _dwt1d_jnp(a, f32(dec_hi), 0)
    return (_dwt1d_jnp(lo, f32(dec_lo), 1),
            (_dwt1d_jnp(hi, f32(dec_lo), 1),
             _dwt1d_jnp(lo, f32(dec_hi), 1),
             _dwt1d_jnp(hi, f32(dec_hi), 1)))


def _idwt1d_jnp(lo: jnp.ndarray, hi: jnp.ndarray, rec_lo: jnp.ndarray,
                rec_hi: jnp.ndarray, axis: int) -> jnp.ndarray:
    lo = jnp.moveaxis(lo, axis, -1)
    hi = jnp.moveaxis(hi, axis, -1)
    m = lo.shape[-1]
    L = rec_lo.shape[0]
    up = jnp.zeros(lo.shape[:-1] + (2 * m,), lo.dtype)
    ulo = up.at[..., ::2].set(lo)
    uhi = up.at[..., ::2].set(hi)

    def conv(sig, filt):
        kernel = filt[::-1].reshape(1, 1, L).astype(sig.dtype)
        batch = sig.reshape(-1, 1, sig.shape[-1])
        out = jax.lax.conv_general_dilated(
            batch, kernel, window_strides=(1,),
            padding=[(L - 1, L - 1)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )[:, 0, :]
        return out.reshape(sig.shape[:-1] + (out.shape[-1],))

    rec = conv(ulo, rec_lo) + conv(uhi, rec_hi)
    if L > 2:
        out = rec[..., L - 2: L - 2 + 2 * m - L + 2]
    else:
        out = rec[..., : 2 * m]
    return jnp.moveaxis(out, -1, axis)


def idwt2_jnp(cA, cHVD, name: str) -> jnp.ndarray:
    cH, cV, cD = cHVD
    _, _, rec_lo, rec_hi = filter_bank(name)
    f32 = lambda f: jnp.asarray(f, dtype=jnp.float32)
    lo = _idwt1d_jnp(cA, cV, f32(rec_lo), f32(rec_hi), axis=1)
    hi = _idwt1d_jnp(cH, cD, f32(rec_lo), f32(rec_hi), axis=1)
    return _idwt1d_jnp(lo, hi, f32(rec_lo), f32(rec_hi), axis=0)
