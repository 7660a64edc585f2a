"""Quantitative perceptual-equivalence metrics for dither outputs.

The BASELINE fidelity contract (BASELINE.md) is bit-exactness on ordered
modes and *perceptual* match on stochastic / error-diffusion modes: ED is a
chaotic recurrence, so a single near-tie float32-vs-float64 palette flip
diverges locally while preserving the dither's local color statistics. The
metric here makes "perceptually matched" a number: error diffusion preserves
local mean color by construction (that is the entire point of propagating
quantization error), so two valid ditherings of the same image under the
same palette must agree in per-block mean color even where individual pixel
choices differ.

Used by tests/test_wavefront.py (kernel-vs-golden-engine gates) and by the
on-hardware fidelity checks for v1-kernel traffic (ostromoukhov / large
palettes), where FMA contraction can flip near-ties vs the host golden.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def identity_fraction(a: np.ndarray, b: np.ndarray) -> float:
    """Fraction of pixels whose full RGB value matches exactly."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    return float(np.all(a == b, axis=-1).mean())


def block_mean_error(a: np.ndarray, b: np.ndarray,
                     block: int = 4) -> Tuple[float, float]:
    """(mean, max) absolute difference of per-block mean colors.

    Blocks are ``block x block`` tiles; trailing partial tiles are cropped
    (ED divergence is spatially uniform, so cropping loses nothing). Inputs
    are (H, W, 3) arrays of palette colors in [0, 255].
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    h, w = a.shape[:2]
    hb, wb = h // block, w // block
    if hb == 0 or wb == 0:
        # Image smaller than one block: compare global means.
        return (float(np.abs(a.mean((0, 1)) - b.mean((0, 1))).mean()),) * 2
    a = a[: hb * block, : wb * block].reshape(hb, block, wb, block, 3)
    b = b[: hb * block, : wb * block].reshape(hb, block, wb, block, 3)
    diff = np.abs(a.mean((1, 3)) - b.mean((1, 3)))  # (hb, wb, 3)
    per_block = diff.mean(-1)
    return float(per_block.mean()), float(per_block.max())


def assert_perceptually_matched(a: np.ndarray, b: np.ndarray,
                                min_identical: float = 0.9,
                                block: int = 4,
                                max_block_mean: float = 24.0,
                                max_block_max: float = 160.0) -> None:
    """Fail unless two ditherings agree pixel-wise almost everywhere AND
    their local (block-level) mean colors agree.

    Default thresholds are calibrated on the wavefront-vs-golden-engine
    corpus (tests/test_wavefront.py): f32 near-tie flips give identity
    >= 0.95 typically, block-mean error of a few counts; a genuinely wrong
    scan (e.g. dropped error terms, wrong weights) blows past both.
    """
    ident = identity_fraction(a, b)
    mean_e, max_e = block_mean_error(a, b, block=block)
    assert ident >= min_identical, (
        f"pixel identity {ident:.3f} < {min_identical}")
    assert mean_e <= max_block_mean, (
        f"block mean-color error {mean_e:.2f} > {max_block_mean} "
        f"(identity {ident:.3f})")
    assert max_e <= max_block_max, (
        f"worst block mean-color error {max_e:.2f} > {max_block_max} "
        f"(identity {ident:.3f})")
