"""Unit tests for the perceptual-equivalence metrics (core/fidelity.py)."""

import numpy as np
import pytest

from dither_pie_tpu.core.fidelity import (assert_perceptually_matched,
                                          block_mean_error, identity_fraction)


def test_identity_fraction_exact():
    a = np.zeros((8, 8, 3))
    assert identity_fraction(a, a.copy()) == 1.0
    b = a.copy()
    b[0, 0] = 255
    assert identity_fraction(a, b) == pytest.approx(63 / 64)


def test_block_mean_error_zero_on_equal():
    rng = np.random.RandomState(0)
    a = rng.randint(0, 256, (16, 20, 3)).astype(np.float64)
    assert block_mean_error(a, a.copy()) == (0.0, 0.0)


def test_block_mean_error_detects_local_drift():
    """Swapping two complementary pixels inside a block keeps the block mean;
    brightening a whole block does not."""
    a = np.full((8, 8, 3), 128.0)
    swapped = a.copy()
    swapped[0, 0] = 0.0
    swapped[0, 1] = 256.0  # mean preserved within the 4x4 block
    mean_e, max_e = block_mean_error(a, swapped)
    assert max_e == 0.0

    drifted = a.copy()
    drifted[:4, :4] += 64.0  # whole block brightened
    mean_e, max_e = block_mean_error(a, drifted)
    assert max_e == pytest.approx(64.0)
    assert mean_e == pytest.approx(64.0 / 4)  # one of 4 blocks


def test_assert_perceptually_matched_rejects_wrong_dither():
    """A dithering with systematically shifted local means must fail the
    gate even if it 'looks like' a dither."""
    rng = np.random.RandomState(1)
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.float64)
    a = pal[rng.randint(0, 2, (32, 32))]
    b = pal[np.minimum(rng.randint(0, 2, (32, 32)) + 1, 1)]  # biased white
    with pytest.raises(AssertionError):
        assert_perceptually_matched(a, b)


def test_assert_perceptually_matched_accepts_equal():
    rng = np.random.RandomState(2)
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.float64)
    a = pal[rng.randint(0, 2, (32, 32))]
    assert_perceptually_matched(a, a.copy())
