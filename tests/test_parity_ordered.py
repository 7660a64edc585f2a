"""Golden parity: ordered / screen-based modes vs the reference library.

Target: bit-exact output on ordered modes (driver baseline). Each test runs
both implementations on the same pixels/palette and compares the final
palette-mapped images exactly.
"""

import numpy as np
import pytest

import dither_pie_tpu as dpt


def _run_ours(mode, img_u8, palette, params=None):
    d = dpt.ImageDitherer(num_colors=len(palette), dither_mode=dpt.DitherMode(mode),
                          palette=list(palette), dither_params=params or {})
    return d.apply_dithering_array(img_u8)


def _run_ref(reference, mode, img_u8, palette, params=None):
    from PIL import Image

    d = reference.ImageDitherer(
        num_colors=len(palette),
        dither_mode=reference.DitherMode(mode),
        palette=[tuple(c) for c in palette],
        dither_params=params or {},
    )
    return np.array(d.apply_dithering(Image.fromarray(img_u8)))


def _tie_mask(img_u8, palette):
    """Pixels whose top-3 palette distances contain an exact tie.

    scipy's cKDTree orders exactly-tied neighbors by internal tree layout
    (not by index), so the reference's own output is ambiguous there; we
    break ties deterministically toward the lower index. Parity is asserted
    everywhere else.
    """
    px = img_u8.reshape(-1, 3).astype(np.float64)
    pal = np.asarray(palette, dtype=np.float64)
    d = np.sum((px[:, None, :] - pal[None, :, :]) ** 2, axis=-1)
    d.sort(axis=1)
    tie = d[:, 0] == d[:, 1]
    if d.shape[1] > 2:
        tie |= d[:, 1] == d[:, 2]
    return tie.reshape(img_u8.shape[:2])


def _assert_same(ours, ref, mode, allow_mismatch_frac=0.0, tie_mask=None):
    mismatch = np.any(ours != ref, axis=-1)
    if tie_mask is not None:
        non_tie_mismatch = mismatch & ~tie_mask
        assert non_tie_mismatch.sum() == 0, (
            f"{mode}: {non_tie_mismatch.sum()} non-tie mismatching pixels "
            f"(+{(mismatch & tie_mask).sum()} at tie-ambiguous pixels)"
        )
        return
    frac = mismatch.mean()
    assert frac <= allow_mismatch_frac, (
        f"{mode}: {mismatch.sum()} mismatching pixels ({frac:.4%})"
    )


@pytest.mark.parametrize("size", ["2x2", "4x4", "8x8", "16x16", "psx4x4"])
def test_bayer_parity(reference, rand_image, palette, size):
    ours = _run_ours("bayer", rand_image, palette, {"size": size})
    ref = _run_ref(reference, "bayer", rand_image, palette, {"size": size})
    _assert_same(ours, ref, f"bayer-{size}", tie_mask=_tie_mask(rand_image, palette))


def test_none_parity(reference, rand_image, palette):
    ours = _run_ours("none", rand_image, palette)
    ref = _run_ref(reference, "none", rand_image, palette)
    _assert_same(ours, ref, "none", tie_mask=_tie_mask(rand_image, palette))


def test_ign_parity(reference, rand_image, palette):
    ours = _run_ours("IGN", rand_image, palette, {"scale": 1.0, "seed": 0})
    ref = _run_ref(reference, "IGN", rand_image, palette, {"scale": 1.0, "seed": 0})
    _assert_same(ours, ref, "IGN", tie_mask=_tie_mask(rand_image, palette))


def test_ign_parity_seeded(reference, gradient_image, palette):
    params = {"scale": 2.5, "seed": 7}
    ours = _run_ours("IGN", gradient_image, palette, params)
    ref = _run_ref(reference, "IGN", gradient_image, palette, params)
    _assert_same(ours, ref, "IGN-seeded", tie_mask=_tie_mask(gradient_image, palette))


def test_polka_dot_parity(reference, rand_image, palette):
    params = {"tile_size": 8, "gamma": 1.5}
    ours = _run_ours("polka_dot", rand_image, palette, params)
    ref = _run_ref(reference, "polka_dot", rand_image, palette, params)
    _assert_same(ours, ref, "polka_dot", tie_mask=_tie_mask(rand_image, palette))


def test_blue_noise_parity(reference, rand_image, palette):
    params = {"size": 32, "seed": 42}
    ours = _run_ours("blue_noise", rand_image, palette, params)
    ref = _run_ref(reference, "blue_noise", rand_image, palette, params)
    _assert_same(ours, ref, "blue_noise", tie_mask=_tie_mask(rand_image, palette))


def test_blue_noise_matrix_matches_reference(reference):
    ours = dpt.generate_blue_noise(16, seed=3)
    ref = reference.generate_blue_noise(16, seed=3)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("shape", ["circle", "square", "diamond"])
def test_halftone_parity(reference, gradient_image, palette, shape):
    params = {"cell_size": 6, "angle": 30.0, "shape": shape}
    ours = _run_ours("halftone", gradient_image, palette, params)
    ref = _run_ref(reference, "halftone", gradient_image, palette, params)
    # Cell-average float32-vs-float64 rounding may flip rare borderline
    # cells; require >= 99.5% identical pixels.
    _assert_same(ours, ref, f"halftone-{shape}", allow_mismatch_frac=0.005)


def test_gamma_path_parity(reference, rand_image, palette):
    ours = dpt.ImageDitherer(num_colors=len(palette), dither_mode=dpt.DitherMode.BAYER,
                             palette=list(palette), use_gamma=True)
    from PIL import Image

    ref = reference.ImageDitherer(num_colors=len(palette),
                                  dither_mode=reference.DitherMode.BAYER,
                                  palette=[tuple(c) for c in palette], use_gamma=True)
    o = ours.apply_dithering_array(rand_image)
    r = np.array(ref.apply_dithering(Image.fromarray(rand_image)))
    # tie mask on the 8-bit-linear image/palette the dither actually sees
    from dither_pie_tpu.core.colors import srgb_to_linear_np
    lin_img = np.clip(srgb_to_linear_np(rand_image.astype(np.float32) / 255.0) * 255.0, 0, 255).astype(np.uint8)
    lin_pal = np.clip(srgb_to_linear_np(np.array(palette, dtype=np.float32) / 255.0) * 255.0, 0, 255).astype(np.float32)
    _assert_same(o, r, "bayer+gamma", tie_mask=_tie_mask(lin_img, lin_pal))


def test_wavelet_parity(reference, rand_image, palette):
    """Wavelet strategy vs the reference running on our DWT (the env has no
    pywt; conftest backs the stub with ops/wavelet). Noise draw order and the
    randomized final pick must line up; device f32 subband math may flip
    rare floor()-boundary pixels vs the reference's float64."""
    params = {"wavelet": "haar", "subband_quant": 8, "seed": 42}
    ours = _run_ours("wavelet", rand_image, palette, params)
    ref = _run_ref(reference, "wavelet", rand_image, palette, params)
    ident = np.all(ours == ref, axis=-1).mean()
    assert ident > 0.9, f"wavelet identity {ident:.3f}"


def test_wavelet_parity_db2(reference, gradient_image, palette):
    params = {"wavelet": "db2", "subband_quant": 16, "seed": 7}
    ours = _run_ours("wavelet", gradient_image, palette, params)
    ref = _run_ref(reference, "wavelet", gradient_image, palette, params)
    ident = np.all(ours == ref, axis=-1).mean()
    assert ident > 0.9, f"wavelet-db2 identity {ident:.3f}"
