"""Golden parity: error-diffusion family vs the reference library.

These exercise the native C++ engine (the environment's reference runs its
pure-Python scan since Numba is absent, which the engine matches arithmetic-
for-arithmetic, except where noted). Error diffusion is chaotic — a single
differing palette pick cascades — so exact matches here are a strong signal.
"""

import numpy as np
import pytest
from PIL import Image

import dither_pie_tpu as dpt
from dither_pie_tpu.ops import ed_host


def _run_ref(reference, mode, img_u8, palette, params=None):
    d = reference.ImageDitherer(
        num_colors=len(palette),
        dither_mode=reference.DitherMode(mode),
        palette=[tuple(c) for c in palette],
        dither_params=params or {},
    )
    return np.array(d.apply_dithering(Image.fromarray(img_u8)))


def _run_ours(mode, img_u8, palette, params=None, force_native=True, monkeypatch=None):
    d = dpt.ImageDitherer(num_colors=len(palette), dither_mode=dpt.DitherMode(mode),
                          palette=list(palette), dither_params=params or {})
    return d.apply_dithering_array(img_u8)


def _report(ours, ref, label, max_mismatch_frac=0.0):
    mm = np.any(ours != ref, axis=-1)
    frac = mm.mean()
    assert frac <= max_mismatch_frac, f"{label}: {mm.sum()} mismatches ({frac:.3%})"


ED_VARIANTS = ["floyd_steinberg", "jjn", "stucki", "burkes", "atkinson",
               "sierra", "sierra_two_row", "sierra_lite"]


@pytest.mark.parametrize("variant", ED_VARIANTS)
def test_ed_variants_parity(reference, rand_image, variant, monkeypatch):
    monkeypatch.setenv("DITHER_PIE_TPU_ED_BACKEND", "native")
    pal = [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    params = {"variant": variant, "serpentine": "false"}
    ours = _run_ours("error_diffusion", rand_image, pal, params)
    ref = _run_ref(reference, "error_diffusion", rand_image, pal, params)
    _report(ours, ref, f"ed-{variant}")


@pytest.mark.parametrize("variant", ["floyd_steinberg", "atkinson", "stucki"])
def test_ed_serpentine_parity(reference, rand_image, variant, monkeypatch):
    monkeypatch.setenv("DITHER_PIE_TPU_ED_BACKEND", "native")
    pal = [(0, 0, 0), (85, 85, 85), (170, 170, 170), (255, 255, 255)]
    params = {"variant": variant, "serpentine": "true"}
    ours = _run_ours("error_diffusion", rand_image, pal, params)
    ref = _run_ref(reference, "error_diffusion", rand_image, pal, params)
    _report(ours, ref, f"ed-serp-{variant}")


@pytest.mark.parametrize("serpentine", ["false", "true"])
def test_ostromoukhov_parity(reference, gradient_image, serpentine, monkeypatch):
    monkeypatch.setenv("DITHER_PIE_TPU_ED_BACKEND", "native")
    pal = [(0, 0, 0), (255, 255, 255), (128, 64, 32), (32, 128, 200)]
    params = {"serpentine": serpentine}
    ours = _run_ours("ostromoukhov", gradient_image, pal, params)
    ref = _run_ref(reference, "ostromoukhov", gradient_image, pal, params)
    _report(ours, ref, f"ostromoukhov-serp={serpentine}")


def test_ostromoukhov_table_matches(reference):
    ref_table = np.array(reference.OstromoukhovDitherStrategy.COEFFS_TABLE, dtype=np.int32)
    from dither_pie_tpu.ops.ed_kernels import OSTROMOUKHOV_ARRAY

    np.testing.assert_array_equal(OSTROMOUKHOV_ARRAY, ref_table)


def test_ed_kernel_tables_match(reference):
    for name in ED_VARIANTS:
        ref_k = reference.ErrorDiffusionKernel.get_kernel(name)
        ours_k = dpt.ErrorDiffusionKernel.get_kernel(name)
        assert ours_k["weights"] == ref_k["weights"], name
        assert ours_k["divisor"] == ref_k["divisor"], name


def test_hybrid_parity_python_semantics(reference, rand_image):
    """The env's reference runs its pure-Python hybrid path (no pre-clamp);
    compare the engine's clamp_before_lookup=False mode against it."""
    pal = [(0, 0, 0), (255, 255, 255), (200, 50, 50), (50, 200, 50)]
    pala = np.asarray(pal, dtype=np.float32)
    work = rand_image.astype(np.float32)
    ours = ed_host.ed_hybrid(work.copy(), pala, 1.0, 0.2, clamp_before_lookup=False)
    ref = _run_ref(reference, "hybrid", rand_image, pal,
                   {"lum_factor": 1.0, "col_factor": 0.2})
    _report(ours.astype(np.uint8), ref, "hybrid-python-path")


def test_perceptual_parity(reference, rand_image, monkeypatch):
    monkeypatch.setenv("DITHER_PIE_TPU_ED_BACKEND", "native")
    pal = [(0, 0, 0), (255, 255, 255), (255, 128, 0), (0, 128, 255)]
    ours = _run_ours("perceptual", rand_image, pal)
    ref = _run_ref(reference, "perceptual", rand_image, pal)
    _report(ours, ref, "perceptual")


def test_adaptive_variance_parity(reference, rand_image, monkeypatch):
    monkeypatch.setenv("DITHER_PIE_TPU_ED_BACKEND", "native")
    pal = [(0, 0, 0), (255, 255, 255), (128, 128, 128)]
    params = {"var_threshold": 300.0, "window_radius": 1}
    ours = _run_ours("adaptive_variance", rand_image, pal, params)
    ref = _run_ref(reference, "adaptive_variance", rand_image, pal, params)
    _report(ours, ref, "adaptive_variance")


def test_riemersma_parity(reference, rand_image):
    pal = [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 0, 255)]
    ours = _run_ours("riemersma", rand_image, pal)
    ref = _run_ref(reference, "riemersma", rand_image, pal)
    _report(ours, ref, "riemersma")


def test_hilbert_order_matches_reference(reference):
    from dither_pie_tpu.ops.hilbert import hilbert_path

    ref_path = reference._hilbert_order(16)
    np.testing.assert_array_equal(hilbert_path(16), ref_path)


def test_fast_f32_paths_match_exact_perceptually(rand_image):
    """The SIMD f32 fast path (video throughput; reference Numba-path
    semantics) must stay perceptually identical to the exact f64-ordering
    engine — near-tie flips only."""
    from dither_pie_tpu.core.fidelity import assert_perceptually_matched
    from dither_pie_tpu.ops import ed_host

    img = rand_image.astype(np.float32)
    pal = np.asarray([(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 0, 255)],
                     np.float32)
    for serp in (False, True):
        exact = ed_host.ed_fixed(img.copy(), pal, "floyd_steinberg", serp)
        fast = ed_host.ed_fixed_fast(img.copy(), pal, "floyd_steinberg", serp)
        assert_perceptually_matched(fast, exact, min_identical=0.95)
    exact = ed_host.ed_riemersma(img.copy(), pal)
    fast = ed_host.ed_riemersma_fast(img.copy(), pal)
    assert_perceptually_matched(fast, exact, min_identical=0.95)
    for serp in (False, True):
        exact = ed_host.ed_ostromoukhov(img.copy(), pal, serp)
        fast = ed_host.ed_ostromoukhov_fast(img.copy(), pal, serp)
        assert_perceptually_matched(fast, exact, min_identical=0.95)


def test_fast_f32_aux_mode_twins_match_exact_perceptually(rand_image):
    """The hybrid/perceptual/adaptive f32-lookup twins (the wavefront
    kernel's golden gates) must stay perceptually identical to the exact
    f64-ordering engines — near-tie flips only."""
    from dither_pie_tpu.core.fidelity import assert_perceptually_matched
    from dither_pie_tpu.ops import ed_host
    from dither_pie_tpu.ops.adaptive import variance_map_np

    img = rand_image.astype(np.float32)
    pal = np.asarray([(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 0, 255)],
                     np.float32)
    exact = ed_host.ed_hybrid(img.copy(), pal, 1.0, 0.2, True)
    fast = ed_host.ed_hybrid_fast(img.copy(), pal, 1.0, 0.2, True)
    assert_perceptually_matched(fast, exact, min_identical=0.95)
    exact = ed_host.ed_perceptual(img.copy(), pal)
    fast = ed_host.ed_perceptual_fast(img.copy(), pal)
    assert_perceptually_matched(fast, exact, min_identical=0.95)
    gray = (np.float32(0.299) * img[..., 0] + np.float32(0.587) * img[..., 1]
            + np.float32(0.114) * img[..., 2])
    gate = variance_map_np(gray, 1) >= 300.0
    exact = ed_host.ed_adaptive(img.copy(), pal, gate)
    fast = ed_host.ed_adaptive_fast(img.copy(), pal, gate)
    assert_perceptually_matched(fast, exact, min_identical=0.95)


def test_fast_f32_large_palette_falls_back(rand_image):
    """>256-color palettes route to the exact engine (identical output)."""
    from dither_pie_tpu.ops import ed_host

    rng = np.random.RandomState(0)
    pal = rng.randint(0, 256, (300, 3)).astype(np.float32)
    img = rand_image.astype(np.float32)
    exact = ed_host.ed_fixed(img.copy(), pal, "stucki", False)
    fast = ed_host.ed_fixed_fast(img.copy(), pal, "stucki", False)
    np.testing.assert_array_equal(fast, exact)
