"""Core-layer tests: palettes, colors, thresholds, wavelets."""

import numpy as np
import pytest
from PIL import Image

import dither_pie_tpu as dpt
from dither_pie_tpu.core import colors, palette, thresholds
from dither_pie_tpu.ops import wavelet


def test_median_cut_matches_reference(reference, rand_image):
    ours = dpt.ColorReducer.reduce_colors(Image.fromarray(rand_image), 8)
    ref = reference.ColorReducer.reduce_colors(Image.fromarray(rand_image), 8)
    assert ours == ref


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 16, 27, 64])
def test_uniform_matches_reference(reference, n):
    assert dpt.ColorReducer.generate_uniform_palette(n) == \
        reference.ColorReducer.generate_uniform_palette(n)


def test_kmeans_palette_deterministic(rand_image):
    p1 = dpt.ColorReducer.generate_kmeans_palette(Image.fromarray(rand_image), 6)
    p2 = dpt.ColorReducer.generate_kmeans_palette(Image.fromarray(rand_image), 6)
    assert p1 == p2
    assert len(p1) == 6
    for c in p1:
        assert all(0 <= v <= 255 for v in c)


def test_kmeans_palette_quality(rand_image):
    """Centers should reduce quantization error well below a trivial palette."""
    pal = dpt.ColorReducer.generate_kmeans_palette(Image.fromarray(rand_image), 16)
    px = rand_image.reshape(-1, 3).astype(np.float64)
    pa = np.asarray(pal, dtype=np.float64)
    d = ((px[:, None, :] - pa[None, :, :]) ** 2).sum(-1).min(1)
    # mean sq distance to nearest of 16 well-placed centers on uniform noise
    assert d.mean() < 5000


@pytest.mark.parametrize("k", [8, 16, 32])
def test_kmeans_inertia_within_5pct_of_sklearn(k):
    """Quantify the deliberate k-means deviation (seeded kmeans++/Lloyd on
    device vs the reference's sklearn KMeans,
    /root/reference/dithering_lib.py:1846-1857): on a fixed sample, our
    clustering inertia must be within 5% of sklearn's."""
    sklearn_cluster = pytest.importorskip("sklearn.cluster")
    rng = np.random.RandomState(7)
    # Clustered data (not uniform noise) so inertia differences are visible:
    # 6 color blobs + a gradient ramp, like a real image histogram.
    blobs = np.concatenate([
        rng.normal(loc=c, scale=18.0, size=(1200, 3))
        for c in [(30, 30, 30), (220, 220, 210), (200, 40, 40),
                  (40, 160, 60), (60, 80, 200), (230, 200, 60)]
    ])
    ramp = np.linspace(0, 255, 2000)[:, None] * np.ones((1, 3))
    sample = np.clip(np.concatenate([blobs, ramp]), 0, 255)
    img = sample.reshape(-1, 1, 3).astype(np.uint8)

    ours = np.asarray(
        palette.kmeans_palette(img, k, random_state=42), dtype=np.float64)
    px = img.reshape(-1, 3).astype(np.float64)
    inertia_ours = ((px[:, None, :] - ours[None]) ** 2).sum(-1).min(1).sum()

    sk = sklearn_cluster.KMeans(n_clusters=k, random_state=42, n_init=10)
    sk.fit(px)
    inertia_sk = ((px[:, None, :] - sk.cluster_centers_[None]) ** 2).sum(-1).min(1).sum()

    assert inertia_ours <= 1.05 * inertia_sk, (inertia_ours, inertia_sk)


def test_kmeans_sklearn_mode_bit_identical_to_reference(reference, monkeypatch):
    """DITHER_PIE_TPU_KMEANS=sklearn runs the reference's exact algorithm:
    for a <=10k-pixel image (no subsampling, so no unseeded-random
    divergence) the palette must equal the reference's
    generate_kmeans_palette output exactly."""
    pytest.importorskip("sklearn")
    monkeypatch.setenv("DITHER_PIE_TPU_KMEANS", "sklearn")
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (80, 100, 3)).astype(np.uint8)  # 8000 px
    ours = dpt.ColorReducer.generate_kmeans_palette(Image.fromarray(img), 8)
    ref = reference.ColorReducer.generate_kmeans_palette(Image.fromarray(img), 8)
    assert [tuple(c) for c in ours] == [tuple(c) for c in ref]


def test_builtin_palettes_byte_identical_to_reference():
    """The serialized builtin palette list must equal the reference's
    palette.json verbatim — including its hand-entry quirk (the first
    sara_PC98_16colors color has no '#' prefix)."""
    import json
    import os

    from dither_pie_tpu.core.builtin_palettes import builtin_palette_list

    ref_path = "/root/reference/palette.json"
    if not os.path.exists(ref_path):
        pytest.skip("reference palette.json not available")
    with open(ref_path, "r", encoding="utf-8") as f:
        ref = json.load(f)
    assert builtin_palette_list() == ref


def test_srgb_transfer_matches_reference(reference):
    c = np.linspace(0, 1, 1000, dtype=np.float32)
    np.testing.assert_allclose(
        colors.srgb_to_linear_np(c), reference.DitherUtils.srgb_to_linear(c), rtol=1e-6)
    np.testing.assert_allclose(
        colors.linear_to_srgb_np(c), reference.DitherUtils.linear_to_srgb(c), rtol=1e-6)


def test_srgb_roundtrip():
    c = np.linspace(0, 1, 257, dtype=np.float32)
    rt = colors.linear_to_srgb_np(colors.srgb_to_linear_np(c))
    np.testing.assert_allclose(rt, c, atol=1e-5)


def test_bayer_matrices_match_reference(reference):
    for name, ref_m in [("2x2", reference.DitherUtils.BAYER2x2),
                        ("4x4", reference.DitherUtils.BAYER4x4),
                        ("8x8", reference.DitherUtils.BAYER8x8),
                        ("16x16", reference.DitherUtils.BAYER16x16),
                        ("psx4x4", reference.DitherUtils.PSX4x4)]:
        np.testing.assert_array_equal(thresholds.bayer_matrix(name), ref_m)


def test_ign_np_jnp_equal():
    a = np.asarray(thresholds.ign_thresholds(33, 47, 1.7, 5))
    b = thresholds.ign_thresholds_np(33, 47, 1.7, 5)
    np.testing.assert_array_equal(a, b)


def test_polka_matrix_matches_reference(reference):
    ref_s = reference.PolkaDotDitherStrategy(tile_size=10, gamma=2.0)
    np.testing.assert_allclose(
        thresholds.polka_dot_matrix(10, 2.0), ref_s.threshold_matrix, atol=1e-7)


@pytest.mark.parametrize("name", wavelet.WAVELET_CHOICES)
def test_wavelet_perfect_reconstruction(name):
    rng = np.random.RandomState(0)
    a = rng.rand(13, 17) * 255
    cA, hvd = wavelet.dwt2_np(a, name)
    rec = wavelet.idwt2_np(cA, hvd, name)[:13, :17]
    assert np.abs(rec - a).max() < 1e-6


@pytest.mark.parametrize("name", ["haar", "db2", "bior2.2"])
def test_wavelet_jnp_matches_np(name):
    rng = np.random.RandomState(1)
    a = rng.rand(16, 20).astype(np.float32) * 255
    import jax.numpy as jnp

    cA_j, (cH_j, cV_j, cD_j) = wavelet.dwt2_jnp(jnp.asarray(a), name)
    cA_n, (cH_n, cV_n, cD_n) = wavelet.dwt2_np(a, name)
    np.testing.assert_allclose(np.asarray(cA_j), cA_n, atol=1e-3)
    np.testing.assert_allclose(np.asarray(cD_j), cD_n, atol=1e-3)
    rec_j = wavelet.idwt2_jnp(cA_j, (cH_j, cV_j, cD_j), name)
    np.testing.assert_allclose(np.asarray(rec_j)[:16, :20], a, atol=1e-2)


def test_parameter_metadata_matches_reference(reference):
    for mode in dpt.DitherMode:
        ref_info = reference.ImageDitherer.get_mode_parameters(reference.DitherMode(mode.value))
        our_info = dpt.ImageDitherer.get_mode_parameters(mode)
        if ref_info is None:
            assert our_info is None, mode
        else:
            assert our_info is not None, mode
            assert set(our_info) == set(ref_info), mode
            for k in ref_info:
                assert our_info[k]["default"] == ref_info[k]["default"], (mode, k)
                assert our_info[k]["type"] == ref_info[k]["type"], (mode, k)


def test_blue_noise_cache():
    a = thresholds.blue_noise_cached(32, 1)
    b = thresholds.blue_noise_cached(32, 1)
    assert a is b


def test_hex_roundtrip():
    assert colors.hex_to_rgb("#a1B2c3") == (161, 178, 195)
    assert colors.rgb_to_hex((161, 178, 195)) == "#a1b2c3"


def test_take_palette_matches_gather():
    from dither_pie_tpu.core.distance import take_palette
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    pal = jnp.asarray(rng.randint(0, 256, (16, 3)).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 16, (37, 53)))
    np.testing.assert_array_equal(np.asarray(take_palette(pal, idx)),
                                  np.asarray(jnp.take(pal, idx, axis=0)))
    # huge palettes use the gather branch
    big = jnp.asarray(rng.randint(0, 256, (600, 3)).astype(np.float32))
    idx2 = jnp.asarray(rng.randint(0, 600, (64,)))
    np.testing.assert_array_equal(np.asarray(take_palette(big, idx2)),
                                  np.asarray(jnp.take(big, idx2, axis=0)))
