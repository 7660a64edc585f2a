"""Pallas wavefront ED kernel tests (interpret mode on CPU).

Strategy: the wavefront algorithm is validated at two levels:
1. mechanics — the NumPy twin of the exact wavefront arithmetic matches the
   native engine bit-for-bit on small images (test_twin_matches_native),
   proving the skew/slot/shift algebra is equivalent to a row-major scan;
2. the Pallas kernel matches the native engine on small images, modulo
   near-tie float32-vs-float64 palette-search flips, which are chaotic but
   rare — we assert a high identity fraction AND block-level perceptual
   equivalence.
"""

import numpy as np
import pytest

from dither_pie_tpu.ops import ed_host
from dither_pie_tpu.ops import wavefront as wf
from dither_pie_tpu.ops.adaptive import variance_map_np

PAL = np.array([[0, 0, 0], [255, 255, 255], [255, 0, 0], [0, 128, 255]],
               dtype=np.float32)

VARIANTS = ["floyd_steinberg", "jjn", "stucki", "burkes", "atkinson",
            "sierra", "sierra_two_row", "sierra_lite"]


def _img(h=16, w=20, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.float32)


def _similar(a, b, min_identical=0.98):
    """Identity fraction + 4x4 block mean-color agreement (the perceptual
    contract for ED modes: individual near-tie flips are allowed, drifting
    local color statistics are not). Every variant is bit-exact on hardware
    after the round-2 tie-break/FMA/accumulation-order fixes (verified at
    scale by tools/identity_sweep.py); the threshold here only guards the
    interpret-mode CPU path, whose f32 near-ties may flip."""
    from dither_pie_tpu.core.fidelity import assert_perceptually_matched

    assert_perceptually_matched(a, b, min_identical=min_identical,
                                block=4, max_block_mean=8.0,
                                max_block_max=48.0)


def _numpy_twin(img, pal, entries, s, n_slots):
    h, w, _ = img.shape
    hp = 128
    big = max(entries, key=lambda e: e[1])[1]
    assert h + big < hp
    d_total = w + s * (h - 1)
    imgs = np.zeros((d_total, 3, hp), np.float32)
    for d in range(d_total):
        for y in range(h):
            x = d - s * y
            if 0 <= x < w:
                imgs[d, :, y] = img[y, x]
    err = np.zeros((n_slots, 3, hp), np.float32)
    idx_out = np.zeros((d_total, hp), np.int64)
    y_l = np.arange(hp)
    for d in range(d_total):
        slot = d % n_slots
        cur = np.clip(imgs[d] + err[slot], 0, 255)
        d2 = ((pal[:, :, None].astype(np.float64)
               - cur[None, :, :].astype(np.float64)) ** 2).sum(1)
        idx = d2.argmin(0)
        chosen = pal[idx].T
        col = d - s * y_l
        active = (col >= 0) & (col < w) & (y_l < h)
        e = (cur - chosen) * active[None, :].astype(np.float32)
        idx_out[d] = idx
        err[slot] = 0
        for dx, dy, wq in entries:
            contrib = e * np.float32(wq)
            if dy:
                contrib = np.roll(contrib, dy, axis=1)
                contrib[:, :dy] = 0
            err[(d + dx + s * dy) % n_slots] += contrib
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            out[y, x] = pal[idx_out[x + s * y, y]]
    return out


@pytest.mark.parametrize("variant", ["floyd_steinberg", "jjn", "atkinson"])
def test_twin_matches_native(variant):
    """The wavefront *algorithm* (with f64 palette search) is bit-equivalent
    to the row-major native scan."""
    from dither_pie_tpu.ops.wavefront import _skew_params
    from dither_pie_tpu.ops.ed_kernels import get_kernel

    img = _img()
    k = get_kernel(variant)
    s, n_slots = _skew_params(k["weights"])
    entries = [(dx, dy, w / k["divisor"]) for dx, dy, w in k["weights"]]
    twin = _numpy_twin(img.copy(), PAL, entries, s, n_slots)
    native = ed_host.ed_fixed(img.copy(), PAL, variant, False)
    np.testing.assert_array_equal(twin, native)


@pytest.mark.parametrize("variant", [
    v if v == "floyd_steinberg" else pytest.param(v, marks=pytest.mark.slow)
    for v in VARIANTS])
def test_kernel_matches_native(variant):
    img = _img()
    o = wf.ed_fixed_wavefront(img.copy(), PAL, variant)
    n = ed_host.ed_fixed(img.copy(), PAL, variant, False)
    _similar(o, n)


@pytest.mark.slow
def test_kernel_ostromoukhov():
    img = _img(seed=1)
    o = wf.ed_ostromoukhov_wavefront(img.copy(), PAL)
    n = ed_host.ed_ostromoukhov(img.copy(), PAL, False)
    _similar(o, n)


@pytest.mark.slow
def test_kernel_hybrid():
    img = _img(seed=2)
    o = wf.ed_hybrid_wavefront(img.copy(), PAL, 1.0, 0.2)
    n = ed_host.ed_hybrid(img.copy(), PAL, 1.0, 0.2, True)
    _similar(o, n)


@pytest.mark.slow
def test_kernel_perceptual():
    img = _img(seed=3)
    o = wf.ed_perceptual_wavefront(img.copy(), PAL)
    n = ed_host.ed_perceptual(img.copy(), PAL)
    _similar(o, n)


@pytest.mark.slow
def test_kernel_adaptive():
    img = _img(seed=4)
    gray = (np.float32(0.299) * img[:, :, 0] + np.float32(0.587) * img[:, :, 1]
            + np.float32(0.114) * img[:, :, 2])
    gate = variance_map_np(gray, 1) >= 300.0
    o = wf.ed_adaptive_wavefront(img.copy(), PAL, gate)
    n = ed_host.ed_adaptive(img.copy(), PAL, gate)
    _similar(o, n)


@pytest.mark.slow
def test_batch_equals_single():
    """Folding frames into the lane axis must be bit-identical to running
    each frame alone."""
    imgs = np.random.RandomState(7).randint(0, 256, (3, 16, 20, 3)).astype(np.float32)
    ob = wf.ed_batch_wavefront(imgs.copy(), PAL, "fixed", "floyd_steinberg")
    for i in range(3):
        oi = wf.ed_fixed_wavefront(imgs[i].copy(), PAL, "floyd_steinberg")
        np.testing.assert_array_equal(ob[i], oi)


@pytest.mark.parametrize("hw", [(7, 5), (33, 9), (5, 40), (1, 12), (12, 1)])
def test_odd_shapes(hw):
    h, w = hw
    img = _img(h, w, seed=h * 100 + w)
    o = wf.ed_fixed_wavefront(img.copy(), PAL, "stucki")
    n = ed_host.ed_fixed(img.copy(), PAL, "stucki", False)
    _similar(o, n)


def test_output_is_palette_colors():
    img = _img(seed=9)
    o = wf.ed_fixed_wavefront(img.copy(), PAL, "floyd_steinberg")
    flat = o.reshape(-1, 3)
    pal_set = {tuple(c) for c in PAL.tolist()}
    assert all(tuple(c) in pal_set for c in flat.tolist())


# ---------------------------------------------------------------------------
# Packed-layout (v2) kernel: batch folded into sublanes.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("variant", [
    v if v == "floyd_steinberg" else pytest.param(v, marks=pytest.mark.slow)
    for v in ["floyd_steinberg", "jjn", "atkinson", "sierra", "sierra_lite"]])
def test_packed_kernel_matches_native(variant):
    imgs = np.random.RandomState(11).randint(0, 256, (3, 16, 20, 3)).astype(np.float32)
    out = wf._run_packed("fixed", imgs.copy(), PAL, variant=variant)
    for i in range(3):
        n = ed_host.ed_fixed(imgs[i].copy(), PAL, variant, False)
        ident = np.all(out[i] == n, axis=-1).mean()
        assert ident > 0.95, f"{variant} frame {i}: {ident}"


@pytest.mark.slow
def test_packed_hybrid_perceptual_adaptive():
    imgs = np.random.RandomState(12).randint(0, 256, (2, 16, 20, 3)).astype(np.float32)
    oh = wf._run_packed("hybrid", imgs.copy(), PAL)
    nh = ed_host.ed_hybrid(imgs[0].copy(), PAL, 1.0, 0.2, True)
    assert np.all(oh[0] == nh, axis=-1).mean() > 0.95

    gray = (np.float32(0.299) * imgs[..., 0] + np.float32(0.587) * imgs[..., 1]
            + np.float32(0.114) * imgs[..., 2])
    op = wf._run_packed("perceptual", imgs.copy(), PAL,
                        aux=np.float32(0.5) + np.float32(0.5) * (gray / np.float32(255.0)))
    npc = ed_host.ed_perceptual(imgs[0].copy(), PAL)
    assert np.all(op[0] == npc, axis=-1).mean() > 0.95

    gates = np.stack([variance_map_np(g, 1) >= 300.0 for g in gray]).astype(np.float32)
    oa = wf._run_packed("adaptive", imgs.copy(), PAL, aux=gates)
    na = ed_host.ed_adaptive(imgs[0].copy(), PAL, gates[0])
    assert np.all(oa[0] == na, axis=-1).mean() > 0.95


@pytest.mark.slow
def test_packed_odd_shapes():
    for (h, w) in [(7, 5), (1, 12), (12, 1), (33, 9)]:
        img = np.random.RandomState(h * 31 + w).randint(
            0, 256, (1, h, w, 3)).astype(np.float32)
        o = wf._run_packed("fixed", img.copy(), PAL, variant="stucki")
        n = ed_host.ed_fixed(img[0].copy(), PAL, "stucki", False)
        assert np.all(o[0] == n, axis=-1).mean() > 0.9, (h, w)


@pytest.mark.slow
def test_packed_ostromoukhov_matches_native():
    """The halving-tree LUT walk (packed v2) must reproduce the exact
    per-luminance weights — any wrong selection diverges chaotically."""
    imgs = np.random.RandomState(13).randint(
        0, 256, (2, 16, 20, 3)).astype(np.float32)
    o = wf._run_packed("ostromoukhov", imgs.copy(), PAL)
    for i in range(2):
        n = ed_host.ed_ostromoukhov(imgs[i].copy(), PAL, False)
        assert np.all(o[i] == n, axis=-1).mean() > 0.95, i


@pytest.mark.slow
def test_packed_large_palette_lane_search():
    """>64-color palettes take the v1-form lane search inside the packed
    kernel (the round-2 v1 fallback is gone for P <= 256)."""
    rng = np.random.RandomState(14)
    imgs = rng.randint(0, 256, (2, 16, 20, 3)).astype(np.float32)
    pal = np.unique(rng.randint(0, 256, (200, 3)), axis=0)[:100].astype(
        np.float32)
    o = wf._run_packed("fixed", imgs.copy(), pal, variant="floyd_steinberg")
    for i in range(2):
        n = ed_host.ed_fixed(imgs[i].copy(), pal, "floyd_steinberg", False)
        assert np.all(o[i] == n, axis=-1).mean() > 0.95, i
    # ostromoukhov + large palette composes both new paths
    o = wf._run_packed("ostromoukhov", imgs.copy(), pal)
    n = ed_host.ed_ostromoukhov(imgs[0].copy(), pal, False)
    assert np.all(o[0] == n, axis=-1).mean() > 0.95


def test_f32_twin_serves_dense_palettes():
    """The C++ f32 twins now cover palettes to 1024 (PACKED_PALETTE_MAX):
    bitwise-equal to a pure-python f32 scan at P=512, so the dense sweep
    cells gate on a tie-robust f32 golden instead of silently falling back
    to the f64 engine."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (20, 24, 3)).astype(np.float32)
    pal = np.unique(rng.randint(0, 256, (1400, 3)), axis=0)[:512].astype(
        np.float32)
    fast = ed_host.ed_fixed_fast(img.copy(), pal, "floyd_steinberg", False)

    from dither_pie_tpu.ops.ed_kernels import kernel_arrays

    offs, wts = kernel_arrays("floyd_steinberg")
    work = img.copy()
    h, w, _ = work.shape
    for y in range(h):
        for x in range(w):
            np.clip(work[y, x], 0, 255, out=work[y, x])
            old = work[y, x].copy()
            d2 = (((pal[:, 0] - old[0]) * (pal[:, 0] - old[0])
                   + (pal[:, 1] - old[1]) * (pal[:, 1] - old[1]))
                  + (pal[:, 2] - old[2]) * (pal[:, 2] - old[2]))
            bi = int(np.argmin(d2.astype(np.float32)))
            work[y, x] = pal[bi]
            err = old - pal[bi]
            for k in range(len(wts)):
                nx, ny = x + int(offs[k, 0]), y + int(offs[k, 1])
                if 0 <= nx < w and 0 <= ny < h:
                    work[ny, nx] += err * wts[k]
    np.clip(work, 0, 255, out=work)
    np.testing.assert_array_equal(fast, work)


@pytest.mark.slow
def test_dense_tournament_first_wins_on_engineered_ties():
    """The dense-palette pairwise tournament (bit-reversed layout) must
    resolve EXACT ties to the smallest original palette index, matching the
    golden engine's first-wins argmin. Duplicate colors scattered through
    the palette force ties on every hit."""
    rng = np.random.RandomState(33)
    base = np.unique(rng.randint(0, 256, (300, 3)), axis=0)[:128].astype(
        np.float32)
    pal = base.copy()
    # Duplicates of earlier entries planted at later indices (ties must
    # resolve to the EARLIER copy; any tournament tie-break bug flips the
    # chosen index — caught by the index-emitting path below).
    for src, dst in ((0, 97), (5, 64), (17, 127), (40, 80), (3, 4)):
        pal[dst] = pal[src]
    imgs = rng.randint(0, 256, (2, 12, 16, 3)).astype(np.float32)
    # quantize content onto palette colors so ties actually occur
    imgs[0, :6] = pal[97]  # exact duplicate color -> tie on first touch
    imgs[1, :, :4] = pal[64]
    col = wf._run_packed("fixed", imgs.copy(), pal,
                         variant="floyd_steinberg")
    idx = wf._run_packed("fixed", imgs.copy(), pal,
                         variant="floyd_steinberg", return_indices=True)
    # first-wins: a duplicate's later index must never be emitted
    for src, dst in ((0, 97), (5, 64), (17, 127), (40, 80), (3, 4)):
        assert not np.any(idx == dst), (src, dst)
    np.testing.assert_array_equal(pal.astype(np.uint8)[idx], col)
    for i in range(2):
        n = ed_host.ed_fixed_fast(imgs[i].copy(), pal, "floyd_steinberg",
                                  False)
        np.testing.assert_array_equal(col[i], n)


@pytest.mark.slow
def test_blocked_tournament_first_wins_pp1024():
    """Palettes past _TOURNEY_BLK (256) run the BLOCKED tournament — d2
    materialized per 256-row block, block pairs combined on the same
    comparison tree as the flat loop. 600 colors buckets to pp=1024
    (nblk=4, two block-combine levels); duplicate colors force exact d2=0
    ties that must still resolve first-wins, and the index-emitting path
    (pay2 carried through the block combines) must gather back exactly."""
    rng = np.random.RandomState(7)
    pal = np.unique(rng.randint(0, 256, (2000, 3)), axis=0)[:600].astype(
        np.float32)
    assert pal.shape[0] == 600
    pal[100] = pal[3]
    pal[550] = pal[3]
    pal[299] = pal[7]
    img = np.empty((2, 20, 28, 3), np.uint8)
    img[0] = pal[3].astype(np.uint8)  # constant frames: exact d2=0 ties
    img[1] = pal[7].astype(np.uint8)
    col = wf._run("fixed", img, pal, variant="floyd_steinberg")
    idx = wf._run("fixed", img, pal, variant="floyd_steinberg",
                  return_indices=True)
    gold = np.stack([ed_host.ed_fixed_fast(f, pal, "floyd_steinberg")
                     for f in img])
    np.testing.assert_array_equal(col, gold)
    np.testing.assert_array_equal(pal.astype(np.uint8)[idx], gold)
    assert (idx[0] == 3).all() and (idx[1] == 7).all()
    assert not np.isin(idx, [100, 550, 299]).any()


@pytest.mark.slow
def test_packed_past_256_colors():
    """The packed path now serves palettes to PACKED_PALETTE_MAX (1024):
    P=300 buckets to pp=512 and exercises the halving-tree select at full
    depth."""
    rng = np.random.RandomState(21)
    imgs = rng.randint(0, 256, (2, 16, 20, 3)).astype(np.float32)
    pal = np.unique(rng.randint(0, 256, (1200, 3)), axis=0)[:300].astype(
        np.float32)
    assert pal.shape[0] == 300
    o = wf._run("fixed", imgs.copy(), pal, variant="floyd_steinberg")
    for i in range(2):
        n = ed_host.ed_fixed(imgs[i].copy(), pal, "floyd_steinberg", False)
        assert np.all(o[i] == n, axis=-1).mean() > 0.95, i


def test_v1_past_1024_matches_f32_twin():
    """Palettes past PACKED_PALETTE_MAX route to the v1 fallback (the one
    kernel path outside the packed family). The C++ f32 twin extends to
    F32_TWIN_MAX_PAL=4096 exactly so this seam has a tie-robust golden —
    verified bit-identical on TPU hardware at 480p/P=2048 (round 5); this
    pins the route + semantics at small shape in interpret mode."""
    rng = np.random.RandomState(33)
    pal = np.unique(rng.randint(0, 256, (9000, 3)),
                    axis=0)[:2048].astype(np.float32)
    assert pal.shape[0] == 2048 > wf.PACKED_PALETTE_MAX
    im = rng.randint(0, 256, (16, 20, 3)).astype(np.float32)
    o = wf.ed_batch_wavefront(im[None].copy(), pal, "fixed",
                              "floyd_steinberg")
    g = ed_host.ed_fixed_fast(im.copy(), pal, "floyd_steinberg", False)
    np.testing.assert_array_equal(o[0], g.astype(np.uint8))


def test_f32_twin_serves_2048_colors():
    """ed_fixed_fast at P=2048 must take the native f32 twin (not the f64
    exact fallback): pin by checking it agrees with a full-precision
    numpy f32 re-scan of the same semantics on a tie-free image."""
    from dither_pie_tpu.native.build import get_lib

    if get_lib() is None:
        pytest.skip("native engine unavailable")
    rng = np.random.RandomState(34)
    pal = np.unique(rng.randint(0, 256, (9000, 3)),
                    axis=0)[:2048].astype(np.float32)
    im = rng.uniform(0, 255, (12, 15, 3)).astype(np.float32)
    fast = ed_host.ed_fixed_fast(im.copy(), pal, "floyd_steinberg", False)
    exact = ed_host.ed_fixed(im.copy(), pal, "floyd_steinberg", False)
    # Continuous content: f32-vs-f64 ordering ties are measure-zero, so
    # the two engines agree — which also certifies the twin actually ran
    # its scan correctly past the old 1024 cap.
    np.testing.assert_array_equal(fast, exact)


def test_run_routes_packed_and_splits_batches(monkeypatch):
    """_run routes every mode/palette <= 256 colors to the packed kernel
    and splits batches that exceed the VMEM-derived cap exactly."""
    imgs = np.random.RandomState(15).randint(
        0, 256, (10, 12, 14, 3)).astype(np.float32)
    whole = wf._run("fixed", imgs.copy(), PAL, variant="floyd_steinberg")
    monkeypatch.setattr(wf, "_max_packed_batch", lambda *a, **k: 8)
    split = wf._run("fixed", imgs.copy(), PAL, variant="floyd_steinberg")
    np.testing.assert_array_equal(whole, split)


# ---------------------------------------------------------------------------
# Index-emitting epilogue: 1 byte/pixel D2H + exact host palette gather.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode,kw", [
    ("fixed", {"variant": "floyd_steinberg"}),
    pytest.param("ostromoukhov", {}, marks=pytest.mark.slow),
    pytest.param("hybrid", {"lum_factor": 1.0, "col_factor": 0.2},
                 marks=pytest.mark.slow),
])
def test_return_indices_gathers_to_colors(mode, kw):
    """palette_u8[idx] must reproduce the color epilogue bit-for-bit —
    same kernel, same search; only the output stream differs."""
    imgs = np.random.RandomState(3).randint(
        0, 256, (3, 16, 20, 3)).astype(np.float32)
    colors = wf._run(mode, imgs.copy(), PAL, **kw)
    idx = wf._run(mode, imgs.copy(), PAL, return_indices=True, **kw)
    assert idx.shape == (3, 16, 20) and idx.dtype == np.uint8
    np.testing.assert_array_equal(PAL.astype(np.uint8)[idx], colors)


@pytest.mark.slow
def test_return_indices_dense_palette():
    """Dense (>64-color) search path: same gather identity at P=256."""
    rng = np.random.RandomState(5)
    imgs = rng.randint(0, 256, (2, 12, 18, 3)).astype(np.float32)
    pal = np.unique(rng.randint(0, 256, (700, 3)), axis=0)[:256].astype(
        np.float32)
    colors = wf._run("fixed", imgs.copy(), pal, variant="stucki")
    idx = wf._run("fixed", imgs.copy(), pal, variant="stucki",
                  return_indices=True)
    np.testing.assert_array_equal(pal.astype(np.uint8)[idx], colors)


@pytest.mark.slow
def test_return_indices_u16_past_256():
    """Palettes past 256 colors ride a uint16 index stream (2 bytes/px
    instead of 3 for RGB) with the same exact gather identity."""
    rng = np.random.RandomState(6)
    imgs = rng.randint(0, 256, (2, 10, 14, 3)).astype(np.float32)
    pal = np.unique(rng.randint(0, 256, (900, 3)), axis=0)[:300].astype(
        np.float32)
    colors = wf._run("fixed", imgs.copy(), pal, variant="floyd_steinberg")
    idx = wf._run("fixed", imgs.copy(), pal, variant="floyd_steinberg",
                  return_indices=True)
    assert idx.dtype == np.uint16
    np.testing.assert_array_equal(pal.astype(np.uint8)[idx], colors)


@pytest.mark.slow
def test_return_indices_planar_and_split(monkeypatch):
    """Planar input layout and VMEM batch splitting both preserve the
    index/color correspondence (indices are layout-free: (B, H, W))."""
    imgs = np.random.RandomState(8).randint(
        0, 256, (9, 12, 14, 3)).astype(np.float32)
    planes = np.ascontiguousarray(imgs.transpose(3, 0, 1, 2))
    colors = wf._run("fixed", imgs.copy(), PAL, variant="floyd_steinberg")
    monkeypatch.setattr(wf, "_max_packed_batch", lambda *a, **k: 8)
    idx = wf._run("fixed", planes.copy(), PAL, variant="floyd_steinberg",
                  planar=True, return_indices=True)
    assert idx.shape == (9, 12, 14)
    np.testing.assert_array_equal(PAL.astype(np.uint8)[idx], colors)


@pytest.mark.slow
def test_mxu_dense_search_matches_exact(monkeypatch):
    """DITHER_PIE_TPU_DENSE_SEARCH=mxu rescopes the dense search on the
    MXU; picks may flip only on near-ties (none at these shapes), and the
    result must stay perceptually matched to the exact kernel."""
    rng = np.random.RandomState(17)
    imgs = rng.randint(0, 256, (2, 12, 18, 3)).astype(np.float32)
    pal = np.unique(rng.randint(0, 256, (700, 3)), axis=0)[:256].astype(
        np.float32)
    exact = wf._run("fixed", imgs.copy(), pal, variant="floyd_steinberg")
    monkeypatch.setenv("DITHER_PIE_TPU_DENSE_SEARCH", "mxu")
    mxu = wf._run("fixed", imgs.copy(), pal, variant="floyd_steinberg")
    for i in range(2):
        _similar(mxu[i].astype(np.float32), exact[i].astype(np.float32))


def test_dense_search_auto_gate(monkeypatch):
    """DENSE_SEARCH=auto runs both searches on the first batch, locks in
    mxu only when the outputs match perceptually, and caches the choice
    per (mode, palette)."""
    rng = np.random.RandomState(4)
    imgs = rng.randint(0, 256, (2, 12, 16, 3)).astype(np.float32)
    pal = np.unique(rng.randint(0, 256, (300, 3)), axis=0)[:100].astype(
        np.float32)
    base = rng.randint(0, 256, (2, 12, 16, 3)).astype(np.uint8)

    calls = []

    def fake_run(mode, images, palette, variant="", dense_search=None, **kw):
        calls.append(dense_search)
        if dense_search == "mxu" and fake_run.mxu_bad:
            return np.zeros_like(base)  # wildly different -> gate fails
        return base.copy()

    fake_run.mxu_bad = False
    monkeypatch.setattr(wf, "_run", fake_run)
    monkeypatch.setenv("DITHER_PIE_TPU_DENSE_SEARCH", "auto")
    # The gate is a single-device experiment: keep the (default-on)
    # auto-mesh from intercepting the batch before it.
    monkeypatch.setenv("DITHER_PIE_TPU_AUTO_MESH", "0")
    wf._DENSE_GATE_CACHE.clear()

    out = wf.ed_batch_wavefront(imgs.copy(), pal, "fixed", "floyd_steinberg")
    np.testing.assert_array_equal(out, base)
    assert calls == ["exact", "mxu"]  # first batch runs both
    out = wf.ed_batch_wavefront(imgs.copy(), pal, "fixed", "floyd_steinberg")
    assert calls[2:] == ["mxu"]  # locked in, single run

    # A failing mxu output locks exact instead.
    calls.clear()
    wf._DENSE_GATE_CACHE.clear()
    fake_run.mxu_bad = True
    out = wf.ed_batch_wavefront(imgs.copy(), pal, "fixed", "floyd_steinberg")
    np.testing.assert_array_equal(out, base)
    assert calls == ["exact", "mxu"]
    wf.ed_batch_wavefront(imgs.copy(), pal, "fixed", "floyd_steinberg")
    assert calls[2:] == ["exact"]

    # Small palettes never enter the gate.
    calls.clear()
    wf.ed_batch_wavefront(imgs.copy(), PAL, "fixed", "floyd_steinberg")
    assert calls == [None]
    wf._DENSE_GATE_CACHE.clear()


def test_return_indices_rejects_large_palette():
    imgs = np.zeros((2, 8, 8, 3), np.float32)
    pal = np.unique(np.random.RandomState(0).randint(
        0, 256, (8000, 3)), axis=0)[:1100].astype(np.float32)
    assert pal.shape[0] == 1100
    with pytest.raises(ValueError, match="1024"):
        wf._run("fixed", imgs, pal, variant="floyd_steinberg",
                return_indices=True)


@pytest.mark.parametrize("shape,variant", [
    ((8, 16, 20), "floyd_steinberg"),   # s=2
    ((8, 33, 40), "floyd_steinberg"),
    ((8, 128, 257), "floyd_steinberg"),
    ((8, 24, 30), "jjn"),               # s=3 (wider window)
    ((2, 16, 20), "floyd_steinberg"),   # r not a multiple of 8
])
def test_fused_skew_matches_lemma(shape, variant):
    """The fused skew-transpose kernel (compiled path: per-lane shift via
    bit-selected rolls over aligned input windows) must equal the
    stride-lemma formulation at every parallelogram-valid position (invalid
    positions are don't-care — the scan masks them)."""
    B, H, W = shape
    rng = np.random.RandomState(B * 1000 + H)
    imgs = rng.randint(0, 256, (B, H, W, 3), dtype=np.uint8)
    s, n_slots = wf._scan_params("fixed", variant)
    chunk = wf._chunk_for(n_slots)
    lf, _, pp, d_pad = wf._plan(H, W, 8, 1, s, chunk)
    import jax.numpy as jnp

    a = np.asarray(wf._skew_packed(jnp.asarray(imgs), s, lf, d_pad,
                                   interpret=True))
    b = np.asarray(wf._skew_packed_fused(jnp.asarray(imgs), s, lf, d_pad,
                                         interpret=True))
    d_idx = np.arange(d_pad)[:, None]
    y_idx = np.arange(lf)[None, :]
    col = d_idx - s * y_idx
    valid = (col >= 0) & (col < W) & (y_idx < H)
    mask = np.broadcast_to(valid[:, None, :], a.shape)
    np.testing.assert_array_equal(a[mask], b[mask])


def test_fused_skew_v1_matches_lemma():
    """Same for the v1 layout (batch folded into lanes, used by
    ostromoukhov / large palettes)."""
    import jax.numpy as jnp

    B, H, W, s = 3, 16, 20, 2
    rng = np.random.RandomState(7)
    imgs = rng.randint(0, 256, (B, H, W, 3)).astype(np.float32)
    h_frame = wf._round_up(H + 4, wf.LANE)
    d_pad = wf._round_up(W + s * (H - 1), 8)
    a = np.asarray(wf._skew(jnp.asarray(imgs), s, h_frame, d_pad,
                            interpret=True))
    # Compiled branch in interpret-executed pallas: call the fused impl the
    # same way the compiled path does.
    n_in = -(-(255 + 127 * s) // 128)
    wcp = max(wf._round_up(W, 128), n_in * 128)
    x = jnp.pad(jnp.asarray(imgs),
                ((0, 0), (0, h_frame - H), (0, wcp - W), (0, 0)))
    x = x.transpose(3, 0, 1, 2).reshape(3 * B, h_frame, wcp)
    d_t = wf._round_up(d_pad, 128)
    call = wf._skew_transpose_fused_call(3 * B, h_frame, d_t, s, wcp,
                                         "float32", True)
    t = call(*([x] * n_in))
    b = np.asarray((t[:d_pad] if d_t != d_pad else t)
                   .reshape(d_pad, 3, B * h_frame))
    d_idx = np.arange(d_pad)[:, None]
    y_loc = np.arange(B * h_frame)[None, :] % h_frame
    y_fr = np.arange(B * h_frame)[None, :] // h_frame * 0 + \
        (np.arange(B * h_frame)[None, :] // h_frame)
    col = d_idx - s * y_loc
    valid = (col >= 0) & (col < W) & (y_loc < H) & (y_fr < B)
    mask = np.broadcast_to(valid[:, None, :], a.shape)
    np.testing.assert_array_equal(a[mask], b[mask])


@pytest.mark.parametrize("s,b,h,w", [
    (2, 8, 120, 200),    # FS-family skew, no window clamping
    (3, 8, 100, 150),    # dx=-2 kernels' skew
    (2, 16, 380, 140),   # exercises window CLAMPING (gx + s*gy > db - n_in)
    (3, 8, 300, 130),    # s=3 with clamping
])
def test_unskew_kernel_matches_lemma(s, b, h, w):
    """The Pallas unskew kernel (in-VMEM (d,y) transposes + bit-selected
    lane-rolls) must agree with the stride-lemma pad+reshape formulation on
    every valid pixel, including blocks whose d-windows clamp at the edge."""
    import jax.numpy as jnp

    lf = wf._round_up(h + 4, 128)
    d_pad = wf._round_up(wf._round_up(w + s * (h - 1), 256), 8)
    wxp = wf._round_up(w, 128)
    assert d_pad % 128 == 0 and wxp <= d_pad
    rng = np.random.RandomState(s * 100 + b)
    idx = jnp.asarray(rng.randint(0, 64, (d_pad, b, lf)).astype(np.int32))

    # Reference: stride-lemma formulation (interpret path).
    flat = np.asarray(idx).transpose(1, 2, 0).reshape(b, lf * d_pad)
    flat = np.pad(flat, ((0, 0), (0, lf * s)))
    ref = flat.reshape(b, lf, d_pad + s)[:, :h, :w]

    n_in = -(-(128 + 127 * s) // 128)
    out = np.asarray(
        wf._unskew_transpose_call(b, lf, d_pad, s, wxp, True)(*([idx] * n_in)))
    np.testing.assert_array_equal(out[:, :h, :w], ref)


@pytest.mark.parametrize("s,b,h,w,p", [
    (2, 8, 120, 200, 4),
    pytest.param(3, 16, 380, 140, 32,   # clamping + larger palette
                 marks=pytest.mark.slow),
])
def test_unskew_select_kernel_matches_two_step(s, b, h, w, p):
    """Fused unskew+select kernel == stride-lemma unskew + XLA select."""
    import jax.numpy as jnp

    lf = wf._round_up(h + 4, 128)
    d_pad = wf._round_up(wf._round_up(w + s * (h - 1), 256), 8)
    wxp = wf._round_up(w, 128)
    rng = np.random.RandomState(s + b + p)
    idx = jnp.asarray(rng.randint(0, p, (d_pad, b, lf)).astype(np.int32))
    pal = jnp.asarray(rng.randint(0, 256, (p, 3)).astype(np.float32))

    ref_idx = wf._unskew_idx_packed(idx, s, lf, h, w, interpret=True)
    ref = np.asarray(wf._select_palette_colors(ref_idx, pal))

    n_in = -(-(128 + 127 * s) // 128)
    call = wf._unskew_select_call(b, lf, d_pad, s, wxp, p, True)
    planes = call(pal.astype(jnp.int32), *([idx] * n_in))
    out = np.asarray(jnp.stack([planes[0], planes[1], planes[2]],
                               axis=-1)[:, :h, :w])
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_packed_batch_not_multiple_of_8():
    """b=12 disqualifies the fused epilogue's 8-sublane blocking; the XLA
    fallback inside _unskew_select_colors must keep outputs identical to
    the per-frame scan."""
    imgs = np.random.RandomState(31).randint(
        0, 256, (12, 16, 20, 3)).astype(np.float32)
    out = wf._run_packed("fixed", imgs.copy(), PAL, variant="floyd_steinberg")
    for i in (0, 7, 11):
        n = ed_host.ed_fixed(imgs[i].copy(), PAL, "floyd_steinberg", False)
        ident = np.all(out[i] == n, axis=-1).mean()
        assert ident > 0.95, f"frame {i}: {ident}"


@pytest.mark.parametrize("s,b,h,w,dt", [
    (2, 8, 120, 200, "uint8"),
    (3, 8, 100, 150, "float32"),
    pytest.param(2, 16, 380, 140, "uint8",  # d-tiles wrap past wcp
                 marks=pytest.mark.slow),
])
def test_fullrow_skew_matches_lemma(s, b, h, w, dt):
    """Skew kernel v2 (full-row residency + static d-tile slices) must
    agree with the stride-lemma formulation on every valid position."""
    import jax.numpy as jnp

    lf = wf._round_up(h + 4, 128)
    chunk = 8
    _, _, _, d_pad = wf._plan(h, w, 4, 1, s, chunk)
    d_t = wf._round_up(d_pad, 128)
    wcp = wf._round_up(w, 128)
    rng = np.random.RandomState(s * 10 + b)
    imgs = rng.randint(0, 256, (b, h, w, 3)).astype(dt)

    ref = np.asarray(wf._skew_packed(jnp.asarray(imgs), s, lf, d_pad,
                                     interpret=True))  # lemma path, f32

    x = jnp.pad(jnp.asarray(imgs), ((0, 0), (0, lf - h), (0, wcp - w), (0, 0)))
    x = x.transpose(3, 0, 1, 2).reshape(3 * b, lf, wcp)
    out = np.asarray(wf._skew_fullrow_call(3 * b, lf, d_t, s, wcp, dt,
                                           "float32", True)(x))[:d_pad]

    # Compare on valid positions only (col in range, real rows).
    d_idx = np.arange(d_pad)[:, None]
    y_loc = np.arange(lf)[None, :]
    col = d_idx - s * y_loc
    valid = (col >= 0) & (col < w) & (y_loc < h)
    mask = np.broadcast_to(valid[:, None, :], ref.shape)
    np.testing.assert_array_equal(out[mask], ref[mask])


def test_planar_device_fn_matches_nhwc():
    """The planar-in/planar-out device fn (ffmpeg-gbrp ingestion layout —
    no XLA copy on either side of the kernels) is bit-identical to the
    NHWC entry."""
    rng = np.random.RandomState(16)
    frames = rng.randint(0, 256, (8, 16, 20, 3)).astype(np.uint8)
    planes = np.ascontiguousarray(frames.transpose(3, 0, 1, 2))
    fn_n = wf.wavefront_device_fn("fixed", "floyd_steinberg", 16, 20,
                                  PAL.shape[0], 8, interpret=True)
    fn_p = wf.wavefront_device_fn("fixed", "floyd_steinberg", 16, 20,
                                  PAL.shape[0], 8, interpret=True,
                                  planar=True)
    import jax.numpy as jnp

    out_n = np.asarray(fn_n(jnp.asarray(frames), jnp.asarray(PAL)))
    out_p = np.asarray(fn_p(jnp.asarray(planes), jnp.asarray(PAL)))
    assert out_p.shape == (3, 8, 16, 20)
    np.testing.assert_array_equal(out_p.transpose(1, 2, 3, 0), out_n)


@pytest.mark.slow
def test_planar_batch_entry_matches_nhwc():
    """ed_batch_wavefront(planar=True) — the video pipeline's zero-copy
    entry — must be bit-identical to the NHWC entry for every covered
    mode, including the dense (>64-color) palette search, sub-8 batches,
    and VMEM-cap batch splitting."""
    rng = np.random.RandomState(33)
    imgs = rng.randint(0, 256, (9, 17, 21, 3)).astype(np.uint8)
    planes = np.ascontiguousarray(imgs.transpose(3, 0, 1, 2))
    pal100 = np.unique(rng.randint(0, 256, (300, 3)), axis=0)[:100].astype(
        np.float32)

    for mode, variant, pal in [
        ("fixed", "floyd_steinberg", PAL),
        ("ostromoukhov", "", PAL),
        ("perceptual", "", PAL),
        ("fixed", "floyd_steinberg", pal100),  # dense lane search
    ]:
        a = wf.ed_batch_wavefront(imgs, pal, mode, variant)
        b = wf.ed_batch_wavefront(planes, pal, mode, variant, planar=True)
        assert b.shape == (3,) + imgs.shape[:3], (mode, b.shape)
        np.testing.assert_array_equal(a, b.transpose(1, 2, 3, 0)), mode

    # Sub-8 batches pad along the planar batch axis.
    a = wf.ed_batch_wavefront(imgs[:3], PAL, "fixed", "stucki")
    b = wf.ed_batch_wavefront(planes[:, :3], PAL, "fixed", "stucki",
                              planar=True)
    np.testing.assert_array_equal(a, b.transpose(1, 2, 3, 0))


def test_planar_batch_split_matches(monkeypatch):
    """Oversized planar batches split along axis 1 against the VMEM cap."""
    rng = np.random.RandomState(34)
    imgs = rng.randint(0, 256, (10, 12, 14, 3)).astype(np.uint8)
    planes = np.ascontiguousarray(imgs.transpose(3, 0, 1, 2))
    whole = wf._run("fixed", planes, PAL, variant="floyd_steinberg",
                    planar=True)
    monkeypatch.setattr(wf, "_max_packed_batch", lambda *a, **k: 8)
    split = wf._run("fixed", planes, PAL, variant="floyd_steinberg",
                    planar=True)
    np.testing.assert_array_equal(whole, split)


def test_planar_rejects_oversized_palette():
    rng = np.random.RandomState(35)
    planes = rng.randint(0, 256, (3, 8, 8, 8)).astype(np.uint8)
    pal = rng.randint(0, 256, (wf.PACKED_PALETTE_MAX + 1, 3)).astype(
        np.float32)
    with pytest.raises(ValueError, match="planar"):
        wf._run("fixed", planes, pal, variant="floyd_steinberg", planar=True)
