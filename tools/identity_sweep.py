#!/usr/bin/env python
"""Hardware bit-identity sweep: wavefront kernels vs the C++ golden engine
across shapes, variants, and content classes.

This sweep caught two real bugs the unit suite's small shapes could not:
a scoped-vmem overflow in the v1 kernel at 720p batch 8, and the
error-accumulation-order divergence (the golden engine folds error from
the image value in contributor-scan order; a single accumulated error
buffer diverges at scale — see DESIGN.md "Exact accumulation order").

Golden semantics: every ED cell gates on the f32-lookup engine — the
kernel's exact f32 palette-search arithmetic, the same semantics FAMILY
as the reference's Numba fast paths where those exist (fixed +
ostromoukhov; the reference's Numba hybrid does its luminance split in
f64 intermediates, and perceptual/adaptive have no Numba path at all —
for those modes the f32 contract is this framework's choice, bounded
against the reference's f64-KDTree ordering by the >=0.95 perceptual
parity tests). The f64-exact engine legitimately differs on exact
half-way palette ties, which u8 content can reach (error fractions like
0.5 are exactly representable) — first observed at u8
1080p/ostromoukhov, where ONE such tie ([0,0,~127.5] between black and
blue) flips and diffuses to 24% of downstream pixels while the kernel
stays 1.0 vs the f32 engine. To keep the stricter engine in the loop at
scale, one f32-content cell per shape ALSO gates on the f64-exact
engine (continuous f32 content makes exact ties measure-zero).

Run on a TPU host:  python tools/identity_sweep.py [--quick | --p1080]
Expect: identity 1.0 on every line. Anything below 1.0 is a regression.

--p1080 sweeps the headline resolution (1080p) with a focused cell set
(fs/stucki/ostromoukhov, 256-color, index-gather, planar) — the full
variant grid runs at 480p/720p by default.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth(h, w, b, seed, as_u8):
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([128 + 110 * np.sin(2 * np.pi * x / w),
                     128 + 90 * np.cos(2 * np.pi * y / h),
                     (x + y) * 255 / (h + w)], -1)
    out = np.stack([np.clip(np.roll(base, 7 * i, axis=1)
                            + rng.normal(0, 6, base.shape), 0, 255)
                    for i in range(b)])
    # u8 = the product path's integer content; f32 = continuous values
    # through the raw strategy API (a stricter accumulation-order test).
    return out.astype(np.uint8).astype(np.float32) if as_u8 \
        else out.astype(np.float32)


def main():
    from dither_pie_tpu.api.cache import enable_compilation_cache
    from dither_pie_tpu.core.fidelity import identity_fraction
    from dither_pie_tpu.ops import ed_host
    from dither_pie_tpu.ops import wavefront as wf

    enable_compilation_cache()
    quick = "--quick" in sys.argv
    # --p1080 sweeps the HEADLINE resolution with a focused variant set
    # (the full 8-variant × 2-shape grid already runs at 480p/720p; the
    # divergence classes this sweep catches are shape-scaling bugs, so one
    # deep shape + one wide variant grid covers both axes).
    p1080 = "--p1080" in sys.argv
    if p1080 and quick:
        sys.exit("--quick and --p1080 are mutually exclusive: --p1080 is "
                 "the focused 1080p set, --quick the 480p-only grid.")
    if p1080:
        shapes = [(1080, 1920)]
        variants = ["floyd_steinberg", "stucki"]
    else:
        shapes = [(480, 640)] if quick else [(480, 640), (720, 1280)]
        # ALL 8 fixed variants: burkes/sierra/sierra_two_row were skipped
        # in round 2 — and the accumulation-order divergence class this
        # sweep exists to catch appeared ONLY at 720p scale.
        variants = ["floyd_steinberg", "stucki", "atkinson", "jjn",
                    "sierra_lite", "burkes", "sierra", "sierra_two_row"]
    bad = {}

    def check(name, out, golden):
        v = identity_fraction(out.astype(np.float32), golden)
        print(f"{name}: {v}", flush=True)
        if v < 1.0:
            bad[name] = v

    pal8 = np.array([[0, 0, 0], [255, 255, 255], [255, 0, 0], [0, 255, 0],
                     [0, 0, 255], [255, 255, 0], [0, 255, 255],
                     [255, 0, 255]], np.float32)
    for as_u8 in (True, False):
        tag = "u8" if as_u8 else "f32"
        for (h, w) in shapes:
            imgs = synth(h, w, 8, h, as_u8)
            # Golden = the f32-semantics engine (the reference's Numba-path
            # arithmetic, which is what the kernel implements bit-for-bit).
            # The f64-exact engine (scipy-KDTree candidate ordering, the
            # reference's no-numba fallback) is NOT the gate: u8 content
            # reaches exact half-way palette ties (error fractions like 0.5
            # are exactly representable, so a working value can sit at
            # b=127.5 between two palette colors), where f64-vs-f32
            # ordering legitimately differs. First observed: one such tie
            # at u8 1080p/ostromoukhov (identity 0.763 vs f64 after the
            # diffusion cone, 1.0 vs f32 — both engines, kernel included,
            # agree everywhere else).
            for variant in variants:
                out = wf.ed_batch_wavefront(imgs.copy(), pal8, "fixed",
                                            variant)
                g = ed_host.ed_fixed_fast(imgs[3].copy(), pal8, variant,
                                          False)
                check(f"{tag} {h}p/{variant}", out[3], g)
            out = wf.ed_batch_wavefront(imgs.copy(), pal8, "ostromoukhov")
            check(f"{tag} {h}p/ostromoukhov", out[3],
                  ed_host.ed_ostromoukhov_fast(imgs[3].copy(), pal8, False))
            if not p1080:
                out = wf.ed_batch_wavefront(imgs.copy(), pal8, "hybrid")
                check(f"{tag} {h}p/hybrid", out[3],
                      ed_host.ed_hybrid_fast(imgs[3].copy(), pal8, 1.0, 0.2,
                                             True))
                out = wf.ed_batch_wavefront(imgs.copy(), pal8, "perceptual")
                check(f"{tag} {h}p/perceptual", out[3],
                      ed_host.ed_perceptual_fast(imgs[3].copy(), pal8))
                # Adaptive-variance: the gate is computed exactly as the
                # strategy computes it (variance map >= threshold).
                from dither_pie_tpu.ops import adaptive as adp
                gray = (np.float32(0.299) * imgs[..., 0]
                        + np.float32(0.587) * imgs[..., 1]
                        + np.float32(0.114) * imgs[..., 2])
                gates = np.stack([adp.variance_map_np(g, 1) >= 300.0
                                  for g in gray]).astype(np.float32)
                out = wf.ed_batch_wavefront(imgs.copy(), pal8, "adaptive",
                                            aux=gates)
                check(f"{tag} {h}p/adaptive", out[3],
                      ed_host.ed_adaptive_fast(imgs[3].copy(), pal8,
                                               gates[3] > 0.5))

            if not as_u8:
                # One f32-CONTENT cell per shape gated on the f64-EXACT
                # engine (scipy-KDTree candidate ordering): continuous f32
                # content makes exact half-way ties measure-zero, so the
                # stricter engine stays in the loop at scale — a shared
                # systematic error in kernel + f32 twin would fail here.
                out = wf.ed_batch_wavefront(imgs.copy(), pal8, "fixed",
                                            "floyd_steinberg")
                check(f"{tag} {h}p/fs-f64-exact-gate", out[3],
                      ed_host.ed_fixed(imgs[3].copy(), pal8,
                                       "floyd_steinberg", False))

            # Large palettes exercise the packed lane-search kernel (the
            # round-2 v1 fallback): 256 colors, fs + ostromoukhov. Golden
            # is the f32 engine: with 256 dense random colors, f32-vs-f64
            # near-ties in the palette search become likely (measured: 38
            # flips at u8 720p, and the f32 golden diverges from the f64
            # exact engine by the IDENTICAL set — the reference's own
            # Numba path has f32 semantics, which is what the kernel
            # implements bit-for-bit).
            prng = np.random.RandomState(42)
            pal256 = np.unique(prng.randint(0, 256, (600, 3)),
                               axis=0)[:256].astype(np.float32)
            out = wf.ed_batch_wavefront(imgs.copy(), pal256, "fixed",
                                        "floyd_steinberg")
            check(f"{tag} {h}p/fs-pal256", out[3],
                  ed_host.ed_fixed_fast(imgs[3].copy(), pal256,
                                        "floyd_steinberg", False))
            out = wf.ed_batch_wavefront(imgs.copy(), pal256, "ostromoukhov")
            check(f"{tag} {h}p/ostromoukhov-pal256", out[3],
                  ed_host.ed_ostromoukhov_fast(imgs[3].copy(), pal256,
                                               False))

            # Past-256 palettes (cap is now 1024): 512 colors exercises the
            # halving-tree select at depth 9 on hardware.
            pal512 = np.unique(prng.randint(0, 256, (1400, 3)),
                               axis=0)[:512].astype(np.float32)
            if not p1080:
                out = wf.ed_batch_wavefront(imgs.copy(), pal512, "fixed",
                                            "floyd_steinberg")
                check(f"{tag} {h}p/fs-pal512", out[3],
                      ed_host.ed_fixed_fast(imgs[3].copy(), pal512,
                                            "floyd_steinberg", False))

            # 600 colors buckets to pp=1024 (nblk=4): TWO block-combine
            # levels of the blocked tournament (_TOURNEY_BLK=256) on
            # hardware — pal512 exercises only one.
            pal600 = np.unique(prng.randint(0, 256, (1500, 3)),
                               axis=0)[:600].astype(np.float32)
            if not p1080:
                out = wf.ed_batch_wavefront(imgs.copy(), pal600, "fixed",
                                            "floyd_steinberg")
                check(f"{tag} {h}p/fs-pal600-pp1024", out[3],
                      ed_host.ed_fixed_fast(imgs[3].copy(), pal600,
                                            "floyd_steinberg", False))

            # Past-PACKED_PALETTE_MAX: 2048 colors routes to the v1
            # (per-channel gather epilogue) fallback — the one kernel path
            # with no hardware identity cell before round 5. The C++ f32
            # twin now extends to 4096 (ed_scan.cpp MAX_PAL), so the same
            # tie-robust golden gates it. One shape is enough (the v1
            # divergence class is epilogue/search logic, not scaling).
            if not p1080 and h == 480:
                pal2048 = np.unique(prng.randint(0, 256, (9000, 3)),
                                    axis=0)[:2048].astype(np.float32)
                out = wf.ed_batch_wavefront(imgs.copy(), pal2048, "fixed",
                                            "floyd_steinberg")
                check(f"{tag} {h}p/fs-pal2048-v1", out[3],
                      ed_host.ed_fixed_fast(imgs[3].copy(), pal2048,
                                            "floyd_steinberg", False))

            # Index-emitting kernel variants (the 1-2 byte/pixel transfer
            # stream): the host palette gather must reproduce the color
            # output bit-for-bit at scale, u8 (P<=256) and u16 (P>256).
            col = wf.ed_batch_wavefront(imgs.copy(), pal8, "fixed",
                                        "floyd_steinberg")
            idx = wf.ed_batch_wavefront(imgs.copy(), pal8, "fixed",
                                        "floyd_steinberg",
                                        return_indices=True)
            check(f"{tag} {h}p/fs-idx-gather",
                  pal8.astype(np.uint8)[idx][3], col[3])
            if not p1080:
                col = wf.ed_batch_wavefront(imgs.copy(), pal512, "fixed",
                                            "floyd_steinberg")
                idx = wf.ed_batch_wavefront(imgs.copy(), pal512, "fixed",
                                            "floyd_steinberg",
                                            return_indices=True)
                check(f"{tag} {h}p/fs-pal512-idx16-gather",
                      pal512.astype(np.uint8)[idx][3], col[3])

            # Planar entry (the video pipeline's zero-copy ffmpeg-gbrp
            # flow): same kernel core, different skew/unskew data movers —
            # sweep it at scale on both the small- and dense-palette
            # epilogues.
            planes = np.ascontiguousarray(imgs.transpose(3, 0, 1, 2))
            out = wf.ed_batch_wavefront(planes.copy(), pal8, "fixed",
                                        "floyd_steinberg", planar=True)
            check(f"{tag} {h}p/fs-planar", out.transpose(1, 2, 3, 0)[3],
                  ed_host.ed_fixed_fast(imgs[3].copy(), pal8,
                                        "floyd_steinberg", False))
            if not p1080:
                out = wf.ed_batch_wavefront(planes.copy(), pal256,
                                            "ostromoukhov", planar=True)
                check(f"{tag} {h}p/ostromoukhov-pal256-planar",
                      out.transpose(1, 2, 3, 0)[3],
                      ed_host.ed_ostromoukhov_fast(imgs[3].copy(), pal256,
                                                   False))

    print("ALL BIT-IDENTICAL" if not bad else f"DIVERGENT: {bad}")
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())
