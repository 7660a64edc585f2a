#!/usr/bin/env python
"""Hardware bit-identity sweep: wavefront kernels vs the C++ golden engine
across shapes, variants, and content classes.

This sweep caught two real bugs the unit suite's small shapes could not:
a scoped-vmem overflow in the v1 kernel at 720p batch 8, and the
error-accumulation-order divergence (the golden engine folds error from
the image value in contributor-scan order; a single accumulated error
buffer diverges at scale — see DESIGN.md "Exact accumulation order").

Run on a TPU host:  python tools/identity_sweep.py [--quick]
Expect: identity 1.0 on every line. Anything below 1.0 is a regression.
"""

import sys

import numpy as np


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
    shapes = [(480, 640)] if quick else [(480, 640), (720, 1280)]
    variants = ["floyd_steinberg", "stucki", "atkinson", "jjn",
                "sierra_lite"]
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
            for variant in variants:
                out = wf.ed_batch_wavefront(imgs.copy(), pal8, "fixed",
                                            variant)
                g = ed_host.ed_fixed(imgs[3].copy(), pal8, variant, False)
                check(f"{tag} {h}p/{variant}", out[3], g)
            out = wf.ed_batch_wavefront(imgs.copy(), pal8, "ostromoukhov")
            check(f"{tag} {h}p/ostromoukhov", out[3],
                  ed_host.ed_ostromoukhov(imgs[3].copy(), pal8, False))
            out = wf.ed_batch_wavefront(imgs.copy(), pal8, "hybrid")
            check(f"{tag} {h}p/hybrid", out[3],
                  ed_host.ed_hybrid(imgs[3].copy(), pal8, 1.0, 0.2, True))
            out = wf.ed_batch_wavefront(imgs.copy(), pal8, "perceptual")
            check(f"{tag} {h}p/perceptual", out[3],
                  ed_host.ed_perceptual(imgs[3].copy(), pal8))

    print("ALL BIT-IDENTICAL" if not bad else f"DIVERGENT: {bad}")
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())
