#!/usr/bin/env python
"""Dense-palette search: exact VPU sweep vs MXU-scored argmax, at scale.

Measures on real hardware (720p and 1080p, batch 8, P=256):
  * end-to-end wavefront fps for both search forms;
  * pick-flip fraction and block-mean fidelity of mxu vs exact (the
    flips are near-ties; this quantifies them at production scale).

Run on a TPU host:  python tools/dense_search_bench.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth(h, w, b, seed, content="photo"):
    """Content classes: 'photo' (structured + noise), 'smooth' (pure
    gradients — maximal near-tie density), 'noise' (uniform random)."""
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    if content == "noise":
        out = rng.randint(0, 256, (b, h, w, 3))
        return out.astype(np.float32)
    base = np.stack([128 + 110 * np.sin(2 * np.pi * x / w),
                     128 + 90 * np.cos(2 * np.pi * y / h),
                     (x + y) * 255 / (h + w)], -1)
    sigma = 0.0 if content == "smooth" else 6.0
    return np.stack([np.clip(np.roll(base, 7 * i, axis=1)
                             + rng.normal(0, sigma, base.shape), 0, 255)
                     for i in range(b)]).astype(np.uint8).astype(np.float32)


def main():
    from dither_pie_tpu.api.cache import enable_compilation_cache
    from dither_pie_tpu.core.fidelity import identity_fraction
    from dither_pie_tpu.ops import wavefront as wf

    enable_compilation_cache()
    rng = np.random.RandomState(42)
    pal = np.unique(rng.randint(0, 256, (600, 3)), axis=0)[:256].astype(
        np.float32)

    def run(imgs, mode_env, timed=True):
        os.environ["DITHER_PIE_TPU_DENSE_SEARCH"] = mode_env
        try:
            out = wf.ed_batch_wavefront(imgs.copy(), pal, "fixed",
                                        "floyd_steinberg")
            if not timed:
                return out, 0.0
            t0 = time.perf_counter()
            n = 3
            for _ in range(n):
                out = wf.ed_batch_wavefront(imgs.copy(), pal, "fixed",
                                            "floyd_steinberg")
            dt = (time.perf_counter() - t0) / n
            return out, 8 / dt
        finally:
            del os.environ["DITHER_PIE_TPU_DENSE_SEARCH"]

    for h, w in [(720, 1280), (1080, 1920)]:
        imgs = synth(h, w, 8, h)
        o_ex, fps_ex = run(imgs, "exact")
        o_mx, fps_mx = run(imgs, "mxu")
        ident = np.mean([identity_fraction(o_mx[i].astype(np.float32),
                                           o_ex[i].astype(np.float32))
                         for i in range(8)])
        print(f"{h}p P=256 FS batch-8: exact {fps_ex:.1f} fps, "
              f"mxu {fps_mx:.1f} fps ({fps_mx / fps_ex:.2f}x); "
              f"mxu-vs-exact identity {ident:.6f}", flush=True)

    # Flip characterization across content classes (720p, same compile).
    for content in ("smooth", "photo", "noise"):
        imgs = synth(720, 1280, 8, 99, content)
        o_ex, _ = run(imgs, "exact", timed=False)
        o_mx, _ = run(imgs, "mxu", timed=False)
        ident = np.mean([identity_fraction(o_mx[i].astype(np.float32),
                                           o_ex[i].astype(np.float32))
                         for i in range(8)])
        print(f"720p P=256 content={content}: mxu-vs-exact identity "
              f"{ident:.6f}", flush=True)


if __name__ == "__main__":
    main()
