#!/usr/bin/env python
"""Wavefront ED device-sustained throughput vs batch size.

The chain-differential methodology of bench.py config 2 (K distinct
device-resident batches consumed in one jitted dispatch, differential K
vs 1, median of rounds), swept over batch sizes. Finding recorded in
ROADMAP.md (v5e, 2026-08-18): FS-1080p/32-color throughput peaks at the
pipeline's default batch of 16 (1028 fps; batch 32 drops to 805) — the
packed kernel's (3B, lf) per-step tiles already saturate the VPU at 16.

Run on a TPU host:  python tools/batch_scaling.py [batches...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_image(h, w, seed=0):
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        128 + 110 * np.sin(2 * np.pi * (x / w + 0.1 * np.sin(y / 97.0))),
        128 + 90 * np.cos(2 * np.pi * (y / h + 0.2)),
        128 + 100 * np.sin(2 * np.pi * ((x + y) / (h + w))),
    ], axis=-1)
    img += rng.normal(0, 6, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    import jax
    import jax.numpy as jnp

    from dither_pie_tpu.api.cache import enable_compilation_cache
    from dither_pie_tpu.ops import wavefront as wf

    enable_compilation_cache()
    cpu = jax.default_backend() == "cpu"
    H, W = 1080, 1920
    rng = np.random.RandomState(0)
    pal = np.unique(rng.randint(0, 256, (64, 3)),
                    axis=0)[:32].astype(np.float32)
    pal_dev = jnp.asarray(pal)

    def timed_pair(f1, fk, k, rounds=3):
        _ = np.asarray(f1())
        _ = np.asarray(fk())

        def med(f, n=5):
            ts = []
            for _ in range(n):
                t0 = time.time()
                _ = np.asarray(f())
                ts.append(time.time() - t0)
            return sorted(ts)[n // 2]

        return float(np.median([max((med(fk) - med(f1)) / (k - 1), 1e-9)
                                for _ in range(rounds)]))

    base = synth_image(H, W, 7)
    batches = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    for B in batches:
        nb_max = wf._max_packed_batch("fixed", "floyd_steinberg", H, W,
                                      int(pal.shape[0]))
        if B > nb_max:
            print(f"B={B}: exceeds the packed VMEM budget (max {nb_max})",
                  flush=True)
            continue
        bufs = [jnp.asarray(np.stack(
            [base ^ np.uint8(1 + 16 * j + i) for i in range(B)]))
            for j in range(3)]
        fn = wf.wavefront_device_fn("fixed", "floyd_steinberg", H, W,
                                    int(pal.shape[0]), B, interpret=cpu)

        def many(k):
            @jax.jit
            def f(p, *frames):
                acc = jnp.float32(0)
                for i in range(k):
                    out = fn(frames[i],
                             p.at[0, 0].set(acc + jnp.float32(i % 3)))
                    acc = (jnp.sum(out.astype(jnp.int32)).astype(jnp.float32)
                           * jnp.float32(1e-12))
                return acc
            return lambda: f(pal_dev, *bufs[:k])

        per = timed_pair(many(1), many(3), 3)
        print(f"B={B}: {per * 1e3:.1f} ms/batch -> {B / per:.0f} fps "
              f"({B / per * H * W / 1e9:.2f} GPix/s)", flush=True)


if __name__ == "__main__":
    main()
