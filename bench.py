#!/usr/bin/env python
"""Benchmark: prints ONE JSON line with the headline metric.

Configs (BASELINE.md):
  A. 1080p Bayer 8x8 ordered dither -> 16-color palette  (target >= 1 GPix/s)
  B. 1080p Floyd-Steinberg wavefront, 32-color palette   (target >= 300 fps)

Methodology: sustained on-device throughput. The dev harness reaches the TPU
through a network relay whose per-dispatch latency (tens of ms, high
variance) and host-link bandwidth (~MB/s) are artifacts of the tunnel, not
the chip. We therefore time K back-to-back kernel executions inside a single
jitted dispatch (differential K=5 vs K=1, median of repeats), which is what
a production pipeline (frames resident on device) sustains.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from dither_pie_tpu.api.cache import enable_compilation_cache

    enable_compilation_cache()

    platform = None
    for attempt in range(6):
        try:
            jax.devices()
            platform = jax.default_backend()
            break
        except Exception as e:
            log(f"backend init attempt {attempt}: {e}")
            time.sleep(10)
    if platform is None:
        jax.config.update("jax_platforms", "cpu")
        platform = "cpu"
    log(f"platform: {platform}, devices: {jax.devices()}")

    import os

    small = os.environ.get("BENCH_SMALL") == "1"  # CI smoke on CPU
    H, W = (96, 128) if small else (1080, 1920)
    mpix = H * W / 1e6
    rng = np.random.RandomState(0)

    def timed_pair(f1, fk, k):
        """Median diff timing of jitted f1 vs fk (k executions)."""
        _ = np.asarray(f1())  # compile
        _ = np.asarray(fk())
        def med(f, n=5):
            ts = []
            for _ in range(n):
                t0 = time.time()
                _ = np.asarray(f())
                ts.append(time.time() - t0)
            return sorted(ts)[n // 2]
        t1, tk = med(f1), med(fk)
        return max((tk - t1) / (k - 1), 1e-9)

    # ---- A: Bayer 8x8, 16 colors, batch of 8 frames -----------------------
    from dither_pie_tpu.core.thresholds import bayer_matrix
    from dither_pie_tpu.ops.ordered import tile_screen_device
    from dither_pie_tpu.ops.ordered_pallas import ordered_dither_fused

    B_A = 2 if small else 8
    frames = jnp.asarray(rng.randint(0, 256, (B_A, H, W, 3), dtype=np.uint8))
    palette16 = jnp.asarray(rng.randint(0, 256, (16, 3)).astype(np.float32))
    screen = tile_screen_device(jnp.asarray(bayer_matrix("8x8")), H, W)

    # All inputs passed as jit ARGUMENTS (closures would inline device
    # arrays into the HLO and blow the remote-compile request limit).
    def bayer_many(k):
        @jax.jit
        def f(frames, palette16, screen):
            acc = jnp.zeros((), jnp.uint32)
            for i in range(k):
                out = ordered_dither_fused(
                    jnp.bitwise_xor(frames, jnp.uint8(i)), palette16, screen,
                    interpret=platform == "cpu", bucket=False)
                acc = acc + out[0, 0, 0, 0].astype(jnp.uint32) + out[-1, -1, -1, -1]
            return acc
        return lambda: f(frames, palette16, screen)

    per_a = timed_pair(bayer_many(1), bayer_many(3), 3)
    bayer_mpix_s = B_A * mpix / per_a
    log(f"A bayer8x8@1080p x{B_A}: {per_a*1000:.2f} ms/batch -> "
        f"{bayer_mpix_s:.0f} MPix/s ({bayer_mpix_s/1000:.2f} GPix/s)")

    # ---- C: blue-noise screen + 16-color custom palette (batch-folder
    # analogue). Same kernel shape as A -> no extra compile.
    from dither_pie_tpu.core.thresholds import blue_noise_cached
    from dither_pie_tpu.utils import PaletteManager

    bn_screen = tile_screen_device(jnp.asarray(blue_noise_cached(64, 42)), H, W)
    pico8 = PaletteManager().get_palette_colors_rgb("pico8_palette")
    pal_c = jnp.asarray(np.asarray(pico8, np.float32)) if pico8 and len(pico8) == 16 \
        else palette16

    def bn_many(k):
        @jax.jit
        def f(frames, pal, screen):
            acc = jnp.zeros((), jnp.uint32)
            for i in range(k):
                out = ordered_dither_fused(
                    jnp.bitwise_xor(frames, jnp.uint8(i + 7)), pal, screen,
                    interpret=platform == "cpu", bucket=False)
                acc = acc + out[0, 0, 0, 0].astype(jnp.uint32) + out[-1, -1, -1, -1]
            return acc
        return lambda: f(frames, pal_c, bn_screen)

    per_c = timed_pair(bn_many(1), bn_many(3), 3)
    bn_mpix_s = B_A * mpix / per_c
    log(f"C blue-noise+pico8@1080p x{B_A}: {per_c*1000:.2f} ms/batch -> "
        f"{bn_mpix_s:.0f} MPix/s ({bn_mpix_s/1000:.2f} GPix/s)")

    # ---- B: Floyd-Steinberg wavefront, 32 colors, batch of 8 --------------
    from dither_pie_tpu.ops import wavefront as wf

    B_B = 2 if small else 8
    pal32 = rng.randint(0, 256, (32, 3)).astype(np.float32)
    s, n_slots = wf._scan_params("fixed", "floyd_steinberg")
    chunk = wf._chunk_for(n_slots)
    lf, _, pp, d_pad = wf._plan(H, W, 32, 1, s, chunk, bucket=False)
    call = wf._compiled_packed("fixed", "floyd_steinberg", d_pad, B_B, lf,
                               pp, 1.0, 0.2, platform == "cpu")
    imgs = jnp.asarray(rng.randint(0, 256, (B_B, H, W, 3)).astype(np.float32))
    sk = wf._skew_packed(imgs, s, lf, d_pad)
    pal_dev = jnp.asarray(wf._pad_palette_packed(pal32, pp, B_B))
    aux = jnp.zeros((1, 8), jnp.float32)
    dims = jnp.asarray(np.array([W, H], dtype=np.int32))

    def fs_many(k):
        @jax.jit
        def f(dims, sk, pal_dev, aux):
            acc = jnp.zeros((), jnp.int32)
            for i in range(k):
                out = call(dims, sk + jnp.float32(i) * jnp.float32(1e-6), pal_dev, aux)
                acc = acc + out[0, 0, 0] + out[-1, -1, -1]
            return acc
        return lambda: f(dims, sk, pal_dev, aux)

    per_b = timed_pair(fs_many(1), fs_many(3), 3)
    fs_fps = B_B / per_b
    fs_mpix_s = fs_fps * mpix
    log(f"B floyd_steinberg@1080p x{B_B}: {per_b*1000:.2f} ms/batch -> "
        f"{fs_fps:.0f} fps ({fs_mpix_s:.0f} MPix/s)")

    # Headline: 1080p FS video fps vs the 300 fps target.
    result = {
        "metric": "1080p Floyd-Steinberg dither throughput (device-sustained)",
        "value": round(fs_fps, 1),
        "unit": "fps",
        "vs_baseline": round(fs_fps / 300.0, 3),
        "details": {
            "platform": platform,
            "bayer8x8_1080p_gpix_per_s": round(bayer_mpix_s / 1000.0, 3),
            "bayer_vs_1gpix_target": round(bayer_mpix_s / 1000.0, 3),
            "bluenoise_pico8_1080p_gpix_per_s": round(bn_mpix_s / 1000.0, 3),
            "fs_1080p_fps": round(fs_fps, 1),
            "fs_batch": B_B,
            "method": "K-chained in-dispatch differential (relay-independent)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
