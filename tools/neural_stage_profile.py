#!/usr/bin/env python
"""Stage-level timing of the neural forward on hardware.

Times each submodule of the pixelization forward (rgb_encoder, the
8-modulated-conv section, the full decoder, aliasnet, and the complete
gen+alias pass) at the video path's working shape, in both precision
modes. This is the harness that attributed the forward's cost across
stages (2026-08-18, v5e, batch 8 @ 512x912):

    bf16:  encoder 76 ms | mod-convs 131 | decoder 201 | alias 166 | full 376
    f32:   encoder 230 ms | mod-convs 615 | decoder 962 | alias 616 | full 1749

i.e. cost is spread uniformly (~17-33 TF/s per stage) rather than
concentrated in the vmapped modulated convs, which motivated the
bf16-activations fast mode (models/layers.bf16_activations) over a
grouped-conv rewrite.

2026-08-19 follow-up (same shapes): the "(shared style)" rows feed the
PRODUCT code shape — (1, 2048), one reference.png styling the whole batch
— which modulated_conv now serves with ONE dense batch-B conv instead of
B vmapped per-sample convs. Measured on the v5e:

    bf16: mod-convs 128 -> 39 ms (3.3x), FULL fwd 338 -> 250 ms (1.35x)
    f32:  mod-convs 611 -> 95 ms (6.5x), FULL fwd 1749 -> 1227 ms (1.43x)

Direct per-op microbenches are NOT reliable through the dev relay (it
dedupes byte-identical dispatches and jax caches host values);
stage-level programs with large live outputs are.

Run on a TPU host:  python tools/neural_stage_profile.py [B H W]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from dither_pie_tpu.api.cache import enable_compilation_cache
    from dither_pie_tpu.models import c2pgen as m
    from dither_pie_tpu.models.layers import bf16_activations, modulated_conv
    from dither_pie_tpu.models.param_shapes import random_params

    enable_compilation_cache()
    args = [int(a) for a in sys.argv[1:]]
    B, H, W = (args + [8, 512, 912])[:3]
    gen, alias = random_params(0)
    gen = {k: jnp.asarray(v) for k, v in gen.items()}
    alias = {k: jnp.asarray(v) for k, v in alias.items()}
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32))
    code = jnp.asarray(rng.uniform(-1, 1, (B, 2048)).astype(np.float32))
    feat = jnp.asarray(
        rng.uniform(-1, 1, (B, H // 4, W // 4, 256)).astype(np.float32))

    def timed(name, fn, *fargs, reps=6):
        f = jax.jit(fn)
        jax.block_until_ready(f(*fargs))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*fargs))
            ts.append(time.perf_counter() - t0)
        print(f"{name:28s} {sorted(ts)[len(ts) // 2] * 1e3:8.1f} ms",
              flush=True)

    for P in ("bfloat16", "float32"):
        print(f"--- precision {P} (batch {B} @ {H}x{W}) ---", flush=True)
        fast = P == "bfloat16"

        def enc(a):
            with jax.default_matmul_precision(P), bf16_activations(fast):
                return m.rgb_encoder(gen, "RGBEnc", a)

        def modsec(f, c):
            with jax.default_matmul_precision(P), bf16_activations(fast):
                cc = lambda i: c[:, 256 * i:256 * (i + 1)]
                xx = f
                r = xx
                xx = modulated_conv(gen, "RGBDec.mod_conv_1", xx, cc(0))
                xx = modulated_conv(gen, "RGBDec.mod_conv_2", xx, cc(1))
                xx = xx + r
                for j in (2, 4, 6):
                    r = xx
                    xx = modulated_conv(gen, "RGBDec.mod_conv_2", xx, cc(j))
                    xx = modulated_conv(gen, "RGBDec.mod_conv_2", xx,
                                        cc(j + 1))
                    xx = xx + r
                return xx

        def dec(f, c):
            with jax.default_matmul_precision(P), bf16_activations(fast):
                return m.rgb_decoder(gen, "RGBDec", f, c)

        def alias_fn(a):
            return m.aliasnet_forward(alias, a, precision=P)

        def fullfwd(a, c):
            return m.aliasnet_forward(
                alias, m.c2pgen_forward(gen, a, adain=c, precision=P),
                precision=P)

        timed("rgb_encoder (full->256)", enc, x)
        timed("mod-conv section (8x)", modsec, feat, code)
        # Shared-style rows: a (1, 2048) code is the PRODUCT shape (one
        # reference.png styles the whole batch) — modulated_conv then runs
        # one dense batch-B conv instead of B vmapped per-sample convs.
        timed("mod-conv 8x (shared style)", modsec, feat, code[:1])
        timed("rgb_decoder (mod+up)", dec, feat, code)
        timed("aliasnet", alias_fn, x)
        timed("FULL fwd (gen+alias)", fullfwd, x, code)
        timed("FULL fwd (shared style)", fullfwd, x, code[:1])


if __name__ == "__main__":
    main()
