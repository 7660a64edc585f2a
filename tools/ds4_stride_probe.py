#!/usr/bin/env python
"""Measure + identity-check the stride-4 final conv for the neural DS4 path.

In DS4 mode the video path consumes only ``out[:, 2::4, 2::4]`` of the
aliasnet output (the product image is 4x4-block-constant by construction —
reference save() does /4-then-x4 NEAREST, models/pixelization.py:76-83).
The full path therefore computes the final 7x7/64->3/tanh conv at every
pixel and throws 15/16 of it away. Evaluating that conv with
window_strides=(4,4) on the reflect-padded input cropped by (2,2) computes
EXACTLY the surviving windows (out rows 2+4m start at padded row 2+4m):
same per-window dot product, 16x fewer windows.

Whether the strided lowering is BIT-identical to slice-after-dense is a
toolchain property (reduction order inside one conv window should match,
but that is the compiler's choice) — this probe decides it on hardware, in
both precision modes, before the inference path is allowed to use it.

Run on a TPU host:  python tools/ds4_stride_probe.py [B H W]
Prints per-mode identity (must be 1.0 bitwise) and the alias-stage /
full-forward timing differential.
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
    from dither_pie_tpu.models.c2pgen import _aliasnet_body, _aliasnet_body_ds4
    from dither_pie_tpu.models.layers import bf16_activations
    from dither_pie_tpu.models.param_shapes import random_params

    enable_compilation_cache()
    argv = [a for a in sys.argv[1:] if not a.startswith("-")]
    B, H, W = (int(argv[0]), int(argv[1]), int(argv[2])) if len(argv) == 3 \
        else (8, 512, 912)
    print(f"devices: {jax.devices()}  shape: B={B} {H}x{W}")

    rng = np.random.RandomState(0)
    _, ap = random_params(7)
    ap = {k: jnp.asarray(v) for k, v in ap.items()}
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32))

    # --identity-only skips the chained timing programs (each is a large
    # extra compile; the identity question is the gate, timing the bonus).
    identity_only = "--identity-only" in sys.argv
    failures = []
    for prec in ("float32", "bfloat16"):
        fast = prec == "bfloat16"

        @jax.jit
        def dense(ap, x):
            with jax.default_matmul_precision(prec), bf16_activations(fast):
                out = _aliasnet_body(ap, x).astype(jnp.float32)
            return out[:, 2::4, 2::4, :]

        @jax.jit
        def strided(ap, x):
            with jax.default_matmul_precision(prec), bf16_activations(fast):
                return _aliasnet_body_ds4(ap, x).astype(jnp.float32)

        a = np.asarray(dense(ap, x))
        b = np.asarray(strided(ap, x))
        ident = float(np.mean(a == b))
        max_err = float(np.max(np.abs(a - b)))
        # Mirror the runtime admission rule (_gated_batch_forward):
        # f32 requires BITWISE identity; bf16 is admitted on a quality
        # budget (its dense lowering is itself a different reduction
        # order) — pre-u8 divergence must stay far inside half a u8 bin
        # (2/255/2 ~ 3.9e-3; measured on v5e: <= 1.3e-4).
        if prec == "float32":
            ok = ident == 1.0
            bar = "bitwise"
        else:
            ok = max_err <= 2e-3
            bar = "max|err| <= 2e-3"
        if not ok:
            failures.append(f"{prec} ({bar}: identity {ident:.6f}, "
                            f"max|err| {max_err:.3e})")
        print(f"[{prec}] bitwise identity {ident:.6f}  max|err| {max_err:.3e}"
              f"  gate({bar}): {'ok' if ok else 'FAIL'}", flush=True)
        if identity_only or prec == "float32":
            continue  # time only bf16 (the production video mode)

        # Timing: k-chained programs so relay dispatch overhead cancels
        # (the same methodology as bench.py's timed_pair).
        def chain(fn, k):
            @jax.jit
            def f(ap, x):
                acc = jnp.float32(0)
                out = None
                for i in range(k):
                    out = fn(ap, x + acc)
                    acc = out[0, 0, 0, 0] * jnp.float32(1e-9)
                return out
            return f

        for name, fn in (("dense+slice", lambda ap, x: dense(ap, x)),
                         ("strided", lambda ap, x: strided(ap, x))):
            f1, f3 = chain(fn, 1), chain(fn, 3)
            f1(ap, x).block_until_ready()
            f3(ap, x).block_until_ready()
            t1 = min(_t(f1, ap, x) for _ in range(3))
            t3 = min(_t(f3, ap, x) for _ in range(3))
            per = (t3 - t1) / 2
            print(f"[{prec}] alias {name}: {per*1000:.1f} ms/batch "
                  f"({B/per:.1f} fps)")

    # Gate semantics: nonzero exit when any mode fails ITS admission rule
    # (f32 bitwise / bf16 budget), so CI / shell recipes can use this
    # probe directly as a go/no-go check on healthy hardware.
    if failures:
        print("FAIL: " + "; ".join(failures), flush=True)
        sys.exit(1)
    print("OK: strided conv admissible in all tested modes", flush=True)


def _t(f, *a):
    t0 = time.time()
    f(*a).block_until_ready()
    return time.time() - t0


if __name__ == "__main__":
    main()
