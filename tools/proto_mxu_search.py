#!/usr/bin/env python
"""Prototype: MXU-scored dense-palette search vs the exact VPU sequence.

The packed wavefront kernel's dense (>64-color) palette search is linear
in P on the VPU (~8 ops/entry/lane). This prototype measures an
MXU-scored alternative inside a Pallas kernel:

    argmin_p |x - c_p|^2  ==  argmax_p (c_p . x - |c_p|^2 / 2)

with the augmented palette (c_r, c_g, c_b, -|c|^2/2) @ (x_r, x_g, x_b, 1)
as ONE dot_general per step. First-wins argmax via iota/min like the
exact path. Measures: per-step time of both forms over a synthetic
(R, lf) working tile, and the argmin flip fraction vs the exact f32
sequence (flips happen only on near-ties; quantified here).

Run:  python tools/proto_mxu_search.py [pp] [iters]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pp = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nb, lf = 8, 1152  # 1080p-ish packed tile
    R = 3 * nb
    interp = jax.default_backend() == "cpu"

    rng = np.random.RandomState(0)
    pal = rng.randint(0, 256, (pp, 3)).astype(np.float32)
    cur = np.clip(rng.normal(128, 60, (R, lf)), 0, 255).astype(np.float32)

    # Exact form: (pp, lf) squared-distance tile per batch row. One grid
    # step per "pixel step" (the real kernel's chunk loop is grid-like).
    def exact_kernel(cur_ref, pal_ref, idx_ref):
        p_iota = jax.lax.broadcasted_iota(jnp.int32, (pp, lf), 0)
        for b in range(nb):
            diff3 = jnp.concatenate(
                [pal_ref[:, c:c + 1] - cur_ref[c * nb + b:c * nb + b + 1]
                 for c in range(3)], axis=0)
            sq = diff3 * diff3
            d2 = (sq[0:pp] + sq[pp:2 * pp]) + sq[2 * pp:3 * pp]
            dmin = jnp.min(d2, axis=0, keepdims=True)
            idxb = jnp.min(jnp.where(d2 == dmin, p_iota, pp),
                           axis=0, keepdims=True).astype(jnp.int32)
            idx_ref[b:b + 1] = idxb

    # MXU form: one (pp, 4) @ (4, lf) dot per batch row.
    def mxu_kernel(cur_ref, paug_ref, idx_ref):
        p_iota = jax.lax.broadcasted_iota(jnp.int32, (pp, lf), 0)
        ones = jnp.ones((1, lf), jnp.float32)
        for b in range(nb):
            xa = jnp.concatenate(
                [cur_ref[c * nb + b:c * nb + b + 1] for c in range(3)]
                + [ones], axis=0)  # (4, lf)
            score = jax.lax.dot_general(
                paug_ref[...], xa,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (pp, lf)
            smax = jnp.max(score, axis=0, keepdims=True)
            idxb = jnp.min(jnp.where(score == smax, p_iota, pp),
                           axis=0, keepdims=True).astype(jnp.int32)
            idx_ref[b:b + 1] = idxb

    paug = np.concatenate(
        [pal, -0.5 * (pal * pal).sum(1, keepdims=True)], axis=1)

    def build(kern, pal_arr):
        # Grid over iters: each step redoes the full nb-row search (the
        # out block revisits slot 0, matching the real kernel's chunked
        # sequential structure without a giant unroll).
        return pl.pallas_call(
            kern,
            grid=(iters,),
            in_specs=[pl.BlockSpec((R, lf), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((nb, lf), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, lf), jnp.int32),
            interpret=interp,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )

    ex = jax.jit(lambda c, p: build(exact_kernel, p)(c, p))
    mx = jax.jit(lambda c, p: build(mxu_kernel, p)(c, p))

    ce, pe = jnp.asarray(cur), jnp.asarray(pal)
    cm, pm = jnp.asarray(cur), jnp.asarray(paug)
    oe = np.asarray(ex(ce, pe))
    om = np.asarray(mx(cm, pm))
    flips = float((oe != om).mean())

    def t(f, *a):
        f(*a).block_until_ready()
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            f(*a).block_until_ready()
        return (time.perf_counter() - t0) / n

    te = t(ex, ce, pe)
    tm = t(mx, cm, pm)
    per_e = te / (iters * nb) * 1e6
    per_m = tm / (iters * nb) * 1e6
    print(f"pp={pp} lf={lf} iters={iters}")
    print(f"exact: {per_e:8.2f} us/row-step   mxu: {per_m:8.2f} us/row-step "
          f"speedup {per_e / per_m:.2f}x")
    print(f"argmin flip fraction vs exact: {flips:.6f}")


if __name__ == "__main__":
    main()
