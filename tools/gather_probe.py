#!/usr/bin/env python
"""Probe: Mosaic per-lane sublane gather (tpu.dynamic_gather) inside Pallas.

jax 0.9.0 lowers jnp.take_along_axis(table, idx, axis=0) to
tpu.dynamic_gather ONLY when idx.shape == table.shape (out same shape):
out[r, l] = table[idx[r, l], l].

This probe (a) verifies correctness of that exact form on hardware, and
(b) times the op vs table height, vs the O(P) select-sweep the packed
wavefront kernel currently uses for dense palettes. If gather cost grows
slowly with table height, an exact two-stage palette search (RGB-grid cell
-> per-cell sound candidate superset -> exact refine) beats the O(P) sweep:
ONE table-shaped gather per wavefront step fetches all (batch x M)
candidates at once.

Run standalone on the TPU (single-tenant!): python tools/gather_probe.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lf = 128

    # -- correctness: idx.shape == table.shape -----------------------------
    for rows in (64, 512, 4096):
        tbl = np.arange(rows * lf, dtype=np.int32).reshape(rows, lf)
        idx = np.random.RandomState(0).randint(
            0, rows, (rows, lf)).astype(np.int32)

        def kernel(t, i, o):
            o[...] = jnp.take_along_axis(t[...], i[...], axis=0)

        try:
            f = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((rows, lf), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
            out = np.asarray(jax.jit(f)(jnp.asarray(tbl), jnp.asarray(idx)))
            ok = np.array_equal(out, np.take_along_axis(tbl, idx, axis=0))
            print(f"gather rows={rows}: {'OK exact' if ok else 'WRONG'}")
        except Exception as e:
            print(f"gather rows={rows}: FAIL {type(e).__name__}: {e}"[:200])

    # -- timing: chained gathers at several table heights -------------------
    def gather_chain(rows, k):
        def kernel(t, i, o):
            acc = i[...]
            for step in range(k):
                g = jnp.take_along_axis(t[...], acc, axis=0)
                acc = jnp.abs(g + step) % rows
            o[...] = acc

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, lf), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        return jax.jit(lambda t, i: f(t, i))

    def med(f, a, b, n=7):
        ts = []
        for _ in range(n):
            t0 = time.time()
            _ = np.asarray(f(a, b))
            ts.append(time.time() - t0)
        return sorted(ts)[n // 2]

    for rows in (256, 1024, 4096, 16384):
        tbl = np.random.RandomState(1).randint(
            0, rows, (rows, lf)).astype(np.int32)
        idx = np.random.RandomState(2).randint(
            0, rows, (rows, lf)).astype(np.int32)
        a, b = jnp.asarray(tbl), jnp.asarray(idx)
        try:
            f1, fk = gather_chain(rows, 4), gather_chain(rows, 68)
            _ = np.asarray(f1(a, b)); _ = np.asarray(fk(a, b))
            per = max(med(fk, a, b) - med(f1, a, b), 1e-9) / 64
            print(f"gather rows={rows}: {per*1e6:.2f} us/op "
                  f"({per*1e9/rows:.2f} ns/row)")
        except Exception as e:
            print(f"gather timing rows={rows}: FAIL {e}"[:200])

    # -- baseline: the select-sweep cost shape (P rows swept per op) --------
    def sweep_chain(P, k):
        rows = 8

        def kernel(t, i, o):
            acc = i[...]  # (8, lf)
            for step in range(k):
                best = jnp.zeros((rows, lf), jnp.int32)
                for p in range(P):
                    best = jnp.where((acc & (P - 1)) == p,
                                     jnp.broadcast_to(t[p:p + 1],
                                                      (rows, lf)),
                                     best)
                acc = jnp.abs(best + acc + step) % 255
            o[...] = acc

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, lf), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        return jax.jit(lambda t, i: f(t, i))

    for P in (256,):
        tbl = np.random.RandomState(1).randint(0, 255, (P, lf)).astype(np.int32)
        idx = np.random.RandomState(2).randint(0, 255, (8, lf)).astype(np.int32)
        a, b = jnp.asarray(tbl), jnp.asarray(idx)
        try:
            f1, fk = sweep_chain(P, 2), sweep_chain(P, 18)
            _ = np.asarray(f1(a, b)); _ = np.asarray(fk(a, b))
            per = max(med(fk, a, b) - med(f1, a, b), 1e-9) / 16
            print(f"select-sweep P={P} (8-row tile): {per*1e6:.2f} us/op")
        except Exception as e:
            print(f"sweep timing P={P}: FAIL {e}"[:200])


if __name__ == "__main__":
    main()
