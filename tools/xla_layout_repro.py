#!/usr/bin/env python
"""Minimal repro: XLA assigns a channel-minor layout to (3, N, W) u8 copies
in programs holding several large u8 NHWC parameters, tile-padding them 42x.

Context (ROADMAP.md "XLA layout pathology"): benchmark chain harnesses that
pass SEVERAL ~600 MB (B, H, W, 3) uint8 parameters into one jitted program
see the internal NHWC->planar transpose copy get layout {0,2,1} (channel
minor). A u8 array whose minor dimension is 3 pads 3 lanes -> 128, i.e.
42.7x memory, and the copy OOMs HBM at batch 100. Single-parameter programs
(the real pipeline) get the sane {2,1,0} layout and are unaffected.

Run on a TPU host:       python tools/xla_layout_repro.py [n_params] [batch]
Flags: --pallas  planarized tensors feed pallas_call identity operands
       --chain   the ORIGINAL failing harness (n_params distinct batch-100
                 u8 buffers chained through ordered_dither_fused in one
                 jitted program)

Status (v5e hardware, 2026-08-18): the pathology NO LONGER REPRODUCES in
any form on the current stack —
  * plain reduced form (3 params, batch 100): temp 0.0x of args, runs;
  * --pallas (3 and 5 params, batch 100): temp 0.2-0.3x, runs;
  * --chain, the original failing harness itself: temp 1.1x (the sane
    planar-copy allotment), compiles and executes.
Earlier in round 2 the --chain form OOMed HBM via a {0,2,1} channel-minor
layout on the NHWC->planar copies (42.7x tile padding). Resolved upstream
by the jax/libtpu in this image; this tool stays as the regression probe —
rerun all three forms after any jax upgrade. bench.py config 3 keeps the
batch-size-differential methodology regardless (it cancels relay
per-dispatch overhead, which the chain form does not).

This script is self-contained diagnostics — not part of the library.
"""

import sys

import numpy as np


def _pallas_identity(plane):
    """pallas_call identity over a (3, N, W) u8 plane: the operand whose
    layout assignment goes channel-minor in the original failure."""
    import jax
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    n = plane.shape[1]
    rows = 512
    grid = (n + rows - 1) // rows
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((3, rows, plane.shape[2]),
                               lambda g: (0, g, 0))],
        out_specs=pl.BlockSpec((3, rows, plane.shape[2]),
                               lambda g: (0, g, 0)),
        out_shape=jax.ShapeDtypeStruct(plane.shape, plane.dtype),
        interpret=jax.default_backend() == "cpu",
    )(plane)


def _chain_main(n_params: int, batch: int):
    """The ORIGINAL failing harness: n_params distinct (batch, 1080, 1920, 3)
    u8 buffers chained through ordered_dither_fused inside one jitted
    program (full-sum consumption so the epilogue can't be sliced away)."""
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dither_pie_tpu.core.thresholds import bayer_matrix
    from dither_pie_tpu.ops.ordered import tile_screen_device
    from dither_pie_tpu.ops.ordered_pallas import ordered_dither_fused

    h, w = 1080, 1920
    cpu = jax.default_backend() == "cpu"
    pal = jnp.asarray(np.random.RandomState(0)
                      .randint(0, 256, (16, 3)).astype(np.float32))
    screen = tile_screen_device(jnp.asarray(bayer_matrix("8x8")), h, w)

    @jax.jit
    def f(pal, *frames):
        acc = jnp.float32(0)
        for fr in frames:
            out = ordered_dither_fused(fr, pal.at[0, 0].set(acc), screen,
                                       interpret=cpu, bucket=False)
            acc = (jnp.sum(out.astype(jnp.int32)).astype(jnp.float32)
                   * jnp.float32(1e-12))
        return acc

    fill = jax.jit(lambda i: jnp.full((batch, h, w, 3), i, jnp.uint8))
    frames = [jax.block_until_ready(fill(i)) for i in range(n_params)]
    arg_bytes = n_params * batch * h * w * 3
    print(f"chain: params={n_params} batch={batch} "
          f"args={arg_bytes/1e9:.2f} GB", flush=True)
    try:
        compiled = f.lower(pal, *frames).compile()
        mem = compiled.memory_analysis()
        if mem is not None:
            print(f"temp allocation: {mem.temp_size_in_bytes/1e9:.2f} GB "
                  f"({mem.temp_size_in_bytes/max(arg_bytes,1):.1f}x of args)")
        out = jax.block_until_ready(f(pal, *frames))
        print("executed ok:", float(out))
    except Exception as e:
        print(f"FAILED ({type(e).__name__}): {str(e)[:300]}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    use_pallas = "--pallas" in sys.argv
    n_params = int(args[0]) if args else 3
    batch = int(args[1]) if len(args) > 1 else 100
    if "--chain" in sys.argv:
        _chain_main(n_params, batch)
        return

    import jax
    import jax.numpy as jnp

    h, w = 1080, 1920

    def planarize(x):
        # NHWC u8 -> (3, B*H, W) planar; the transpose copy is where the
        # bad layout materializes.
        b = x.shape[0]
        return x.transpose(3, 0, 1, 2).reshape(3, b * h, w)

    @jax.jit
    def f(*frames):
        # Returning the planarized tensors forces the transpose copies to
        # materialize (slice/sum consumption lets XLA elide them entirely).
        # With --pallas each plane feeds a pallas_call identity first — the
        # operand-layout interaction that triggered the original failure.
        if use_pallas:
            return [_pallas_identity(planarize(fr)) for fr in frames]
        return [planarize(fr) for fr in frames]

    arg_bytes = n_params * batch * h * w * 3
    print(f"params={n_params} batch={batch} args={arg_bytes/1e9:.2f} GB"
          f"{' [pallas operands]' if use_pallas else ''}", flush=True)
    # Device-side fill: values are irrelevant for layout assignment, and
    # ~2 GB of host->device transfers through a dev tunnel take longer
    # than the compile being diagnosed.
    fill = jax.jit(lambda i: jnp.full((batch, h, w, 3), i, jnp.uint8))
    frames = [jax.block_until_ready(fill(i)) for i in range(n_params)]
    print("  frames materialized on device", flush=True)
    try:
        compiled = f.lower(*frames).compile()
        mem = compiled.memory_analysis()
        if mem is not None:
            print(f"temp allocation: {mem.temp_size_in_bytes/1e9:.2f} GB "
                  f"({mem.temp_size_in_bytes/max(arg_bytes,1):.1f}x of args); "
                  f"output: {mem.output_size_in_bytes/1e9:.2f} GB "
                  f"({mem.output_size_in_bytes/max(arg_bytes,1):.1f}x)")
        outs = jax.block_until_ready(f(*frames))
        print("executed ok,", len(outs), "planes of", outs[0].shape)
    except Exception as e:
        print(f"FAILED ({type(e).__name__}): {str(e)[:300]}")


if __name__ == "__main__":
    main()
