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

Status: this REDUCED form does NOT reproduce the pathology — with plain
returned outputs both 1- and 3-param programs get healthy 1.0x layouts
(measured on v5e, jax 0.9). The original failure had the planarized
tensors consumed by pallas_call operands inside a multi-call chain, so
the trigger involves the Pallas operand layout pass; bisect from the
bench harness (bench.py config-3 chain variant) when reporting upstream.

This script is self-contained diagnostics — not part of the library.
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n_params = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 100
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
        return [planarize(fr) for fr in frames]

    frames = [jnp.asarray(np.full((batch, h, w, 3), i, np.uint8))
              for i in range(n_params)]
    arg_bytes = n_params * batch * h * w * 3
    print(f"params={n_params} batch={batch} args={arg_bytes/1e9:.2f} GB")
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
