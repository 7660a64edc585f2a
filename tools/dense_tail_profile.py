#!/usr/bin/env python
"""Localize the dense-palette superlinear tail (ROADMAP round-5 item).

Times the packed wavefront kernel CALL alone (skew/unskew/transfers
excluded, inputs pre-staged on device) for P in {64,128,256,512,1024} at
FS-1080p batch-16, plus the full _run_packed wall for the same cells.
If the kernel-only column scales superlinearly, the tail is Mosaic
scheduling of the (pp, lf) search tiles; if only the wall column does,
the tail is in the epilogue/splits.

Repeat dispatches are salted (one palette byte per round) because the
axon relay DEDUPES byte-identical dispatches — an unsalted loop times the
dedup cache, not the kernel (observed: 0.1 ms for a 1080p batch-16 scan).
The wall column is tunnel-bound on relayed hosts (it ships ~100 MB of
frames per call); --skip-wall omits it.

Usage: python tools/dense_tail_profile.py [--rounds 5] [--batch 16]
                                          [--skip-wall]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

from dither_pie_tpu.ops import wavefront as wf  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=str, default="1080x1920")
    ap.add_argument("--skip-wall", action="store_true")
    args = ap.parse_args()
    h, w = map(int, args.hw.split("x"))
    b = args.batch
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)

    mode, variant = "fixed", "floyd_steinberg"
    s, n_slots = wf._scan_params(mode, variant)
    chunk = wf._chunk_for(n_slots)
    interp = jax.default_backend() == "cpu"

    print(f"backend={jax.default_backend()} shape={h}x{w} batch={b} "
          f"rounds={args.rounds}")
    print(f"{'P':>5} {'pp':>5} {'kernel_ms':>10} {'wall_ms':>9} "
          f"{'k_ratio':>8} {'fps_wall':>9}")
    prev_k = None
    for p in (64, 128, 256, 512, 1024):
        palette = rng.integers(0, 256, (p, 3)).astype(np.float32)
        lf, _, pp, d_pad = wf._plan(h, w, p, 1, s, chunk)
        call = wf._compiled_packed(mode, variant, d_pad, b, lf, pp,
                                   1.0, 0.2, interp, False, False)
        img_skew = wf._skew_packed(
            jax.numpy.asarray(images), s, lf, d_pad, interpret=interp,
            out_dtype=wf._stream_dtype(images, interp))
        img_skew.block_until_ready()
        if pp > 64:
            padded = wf._pad_palette(palette, pp)
            if wf._tourney_layout(pp, False):
                padded = padded[wf._bitrev_perm(pp)]
            pal_dev = jax.numpy.asarray(padded)
        else:
            pal_dev = jax.numpy.asarray(
                wf._pad_palette_packed(palette, pp, b))
        aux = jax.numpy.zeros((1, 8), jax.numpy.float32)
        dims = jax.numpy.asarray(np.array([w, h], dtype=np.int32))
        # One distinct palette buffer per round: byte-identical repeat
        # dispatches are DEDUPED by the relay and time ~0 ms.
        pal_host = np.asarray(pal_dev)
        pal_rounds = []
        for i in range(args.rounds):
            ph = pal_host.copy()
            ph.reshape(-1)[0] = np.float32(i)
            pal_rounds.append(jax.numpy.asarray(ph))
        for pr in pal_rounds:
            pr.block_until_ready()
        # warm-up compile + one run
        call(dims, img_skew, pal_dev, aux).block_until_ready()
        ks = []
        for pr in pal_rounds:
            t0 = time.perf_counter()
            call(dims, img_skew, pr, aux).block_until_ready()
            ks.append(time.perf_counter() - t0)
        k_ms = float(np.median(ks)) * 1000

        if args.skip_wall:
            w_ms = float("nan")
        else:
            # full wall (includes skew+epilogue+host splits+transfers;
            # tunnel-bound on relayed hosts), same cell
            wf._run_packed(mode, images, palette, variant=variant)  # warm
            ws = []
            for _ in range(args.rounds):
                t0 = time.perf_counter()
                wf._run_packed(mode, images, palette, variant=variant)
                ws.append(time.perf_counter() - t0)
            w_ms = float(np.median(ws)) * 1000
        ratio = (k_ms / prev_k) if prev_k else float("nan")
        prev_k = k_ms
        print(f"{p:>5} {pp:>5} {k_ms:>10.1f} {w_ms:>9.1f} "
              f"{ratio:>8.2f} {b / (w_ms / 1000):>9.1f}")


if __name__ == "__main__":
    main()
