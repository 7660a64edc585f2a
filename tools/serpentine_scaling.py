#!/usr/bin/env python
"""Thread-scaling micro-benchmark for the serpentine/riemersma native path.

The serpentine scan has no wavefront (each reversed row depends on the last
pixel of the previous row), so video batches run on the SIMD C++ engine with
one thread per frame (api/ditherer._threaded_frames); the ctypes calls
release the GIL for the whole scan, so throughput should scale with cores.
This measures fps at 1..N threads and prints the per-thread slope — run on
a multi-core host; a single-core container shows a flat line by
construction (and says so).

Usage: python tools/serpentine_scaling.py [--height 1080] [--frames 16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()

    from dither_pie_tpu.ops import ed_host

    h = args.height
    w = h * 16 // 9
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 256, (h, w, 3)).astype(np.float32)
              for _ in range(args.frames)]
    pal = rng.randint(0, 256, (16, 3)).astype(np.float32)

    def run(n_threads: int) -> float:
        from concurrent.futures import ThreadPoolExecutor

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n_threads) as ex:
            list(ex.map(lambda f: ed_host.ed_fixed_fast(
                f.copy(), pal, "floyd_steinberg", True), frames))
        dt = time.perf_counter() - t0
        return args.frames / dt

    cores = os.cpu_count() or 1
    counts = sorted({1, 2, 4, cores} & set(range(1, cores + 1))) or [1]
    run(1)  # warm the native lib / caches
    results = {}
    for n in counts:
        fps = run(n)
        results[n] = fps
        print(f"{n} thread(s): {fps:.2f} fps ({h}p serpentine FS)",
              flush=True)
    if len(results) > 1:
        base = results[counts[0]]
        top = results[counts[-1]]
        eff = (top / base) / (counts[-1] / counts[0])
        print(f"scaling efficiency {counts[0]}->{counts[-1]} threads: "
              f"{eff:.0%}")
    else:
        print(f"single-core host ({cores} cpu): scaling not measurable "
              f"here; run on a multi-core machine")
    return 0


if __name__ == "__main__":
    sys.exit(main())
