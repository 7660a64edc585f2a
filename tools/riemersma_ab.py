#!/usr/bin/env python
"""A/B: on-device Riemersma lax.scan vs the host C++ engine (VERDICT r03
item 5 — "host is faster" was an assumption; this measures it).

Run on the TPU host (single-tenant):  python tools/riemersma_ab.py [--quick]
Prints per-shape fps for both paths + identity of the device path vs the
C++ f32 twin.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dither_pie_tpu.api.cache import enable_compilation_cache
    from dither_pie_tpu.ops import ed_host
    from dither_pie_tpu.ops.riemersma_scan import riemersma_scan_batch

    enable_compilation_cache()
    quick = "--quick" in sys.argv
    shapes = [(240, 320, 8)] if quick else [
        (240, 320, 8), (480, 640, 8), (1080, 1920, 4)]
    rng = np.random.RandomState(0)
    pal = np.unique(rng.randint(0, 256, (40, 3)), axis=0)[:16].astype(
        np.float32)

    for h, w, b in shapes:
        imgs = rng.randint(0, 256, (b, h, w, 3)).astype(np.float32)

        t0 = time.time()
        out_dev = riemersma_scan_batch(imgs.copy(), pal)  # compile + run
        compile_s = time.time() - t0
        # Salt the timed dispatch (one pixel): the relay dedupes
        # byte-identical dispatches and would time its cache, not the
        # kernel. Identity below uses the warm-up output.
        salted = imgs.copy()
        salted[0, 0, 0, 0] = np.float32((salted[0, 0, 0, 0] + 1.0) % 256.0)
        t0 = time.time()
        _ = riemersma_scan_batch(salted, pal)
        dev_s = time.time() - t0

        t0 = time.time()
        refs = [ed_host.ed_riemersma_fast(imgs[i].copy(), pal)
                for i in range(b)]
        host_s = time.time() - t0

        ident = min(
            np.all(out_dev[i] == refs[i].astype(np.uint8), axis=-1).mean()
            for i in range(b))
        print(f"{h}x{w} batch {b}: device {b/dev_s:.2f} fps "
              f"(compile {compile_s:.0f}s), host C++ {b/host_s:.2f} fps "
              f"({os.cpu_count()} core(s)) -> device is "
              f"{host_s/dev_s:.2f}x; identity {ident}", flush=True)


if __name__ == "__main__":
    main()
