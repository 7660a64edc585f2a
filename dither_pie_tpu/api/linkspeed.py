"""Host<->device link probe: pick the cheaper output transfer shape.

The batched dither path can leave the device as RGB (3 bytes/pixel) or as
palette indices (1 byte/pixel + one exact host-side palette gather, for
palettes <= 256 colors). Which is faster depends on the device->host
link: the gather costs ~4 bytes/pixel of host memory traffic (several
GB/s), while the index stream saves 2 bytes/pixel of link time. Below
roughly 1 GB/s of D2H bandwidth the index stream wins; above it the
gather overhead dominates.

This module measures D2H bandwidth ONCE per process (a ~16 MB transfer)
and caches the verdict. `DITHER_PIE_TPU_INDEX_TRANSFER=1/0` forces the
choice without probing (and is the right knob for tests/benches).
"""

from __future__ import annotations

import os
import time
from typing import Optional

_PROBE_BYTES = 16 * 1024 * 1024
_THRESHOLD_MB_S = 1000.0
_cache: dict = {}


def d2h_bandwidth_mb_s() -> Optional[float]:
    """Measured device->host bandwidth in MB/s (best of 2 reps of a 16 MB
    uint8 transfer), or None when no accelerator backend is available.
    Cached for the life of the process."""
    if "d2h" in _cache:
        return _cache["d2h"]
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np

        if jax.default_backend() == "cpu":
            _cache["d2h"] = None
            return None
        # A DISTINCT device array per rep: jax caches an array's host value
        # after the first np.asarray, so re-reading the same array measures
        # the cache (observed: a 42 MB/s link probing as 293 GB/s), and a
        # constant fill (zeros) risks relay-side dedup on dev tunnels.
        make = jax.jit(lambda i: (jnp.arange(_PROBE_BYTES, dtype=jnp.uint32)
                                  * (i + jnp.uint32(2654435761))
                                  ).astype(jnp.uint8))
        best = float("inf")
        for i in range(2):
            x = make(jnp.uint32(i))
            x.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(x)
            best = min(best, time.perf_counter() - t0)
        _cache["d2h"] = _PROBE_BYTES / best / 1e6
    except Exception:
        _cache["d2h"] = None
    return _cache["d2h"]


def index_transfer_wins() -> bool:
    """True when the 1-byte/pixel index stream beats RGB output on the
    measured link. Forced by DITHER_PIE_TPU_INDEX_TRANSFER=1/0."""
    env = os.environ.get("DITHER_PIE_TPU_INDEX_TRANSFER")
    if env in ("0", "1"):
        return env == "1"
    bw = d2h_bandwidth_mb_s()
    return bw is not None and bw < _THRESHOLD_MB_S
