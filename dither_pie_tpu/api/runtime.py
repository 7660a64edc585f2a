"""Backend selection policy.

Ordered/halftone/wavelet/none modes always run through JAX (they are fast on
any XLA backend, including CPU). The error-diffusion family dispatches:

* accelerator (TPU/GPU) + non-serpentine scan  -> Pallas wavefront kernel
* serpentine, Riemersma, or CPU-only           -> native C++ engine
* no compiler available                        -> NumPy fallback scan

Override with env var ``DITHER_PIE_TPU_ED_BACKEND`` in {auto, wavefront,
native} (mainly for tests and benchmarking).
"""

from __future__ import annotations

import functools
import os


@functools.lru_cache(maxsize=1)
def jax_platform() -> str:
    """Resolved JAX backend, with CPU fallback when the accelerator plugin
    failed to register (e.g. the chip is held by another process)."""
    import jax

    # Every entry point benefits from the persistent executable cache
    # (remote compiles cost minutes per shape) — not just the CLI.
    from dither_pie_tpu.api.cache import enable_compilation_cache

    enable_compilation_cache()
    try:
        jax.devices()
        return jax.default_backend()
    except Exception:
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.devices()
            return "cpu"
        except Exception:
            return "cpu"


def on_accelerator() -> bool:
    return jax_platform() not in ("cpu",)


def ed_backend() -> str:
    """'wavefront' or 'native' for the error-diffusion family."""
    forced = os.environ.get("DITHER_PIE_TPU_ED_BACKEND", "auto")
    if forced in ("wavefront", "native"):
        return forced
    return "wavefront" if on_accelerator() else "native"
