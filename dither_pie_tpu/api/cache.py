"""Persistent XLA compilation cache setup.

Compiled programs are cached on disk keyed by HLO, so CLI invocations and
restarts reuse executables instead of recompiling (remote compiles through
the dev tunnel cost minutes per shape). Safe no-op if the backend doesn't
support executable serialization.
"""

from __future__ import annotations

import os


def enable_compilation_cache():
    try:
        import jax

        cache_dir = os.environ.get(
            "DITHER_PIE_TPU_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "dither_pie_tpu_jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
