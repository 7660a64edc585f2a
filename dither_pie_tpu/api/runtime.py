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
import subprocess
import sys


def _accelerator_responsive(timeout: float) -> bool:
    """Probe backend init in a SUBPROCESS with a hard timeout.

    A wedged remote-accelerator transport can HANG ``jax.devices()``
    indefinitely rather than raising (observed on this harness's relay:
    multi-hour outages where every probe blocked), and backend config is
    immutable after the first in-process touch — so the liveness check must
    happen out-of-process, BEFORE we commit this process to the accelerator.

    The verdict is cached on disk (OK: 10 min, wedged: 60 s) so batch
    workflows spawning many CLI processes pay the probe once, and recovery
    from an outage is noticed within a minute.
    """
    import hashlib
    import tempfile
    import time

    pool = os.environ.get("PALLAS_AXON_POOL_IPS", "local")
    cache = os.path.join(
        tempfile.gettempdir(),
        "dither_pie_tpu_accel_probe_"
        + hashlib.sha1(pool.encode()).hexdigest()[:8])
    try:
        with open(cache) as f:
            ts, verdict = f.read().split()
        age = time.time() - float(ts)
        if verdict == "ok" and age < 600:
            return True
        if verdict == "wedged" and age < 60:
            return False
    except Exception:
        pass
    try:
        # Enumeration alone is not liveness: an outage observed 2026-08-21
        # had jax.devices() succeed instantly while every DISPATCH hung for
        # >14 min. The probe must round-trip one tiny jitted dispatch
        # (compile rides the persistent executable cache, so the happy
        # path stays seconds after the first probe ever). Cold-cache cost
        # measured on the live tunnel: 12.9 s end-to-end — 18x under the
        # 240 s default timeout, so a healthy backend cannot time out on
        # first contact ("minutes per shape" applies to the big Pallas
        # programs, not this x+1).
        r = subprocess.run(
            [sys.executable, "-c",
             "try:\n"
             "    from dither_pie_tpu.api.cache import "
             "enable_compilation_cache\n"
             "    enable_compilation_cache()\n"
             "except Exception:\n"
             "    pass\n"
             "import jax, jax.numpy as jnp, numpy\n"
             "numpy.asarray(jax.jit(lambda x: x + 1)(jnp.ones(8)))\n"
             "print('BACKEND_OK')"],
            timeout=timeout, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
        ok = "BACKEND_OK" in r.stdout
    except Exception:
        ok = False
    try:
        with open(cache, "w") as f:
            f.write(f"{time.time()} {'ok' if ok else 'wedged'}")
    except OSError:
        pass
    return ok


def _downgrade_allowed(pinned: str, accel_required: bool) -> bool:
    """May the wedge-probe downgrade this process to CPU?

    Only when nothing forced a platform besides the remote accelerator
    itself: the relay platform registers as ``axon``, an unset/empty pin
    means "auto", and a pin to any OTHER platform (``tpu`` with a local
    PJRT, ``cpu``, ...) is explicit user intent this policy must not
    override. ``DITHER_PIE_TPU_ACCEL_REQUIRED=1`` means accelerator-or-
    fail: never downgrade silently.
    """
    return not accel_required and (pinned or "") in ("", "axon")


def _jax_backend_started() -> bool:
    """True once any XLA backend has been initialized in this process
    (at that point the platform choice is already committed)."""
    xb = sys.modules.get("jax._src.xla_bridge")
    return bool(xb is not None and getattr(xb, "_backends", None))


@functools.lru_cache(maxsize=1)
def jax_platform() -> str:
    """Resolved JAX backend, with CPU fallback when the accelerator plugin
    failed to register (e.g. the chip is held by another process) or its
    transport is unresponsive (probed out-of-process — see
    ``_accelerator_responsive``; tune/disable with
    ``DITHER_PIE_TPU_ACCEL_PROBE_TIMEOUT``, 0 disables the probe)."""
    import jax

    # Every entry point benefits from the persistent executable cache
    # (remote compiles cost minutes per shape) — not just the CLI.
    from dither_pie_tpu.api.cache import enable_compilation_cache

    enable_compilation_cache()

    # Liveness-probe the accelerator before first in-process backend touch,
    # but only when (a) a remote-transport accelerator is configured (the
    # hang mode is a remote-transport failure; local PJRT plugins fail
    # fast), (b) the backend hasn't already been committed, and (c) the
    # downgrade policy allows it (see _downgrade_allowed: explicit platform
    # pins and DITHER_PIE_TPU_ACCEL_REQUIRED=1 both veto silent fallback).
    try:
        probe_timeout = float(
            os.environ.get("DITHER_PIE_TPU_ACCEL_PROBE_TIMEOUT", "240"))
    except ValueError:
        probe_timeout = 240.0
    remote_accel = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
    accel_required = os.environ.get(
        "DITHER_PIE_TPU_ACCEL_REQUIRED", "") == "1"
    if (probe_timeout > 0 and remote_accel and not _jax_backend_started()
            and _downgrade_allowed(jax.config.jax_platforms,
                                   accel_required)):
        if not _accelerator_responsive(probe_timeout):
            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass

    try:
        jax.devices()
        return jax.default_backend()
    except Exception:
        if accel_required:
            raise
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
