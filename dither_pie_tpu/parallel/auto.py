"""Opt-in automatic multi-chip data parallelism for batch dithering.

``DITHER_PIE_TPU_AUTO_MESH=1`` routes the video pipeline's batched
error-diffusion step through a data-parallel mesh over every local device
(parallel/sharding.py): frames shard over the 'data' axis, each chip runs
the packed wavefront kernel on its own shard, zero steady-state
collectives. Off by default — single-chip semantics (and tests) are
unchanged unless explicitly requested.

Scope: the fixed-weight ED family with <= 64-color palettes (the video
hot path). Other modes fall through to the single-device path.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np


def auto_mesh_enabled() -> bool:
    return os.environ.get("DITHER_PIE_TPU_AUTO_MESH") == "1"


@functools.lru_cache(maxsize=32)
def _cached_ed_step(n_dev: int, h: int, w: int, p: int, batch_per_chip: int,
                    variant: str):
    import jax

    from dither_pie_tpu.parallel.mesh import make_mesh
    from dither_pie_tpu.parallel.sharding import make_sharded_ed_step

    mesh = make_mesh(shape=(n_dev,), axis_names=("data",),
                     devices=jax.devices()[:n_dev])
    return make_sharded_ed_step(mesh, h, w, p, batch_per_chip,
                                variant=variant)


@functools.lru_cache(maxsize=8)
def _cached_ordered_step(n_dev: int):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dither_pie_tpu.parallel.mesh import make_mesh
    from dither_pie_tpu.parallel.sharding import _SM_CHECK_KW, shard_map

    mesh = make_mesh(shape=(n_dev,), axis_names=("data",),
                     devices=jax.devices()[:n_dev])

    def local(frames, palette, screen):
        from dither_pie_tpu.ops.ordered import dispatch_ordered_batch

        return dispatch_ordered_batch(frames, palette, screen)

    step = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None, None, None), P(), P()),
        out_specs=P("data", None, None, None),
        # pallas_call out_shapes carry no varying-mesh-axis metadata.
        **{_SM_CHECK_KW: False}))

    def run(frames, palette, screen):
        import jax
        import jax.numpy as jnp

        fr = jax.device_put(jnp.asarray(frames),
                            NamedSharding(mesh, P("data", None, None, None)))
        return step(fr, palette, screen)

    return run


def maybe_sharded_ordered(images, palette, screen) -> Optional["object"]:
    """Shard an ordered-dither batch over the local mesh, or None when
    auto-mesh is off / inapplicable."""
    if not auto_mesh_enabled():
        return None
    import jax

    try:
        n_dev = len(jax.devices())
    except Exception:
        return None
    b = images.shape[0]
    if n_dev < 2 or b % n_dev != 0:
        # Ordered batches keep exact shapes (one frame in = one frame
        # out); only shard when the batch divides evenly.
        return None
    return _cached_ordered_step(n_dev)(images, palette, screen)


def maybe_sharded_ed(images: np.ndarray, palette: np.ndarray,
                     variant: str) -> Optional[np.ndarray]:
    """Run a (B, H, W, 3) batch through the data-parallel mesh, or return
    None when auto-mesh is off / inapplicable (caller falls through to the
    single-device path)."""
    if not auto_mesh_enabled():
        return None
    import jax

    try:
        n_dev = len(jax.devices())
    except Exception:
        return None
    if n_dev < 2 or palette.shape[0] > 64:
        return None
    b, h, w, _ = images.shape
    bp = -(-b // n_dev) * n_dev  # pad to a multiple of the mesh size
    if bp != b:
        images = np.concatenate(
            [images, np.repeat(images[-1:], bp - b, axis=0)], axis=0)
    run = _cached_ed_step(n_dev, h, w, int(palette.shape[0]), bp // n_dev,
                          variant)
    out, _err = run(images, np.asarray(palette, np.float32))
    return np.asarray(out)[:b]
