"""Multi-chip sharded dithering steps (shard_map over a device mesh).

Parallelism map for this workload (SURVEY.md §2.8):

* **data** axis — frame batch. Frames are independent; zero steady-state
  collectives. This replaces the reference's multiprocessing.Pool.
* **space** axis — image rows, for ordered/screen modes only (every output
  pixel is a local decision, so row sharding needs no halo). Error-diffusion
  cannot shard rows without changing semantics; across chips it stays
  data-parallel (each chip scans whole frames with the wavefront kernel).
* The only collective in the pipeline is an optional ``psum`` of per-palette
  usage histograms (observability), which doubles as the ICI sanity check in
  the multichip dry run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8 top-level API; the experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

import inspect

# jax 0.9 renamed check_rep -> check_vma; pick whichever this version has
# so the older-jax fallback import above actually works.
_SM_CHECK_KW = ("check_vma"
                if "check_vma" in inspect.signature(shard_map).parameters
                else "check_rep")

from dither_pie_tpu.core.colors import srgb_to_linear, linear_to_srgb
from dither_pie_tpu.core.distance import distance_ratio_factor, top2_palette


def _ordered_dither_local(frames_u8, palette, screen, use_gamma: bool):
    """Dither a local shard of frames: (b, h, w, 3) u8 -> u8, plus a
    per-palette usage count (for the psum'd histogram)."""
    x = frames_u8.astype(jnp.float32)
    if use_gamma:
        lin = srgb_to_linear(x / 255.0)
        x = jnp.round(jnp.clip(lin * 255.0, 0, 255))  # 8-bit linear quirk
    b, h, w, _ = x.shape
    px = x.reshape(-1, 3)
    d1, d2, i1, i2 = top2_palette(px, palette)
    factor = distance_ratio_factor(d1, d2)
    thr = jnp.broadcast_to(screen[None], (b, h, w)).reshape(-1)
    idx = jnp.where(factor <= thr, i1, i2)
    out = jnp.take(palette, idx, axis=0)
    if use_gamma:
        srgb = linear_to_srgb(jnp.clip(out / 255.0, 0, 1))
        out = jnp.clip(srgb * 255.0, 0, 255)
    hist = jnp.zeros((palette.shape[0],), jnp.int32).at[idx].add(1)
    return out.reshape(b, h, w, 3).astype(jnp.uint8), hist


def make_sharded_ordered_step(mesh: Mesh, use_gamma: bool = False):
    """A jitted multi-chip ordered-dither step.

    frames (B, H, W, 3) u8: B over 'data', H over 'space'.
    screen (H, W) f32: H over 'space'.
    palette (P, 3) f32: replicated.
    Returns (frames u8 with the same sharding, global palette histogram).
    """

    def local_step(frames, palette, screen):
        out, hist = _ordered_dither_local(frames, palette, screen, use_gamma)
        # ICI collective: global palette-usage histogram.
        hist = jax.lax.psum(hist, axis_name="data")
        hist = jax.lax.psum(hist, axis_name="space")
        return out, hist

    step = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("data", "space", None, None), P(), P("space", None)),
        out_specs=(P("data", "space", None, None), P()),
    )
    return jax.jit(step)


def shard_frames(mesh: Mesh, frames_u8: np.ndarray) -> jax.Array:
    """Place a host frame batch onto the mesh with (data, space) sharding."""
    return jax.device_put(
        frames_u8, NamedSharding(mesh, P("data", "space", None, None)))


def make_sharded_ed_step(mesh: Mesh, h: int, w: int, p: int,
                         batch_per_chip: int, variant: str = "floyd_steinberg",
                         mode: str = "fixed", lum_factor: float = 1.0,
                         col_factor: float = 0.2):
    """Data-parallel error diffusion over the 'data' mesh axis.

    Each chip runs the Pallas wavefront scan over its own shard of frames —
    embarrassingly parallel, no steady-state collectives (a psum'd
    mean-absolute-quantization-error scalar rides along as the ICI check).
    Frames: (n_data * batch_per_chip, H, W, 3) f32, sharded on 'data'.

    Covers the whole ED surface: ``mode`` in fixed / ostromoukhov / hybrid /
    perceptual / adaptive. The aux-stream modes (perceptual sensitivity,
    adaptive variance gate) take a (B, H, W) f32 stream that shards on
    'data' WITH its frames and is skewed on-device alongside them.
    """
    from dither_pie_tpu.ops.wavefront import wavefront_device_fn

    # Packed v2 kernel (hardware-bit-verified path); palette padding/packing
    # happens inside the trace, so the raw (P, 3) palette is the argument.
    fn = wavefront_device_fn(mode, variant, h, w, p, batch_per_chip,
                             lum_factor=lum_factor, col_factor=col_factor)
    has_aux = mode in ("perceptual", "adaptive")

    def local_step(frames, palette, aux=None):
        out = fn(frames, palette, aux=aux) if has_aux else fn(frames, palette)
        err = jnp.mean(jnp.abs(out.astype(jnp.float32)
                               - frames.astype(jnp.float32)))
        err = jax.lax.pmean(err, axis_name="data")
        return out, err

    data_spec = P("data", None, None, None)
    in_specs = ((data_spec, P(), P("data", None, None)) if has_aux
                else (data_spec, P()))
    step = jax.jit(shard_map(
        local_step,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(data_spec, P()),
        # pallas_call out_shapes carry no varying-mesh-axis metadata.
        **{_SM_CHECK_KW: False},
    ))

    def run(frames_u8: np.ndarray, palette: np.ndarray,
            aux: np.ndarray = None):
        pal = jnp.asarray(palette, jnp.float32)
        # Ship u8: the skew transposes in the input dtype (4x less traffic).
        frames = jax.device_put(
            jnp.asarray(frames_u8),
            NamedSharding(mesh, data_spec))
        if has_aux:
            aux_d = jax.device_put(
                jnp.asarray(aux, jnp.float32),
                NamedSharding(mesh, P("data", None, None)))
            return step(frames, pal, aux_d)
        return step(frames, pal)

    return run
