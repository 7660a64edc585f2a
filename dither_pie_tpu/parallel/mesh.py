"""Device-mesh helpers for multi-chip scaling.

Frames are embarrassingly parallel, so the primary axis is ``data`` (frame
batch); ordered modes additionally shard rows over ``space`` (no halo
needed — every pixel's decision is local). Error diffusion across chips is a
row-strip software pipeline (see sharding.py docstring).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data", "space"),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh over available devices.

    Default: all devices on the ``data`` axis, ``space`` = 1. Pass an
    explicit shape like (4, 2) to split between frame-parallel and
    row-parallel axes.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not match {n} devices")
    dev_array = np.array(devs).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def frames_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, 3) frames: B over 'data', H over 'space'."""
    return NamedSharding(mesh, P("data", "space", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
