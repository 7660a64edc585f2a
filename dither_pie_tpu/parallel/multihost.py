"""Multi-host video scaling over DCN (SURVEY.md §2.8).

Frames are embarrassingly parallel, so multi-host scaling is pure
frame-range partitioning over the same segment grid the checkpoint/resume
machinery uses (pipeline/resume.py): host k owns segments
``{i : i % host_count == host_index}``; each host streams one full decode
of the source (decode is a small fraction of the dither+encode work;
frame-seeking per-range decode is a possible future refinement) but
dithers and ENCODES only its own segments, written atomically
(tmp+rename) and recorded in a PER-HOST manifest (no cross-host write
races; part-file existence is the source of truth). Once every segment
is covered by a manifest matching this job's settings fingerprint and
its part exists, exactly one host (an O_EXCL lock arbitrates)
concatenates them with the original audio and subtitles mapped in.

No cross-host collective is needed anywhere: the palette is derived
deterministically by every host from the same first frame, and the
dither step itself is data-parallel over local chips
(parallel/sharding.py). DCN carries nothing but the shared filesystem.

For TPU pod slices, :func:`initialize` wraps ``jax.distributed`` so each
process sees its local chips plus the global device set.
"""

from __future__ import annotations

import logging
from typing import Optional, Set, Tuple

logger = logging.getLogger("dither_pie_tpu")


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize ``jax.distributed`` for a multi-process job and return
    ``(process_index, process_count)``.

    A no-op returning (0, 1) when no coordinator is configured (neither an
    argument nor the standard JAX_COORDINATOR_ADDRESS / cloud-TPU
    environment) — single-host jobs never pay for this.
    """
    import os

    import jax

    if coordinator_address is None and not os.environ.get(
            "JAX_COORDINATOR_ADDRESS"):
        return 0, 1
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()


def host_segments(n_segments: int, host_index: int,
                  host_count: int) -> Set[int]:
    """Segments owned by this host: strided assignment (i % count == index)
    so early-finishing hosts do not all sit behind the video's tail."""
    if not 0 <= host_index < host_count:
        raise ValueError(f"host_index {host_index} not in [0, {host_count})")
    return set(range(host_index, n_segments, host_count))


def parse_shard(spec: str) -> Tuple[int, int]:
    """Parse a CLI ``INDEX:COUNT`` shard spec (e.g. ``"2:8"``)."""
    try:
        idx_s, cnt_s = spec.split(":")
        idx, cnt = int(idx_s), int(cnt_s)
    except ValueError:
        raise ValueError(
            f"shard spec must be INDEX:COUNT (e.g. '0:4'), got {spec!r}")
    if cnt < 1 or not 0 <= idx < cnt:
        raise ValueError(f"shard spec out of range: {spec!r}")
    return idx, cnt
