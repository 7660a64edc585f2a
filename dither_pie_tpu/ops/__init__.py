"""Device-side dither operators (XLA-fused ops and Pallas kernels).

Hot paths:
  * ordered.py / ordered_pallas.py — screen-threshold modes (bayer, blue
    noise, IGN, polka dot); the Pallas version is the GPix/s path.
  * wavefront.py — error-diffusion family as an anti-diagonal wavefront
    scan (packed v2 layout on accelerators).
  * halftone.py — rotated-screen halftone (host screen + device segment-sum).
  * wavelet.py — self-contained DWT/IDWT filter banks.
  * ed_host.py / ../native/ — sequential scans (serpentine, Riemersma,
    golden reference, CPU fallback).
"""

from dither_pie_tpu.ops.ordered import (dispatch_ordered_batch, ordered_dither,
                                        ordered_dither_batch)
from dither_pie_tpu.ops.ordered_pallas import ordered_dither_fused

__all__ = [
    "ordered_dither",
    "ordered_dither_batch",
    "dispatch_ordered_batch",
    "ordered_dither_fused",
]
