"""dither_pie_tpu — a TPU-native (JAX/XLA/Pallas) dithering & pixelization framework.

A ground-up rebuild of the capabilities of ``dobrosketchkun/dither_pie``
(reference: /root/reference) designed TPU-first:

* all 13 dither modes run as fused XLA ops or Pallas kernels on device
  (ordered modes as one fused threshold kernel; the error-diffusion family as
  an anti-diagonal wavefront scan in Pallas),
* palette extraction (median-cut / k-means / uniform) with a jitted Lloyd's
  k-means,
* a native C++ sequential error-diffusion engine for the inherently
  host-sequential paths (serpentine scans, Riemersma/Hilbert) and as the
  bit-faithful golden reference,
* an ffmpeg-piped, device-batched video pipeline sharded over a
  ``jax.sharding.Mesh``,
* a Flax port of the c2pGen neural pixelizer.

Public API mirrors the reference library surface
(``/root/reference/dithering_lib.py:27-57``) so existing configs and callers
translate directly.
"""

from dither_pie_tpu.api.ditherer import (
    DitherMode,
    PixelizeMethod,
    PaletteSource,
    ImageDitherer,
    ColorReducer,
    DitherUtils,
    BaseDitherStrategy,
    ErrorDiffusionKernel,
    NoDitherStrategy,
    MatrixDitherStrategy,
    BayerDitherStrategy,
    BlueNoiseDitherStrategy,
    InterleavedGradientNoiseDitherStrategy,
    ErrorDiffusionDitherStrategy,
    OstromoukhovDitherStrategy,
    RiemersmaDitherStrategy,
    PolkaDotDitherStrategy,
    WaveletDitherStrategy,
    AdaptiveVarianceDitherStrategy,
    PerceptualDitherStrategy,
    HybridDitherStrategy,
    HalftoneDitherStrategy,
)
from dither_pie_tpu.core.thresholds import generate_blue_noise

__all__ = [
    # Enums
    "DitherMode",
    "PixelizeMethod",
    "PaletteSource",
    # Main classes
    "ImageDitherer",
    "ColorReducer",
    "DitherUtils",
    # Strategy base class
    "BaseDitherStrategy",
    # Error diffusion kernel definitions
    "ErrorDiffusionKernel",
    # Individual strategies
    "NoDitherStrategy",
    "MatrixDitherStrategy",
    "BayerDitherStrategy",
    "BlueNoiseDitherStrategy",
    "InterleavedGradientNoiseDitherStrategy",
    "ErrorDiffusionDitherStrategy",
    "OstromoukhovDitherStrategy",
    "RiemersmaDitherStrategy",
    "PolkaDotDitherStrategy",
    "WaveletDitherStrategy",
    "AdaptiveVarianceDitherStrategy",
    "PerceptualDitherStrategy",
    "HybridDitherStrategy",
    "HalftoneDitherStrategy",
    # Utility functions
    "generate_blue_noise",
]

__version__ = "0.4.0"
