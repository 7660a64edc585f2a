"""Compatibility alias: the reference exposes everything via a module named
``dithering_lib``; this lets ``from dither_pie_tpu.dithering_lib import
ImageDitherer`` style imports work unchanged (modulo the package prefix)."""

from dither_pie_tpu.api.ditherer import *  # noqa: F401,F403
from dither_pie_tpu.api.ditherer import (  # noqa: F401
    BaseDitherStrategy, ColorReducer, DitherMode, DitherUtils,
    ErrorDiffusionKernel, ImageDitherer, PaletteSource, PixelizeMethod)
from dither_pie_tpu.core.thresholds import generate_blue_noise  # noqa: F401
