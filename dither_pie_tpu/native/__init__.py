"""Native (C++) host components: sequential error-diffusion engine."""

from dither_pie_tpu.native.build import get_lib, native_available

__all__ = ["get_lib", "native_available"]
