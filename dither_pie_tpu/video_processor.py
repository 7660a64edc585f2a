"""Compatibility alias for the reference's ``video_processor`` module."""

from dither_pie_tpu.pipeline.video import (  # noqa: F401
    NeuralPixelizer, VideoProcessor, pixelize_regular)
