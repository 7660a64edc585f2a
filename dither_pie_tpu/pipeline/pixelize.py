"""Pixelization: regular (nearest-neighbor, even dims) and the neural
pixelizer facade (Flax c2pGen port — see dither_pie_tpu/models/).
"""

from __future__ import annotations

from typing import Optional

from PIL import Image

from dither_pie_tpu.utils import compute_even_dimensions

_neural_singleton = None


def pixelize_regular(image: Image.Image, max_size: int) -> Image.Image:
    """Nearest-neighbor downscale so the smaller side ~= max_size, even dims
    (reference: /root/reference/video_processor.py:563-577)."""
    orig_w, orig_h = image.size
    target_w, target_h = compute_even_dimensions(orig_w, orig_h, max_size)
    return image.resize((target_w, target_h), Image.Resampling.NEAREST).convert("RGB")


def get_neural_pixelizer(checkpoint_dir: Optional[str] = None):
    """Process-wide neural pixelizer (loads Flax weights once)."""
    global _neural_singleton
    if _neural_singleton is None:
        from dither_pie_tpu.models.pixelizer import NeuralPixelizer

        _neural_singleton = NeuralPixelizer(checkpoint_dir=checkpoint_dir)
    return _neural_singleton
