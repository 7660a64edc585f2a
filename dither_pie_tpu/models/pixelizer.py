"""Neural pixelizer facade (placeholder until the Flax port in this package
is wired; see models/c2pgen.py). Raises a clear error if weights are absent.
"""

from __future__ import annotations

from typing import Optional

from PIL import Image


class NeuralPixelizer:
    def __init__(self, checkpoint_dir: Optional[str] = None):
        from dither_pie_tpu.models.inference import PixelizationModel

        self._model = PixelizationModel(checkpoint_dir=checkpoint_dir)
        self._model.load()

    def pixelize(self, image: Image.Image, max_size: int) -> Image.Image:
        return self._model.pixelize_image(image, max_size)

    def pixelize_batch(self, images, max_size: int):
        """Batched neural pixelization for same-size frames (video path)."""
        return self._model.pixelize_images_batch(images, max_size)
