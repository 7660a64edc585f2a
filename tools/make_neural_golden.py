#!/usr/bin/env python
"""Generate the neural-e2e golden image for tests/test_env_gated.py.

Run ONCE on a host that has the released checkpoints (see README "Neural
pixelization checkpoints"); commits tests/golden/neural_e2e_32.npy, after
which the gated e2e test pins the exact output on every checkpoint-equipped
run.
"""

import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dither_pie_tpu.models.inference import PixelizationModel

    m = PixelizationModel()
    m.load()
    y, x = np.mgrid[0:96, 0:128].astype(np.float32)
    img = Image.fromarray(np.stack(
        [x / 128 * 255, y / 96 * 255,
         128 + 60 * np.sin(x / 9) * np.cos(y / 7)],
        axis=-1).astype(np.uint8))
    arr = np.asarray(m.pixelize_image(img, 32))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden", "neural_e2e_32.npy")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.save(out, arr)
    print(f"wrote {out} shape={arr.shape}")


if __name__ == "__main__":
    main()
