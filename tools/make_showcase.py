#!/usr/bin/env python
"""Generate the README showcase grid: every dither mode on one synthetic
test image (gradients, disks, and fine texture — content that exercises
smooth ramps, hard edges, and detail at once).

Usage: python tools/make_showcase.py [--out docs/showcase.png] [--size 200]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_image(s: int) -> "np.ndarray":
    y, x = np.mgrid[0:s, 0:s].astype(np.float32) / s
    r = 140 + 100 * np.sin(2 * np.pi * (x * 1.3 + 0.1))
    g = 128 + 120 * (y - 0.5) * 2
    b = 120 + 110 * np.cos(2 * np.pi * (x * 0.7 + y * 0.9))
    img = np.stack([r, g, b], -1)
    # disks with hard edges
    for (cx, cy, rad, col) in [(0.3, 0.32, 0.16, (235, 80, 60)),
                               (0.72, 0.62, 0.2, (60, 120, 230)),
                               (0.55, 0.25, 0.1, (250, 220, 90))]:
        m = (x - cx) ** 2 + (y - cy) ** 2 < rad ** 2
        for c in range(3):
            img[..., c][m] = col[c]
    # fine texture band
    band = (y > 0.78)
    tex = 127 + 90 * np.sin(2 * np.pi * x * 24) * np.sin(2 * np.pi * y * 24)
    for c in range(3):
        img[..., c][band] = tex[band]
    return np.clip(img, 0, 255).astype(np.uint8)


MODES = [
    ("none", {}),
    ("bayer", {"size": "4x4"}),
    ("blue_noise", {}),
    ("IGN", {}),
    ("polka_dot", {}),
    ("halftone", {"cell_size": 5}),
    ("error_diffusion", {"variant": "floyd_steinberg"}),
    ("error_diffusion", {"variant": "atkinson"}),
    ("ostromoukhov", {}),
    ("hybrid", {}),
    ("perceptual", {}),
    ("adaptive_variance", {}),
    ("wavelet", {}),
    ("riemersma", {}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/showcase.png")
    ap.add_argument("--size", type=int, default=200)
    ap.add_argument("--colors", type=int, default=8)
    args = ap.parse_args()

    from PIL import Image, ImageDraw

    import dither_pie_tpu as dpt

    src = Image.fromarray(test_image(args.size))
    tiles = [("original", src)]
    for mode, params in MODES:
        label = params.get("variant", mode)
        if mode == "error_diffusion":
            label = f"ED {params['variant']}"
        d = dpt.ImageDitherer(num_colors=args.colors,
                              dither_mode=dpt.DitherMode(mode),
                              dither_params=dict(params))
        tiles.append((label, d.apply_dithering(src)))
        print(f"  {label} done", flush=True)

    cols = 5
    rows = -(-len(tiles) // cols)
    s = args.size
    pad, cap = 6, 16
    grid = Image.new("RGB", (cols * (s + pad) + pad,
                             rows * (s + cap + pad) + pad), (24, 24, 28))
    draw = ImageDraw.Draw(grid)
    for i, (label, img) in enumerate(tiles):
        cx = pad + (i % cols) * (s + pad)
        cy = pad + (i // cols) * (s + cap + pad)
        grid.paste(img, (cx, cy))
        draw.text((cx + 2, cy + s + 2), label, fill=(220, 220, 220))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    grid.save(args.out)
    print(f"wrote {args.out} ({grid.size[0]}x{grid.size[1]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
