"""Device-side bit-packing of palette-index streams (link compression).

The index transfer path (see ImageDitherer.apply_dithering_batch and
reference/video_processor.py:361-377 for the encoder contract it feeds)
already cuts device->host traffic 3x by shipping (B, H, W) uint8 palette
indices instead of RGB. But a P-color palette only needs ceil(log2(P))
bits per pixel: a 16-color palette (the reference's most common case —
its example configs and the bench's video config use 16) fits 2 pixels
per byte, a 4-color one (e.g. the builtin gameboy palette) 4 pixels, and
a 2-color one 8. On a relay-bound link (~40 MB/s D2H) the transfer IS
the video wall, so packing buys up to another 2-8x on the dominant term.

Packing runs on device (a handful of u8 shift/or ops — noise next to the
wavefront scan), the packed buffer crosses the link, and the host unpack
(numpy shifts, ~GB/s) restores the exact indices: the path is bit-exact
by construction, on by default, and DITHER_PIE_TPU_INDEX_PACK=0 opts out.

Bit order: the FIRST pixel of each group lands in the HIGH bits of the
byte (big-endian within the byte), groups tile the row left to right,
rows are padded up to a whole group with zeros and cropped on unpack.
"""

from __future__ import annotations

import functools
import os

import numpy as np


def pack_bits_for(p: int) -> int:
    """Bits per pixel the packed stream needs for a P-color palette, or 0
    when packing buys nothing (P > 16 needs >= 5 bits: a 2-pixel byte no
    longer fits, so the plain 8-bit stream is already minimal)."""
    if p <= 2:
        return 1
    if p <= 4:
        return 2
    if p <= 16:
        return 4
    return 0


def pack_enabled() -> bool:
    return os.environ.get("DITHER_PIE_TPU_INDEX_PACK", "1") != "0"


@functools.lru_cache(maxsize=None)
def _pack_jit(bpp: int):
    import jax
    import jax.numpy as jnp

    per = 8 // bpp

    @jax.jit
    def pack(idx):
        b, h, w = idx.shape
        wp = -(-w // per) * per
        if wp != w:
            idx = jnp.pad(idx, ((0, 0), (0, 0), (0, wp - w)))
        r = idx.reshape(b, h, wp // per, per).astype(jnp.uint8)
        acc = r[..., 0]
        for i in range(1, per):
            acc = (acc << jnp.uint8(bpp)) | r[..., i]
        return acc

    return pack


def pack_indices_device(idx, bpp: int):
    """(B, H, W) u8 device indices -> (B, H, ceil(W/per)) u8 packed, on
    device (jitted; the only transfer is the caller's np.asarray on the
    RESULT). Values must be < 2**bpp (guaranteed: bpp comes from
    pack_bits_for(P) and indices are < P)."""
    return _pack_jit(bpp)(idx)


def unpack_indices_host(packed: np.ndarray, bpp: int, w: int) -> np.ndarray:
    """Exact inverse of pack_indices_device: (B, H, Wp) u8 -> (B, H, w)
    u8 indices. Pure numpy shifts/masks (host-side cost is memory-bound,
    orders of magnitude above the link this exists to relieve)."""
    per = 8 // bpp
    b, h, wp = packed.shape
    mask = np.uint8((1 << bpp) - 1)
    out = np.empty((b, h, wp, per), np.uint8)
    for i in range(per):
        out[..., i] = (packed >> np.uint8(bpp * (per - 1 - i))) & mask
    return np.ascontiguousarray(out.reshape(b, h, wp * per)[..., :w])


def packed_transfer(idx, p: int, w: int) -> np.ndarray:
    """Transfer helper used at the D2H boundaries: device-pack when the
    palette qualifies and the knob allows, move the packed bytes across
    the link, host-unpack; otherwise plain np.asarray. Returns host
    (B, H, w) indices either way (same dtype contract as the caller's)."""
    bpp = pack_bits_for(p)
    if not bpp or not pack_enabled():
        return np.asarray(idx)
    return unpack_indices_host(np.asarray(pack_indices_device(idx, bpp)),
                               bpp, w)
