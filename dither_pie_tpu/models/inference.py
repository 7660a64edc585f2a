"""Neural pixelization inference: the reference Model surface
(/root/reference/models/pixelization.py:12-83) on JAX.

Flow (parity-exact):
  greyscale reference.png -> process() [center-crop to %4, [-1,1]] (cached)
  input -> process() -> alias_net(c2pgen(input, ref)) -> denorm ->
  /4 then x4 NEAREST (crisp 4x4 blocks) -> save/return.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from dither_pie_tpu.models.c2pgen import (aliasnet_forward,
                                          aliasnet_forward_ds4,
                                          c2pgen_forward, style_adain)
from dither_pie_tpu.models.convert import convert_checkpoints, find_checkpoint_dir
from dither_pie_tpu.utils import compute_even_dimensions

_REFERENCE_PNG = Path(__file__).resolve().parents[1] / "assets" / "reference.png"


def greyscale(img: Image.Image) -> Image.Image:
    gray = np.array(img.convert("L"))
    return Image.fromarray(np.stack([gray, gray, gray], axis=-1))


def process(img: Image.Image) -> np.ndarray:
    """Center-crop to a multiple of 4, scale to [-1, 1], NHWC float32."""
    ow, oh = img.size
    nw = int(round(ow / 4) * 4)
    nh = int(round(oh / 4) * 4)
    left = (ow - nw) // 2
    top = (oh - nh) // 2
    img = img.crop((left, top, left + nw, top + nh))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return ((arr - 0.5) / 0.5)[None]  # (1, H, W, 3)


def process_u8(img: Image.Image) -> np.ndarray:
    """Center-crop to a multiple of 4, keep uint8 — the normalization to
    [-1, 1] happens ON DEVICE (`_maybe_normalize`), so the host->device
    transfer ships 1 byte/pixel instead of 4 (the video-path H2D cut that
    mirrors the ds4 D2H cut)."""
    ow, oh = img.size
    nw = int(round(ow / 4) * 4)
    nh = int(round(oh / 4) * 4)
    left = (ow - nw) // 2
    top = (oh - nh) // 2
    return np.asarray(img.crop((left, top, left + nw, top + nh)),
                      dtype=np.uint8)[None]  # (1, H, W, 3) u8


def _maybe_normalize(in_t):
    """u8 operands normalize on device (x/255 then (v-0.5)/0.5 like
    process()); f32 operands pass through (already normalized on host).

    Precision: XLA rewrites the divide-by-constant to a reciprocal
    multiply, so device values can differ from host process() by 1 ulp
    (~6e-8) — far inside the neural parity budget (torch parity holds at
    atol 1e-5, and a tanh-bounded generator maps 1 ulp of input to <1 u8
    step of output). DITHER_PIE_TPU_NEURAL_U8_IN=0 restores the
    host-exact f32 prep."""
    if in_t.dtype == jnp.uint8:
        x = in_t.astype(jnp.float32) / jnp.float32(255.0)
        return (x - jnp.float32(0.5)) / jnp.float32(0.5)
    return in_t


def deprocess(out: np.ndarray) -> Image.Image:
    """[-1,1] -> uint8 image, then /4 + x4 NEAREST for crisp 4x4 blocks."""
    img = ((out[0] + 1) / 2.0 * 255.0).astype(np.uint8)
    return deprocess_u8(img)


def deprocess_u8(img: np.ndarray) -> Image.Image:
    """(H, W, 3) uint8 -> /4 + x4 NEAREST for crisp 4x4 blocks."""
    pil = Image.fromarray(img)
    pil = pil.resize((pil.size[0] // 4, pil.size[1] // 4), Image.Resampling.NEAREST)
    pil = pil.resize((pil.size[0] * 4, pil.size[1] * 4), Image.Resampling.NEAREST)
    return pil


def downsample4_indices(n: int) -> slice:
    """PIL NEAREST ``resize(w//4)`` samples source pixel floor((i+0.5)*4) =
    4i+2 — i.e. ``arr[2::4]`` along each axis (H, W are multiples of 4 here:
    process() center-crops to %4)."""
    return slice(2, n, 4)


def upsample4_u8(ds: np.ndarray) -> np.ndarray:
    """(h, w, 3) u8 -> (4h, 4w, 3): PIL NEAREST x4 upsample maps dest pixel
    i to source floor((i+0.5)/4) = i//4, which is exactly ``np.repeat`` x4
    on both axes (bit-identity tested vs PIL in tests/test_neural.py)."""
    return np.repeat(np.repeat(ds, 4, axis=0), 4, axis=1)


def resize_image_nearest(img: Image.Image, target_size: int) -> Image.Image:
    """Smallest side -> target_size, NEAREST (reference resize_image)."""
    width, height = img.size
    ar = width / height
    if width < height:
        nw, nh = target_size, int(target_size / ar)
    else:
        nh, nw = target_size, int(target_size * ar)
    return img.resize((nw, nh), Image.NEAREST)


@functools.partial(jax.jit, static_argnames=("precision",))
def _forward(gen_params, alias_params, in_t, ref_t, precision: str = "float32"):
    in_t = _maybe_normalize(in_t)
    return aliasnet_forward(
        alias_params,
        c2pgen_forward(gen_params, in_t, ref_t, precision=precision),
        precision=precision)


@functools.partial(jax.jit, static_argnames=("precision",))
def _forward_u8(gen_params, alias_params, in_t, ref_t,
                precision: str = "float32"):
    """Forward + on-device denormalization to uint8: [-1,1] -> (x+1)/2*255
    truncated, the reference's save() arithmetic
    (/root/reference/models/pixelization.py:76-83). Shipping u8 instead of
    f32 quarters the device->host transfer (the video-path bottleneck on
    thin host links).

    ``precision``: matmul/conv precision for the MXU. "float32" (default)
    matches the torch-parity contract; "bfloat16" runs convolutions at the
    MXU's native bf16 rate with f32 accumulation (activations and instance
    norms stay f32) — the standard TPU inference trade, ~1 u8 step of
    output difference on a tanh-bounded generator. The batched video path
    auto-selects bf16 behind a first-batch parity gate
    (PixelizationModel._gated_batch_forward); elsewhere opt in via
    DITHER_PIE_TPU_NEURAL_PRECISION=bfloat16."""
    in_t = _maybe_normalize(in_t)
    out = aliasnet_forward(
        alias_params,
        c2pgen_forward(gen_params, in_t, ref_t, precision=precision),
        precision=precision)
    return ((out + 1.0) * 0.5 * 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("precision",))
def _forward_u8_adain(gen_params, alias_params, in_t, adain,
                      precision: str = "float32"):
    """forward_u8 with the (constant) adain style code precomputed once —
    skips the per-call VGG19+PBEnc+MLP pass over reference.png."""
    in_t = _maybe_normalize(in_t)
    out = aliasnet_forward(
        alias_params,
        c2pgen_forward(gen_params, in_t, adain=adain, precision=precision),
        precision=precision)
    return ((out + 1.0) * 0.5 * 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("precision", "stride"))
def _forward_u8_ds4_adain(gen_params, alias_params, in_t, adain,
                          precision: str = "float32",
                          stride: bool = False):
    """forward_u8_adain + on-device /4 NEAREST sample: the product's final
    image is 4x4-block-constant by construction (the reference's save() does
    /4-then-x4 NEAREST, /root/reference/models/pixelization.py:76-83), so
    only the (H/4, W/4) samples at block position (2, 2) ever reach the
    output — shipping just those cuts device->host traffic 16x vs the full
    u8 frame (64x vs f32). The host reconstructs bit-identically with
    ``upsample4_u8``.

    ``stride``: compute ONLY those samples — the final 7x7 aliasnet conv
    runs with window_strides=(4,4) (aliasnet_forward_ds4; 16x fewer
    windows, measured 1.38x on the bf16 alias stage on a v5e). Bitwise
    identical to the dense slice in f32 on hardware; in bf16 the lowering
    differs by <=1.3e-4 pre-u8 — _gated_batch_forward admits it behind a
    first-batch parity gate."""
    in_t = _maybe_normalize(in_t)
    mid = c2pgen_forward(gen_params, in_t, adain=adain, precision=precision)
    if stride:
        out = aliasnet_forward_ds4(alias_params, mid, precision=precision)
        return ((out + 1.0) * 0.5 * 255.0).astype(jnp.uint8)
    out = aliasnet_forward(alias_params, mid, precision=precision)
    u8 = ((out + 1.0) * 0.5 * 255.0).astype(jnp.uint8)
    return u8[:, 2::4, 2::4, :]


@functools.partial(jax.jit, static_argnames=("precision",))
def _forward_adain(gen_params, alias_params, in_t, adain,
                   precision: str = "float32"):
    in_t = _maybe_normalize(in_t)
    return aliasnet_forward(
        alias_params,
        c2pgen_forward(gen_params, in_t, adain=adain, precision=precision),
        precision=precision)


@jax.jit
def _style_adain_jit(gen_params, ref_t):
    # Style code always at full f32 precision (computed once, cached).
    return style_adain(gen_params, ref_t, precision="float32")


def _env_precision() -> str:
    import os

    p = os.environ.get("DITHER_PIE_TPU_NEURAL_PRECISION", "float32")
    if p not in ("float32", "bfloat16", "tensorfloat32"):
        raise ValueError(f"bad DITHER_PIE_TPU_NEURAL_PRECISION: {p!r}")
    return p


class PixelizationModel:
    """load() + pixelize() surface matching the reference Model class."""

    def __init__(self, checkpoint_dir: Optional[str] = None):
        self.checkpoint_dir = checkpoint_dir
        self.gen_params = None
        self.alias_params = None
        self.ref_t = None

    def load(self):
        ckpt = self.checkpoint_dir or find_checkpoint_dir()
        gen, alias = convert_checkpoints(ckpt)
        self._set_params(gen, alias)

    def load_random(self, seed: int = 0):
        """Architecture-correct random weights (benchmarking / smoke tests
        when the released checkpoints are absent)."""
        from dither_pie_tpu.models.param_shapes import random_params

        gen, alias = random_params(seed)
        self._set_params(gen, alias)

    def _set_params(self, gen, alias):
        self.gen_params = {k: jnp.asarray(v) for k, v in gen.items()}
        self.alias_params = {k: jnp.asarray(v) for k, v in alias.items()}
        ref_img = greyscale(Image.open(_REFERENCE_PNG).convert("L"))
        self.ref_t = jnp.asarray(process(ref_img))
        self._adain = None  # style code cache (lazy; constant per params)
        self._video_prec = None  # batched-video precision (parity-gated)
        self._ds4_stride = None  # strided final conv (first-batch gated)

    def _style(self) -> jnp.ndarray:
        """The (1, 2048) adain code for reference.png — computed once per
        loaded params (the reference recomputes VGG19+PBEnc+MLP on the same
        image every forward; the result is identical)."""
        if self._adain is None:
            self._adain = _style_adain_jit(self.gen_params, self.ref_t)
        return self._adain

    def forward_array(self, in_t: np.ndarray) -> np.ndarray:
        """(1, H, W, 3) in [-1, 1] -> same, through G_A + alias nets."""
        out = _forward_adain(self.gen_params, self.alias_params,
                             jnp.asarray(in_t), self._style(),
                             precision=_env_precision())
        return np.asarray(out)

    def forward_u8(self, in_t: np.ndarray,
                   precision: Optional[str] = None,
                   ds4: bool = False, stride: bool = False) -> np.ndarray:
        """(B, H, W, 3) in [-1, 1] -> (B, H, W, 3) uint8 (denormalized on
        device; 4x less device->host traffic than forward_array).
        ``precision`` None -> the DITHER_PIE_TPU_NEURAL_PRECISION env
        setting (default float32 torch-parity).
        ``ds4``: return the (B, H/4, W/4, 3) block samples instead (16x
        less transfer; ``upsample4_u8`` reconstructs the full frame
        bit-identically — see _forward_u8_ds4_adain).
        ``stride`` (ds4 only): stride-4 final conv — compute only the
        samples (see _forward_u8_ds4_adain)."""
        if ds4:
            out = _forward_u8_ds4_adain(self.gen_params, self.alias_params,
                                        jnp.asarray(in_t), self._style(),
                                        precision=precision or _env_precision(),
                                        stride=stride)
        else:
            out = _forward_u8_adain(self.gen_params, self.alias_params,
                                    jnp.asarray(in_t), self._style(),
                                    precision=precision or _env_precision())
        return np.asarray(out)

    # Parity gate for the bf16 video fast path: bf16 convs with f32
    # accumulation on a tanh-bounded generator measured ~0.05 mean |u8
    # delta| vs f32; these bounds are ~20x that yet still far below any
    # visible difference, so a genuinely precision-sensitive checkpoint
    # fails closed to f32.
    BF16_GATE_MEAN_U8_DELTA = 1.0
    BF16_GATE_BLOCK_MEAN = 2.0

    def _gated_batch_forward(self, stacked: np.ndarray,
                             ds4: bool = False) -> np.ndarray:
        """Batched-video forward with bf16-by-default behind a parity gate.

        On the first batch (unless DITHER_PIE_TPU_NEURAL_PRECISION is set
        explicitly, which always wins): run BOTH f32 and bf16 forwards,
        compare with the core/fidelity.py block-mean metric plus mean
        |u8 delta|, and lock in bf16 (4.5-7x faster on the MXU) only if the
        gate passes — otherwise fall back to f32 parity for the whole video.

        With ``ds4`` the gate compares the /4 block samples — the ONLY
        pixels that reach the final (4x4-block-constant) output, so per-
        pixel stats on the samples equal per-block stats on the full frame
        (block=1 below is the full frame's block=4).
        """
        import logging
        import os

        from dither_pie_tpu.core.fidelity import block_mean_error

        logger = logging.getLogger("dither_pie_tpu")
        dense = None  # this batch's dense output at the locked precision
        if self._video_prec is None:
            if "DITHER_PIE_TPU_NEURAL_PRECISION" in os.environ:
                self._video_prec = _env_precision()
            else:
                f32 = self.forward_u8(stacked, precision="float32", ds4=ds4)
                bf16 = self.forward_u8(stacked, precision="bfloat16",
                                       ds4=ds4)
                mean_delta = float(np.abs(
                    f32.astype(np.int16) - bf16.astype(np.int16)).mean())
                block_mean = max(
                    block_mean_error(f32[i], bf16[i], block=1 if ds4 else 4)[0]
                    for i in range(f32.shape[0]))
                if (mean_delta <= self.BF16_GATE_MEAN_U8_DELTA
                        and block_mean <= self.BF16_GATE_BLOCK_MEAN):
                    self._video_prec = "bfloat16"
                    logger.info(
                        f"Neural video: bf16 fast path enabled (parity gate"
                        f" passed: mean |u8 delta| {mean_delta:.3f}, block"
                        f" mean {block_mean:.3f})")
                    dense = bf16
                else:
                    self._video_prec = "float32"
                    logger.warning(
                        f"Neural video: bf16 parity gate FAILED (mean |u8 "
                        f"delta| {mean_delta:.3f}, block mean "
                        f"{block_mean:.3f}); staying on float32")
                    dense = f32
        if not ds4:
            if dense is None:
                dense = self.forward_u8(stacked, precision=self._video_prec)
            return dense

        # Strided final conv (ds4 only): compute ONLY the /4 samples —
        # 16x fewer windows in the last 7x7 aliasnet conv. First-batch
        # gate: f32 requires BITWISE equality vs the dense slice (holds on
        # TPU hardware, tools/ds4_stride_probe.py; XLA:CPU's FMA
        # contraction legitimately fails it -> dense), bf16 reuses the
        # bf16 quality budget vs its own dense lowering (measured pre-u8
        # divergence <= 1.3e-4, far inside the budget).
        # DITHER_PIE_TPU_NEURAL_DS4_STRIDE=0/1 forces.
        if self._ds4_stride is None:
            env = os.environ.get("DITHER_PIE_TPU_NEURAL_DS4_STRIDE")
            if env in ("0", "1"):
                self._ds4_stride = env == "1"
            else:
                if dense is None:
                    dense = self.forward_u8(stacked,
                                            precision=self._video_prec,
                                            ds4=True)
                cand = self.forward_u8(stacked, precision=self._video_prec,
                                       ds4=True, stride=True)
                if self._video_prec == "float32":
                    ok = bool(np.array_equal(cand, dense))
                    note = "bitwise" if ok else "not bitwise"
                else:
                    mean_delta = float(np.abs(
                        dense.astype(np.int16) - cand.astype(np.int16))
                        .mean())
                    block_mean = max(
                        block_mean_error(dense[i], cand[i], block=1)[0]
                        for i in range(dense.shape[0]))
                    ok = (mean_delta <= self.BF16_GATE_MEAN_U8_DELTA
                          and block_mean <= self.BF16_GATE_BLOCK_MEAN)
                    note = (f"mean |u8 delta| {mean_delta:.3f}, "
                            f"block mean {block_mean:.3f}")
                self._ds4_stride = ok
                logger.info(
                    f"Neural video: strided ds4 conv "
                    f"{'enabled' if ok else 'DISABLED'} ({note})")
                return cand if ok else dense
        if self._ds4_stride:
            return self.forward_u8(stacked, precision=self._video_prec,
                                   ds4=True, stride=True)
        if dense is None:
            dense = self.forward_u8(stacked, precision=self._video_prec,
                                    ds4=True)
        return dense

    def pixelize(self, in_path: str, out_path: str):
        img = Image.open(in_path).convert("RGB")
        deprocess(self.forward_array(process(img))).save(out_path)

    def pixelize_image(self, image: Image.Image, max_size: int) -> Image.Image:
        """The NeuralPixelizer flow (video_processor.py:505-545): upscale to
        max_size*4, run the nets, then NEAREST-resize to even dims at
        max_size."""
        img = resize_image_nearest(image.convert("RGB"), max_size * 4)
        result = deprocess_u8(self.forward_u8(process(img))[0])
        tw, th = compute_even_dimensions(result.size[0], result.size[1], max_size)
        return result.resize((tw, th), Image.Resampling.NEAREST)

    def pixelize_images_batch(self, images, max_size: int):
        """Batched pixelize_image for same-size frames (the video path).

        One device forward over the stacked (B, H, W, 3) batch replaces the
        reference's sequential per-frame neural loop
        (/root/reference/video_processor.py:240-303); the PIL pre/post
        resizes stay per-frame for bit-parity with pixelize_image. Frames
        whose pre-processed shapes differ (can't happen within one video)
        fall back to the per-frame path.
        """
        import os

        # u8 inputs: normalization happens on device (_maybe_normalize), so
        # the host->device transfer ships 1 byte/pixel instead of 4 — the
        # H2D mirror of the ds4 D2H cut. Opt out (host f32 prep) with
        # DITHER_PIE_TPU_NEURAL_U8_IN=0.
        u8_in = os.environ.get("DITHER_PIE_TPU_NEURAL_U8_IN", "1") != "0"
        prep = process_u8 if u8_in else process
        pre = [prep(resize_image_nearest(im.convert("RGB"), max_size * 4))
               for im in images]
        if len({p.shape for p in pre}) != 1:
            return [self.pixelize_image(im, max_size) for im in images]
        # ds4: transfer only the /4 block samples (the output is 4x4-block-
        # constant by construction) and rebuild bit-identically on host —
        # 16x less D2H traffic than full u8 frames. Opt out with
        # DITHER_PIE_TPU_NEURAL_DS4=0 (bit-identity tested either way).
        ds4 = os.environ.get("DITHER_PIE_TPU_NEURAL_DS4", "1") != "0"
        out = self._gated_batch_forward(np.concatenate(pre, axis=0), ds4=ds4)
        results = []
        for i in range(len(images)):
            if ds4:
                r = Image.fromarray(upsample4_u8(out[i]))
            else:
                r = deprocess_u8(out[i])
            tw, th = compute_even_dimensions(r.size[0], r.size[1], max_size)
            results.append(r.resize((tw, th), Image.Resampling.NEAREST))
        return results
