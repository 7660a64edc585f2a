"""C2PGen (clipart -> pixel-art generator), AliasNet, and the VGG19 feature
pyramid — functional JAX forward passes over converted torch params.

Architecture per /root/reference/models/c2pGen.py with
define_G('c2pGen') = C2PGen(3, 3, 64, n_down=2, n_res=4, style=256, mlp=256)
and define_G('antialias') = AliasNet(3, 3, 64, 2, 3). Reference quirks that
are load-bearing for output parity and therefore reproduced:

* RGBDecoder.forward applies mod_conv_1 once and then reuses mod_conv_2 for
  the remaining SEVEN modulated convs (c2pGen.py:242-258) — the weights of
  mod_conv_3..8 exist in the checkpoint but are never used;
* the VGG feature taps are the raw conv outputs (pre-ReLU) at torchvision
  feature indices 0 / 5 / 10 / 19 (c2pGen.py:160-169);
* the MLP is 3 ReLU linear blocks + a final affine to 2048 (a == 0 collapses
  the two-style interpolation, basic_layer.py:158-175).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from dither_pie_tpu.models.layers import (
    Params,
    conv2d,
    conv_block,
    linear_block,
    max_pool_2x2,
    modulated_conv,
    pad2d,
    res_blocks,
    upsample_nearest_2x,
)

def _parity_precision(fn):
    """Exported building blocks default to f32 matmul precision (the
    torch-parity contract) when called OUTSIDE any
    ``jax.default_matmul_precision`` context — otherwise a direct library
    consumer would silently get the backend default (bf16 matmuls on TPU).
    An enclosing context (e.g. the bf16 fast mode set by c2pgen_forward)
    still takes precedence."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        cur = jax.config.jax_default_matmul_precision
        with jax.default_matmul_precision(cur if cur is not None
                                          else "float32"):
            return fn(*args, **kwargs)

    return wrapped


# torchvision vgg19.features conv indices up to conv4_1, with pool positions.
_VGG_LAYOUT = [
    ("conv", 0), ("relu", None), ("conv", 2), ("relu", None), ("pool", None),
    ("conv", 5), ("relu", None), ("conv", 7), ("relu", None), ("pool", None),
    ("conv", 10), ("relu", None), ("conv", 12), ("relu", None),
    ("conv", 14), ("relu", None), ("conv", 16), ("relu", None), ("pool", None),
    ("conv", 19), ("relu", None),
]
_VGG_TAPS = {0: "conv1_1", 5: "conv2_1", 10: "conv3_1", 19: "conv4_1"}


@_parity_precision
def vgg_features(p: Params, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Taps at conv1_1 / conv2_1 / conv3_1 / conv4_1 (NHWC).

    The reference nominally captures the conv outputs, but its ReLUs are
    ``inplace=True`` and mutate the captured tensors as iteration continues
    (c2pGen.py:160-169) — so the taps are effectively POST-ReLU. Reproduced
    here by recording after the activation.
    """
    taps = {}
    pending = None
    for kind, idx in _VGG_LAYOUT:
        if kind == "conv":
            x = pad2d(x, 1, "zero")
            x = conv2d(x, p[f"vgg.{idx}.weight"], p[f"vgg.{idx}.bias"])
            pending = _VGG_TAPS.get(idx)
        elif kind == "relu":
            x = jnp.maximum(x, 0.0)
            if pending:
                taps[pending] = x
                pending = None
        else:
            x = max_pool_2x2(x)
    return taps


@_parity_precision
def rgb_encoder(p: Params, key: str, x: jnp.ndarray) -> jnp.ndarray:
    """7x7 conv + 2 stride-2 downs + 4 resblocks, instance norm, reflect."""
    x = conv_block(p, f"{key}.model.0", x, 1, 3, "in", "relu", "reflect")
    x = conv_block(p, f"{key}.model.1", x, 2, 1, "in", "relu", "reflect")
    x = conv_block(p, f"{key}.model.2", x, 2, 1, "in", "relu", "reflect")
    return res_blocks(p, f"{key}.model.3", x, 4, "in", "relu", "reflect")


@_parity_precision
def pixel_block_encoder(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """VGG-pyramid style encoder -> (B, 256) style code."""
    taps = vgg_features(p, x)
    x = conv_block(p, "PBEnc.conv1", x, 1, 3, "none", "relu", "reflect")
    x = jnp.concatenate([x, taps["conv1_1"]], axis=-1)
    x = conv_block(p, "PBEnc.conv2", x, 2, 1, "none", "relu", "reflect")
    x = jnp.concatenate([x, taps["conv2_1"]], axis=-1)
    x = conv_block(p, "PBEnc.conv3", x, 2, 1, "none", "relu", "reflect")
    x = jnp.concatenate([x, taps["conv3_1"]], axis=-1)
    x = conv_block(p, "PBEnc.conv4", x, 2, 1, "none", "relu", "reflect")
    x = jnp.concatenate([x, taps["conv4_1"]], axis=-1)
    # AdaptiveAvgPool2d(1) + 1x1 conv to style_dim.
    x = jnp.mean(x, axis=(1, 2), keepdims=True)
    x = conv2d(x, p["PBEnc.model.1.weight"], p["PBEnc.model.1.bias"])
    return x.reshape(x.shape[0], -1)  # (B, 256)


@_parity_precision
def style_mlp(p: Params, code: jnp.ndarray) -> jnp.ndarray:
    """3 relu linear blocks + final affine -> (B, 2048) adain params."""
    x = code
    for i in range(3):
        x = linear_block(p, f"MLP.model.{i}", x, "relu")
    return linear_block(p, "MLP.model.3", x, "none")


@_parity_precision
def rgb_decoder(p: Params, key: str, x: jnp.ndarray,
                code: jnp.ndarray) -> jnp.ndarray:
    """8 modulated convs in 4 residual pairs (with the reference's
    mod_conv_2 reuse quirk) -> 2 upsample+LN-conv stages -> 7x7 tanh conv."""
    c = lambda i: code[:, 256 * i: 256 * (i + 1)]
    residual = x
    x = modulated_conv(p, f"{key}.mod_conv_1", x, c(0))
    x = modulated_conv(p, f"{key}.mod_conv_2", x, c(1))
    x = x + residual
    residual = x
    x = modulated_conv(p, f"{key}.mod_conv_2", x, c(2))
    x = modulated_conv(p, f"{key}.mod_conv_2", x, c(3))
    x = x + residual
    residual = x
    x = modulated_conv(p, f"{key}.mod_conv_2", x, c(4))
    x = modulated_conv(p, f"{key}.mod_conv_2", x, c(5))
    x = x + residual
    residual = x
    x = modulated_conv(p, f"{key}.mod_conv_2", x, c(6))
    x = modulated_conv(p, f"{key}.mod_conv_2", x, c(7))
    x = x + residual
    x = upsample_nearest_2x(x)
    x = conv_block(p, f"{key}.conv_1", x, 1, 2, "ln", "relu", "reflect")
    x = upsample_nearest_2x(x)
    x = conv_block(p, f"{key}.conv_2", x, 1, 2, "ln", "relu", "reflect")
    return conv_block(p, f"{key}.conv_3", x, 1, 3, "none", "tanh", "reflect")


def style_adain(p: Params, reference: jnp.ndarray, s: float = 1.0,
                precision: str = "float32") -> jnp.ndarray:
    """(1, H, W, 3) reference image -> (1, 2048) adain code. Constant for a
    fixed reference.png, so callers cache it across forwards
    (inference.PixelizationModel)."""
    with jax.default_matmul_precision(precision):
        return style_mlp(p, pixel_block_encoder(p, reference)) * s


def c2pgen_forward(p: Params, clipart: jnp.ndarray,
                   reference: jnp.ndarray = None, s: float = 1.0,
                   adain: jnp.ndarray = None,
                   precision: str = "float32") -> jnp.ndarray:
    """Full generator: (B,H,W,3) in [-1,1] -> (B,H,W,3) in [-1,1].

    Pass either ``reference`` (style image; PBEnc+VGG run inline) or a
    precomputed ``adain`` code from :func:`style_adain`.

    ``precision``: matmul/conv precision ("float32" default — full f32,
    the torch-parity contract for every direct caller; "bfloat16" is the
    MXU fast mode the inference wrappers opt into: bf16 matmul passes AND
    bf16 activations end-to-end — half the HBM traffic — with every
    normalization's statistics still computed in f32; see
    layers.bf16_activations). Output is always f32."""
    from dither_pie_tpu.models.layers import bf16_activations

    fast = precision == "bfloat16"
    with jax.default_matmul_precision(precision), bf16_activations(fast):
        feature = rgb_encoder(p, "RGBEnc", clipart)
        if adain is None:
            adain = style_adain(p, reference, s, precision=precision)
        # One style reference serves the whole frame batch (the reference
        # model always uses a single reference.png): the (1, 2048) code is
        # passed through UNBROADCAST — modulated_conv recognizes the
        # shared-style shape and runs one dense batch-B conv instead of B
        # per-sample convs.
        return rgb_decoder(p, "RGBDec", feature,
                           adain).astype(jnp.float32)


# ---------------------------------------------------------------------------
# AliasNet
# ---------------------------------------------------------------------------


def aliasnet_forward(p: Params, x: jnp.ndarray,
                     precision: str = "float32") -> jnp.ndarray:
    """Anti-aliasing net: encoder (in-norm) + decoder, reflect padding.
    ``precision`` as in :func:`c2pgen_forward`; output always f32."""
    from dither_pie_tpu.models.layers import bf16_activations

    fast = precision == "bfloat16"
    with jax.default_matmul_precision(precision), bf16_activations(fast):
        return _aliasnet_body(p, x).astype(jnp.float32)


def aliasnet_forward_ds4(p: Params, x: jnp.ndarray,
                         precision: str = "float32") -> jnp.ndarray:
    """Aliasnet evaluated only at the DS4 sample grid (stride-4 final
    conv, see _aliasnet_body_ds4): (B, H, W, 3) -> (B, H/4, W/4, 3).
    16x fewer final-conv windows; the inference path enables it behind a
    first-batch runtime gate (models/inference.py:_gated_batch_forward)."""
    from dither_pie_tpu.models.layers import bf16_activations

    fast = precision == "bfloat16"
    with jax.default_matmul_precision(precision), bf16_activations(fast):
        return _aliasnet_body_ds4(p, x).astype(jnp.float32)


def _aliasnet_trunk(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Everything up to (not including) the final 7x7 tanh conv."""
    x = conv_block(p, "RGBEnc.model.0", x, 1, 3, "in", "relu", "reflect")
    x = conv_block(p, "RGBEnc.model.1", x, 2, 1, "in", "relu", "reflect")
    x = conv_block(p, "RGBEnc.model.2", x, 2, 1, "in", "relu", "reflect")
    x = res_blocks(p, "RGBEnc.model.3", x, 3, "in", "relu", "reflect")
    x = res_blocks(p, "RGBDec.Res_Blocks", x, 3, "in", "relu", "reflect")
    x = upsample_nearest_2x(x)
    x = conv_block(p, "RGBDec.conv_1", x, 1, 2, "ln", "relu", "reflect")
    x = upsample_nearest_2x(x)
    return conv_block(p, "RGBDec.conv_2", x, 1, 2, "ln", "relu", "reflect")


def _aliasnet_body(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = _aliasnet_trunk(p, x)
    return conv_block(p, "RGBDec.conv_3", x, 1, 3, "none", "tanh", "reflect")


def _aliasnet_body_ds4(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Aliasnet evaluated only at the DS4 sample grid: identical trunk,
    but the final 7x7 conv runs with window_strides=(4,4) on the
    reflect-padded input cropped by (2, 2) — output row m is the window
    starting at padded row 2+4m, i.e. exactly ``dense_out[2::4, 2::4]``
    (the only pixels the 4x4-block-constant product image ever uses).
    Same per-window arithmetic, 16x fewer windows. Whether the strided
    lowering is BIT-identical to slice-after-dense is a toolchain
    property; tools/ds4_stride_probe.py decides it on hardware (exits
    nonzero on mismatch) and the inference path only enables this conv
    behind its own first-batch runtime gate (see
    models/inference.py:_gated_batch_forward's ds4_stride gate)."""
    x = _aliasnet_trunk(p, x)
    xp = pad2d(x, 3, "reflect")[:, 2:, 2:, :]
    out = conv2d(xp, p["RGBDec.conv_3.conv.weight"],
                 p["RGBDec.conv_3.conv.bias"], stride=4)
    return jnp.tanh(out)
