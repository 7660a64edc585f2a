"""P2CGen (pixel-art -> clipart generator) — functional JAX forward.

The reference trains CycleGAN-style with a reverse generator
(/root/reference/models/p2cGen.py:4-76, built by define_G('p2cGen') =
P2CGen(3, 3, 64, n_downsample=2, n_res=3), /root/reference/models/
networks.py:135-136). It is unused at inference, but the training stack
(models/training.py) needs it, so the forward lives here with the same
parity contract as the inference nets: flat params keyed by the torch
state_dict strings, NHWC/HWIO layouts, quirky reference norm semantics
reproduced by the shared blocks in models/layers.py.

Structure (all pad_type='reflect', activ='relu'):
  RGBEnc:  ConvBlock 7x7 s1 'in' -> 2x ConvBlock 4x4 s2 'in'
           -> ResBlocks(3, 'in')              (p2cGen.py:22-37)
  RGBDec:  ResBlocks(3, 'in') -> [up2x -> ConvBlock 5x5 'ln'] x2
           -> ConvBlock 7x7 'none' tanh       (p2cGen.py:40-76)

Unlike C2PGen's decoder there is no style modulation — the decoder's
res blocks use plain instance norm, so the whole net is a single
feed-forward conv stack that XLA fuses end to end.
"""

from __future__ import annotations

import jax.numpy as jnp

from dither_pie_tpu.models.c2pgen import _parity_precision
from dither_pie_tpu.models.layers import (
    Params,
    conv_block,
    res_blocks,
    upsample_nearest_2x,
)


@_parity_precision
def p2cgen_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) in [-1, 1] -> (B, H, W, 3) in [-1, 1].

    H and W must be multiples of 4 (two stride-2 downs, two 2x ups) —
    the same constraint the torch net has implicitly.
    """
    # RGBEncoder (p2cGen.py:22-37): state keys RGBEnc.model.{0,1,2} convs,
    # RGBEnc.model.3 = ResBlocks(3).
    x = conv_block(p, "RGBEnc.model.0", x, 1, 3, "in", "relu", "reflect")
    x = conv_block(p, "RGBEnc.model.1", x, 2, 1, "in", "relu", "reflect")
    x = conv_block(p, "RGBEnc.model.2", x, 2, 1, "in", "relu", "reflect")
    x = res_blocks(p, "RGBEnc.model.3", x, 3, "in", "relu", "reflect")
    # RGBDecoder (p2cGen.py:54-76): named attributes, not a Sequential —
    # the torch keys are RGBDec.Res_Blocks / RGBDec.conv_{1,2,3}.
    x = res_blocks(p, "RGBDec.Res_Blocks", x, 3, "in", "relu", "reflect")
    x = upsample_nearest_2x(x)
    x = conv_block(p, "RGBDec.conv_1", x, 1, 2, "ln", "relu", "reflect")
    x = upsample_nearest_2x(x)
    x = conv_block(p, "RGBDec.conv_2", x, 1, 2, "ln", "relu", "reflect")
    return conv_block(p, "RGBDec.conv_3", x, 1, 3, "none", "tanh", "reflect")
