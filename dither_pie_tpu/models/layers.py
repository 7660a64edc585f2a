"""Functional JAX building blocks for the neural pixelizer.

Pure functions over a flat params dict whose keys mirror the torch
state_dict key strings (so checkpoint conversion is a per-tensor transpose,
nothing more). Layout is NHWC / HWIO throughout (TPU-native); semantics
replicate the reference layers bit-for-bit where they are quirky:

* the custom LayerNorm normalizes per-sample over ALL axes with an
  UNBIASED std and divides by (std + eps), affine per channel
  (/root/reference/models/basic_layer.py:338-365);
* InstanceNorm is affine-free, eps 1e-5, biased variance (torch default);
* ModulationConvBlock reinterprets its (O,I,k,k) weight buffer as
  (k,k,I,O) via a raw view — we store the converted weight in exactly that
  layout — then per-sample modulates by the style code over the I axis,
  demodulates per (batch, O), runs a per-sample conv (vmapped here instead
  of the reference's grouped-conv trick), adds bias, and applies
  LeakyReLU(0.2) * sqrt(2) (basic_layer.py:6-54).
"""

from __future__ import annotations

import contextlib
import math
import threading
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]

_DN = ("NHWC", "HWIO", "NHWC")

# bf16-activation fast mode (trace-time flag; thread-local because the
# video pipeline's overlap pool can trace two programs concurrently).
# When on: conv/linear operands and activations flow as bf16 (MXU-native
# ingest, half the HBM traffic), while every normalization computes its
# statistics in f32 (bf16 accumulation over ~500k elements loses digits).
# Opt-in only via the "bfloat16" precision mode, which is already a lossy
# fast path behind the first-batch parity gate
# (models/inference.py PixelizationModel._gated_batch_forward).
_tls = threading.local()


@contextlib.contextmanager
def bf16_activations(on: bool):
    prev = getattr(_tls, "bf16_act", False)
    _tls.bf16_act = bool(on)
    try:
        yield
    finally:
        _tls.bf16_act = prev


def _act_fast() -> bool:
    return getattr(_tls, "bf16_act", False)


def pad2d(x: jnp.ndarray, pad: int, pad_type: str) -> jnp.ndarray:
    if pad == 0:
        return x
    cfg = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    if pad_type == "reflect":
        return jnp.pad(x, cfg, mode="reflect")
    if pad_type == "replicate":
        return jnp.pad(x, cfg, mode="edge")
    return jnp.pad(x, cfg)


def conv2d(x: jnp.ndarray, w_hwio: jnp.ndarray, b: Optional[jnp.ndarray],
           stride: int = 1) -> jnp.ndarray:
    # Precision comes from the enclosing jax.default_matmul_precision
    # context set by c2pgen_forward/aliasnet_forward (defaults "float32"
    # — torch-parity; "bfloat16" is the opt-in MXU-native fast mode).
    if _act_fast():
        x = x.astype(jnp.bfloat16)
        w_hwio = w_hwio.astype(jnp.bfloat16)
    out = jax.lax.conv_general_dilated(
        x, w_hwio, (stride, stride), "VALID", dimension_numbers=_DN)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-(sample, channel) normalization over H, W; no affine.
    Statistics always in f32 (bf16 reduction over H*W loses digits)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 2), keepdims=True)
    return (((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
            if x.dtype != jnp.float32
            else (xf - mean) * jax.lax.rsqrt(var + eps))


def custom_layer_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                      eps: float = 1e-5) -> jnp.ndarray:
    """Reference LayerNorm: per-sample over all axes, UNBIASED std,
    divide by (std + eps), channel-wise affine. Statistics in f32."""
    b = x.shape[0]
    flat = x.astype(jnp.float32).reshape(b, -1)
    n = flat.shape[1]
    mean = jnp.mean(flat, axis=1)
    var_unbiased = jnp.sum((flat - mean[:, None]) ** 2, axis=1) / (n - 1)
    std = jnp.sqrt(var_unbiased)
    xn = (x.astype(jnp.float32) - mean[:, None, None, None]) \
        / (std + eps)[:, None, None, None]
    out = xn * gamma[None, None, None, :] + beta[None, None, None, :]
    return out.astype(x.dtype) if x.dtype != jnp.float32 else out


def activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, 0.2)
    if name == "tanh":
        return jnp.tanh
    if name == "selu":
        return jax.nn.selu
    if name == "none":
        return lambda x: x
    raise ValueError(f"unsupported activation {name}")


def conv_block(p: Params, key: str, x: jnp.ndarray, stride: int, pad: int,
               norm: str, act: str, pad_type: str) -> jnp.ndarray:
    """Reference ConvBlock / AliasConvBlock: pad -> conv -> norm -> act."""
    x = pad2d(x, pad, pad_type)
    x = conv2d(x, p[f"{key}.conv.weight"], p[f"{key}.conv.bias"], stride)
    if norm == "in":
        x = instance_norm(x)
    elif norm == "ln":
        x = custom_layer_norm(x, p[f"{key}.norm.gamma"], p[f"{key}.norm.beta"])
    elif norm != "none":
        raise ValueError(f"unsupported norm {norm}")
    return activation(act)(x)


def res_block(p: Params, key: str, x: jnp.ndarray, norm: str, act: str,
              pad_type: str) -> jnp.ndarray:
    r = x
    x = conv_block(p, f"{key}.model.0", x, 1, 1, norm, act, pad_type)
    x = conv_block(p, f"{key}.model.1", x, 1, 1, norm, "none", pad_type)
    return x + r


def res_blocks(p: Params, key: str, x: jnp.ndarray, n: int, norm: str,
               act: str, pad_type: str) -> jnp.ndarray:
    for i in range(n):
        x = res_block(p, f"{key}.model.{i}", x, norm, act, pad_type)
    return x


def linear_block(p: Params, key: str, x: jnp.ndarray, act: str) -> jnp.ndarray:
    w, b = p[f"{key}.fc.weight"], p[f"{key}.fc.bias"]
    if _act_fast():
        x, w = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
    x = jnp.dot(x, w) + b.astype(x.dtype)
    return activation(act)(x)


def modulated_conv(p: Params, key: str, x: jnp.ndarray,
                   code: jnp.ndarray) -> jnp.ndarray:
    """StyleGAN2-style modulated conv (reference ModulationConvBlock).

    x: (B, H, W, Cin); code: (B, Cin) — or (1, Cin) with B > 1, the
    shared-style case (the product always styles from ONE reference.png,
    c2pGen.py:242-258): then the modulated weight is identical for every
    sample and ONE dense batch-B conv replaces the B per-sample convs
    (same arithmetic, MXU-batched instead of group-lowered). Weight stored
    as (k, k, Cin, Cout) (the reference's raw-buffer view); per-sample
    codes keep the vmap path.
    """
    w = p[f"{key}.weight"]  # (k, k, in, out)
    bias = p[f"{key}.bias"]
    k = w.shape[0]
    in_c = w.shape[2]
    fan_in = k * k * in_c
    wscale = 1.0 / math.sqrt(fan_in)
    pad = k // 2

    # Modulation/demodulation statistics always in f32 (tiny tensors).
    wm = ((w * wscale)[None].astype(jnp.float32)
          * code[:, None, None, :, None].astype(jnp.float32))  # (B,k,k,i,o)
    norm = jnp.sqrt(jnp.sum(wm * wm, axis=(1, 2, 3)) + 1e-8)  # (B,o)
    wm = wm / norm[:, None, None, None, :]
    if _act_fast():
        x, wm = x.astype(jnp.bfloat16), wm.astype(jnp.bfloat16)

    if wm.shape[0] == 1 and x.shape[0] > 1:
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        out = jax.lax.conv_general_dilated(
            xp, wm[0], (1, 1), "VALID", dimension_numbers=_DN)
    else:
        def one(xb, wb):
            xb = jnp.pad(xb[None],
                         ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            return jax.lax.conv_general_dilated(
                xb, wb, (1, 1), "VALID", dimension_numbers=_DN)[0]

        out = jax.vmap(one)(x, wm)
    out = out + bias.astype(out.dtype)
    return jax.nn.leaky_relu(out, 0.2) * jnp.asarray(math.sqrt(2.0),
                                                     out.dtype)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)
