"""CPDis / CPDis_cls PatchGAN discriminators + margin-product heads.

TPU-first functional re-design of /root/reference/models/c2pDis.py
(training-only; built by define_D('CPDis'|'CPDis_cls'), networks.py:170-176).
Parity contracts reproduced exactly:

* the reference's hand-rolled SpectralNorm (c2pDis.py:237-302) runs ONE
  power iteration per forward (even in eval), updates u/v in place with
  gradients detached (``.data`` writes), and divides the raw weight by
  ``sigma = u . (W v)`` — here that is a pure function returning the
  normalized weight AND the new (u, v), with ``stop_gradient`` standing in
  for the ``.data`` detach so grads flow only through ``weight_bar``,
  matching torch autograd;
* conv stack: 4x4 convs (zero pad 1), strides 2/2/2/1, LeakyReLU(0.01),
  64->128->256->512, then a bias-free 4x4 conv to 1 patch logit
  (c2pDis.py:134-177);
* CPDis_cls adds AdaptiveAvgPool2d(1) -> 1x1 conv -> MarginCosineProduct
  (512 -> 7 classes, s=30, m=0.40) on the shared trunk (c2pDis.py:180-235);
* the three margin heads (cosine / arc / multi, c2pDis.py:15-131) are pure
  functions over (features, weight, labels) — all MXU matmuls.

State layout: flat params dict in the torch state_dict key space. SN convs
keep ``weight_bar`` in torch (O, I, kh, kw) layout — the power iteration is
defined on the (O, I*kh*kw) flattening, so preserving the axis order is what
makes sigma bit-comparable; the HWIO transpose for the conv itself is a
free relayout inside the jitted program. u/v are state, not weights: the
forwards return an updates dict the caller merges (``{**params, **new_uv}``)
— the functional twin of the reference's forward_pre_hook mutation.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dither_pie_tpu.models.c2pgen import _parity_precision
from dither_pie_tpu.models.layers import Params

_DN = ("NHWC", "HWIO", "NHWC")

#: (key, in_ch, out_ch, stride) for the shared CPDis trunk (c2pDis.py:139-163)
TRUNK = (
    ("main.0", 3, 64, 2),
    ("main.2", 64, 128, 2),
    ("main.4", 128, 256, 2),
    ("main.6", 256, 512, 1),
)
N_CLASSES = 7  # MarginCosineProduct(512, 7), c2pDis.py:214


def _l2n(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Reference l2normalize (basic_layer.py:368): v / (||v|| + eps)."""
    return v / (jnp.linalg.norm(v) + eps)


def spectral_norm_weight(w_bar: jnp.ndarray, u: jnp.ndarray,
                         v: jnp.ndarray,
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One power iteration -> (w_bar / sigma, u', v').

    w_bar: (O, ...) torch-layout weight; u: (O,); v: (prod(rest),).
    The iteration runs on the detached weight (torch writes ``.data``), so
    u'/v' carry no gradient; sigma keeps the w_bar dependency.
    """
    o = w_bar.shape[0]
    w2d = w_bar.reshape(o, -1)
    w2d_ng = jax.lax.stop_gradient(w2d)
    # u is a no-grad buffer in torch; detach it so sigma's only live
    # dependency is w2d (otherwise grads leak into weight_u via sigma).
    u = jax.lax.stop_gradient(u)
    v = _l2n(w2d_ng.T @ u)
    u = _l2n(w2d_ng @ v)
    sigma = u @ (w2d @ v)
    return w_bar / sigma, u, v


def _sn_conv(p: Params, key: str, x: jnp.ndarray, stride: int,
             updates: Dict[str, jnp.ndarray], bias: bool = True
             ) -> jnp.ndarray:
    """Spectral-normalized 4x4 conv, zero pad 1 (the PatchGAN cell)."""
    w_hat, u, v = spectral_norm_weight(
        p[f"{key}.weight_bar"], p[f"{key}.weight_u"], p[f"{key}.weight_v"])
    updates[f"{key}.weight_u"] = u
    updates[f"{key}.weight_v"] = v
    out = jax.lax.conv_general_dilated(
        x, jnp.transpose(w_hat, (2, 3, 1, 0)), (stride, stride),
        ((1, 1), (1, 1)), dimension_numbers=_DN)
    if bias:
        out = out + p[f"{key}.bias"].astype(out.dtype)
    return out


def _trunk(p: Params, x: jnp.ndarray,
           updates: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    for key, _, _, stride in TRUNK:
        x = jax.nn.leaky_relu(_sn_conv(p, key, x, stride, updates), 0.01)
    return x


@_parity_precision
def cpdis_forward(p: Params, x: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """(B, H, W, 3) -> ((B, H', W', 1) patch logits, u/v state updates)."""
    updates: Dict[str, jnp.ndarray] = {}
    h = _trunk(p, x, updates)
    return _sn_conv(p, "conv1", h, 1, updates, bias=False), updates


@_parity_precision
def cpdis_cls_forward(p: Params, x: jnp.ndarray, label: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                 Dict[str, jnp.ndarray]]:
    """(B, H, W, 3), (B,) int labels -> (patch logits, (B, 7) margin
    logits, u/v state updates). Mirrors CPDis_cls.forward
    (c2pDis.py:220-235)."""
    updates: Dict[str, jnp.ndarray] = {}
    h = _trunk(p, x, updates)
    pooled = jnp.mean(h, axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d(1)
    feat = jax.lax.conv_general_dilated(
        pooled, jnp.transpose(p["classifier_conv.weight"], (2, 3, 1, 0)),
        (1, 1), "VALID", dimension_numbers=_DN)
    feat = (feat + p["classifier_conv.bias"]).reshape(x.shape[0], -1)
    out_cls = margin_cosine_product(feat, p["classifier.weight"], label)
    return _sn_conv(p, "conv1", h, 1, updates, bias=False), out_cls, updates


# ---------------------------------------------------------------------------
# Margin-product heads (c2pDis.py:9-131). weight stays in the torch
# (out_features, in_features) layout; everything is one MXU matmul + masks.
# ---------------------------------------------------------------------------

def cosine_sim(x1: jnp.ndarray, x2: jnp.ndarray,
               eps: float = 1e-8) -> jnp.ndarray:
    """Reference cosine_sim (c2pDis.py:9-13): (B, D), (K, D) -> (B, K)."""
    ip = x1 @ x2.T
    w1 = jnp.linalg.norm(x1, axis=1)
    w2 = jnp.linalg.norm(x2, axis=1)
    return ip / jnp.maximum(jnp.outer(w1, w2), eps)


def _one_hot(label: jnp.ndarray, k: int) -> jnp.ndarray:
    return jax.nn.one_hot(label.reshape(-1), k, dtype=jnp.float32)


def margin_cosine_product(x: jnp.ndarray, weight: jnp.ndarray,
                          label: jnp.ndarray, s: float = 30.0,
                          m: float = 0.40) -> jnp.ndarray:
    """CosFace margin (c2pDis.py:15-45): s * (cos - one_hot * m)."""
    cosine = cosine_sim(x, weight)
    return s * (cosine - _one_hot(label, weight.shape[0]) * m)


def _f_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize(dim=1): x / clamp_min(||x||, eps)."""
    n = jnp.linalg.norm(x, axis=1, keepdims=True)
    return x / jnp.maximum(n, eps)


def arc_margin_product(x: jnp.ndarray, weight: jnp.ndarray,
                       label: jnp.ndarray, s: float = 32.0, m: float = 0.50,
                       easy_margin: bool = False) -> jnp.ndarray:
    """ArcFace margin (c2pDis.py:54-90): additive angular margin m."""
    cosine = _f_normalize(x) @ _f_normalize(weight).T
    sine = jnp.sqrt(1.0 - cosine ** 2)
    phi = cosine * math.cos(m) - sine * math.sin(m)
    if easy_margin:
        phi = jnp.where(cosine > 0, phi, cosine)
    else:
        th = math.cos(math.pi - m)
        mm = math.sin(math.pi - m) * m
        phi = jnp.where(cosine - th > 0, phi, cosine - mm)
    one_hot = _one_hot(label, weight.shape[0])
    return (one_hot * phi + (1.0 - one_hot) * cosine) * s


def multi_margin_product(x: jnp.ndarray, weight: jnp.ndarray,
                         label: jnp.ndarray, s: float = 32.0,
                         m1: float = 0.20, m2: float = 0.35,
                         easy_margin: bool = False) -> jnp.ndarray:
    """Combined angular (m1) + cosine (m2) margin (c2pDis.py:93-131)."""
    cosine = _f_normalize(x) @ _f_normalize(weight).T
    sine = jnp.sqrt(1.0 - cosine ** 2)
    phi = cosine * math.cos(m1) - sine * math.sin(m1)
    if easy_margin:
        phi = jnp.where(cosine > 0, phi, cosine)
    else:
        th = math.cos(math.pi - m1)
        mm = math.sin(math.pi - m1) * m1
        phi = jnp.where(cosine - th > 0, phi, cosine - mm)
    one_hot = _one_hot(label, weight.shape[0])
    out = one_hot * phi + (1.0 - one_hot) * cosine
    return (out - one_hot * m2) * s
