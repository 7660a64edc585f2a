"""Checkpoint conversion: torch .pth state_dicts -> JAX param dicts.

Key layout is preserved verbatim (flat string keys); only tensor layouts
change:
  * Conv2d (O, I, kh, kw)        -> HWIO (kh, kw, I, O)
  * Linear (O, I)                -> (I, O)
  * ModulationConvBlock.weight   -> raw C-order reshape to (k, k, I, O),
    matching the reference's ``.view(1, k, k, in, out)`` buffer
    reinterpretation (/root/reference/models/basic_layer.py:32)
  * VGG feature weights from the standalone vgg19 checkpoint map to
    ``vgg.<idx>.*`` (only indices <= 19 — conv4_1 — are needed at inference)

Converted pytrees are cached as .npz next to the source checkpoints so torch
is only needed once.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict

import numpy as np

VGG_MAX_INDEX = 19  # conv4_1 — deepest tap used at inference


def _convert_tensor(key: str, w: np.ndarray) -> np.ndarray:
    if w.ndim == 4:
        if ".mod_conv_" in key:
            o, i, kh, kw = w.shape
            return np.ascontiguousarray(w.reshape(kh, kw, i, o))
        return np.ascontiguousarray(w.transpose(2, 3, 1, 0))
    if w.ndim == 2:
        return np.ascontiguousarray(w.T)
    return np.ascontiguousarray(w)


def convert_generator_state(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Convert the C2PGen ('160_net_G_A.pth') state dict."""
    out = {}
    for k, v in state.items():
        v = np.asarray(v, dtype=np.float32)
        if k.startswith("PBEnc.vgg."):
            idx = int(k.split(".")[2])
            if idx > VGG_MAX_INDEX:
                continue
            out[f"vgg.{idx}.{k.split('.')[-1]}"] = _convert_tensor(k, v)
            continue
        if "running_" in k or "num_batches_tracked" in k:
            continue
        out[k] = _convert_tensor(k, v)
    return out


def convert_aliasnet_state(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        if "running_" in k or "num_batches_tracked" in k:
            continue
        out[k] = _convert_tensor(k, np.asarray(v, dtype=np.float32))
    return out


def convert_vgg19_state(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Convert the standalone pixelart_vgg19.pth (full torchvision vgg19)."""
    out = {}
    for k, v in state.items():
        if not k.startswith("features."):
            continue
        idx = int(k.split(".")[1])
        if idx > VGG_MAX_INDEX:
            continue
        out[f"vgg.{idx}.{k.split('.')[-1]}"] = _convert_tensor(
            k, np.asarray(v, dtype=np.float32))
    return out


def convert_p2cgen_state(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Convert a P2CGen state dict (plain convs + LayerNorm affines)."""
    return convert_aliasnet_state(state)


def convert_discriminator_state(state: Dict[str, np.ndarray]
                                ) -> Dict[str, np.ndarray]:
    """Convert a CPDis / CPDis_cls state dict: tensors pass through
    UNTRANSPOSED. The spectral-norm power iteration is defined on the
    (O, I*kh*kw) flattening of the torch-layout weight_bar
    (/root/reference/models/c2pDis.py:248-254), so models/discriminator.py
    keeps torch layouts throughout (incl. classifier_conv OIHW and the
    (out, in) margin weight) and relayouts inside the jitted program."""
    return {k: np.ascontiguousarray(np.asarray(v, dtype=np.float32))
            for k, v in state.items()}


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    import torch

    state = torch.load(path, weights_only=True, map_location="cpu")
    return {k: v.numpy() for k, v in state.items()}


def convert_checkpoints(ckpt_dir: str, cache: bool = True):
    """Load + convert the three checkpoints; returns (gen_params,
    alias_params) with the VGG weights merged into the generator params.
    Uses/writes an .npz cache so torch is only needed the first time."""
    d = Path(ckpt_dir)
    cache_path = d / "dither_pie_tpu_params.npz"
    if cache_path.exists():
        data = np.load(cache_path)
        gen = {k[4:]: data[k] for k in data.files if k.startswith("gen:")}
        alias = {k[6:]: data[k] for k in data.files if k.startswith("alias:")}
        return gen, alias

    gen = convert_generator_state(load_torch_state(str(d / "160_net_G_A.pth")))
    # The standalone VGG checkpoint is authoritative for the feature taps
    # (the reference loads it inside PixelBlockEncoder.__init__).
    gen.update(convert_vgg19_state(load_torch_state(str(d / "pixelart_vgg19.pth"))))
    alias = convert_aliasnet_state(load_torch_state(str(d / "alias_net.pth")))

    if cache:
        try:
            np.savez(cache_path,
                     **{f"gen:{k}": v for k, v in gen.items()},
                     **{f"alias:{k}": v for k, v in alias.items()})
        except Exception:
            pass
    return gen, alias


def find_checkpoint_dir() -> str:
    """Search order: $DITHER_PIE_TPU_CKPT_DIR, cwd, the package parent."""
    candidates = []
    env = os.environ.get("DITHER_PIE_TPU_CKPT_DIR")
    if env:
        candidates.append(env)
    candidates += [".", str(Path(__file__).resolve().parents[2])]
    for c in candidates:
        if (Path(c) / "160_net_G_A.pth").exists() or \
                (Path(c) / "dither_pie_tpu_params.npz").exists():
            return c
    raise FileNotFoundError(
        "Neural pixelizer checkpoints not found. Place 160_net_G_A.pth, "
        "alias_net.pth and pixelart_vgg19.pth in the working directory or "
        "set DITHER_PIE_TPU_CKPT_DIR. (The reference distributes them "
        "out-of-band — see its README 'Download pretrained models'.)")
