"""Public dithering API: enums, strategy classes, and the ImageDitherer facade.

Mirrors the reference library surface (/root/reference/dithering_lib.py) —
same mode names, same parameter metadata (which drives both the CLI
``parameters`` section and auto-generated GUI settings panels), same
defaults, same gamma-path quirks — while every strategy dispatches to
TPU-native compute:

* none / bayer / blue_noise / IGN / polka_dot / wavelet / halftone run as
  fused jitted XLA programs (ops/ordered.py, ops/halftone.py, ops/wavelet.py);
* the error-diffusion family (error_diffusion, ostromoukhov, hybrid,
  perceptual, adaptive_variance) runs as a Pallas anti-diagonal wavefront
  kernel on accelerators and a native C++ scan otherwise (api/runtime.py);
* riemersma (Hilbert scan) is a 1-D dependency chain and always runs native.
"""

from __future__ import annotations

import functools
import os
from enum import Enum
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from dither_pie_tpu.core import colors as _colors
from dither_pie_tpu.core import palette as _palette
from dither_pie_tpu.core import thresholds as _thresholds
from dither_pie_tpu.core.distance import map_to_palette
from dither_pie_tpu.ops import adaptive as _adaptive
from dither_pie_tpu.ops import ed_host as _ed_host
from dither_pie_tpu.ops import ed_kernels as _ed_kernels
from dither_pie_tpu.ops import halftone as _halftone
from dither_pie_tpu.ops import ordered as _ordered
from dither_pie_tpu.ops import wavelet as _wavelet
from dither_pie_tpu.api import linkspeed as _linkspeed
from dither_pie_tpu.api import runtime as _runtime


def _auto_mesh_enabled() -> bool:
    from dither_pie_tpu.parallel.auto import auto_mesh_enabled

    return auto_mesh_enabled()


# -------------------- Enumerations --------------------


class DitherMode(Enum):
    """Available dithering algorithms (names are the config-file vocabulary)."""

    NONE = "none"
    BAYER = "bayer"
    ERROR_DIFFUSION = "error_diffusion"
    RIEMERSMA = "riemersma"
    BLUE_NOISE = "blue_noise"
    INTERLEAVED_GRADIENT_NOISE = "IGN"
    POLKA_DOT = "polka_dot"
    WAVELET = "wavelet"
    ADAPTIVE_VARIANCE = "adaptive_variance"
    PERCEPTUAL = "perceptual"
    HYBRID = "hybrid"
    HALFTONE = "halftone"
    OSTROMOUKHOV = "ostromoukhov"


class PixelizeMethod(Enum):
    NONE = "none"
    REGULAR = "regular"
    NEURAL = "neural"


class PaletteSource(Enum):
    MEDIAN_CUT = "median_cut"
    KMEANS = "kmeans"
    UNIFORM = "uniform"
    CUSTOM = "custom"
    FROM_FILE = "file"


# -------------------- Error diffusion kernel facade --------------------


class ErrorDiffusionKernel:
    """Named access to the classic kernel tables (see ops/ed_kernels.py)."""

    FLOYD_STEINBERG = _ed_kernels.KERNELS["floyd_steinberg"]
    JJN = _ed_kernels.KERNELS["jjn"]
    STUCKI = _ed_kernels.KERNELS["stucki"]
    BURKES = _ed_kernels.KERNELS["burkes"]
    ATKINSON = _ed_kernels.KERNELS["atkinson"]
    SIERRA = _ed_kernels.KERNELS["sierra"]
    SIERRA_TWO_ROW = _ed_kernels.KERNELS["sierra_two_row"]
    SIERRA_LITE = _ed_kernels.KERNELS["sierra_lite"]

    @classmethod
    def get_kernel(cls, name: str) -> Dict[str, Any]:
        return _ed_kernels.get_kernel(name)

    @classmethod
    def list_kernels(cls) -> List[str]:
        return list(_ed_kernels.KERNEL_NAMES)


# -------------------- DitherUtils --------------------


class DitherUtils:
    """Threshold matrices + gamma transfer helpers (host-side NumPy)."""

    BAYER2x2 = _thresholds.BAYER2x2
    BAYER4x4 = _thresholds.BAYER4x4
    BAYER8x8 = _thresholds.BAYER8x8
    BAYER16x16 = _thresholds.BAYER16x16
    PSX4x4 = _thresholds.PSX4x4

    @staticmethod
    def get_threshold_matrix(mode: "DitherMode", size: str = "4x4") -> np.ndarray:
        if mode == DitherMode.NONE:
            return np.ones((1, 1), dtype=np.float32)
        elif mode == DitherMode.BAYER:
            return _thresholds.bayer_matrix(size)
        raise ValueError(f"Unsupported matrix mode: {mode}")

    @staticmethod
    def srgb_to_linear(c: np.ndarray) -> np.ndarray:
        return _colors.srgb_to_linear_np(c)

    @staticmethod
    def linear_to_srgb(c: np.ndarray) -> np.ndarray:
        return _colors.linear_to_srgb_np(c)


# -------------------- Strategy base --------------------


class BaseDitherStrategy:
    """Interface: ``dither(pixels (N,3) f32, palette (P,3) f32, (h, w)) ->
    (N,3) f32``; parameter metadata drives auto-generated settings UIs and
    the CLI ``parameters`` section."""

    def dither(self, pixels: np.ndarray, palette_arr: np.ndarray,
               image_size: Tuple[int, int]) -> np.ndarray:
        raise NotImplementedError

    def dither_batch(self, images: np.ndarray, palette_arr: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) f32 -> (B, H, W, 3) f32. Default: per-frame loop;
        strategies with device batch kernels override this (the video
        pipeline's throughput path)."""
        b, h, w, _ = images.shape
        out = np.empty_like(images)
        for i in range(b):
            out[i] = self.dither(images[i].reshape(-1, 3), palette_arr,
                                 (h, w)).reshape(h, w, 3)
        return out

    @staticmethod
    def get_parameter_info() -> Optional[Dict[str, Any]]:
        return None

    def get_current_parameters(self) -> Dict[str, Any]:
        return {}


def _prep(pixels: np.ndarray, palette_arr: np.ndarray, image_size: Tuple[int, int]):
    _runtime.jax_platform()  # resolve backend (with CPU fallback) before jnp use
    h, w = image_size
    img = np.asarray(pixels, dtype=np.float32).reshape(h, w, 3)
    pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
    return img, pal


def _ordered_batch_dispatch(images, pal, screen) -> np.ndarray:
    """Batched ordered dither with the opt-in local auto-mesh
    (DITHER_PIE_TPU_AUTO_MESH=1): frames shard over every local device,
    each running the same fused kernel; falls through to single-device
    dispatch otherwise. Bit-identical either way."""
    from dither_pie_tpu.parallel.auto import maybe_sharded_ordered

    out = maybe_sharded_ordered(np.asarray(images), jnp.asarray(pal),
                                jnp.asarray(screen))
    if out is None:
        out = _ordered.dispatch_ordered_batch(
            jnp.asarray(images), jnp.asarray(pal), jnp.asarray(screen))
    return np.asarray(out).astype(np.float32)


def _ordered_batch_indices(images, pal, screen):
    """(B, H, W) u8 palette indices from the ordered kernels (the index
    transfer path — see ImageDitherer.apply_dithering_batch). Palettes
    <= 16 colors bit-pack on device before the D2H move (ops/idxpack.py,
    exact round trip)."""
    from dither_pie_tpu.ops.idxpack import packed_transfer

    idx = _ordered.dispatch_ordered_batch(
        jnp.asarray(images), jnp.asarray(pal), jnp.asarray(screen),
        return_indices=True)
    return packed_transfer(idx, len(pal), int(np.asarray(images).shape[2]))


class NoDitherStrategy(BaseDitherStrategy):
    """Nearest palette color per pixel (device argmin over exact distances)."""

    def dither(self, pixels, palette_arr, image_size):
        _, pal = _prep(pixels, palette_arr, image_size)
        out = map_to_palette(jnp.asarray(pixels, dtype=jnp.float32), jnp.asarray(pal))
        return np.asarray(out, dtype=np.float32)

    def dither_batch(self, images, palette_arr):
        # Nearest-color IS an ordered dither with a saturated screen: the
        # selection factor d1/(d1+d2) <= 0.5, so screen = 1 always picks
        # the nearest (same exact integer distances, same lowest-index
        # tie-break as map_to_palette — bit-identical), and the batch
        # rides the fused GPix/s kernel instead of materializing an
        # (N, 3) f32 tensor (42x tile padding on TPU).
        b, h, w, _ = images.shape
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        screen = jnp.ones((h, w), jnp.float32)
        return _ordered_batch_dispatch(images, pal, screen)

    def dither_batch_indices(self, images, palette_arr, planar=False):
        if planar or len(palette_arr) > 256:
            return None
        b, h, w, _ = images.shape
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        screen = jnp.ones((h, w), jnp.float32)
        return _ordered_batch_indices(images, pal, screen)


# -------------------- Ordered (threshold screen) strategies --------------------


class MatrixDitherStrategy(BaseDitherStrategy):
    """Distance-ratio ordered dithering against a tiled threshold matrix.

    Note: this is the reference's distance-ratio form (factor = d1^2 /
    (d1^2 + d2^2) compared against the screen), not the textbook
    add-threshold-then-quantize form — reproducing it is required for output
    parity (/root/reference/dithering_lib.py:346-378).
    """

    def __init__(self, threshold_matrix: np.ndarray):
        self.threshold_matrix = np.asarray(threshold_matrix, dtype=np.float32)

    def dither(self, pixels, palette_arr, image_size):
        img, pal = _prep(pixels, palette_arr, image_size)
        h, w = image_size
        screen = _ordered.screen_for_matrix(self.threshold_matrix, h, w)
        out = _ordered.dispatch_ordered_batch(
            jnp.asarray(img)[None], jnp.asarray(pal), screen)[0]
        return np.asarray(out, dtype=np.float32).reshape(-1, 3)

    def dither_batch(self, images, palette_arr):
        b, h, w, _ = images.shape
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        screen = _ordered.screen_for_matrix(self.threshold_matrix, h, w)
        return _ordered_batch_dispatch(images, pal, screen)

    def dither_batch_indices(self, images, palette_arr, planar=False):
        if planar or len(palette_arr) > 256:
            return None  # NHWC-only; u8 index stream
        b, h, w, _ = images.shape
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        screen = _ordered.screen_for_matrix(self.threshold_matrix, h, w)
        return _ordered_batch_indices(images, pal, screen)


class BayerDitherStrategy(MatrixDitherStrategy):
    """Bayer ordered dithering with configurable matrix size."""

    @staticmethod
    def get_parameter_info() -> Dict[str, Any]:
        return {
            "size": {
                "type": "choice",
                "default": "4x4",
                "choices": ["2x2", "4x4", "8x8", "16x16", "psx4x4"],
                "label": "Matrix",
                "description": "Bayer matrix size or PSX 4x4 variant (larger = finer patterns)",
            }
        }

    def __init__(self, size: str = "4x4"):
        self.size = size
        super().__init__(_thresholds.bayer_matrix(size))

    def get_current_parameters(self) -> Dict[str, Any]:
        return {"size": self.size}


class BlueNoiseDitherStrategy(MatrixDitherStrategy):
    """Blue-noise ordered dithering (cached generated matrices)."""

    _cache = _thresholds._BLUE_NOISE_CACHE  # shared per-process cache

    @staticmethod
    def get_parameter_info() -> Dict[str, Any]:
        return {
            "size": {
                "type": "int",
                "default": 64,
                "min": 32,
                "max": 128,
                "label": "Matrix Size",
                "description": "Size of the blue noise matrix (larger = more detail but slower)",
            },
            "seed": {
                "type": "int",
                "default": 42,
                "min": 0,
                "max": 9999,
                "label": "Random Seed",
                "description": "Seed for noise generation (different seeds = different patterns)",
            },
        }

    def __init__(self, size: int = 64, seed: int = 42):
        self.size = int(size)
        self.seed = int(seed)
        super().__init__(_thresholds.blue_noise_cached(self.size, self.seed))

    def get_current_parameters(self) -> Dict[str, Any]:
        return {"size": self.size, "seed": self.seed}


class InterleavedGradientNoiseDitherStrategy(BaseDitherStrategy):
    """IGN per-pixel threshold dithering (computed screen, no tile)."""

    @staticmethod
    def get_parameter_info() -> Dict[str, Any]:
        return {
            "scale": {
                "type": "float",
                "default": 1.0,
                "min": 0.1,
                "max": 10.0,
                "step": 0.1,
                "label": "Scale",
                "description": "Noise frequency (lower = larger pattern, higher = finer grain)",
            },
            "seed": {
                "type": "int",
                "default": 0,
                "min": 0,
                "max": 9999,
                "label": "Seed",
                "description": "Deterministic offset to shift the pattern",
            },
        }

    def __init__(self, scale: float = 1.0, seed: int = 0):
        self.scale = float(scale)
        self.seed = int(seed)

    def dither(self, pixels, palette_arr, image_size):
        img, pal = _prep(pixels, palette_arr, image_size)
        h, w = image_size
        screen = _thresholds.ign_thresholds(h, w, self.scale, self.seed)
        out = _ordered.dispatch_ordered_batch(
            jnp.asarray(img)[None], jnp.asarray(pal), screen)[0]
        return np.asarray(out, dtype=np.float32).reshape(-1, 3)

    def dither_batch(self, images, palette_arr):
        b, h, w, _ = images.shape
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        screen = _thresholds.ign_thresholds(h, w, self.scale, self.seed)
        return _ordered_batch_dispatch(images, pal, screen)

    def dither_batch_indices(self, images, palette_arr, planar=False):
        if planar or len(palette_arr) > 256:
            return None  # NHWC-only; u8 index stream
        b, h, w, _ = images.shape
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        screen = _thresholds.ign_thresholds(h, w, self.scale, self.seed)
        return _ordered_batch_indices(images, pal, screen)

    def get_current_parameters(self) -> Dict[str, Any]:
        return {"scale": self.scale, "seed": self.seed}


class PolkaDotDitherStrategy(MatrixDitherStrategy):
    """Polka-dot radial threshold tiles."""

    @staticmethod
    def get_parameter_info() -> Dict[str, Any]:
        return {
            "tile_size": {
                "type": "int",
                "default": 8,
                "min": 4,
                "max": 32,
                "label": "Tile Size",
                "description": "Size of the repeating dot pattern",
            },
            "gamma": {
                "type": "float",
                "default": 1.5,
                "min": 0.5,
                "max": 3.0,
                "step": 0.1,
                "label": "Gamma",
                "description": "Controls dot shape curve (higher = sharper edges)",
            },
        }

    def __init__(self, tile_size: int = 8, gamma: float = 1.5):
        self.tile_size = int(tile_size)
        self.gamma = float(gamma)
        super().__init__(_thresholds.polka_dot_matrix(self.tile_size, self.gamma))

    def get_current_parameters(self) -> Dict[str, Any]:
        return {"tile_size": self.tile_size, "gamma": self.gamma}


# -------------------- Error-diffusion family --------------------


def _require_planar_wavefront(serpentine: bool = False):
    """The planar batch path has no host fallback (it exists purely to feed
    the packed wavefront kernel zero-copy); callers gate on
    ImageDitherer.supports_planar_batch first."""
    wf = None if serpentine else _wavefront_or_none()
    if wf is None:
        raise RuntimeError("planar batches require the wavefront device "
                           "path (non-serpentine, JAX available)")
    return wf


def _wf_batch_indices(images, pal, mode, planar, serpentine=False, **kw):
    """Shared index-emitting batch dispatch: (B, H, W) palette indices
    from the packed wavefront kernel — uint8 to 256 colors, uint16 to
    1024: a third (resp. two thirds) of the device->host bytes of the
    RGB path; ``palette_u8[idx]`` on the host reproduces the color
    output exactly. Returns None when the wavefront path is
    unavailable."""
    wf = None if serpentine else _wavefront_or_none()
    if wf is None or len(pal) > wf.PACKED_PALETTE_MAX:
        return None
    return wf.ed_batch_wavefront(np.asarray(images), pal, mode,
                                 planar=planar, return_indices=True, **kw)


def _wavefront_or_none():
    """Late import so the Pallas module is optional during bring-up."""
    if _runtime.ed_backend() != "wavefront":
        return None
    try:
        from dither_pie_tpu.ops import wavefront as _wf

        return _wf
    except Exception:
        return None


def _native_thread_cap() -> int:
    """Worker cap for the threaded native-engine frame map: every core
    (the ctypes calls release the GIL for the whole scan, so the map
    scales with physical parallelism), overridable via
    DITHER_PIE_TPU_NATIVE_THREADS. Measured by tools/serpentine_scaling.py."""
    import os

    env = os.environ.get("DITHER_PIE_TPU_NATIVE_THREADS")
    if env:
        return max(1, int(env))
    return max(1, os.cpu_count() or 1)


def _threaded_frames(fn, items, like):
    """Run a per-frame native-engine call across frames with threads (the
    ctypes calls release the GIL). ``items`` is a sequence of per-frame
    inputs; ``like`` an array providing the output shape/dtype."""
    from concurrent.futures import ThreadPoolExecutor

    out = np.empty_like(like)
    with ThreadPoolExecutor(
            max_workers=min(_native_thread_cap(), len(items))) as ex:
        for i, res in enumerate(ex.map(fn, items)):
            out[i] = res
    return out


class ErrorDiffusionDitherStrategy(BaseDitherStrategy):
    """Unified 8-variant fixed-weight error diffusion."""

    @staticmethod
    def get_parameter_info() -> Dict[str, Any]:
        return {
            "variant": {
                "type": "choice",
                "default": "atkinson",
                "choices": ErrorDiffusionKernel.list_kernels(),
                "label": "Algorithm",
                "description": "Error diffusion algorithm variant",
            },
            "serpentine": {
                "type": "choice",
                "default": "false",
                "choices": ["true", "false"],
                "label": "Serpentine Scan",
                "description": "Alternates direction each row to reduce artifacts",
            },
        }

    def __init__(self, variant: str = "atkinson", serpentine: str = "false"):
        self.variant = variant
        self.serpentine = serpentine == "true"
        self._kernel = ErrorDiffusionKernel.get_kernel(variant)

    def get_current_parameters(self) -> Dict[str, Any]:
        return {"variant": self.variant,
                "serpentine": "true" if self.serpentine else "false"}

    def dither(self, pixels, palette_arr, image_size):
        img, pal = _prep(pixels, palette_arr, image_size)
        wf = None if self.serpentine else _wavefront_or_none()
        if wf is not None:
            out = wf.ed_fixed_wavefront(img, pal, self.variant)
        else:
            out = _ed_host.ed_fixed(img, pal, self.variant, self.serpentine)
        return np.asarray(out, dtype=np.float32).reshape(-1, 3)

    def dither_batch(self, images, palette_arr):
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        wf = None if self.serpentine else _wavefront_or_none()
        if wf is not None:
            # DITHER_PIE_TPU_AUTO_MESH=1 shards the batch over every local
            # chip inside ed_batch_wavefront (parallel/auto.py).
            return wf.ed_batch_wavefront(np.asarray(images), pal,
                                         "fixed", self.variant)
        # Serpentine video batches take the SIMD f32 fast path (reference
        # Numba-path semantics); single images keep the exact engine.
        return _threaded_frames(
            lambda im: _ed_host.ed_fixed_fast(im.astype(np.float32).copy(),
                                              pal, self.variant,
                                              self.serpentine),
            list(images), images)

    def dither_batch_planar(self, planes, palette_arr):
        """(3, B, H, W) channel-major planes in, planes out — the zero-copy
        ffmpeg-gbrp video flow (wavefront packed kernel only)."""
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        wf = _require_planar_wavefront(self.serpentine)
        return wf.ed_batch_wavefront(np.asarray(planes), pal, "fixed",
                                     self.variant, planar=True)

    def dither_batch_indices(self, images, palette_arr, planar=False):
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        return _wf_batch_indices(images, pal, "fixed", planar,
                                 serpentine=self.serpentine,
                                 variant=self.variant)


class OstromoukhovDitherStrategy(BaseDitherStrategy):
    """Ostromoukhov variable-coefficient error diffusion (SIGGRAPH 2001)."""

    COEFFS_TABLE = _ed_kernels.OSTROMOUKHOV_TABLE

    @staticmethod
    def get_parameter_info() -> Dict[str, Any]:
        return {
            "serpentine": {
                "type": "choice",
                "default": "false",
                "choices": ["true", "false"],
                "label": "Serpentine Scan",
                "description": "Alternates direction each row to reduce artifacts",
            }
        }

    def __init__(self, serpentine: str = "false"):
        self.serpentine = serpentine == "true"

    def get_current_parameters(self) -> Dict[str, Any]:
        return {"serpentine": "true" if self.serpentine else "false"}

    def dither(self, pixels, palette_arr, image_size):
        img, pal = _prep(pixels, palette_arr, image_size)
        wf = None if self.serpentine else _wavefront_or_none()
        if wf is not None:
            out = wf.ed_ostromoukhov_wavefront(img, pal)
        else:
            out = _ed_host.ed_ostromoukhov(img, pal, self.serpentine)
        return np.asarray(out, dtype=np.float32).reshape(-1, 3)

    def dither_batch(self, images, palette_arr):
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        wf = None if self.serpentine else _wavefront_or_none()
        if wf is not None:
            return wf.ed_batch_wavefront(np.asarray(images), pal, "ostromoukhov")
        return _threaded_frames(
            lambda im: _ed_host.ed_ostromoukhov_fast(
                im.astype(np.float32).copy(), pal, self.serpentine),
            list(images), images)

    def dither_batch_planar(self, planes, palette_arr):
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        wf = _require_planar_wavefront(self.serpentine)
        return wf.ed_batch_wavefront(np.asarray(planes), pal,
                                     "ostromoukhov", planar=True)

    def dither_batch_indices(self, images, palette_arr, planar=False):
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        return _wf_batch_indices(images, pal, "ostromoukhov", planar,
                                 serpentine=self.serpentine)


class HybridDitherStrategy(BaseDitherStrategy):
    """Luminance/chroma-split Floyd-Steinberg diffusion."""

    @staticmethod
    def get_parameter_info() -> Dict[str, Any]:
        return {
            "lum_factor": {
                "type": "float",
                "default": 1.0,
                "min": 0.0,
                "max": 2.0,
                "step": 0.1,
                "label": "Luminance Factor",
                "description": "Strength of luminance error diffusion (1.0 = full, 0.0 = none)",
            },
            "col_factor": {
                "type": "float",
                "default": 0.2,
                "min": 0.0,
                "max": 2.0,
                "step": 0.1,
                "label": "Color Factor",
                "description": "Strength of color error diffusion (lower = less color noise)",
            },
        }

    def __init__(self, lum_factor: float = 1.0, col_factor: float = 0.2):
        self.lum_factor = float(lum_factor)
        self.col_factor = float(col_factor)

    def get_current_parameters(self) -> Dict[str, Any]:
        return {"lum_factor": self.lum_factor, "col_factor": self.col_factor}

    def dither(self, pixels, palette_arr, image_size):
        img, pal = _prep(pixels, palette_arr, image_size)
        wf = _wavefront_or_none()
        if wf is not None:
            out = wf.ed_hybrid_wavefront(img, pal, self.lum_factor, self.col_factor)
        else:
            out = _ed_host.ed_hybrid(img, pal, self.lum_factor, self.col_factor)
        return np.asarray(out, dtype=np.float32).reshape(-1, 3)

    def dither_batch(self, images, palette_arr):
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        wf = _wavefront_or_none()
        if wf is not None:
            return wf.ed_batch_wavefront(np.asarray(images), pal, "hybrid",
                                         lum_factor=self.lum_factor,
                                         col_factor=self.col_factor)
        # Video batches: SIMD f32 fast twin (reference Numba semantics),
        # threaded across frames — same convention as the fixed/ostro paths.
        return _threaded_frames(
            lambda im: _ed_host.ed_hybrid_fast(im.astype(np.float32).copy(),
                                               pal, self.lum_factor,
                                               self.col_factor),
            list(images), images)

    def dither_batch_planar(self, planes, palette_arr):
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        wf = _require_planar_wavefront()
        return wf.ed_batch_wavefront(np.asarray(planes), pal, "hybrid",
                                     lum_factor=self.lum_factor,
                                     col_factor=self.col_factor, planar=True)

    def dither_batch_indices(self, images, palette_arr, planar=False):
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        return _wf_batch_indices(images, pal, "hybrid", planar,
                                 lum_factor=self.lum_factor,
                                 col_factor=self.col_factor)


class PerceptualDitherStrategy(BaseDitherStrategy):
    """FS diffusion with luminance-scaled error weights (no parameters)."""

    def __init__(self, base_weights=None):
        # Kept for API parity; the default FS weights are baked into the
        # native/wavefront kernels.
        self.base_weights = base_weights or [
            (1, 0, 7 / 16), (-1, 1, 3 / 16), (0, 1, 5 / 16), (1, 1, 1 / 16)
        ]

    def dither(self, pixels, palette_arr, image_size):
        img, pal = _prep(pixels, palette_arr, image_size)
        wf = _wavefront_or_none()
        if wf is not None:
            out = wf.ed_perceptual_wavefront(img, pal)
        else:
            out = _ed_host.ed_perceptual(img, pal)
        return np.asarray(out, dtype=np.float32).reshape(-1, 3)

    def dither_batch(self, images, palette_arr):
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        wf = _wavefront_or_none()
        if wf is not None:
            return wf.ed_batch_wavefront(np.asarray(images), pal, "perceptual")
        # Video batches: SIMD f32 fast twin, threaded (see HybridDither).
        return _threaded_frames(
            lambda im: _ed_host.ed_perceptual_fast(
                im.astype(np.float32).copy(), pal),
            list(images), images)

    def dither_batch_planar(self, planes, palette_arr):
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        wf = _require_planar_wavefront()
        return wf.ed_batch_wavefront(np.asarray(planes), pal, "perceptual",
                                     planar=True)

    def dither_batch_indices(self, images, palette_arr, planar=False):
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        return _wf_batch_indices(images, pal, "perceptual", planar)


class AdaptiveVarianceDitherStrategy(BaseDitherStrategy):
    """FS diffusion gated by local grayscale variance."""

    @staticmethod
    def get_parameter_info() -> Dict[str, Any]:
        return {
            "var_threshold": {
                "type": "float",
                "default": 300.0,
                "min": 0.0,
                "max": 1000.0,
                "step": 10.0,
                "label": "Variance Threshold",
                "description": "Threshold for local variance to trigger error diffusion",
            },
            "window_radius": {
                "type": "int",
                "default": 1,
                "min": 1,
                "max": 5,
                "label": "Window Radius",
                "description": "Radius of window for computing local variance",
            },
        }

    def __init__(self, var_threshold: float = 300.0, window_radius: int = 1):
        self.var_threshold = float(var_threshold)
        self.window_radius = int(window_radius)

    def get_current_parameters(self) -> Dict[str, Any]:
        return {"var_threshold": self.var_threshold, "window_radius": self.window_radius}

    def dither(self, pixels, palette_arr, image_size):
        img, pal = _prep(pixels, palette_arr, image_size)
        gray = (np.float32(0.299) * img[:, :, 0] + np.float32(0.587) * img[:, :, 1]
                + np.float32(0.114) * img[:, :, 2])
        var_map = _adaptive.variance_map_np(gray, self.window_radius)
        gate = var_map >= self.var_threshold
        wf = _wavefront_or_none()
        if wf is not None:
            out = wf.ed_adaptive_wavefront(img, pal, gate)
        else:
            out = _ed_host.ed_adaptive(img, pal, gate)
        return np.asarray(out, dtype=np.float32).reshape(-1, 3)

    def _gates(self, images):
        gray = (np.float32(0.299) * images[..., 0] + np.float32(0.587) * images[..., 1]
                + np.float32(0.114) * images[..., 2])
        return np.stack([
            _adaptive.variance_map_np(g, self.window_radius) >= self.var_threshold
            for g in gray]).astype(np.float32)

    def dither_batch(self, images, palette_arr):
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        gates = self._gates(images)
        wf = _wavefront_or_none()
        if wf is not None:
            return wf.ed_batch_wavefront(np.asarray(images), pal, "adaptive",
                                         aux=gates)
        # Video batches: SIMD f32 fast twin, threaded (see HybridDither).
        return _threaded_frames(
            lambda t: _ed_host.ed_adaptive_fast(
                t[0].astype(np.float32).copy(), pal, t[1]),
            list(zip(images, gates)), images)

    def dither_batch_planar(self, planes, palette_arr):
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        wf = _require_planar_wavefront()
        planes = np.asarray(planes)
        gray = (np.float32(0.299) * planes[0] + np.float32(0.587) * planes[1]
                + np.float32(0.114) * planes[2]).astype(np.float32)  # (B,H,W)
        gates = np.stack([
            _adaptive.variance_map_np(g, self.window_radius) >= self.var_threshold
            for g in gray]).astype(np.float32)
        return wf.ed_batch_wavefront(planes, pal, "adaptive", aux=gates,
                                     planar=True)

    def dither_batch_indices(self, images, palette_arr, planar=False):
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        images = np.asarray(images)
        if planar:
            gray = (np.float32(0.299) * images[0]
                    + np.float32(0.587) * images[1]
                    + np.float32(0.114) * images[2]).astype(np.float32)
        else:
            gray = (np.float32(0.299) * images[..., 0]
                    + np.float32(0.587) * images[..., 1]
                    + np.float32(0.114) * images[..., 2])
        gates = np.stack([
            _adaptive.variance_map_np(g, self.window_radius) >= self.var_threshold
            for g in gray]).astype(np.float32)
        return _wf_batch_indices(images, pal, "adaptive", planar, aux=gates)


class RiemersmaDitherStrategy(BaseDitherStrategy):
    """Hilbert-curve error diffusion — a 1-D dependency chain, so it runs on
    the native engine (no parameters, matching the reference).

    Host-vs-device is a MEASURED decision, not an assumption: an on-device
    ``lax.scan`` over the curve exists (ops/riemersma_scan.py, bit-identical
    to the C++ f32 twin on hardware) but loses 8-20x to the host engine at
    every shape on a v5e (240p 10.3 vs 106.5 fps, 480p 2.6 vs 22.8, 1080p
    0.19 vs 4.1 per core — tools/riemersma_ab.py, 2026-08-19): the scan's
    per-pixel step is latency-bound tiny-tensor work the VPU can't fill.
    ``DITHER_PIE_TPU_RIEMERSMA=scan`` forces the device path for
    re-measurement on future hardware/toolchains."""

    def dither(self, pixels, palette_arr, image_size):
        img, pal = _prep(pixels, palette_arr, image_size)
        if os.environ.get("DITHER_PIE_TPU_RIEMERSMA") == "scan":
            from dither_pie_tpu.ops.riemersma_scan import riemersma_scan_batch

            out = riemersma_scan_batch(img[None], pal)[0]
            return np.asarray(out, dtype=np.float32).reshape(-1, 3)
        out = _ed_host.ed_riemersma(img, pal)
        return np.asarray(out, dtype=np.float32).reshape(-1, 3)

    def dither_batch(self, images, palette_arr):
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        if os.environ.get("DITHER_PIE_TPU_RIEMERSMA") == "scan":
            from dither_pie_tpu.ops.riemersma_scan import riemersma_scan_batch

            return riemersma_scan_batch(
                np.asarray(images, np.float32), pal)
        # Video batches: SIMD f32 fast path, threaded across frames.
        return _threaded_frames(
            lambda im: _ed_host.ed_riemersma_fast(
                im.astype(np.float32).copy(), pal),
            list(images), images)


# -------------------- Wavelet --------------------


def _quant_subband_jnp(sub: "jnp.ndarray", noise: "jnp.ndarray",
                       q_levels: int) -> "jnp.ndarray":
    """Randomized uniform subband quantization (reference semantics:
    /root/reference/dithering_lib.py:899-918), f32 on device."""
    mn = jnp.min(sub)
    mx = jnp.max(sub)
    scale = mx - mn
    norm = (sub - mn) / (scale + 1e-9)
    q = jnp.floor(norm * q_levels + noise)
    q = jnp.clip(q, 0, q_levels - 1)
    qn = q / (q_levels - 1 + 1e-9)
    out = qn * scale + mn
    return jnp.where(scale == 0, sub, out)


@functools.lru_cache(maxsize=16)
def _wavelet_batch_fn(wavelet: str, q_levels: int, emit_idx: bool = False):
    """Jitted batched wavelet dither: the noise tensors are frame-invariant
    (the reference re-seeds RandomState(seed) per image), so one draw is
    shared and the whole DWT -> quantize -> IDWT -> randomized top-2 pick
    vmaps over the frame batch on device.

    ``emit_idx``: the final pick leaves the device as (B, H, W) uint8
    palette indices (the index transfer path, P <= 256)."""

    @jax.jit
    def f(imgs, pal, noises, thr):
        h, w = imgs.shape[1], imgs.shape[2]

        def one(img):
            chans = []
            for ch in range(3):
                cA, (cH, cV, cD) = _wavelet.dwt2_jnp(img[:, :, ch], wavelet)
                subs = [_quant_subband_jnp(s, noises[ch, k], q_levels)
                        for k, s in enumerate((cA, cH, cV, cD))]
                rec = _wavelet.idwt2_jnp(subs[0], (subs[1], subs[2], subs[3]),
                                         wavelet)
                chans.append(jnp.clip(rec[:h, :w], 0, 255))
            result = jnp.stack(chans, axis=-1)
            if emit_idx:
                return _ordered._ordered_indices_one(result, pal, thr)
            return _ordered.ordered_dither(result, pal, thr)

        return jax.vmap(one)(imgs.astype(jnp.float32))

    return f


class WaveletDitherStrategy(BaseDitherStrategy):
    """DWT -> randomized subband quantization -> IDWT -> randomized top-2 pick.

    Noise is drawn on host with ``np.random.RandomState(seed)`` in the exact
    order the reference draws it (per channel: cA, cH, cV, cD; then the final
    per-pixel thresholds), so results are reproducible; the transform and
    quantization math run on device.
    """

    @staticmethod
    def get_parameter_info() -> Dict[str, Any]:
        return {
            "wavelet": {
                "type": "choice",
                "default": "haar",
                "choices": ["haar", "db1", "db2", "db4", "sym2", "sym4", "coif1", "bior1.3", "bior2.2"],
                "label": "Wavelet Type",
                "description": "Type of wavelet basis function",
            },
            "subband_quant": {
                "type": "int",
                "default": 8,
                "min": 2,
                "max": 32,
                "label": "Subband Quantization",
                "description": "Number of quantization levels for wavelet subbands",
            },
            "seed": {
                "type": "int",
                "default": 42,
                "min": 0,
                "max": 9999,
                "label": "Random Seed",
                "description": "Seed for random threshold generation (same seed = same output)",
            },
        }

    def __init__(self, wavelet: str = "haar", subband_quant: int = 8, seed: int = 42):
        self.wavelet = wavelet
        self.subband_quant = int(subband_quant)
        self.seed = int(seed)

    def get_current_parameters(self) -> Dict[str, Any]:
        return {"wavelet": self.wavelet, "subband_quant": self.subband_quant, "seed": self.seed}

    def _quant_subband(self, sub: jnp.ndarray, noise: np.ndarray) -> jnp.ndarray:
        return _quant_subband_jnp(sub, jnp.asarray(noise, dtype=sub.dtype),
                                  self.subband_quant)

    def _draw_noise(self, h: int, w: int):
        """Host RNG in the exact order the reference draws it (per channel:
        cA, cH, cV, cD; then the final per-pixel thresholds). The draws
        depend only on (seed, h, w) — identical for every video frame."""
        from dither_pie_tpu.ops.wavelet import filter_bank

        L = len(filter_bank(self.wavelet)[0])
        hs, ws = (h + L - 1) // 2, (w + L - 1) // 2
        rng = np.random.RandomState(self.seed)
        noises = np.empty((3, 4, hs, ws), np.float32)
        for ch in range(3):
            for k in range(4):
                noises[ch, k] = rng.rand(hs, ws).astype(np.float32)
        thr = rng.rand(h * w).astype(np.float32).reshape(h, w)
        return noises, thr

    def dither_batch(self, images, palette_arr):
        """Batched device path for video: ONE jitted program (vmapped
        DWT -> quantize -> IDWT -> randomized pick) per frame batch. The
        per-frame outputs are identical to ``dither`` because the
        reference re-seeds its RandomState per image, making the noise
        frame-invariant."""
        _runtime.jax_platform()
        b, h, w, _ = images.shape
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        noises, thr = self._draw_noise(h, w)
        # DITHER_PIE_TPU_AUTO_MESH=1: frames shard over the local mesh
        # (noise/threshold tensors replicate — they are frame-invariant).
        from dither_pie_tpu.parallel.auto import maybe_sharded_map

        out = maybe_sharded_map("wavelet",
                                (self.wavelet, self.subband_quant),
                                np.asarray(images), pal, noises, thr)
        if out is None:
            fn = _wavelet_batch_fn(self.wavelet, self.subband_quant)
            out = fn(jnp.asarray(images), jnp.asarray(pal),
                     jnp.asarray(noises), jnp.asarray(thr))
        # float32 like every other dither_batch (callers quantize).
        return np.asarray(out, dtype=np.float32)

    def dither_batch_indices(self, images, palette_arr, planar=False):
        if planar or len(palette_arr) > 256:
            return None  # NHWC-only; u8 index stream
        _runtime.jax_platform()
        b, h, w, _ = images.shape
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        noises, thr = self._draw_noise(h, w)
        fn = _wavelet_batch_fn(self.wavelet, self.subband_quant,
                               emit_idx=True)
        idx = fn(jnp.asarray(images), jnp.asarray(pal),
                 jnp.asarray(noises), jnp.asarray(thr))
        return np.asarray(idx)

    def dither(self, pixels, palette_arr, image_size):
        h, w = image_size
        img, pal = _prep(pixels, palette_arr, image_size)
        rng = np.random.RandomState(self.seed)

        chans = []
        for ch in range(3):
            cA, (cH, cV, cD) = _wavelet.dwt2_jnp(jnp.asarray(img[:, :, ch]), self.wavelet)
            subs = []
            for sub in (cA, cH, cV, cD):
                noise = rng.rand(*sub.shape).astype(np.float32)
                subs.append(self._quant_subband(sub, noise))
            rec = _wavelet.idwt2_jnp(subs[0], (subs[1], subs[2], subs[3]), self.wavelet)
            rec = jnp.clip(rec[:h, :w], 0, 255)
            chans.append(rec)
        result = jnp.stack(chans, axis=-1)

        rand_thr = rng.rand(h * w).astype(np.float32).reshape(h, w)
        out = _ordered.ordered_dither(result, jnp.asarray(pal), jnp.asarray(rand_thr))
        return np.asarray(out, dtype=np.float32).reshape(-1, 3)


# -------------------- Halftone --------------------


class HalftoneDitherStrategy(BaseDitherStrategy):
    """Rotated-screen newspaper halftone."""

    @staticmethod
    def get_parameter_info() -> Dict[str, Any]:
        return {
            "cell_size": {
                "type": "int", "default": 8, "min": 2, "max": 32,
                "label": "Cell Size",
                "description": "Distance between dot centers (smaller = finer detail)",
            },
            "angle": {
                "type": "float", "default": 45.0, "min": 0.0, "max": 90.0,
                "label": "Screen Angle",
                "description": "Rotation angle in degrees (45° is classic newspaper)",
            },
            "dot_gain": {
                "type": "float", "default": 1.0, "min": 0.5, "max": 3.0, "step": 0.1,
                "label": "Dot Gain",
                "description": "Controls dot growth (1.0 = linear, higher = more contrast)",
            },
            "min_dot_size": {
                "type": "float", "default": 0.0, "min": 0.0, "max": 0.5, "step": 0.05,
                "label": "Min Dot Size",
                "description": "Minimum dot threshold (0 = pure white possible)",
            },
            "max_dot_size": {
                "type": "float", "default": 1.0, "min": 0.5, "max": 1.0, "step": 0.05,
                "label": "Max Dot Size",
                "description": "Maximum dot threshold (1.0 = pure black possible)",
            },
            "shape": {
                "type": "choice", "default": "circle",
                "choices": ["circle", "square", "diamond"],
                "label": "Dot Shape",
                "description": "Shape of halftone dots",
            },
            "sharpness": {
                "type": "float", "default": 1.5, "min": 0.5, "max": 4.0, "step": 0.1,
                "label": "Sharpness",
                "description": "Edge sharpness (higher = crisper dots)",
            },
        }

    def __init__(self, cell_size: int = 8, angle: float = 45.0, dot_gain: float = 1.0,
                 min_dot_size: float = 0.0, max_dot_size: float = 1.0,
                 shape: str = "circle", sharpness: float = 1.5):
        self.cell_size = int(cell_size)
        self.angle = float(angle)
        self.dot_gain = float(dot_gain)
        self.min_dot_size = float(min_dot_size)
        self.max_dot_size = float(max_dot_size)
        self.shape = shape
        self.sharpness = float(sharpness)

    def get_current_parameters(self) -> Dict[str, Any]:
        return {
            "cell_size": self.cell_size, "angle": self.angle,
            "dot_gain": self.dot_gain, "min_dot_size": self.min_dot_size,
            "max_dot_size": self.max_dot_size, "shape": self.shape,
            "sharpness": self.sharpness,
        }

    def dither(self, pixels, palette_arr, image_size):
        h, w = image_size
        img, pal = _prep(pixels, palette_arr, image_size)
        screen, cell_idx, n_cells = _halftone.halftone_screen(
            h, w, self.cell_size, self.angle, self.dot_gain,
            self.min_dot_size, self.max_dot_size, self.shape, self.sharpness,
        )
        out = _halftone.halftone_dither(
            jnp.asarray(img), jnp.asarray(pal),
            jnp.asarray(screen), jnp.asarray(cell_idx), n_cells,
        )
        return np.asarray(out, dtype=np.float32).reshape(-1, 3)

    def dither_batch(self, images, palette_arr):
        b, h, w, _ = images.shape
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        screen, cell_idx, n_cells = _halftone.halftone_screen(
            h, w, self.cell_size, self.angle, self.dot_gain,
            self.min_dot_size, self.max_dot_size, self.shape, self.sharpness,
        )
        # DITHER_PIE_TPU_AUTO_MESH=1: frames shard over the local mesh
        # (screen/cell layout replicates — it depends only on the shape).
        from dither_pie_tpu.parallel.auto import maybe_sharded_map

        out = maybe_sharded_map(
            "halftone", (n_cells,),
            np.asarray(images, dtype=np.float32), pal,
            np.asarray(screen), np.asarray(cell_idx))
        if out is None:
            out = _halftone.halftone_dither_batch(
                jnp.asarray(images, dtype=jnp.float32), jnp.asarray(pal),
                jnp.asarray(screen), jnp.asarray(cell_idx), n_cells)
        return np.asarray(out).astype(np.float32)

    def dither_batch_indices(self, images, palette_arr, planar=False):
        if planar or len(palette_arr) > 256:
            return None  # NHWC-only; u8 index stream
        b, h, w, _ = images.shape
        pal = _palette.as_palette_array([tuple(c) for c in np.asarray(palette_arr)])
        screen, cell_idx, n_cells = _halftone.halftone_screen(
            h, w, self.cell_size, self.angle, self.dot_gain,
            self.min_dot_size, self.max_dot_size, self.shape, self.sharpness,
        )
        idx = _halftone.halftone_dither_batch_indices(
            jnp.asarray(images, dtype=jnp.float32), jnp.asarray(pal),
            jnp.asarray(screen), jnp.asarray(cell_idx), n_cells)
        return np.asarray(idx)


# -------------------- ColorReducer --------------------


class ColorReducer:
    """Palette building: median-cut, (jitted) k-means, uniform cube."""

    @staticmethod
    def find_dominant_channel(colors: List[Tuple[int, int, int]]) -> int:
        return _palette._dominant_channel(colors)

    @staticmethod
    def median_cut(colors: List[Tuple[int, int, int]], depth: int) -> List[Tuple[int, int, int]]:
        return _palette._median_cut(colors, depth)

    @staticmethod
    def reduce_colors(image: Image.Image, num_colors: int) -> List[Tuple[int, int, int]]:
        arr = np.array(image.convert("RGB"), dtype=np.uint8)
        return _palette.median_cut_palette(arr, num_colors)

    @staticmethod
    def generate_kmeans_palette(img: Image.Image, num_colors: int,
                                random_state=42) -> List[Tuple[int, int, int]]:
        arr = np.array(img.convert("RGB"), dtype=np.uint8)
        return _palette.kmeans_palette(arr, num_colors, random_state=random_state)

    @staticmethod
    def generate_uniform_palette(num_colors: int) -> List[Tuple[int, int, int]]:
        return _palette.uniform_palette(num_colors)


# -------------------- ImageDitherer --------------------


_STRATEGY_CLASSES = {
    DitherMode.NONE: NoDitherStrategy,
    DitherMode.BAYER: BayerDitherStrategy,
    DitherMode.BLUE_NOISE: BlueNoiseDitherStrategy,
    DitherMode.INTERLEAVED_GRADIENT_NOISE: InterleavedGradientNoiseDitherStrategy,
    DitherMode.POLKA_DOT: PolkaDotDitherStrategy,
    DitherMode.ERROR_DIFFUSION: ErrorDiffusionDitherStrategy,
    DitherMode.RIEMERSMA: RiemersmaDitherStrategy,
    DitherMode.WAVELET: WaveletDitherStrategy,
    DitherMode.ADAPTIVE_VARIANCE: AdaptiveVarianceDitherStrategy,
    DitherMode.PERCEPTUAL: PerceptualDitherStrategy,
    DitherMode.HYBRID: HybridDitherStrategy,
    DitherMode.HALFTONE: HalftoneDitherStrategy,
    DitherMode.OSTROMOUKHOV: OstromoukhovDitherStrategy,
}

# Modes exposing configurable parameters (NONE, RIEMERSMA, PERCEPTUAL do not).
_PARAM_MODES = {
    DitherMode.BAYER: BayerDitherStrategy,
    DitherMode.HALFTONE: HalftoneDitherStrategy,
    DitherMode.POLKA_DOT: PolkaDotDitherStrategy,
    DitherMode.BLUE_NOISE: BlueNoiseDitherStrategy,
    DitherMode.INTERLEAVED_GRADIENT_NOISE: InterleavedGradientNoiseDitherStrategy,
    DitherMode.WAVELET: WaveletDitherStrategy,
    DitherMode.ADAPTIVE_VARIANCE: AdaptiveVarianceDitherStrategy,
    DitherMode.HYBRID: HybridDitherStrategy,
    DitherMode.ERROR_DIFFUSION: ErrorDiffusionDitherStrategy,
    DitherMode.OSTROMOUKHOV: OstromoukhovDitherStrategy,
}


class ImageDitherer:
    """Orchestrates palette building plus dithering with a chosen strategy.

    Keeps the reference's behavioral quirks: the gamma path quantizes to
    8-bit *linear* before dithering (and converts the palette the same way),
    and ``apply_dithering`` caches an auto-generated palette on the instance
    (/root/reference/dithering_lib.py:1952-1992).
    """

    def __init__(self,
                 num_colors: int = 16,
                 dither_mode: Optional[DitherMode] = DitherMode.BAYER,
                 palette: Optional[List[Tuple[int, int, int]]] = None,
                 use_gamma: bool = False,
                 dither_params: Optional[Dict[str, Any]] = None):
        self.num_colors = num_colors
        self.dither_mode = dither_mode
        self.palette = palette
        self.use_gamma = use_gamma
        self.dither_params = dither_params or {}

    @staticmethod
    def get_mode_parameters(mode: DitherMode) -> Optional[Dict[str, Any]]:
        cls = _PARAM_MODES.get(mode)
        return cls.get_parameter_info() if cls else None

    @staticmethod
    def mode_has_parameters(mode: DitherMode) -> bool:
        return ImageDitherer.get_mode_parameters(mode) is not None

    def _get_dither_strategy(self, mode: DitherMode) -> BaseDitherStrategy:
        strategy_class = _STRATEGY_CLASSES.get(mode)
        if strategy_class is None:
            raise ValueError(f"Unrecognized DitherMode: {mode}")
        param_info = strategy_class.get_parameter_info()
        if param_info:
            settings = {key: info["default"] for key, info in param_info.items()}
            settings.update(self.dither_params)
            return strategy_class(**settings)
        return strategy_class()

    def apply_dithering_array(self, arr_srgb_8: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 in, (H, W, 3) uint8 out. Core of apply_dithering."""
        if self.use_gamma:
            arr_01 = arr_srgb_8.astype(np.float32) / 255.0
            arr_lin_01 = DitherUtils.srgb_to_linear(arr_01)
            # Reference quirk: quantizes the LINEAR image to 8 bits before
            # dithering (dithering_lib.py:1959).
            arr_for_dith = np.clip(arr_lin_01 * 255.0, 0, 255).astype(np.uint8)
            if self.palette is None:
                self.palette = _palette.median_cut_palette(arr_for_dith, self.num_colors)
        else:
            if self.palette is None:
                self.palette = _palette.median_cut_palette(arr_srgb_8, self.num_colors)
            arr_for_dith = arr_srgb_8

        palette_arr = np.array(self.palette, dtype=np.float32)
        if self.use_gamma:
            palette_01 = palette_arr / 255.0
            palette_lin_01 = DitherUtils.srgb_to_linear(palette_01)
            palette_arr = np.clip(palette_lin_01 * 255.0, 0, 255).astype(np.float32)

        h, w, _ = arr_for_dith.shape
        flat_pixels = arr_for_dith.reshape(-1, 3).astype(np.float32)

        mode = self.dither_mode or DitherMode.NONE
        strategy = self._get_dither_strategy(mode)
        dithered_flat = strategy.dither(flat_pixels, palette_arr, (h, w))
        out_8 = dithered_flat.reshape(h, w, 3).astype(np.uint8)

        if self.use_gamma:
            out_lin_01 = out_8.astype(np.float32) / 255.0
            out_srgb_01 = DitherUtils.linear_to_srgb(np.clip(out_lin_01, 0, 1))
            out_8 = np.clip(out_srgb_01 * 255.0, 0, 255).astype(np.uint8)
        return out_8

    def supports_planar_batch(self) -> bool:
        """True when ``apply_dithering_batch(..., planar=True)`` is
        available: an ED strategy with a wavefront planar kernel (palette
        within the packed cap, non-serpentine). The video pipeline uses
        this to pick zero-copy ffmpeg-gbrp ingestion."""
        wf = _wavefront_or_none()
        if wf is None:
            return False
        if self.palette is not None and len(self.palette) > wf.PACKED_PALETTE_MAX:
            return False
        mode = self.dither_mode or DitherMode.NONE
        try:
            strategy = self._get_dither_strategy(mode)
        except Exception:
            return False
        if not hasattr(strategy, "dither_batch_planar"):
            return False
        return not getattr(strategy, "serpentine", False)

    def apply_dithering_batch(self, arrs_srgb_8: np.ndarray,
                              planar: bool = False) -> np.ndarray:
        """Batched device path: (B, H, W, 3) uint8 -> (B, H, W, 3) uint8.

        Requires an explicit palette (the video pipeline computes one from
        the first frame, matching reference semantics). Dispatches to each
        strategy's device batch kernel.

        ``planar=True``: frames are (3, B, H, W) channel-major planes, in
        and out (the ffmpeg-gbrp zero-copy layout); only strategies with a
        planar wavefront kernel accept it (``supports_planar_batch``).
        """
        if self.palette is None:
            raise ValueError("apply_dithering_batch requires a palette; "
                             "compute one from the first frame first")
        if self.use_gamma:
            lin = DitherUtils.srgb_to_linear(arrs_srgb_8.astype(np.float32) / 255.0)
            work = np.clip(lin * 255.0, 0, 255).astype(np.uint8)
        else:
            work = arrs_srgb_8

        palette_arr = np.array(self.palette, dtype=np.float32)
        if self.use_gamma:
            pal_lin = DitherUtils.srgb_to_linear(palette_arr / 255.0)
            palette_arr = np.clip(pal_lin * 255.0, 0, 255).astype(np.float32)

        mode = self.dither_mode or DitherMode.NONE
        strategy = self._get_dither_strategy(mode)

        # Index transfer: on slow device->host links (measured once per
        # process, see api/linkspeed.py) strategies with an index-emitting
        # wavefront kernel return (B, H, W) uint8 palette indices — a third
        # of the D2H bytes — and ONE exact palette gather on the host
        # reproduces the color output bit-for-bit. Gamma folds into the
        # palette: output pixels only ever take palette values, so the
        # per-entry linear->sRGB map equals the per-pixel map exactly.
        # Precedence vs auto-mesh: the sharded multi-chip path returns RGB
        # (no index-emitting sharded kernel yet), so when the mesh CAN
        # serve this batch it wins by default — compute spread over N
        # chips beats a 3x D2H cut. But the mesh never serves planar
        # batches, and an explicit DITHER_PIE_TPU_INDEX_TRANSFER=1 is user
        # intent that must not be silently ignored — both of those take
        # the index stream regardless of the mesh.
        index_forced = (
            os.environ.get("DITHER_PIE_TPU_INDEX_TRANSFER") == "1")
        mesh_may_serve = _auto_mesh_enabled() and not planar
        if (len(palette_arr) <= 1024
                and hasattr(strategy, "dither_batch_indices")
                and (index_forced or not mesh_may_serve)
                and _linkspeed.index_transfer_wins()):
            from dither_pie_tpu.api.profiling import stage

            try:
                with stage("dither.index_stream"):
                    idx = strategy.dither_batch_indices(work, palette_arr,
                                                        planar=planar)
            except Exception as e:
                # Auto mode must never be worse than the RGB stream: any
                # index-path failure (e.g. a backend rejecting the index
                # kernel variant) falls back silently.
                import logging

                logging.getLogger("dither_pie_tpu").warning(
                    "index stream failed (%s); falling back to RGB output",
                    e)
                idx = None
            if idx is not None:
                pal_u8 = palette_arr.astype(np.uint8)  # truncation, like
                #         the device epilogue's exact-int i32 cast
                if self.use_gamma:
                    srgb = DitherUtils.linear_to_srgb(
                        np.clip(pal_u8.astype(np.float32) / 255.0, 0, 1))
                    pal_u8 = np.clip(srgb * 255.0, 0, 255).astype(np.uint8)
                with stage("dither.palette_gather"):
                    if planar:
                        return pal_u8.T[:, idx]  # (3, B, H, W)
                    return pal_u8[idx]  # (B, H, W, 3)

        if planar:
            out = strategy.dither_batch_planar(work, palette_arr)
        else:
            out = strategy.dither_batch(work, palette_arr)
        out8 = out.astype(np.uint8)

        if self.use_gamma:
            srgb = DitherUtils.linear_to_srgb(np.clip(out8.astype(np.float32) / 255.0, 0, 1))
            out8 = np.clip(srgb * 255.0, 0, 255).astype(np.uint8)
        return out8

    def apply_dithering(self, image: Image.Image) -> Image.Image:
        arr = np.array(image.convert("RGB"), dtype=np.uint8)
        return Image.fromarray(self.apply_dithering_array(arr), "RGB")
