"""Test configuration: force an 8-device CPU mesh and provide access to the
reference implementation (when present) for golden parity tests."""

import os
import sys

# Must be set before the first backend initialization.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize may have pre-registered a TPU backend; tests
# always run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_PATH = "/root/reference"


def _install_pywt_stub():
    """The reference imports pywt at module scope; this environment has no
    pywt, so back the stub with our own filter banks (independently verified
    by perfect-reconstruction tests)."""
    if "pywt" in sys.modules:
        return
    import types

    from dither_pie_tpu.ops.wavelet import dwt2_np, idwt2_np

    stub = types.ModuleType("pywt")
    stub.dwt2 = lambda data, wavelet: dwt2_np(data, wavelet)
    stub.idwt2 = lambda coeffs, wavelet: idwt2_np(coeffs[0], coeffs[1], wavelet)
    sys.modules["pywt"] = stub


@pytest.fixture(scope="session")
def reference():
    """The reference dithering_lib module, or skip when unavailable."""
    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference implementation not available")
    _install_pywt_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import dithering_lib  # noqa: F401

    return dithering_lib


@pytest.fixture()
def rand_image():
    rng = np.random.RandomState(1234)
    return rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)


@pytest.fixture()
def gradient_image():
    h, w = 32, 40
    y = np.linspace(0, 255, h, dtype=np.float32)[:, None]
    x = np.linspace(0, 255, w, dtype=np.float32)[None, :]
    r = np.broadcast_to(x, (h, w))
    g = np.broadcast_to(y, (h, w))
    b = (x + y) / 2
    return np.stack([r, g, np.broadcast_to(b, (h, w))], axis=-1).astype(np.uint8)


PALETTE_8 = [
    (0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 255, 0),
    (0, 0, 255), (255, 255, 0), (0, 255, 255), (255, 0, 255),
]

PALETTE_GB = [(15, 56, 15), (48, 98, 48), (139, 172, 15), (155, 188, 15)]


@pytest.fixture(params=["palette8", "gameboy"])
def palette(request):
    return list(PALETTE_8 if request.param == "palette8" else PALETTE_GB)
