"""Neural pixelizer parity: the JAX port vs the reference torch models.

The environment has no torchvision and no released checkpoints, so we:
  * stub torchvision with a faithful vgg19 feature/classifier layout,
  * instantiate the reference C2PGen / AliasNet with random weights,
  * convert those exact weights with models/convert.py,
  * compare forward passes numerically.
This validates architecture + conversion end to end; with the real
checkpoints the same code path reproduces the reference outputs.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from dither_pie_tpu.models.c2pgen import (aliasnet_forward, c2pgen_forward,
                                          vgg_features)  # noqa: E402
from dither_pie_tpu.models.convert import (convert_aliasnet_state,
                                           convert_generator_state)  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def _build_vgg19():
    """torchvision-compatible vgg19 module (features indices match)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers = []
    in_c = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_c, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            in_c = v
    m = nn.Module()
    m.features = nn.Sequential(*layers)
    m.classifier = nn.Sequential(
        nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
        nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
        nn.Linear(4096, 1000))
    m.avgpool = nn.AdaptiveAvgPool2d((7, 7))
    return m


@pytest.fixture(scope="module")
def reference_models():
    """Reference torch C2PGen + AliasNet with random weights."""
    # Stub torchvision before importing the reference models package.
    # Mutate any already-installed stub IN PLACE (tests/test_training.py
    # registers a bare one, and the reference's c2pGen module may have
    # already bound it via `import torchvision.models as models`).
    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tv_models = (sys.modules.get("torchvision.models")
                 or types.ModuleType("torchvision.models"))
    tv_models.vgg19 = lambda pretrained=False: _build_vgg19()
    tv.models = tv_models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    # PixelBlockEncoder.__init__ unconditionally torch.load()s the vgg
    # checkpoint; feed it a random one.
    vgg_full = _build_vgg19()
    vgg_full.classifier[6] = nn.Linear(4096, 7, bias=True)
    vgg_state = vgg_full.state_dict()
    real_load = torch.load
    torch.load = lambda *a, **k: vgg_state
    try:
        torch.manual_seed(0)
        from models.c2pGen import AliasNet, C2PGen

        gen = C2PGen(3, 3, 64, 2, 4, 256, 256).eval()
        alias = AliasNet(3, 3, 64, 2, 3).eval()
    finally:
        torch.load = real_load
    return gen, alias


def _to_nhwc(t):
    return np.asarray(t.detach()).transpose(0, 2, 3, 1)


def _to_nchw(a):
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    clip = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    ref = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    return clip, ref


def test_vgg_feature_taps(reference_models, inputs):
    gen, _ = reference_models
    clip, ref = inputs
    params = convert_generator_state(
        {k: v.numpy() for k, v in gen.state_dict().items()})
    taps = vgg_features({k: jnp.asarray(v) for k, v in params.items()},
                        jnp.asarray(ref))
    with torch.no_grad():
        ref_taps = gen.PBEnc.get_features(_to_nchw(ref), gen.PBEnc.vgg)
    for name in ["conv1_1", "conv2_1", "conv3_1", "conv4_1"]:
        ours = np.asarray(taps[name])
        theirs = _to_nhwc(ref_taps[name])
        np.testing.assert_allclose(ours, theirs, atol=2e-4,
                                   err_msg=f"vgg tap {name}")


def test_c2pgen_forward_parity(reference_models, inputs):
    gen, _ = reference_models
    clip, ref = inputs
    params = {k: jnp.asarray(v) for k, v in convert_generator_state(
        {k: v.numpy() for k, v in gen.state_dict().items()}).items()}
    ours = np.asarray(c2pgen_forward(params, jnp.asarray(clip), jnp.asarray(ref)))
    with torch.no_grad():
        theirs = _to_nhwc(gen(_to_nchw(clip), _to_nchw(ref)))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_aliasnet_forward_parity(reference_models, inputs):
    _, alias = reference_models
    clip, _ = inputs
    params = {k: jnp.asarray(v) for k, v in convert_aliasnet_state(
        {k: v.numpy() for k, v in alias.state_dict().items()}).items()}
    ours = np.asarray(aliasnet_forward(params, jnp.asarray(clip)))
    with torch.no_grad():
        theirs = _to_nhwc(alias(_to_nchw(clip)))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_batched_forward_equals_per_frame(reference_models, inputs):
    """The video path batches frames through one forward with a single
    broadcast style reference; it must equal running each frame alone."""
    gen, _ = reference_models
    _, ref = inputs
    rng = np.random.RandomState(5)
    frames = rng.uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)
    params = {k: jnp.asarray(v) for k, v in convert_generator_state(
        {k: v.numpy() for k, v in gen.state_dict().items()}).items()}
    batched = np.asarray(c2pgen_forward(params, jnp.asarray(frames),
                                        jnp.asarray(ref)))
    for i in range(3):
        single = np.asarray(c2pgen_forward(params, jnp.asarray(frames[i:i + 1]),
                                           jnp.asarray(ref)))
        np.testing.assert_allclose(batched[i:i + 1], single, atol=1e-5)


def test_modulated_conv_shared_style_equals_vmap():
    """A (1, Cin) code with B > 1 takes the one-dense-conv fast path; it
    must equal the per-sample vmap path fed the replicated code."""
    from dither_pie_tpu.models.layers import modulated_conv

    rng = np.random.RandomState(11)
    cin, cout, b = 16, 12, 4
    p = {"m.weight": jnp.asarray(rng.randn(3, 3, cin, cout)
                                 .astype(np.float32)),
         "m.bias": jnp.asarray(rng.randn(cout).astype(np.float32))}
    x = jnp.asarray(rng.randn(b, 8, 8, cin).astype(np.float32))
    code1 = jnp.asarray(rng.rand(1, cin).astype(np.float32) + 0.5)
    shared = np.asarray(modulated_conv(p, "m", x, code1))
    replicated = np.asarray(
        modulated_conv(p, "m", x, jnp.broadcast_to(code1, (b, cin))))
    np.testing.assert_allclose(shared, replicated, atol=1e-5)


def test_full_pipeline_shapes(reference_models, inputs):
    """alias(c2pgen(x)) through the JAX port keeps shape and [-1,1] range."""
    gen, alias = reference_models
    clip, ref = inputs
    gp = {k: jnp.asarray(v) for k, v in convert_generator_state(
        {k: v.numpy() for k, v in gen.state_dict().items()}).items()}
    ap = {k: jnp.asarray(v) for k, v in convert_aliasnet_state(
        {k: v.numpy() for k, v in alias.state_dict().items()}).items()}
    out = aliasnet_forward(ap, c2pgen_forward(gp, jnp.asarray(clip), jnp.asarray(ref)))
    out = np.asarray(out)
    assert out.shape == clip.shape
    assert np.all(out >= -1.001) and np.all(out <= 1.001)


def test_ds4_sampling_matches_pil_bitwise():
    """The on-device /4 slice (arr[2::4, 2::4]) and the host np.repeat x4
    upsample must reproduce PIL's NEAREST /4-then-x4 deprocess bit-for-bit
    — this is the contract that lets the video path ship 16x less D2H."""
    from PIL import Image

    from dither_pie_tpu.models.inference import deprocess_u8, upsample4_u8

    rng = np.random.RandomState(11)
    for h, w in ((64, 96), (52, 40), (128, 72)):
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        ref = np.asarray(deprocess_u8(img))  # PIL /4 then x4 NEAREST
        ds = img[2::4, 2::4, :]
        # /4 slice matches PIL's downsample choice:
        pil_ds = np.asarray(Image.fromarray(img).resize(
            (w // 4, h // 4), Image.Resampling.NEAREST))
        np.testing.assert_array_equal(ds, pil_ds)
        # host x4 rebuild matches PIL's upsample:
        np.testing.assert_array_equal(upsample4_u8(ds), ref)


@pytest.mark.slow
def test_ds4_batch_path_bit_identical(monkeypatch):
    """pixelize_images_batch with the ds4 transfer (default) must be
    bit-identical to the full-frame transfer path (DITHER_PIE_TPU_NEURAL_DS4
    =0) — same weights, same frames."""
    from PIL import Image

    from dither_pie_tpu.models.inference import PixelizationModel

    monkeypatch.setenv("DITHER_PIE_TPU_NEURAL_PRECISION", "float32")
    rng = np.random.RandomState(3)
    frames = [Image.fromarray(rng.randint(0, 256, (40, 56, 3), dtype=np.uint8))
              for _ in range(3)]

    m = PixelizationModel()
    m.load_random(0)
    monkeypatch.setenv("DITHER_PIE_TPU_NEURAL_DS4", "0")
    full = m.pixelize_images_batch(frames, 16)

    m2 = PixelizationModel()
    m2.load_random(0)
    monkeypatch.setenv("DITHER_PIE_TPU_NEURAL_DS4", "1")
    ds4 = m2.pixelize_images_batch(frames, 16)

    for a, b in zip(full, ds4):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_ds4_strided_conv_matches_dense_slice():
    """_aliasnet_body_ds4 (stride-4 final conv on the crop-(2,2) reflect
    pad) must equal _aliasnet_body(...)[:, 2::4, 2::4, :] — the index math
    (pad 3 reflect, crop [2:, 2:], stride 4 == dense[2::4, 2::4]) is the
    whole point of the strided path, so pin it on CPU at several sizes.
    Bitwise equality is a toolchain property (XLA:CPU contracts FMAs);
    tools/ds4_stride_probe.py decides THAT on hardware — here we pin the
    geometry with a tight allclose plus exact shape equality."""
    import jax.numpy as jnp

    from dither_pie_tpu.models.c2pgen import (_aliasnet_body,
                                              _aliasnet_body_ds4)
    from dither_pie_tpu.models.param_shapes import random_params

    _, ap = random_params(7)
    ap = {k: jnp.asarray(v) for k, v in ap.items()}
    rng = np.random.RandomState(5)
    for b, h, w in ((1, 32, 48), (2, 24, 40), (1, 64, 36)):
        x = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32))
        dense = np.asarray(_aliasnet_body(ap, x))[:, 2::4, 2::4, :]
        strided = np.asarray(_aliasnet_body_ds4(ap, x))
        assert strided.shape == dense.shape
        np.testing.assert_allclose(strided, dense, rtol=0, atol=1e-5)


def test_ds4_stride_paths(monkeypatch):
    """The strided ds4 final conv: =0 forbids, =1 forces (within the bf16
    quality budget of the dense path), auto decides on the first batch
    (f32 requires bitwise equality — XLA:CPU's FMA contraction may
    legitimately fail it closed to dense; either verdict must reproduce
    the corresponding forced path bit-for-bit)."""
    from PIL import Image

    from dither_pie_tpu.models.inference import PixelizationModel

    monkeypatch.setenv("DITHER_PIE_TPU_NEURAL_PRECISION", "float32")
    rng = np.random.RandomState(9)
    frames = [Image.fromarray(rng.randint(0, 256, (40, 56, 3),
                                          dtype=np.uint8))
              for _ in range(2)]

    m = PixelizationModel()
    m.load_random(0)
    monkeypatch.setenv("DITHER_PIE_TPU_NEURAL_DS4_STRIDE", "0")
    dense = m.pixelize_images_batch(frames, 16)
    assert m._ds4_stride is False

    m2 = PixelizationModel()
    m2.load_random(0)
    monkeypatch.setenv("DITHER_PIE_TPU_NEURAL_DS4_STRIDE", "1")
    strided = m2.pixelize_images_batch(frames, 16)
    assert m2._ds4_stride is True
    for a, b in zip(dense, strided):
        d = np.abs(np.asarray(a).astype(np.int16)
                   - np.asarray(b).astype(np.int16))
        assert d.mean() <= 1.0 and d.max() <= 2  # rounding-boundary flips

    m3 = PixelizationModel()
    m3.load_random(0)
    monkeypatch.delenv("DITHER_PIE_TPU_NEURAL_DS4_STRIDE", raising=False)
    auto = m3.pixelize_images_batch(frames, 16)
    assert m3._ds4_stride in (True, False)
    ref = strided if m3._ds4_stride else dense
    for a, b in zip(auto, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_u8_input_normalization_within_ulp():
    """Device-side u8 normalization tracks host process() to 1 ulp for
    every possible u8 value (XLA rewrites /255 into a reciprocal multiply;
    the difference is inside the neural parity budget)."""
    import jax

    from dither_pie_tpu.models.inference import _maybe_normalize

    vals = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    vals = np.repeat(vals, 3, axis=-1)
    dev = np.asarray(jax.jit(_maybe_normalize)(jnp.asarray(vals)))
    host = ((vals.astype(np.float32) / 255.0) - 0.5) / 0.5
    np.testing.assert_allclose(dev, host, rtol=0, atol=2.5e-7)
    # and f32 operands pass through untouched
    f32 = np.asarray(jax.jit(_maybe_normalize)(jnp.asarray(host)))
    np.testing.assert_array_equal(f32, host)


def test_u8_input_batch_path_matches_f32(monkeypatch):
    """pixelize_images_batch with u8 device-normalized inputs (default)
    matches the host-f32 prep path within 1 u8 step (the 1-ulp input
    difference through a tanh-bounded generator)."""
    from PIL import Image

    from dither_pie_tpu.models.inference import PixelizationModel

    monkeypatch.setenv("DITHER_PIE_TPU_NEURAL_PRECISION", "float32")
    rng = np.random.RandomState(5)
    frames = [Image.fromarray(rng.randint(0, 256, (36, 48, 3),
                                          dtype=np.uint8))
              for _ in range(2)]
    m = PixelizationModel()
    m.load_random(0)
    monkeypatch.setenv("DITHER_PIE_TPU_NEURAL_U8_IN", "0")
    f32_in = m.pixelize_images_batch(frames, 12)

    m2 = PixelizationModel()
    m2.load_random(0)
    monkeypatch.setenv("DITHER_PIE_TPU_NEURAL_U8_IN", "1")
    u8_in = m2.pixelize_images_batch(frames, 12)
    for a, b in zip(f32_in, u8_in):
        np.testing.assert_allclose(np.asarray(a).astype(np.int16),
                                   np.asarray(b).astype(np.int16), atol=1)


def test_bf16_video_gate_selects_and_falls_back(monkeypatch):
    """The batched-video forward defaults to bf16 behind a first-batch
    parity gate and falls back to f32 when the gate fails; an explicit
    DITHER_PIE_TPU_NEURAL_PRECISION always wins."""
    from dither_pie_tpu.models.inference import PixelizationModel

    monkeypatch.delenv("DITHER_PIE_TPU_NEURAL_PRECISION", raising=False)
    m = PixelizationModel()
    m.load_random(0)
    x = np.random.RandomState(7).uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)

    # On CPU bf16 and f32 agree -> gate passes -> bf16 locked in.
    out = m._gated_batch_forward(x)
    assert out.dtype == np.uint8
    assert m._video_prec == "bfloat16"

    # Divergent bf16 output -> gate fails closed to f32.
    m2 = PixelizationModel()
    m2.load_random(0)
    real_forward = m2.forward_u8

    def skewed(stacked, precision=None, **kw):
        out = real_forward(stacked, precision=precision, **kw)
        if precision == "bfloat16":
            out = np.clip(out.astype(np.int16) + 40, 0, 255).astype(np.uint8)
        return out

    monkeypatch.setattr(m2, "forward_u8", skewed)
    ref = m2._gated_batch_forward(x)
    assert m2._video_prec == "float32"
    np.testing.assert_array_equal(ref, real_forward(x, precision="float32"))

    # Explicit env var bypasses the gate entirely.
    monkeypatch.setenv("DITHER_PIE_TPU_NEURAL_PRECISION", "float32")
    m3 = PixelizationModel()
    m3.load_random(0)
    m3._gated_batch_forward(x)
    assert m3._video_prec == "float32"
