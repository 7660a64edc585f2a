"""Training-stack parity: P2CGen / CPDis / margin heads / GANLoss /
schedulers vs the reference torch implementations, plus the sharded GAN
train step.

Same method as tests/test_neural.py: instantiate the reference modules with
random weights, convert the exact state dict, compare numerically.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# models/networks.py does `from .c2pGen import *`, which needs torchvision
# at import time (only class bodies use it — a bare stub suffices here;
# tests/test_neural.py carries the full vgg19-shaped stub).
_tv = types.ModuleType("torchvision")
_tv_models = types.ModuleType("torchvision.models")
_tv_models.vgg19 = lambda pretrained=False: None
_tv.models = _tv_models
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.models", _tv_models)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dither_pie_tpu.models.convert import (convert_discriminator_state,
                                           convert_p2cgen_state)  # noqa: E402
from dither_pie_tpu.models.discriminator import (arc_margin_product,
                                                 cpdis_cls_forward,
                                                 cpdis_forward,
                                                 margin_cosine_product,
                                                 multi_margin_product)  # noqa: E402
from dither_pie_tpu.models.losses import gan_loss  # noqa: E402
from dither_pie_tpu.models.p2cgen import p2cgen_forward  # noqa: E402

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")


def _to_nhwc(t):
    return np.asarray(t.detach()).transpose(0, 2, 3, 1)


def _to_nchw(a):
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


def _jx(state):
    return {k: jnp.asarray(v) for k, v in state.items()}


# ---------------------------------------------------------------------------
# P2CGen
# ---------------------------------------------------------------------------

def test_p2cgen_forward_parity():
    from models.p2cGen import P2CGen

    torch.manual_seed(1)
    net = P2CGen(3, 3, 64, 2, 3, activ="relu", pad_type="reflect").eval()
    params = _jx(convert_p2cgen_state(
        {k: v.numpy() for k, v in net.state_dict().items()}))

    rng = np.random.RandomState(2)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(p2cgen_forward(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = _to_nhwc(net(_to_nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=3e-4)


# ---------------------------------------------------------------------------
# CPDis / CPDis_cls (spectral norm semantics incl. the u/v state walk)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def torch_cpdis():
    from models.c2pDis import CPDis

    torch.manual_seed(3)
    return CPDis(image_size=256, conv_dim=64, repeat_num=3, norm="SN").eval()


def test_cpdis_forward_parity(torch_cpdis):
    net = torch_cpdis
    params = _jx(convert_discriminator_state(
        {k: v.numpy() for k, v in net.state_dict().items()}))

    rng = np.random.RandomState(4)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    out1, uv1 = cpdis_forward(params, jnp.asarray(x))
    with torch.no_grad():
        ref1 = net(_to_nchw(x))
    np.testing.assert_allclose(np.asarray(out1), _to_nhwc(ref1), atol=5e-5)

    # The torch hook advanced u/v in place during that forward; a SECOND
    # forward therefore runs from the walked state. Matching it checks both
    # the returned updates and the one-iteration-per-forward cadence.
    params2 = {**params, **uv1}
    out2, uv2 = cpdis_forward(params2, jnp.asarray(x))
    with torch.no_grad():
        ref2 = net(_to_nchw(x))
    np.testing.assert_allclose(np.asarray(out2), _to_nhwc(ref2), atol=5e-5)
    # And the walked state itself matches the module's buffers.
    st = {k: v.numpy() for k, v in net.state_dict().items()}
    for k in ("main.0.weight_u", "main.6.weight_v", "conv1.weight_u"):
        np.testing.assert_allclose(np.asarray(uv2[k]), st[k], atol=1e-5,
                                   err_msg=k)


def test_cpdis_cls_forward_parity():
    from models.c2pDis import CPDis_cls

    torch.manual_seed(5)
    net = CPDis_cls(image_size=256, conv_dim=64, repeat_num=3,
                    norm="SN").eval()
    params = _jx(convert_discriminator_state(
        {k: v.numpy() for k, v in net.state_dict().items()}))

    rng = np.random.RandomState(6)
    x = rng.uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)
    label = np.array([0, 3, 6])
    patch, cls, _ = cpdis_cls_forward(params, jnp.asarray(x),
                                      jnp.asarray(label))
    with torch.no_grad():
        ref_patch, ref_cls = net(_to_nchw(x), torch.from_numpy(label))
    np.testing.assert_allclose(np.asarray(patch), _to_nhwc(ref_patch),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(ref_cls),
                               atol=5e-5)


def test_sn_gradient_flow_matches_torch(torch_cpdis):
    """Gradients flow only through weight_bar (u/v detached): compare a
    d(sum(out))/d(weight_bar) column against torch autograd."""
    net = torch_cpdis
    params = _jx(convert_discriminator_state(
        {k: v.numpy() for k, v in net.state_dict().items()}))
    rng = np.random.RandomState(7)
    # 32x32 is the smallest input the torch trunk accepts (four stride-2
    # 4x4 convs + the 4x4 conv1 head).
    x = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)

    def f(wbar):
        out, _ = cpdis_forward({**params, "main.0.weight_bar": wbar},
                               jnp.asarray(x))
        return jnp.sum(out)

    ours = np.asarray(jax.grad(f)(params["main.0.weight_bar"]))

    xt = _to_nchw(x)
    wbar_t = net.main[0].weight_bar
    if wbar_t.grad is not None:
        wbar_t.grad = None
    net(xt).sum().backward()
    np.testing.assert_allclose(ours, wbar_t.grad.numpy(), atol=3e-5)
    # u/v must carry no gradient in ours.
    gu = jax.grad(lambda u: jnp.sum(cpdis_forward(
        {**params, "main.0.weight_u": u}, jnp.asarray(x))[0]))(
        params["main.0.weight_u"])
    assert float(jnp.abs(gu).max()) == 0.0


# ---------------------------------------------------------------------------
# Margin products
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("easy", [False, True])
def test_margin_products_parity(easy):
    from models.c2pDis import (ArcMarginProduct, MarginCosineProduct,
                               MultiMarginProduct)

    torch.manual_seed(8)
    rng = np.random.RandomState(8)
    feat = rng.randn(5, 32).astype(np.float32)
    label = rng.randint(0, 7, 5)
    ft, lt = torch.from_numpy(feat), torch.from_numpy(label)

    mcp = MarginCosineProduct(32, 7)
    ours = margin_cosine_product(jnp.asarray(feat),
                                 jnp.asarray(mcp.weight.detach().numpy()),
                                 jnp.asarray(label))
    with torch.no_grad():
        theirs = mcp(ft, lt)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)

    arc = ArcMarginProduct(32, 7, easy_margin=easy)
    ours = arc_margin_product(jnp.asarray(feat),
                              jnp.asarray(arc.weight.detach().numpy()),
                              jnp.asarray(label), easy_margin=easy)
    with torch.no_grad():
        theirs = arc(ft, lt)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)

    mmp = MultiMarginProduct(32, 7, easy_margin=easy)
    ours = multi_margin_product(jnp.asarray(feat),
                                jnp.asarray(mmp.weight.detach().numpy()),
                                jnp.asarray(label), easy_margin=easy)
    with torch.no_grad():
        theirs = mmp(ft, lt)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# GANLoss
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["lsgan", "vanilla", "wgangp"])
@pytest.mark.parametrize("real", [True, False])
def test_gan_loss_parity(mode, real):
    sys.path.insert(0, "/root/reference")
    from models.networks import GANLoss

    rng = np.random.RandomState(9)
    pred = rng.randn(2, 1, 30, 30).astype(np.float32) * 3
    ours = float(gan_loss(jnp.asarray(pred), real, mode))
    with torch.no_grad():
        theirs = float(GANLoss(mode)(torch.from_numpy(pred), real))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# Schedulers
# ---------------------------------------------------------------------------

class _Opt:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _torch_lrs(opt_cfg, epochs):
    from models.networks import get_scheduler

    m = torch.nn.Linear(2, 2)
    optim = torch.optim.Adam(m.parameters(), lr=0.1)
    sched = get_scheduler(optim, opt_cfg)
    lrs = []
    for _ in range(epochs):
        lrs.append(optim.param_groups[0]["lr"])
        optim.step()
        if opt_cfg.lr_policy == "plateau":
            pass  # driven separately with metrics
        else:
            sched.step()
    return lrs


@pytest.mark.parametrize("policy,kw", [
    ("linear", dict(epoch_count=1, n_epochs=10, n_epochs_decay=10)),
    ("step", dict(lr_decay_iters=7)),
    ("cosine", dict(n_epochs=25)),
])
def test_schedulers_parity(policy, kw):
    from dither_pie_tpu.models.training import lr_schedule

    cfg = _Opt(lr_policy=policy, epoch_count=kw.get("epoch_count", 1),
               n_epochs=kw.get("n_epochs", 10),
               n_epochs_decay=kw.get("n_epochs_decay", 10),
               lr_decay_iters=kw.get("lr_decay_iters", 7))
    ref = _torch_lrs(cfg, 25)
    fn = lr_schedule(policy, 0.1, **kw)
    ours = [fn(e) for e in range(25)]
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_plateau_scheduler_parity():
    from dither_pie_tpu.models.training import ReduceLROnPlateau

    m = torch.nn.Linear(2, 2)
    optim = torch.optim.Adam(m.parameters(), lr=0.1)
    ref_sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        optim, mode="min", factor=0.2, threshold=0.01, patience=5)
    ours = ReduceLROnPlateau(0.1)
    # improves, stalls past patience (reduce), improves again, stalls again;
    # then a slow sub-threshold drift (best must stay PINNED, not ratchet:
    # 0.2376 < 0.24*0.99 resets patience only because best held at 0.24)
    metrics = ([1.0, 0.9, 0.85] + [0.849] * 7 + [0.5] + [0.499] * 8
               + [0.3, 0.29] + [0.24, 0.2399, 0.2390, 0.2382, 0.2376,
                                0.2374, 0.2373])
    for met in metrics:
        ref_sched.step(met)
        optim.step()
        lr_ref = optim.param_groups[0]["lr"]
        lr_ours = ours.step(met)
        np.testing.assert_allclose(lr_ours, lr_ref, rtol=1e-9,
                                   err_msg=f"metric {met}")


# ---------------------------------------------------------------------------
# init_weights + train step
# ---------------------------------------------------------------------------

def test_init_weights_policies():
    from dither_pie_tpu.models.training import (init_p2cgen_params,
                                                init_weights)

    base = init_p2cgen_params(jax.random.PRNGKey(0), dim=8)
    for policy in ("normal", "xavier", "kaiming", "orthogonal"):
        p = init_weights(base, jax.random.PRNGKey(1), policy, 0.02)
        assert all(bool(jnp.all(jnp.isfinite(v))) for v in p.values())
        assert float(jnp.abs(p["RGBDec.conv_3.conv.bias"]).max()) == 0.0
        # LayerNorm affines keep their ctor init (reference quirk).
        assert np.array_equal(np.asarray(p["RGBDec.conv_1.norm.gamma"]),
                              np.asarray(base["RGBDec.conv_1.norm.gamma"]))
    w = init_weights(base, jax.random.PRNGKey(2), "orthogonal", 1.0)[
        "RGBEnc.model.1.conv.weight"]
    flat = np.asarray(w).reshape(-1, w.shape[-1])
    np.testing.assert_allclose(flat.T @ flat, np.eye(flat.shape[1]),
                               atol=1e-5)


def test_gan_train_step_smoke():
    """Two jitted GAN steps on tiny nets: losses finite, params move,
    the spectral-norm u/v state walks, and D's objective improves on the
    same batch."""
    from dither_pie_tpu.models.training import gan_init, make_gan_train_step

    state, g_tx, d_tx = gan_init(jax.random.PRNGKey(0), dim=8, conv_dim=8)
    step = make_gan_train_step(g_tx, d_tx)
    rng = np.random.RandomState(1)
    # 32x32: smallest size the PatchGAN trunk supports (see grad test).
    src = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    real = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))

    s1, m1 = step(state, src, real)
    s2, m2 = step(s1, src, real)
    for k, v in {**m1, **m2}.items():
        assert np.isfinite(float(v)), k
    assert not np.array_equal(
        np.asarray(state.g_params["RGBDec.conv_3.conv.weight"]),
        np.asarray(s2.g_params["RGBDec.conv_3.conv.weight"]))
    assert not np.array_equal(
        np.asarray(state.d_params["main.0.weight_u"]),
        np.asarray(s2.d_params["main.0.weight_u"]))
    assert float(m2["d_loss"]) < float(m1["d_loss"])


def test_gan_train_step_sharded():
    """The mesh variant runs one step with the batch sharded over 8
    virtual devices and matches the unsharded step numerically."""
    from jax.sharding import Mesh

    from dither_pie_tpu.models.training import (gan_init,
                                                make_gan_train_step,
                                                shard_batch)

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = Mesh(np.array(devs[:8]), ("data",))
    state, g_tx, d_tx = gan_init(jax.random.PRNGKey(0), dim=8, conv_dim=8)
    rng = np.random.RandomState(2)
    src = rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
    real = rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)

    _, m_ref = make_gan_train_step(g_tx, d_tx)(
        state, jnp.asarray(src), jnp.asarray(real))
    _, m_sh = make_gan_train_step(g_tx, d_tx, mesh=mesh)(
        state, shard_batch(mesh, src), shard_batch(mesh, real))
    for k in m_ref:
        np.testing.assert_allclose(float(m_sh[k]), float(m_ref[k]),
                                   rtol=2e-4, err_msg=k)


# ---------------------------------------------------------------------------
# Checkpoint save/resume + trainer CLI
# ---------------------------------------------------------------------------

def test_save_load_train_state_roundtrip(tmp_path):
    from dither_pie_tpu.models.training import (gan_init, load_train_state,
                                                save_train_state)

    state, _, _ = gan_init(jax.random.PRNGKey(3), dim=8, conv_dim=8)
    path = str(tmp_path / "ck.npz")
    save_train_state(path, state, step=7,
                     extra={"plateau_lr": 1e-4, "plateau_bad": 3})
    like, _, _ = gan_init(jax.random.PRNGKey(4), dim=8, conv_dim=8)
    restored, step, extra = load_train_state(path, like)
    assert step == 7
    assert extra == {"plateau_lr": 1e-4, "plateau_bad": 3.0}
    for k in state.g_params:
        np.testing.assert_array_equal(np.asarray(restored.g_params[k]),
                                      np.asarray(state.g_params[k]))
    # Structural mismatch (different dims) must be rejected, not garbled.
    wrong, _, _ = gan_init(jax.random.PRNGKey(5), dim=4, conv_dim=8)
    with pytest.raises(ValueError):
        load_train_state(path, wrong)


def test_save_train_state_normalizes_npz_extension(tmp_path):
    """np.savez silently appends .npz; a bare --ckpt name must still be
    found by the resume existence check (it once silently restarted)."""
    import os

    from dither_pie_tpu.models.training import (gan_init, load_train_state,
                                                save_train_state)

    state, _, _ = gan_init(jax.random.PRNGKey(6), dim=4, conv_dim=4)
    bare = str(tmp_path / "run1")
    save_train_state(bare, state, step=2)
    assert os.path.isfile(bare + ".npz")
    _, step, _ = load_train_state(bare + ".npz", state)
    assert step == 2


@pytest.mark.slow
def test_train_gan_cli_smoke(tmp_path):
    """Two epochs + exact resume through the CLI entry point."""
    from PIL import Image

    from dither_pie_tpu.tools.train_gan import main

    src_d, real_d = tmp_path / "src", tmp_path / "real"
    src_d.mkdir(), real_d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
                        ).save(src_d / f"{i}.png")
        Image.fromarray(rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
                        ).save(real_d / f"{i}.png")
    ck = str(tmp_path / "ck.npz")
    common = ["--src", str(src_d), "--real", str(real_d), "--batch", "2",
              "--size", "32", "--dim", "8", "--conv-dim", "8",
              "--ckpt", ck, "--no-mesh"]
    assert main(["--epochs", "2", "--save-every", "1"] + common) == 0
    assert os.path.exists(ck)
    assert main(["--epochs", "3"] + common) == 0  # resumes at epoch 2
