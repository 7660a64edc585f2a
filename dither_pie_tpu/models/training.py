"""Training stack: weight init, LR schedules, and a sharded GAN train step.

TPU-native equivalent of the reference's training-only machinery
(/root/reference/models/networks.py:34-110 — get_scheduler / init_weights /
init_net — plus the generator/discriminator factories at :113-176). The
reference repo ships the modules but no training loop; this file supplies
the canonical way to train them on TPU: pure param pytrees, optax
optimizers, and one jitted train step whose batch axis is sharded over a
`jax.sharding.Mesh` data axis (gradients ride XLA's automatic psum over
ICI — no hand-written collectives, unlike the reference's DataParallel
wrapping at networks.py:105-108).

Random param builders mirror the torch module constructions:

* `init_p2cgen_params`  -> P2CGen(3, 3, 64, 2, 3)     (p2cGen.py:4-19)
* `init_cpdis_params`   -> CPDis / CPDis_cls('SN')    (c2pDis.py:134-235)

with the reference's *effective* init: `init_weights` (networks.py:63-92)
normal/xavier/kaiming/orthogonal on plain conv/linear weights, zero biases
— and its quirk that spectral-norm convs are untouched: the hook has
already replaced `.weight` with a computed plain attribute, so
`init.normal_(m.weight.data)` writes to a tensor the next forward discards,
leaving `weight_bar` at torch's default kaiming-uniform. We reproduce that
(SN weight_bar ~ U(±1/sqrt(fan_in)), u/v ~ N(0,1)) rather than the
no-op-normal, because it is what the reference actually trains with.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dither_pie_tpu.models.discriminator import (N_CLASSES, TRUNK,
                                                 cpdis_forward)
from dither_pie_tpu.models.losses import gan_loss
from dither_pie_tpu.models.p2cgen import p2cgen_forward

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Random param builders (torch-ctor-equivalent distributions)
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout):
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)),
    bias U(±1/sqrt(fan_in)). Returns HWIO weight + bias."""
    fan_in = kh * kw * cin
    bound = 1.0 / math.sqrt(fan_in)
    kw_, kb = jax.random.split(key)
    w = jax.random.uniform(kw_, (kh, kw, cin, cout), jnp.float32,
                           -bound, bound)
    b = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return w, b


def init_p2cgen_params(key, dim: int = 64) -> Params:
    """Random P2CGen params (keys match the torch state_dict; see
    models/p2cgen.py for the layer map), then `init_weights('normal')`
    applied exactly as init_net does (networks.py:95-110)."""
    p: Params = {}
    keys = iter(jax.random.split(key, 64))

    def conv(name, kh, cin, cout):
        w, b = _conv_init(next(keys), kh, kh, cin, cout)
        p[f"{name}.conv.weight"] = w
        p[f"{name}.conv.bias"] = b

    conv("RGBEnc.model.0", 7, 3, dim)
    conv("RGBEnc.model.1", 4, dim, 2 * dim)
    conv("RGBEnc.model.2", 4, 2 * dim, 4 * dim)
    for i in range(3):
        conv(f"RGBEnc.model.3.model.{i}.model.0", 3, 4 * dim, 4 * dim)
        conv(f"RGBEnc.model.3.model.{i}.model.1", 3, 4 * dim, 4 * dim)
        conv(f"RGBDec.Res_Blocks.model.{i}.model.0", 3, 4 * dim, 4 * dim)
        conv(f"RGBDec.Res_Blocks.model.{i}.model.1", 3, 4 * dim, 4 * dim)
    conv("RGBDec.conv_1", 5, 4 * dim, 2 * dim)
    conv("RGBDec.conv_2", 5, 2 * dim, dim)
    conv("RGBDec.conv_3", 7, dim, 3)
    # LayerNorm ctor init: gamma ~ U[0,1), beta = 0 (basic_layer.py:346-347);
    # init_weights never touches LayerNorm.
    for name, c in (("RGBDec.conv_1", 2 * dim), ("RGBDec.conv_2", dim)):
        p[f"{name}.norm.gamma"] = jax.random.uniform(next(keys), (c,))
        p[f"{name}.norm.beta"] = jnp.zeros((c,), jnp.float32)
    return init_weights(p, next(keys), "normal", 0.02)


def init_cpdis_params(key, cls: bool = False, conv_dim: int = 64) -> Params:
    """Random CPDis/CPDis_cls('SN', conv_dim) params. SN convs: weight_bar
    at the torch default init (see module docstring), u/v ~ N(0,1)
    (c2pDis.py:269-270), biases zeroed by init_weights. The forwards in
    models/discriminator.py read channel counts from the param shapes, so
    any conv_dim works (the reference default is 64)."""
    p: Params = {}
    keys = iter(jax.random.split(key, 32))

    def sn_conv(name, cin, cout, bias=True):
        fan_in = 4 * 4 * cin
        bound = 1.0 / math.sqrt(fan_in)
        p[f"{name}.weight_bar"] = jax.random.uniform(
            next(keys), (cout, cin, 4, 4), jnp.float32, -bound, bound)
        p[f"{name}.weight_u"] = jax.random.normal(next(keys), (cout,))
        p[f"{name}.weight_v"] = jax.random.normal(next(keys),
                                                  (cin * 4 * 4,))
        if bias:
            # init_weights zeroes conv biases (networks.py:85-86).
            p[f"{name}.bias"] = jnp.zeros((cout,), jnp.float32)

    cin = 3
    for (name, _, _, _), mult in zip(TRUNK, (1, 2, 4, 8)):
        sn_conv(name, cin, conv_dim * mult)
        cin = conv_dim * mult
    sn_conv("conv1", cin, 1, bias=False)
    if cls:
        # init_weights('normal') DOES hit the plain classifier_conv.
        p["classifier_conv.weight"] = (
            jax.random.normal(next(keys), (cin, cin, 1, 1)) * 0.02)
        p["classifier_conv.bias"] = jnp.zeros((cin,), jnp.float32)
        # MarginCosineProduct: xavier_uniform (c2pDis.py:31), untouched by
        # init_weights (classname matches neither Conv nor Linear).
        limit = math.sqrt(6.0 / (cin + N_CLASSES))
        p["classifier.weight"] = jax.random.uniform(
            next(keys), (N_CLASSES, cin), jnp.float32, -limit, limit)
    return p


def init_weights(params: Params, key, init_type: str = "normal",
                 init_gain: float = 0.02) -> Params:
    """Reference init_weights (networks.py:63-92) over a param pytree:
    conv/linear *weights* get normal | xavier | kaiming | orthogonal,
    their biases go to zero; norm affines and SN weight_bar keep their
    ctor init (the latter mirroring the reference quirk — see module
    docstring). Conv weights here are HWIO, so fan_in/fan_out are the
    (kh*kw*I, kh*kw*O) torch conventions computed on those axes."""
    out = dict(params)
    names = [k[: -len(".weight")] for k in params
             if k.endswith(".weight") and params[k].ndim in (2, 4)
             and not k.startswith("classifier.")]
    for name, k in zip(names, jax.random.split(key, max(len(names), 1))):
        w = params[f"{name}.weight"]
        if w.ndim == 4:
            kh, kw_, cin, cout = w.shape
            fan_in, fan_out = kh * kw_ * cin, kh * kw_ * cout
        else:
            fan_in, fan_out = w.shape  # stored (I, O)
        if init_type == "normal":
            w = jax.random.normal(k, w.shape) * init_gain
        elif init_type == "xavier":
            std = init_gain * math.sqrt(2.0 / (fan_in + fan_out))
            w = jax.random.normal(k, w.shape) * std
        elif init_type == "kaiming":
            w = jax.random.normal(k, w.shape) * math.sqrt(2.0 / fan_in)
        elif init_type == "orthogonal":
            flat = w.reshape(-1, w.shape[-1]) if w.ndim == 4 else w
            q = jax.nn.initializers.orthogonal(init_gain)(
                k, flat.shape, jnp.float32)
            w = q.reshape(w.shape)
        else:
            raise NotImplementedError(
                f"initialization method {init_type} is not implemented")
        out[f"{name}.weight"] = w.astype(jnp.float32)
        if f"{name}.bias" in out:
            out[f"{name}.bias"] = jnp.zeros_like(out[f"{name}.bias"])
    return out


# ---------------------------------------------------------------------------
# LR schedules (networks.py:34-60). linear/step/cosine are pure
# epoch -> lr functions (jit- and optax-friendly); plateau is stateful by
# nature and gets a small host-side class with torch's exact semantics.
# ---------------------------------------------------------------------------

def lr_schedule(policy: str, base_lr: float, *, epoch_count: int = 1,
                n_epochs: int = 100, n_epochs_decay: int = 100,
                lr_decay_iters: int = 50) -> Callable[[int], float]:
    if policy == "linear":
        def fn(epoch):
            return base_lr * (1.0 - max(
                0, epoch + epoch_count - n_epochs)
                / float(n_epochs_decay + 1))
    elif policy == "step":
        def fn(epoch):
            return base_lr * 0.1 ** (epoch // lr_decay_iters)
    elif policy == "cosine":
        def fn(epoch):
            # closed form of torch CosineAnnealingLR(T_max, eta_min=0)
            return base_lr * (1 + math.cos(math.pi * epoch / n_epochs)) / 2
    else:
        raise NotImplementedError(
            f"learning rate policy [{policy}] is not implemented")
    return fn


class ReduceLROnPlateau:
    """torch ReduceLROnPlateau(mode='min', factor=0.2, threshold=0.01,
    patience=5) as configured at networks.py:55; rel-threshold mode,
    cooldown 0, min_lr 0, eps 1e-8 (torch defaults)."""

    def __init__(self, base_lr: float, factor: float = 0.2,
                 threshold: float = 0.01, patience: int = 5,
                 eps: float = 1e-8):
        self.lr = float(base_lr)
        self.factor, self.threshold = factor, threshold
        self.patience, self.eps = patience, eps
        self.best = math.inf
        self.num_bad_epochs = 0

    def step(self, metric: float) -> float:
        # torch updates `best` ONLY when the rel-threshold test passes —
        # a slow sub-threshold drift keeps best pinned (and patience
        # counting), it does not ratchet best down.
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            new_lr = self.lr * self.factor
            if self.lr - new_lr > self.eps:
                self.lr = new_lr
            self.num_bad_epochs = 0
        return self.lr


# ---------------------------------------------------------------------------
# GAN train step
# ---------------------------------------------------------------------------

class GANTrainState(NamedTuple):
    g_params: Params
    d_params: Params  # includes the u/v spectral-norm state
    g_opt: object
    d_opt: object


def gan_init(key, lr: float = 2e-4, betas=(0.5, 0.999), dim: int = 64,
             conv_dim: int = 64) -> Tuple[GANTrainState, object, object]:
    """Fresh P2CGen + CPDis + Adam(lr, betas) — the CycleGAN defaults.
    Returns (state, g_tx, d_tx); keep the tx objects and pass them to
    every gan_train_step call (their states live in `state`)."""
    import optax

    kg, kd = jax.random.split(key)
    g_params = init_p2cgen_params(kg, dim=dim)
    d_params = init_cpdis_params(kd, conv_dim=conv_dim)
    g_tx = optax.adam(lr, b1=betas[0], b2=betas[1])
    d_tx = optax.adam(lr, b1=betas[0], b2=betas[1])
    return (GANTrainState(g_params, d_params, g_tx.init(g_params),
                          d_tx.init(d_params)), g_tx, d_tx)


def make_gan_train_step(g_tx, d_tx, gan_mode: str = "lsgan",
                        lambda_l1: float = 100.0,
                        mesh: Optional[jax.sharding.Mesh] = None,
                        data_axis: str = "data"):
    """One (D update, G update) step, jitted; with `mesh`, the batch is
    sharded over `data_axis` and params/opt-state are replicated — XLA
    inserts the gradient all-reduce over ICI.

    Objective (pix2pix-style supervised translation — the reference ships
    no trainer, this is the framework's canonical recipe for its modules):
      D: 0.5 * [gan(D(real), True) + gan(D(G(src)), False)]
      G: gan(D(G(src)), True) + lambda_l1 * L1(G(src), real)

    Spectral-norm u/v ride along: they are entries of d_params whose
    gradients are identically zero (stop_gradient in the power iteration),
    so Adam leaves them untouched; the D step then overwrites them with
    the power-iteration updates from its own forward — the same
    one-iteration-per-D-forward cadence as the torch hook.
    """
    import optax

    def step(state: GANTrainState, src: jnp.ndarray, real: jnp.ndarray
             ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        fake = p2cgen_forward(state.g_params, src)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            # Sequential forwards, torch-hook cadence: the real forward
            # walks u/v one power iteration, the fake forward runs FROM
            # the walked state and walks it again — two iterations per D
            # step, and the fake branch normalizes with the post-walk
            # sigma, exactly as the in-place hook would.
            pred_real, uv1 = cpdis_forward(d_params, real)
            pred_fake, uv = cpdis_forward({**d_params, **uv1}, fake_sg)
            loss = 0.5 * (gan_loss(pred_real, True, gan_mode)
                          + gan_loss(pred_fake, False, gan_mode))
            return loss, uv

        (d_loss, uv), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        d_params = {**d_params, **uv}

        def g_loss_fn(g_params):
            fake = p2cgen_forward(g_params, src)
            pred_fake, _ = cpdis_forward(d_params, fake)
            adv = gan_loss(pred_fake, True, gan_mode)
            l1 = jnp.mean(jnp.abs(fake - real))
            return adv + lambda_l1 * l1, (adv, l1)

        (g_loss, (adv, l1)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        metrics = {"d_loss": d_loss, "g_loss": g_loss, "g_adv": adv,
                   "g_l1": l1}
        return GANTrainState(g_params, d_params, g_opt, d_opt), metrics

    if mesh is None:
        return jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sh = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())
    return jax.jit(step, in_shardings=(None, batch_sh, batch_sh),
                   out_shardings=(None, repl))


def shard_batch(mesh: jax.sharding.Mesh, arr: np.ndarray,
                data_axis: str = "data"):
    """Place a host batch sharded over the mesh's data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(arr, NamedSharding(mesh, P(data_axis)))


# ---------------------------------------------------------------------------
# Checkpoint save/resume. One flat .npz holds every leaf of the state
# pytree (params + Adam moments) — restoring into a structurally-identical
# fresh state resumes training exactly (same tx config required).
# ---------------------------------------------------------------------------

def checkpoint_path(path: str) -> str:
    """Normalize a checkpoint path to end in ``.npz``: np.savez appends
    that extension silently, so a bare name would save to one file and
    then fail every later existence check / load on the bare name (a
    resume would silently restart). Shared by save, load, and the
    trainer CLI so the three never disagree."""
    return path if path.endswith(".npz") else path + ".npz"


def save_train_state(path: str, state: GANTrainState, step: int = 0,
                     extra: Optional[Dict[str, float]] = None) -> None:
    """Write the full train state (params + optimizer moments) to .npz
    (path normalized via ``checkpoint_path``). ``extra``: scalar
    side-state (e.g. the plateau scheduler's lr/best/num_bad_epochs)
    saved alongside and returned by load."""
    path = checkpoint_path(path)
    leaves, _ = jax.tree_util.tree_flatten(state)
    arrs = {f"leaf_{i:05d}": np.asarray(v) for i, v in enumerate(leaves)}
    arrs["__step__"] = np.asarray(step, np.int64)
    for k, v in (extra or {}).items():
        arrs[f"extra_{k}"] = np.asarray(float(v))
    np.savez(path, **arrs)


def load_train_state(path: str, like: GANTrainState
                     ) -> Tuple[GANTrainState, int, Dict[str, float]]:
    """Restore a state saved by save_train_state (path normalized via
    ``checkpoint_path``, mirroring save). ``like`` supplies the pytree
    structure (e.g. a fresh gan_init with the same dims/tx) — leaf
    shapes are validated against it. Returns (state, step, extra)."""
    with np.load(checkpoint_path(path)) as z:
        step = int(z["__step__"])
        extra = {k[len("extra_"):]: float(z[k]) for k in z.files
                 if k.startswith("extra_")}
        leaves, treedef = jax.tree_util.tree_flatten(like)
        names = [f"leaf_{i:05d}" for i in range(len(leaves))]
        missing = [n for n in names if n not in z]
        n_leaves = len(z.files) - 1 - len(extra)
        if missing or n_leaves != len(names):
            raise ValueError(
                f"checkpoint {path} has {n_leaves} leaves, "
                f"state expects {len(names)} — dims/optimizer mismatch")
        new = []
        for n, ref in zip(names, leaves):
            arr = z[n]
            if tuple(arr.shape) != tuple(np.shape(ref)):
                raise ValueError(
                    f"checkpoint leaf {n}: shape {arr.shape} != expected "
                    f"{np.shape(ref)}")
            new.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new), step, extra
