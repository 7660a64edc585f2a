"""GAN training CLI for the P2CGen/CPDis stack (models/training.py).

The reference ships its training-only modules (p2cGen.py, c2pDis.py,
networks.py GANLoss/get_scheduler/init_weights) but no training loop;
this is the framework's canonical TPU trainer around them:

    python -m dither_pie_tpu.tools.train_gan --src pixel_dir --real clip_dir
        [--epochs N] [--batch B] [--size 256] [--lr 2e-4]
        [--lr-policy linear|step|cosine|plateau] [--gan-mode lsgan]
        [--ckpt ckpt.npz] [--save-every E] [--no-mesh]

* pairs are matched by filename between --src and --real (pix2pix-style
  supervised translation; images are center-cropped/resized to --size and
  scaled to [-1, 1] NHWC);
* the train step is one jitted program; with >1 local device the batch
  shards over a `jax.sharding.Mesh` data axis and XLA all-reduces the
  gradients over ICI (--no-mesh opts out);
* --ckpt resumes from / saves the FULL state (params + Adam moments) via
  models/training.py save_train_state, so interrupted runs continue
  exactly.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time


def _load_pairs(src_dir: str, real_dir: str):
    exts = ("*.png", "*.jpg", "*.jpeg", "*.webp")
    srcs = sorted(p for e in exts for p in glob.glob(os.path.join(src_dir, e)))
    pairs = []
    for s in srcs:
        r = os.path.join(real_dir, os.path.basename(s))
        if os.path.isfile(r):
            pairs.append((s, r))
    return pairs


def _load_image(path: str, size: int):
    import numpy as np
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    scale = size / min(w, h)
    img = img.resize((max(size, round(w * scale)),
                      max(size, round(h * scale))), Image.BICUBIC)
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, dtype=np.float32) / 127.5 - 1.0
    return arr


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Train P2CGen vs CPDis (supervised GAN translation)")
    ap.add_argument("--src", required=True, help="source-domain image dir")
    ap.add_argument("--real", required=True,
                    help="target-domain dir (filenames matched to --src)")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256,
                    help="square crop size (multiple of 4)")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--lr-policy", default="linear",
                    choices=("linear", "step", "cosine", "plateau"))
    ap.add_argument("--decay-epochs", type=int, default=None,
                    help="linear: epochs of decay at the end (default "
                         "epochs/2); step: the hold length before each "
                         "10x cut")
    ap.add_argument("--gan-mode", default="lsgan",
                    choices=("lsgan", "vanilla", "wgangp"))
    ap.add_argument("--lambda-l1", type=float, default=100.0)
    ap.add_argument("--dim", type=int, default=64, help="generator width")
    ap.add_argument("--conv-dim", type=int, default=64,
                    help="discriminator width")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ckpt", help="checkpoint .npz to resume from / save to")
    ap.add_argument("--save-every", type=int, default=5,
                    help="save checkpoint every N epochs (needs --ckpt)")
    ap.add_argument("--no-mesh", action="store_true",
                    help="disable multi-device data parallelism")
    args = ap.parse_args(argv)

    if args.size % 4:
        print("--size must be a multiple of 4", file=sys.stderr)
        return 1
    pairs = _load_pairs(args.src, args.real)
    if not pairs:
        print(f"no filename-matched pairs between {args.src} and "
              f"{args.real}", file=sys.stderr)
        return 1
    print(f"{len(pairs)} training pairs")

    import jax
    import numpy as np

    from dither_pie_tpu.models.training import (ReduceLROnPlateau,
                                                checkpoint_path,
                                                load_train_state, lr_schedule,
                                                make_gan_train_step,
                                                save_train_state, shard_batch)

    devices = jax.devices()
    mesh = None
    batch = args.batch
    if len(devices) > 1 and not args.no_mesh:
        from jax.sharding import Mesh

        mesh = Mesh(np.array(devices), ("data",))
        if batch % len(devices):
            batch = -(-batch // len(devices)) * len(devices)
            print(f"batch rounded up to {batch} "
                  f"(multiple of {len(devices)} devices)")
        print(f"data-parallel over {len(devices)} devices")

    # LR scheduling without losing Adam moments: inject_hyperparams puts
    # the learning rate INTO the optimizer state, so the jitted step stays
    # compiled once and set_lr just rewrites one scalar leaf per epoch.
    import optax

    from dither_pie_tpu.models.training import (GANTrainState,
                                                init_cpdis_params,
                                                init_p2cgen_params)

    g_tx = optax.inject_hyperparams(optax.adam)(
        learning_rate=args.lr, b1=0.5, b2=0.999)
    d_tx = optax.inject_hyperparams(optax.adam)(
        learning_rate=args.lr, b1=0.5, b2=0.999)
    kg, kd = jax.random.split(jax.random.PRNGKey(args.seed))
    g_params = init_p2cgen_params(kg, dim=args.dim)
    d_params = init_cpdis_params(kd, conv_dim=args.conv_dim)
    state = GANTrainState(g_params, d_params, g_tx.init(g_params),
                          d_tx.init(d_params))
    start_epoch = 0
    ck_extra = {}
    if args.ckpt:
        # One normalization shared with save/load (training.py) so the
        # resume existence check below finds what save_train_state wrote.
        args.ckpt = checkpoint_path(args.ckpt)
    if args.ckpt and os.path.isfile(args.ckpt):
        state, start_epoch, ck_extra = load_train_state(args.ckpt, state)
        print(f"resumed {args.ckpt} at epoch {start_epoch}")

    step = make_gan_train_step(g_tx, d_tx, gan_mode=args.gan_mode,
                               lambda_l1=args.lambda_l1, mesh=mesh)

    decay = args.decay_epochs if args.decay_epochs is not None \
        else args.epochs // 2
    if args.lr_policy == "plateau":
        plateau = ReduceLROnPlateau(args.lr)
        # Resume the scheduler's side-state so an interrupted run
        # continues exactly (lr level, best metric, patience counter).
        if ck_extra:
            plateau.lr = ck_extra.get("plateau_lr", plateau.lr)
            plateau.best = ck_extra.get("plateau_best", plateau.best)
            plateau.num_bad_epochs = int(
                ck_extra.get("plateau_bad", plateau.num_bad_epochs))
        lr_of = None
    elif args.lr_policy == "linear":
        plateau = None
        # Reference convention (networks.py lambda_rule): hold the base LR
        # for the first (epochs - decay) epochs, then decay linearly to ~0
        # over the last `decay` epochs.
        lr_of = lr_schedule("linear", args.lr, epoch_count=1,
                            n_epochs=args.epochs - decay,
                            n_epochs_decay=decay)
    elif args.lr_policy == "step":
        plateau = None
        # `decay` IS the hold length between 10x cuts (matches the --help
        # text; the reference's opt.lr_decay_iters plays the same role).
        lr_of = lr_schedule("step", args.lr, lr_decay_iters=max(1, decay))
    else:  # cosine: one half-period over the whole run
        plateau = None
        lr_of = lr_schedule("cosine", args.lr, n_epochs=args.epochs)

    def set_lr(lr):
        state.g_opt.hyperparams["learning_rate"] = jax.numpy.asarray(lr)
        state.d_opt.hyperparams["learning_rate"] = jax.numpy.asarray(lr)

    def sched_extra():
        return ({"plateau_lr": plateau.lr, "plateau_best": plateau.best,
                 "plateau_bad": plateau.num_bad_epochs}
                if plateau else None)

    rng = np.random.RandomState(args.seed)
    order = np.arange(len(pairs))
    for epoch in range(start_epoch, args.epochs):
        lr = plateau.lr if plateau else lr_of(epoch)
        set_lr(lr)
        rng.shuffle(order)
        t0 = time.time()
        epoch_g = epoch_d = 0.0
        n_steps = 0
        for i in range(0, len(order) - batch + 1, batch):
            idx = order[i:i + batch]
            src = np.stack([_load_image(pairs[j][0], args.size)
                            for j in idx])
            real = np.stack([_load_image(pairs[j][1], args.size)
                             for j in idx])
            if mesh is not None:
                src, real = shard_batch(mesh, src), shard_batch(mesh, real)
            state, metrics = step(state, src, real)
            epoch_g += float(metrics["g_loss"])
            epoch_d += float(metrics["d_loss"])
            n_steps += 1
        if not n_steps:
            print(f"batch {batch} exceeds dataset size {len(pairs)}",
                  file=sys.stderr)
            return 1
        g_avg, d_avg = epoch_g / n_steps, epoch_d / n_steps
        if plateau:
            plateau.step(g_avg)
        print(f"epoch {epoch + 1}/{args.epochs}  lr {lr:.2e}  "
              f"G {g_avg:.4f}  D {d_avg:.4f}  "
              f"({time.time() - t0:.1f}s, {n_steps} steps)")
        if args.ckpt and (epoch + 1) % args.save_every == 0:
            save_train_state(args.ckpt, state, step=epoch + 1,
                             extra=sched_extra())
            print(f"saved {args.ckpt}")
    if args.ckpt:
        save_train_state(args.ckpt, state, step=max(start_epoch, args.epochs),
                         extra=sched_extra())
        print(f"saved {args.ckpt}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
