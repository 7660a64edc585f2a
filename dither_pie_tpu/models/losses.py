"""GAN objectives — pure-function twin of the reference GANLoss.

/root/reference/models/networks.py:179-245 wraps the three objectives in an
nn.Module that materializes a target tensor per call; under jit that is just
a scalar broadcast, so here each mode is a pure function of (prediction,
target_is_real) suitable for `jax.value_and_grad` composition. Values match
torch to f32 roundoff (tests/test_training.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GAN_MODES = ("lsgan", "vanilla", "wgangp")


def gan_loss(prediction: jnp.ndarray, target_is_real: bool,
             gan_mode: str = "lsgan", target_real_label: float = 1.0,
             target_fake_label: float = 0.0) -> jnp.ndarray:
    """Scalar GAN loss.

    lsgan   -> MSE vs the label tensor (networks.py:201-202)
    vanilla -> BCE-with-logits vs the label tensor (networks.py:203-204)
    wgangp  -> -mean(pred) for real, +mean(pred) for fake
               (networks.py:240-244)
    """
    pred = prediction.astype(jnp.float32)
    if gan_mode == "wgangp":
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    target = jnp.asarray(
        target_real_label if target_is_real else target_fake_label,
        jnp.float32)
    if gan_mode == "lsgan":
        return jnp.mean((pred - target) ** 2)
    if gan_mode == "vanilla":
        # torch BCEWithLogitsLoss: mean(max(x,0) - x*t + log1p(exp(-|x|)))
        return jnp.mean(jax.nn.relu(pred) - pred * target
                        + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    raise NotImplementedError(f"gan mode {gan_mode} not implemented")
