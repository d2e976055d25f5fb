"""Reconstruction + perceptual training losses.

Parity with the reference ``model/loss.py``: plain ``l1``/``l2`` and
``LpipsMseLoss`` (velocity loss + weighted LPIPS between the VAE-decoded
predicted frame and the ground-truth frame, reference ``loss.py:248-330``).
Here the loss is a pure function over bound VAE/LPIPS params so the whole
thing jits into the train step.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def l1(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - gt.astype(jnp.float32)))


def l2(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(pred.astype(jnp.float32) -
                               gt.astype(jnp.float32)))


class LpipsMseLoss:
    """Velocity MSE + perceptual term on decoded frames.

    Stateless callable: construct with the (frozen) VAE + LPIPS modules and
    their params; call with (video_gt, zj_pred, v_pred, v_gt).

    This is the reference's standalone loss API (``loss.py:248-330``) for
    library users; ``training/trainer.py`` intentionally does NOT call it —
    the trainer composes the SAME perceptual leg inline over the model's
    own loss dict (which already carries diff/rec/KL terms), keeping the
    model's loss definition authoritative. A change to the perceptual
    formula must be applied in both places.
    """

    def __init__(self, vae, vae_params, lpips, lpips_params,
                 loss_type: str = "l2", perceptual_weight: float = 0.5):
        self.vae = vae
        self.vae_params = vae_params
        self.lpips = lpips
        self.lpips_params = lpips_params
        self.loss_func = l1 if loss_type == "l1" else l2
        self.perceptual_weight = perceptual_weight

    def __call__(self, video_gt: jax.Array, zj_pred: jax.Array,
                 v_pred: jax.Array, v_gt: jax.Array
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        from ..models.vae import SD_VAE_SCALE

        rec_loss = self.loss_func(v_pred, v_gt)
        if video_gt.ndim == 5:
            video_gt = video_gt.reshape((-1,) + video_gt.shape[2:])
        if self.perceptual_weight > 0:
            video_pre = self.vae.apply(self.vae_params,
                                       zj_pred / SD_VAE_SCALE,
                                       method="decode")
            p_loss = jnp.mean(self.lpips.apply(self.lpips_params, video_pre,
                                               video_gt))
        else:
            p_loss = jnp.zeros_like(rec_loss)
        loss = rec_loss + self.perceptual_weight * p_loss
        return loss, {"loss": loss, "rec_loss": rec_loss,
                      "lpips_loss": p_loss}
