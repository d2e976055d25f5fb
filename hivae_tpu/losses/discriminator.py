"""GAN discriminators + adversarial loss helpers.

Capability parity with the reference's ``losses/`` package (PatchGAN 2D/3D,
pooled 3-D conv discriminator; reference ``losses/discriminator.py:33-225``)
— built but disconnected from the shipped trainers there, exposed here behind
the same optional surface. BatchNorm uses flax's ``batch_stats`` collection;
pass ``train=True`` during GAN training.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class NLayerDiscriminator(nn.Module):
    """2-D PatchGAN (pix2pix style; reference ``:99-153``). NCHW in,
    (N,1,h',w') logits out."""

    ndf: int = 64
    n_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.transpose(0, 2, 3, 1)
        x = nn.Conv(self.ndf, (4, 4), strides=2, padding=1, name="conv_0",
                    dtype=self.dtype)(x)
        x = _lrelu(x)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf, (4, 4), strides=2, padding=1,
                        use_bias=False, name=f"conv_{n}", dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"norm_{n}", dtype=self.dtype)(x)
            x = _lrelu(x)
        nf = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * nf, (4, 4), strides=1, padding=1,
                    use_bias=False, name=f"conv_{self.n_layers}",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         name=f"norm_{self.n_layers}", dtype=self.dtype)(x)
        x = _lrelu(x)
        x = nn.Conv(1, (4, 4), strides=1, padding=1, name="conv_out",
                    dtype=self.dtype)(x)
        return x.transpose(0, 3, 1, 2)


class NLayerDiscriminator3D(nn.Module):
    """3-D PatchGAN over (N,C,T,H,W) volumes (reference ``:154-225``)."""

    ndf: int = 64
    n_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.transpose(0, 2, 3, 4, 1)  # NTHWC
        x = nn.Conv(self.ndf, (4, 4, 4), strides=2, padding=1, name="conv_0",
                    dtype=self.dtype)(x)
        x = _lrelu(x)
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf, (4, 4, 4), strides=2, padding=1,
                        use_bias=False, name=f"conv_{n}", dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"norm_{n}", dtype=self.dtype)(x)
            x = _lrelu(x)
        nf = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * nf, (4, 4, 4), strides=1, padding=1,
                    use_bias=False, name=f"conv_{self.n_layers}",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         name=f"norm_{self.n_layers}", dtype=self.dtype)(x)
        x = _lrelu(x)
        x = nn.Conv(1, (4, 4, 4), strides=1, padding=1, name="conv_out",
                    dtype=self.dtype)(x)
        return x.transpose(0, 4, 1, 2, 3)


class Discriminator3DConv(nn.Module):
    """3-D conv stack -> global pool -> MLP scalar score
    (reference ``Discriminator3DConv:33-97``)."""

    ndf: int = 64
    n_layers: int = 3
    mlp_hidden_dim: int = 256
    use_sigmoid: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.transpose(0, 2, 3, 4, 1)
        x = nn.Conv(self.ndf, (3, 3, 3), strides=2, padding=1, name="conv_0",
                    dtype=self.dtype)(x)
        x = _lrelu(x)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf, (3, 3, 3), strides=2, padding=1,
                        use_bias=False, name=f"conv_{n}", dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"norm_{n}", dtype=self.dtype)(x)
            x = _lrelu(x)
        nf = min(2 ** self.n_layers, 4)
        x = nn.Conv(self.ndf * nf, (3, 3, 3), strides=1, padding=1,
                    use_bias=False, name=f"conv_{self.n_layers}",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         name=f"norm_{self.n_layers}", dtype=self.dtype)(x)
        x = _lrelu(x)
        x = jnp.mean(x, axis=(1, 2, 3))  # adaptive avg pool
        x = nn.Dense(self.mlp_hidden_dim, name="mlp_fc1", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(1, name="mlp_fc2", dtype=self.dtype)(x)[:, 0]
        return jax.nn.sigmoid(x) if self.use_sigmoid else x


# ---------------------------------------------------------------------------
# GAN objectives (reference model/loss.py:17-33 commented block; taming style)
# ---------------------------------------------------------------------------


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (jnp.mean(nn.relu(1.0 - logits_real)) +
                  jnp.mean(nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real)) +
                  jnp.mean(jax.nn.softplus(logits_fake)))


def generator_loss(logits_fake: jax.Array) -> jax.Array:
    return -jnp.mean(logits_fake)


def adaptive_gan_weight(nll_grad_norm: jax.Array, g_grad_norm: jax.Array,
                        max_weight: float = 1e4) -> jax.Array:
    """Taming-style adaptive discriminator weight from last-layer grad norms."""
    w = nll_grad_norm / (g_grad_norm + 1e-4)
    return jnp.clip(w, 0.0, max_weight)
