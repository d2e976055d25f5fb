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
                             name=f"norm_{n}")(x)
            x = _lrelu(x)
        nf = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * nf, (4, 4), strides=1, padding=1,
                    use_bias=False, name=f"conv_{self.n_layers}",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         name=f"norm_{self.n_layers}")(x)
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
                             name=f"norm_{n}")(x)
            x = _lrelu(x)
        nf = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * nf, (4, 4, 4), strides=1, padding=1,
                    use_bias=False, name=f"conv_{self.n_layers}",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         name=f"norm_{self.n_layers}")(x)
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
                             name=f"norm_{n}")(x)
            x = _lrelu(x)
        nf = min(2 ** self.n_layers, 4)
        x = nn.Conv(self.ndf * nf, (3, 3, 3), strides=1, padding=1,
                    use_bias=False, name=f"conv_{self.n_layers}",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         name=f"norm_{self.n_layers}")(x)
        x = _lrelu(x)
        x = jnp.mean(x, axis=(1, 2, 3))  # adaptive avg pool
        x = nn.Dense(self.mlp_hidden_dim, name="mlp_fc1", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(1, name="mlp_fc2", dtype=self.dtype)(x)[:, 0]
        return jax.nn.sigmoid(x) if self.use_sigmoid else x


class Discriminator2DConv(nn.Module):
    """2-D conv stack -> pool -> MLP score over per-frame latents
    (reference ``Discriminator2DConv:227-292``)."""

    ndf: int = 64
    n_layers: int = 3
    mlp_hidden_dim: int = 256
    use_sigmoid: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.transpose(0, 2, 3, 1)
        x = nn.Conv(self.ndf, (3, 3), strides=2, padding=1, name="conv_0",
                    dtype=self.dtype)(x)
        x = _lrelu(x)
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf, (3, 3), strides=2, padding=1,
                        use_bias=False, name=f"conv_{n}", dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"norm_{n}")(x)
            x = _lrelu(x)
        nf = min(2 ** self.n_layers, 4)
        x = nn.Conv(self.ndf * nf, (3, 3), strides=1, padding=1,
                    use_bias=False, name=f"conv_{self.n_layers}",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         name=f"norm_{self.n_layers}")(x)
        x = _lrelu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.mlp_hidden_dim, name="mlp_fc1", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(1, name="mlp_fc2", dtype=self.dtype)(x)[:, 0]
        return jax.nn.sigmoid(x) if self.use_sigmoid else x


class Discriminator2DConvVel(nn.Module):
    """Timestep-conditioned conv discriminator over (zi‖zt) velocity pairs
    (reference ``Discriminator2DConvVel:295-368``)."""

    ndf: int = 64
    n_layers: int = 3
    mlp_hidden_dim: int = 256
    time_embed_dim: int = 256
    use_sigmoid: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, timestep: jax.Array,
                 train: bool = False) -> jax.Array:
        from ..models.blocks import AdaLNZeroSingle, FeedForward, \
            TimestepEmbedding

        x = x.transpose(0, 2, 3, 1)
        x = nn.Conv(self.ndf, (3, 3), strides=2, padding=1, name="conv_0",
                    dtype=self.dtype)(x)
        x = _lrelu(x)
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf, (3, 3), strides=2, padding=1,
                        use_bias=False, name=f"conv_{n}", dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"norm_{n}")(x)
            x = _lrelu(x)
        nf = min(2 ** self.n_layers, 4)
        x = nn.Conv(self.ndf * nf, (3, 3), strides=1, padding=1,
                    use_bias=False, name=f"conv_{self.n_layers}",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         name=f"norm_{self.n_layers}")(x)
        x = _lrelu(x)
        hidden = self.ndf * nf
        x = jnp.mean(x, axis=(1, 2))
        emb = TimestepEmbedding(self.time_embed_dim, hidden,
                                name="time_embedding",
                                dtype=self.dtype)(timestep)
        x = nn.Dense(self.mlp_hidden_dim, name="mlp_fc1", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(hidden, name="mlp_fc2", dtype=self.dtype)(x)
        h, _ = AdaLNZeroSingle(hidden, name="norm", dtype=self.dtype)(
            x[:, None], emb)
        h = FeedForward(1, inner_dim=2 * hidden, name="ff",
                        dtype=self.dtype)(h)[:, 0, 0]
        return jax.nn.sigmoid(h) if self.use_sigmoid else h


class Discriminator2DAttn(nn.Module):
    """Transformer discriminator over patchified (zi‖zt) latents with
    timestep AdaLN (reference ``Discriminator2DAttn:376-470``)."""

    latent_width: int = 32
    latent_height: int = 32
    patch_size: int = 2
    head_dim: int = 64
    heads: int = 12
    num_layers: int = 8
    mlp_hidden_dim: int = 512
    use_sigmoid: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_hidden_states: jax.Array,
                 timestep: jax.Array) -> jax.Array:
        from ..ops import embeddings as emb_ops
        from ..models.blocks import (AdaLayerNorm, DiTBlock, Mlp, PatchEmbed,
                                     TimestepEmbedding)

        hidden = self.heads * self.head_dim
        n = image_hidden_states.shape[0]
        iph = self.latent_height // self.patch_size
        ipw = self.latent_width // self.patch_size

        emb = TimestepEmbedding(hidden, 512, name="time_embedding",
                                dtype=self.dtype)(timestep)
        x = PatchEmbed(self.patch_size, hidden, name="image_patch_embed",
                       dtype=self.dtype)(image_hidden_states)
        pos = jnp.asarray(emb_ops.get_2d_sincos_pos_embed(
            hidden, (iph, ipw))).astype(self.dtype)
        x = x + pos[None]
        for i in range(self.num_layers):
            x = DiTBlock(hidden, self.heads, self.head_dim,
                         name=f"blocks_{i}", dtype=self.dtype)(x, emb)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_final")(x)
        x = AdaLayerNorm(hidden, name="norm_out", dtype=self.dtype)(x, emb)
        x = x.reshape(n, -1)
        x = Mlp(self.mlp_hidden_dim, 1, name="mlp", dtype=self.dtype)(x)[:, 0]
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
