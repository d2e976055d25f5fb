"""Masked Autoencoder ViT on VAE latents.

Capability parity with the reference MAE (reference:
``model/model_MAE.py:32-371``): patchify 4x32x32 latents, random masking,
ViT encoder with cls token + fixed sincos positions, lightweight decoder
with mask tokens, per-patch (optionally pix-normalized) MSE on masked
patches. Factories MAE_S (~150M) / MAE_L (~500M).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import embeddings as emb_ops
from .blocks import Attention, PatchEmbed

Dtype = Any


class ViTBlock(nn.Module):
    """timm-style ViT block: LN -> MHA(qkv_bias) -> LN -> MLP(gelu)."""

    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + Attention(self.dim, self.heads, self.dim // self.heads,
                          qk_norm=False, name="attn", dtype=self.dtype)(h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1",
                     dtype=self.dtype)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_fc2", dtype=self.dtype)(h)
        return x + h


def _pos_embed_with_cls(dim: int, h: int, w: int) -> np.ndarray:
    pos = emb_ops.get_2d_sincos_pos_embed(dim, (h, w))
    return np.concatenate([np.zeros((1, dim), np.float32), pos], axis=0)


class MaskedAutoencoderViT(nn.Module):
    img_size: Tuple[int, int] = (32, 32)
    patch_size: int = 2
    in_chans: int = 4
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_pix_loss: bool = False
    dtype: Dtype = jnp.float32

    @property
    def grid(self):
        return (self.img_size[0] // self.patch_size,
                self.img_size[1] // self.patch_size)

    def patchify(self, imgs: jax.Array) -> jax.Array:
        n, c, h, w = imgs.shape
        p = self.patch_size
        x = imgs.reshape(n, c, h // p, p, w // p, p)
        x = x.transpose(0, 2, 4, 3, 5, 1)  # n h w p p c (MAE layout)
        return x.reshape(n, (h // p) * (w // p), p * p * c)

    def unpatchify(self, x: jax.Array) -> jax.Array:
        n, s, d = x.shape
        p = self.patch_size
        gh, gw = self.grid
        c = d // (p * p)
        x = x.reshape(n, gh, gw, p, p, c).transpose(0, 5, 1, 3, 2, 4)
        return x.reshape(n, c, gh * p, gw * p)

    @nn.compact
    def __call__(self, imgs: jax.Array, mask_ratio: float = 0.75):
        """Training forward -> (loss, pred_patches, mask)."""
        n = imgs.shape[0]
        gh, gw = self.grid
        num_patches = gh * gw
        len_keep = int(num_patches * (1 - mask_ratio))

        # ---- encoder ----
        x = PatchEmbed(self.patch_size, self.embed_dim, name="patch_embed",
                       dtype=self.dtype)(imgs)
        pos = jnp.asarray(_pos_embed_with_cls(self.embed_dim, gh, gw)
                          ).astype(self.dtype)
        x = x + pos[None, 1:]

        noise = jax.random.uniform(self.make_rng("mask"), (n, num_patches))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
        mask = jnp.ones((n, num_patches))
        mask = mask.at[:, :len_keep].set(0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.embed_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype) + pos[None, :1],
                              (n, 1, self.embed_dim)), x], axis=1)
        for i in range(self.depth):
            x = ViTBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                         name=f"blocks_{i}", dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)

        # ---- decoder ----
        x = nn.Dense(self.decoder_embed_dim, name="decoder_embed",
                     dtype=self.dtype)(x)
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, self.decoder_embed_dim))
        mask_tokens = jnp.broadcast_to(
            mask_token.astype(self.dtype),
            (n, num_patches - len_keep, self.decoder_embed_dim))
        x_ = jnp.concatenate([x[:, 1:], mask_tokens], axis=1)
        x_ = jnp.take_along_axis(x_, ids_restore[:, :, None], axis=1)
        x = jnp.concatenate([x[:, :1], x_], axis=1)
        dpos = jnp.asarray(_pos_embed_with_cls(self.decoder_embed_dim, gh, gw)
                           ).astype(self.dtype)
        x = x + dpos[None]
        for i in range(self.decoder_depth):
            x = ViTBlock(self.decoder_embed_dim, self.decoder_num_heads,
                         self.mlp_ratio, name=f"decoder_blocks_{i}",
                         dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-6, name="decoder_norm")(x)
        pred = nn.Dense(self.patch_size ** 2 * self.in_chans,
                        name="decoder_pred", dtype=self.dtype)(x)[:, 1:]

        # ---- loss ----
        target = self.patchify(imgs)
        if self.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        loss = jnp.mean(jnp.square(pred.astype(jnp.float32) -
                                   target.astype(jnp.float32)), axis=-1)
        loss = jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1)
        return loss, pred, mask

    def reconstruct(self, imgs: jax.Array) -> jax.Array:
        """mask_ratio=0 encode/decode round trip -> (N,C,H,W)."""
        _, pred, _ = self(imgs, mask_ratio=0.0)
        return self.unpatchify(pred)


def MAE_S(dtype=jnp.float32, **kw) -> MaskedAutoencoderViT:
    return MaskedAutoencoderViT(embed_dim=768, depth=12, num_heads=12,
                                decoder_embed_dim=512, decoder_depth=8,
                                decoder_num_heads=16, dtype=dtype, **kw)


def MAE_L(dtype=jnp.float32, **kw) -> MaskedAutoencoderViT:
    return MaskedAutoencoderViT(embed_dim=1024, depth=24, num_heads=16,
                                decoder_embed_dim=512, decoder_depth=8,
                                decoder_num_heads=16, dtype=dtype, **kw)


MAE_MODELS = {"MAE_S": MAE_S, "MAE_L": MAE_L}
