"""Motion encoders: learnable motion tokens attending over frame latents.

Capability parity with the reference's three encoders + sequence-level motion
transformer (reference: ``model/transformer.py:36-699``):

  * ``MotionEncoderSpatial``      — per-frame spatial encoding (reference
    ``MotionEncoderLearnTokenTransformer:36-192``): motion tokens prepended to
    patchified frame tokens, N self-attn layers, tokens projected out.
  * ``MotionEncoderSpatialTemporal`` — adds per-layer temporal mixing of the
    target-frame motion tokens (reference ``...TemporalTransformer:195-397``).
    Note: we split source/target along the *frame* axis (the stated intent);
    the reference's batch-axis chunk (``transformer.py:342``) only coincides
    with this for batch size 1.
  * ``MotionEncoderTemporalCross`` — camera branch: per-pixel temporal tubes
    as KV, learnable temporal query tokens, cross-attn only (reference
    ``...OnlyTemporalTransformer:406-586``). Output is (N, T, S, C) — one
    token per spatial site per frame.
  * ``MotionSequenceTransformer`` — optional transformer over flattened
    (frames x tokens) motion sequences (reference ``MotionTransformer:590-699``).

All encodings are pure; random masking takes an explicit PRNG key via flax's
'mask' rng collection and is enabled only when a static ``mask_ratio`` is
passed (jit-compatible: the kept length is static).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import embeddings as emb_ops
from .blocks import (BasicCrossTransformerBlock, BasicTransformerBlock,
                     MotionTemporalBlock, PatchEmbed)

Dtype = Any


def random_mask_tokens(key: jax.Array, x: jax.Array, mask_ratio: float,
                       axis: int = 1) -> jax.Array:
    """Keep a random subset of ``(1-mask_ratio)`` tokens along ``axis`` by
    per-sample shuffling (reference ``random_masking``,
    ``transformer.py:164-192``). Returns only the kept tokens (static shape)."""
    n = x.shape[0]
    length = x.shape[axis]
    len_keep = int(length * (1 - mask_ratio))
    noise = jax.random.uniform(key, (n, length))
    ids_shuffle = jnp.argsort(noise, axis=1)[:, :len_keep]  # (N, keep)
    idx = ids_shuffle.reshape((n,) + (1,) * (axis - 1) + (len_keep,) +
                              (1,) * (x.ndim - axis - 1))
    return jnp.take_along_axis(x, idx, axis=axis)


def shuffle_mask_tokens(key: jax.Array, x: jax.Array, mask_ratio: jax.Array,
                        axis: int = 1):
    """Traced-ratio masking at static shape: per-sample shuffle along
    ``axis`` (full length kept) plus a boolean keep-mask over the first
    ``floor(L * (1 - ratio))`` slots, where the ratio — and hence the kept
    count — is a *traced* scalar (the per-step jitter of reference
    ``model_AMD.py:1857-1862``). Excluding the dropped slots as attention
    keys is numerically identical to the reference's gather: the kept set is
    the same uniformly random subset, only its masked complement stays in
    the sequence as inert rows.

    Returns (x_shuffled, keep_mask (N, L) bool)."""
    n = x.shape[0]
    length = x.shape[axis]
    noise = jax.random.uniform(key, (n, length))
    ids_shuffle = jnp.argsort(noise, axis=1)  # (N, L)
    idx = ids_shuffle.reshape((n,) + (1,) * (axis - 1) + (length,) +
                              (1,) * (x.ndim - axis - 1))
    x = jnp.take_along_axis(x, idx, axis=axis)
    len_keep = jnp.floor(length * (1.0 - mask_ratio)).astype(jnp.int32)
    keep = jnp.arange(length)[None, :] < len_keep
    return x, jnp.broadcast_to(keep, (n, length))


class MotionEncoderSpatial(nn.Module):
    """Per-frame spatial motion encoder with learnable tokens."""

    img_height: int = 32
    img_width: int = 32
    img_inchannel: int = 4
    img_patch_size: int = 2
    motion_token_num: int = 12
    motion_channel: int = 128
    need_norm_out: bool = True
    heads: int = 12
    head_dim: int = 64
    num_layers: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array,
                 mask_ratio: Optional[float] = None) -> jax.Array:
        """video: (N, T, C, H, W) -> motion tokens (N, T, L, motion_channel)."""
        n, t, c, h, w = video.shape
        hidden = self.heads * self.head_dim
        iph, ipw = self.img_height // self.img_patch_size, self.img_width // self.img_patch_size

        motion_token = self.param(
            "motion_token", lambda k: 0.02 * jax.random.normal(
                k, (1, self.motion_token_num, self.motion_channel)))
        mtok = nn.Dense(hidden, name="motion_embed",
                        dtype=self.dtype)(motion_token.astype(self.dtype))
        mtok = jnp.broadcast_to(mtok, (n * t,) + mtok.shape[1:])

        x = video.reshape(n * t, c, h, w)
        x = PatchEmbed(self.img_patch_size, hidden, name="patch_embed",
                       dtype=self.dtype)(x)
        pos = jnp.asarray(emb_ops.get_2d_sincos_pos_embed(hidden, (iph, ipw)))
        x = x + pos[None].astype(self.dtype)

        key_mask = None
        if mask_ratio is not None:
            if isinstance(mask_ratio, jax.Array):  # traced per-step jitter
                x, keep = shuffle_mask_tokens(self.make_rng("mask"), x,
                                              mask_ratio)
                key_mask = jnp.concatenate(
                    [jnp.ones((x.shape[0], self.motion_token_num), bool),
                     keep], axis=1)
            else:
                x = random_mask_tokens(self.make_rng("mask"), x, mask_ratio)

        hstate = jnp.concatenate([mtok, x], axis=1)
        for i in range(self.num_layers):
            hstate = BasicTransformerBlock(hidden, self.heads, self.head_dim,
                                           name=f"blocks_{i}",
                                           dtype=self.dtype)(hstate, key_mask)

        mtok = hstate[:, :self.motion_token_num]
        mtok = nn.LayerNorm(epsilon=1e-5, name="norm_final")(mtok)
        mtok = nn.Dense(self.motion_channel, name="proj_out",
                        dtype=self.dtype)(mtok)
        if self.need_norm_out:
            mtok = nn.LayerNorm(epsilon=1e-5, use_scale=False, use_bias=False,
                                name="norm_out")(mtok)
        return mtok.reshape(n, t, self.motion_token_num, self.motion_channel)


class MotionEncoderSpatialTemporal(nn.Module):
    """Spatial encoder with interleaved temporal mixing of target tokens."""

    img_height: int = 32
    img_width: int = 32
    img_inchannel: int = 4
    img_patch_size: int = 2
    motion_token_num: int = 12
    motion_channel: int = 128
    need_norm_out: bool = True
    video_frames: int = 16
    heads: int = 12
    head_dim: int = 64
    num_layers: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array,
                 mask_ratio: Optional[float] = None) -> jax.Array:
        """video: (N, 2T', C, H, W) = cat(ref frames, target frames) on T."""
        n, t, c, h, w = video.shape
        half = t // 2
        hidden = self.heads * self.head_dim
        ltok = self.motion_token_num
        iph, ipw = self.img_height // self.img_patch_size, self.img_width // self.img_patch_size

        motion_token = self.param(
            "motion_token", lambda k: 0.02 * jax.random.normal(
                k, (1, ltok, self.motion_channel)))
        mtok = nn.Dense(hidden, name="motion_embed",
                        dtype=self.dtype)(motion_token.astype(self.dtype))
        mtok = jnp.broadcast_to(mtok[None], (n, t, ltok, hidden))
        tpos = jnp.asarray(emb_ops.get_1d_sincos_pos_embed(
            hidden, self.video_frames * ltok)).astype(self.dtype)
        src_tok, tgt_tok = mtok[:, :half], mtok[:, half:]
        tgt_tok = (tgt_tok.reshape(n, half * ltok, hidden) +
                   tpos[None, :half * ltok]).reshape(n, half, ltok, hidden)
        mtok = jnp.concatenate([src_tok, tgt_tok], axis=1).reshape(n * t, ltok, hidden)

        x = video.reshape(n * t, c, h, w)
        x = PatchEmbed(self.img_patch_size, hidden, name="patch_embed",
                       dtype=self.dtype)(x)
        pos = jnp.asarray(emb_ops.get_2d_sincos_pos_embed(hidden, (iph, ipw)))
        x = x + pos[None].astype(self.dtype)
        key_mask = None
        if mask_ratio is not None:
            if isinstance(mask_ratio, jax.Array):  # traced per-step jitter
                x, keep = shuffle_mask_tokens(self.make_rng("mask"), x,
                                              mask_ratio)
                key_mask = jnp.concatenate(
                    [jnp.ones((x.shape[0], ltok), bool), keep], axis=1)
            else:
                x = random_mask_tokens(self.make_rng("mask"), x, mask_ratio)

        hstate = jnp.concatenate([mtok, x], axis=1)
        for i in range(self.num_layers):
            hstate = BasicTransformerBlock(hidden, self.heads, self.head_dim,
                                           name=f"blocks_{i}",
                                           dtype=self.dtype)(hstate, key_mask)
            # temporal mixing over the target-frame tokens
            mtok = hstate[:, :ltok].reshape(n, t, ltok, hidden)
            img = hstate[:, ltok:]
            src_tok, tgt_tok = mtok[:, :half], mtok[:, half:]
            tt = tgt_tok.transpose(0, 2, 1, 3).reshape(n * ltok, half, hidden)
            tt = MotionTemporalBlock(hidden, self.heads, self.head_dim,
                                     name=f"motion_blocks_{i}",
                                     dtype=self.dtype)(tt)
            tgt_tok = tt.reshape(n, ltok, half, hidden).transpose(0, 2, 1, 3)
            mtok = jnp.concatenate([src_tok, tgt_tok], axis=1).reshape(
                n * t, ltok, hidden)
            hstate = jnp.concatenate([mtok, img], axis=1)

        mtok = hstate[:, :ltok]
        mtok = nn.LayerNorm(epsilon=1e-5, name="norm_final")(mtok)
        mtok = nn.Dense(self.motion_channel, name="proj_out", dtype=self.dtype)(mtok)
        if self.need_norm_out:
            mtok = nn.LayerNorm(epsilon=1e-5, use_scale=False, use_bias=False,
                                name="norm_out")(mtok)
        return mtok.reshape(n, t, ltok, self.motion_channel)


class MotionEncoderTemporalCross(nn.Module):
    """Camera-motion encoder: learnable temporal tokens cross-attend to
    per-pixel temporal tubes of the (low-pass) video."""

    img_height: int = 32
    img_width: int = 32
    img_inchannel: int = 4
    img_patch_size: int = 2
    motion_token_num: int = 12
    motion_channel: int = 128
    need_norm_out: bool = True
    video_frames: int = 16
    heads: int = 12
    head_dim: int = 64
    num_layers: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array,
                 mask_ratio: Optional[float] = None) -> jax.Array:
        """video: (N, T, C, H, W) -> camera tokens (N, T, S, motion_channel)
        with S = kept spatial sites (all iph*ipw when mask_ratio is None)."""
        n, t, c, h, w = video.shape
        hidden = self.heads * self.head_dim
        iph, ipw = self.img_height // self.img_patch_size, self.img_width // self.img_patch_size
        s_full = iph * ipw

        x = video.reshape(n * t, c, h, w)
        x = PatchEmbed(self.img_patch_size, hidden, name="patch_embed",
                       dtype=self.dtype)(x)
        spos = jnp.asarray(emb_ops.get_2d_sincos_pos_embed(hidden, (iph, ipw)))
        x = x + spos[None].astype(self.dtype)
        tpos = jnp.asarray(emb_ops.get_1d_sincos_pos_embed(
            hidden, self.video_frames)).astype(self.dtype)
        # add temporal position per pixel tube
        x = x.reshape(n, t, s_full, hidden) + tpos[None, :t, None, :]

        site_keep = None
        if mask_ratio is not None:  # masks spatial sites, shared across time
            if isinstance(mask_ratio, jax.Array):  # traced per-step jitter:
                # all sites stay (each site is an independent batch row
                # here), dropped ones are flagged for the DiT's key mask
                x, site_keep = shuffle_mask_tokens(self.make_rng("mask"), x,
                                                   mask_ratio, axis=2)
            else:
                x = random_mask_tokens(self.make_rng("mask"), x, mask_ratio,
                                       axis=2)
        s = x.shape[2]

        # motion queries: motion_token_num temporal slots stretched to T
        motion_token = self.param(
            "motion_token", lambda k: 0.02 * jax.random.normal(
                k, (1, self.motion_token_num, self.motion_channel)))
        mtok = nn.Dense(hidden, name="motion_embed",
                        dtype=self.dtype)(motion_token.astype(self.dtype))
        mtok = jnp.broadcast_to(mtok[:, None], (n, s, self.motion_token_num, hidden))
        if self.motion_token_num != t:
            if t < self.motion_token_num or t % self.motion_token_num:
                raise ValueError(
                    f"camera encoder: frame count {t} must be a multiple of "
                    f"motion_token_num {self.motion_token_num} (the tokens "
                    f"are stretched to T by repetition) — pick a window "
                    f"that the trained token count divides")
            mtok = jnp.repeat(mtok, t // self.motion_token_num, axis=2)
        mtok = mtok.reshape(n * s, t, hidden) + tpos[None, :t]

        kv = x.transpose(0, 2, 1, 3).reshape(n * s, t, hidden)
        for i in range(self.num_layers):
            mtok = BasicCrossTransformerBlock(hidden, self.heads, self.head_dim,
                                              name=f"blocks_{i}",
                                              dtype=self.dtype)(mtok, kv)

        mtok = nn.LayerNorm(epsilon=1e-5, name="norm_final")(mtok)
        mtok = nn.Dense(self.motion_channel, name="proj_out", dtype=self.dtype)(mtok)
        if self.need_norm_out:
            mtok = nn.LayerNorm(epsilon=1e-5, use_scale=False, use_bias=False,
                                name="norm_out")(mtok)
        # (n*s, t, c) -> (n, t, s, c)
        out = mtok.reshape(n, s, t, self.motion_channel).transpose(0, 2, 1, 3)
        if site_keep is not None:
            return out, site_keep
        return out


class MotionSequenceTransformer(nn.Module):
    """Sequence-level transformer over flattened (F x L) motion tokens."""

    motion_token_num: int = 4
    motion_token_channel: int = 128
    motion_frames: int = 128
    heads: int = 16
    head_dim: int = 64
    num_layers: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, motion: jax.Array) -> jax.Array:
        """motion: (N, F, L, D) -> (N, F, L, D)."""
        n, f, l, d = motion.shape
        hidden = self.heads * self.head_dim
        x = nn.Dense(hidden, name="embed", dtype=self.dtype)(motion)
        pos = jnp.asarray(emb_ops.get_1d_sincos_pos_embed(
            hidden, self.motion_token_num * self.motion_frames)).astype(self.dtype)
        x = x.reshape(n, f * l, hidden) + pos[None, :f * l]
        for i in range(self.num_layers):
            x = BasicTransformerBlock(hidden, self.heads, self.head_dim,
                                      name=f"blocks_{i}", dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_final")(x)
        x = nn.Dense(self.motion_token_channel, name="proj_out",
                     dtype=self.dtype)(x)
        return x.reshape(n, f, l, self.motion_token_channel)
