"""Convolutional block library (SD-VAE-style stacks) in NHWC layout.

Formula-compatible with the diffusers blocks the reference composes
(``ResnetBlock2D``, ``Downsample2D``, ``Upsample2D``, ``UNetMidBlock2D``;
reference: ``model/modules.py:53-649``) so torch checkpoints convert 1:1.

TPU-first: everything is NHWC (XLA's preferred conv layout on TPU), with
NCHW<->NHWC transposes only at the public module boundaries (handled by the
callers). GroupNorm+SiLU chains are left to XLA fusion — profiling showed the
convs dominate; see ops/pallas for the attention fast path.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import attention as attn_ops

Dtype = Any


class ResnetBlock2D(nn.Module):
    """GN -> SiLU -> conv3x3 -> GN -> SiLU -> conv3x3 (+1x1 shortcut),
    matching diffusers ``ResnetBlock2D`` with default settings."""

    out_channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # NHWC
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1",
                    dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2",
                    dtype=self.dtype)(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut",
                        dtype=self.dtype)(x)
        return x + h


class Downsample2D(nn.Module):
    """Stride-2 conv with asymmetric (0,1,0,1) padding, as the diffusers VAE
    encoder uses (``Downsample2D(use_conv=True, padding=0)`` + F.pad)."""

    out_channels: int
    asymmetric_pad: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.asymmetric_pad:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = "VALID"
        else:
            pad = 1
        return nn.Conv(self.out_channels, (3, 3), strides=2, padding=pad,
                       name="conv", dtype=self.dtype)(x)


class Upsample2D(nn.Module):
    """2x nearest-neighbour upsample + conv3x3 (diffusers ``Upsample2D``)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.out_channels, (3, 3), padding=1, name="conv",
                       dtype=self.dtype)(x)


class AttentionBlock2D(nn.Module):
    """Single-head spatial self-attention over HW tokens with a GroupNorm
    front (diffusers VAE mid-block ``Attention`` with head_dim=C)."""

    channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # NHWC
        n, h, w, c = x.shape
        res = x
        y = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         name="group_norm")(x)
        y = y.reshape(n, h * w, c)
        q = nn.Dense(c, name="to_q", dtype=self.dtype)(y)
        k = nn.Dense(c, name="to_k", dtype=self.dtype)(y)
        v = nn.Dense(c, name="to_v", dtype=self.dtype)(y)
        out = attn_ops.sdpa(q[:, None], k[:, None], v[:, None])[:, 0]
        out = nn.Dense(c, name="to_out", dtype=self.dtype)(out)
        return res + out.reshape(n, h, w, c)


class UNetMidBlock2D(nn.Module):
    """resnet -> [attention -> resnet], diffusers ``UNetMidBlock2D`` with
    ``num_layers=1``."""

    channels: int
    groups: int = 32
    add_attention: bool = True
    attention_head_dim: Optional[int] = None  # None -> full channels
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ResnetBlock2D(self.channels, groups=self.groups, name="resnets_0",
                          dtype=self.dtype)(x)
        if self.add_attention:
            x = AttentionBlock2D(self.channels, groups=self.groups,
                                 name="attentions_0", dtype=self.dtype)(x)
        x = ResnetBlock2D(self.channels, groups=self.groups, name="resnets_1",
                          dtype=self.dtype)(x)
        return x


class DownEncoderBlock2D(nn.Module):
    """N resnets + optional downsample (reference ``modules.py:53-114``)."""

    out_channels: int
    num_layers: int = 2
    groups: int = 32
    add_downsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, groups=self.groups,
                              name=f"resnets_{i}", dtype=self.dtype)(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsamplers_0",
                             dtype=self.dtype)(x)
        return x


class UpDecoderBlock2D(nn.Module):
    """N resnets + optional upsample (reference ``modules.py:155-209``)."""

    out_channels: int
    num_layers: int = 2
    groups: int = 32
    add_upsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, groups=self.groups,
                              name=f"resnets_{i}", dtype=self.dtype)(x)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsamplers_0",
                           dtype=self.dtype)(x)
        return x


def nchw_to_nhwc(x: jax.Array) -> jax.Array:
    return x.transpose(0, 2, 3, 1)


def nhwc_to_nchw(x: jax.Array) -> jax.Array:
    return x.transpose(0, 3, 1, 2)


class DownEncoder(nn.Module):
    """Generic conv encoder: conv_in -> down blocks -> mid -> GN/SiLU/conv_out
    (reference ``DuoFrameDownEncoder``/``MotionDownEncoder``/``DownEncoder``,
    ``modules.py:211-480``). NCHW in/out; conv_in kernel size is 3 for the
    duo-frame variant and 1 for the motion/plain variants."""

    block_out_channels: Sequence[int] = (64, 128, 256, 256)
    norm_groups: int = 32
    resnet_layers_per_block: int = 2
    add_attention: bool = True
    conv_in_kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nchw_to_nhwc(x)
        k = self.conv_in_kernel
        x = nn.Conv(self.block_out_channels[0], (k, k),
                    padding=(k - 1) // 2, name="conv_in", dtype=self.dtype)(x)
        for i, ch in enumerate(self.block_out_channels):
            x = DownEncoderBlock2D(
                ch, num_layers=self.resnet_layers_per_block,
                groups=self.norm_groups,
                add_downsample=i != len(self.block_out_channels) - 1,
                name=f"downblock_{i}", dtype=self.dtype)(x)
        x = UNetMidBlock2D(self.block_out_channels[-1],
                           groups=self.norm_groups,
                           add_attention=self.add_attention,
                           name="mid_block", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(self.block_out_channels[-1], (3, 3), padding=1,
                    name="conv_out", dtype=self.dtype)(x)
        return nhwc_to_nchw(x)


class Upsampler(nn.Module):
    """Generic conv decoder: conv_in -> mid -> up blocks -> GN/SiLU/conv_out
    [-> conv_final] (reference ``Upsampler``, ``modules.py:482-587``)."""

    block_out_channels: Sequence[int] = (256, 256, 128, 64)
    out_channel: Optional[int] = None
    norm_groups: int = 8
    resnet_layers_per_block: int = 2
    add_attention: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nchw_to_nhwc(x)
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                    name="conv_in", dtype=self.dtype)(x)
        x = UNetMidBlock2D(self.block_out_channels[0], groups=self.norm_groups,
                           add_attention=self.add_attention,
                           name="mid_block", dtype=self.dtype)(x)
        for i, ch in enumerate(self.block_out_channels):
            x = UpDecoderBlock2D(
                ch, num_layers=self.resnet_layers_per_block,
                groups=self.norm_groups,
                add_upsample=i != len(self.block_out_channels) - 1,
                name=f"upblock_{i}", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(self.block_out_channels[-1], (3, 3), padding=1,
                    name="conv_out", dtype=self.dtype)(x)
        if self.out_channel is not None:
            x = nn.Conv(self.out_channel, (3, 3), padding=1,
                        name="conv_final", dtype=self.dtype)(x)
        return nhwc_to_nchw(x)


class MapConv(nn.Module):
    """Shape-preserving channel mapper: conv_in -> mid(attn) -> N resnets ->
    conv_out (reference ``MapConv``, ``modules.py:590-649``)."""

    hidden: int = 640
    out_channel: int = 4
    block_layer: int = 8
    groups: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nchw_to_nhwc(x)
        x = nn.Conv(self.hidden, (3, 3), padding=1, name="conv_in",
                    dtype=self.dtype)(x)
        x = UNetMidBlock2D(self.hidden, groups=self.groups,
                           name="mid_block", dtype=self.dtype)(x)
        for i in range(self.block_layer):
            x = ResnetBlock2D(self.hidden, groups=self.groups,
                              name=f"map_{i}", dtype=self.dtype)(x)
        x = nn.Conv(self.out_channel, (3, 3), padding=1, name="conv_out",
                    dtype=self.dtype)(x)
        return nhwc_to_nchw(x)
