"""AutoencoderKL — the frozen SD-VAE latent path, rebuilt for TPU.

Formula-compatible with diffusers ``AutoencoderKL`` in the sd-vae-ft-mse
configuration the reference freezes (reference: ``train_amd.py:222``,
``model/utils.py:117-156``): 256x256 RGB <-> 4x32x32 latents with scaling
factor 0.18215. Torch safetensors weights convert 1:1
(``utils/torch_convert.py``).

TPU-first: NHWC conv layout internally; encode/decode are pure functions that
batch all frames of a clip into one conv stack invocation (the reference
loops chunks of 16 frames on GPU); bf16-friendly with fp32 GroupNorm.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.regularizers import DiagonalGaussian
from .conv_blocks import (DownEncoderBlock2D, UNetMidBlock2D, UpDecoderBlock2D,
                          nchw_to_nhwc, nhwc_to_nchw)

Dtype = Any

SD_VAE_SCALE = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = SD_VAE_SCALE


class VAEEncoder(nn.Module):
    cfg: VAEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # NHWC -> NHWC moments
        c = self.cfg
        x = nn.Conv(c.block_out_channels[0], (3, 3), padding=1,
                    name="conv_in", dtype=self.dtype)(x)
        for i, ch in enumerate(c.block_out_channels):
            x = DownEncoderBlock2D(
                ch, num_layers=c.layers_per_block, groups=c.norm_num_groups,
                add_downsample=i != len(c.block_out_channels) - 1,
                name=f"down_blocks_{i}", dtype=self.dtype)(x)
        x = UNetMidBlock2D(c.block_out_channels[-1], groups=c.norm_num_groups,
                           name="mid_block", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=c.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * c.latent_channels, (3, 3), padding=1,
                       name="conv_out", dtype=self.dtype)(x)


class VAEDecoder(nn.Module):
    cfg: VAEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:  # NHWC latent -> NHWC img
        c = self.cfg
        rev = tuple(reversed(c.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, name="conv_in",
                    dtype=self.dtype)(z)
        x = UNetMidBlock2D(rev[0], groups=c.norm_num_groups,
                           name="mid_block", dtype=self.dtype)(x)
        for i, ch in enumerate(rev):
            x = UpDecoderBlock2D(
                ch, num_layers=c.layers_per_block + 1,
                groups=c.norm_num_groups,
                add_upsample=i != len(rev) - 1,
                name=f"up_blocks_{i}", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=c.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(c.out_channels, (3, 3), padding=1, name="conv_out",
                       dtype=self.dtype)(x)


class AutoencoderKL(nn.Module):
    """KL-regularized conv autoencoder. Public API is NCHW like the torch
    reference; ``encode`` returns distribution moments, ``decode`` maps
    latents back to images."""

    cfg: VAEConfig = VAEConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = VAEEncoder(self.cfg, dtype=self.dtype)
        self.decoder = VAEDecoder(self.cfg, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  name="quant_conv", dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       name="post_quant_conv", dtype=self.dtype)

    def encode_moments(self, x: jax.Array) -> jax.Array:
        """(N,C,H,W) image -> (N,2*latent,h,w) distribution moments."""
        h = self.encoder(nchw_to_nhwc(x))
        return nhwc_to_nchw(self.quant_conv(h))

    def decode(self, z: jax.Array) -> jax.Array:
        """(N,latent,h,w) -> (N,C,H,W) image."""
        h = self.post_quant_conv(nchw_to_nhwc(z))
        return nhwc_to_nchw(self.decoder(h))

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None):
        moments = self.encode_moments(x)
        dist = DiagonalGaussian.from_params(moments, axis=1)
        z = dist.sample(key) if key is not None else dist.mode()
        return self.decode(z), dist


# -----------------------------------------------------------------------------
# Pure helpers mirroring model/utils.py:117-156
# -----------------------------------------------------------------------------


def vae_encode(vae: AutoencoderKL, params, video: jax.Array,
               key: Optional[jax.Array] = None,
               scale: float = SD_VAE_SCALE) -> jax.Array:
    """(N,T,C,H,W) pixels -> (N,T,latent,h,w) scaled latents.

    Reference ``vae_encode`` samples from the posterior (``utils.py:133``);
    pass ``key=None`` for the deterministic mode used at eval.
    """
    n, t = video.shape[:2]
    flat = video.reshape((n * t,) + video.shape[2:])
    moments = vae.apply(params, flat, method="encode_moments")
    dist = DiagonalGaussian.from_params(moments, axis=1)
    z = dist.sample(key) if key is not None else dist.mode()
    z = z * scale
    return z.reshape((n, t) + z.shape[1:])


def vae_decode(vae: AutoencoderKL, params, latents: jax.Array,
               scale: float = SD_VAE_SCALE,
               quant_table=None) -> jax.Array:
    """(N,T,latent,h,w) scaled latents -> (N,T,C,H,W) pixels in [-1,1].

    ``quant_table`` (``ops.quant.quantize_params(vae_params,
    scope=("decoder",))``) runs the decoder's large convs and mid-block
    attention on the int8 MXU — the w8a8 serving path; the sensitive
    boundary convs stay bf16, and the decoder scope keeps the table free
    of encode-leg entries so ``strip_quantized`` stays safe for encode.
    """
    from ..ops.quant import maybe_quantized

    n, t = latents.shape[:2]
    flat = latents.reshape((n * t,) + latents.shape[2:]) / scale
    with maybe_quantized(quant_table):
        img = vae.apply(params, flat, method="decode")
    return img.reshape((n, t) + img.shape[1:])


def latents_to_rgb(img: jax.Array) -> jax.Array:
    """[-1,1] float -> [0,255] uint8 (reference ``latents_to_videos``)."""
    img = jnp.clip(img / 2 + 0.5, 0.0, 1.0)
    return (img * 255).astype(jnp.uint8)


def vae_decode_rgb(vae: AutoencoderKL, params, latents: jax.Array,
                   scale: float = SD_VAE_SCALE,
                   quant_table=None) -> jax.Array:
    """Decode + quantize in one program so hosts fetch uint8, not bf16."""
    return latents_to_rgb(vae_decode(vae, params, latents, scale,
                                     quant_table=quant_table))


# Jitted entry points for pipelines/CLIs. The module is a static argument
# (hashable frozen dataclass) and params stay traced arguments — closing over
# them would bake ~80M weights into the HLO as constants.
vae_encode_jit = jax.jit(vae_encode, static_argnums=(0,),
                         static_argnames=("scale",))
vae_decode_jit = jax.jit(vae_decode, static_argnums=(0,),
                         static_argnames=("scale",))
vae_decode_rgb_jit = jax.jit(vae_decode_rgb, static_argnums=(0,),
                             static_argnames=("scale",))
