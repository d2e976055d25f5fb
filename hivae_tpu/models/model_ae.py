"""Legacy CNN motion autoencoder (BASELINE config 1 surface).

Capability parity with the reference's ``AMDModel1`` (reference:
``model/model_AE.py:27-95``): per-frame duo-frame mix (shifted ‖ current) ->
``DuoFrameDownEncoder`` -> ``Upsampler`` -> ``MapConv`` -> next-frame
prediction, trained with l2 over frames 1..T.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .conv_blocks import DownEncoder, MapConv, Upsampler

Dtype = Any


class CNNMotionAE(nn.Module):
    inchannel: int = 4
    upsampler_outchannel: int = 4
    block_out_channels_down: Sequence[int] = (64, 128, 256, 256)
    norm_groups: int = 4
    dtype: Dtype = jnp.float32

    def setup(self):
        down = tuple(self.block_out_channels_down)
        self.dfd_encoder = DownEncoder(
            block_out_channels=down, norm_groups=self.norm_groups,
            conv_in_kernel=3, dtype=self.dtype)
        self.upsampler = Upsampler(
            block_out_channels=tuple(reversed(down)),
            out_channel=self.upsampler_outchannel,
            norm_groups=self.norm_groups, dtype=self.dtype)
        self.mapconv = MapConv(
            out_channel=self.inchannel, groups=2, dtype=self.dtype)

    def __call__(self, video: jax.Array) -> jax.Array:
        """video (B,T,C,H,W) latents -> predicted frames (B,T,C,H,W)."""
        b, t, c, h, w = video.shape
        ff = video[:, :1]
        shift_video = jnp.concatenate([ff, video[:, :-1]], axis=1)
        duo = jnp.concatenate([shift_video, video], axis=2)
        duo = duo.reshape(b * t, 2 * c, h, w)

        motion = self.dfd_encoder(duo)          # (BT, latent, h/8, w/8)
        motion = self.upsampler(motion)          # (BT, out, h, w)
        motion = motion.reshape(b, t, -1, h, w)
        mix = jnp.concatenate([shift_video, motion], axis=2)
        pred = self.mapconv(mix.reshape(b * t, -1, h, w))
        return pred.reshape(b, t, c, h, w)

    def loss(self, pred: jax.Array, gt: jax.Array) -> jax.Array:
        d = pred[:, 1:].astype(jnp.float32) - gt[:, 1:].astype(jnp.float32)
        return jnp.mean(jnp.square(d))
