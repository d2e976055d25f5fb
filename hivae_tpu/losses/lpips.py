"""LPIPS perceptual metric (VGG16, 5 slices, learned 1x1 heads).

Formula parity with the reference's stripped LPIPS (reference:
``model/lpips.py:9-122``): input scaling layer, VGG16 relu{1_2,2_2,3_3,4_3,
5_3} features, channel-unit-normalization, squared diffs, 1x1 lin heads,
spatial average, sum over slices.

Weights convert from the torchvision VGG16 state dict (``features.N.*``) and
the LPIPS ``vgg.pth`` head checkpoint (``lin{k}.model.1.weight``) via
``utils/torch_convert`` (see the name rules added there).
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# torchvision VGG16 conv layer indices and channels; 'M' = maxpool
_VGG16 = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
          512, 512, 512, "M", 512, 512, 512, "M"]
# feature-map taps (after the relu of these conv indices in nn.Sequential)
_SLICE_ENDS = {3, 8, 15, 22, 29}

_SHIFT = np.array([-.030, -.088, -.188], np.float32)
_SCALE = np.array([.458, .448, .450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 feature slices; input NCHW in [-1, 1] after LPIPS scaling."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        x = x.transpose(0, 2, 3, 1)  # NHWC
        outs = []
        seq_idx = 0
        for spec in _VGG16:
            if spec == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                seq_idx += 1
                continue
            x = nn.Conv(spec, (3, 3), padding=1, name=f"features_{seq_idx}",
                        dtype=self.dtype)(x)
            seq_idx += 1
            x = nn.relu(x)
            if seq_idx in _SLICE_ENDS:
                outs.append(x)
            seq_idx += 1
        return outs  # 5 NHWC feature maps


class LPIPS(nn.Module):
    """Perceptual distance; inputs NCHW in [-1, 1]. Returns (N,1,1,1)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        shift = jnp.asarray(_SHIFT)[None, :, None, None]
        scale = jnp.asarray(_SCALE)[None, :, None, None]
        net = VGG16Features(name="net", dtype=self.dtype)
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)

        def unit_norm(f, eps=1e-10):
            n = jnp.sqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True))
            return f / (n + eps)

        val = 0.0
        for k, (a, b) in enumerate(zip(fx, fy)):
            diff = jnp.square(unit_norm(a) - unit_norm(b))
            w = nn.Dense(1, use_bias=False, name=f"lin{k}",
                         dtype=self.dtype)(diff)  # 1x1 conv == dense on C
            val = val + jnp.mean(w, axis=(1, 2), keepdims=True)
        return val.transpose(0, 3, 1, 2)  # (N,1,1,1), torch layout
