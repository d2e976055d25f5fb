"""Quality metrics: PSNR / SSIM-lite / LPIPS wrappers.

The reference's ``model/metric.py`` is fully commented out; these are the
working equivalents used by tests and benchmarks (BASELINE: PSNR within
0.1 dB, LPIPS tolerance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(pred: jax.Array, gt: jax.Array, data_range: float = 2.0) -> jax.Array:
    """Peak signal-to-noise ratio in dB; default range 2.0 for [-1,1] video."""
    mse = jnp.mean(jnp.square(pred.astype(jnp.float32) -
                              gt.astype(jnp.float32)))
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def lpips_distance(lpips_model, lpips_params, pred: jax.Array,
                   gt: jax.Array) -> jax.Array:
    """Mean LPIPS over a batch of frames (NCHW in [-1,1])."""
    if pred.ndim == 5:
        pred = pred.reshape((-1,) + pred.shape[2:])
        gt = gt.reshape((-1,) + gt.shape[2:])
    return jnp.mean(lpips_model.apply(lpips_params, pred, gt))
