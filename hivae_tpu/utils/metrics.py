"""Quality metrics: PSNR / SSIM / LPIPS wrappers.

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


def ssim(pred: jax.Array, gt: jax.Array, data_range: float = 2.0,
         window: int = 11, sigma: float = 1.5) -> jax.Array:
    """Structural similarity (Wang et al. 2004): Gaussian-windowed local
    statistics, K1=0.01 / K2=0.03 — the convention of torchmetrics /
    skimage ``gaussian_weights=True``. Accepts (...,C,H,W); frames and
    channels are averaged. The windowed conv is depthwise so the whole
    metric is one XLA program on TPU."""
    x = pred.astype(jnp.float32)
    y = gt.astype(jnp.float32)
    x = x.reshape((-1, 1) + x.shape[-2:])   # (N*C, 1, H, W) depthwise
    y = y.reshape((-1, 1) + y.shape[-2:])

    r = window // 2
    g = jnp.exp(-0.5 * (jnp.arange(window, dtype=jnp.float32) - r) ** 2
                / sigma ** 2)
    g = g / g.sum()
    kern = (g[:, None] * g[None, :])[None, None]  # (1,1,w,w)

    def blur(v):
        return jax.lax.conv_general_dilated(
            v, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    mu_x, mu_y = blur(x), blur(y)
    sxx = blur(x * x) - mu_x * mu_x
    syy = blur(y * y) - mu_y * mu_y
    sxy = blur(x * y) - mu_x * mu_y

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (sxx + syy + c2)
    return jnp.mean(num / den)


def lpips_distance(lpips_model, lpips_params, pred: jax.Array,
                   gt: jax.Array) -> jax.Array:
    """Mean LPIPS over a batch of frames (NCHW in [-1,1])."""
    if pred.ndim == 5:
        pred = pred.reshape((-1,) + pred.shape[2:])
        gt = gt.reshape((-1,) + gt.shape[2:])
    return jnp.mean(lpips_model.apply(lpips_params, pred, gt))
