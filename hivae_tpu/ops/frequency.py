"""3-D frequency-domain band splitting (camera/object motion decoupling).

Capability parity with the reference's FFT Gaussian low/high-pass split
(reference: ``model/frequency_utils.py:45-108``) rebuilt for XLA:

  * the Gaussian mask is computed once in numpy at trace time (static shapes)
    and pre-``ifftshift``-ed, so the runtime path is a single ``fftn`` +
    ``ifftn`` pair with an elementwise multiply — no runtime ``fftshift``;
  * the high band is recovered as ``x - low`` (exact for real inputs since the
    inverse FFT is linear), saving a second inverse FFT versus the reference.

FFTs run in fp32: TPU has no native complex64 MXU path, and the latent volumes
involved (T<=33, H=W=32) are tiny, so this is bandwidth- not compute-bound.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _gaussian_lpf_np(shape: Tuple[int, int, int], d_s: float, d_t: float,
                     shifted: bool) -> np.ndarray:
    """Gaussian low-pass mask over centred normalized (T,H,W) frequencies.

    Matches ``frequency_utils.gaussian_low_pass_filter``: coordinates
    ``arange(n)*2/n - 1`` per axis and mask ``exp(-0.5 * d^2)`` with axis
    weights ``1/d_t`` (temporal) and ``1/d_s`` (spatial). When ``shifted`` the
    mask is ``ifftshift``-ed so it applies directly to unshifted FFT output.
    """
    T, H, W = shape
    if d_s == 0 or d_t == 0:
        return np.zeros(shape, dtype=np.float32)
    t = (np.arange(T, dtype=np.float32) * 2.0 / T - 1.0) / d_t
    h = (np.arange(H, dtype=np.float32) * 2.0 / H - 1.0) / d_s
    w = (np.arange(W, dtype=np.float32) * 2.0 / W - 1.0) / d_s
    d2 = (t[:, None, None] ** 2 + h[None, :, None] ** 2 + w[None, None, :] ** 2)
    mask = np.exp(-0.5 * d2).astype(np.float32)
    if shifted:
        mask = np.fft.ifftshift(mask)
    return mask


def gaussian_low_pass_filter(shape, d_s: float = 0.25, d_t: float = 0.25) -> jax.Array:
    """Centred (fftshift-convention) Gaussian low-pass mask, broadcast to
    ``shape`` if more than 3 dims are given (reference ``:45-81``)."""
    T, H, W = shape[-3], shape[-2], shape[-1]
    mask = jnp.asarray(_gaussian_lpf_np((T, H, W), float(d_s), float(d_t), False))
    if len(shape) > 3:
        mask = jnp.broadcast_to(mask, tuple(shape))
    return mask


def freq_3d_filter(x: jax.Array, lpf: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Split ``x`` into (low, high) bands with a centred low-pass mask.

    Functionally identical to the reference's fftshift->mask->ifftshift chain
    (``frequency_utils.py:84-108``); the shifts are folded into the mask.
    """
    lpf3 = jnp.fft.ifftshift(lpf, axes=(-3, -2, -1))
    return _split(x, lpf3)


@lru_cache(maxsize=64)
def _axis_lowpass_op(n: int, d: float) -> np.ndarray:
    """Complex matrix M = IFFT . diag(g) . FFT for one axis, where g is the
    reference's per-axis Gaussian factor exp(-0.5 ((i*2/n - 1)/d)^2) in
    centred order. Applying M along each of (T,H,W) reproduces the 3-D mask
    exactly because the Gaussian factorizes per axis."""
    coords = (np.arange(n, dtype=np.float64) * 2.0 / n - 1.0) / d
    g = np.fft.ifftshift(np.exp(-0.5 * coords ** 2))
    F = np.fft.fft(np.eye(n))
    M = np.fft.ifft(g[:, None] * F, axis=0)
    return M.astype(np.complex64)


def freq_3d_split(x: jax.Array, d_s: float, d_t: float) -> Tuple[jax.Array, jax.Array]:
    """Band split for static cutoffs — the hot path used by the AMD models.

    TPU-first: instead of a 3-D FFT (slow on TPU, and XLA:CPU's FFT chokes on
    sharded layouts), the separable Gaussian low-pass is applied as three
    small complex DFT matmuls, which land on the MXU. Bit-equivalent to the
    reference's fftshift->mask->ifftshift chain up to fp rounding.
    """
    t, h, w = x.shape[-3], x.shape[-2], x.shape[-1]
    if d_s == 0 or d_t == 0:
        zeros = jnp.zeros_like(x)
        return zeros, x
    mt = jnp.asarray(_axis_lowpass_op(t, float(d_t)))
    mh = jnp.asarray(_axis_lowpass_op(h, float(d_s)))
    mw = jnp.asarray(_axis_lowpass_op(w, float(d_s)))
    y = x.astype(jnp.complex64)
    y = jnp.einsum("...thw,Ww->...thW", y, mw)
    y = jnp.einsum("...thw,Hh->...tHw", y, mh)
    y = jnp.einsum("...thw,Tt->...Thw", y, mt)
    low = y.real.astype(x.dtype)
    return low, x - low


def _split(x: jax.Array, shifted_lpf: jax.Array) -> Tuple[jax.Array, jax.Array]:
    orig_dtype = x.dtype
    xf = jnp.fft.fftn(x.astype(jnp.float32), axes=(-3, -2, -1))
    low = jnp.fft.ifftn(xf * shifted_lpf, axes=(-3, -2, -1)).real
    high = x.astype(jnp.float32) - low
    return low.astype(orig_dtype), high.astype(orig_dtype)


def get_views(video_length: int, window_size: int = 16, stride: int = 4):
    """Sliding temporal windows over a long video (reference ``:25-32``)."""
    num_blocks_time = (video_length - window_size) // stride + 1
    return [(int(i * stride), int(i * stride) + window_size)
            for i in range(num_blocks_time)]


def generate_weight_sequence(n: int):
    """Triangular blending weights for overlapped windows (reference ``:35-42``)."""
    if n % 2 == 0:
        m = n // 2
        return list(range(1, m + 1)) + list(range(m, 0, -1))
    m = (n + 1) // 2
    return list(range(1, m)) + [m] + list(range(m - 1, 0, -1))
