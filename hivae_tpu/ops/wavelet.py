"""2-D Haar DWT/IWT as strided slice arithmetic (no convolutions).

Capability parity with the reference's Haar transform (reference:
``model/wavelet.py:13-66``): stride-2 subsampling with +/- combinations.
Pure functions over NCHW arrays; XLA lowers the slices to cheap gathers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def dwt2(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Forward Haar DWT. x: (N,C,H,W) -> (LL, HL, LH, HH) each (N,C,H/2,W/2)."""
    x01 = x[:, :, 0::2, :] / 2
    x02 = x[:, :, 1::2, :] / 2
    x1 = x01[:, :, :, 0::2]
    x2 = x02[:, :, :, 0::2]
    x3 = x01[:, :, :, 1::2]
    x4 = x02[:, :, :, 1::2]
    ll = x1 + x2 + x3 + x4
    hl = -x1 - x2 + x3 + x4
    lh = -x1 + x2 - x3 + x4
    hh = x1 - x2 - x3 + x4
    return ll, hl, lh, hh


def iwt2(x: jax.Array) -> jax.Array:
    """Inverse Haar DWT. x: (4B,C,h,w) stacked [LL;HL;LH;HH] on batch ->
    (B,C,2h,2w), matching the reference's batch-stacked convention."""
    b = x.shape[0] // 4
    x1 = x[0 * b:1 * b] / 2
    x2 = x[1 * b:2 * b] / 2
    x3 = x[2 * b:3 * b] / 2
    x4 = x[3 * b:4 * b] / 2
    ee = x1 - x2 - x3 + x4  # h[0::2, 0::2]
    oe = x1 - x2 + x3 - x4  # h[1::2, 0::2]
    eo = x1 + x2 - x3 - x4  # h[0::2, 1::2]
    oo = x1 + x2 + x3 + x4  # h[1::2, 1::2]
    # interleave: rows (even/odd) then cols (even/odd)
    n, c, h, w = ee.shape
    row_e = jnp.stack([ee, eo], axis=-1).reshape(n, c, h, 2 * w)
    row_o = jnp.stack([oe, oo], axis=-1).reshape(n, c, h, 2 * w)
    out = jnp.stack([row_e, row_o], axis=-2).reshape(n, c, 2 * h, 2 * w)
    return out


def iwt2_from_bands(ll, hl, lh, hh) -> jax.Array:
    """Inverse from separate band arrays (N,C,h,w) each."""
    return iwt2(jnp.concatenate([ll, hl, lh, hh], axis=0))
