"""Rotary position embeddings + RoPE attention.

Capability parity with the reference's self-contained RoPE module
(reference ``model/attention.py:20-117`` — an orphan not imported by the
main models, kept for API completeness).

TPU-first: instead of complex-number arithmetic (``torch.polar`` /
``view_as_complex``), the rotation uses real cos/sin tables — identical
math on interleaved (even, odd) lanes, but it stays in bf16-friendly real
dtypes and fuses into the attention matmuls. Tables are precomputed once
per (dim, seq_len) and passed in, keeping shapes static under ``jit``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .attention import sdpa


def precompute_freqs_cis(dim: int, seq_len: int, base: float = 10000.0
                         ) -> Tuple[jax.Array, jax.Array]:
    """Angle tables for RoPE (reference ``precompute_freqs_cis:25-31``).

    Returns ``(cos, sin)`` each of shape ``(seq_len, dim // 2)`` — the real
    and imaginary parts of the reference's ``e^{i m theta}`` table.
    """
    i = np.arange(1, dim // 2 + 1, dtype=np.float64)
    theta = base ** (-2.0 * (i - 1.0) / dim)
    ang = np.outer(np.arange(seq_len, dtype=np.float64), theta)
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _rotate(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate interleaved (even, odd) channel pairs of ``(B, S, H, D)``."""
    xr = x.astype(jnp.float32).reshape(x.shape[:-1] + (-1, 2))
    a, b = xr[..., 0], xr[..., 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([a * c - b * s, a * s + b * c], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def apply_rotary_emb(xq: jax.Array, xk: jax.Array, cos: jax.Array,
                     sin: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Rotate q/k ``(B, S, H, D)`` by position (reference
    ``apply_rotary_emb:39-62``; complex multiply == 2D rotation of the
    interleaved lane pairs)."""
    return _rotate(xq, cos, sin), _rotate(xk, cos, sin)


def rope_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   cos: Optional[jax.Array] = None,
                   sin: Optional[jax.Array] = None) -> jax.Array:
    """RoPE + scaled-dot-product attention over ``(B, S, H, D)`` inputs
    (reference ``Attention.forward:64-117``). Tables default to fresh ones
    for the input length."""
    if cos is None or sin is None:
        cos, sin = precompute_freqs_cis(q.shape[-1], q.shape[1])
    q, k = apply_rotary_emb(q, k, cos, sin)
    to_bhsd = lambda x: x.transpose(0, 2, 1, 3)
    out = sdpa(to_bhsd(q), to_bhsd(k), to_bhsd(v))
    return out.transpose(0, 2, 1, 3)
