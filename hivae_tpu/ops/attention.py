"""Attention math for TPU: fp32-softmax SDPA with a Pallas fast path.

The reference runs all attention through diffusers ``Attention`` (torch SDPA,
cuDNN). Here the core op is a single function over (B, H, S, D) arrays so the
model layer stays independent of the kernel choice:

  * ``xla``: einsum + fp32 softmax — XLA fuses this well for the short
    sequences in this model family (<=~2k tokens);
  * ``pallas``: fused flash-attention kernel (ops/pallas/flash_attention.py)
    used when shapes are TPU-tile friendly.

Numerics: logits and softmax always accumulate in fp32 regardless of the
compute dtype (bf16) — required for the PSNR-parity targets (SURVEY.md §7).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_DEFAULT_IMPL = "xla"


def set_default_implementation(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("xla", "pallas")
    _DEFAULT_IMPL = impl


def sdpa(
    q: jax.Array,  # (B, H, Sq, D)
    k: jax.Array,  # (B, H, Sk, D)
    v: jax.Array,  # (B, H, Sk, D)
    *,
    scale: Optional[float] = None,
    implementation: Optional[str] = None,
) -> jax.Array:
    """Scaled dot-product attention, fp32 accumulation, no mask (the model
    family uses full bidirectional attention everywhere)."""
    impl = implementation or _DEFAULT_IMPL
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "pallas":
        from .pallas.flash_attention import flash_attention, supports

        if supports(q.shape, k.shape):
            return flash_attention(q, k, v, scale=scale)
    return _sdpa_xla(q, k, v, scale)


@functools.partial(jax.jit, static_argnums=(3,), inline=True)
def _sdpa_xla(q, k, v, scale):
    out_dtype = q.dtype
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(out_dtype)
