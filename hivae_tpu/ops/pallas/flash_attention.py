"""Fused attention kernel (Pallas/TPU).

The model family's attention is full bidirectional over short sequences
(256-600 tokens: image patches + motion tokens). At these sizes the whole
per-(batch, head) problem fits in VMEM, so the optimal TPU schedule is not a
flash-style KV loop but a single fused block: one kernel computes
QK^T -> softmax -> PV entirely on-chip, eliminating the HBM round trips
between the four ops of the unfused path. fp32 softmax accumulation matches
``ops.attention._sdpa_xla`` bit-for-bit within rounding.

Long sequences (> ``MAX_SEQ``) or ragged shapes fall back to the XLA path
via ``supports()``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_SEQ = 2048      # VMEM budget: S*S fp32 logits + 3*S*D operands
MIN_ALIGN = 8


def supports(q_shape, k_shape) -> bool:
    b, h, sq, d = q_shape
    sk = k_shape[2]
    if sq > MAX_SEQ or sk > MAX_SEQ:
        return False
    if d % MIN_ALIGN != 0:
        return False
    return True


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (Sq, D)
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    scale: float) -> jax.Array:
    """q,k,v: (B, H, S, D) -> (B, H, Sq, D)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, sk, d)
    vf = v.reshape(b * h, sk, d)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, sq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * sq * sk * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=jax.default_backend() == "cpu",
    )(qf, kf, vf)
    return out.reshape(b, h, sq, d)
