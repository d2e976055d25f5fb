"""Ring attention: sequence-sharded SDPA over a mesh axis.

Capability upgrade over the reference (SURVEY §5.7): the reference caps
clips at the W=16-frame window because attention is single-device. Here the
joint sequence can shard across chips; each device holds a query block and
KV blocks rotate around the ring via ``ppermute`` (one hop per step, riding
ICI), with a flash-style online softmax merging partial results. HBM per
device scales as S/P, enabling longer windows / higher resolutions.

Math: exact (not approximate) full bidirectional attention; fp32
accumulators for max/denominator/output.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _ring_attn_local(q, k, v, key_mask, axis_name: str, scale: float):
    """Per-device body under shard_map. q,k,v: (B, H, S_local, D);
    ``key_mask``: (B, S_local) bool (True = attend), sharded like the KV
    sequence and rotated around the ring with it."""
    n_dev = jax.lax.psum(1, axis_name)
    b, h, s_loc, d = q.shape
    qf = q.astype(jnp.float32)

    def accum(out, m, denom, kk, vv, mk):
        logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kk.astype(jnp.float32))
        logits = logits * scale
        # same finite mask value as the XLA path (-1e30, not -inf: keeps
        # the online max/correction NaN-free when a whole block is masked)
        logits = jnp.where(mk[:, None, None, :], logits, jnp.float32(-1e30))
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        correction = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new)
        denom = denom * correction + jnp.sum(p, axis=-1, keepdims=True)
        out = out * correction + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vv.astype(jnp.float32))
        return out, m_new, denom

    def step(i, carry):
        out, m, denom, kk, vv, mk = carry
        out, m, denom = accum(out, m, denom, kk, vv, mk)
        # rotate KV (and its mask) to the next device
        perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
        kk = jax.lax.ppermute(kk, axis_name, perm)
        vv = jax.lax.ppermute(vv, axis_name, perm)
        mk = jax.lax.ppermute(mk, axis_name, perm)
        return out, m, denom, kk, vv, mk

    init = (jnp.zeros((b, h, s_loc, d), jnp.float32),
            jnp.full((b, h, s_loc, 1), -jnp.inf, jnp.float32),
            jnp.zeros((b, h, s_loc, 1), jnp.float32),
            k, v, key_mask)
    # rotate only between blocks: the final block's rotation would move
    # the full K/V/mask one ICI hop just to be discarded (3 wasted
    # collectives per attention call x dozens of layers per step)
    out, m, denom, kk, vv, mk = jax.lax.fori_loop(0, n_dev - 1, step, init)
    out, m, denom = accum(out, m, denom, kk, vv, mk)
    return (out / denom).astype(q.dtype)


def sequence_sharded_sdpa(
    q: jax.Array, k: jax.Array, v: jax.Array,
    mesh: Mesh, axis: str = "tensor",
    scale: Optional[float] = None,
    batch_axis: Optional[str] = None,
    key_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Exact SDPA with the sequence dim sharded over ``mesh[axis]``.

    q,k,v: (B, H, S, D) with S divisible by the axis size. Returns (B,H,S,D)
    sharded the same way. ``batch_axis`` additionally shards the batch dim
    (compose with data parallelism: B must divide by that axis size).
    ``key_mask``: optional (B, Sk) bool — sharded over ``axis`` and rotated
    with KV, so masked (mask-ratio jitter) training composes with ring.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if key_mask is None:
        key_mask = jnp.ones(k.shape[:1] + k.shape[2:3], bool)
    spec = P(batch_axis, None, axis, None)
    mspec = P(batch_axis, axis)
    fn = jax.shard_map(
        functools.partial(_ring_attn_local, axis_name=axis, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec, mspec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v, key_mask)
