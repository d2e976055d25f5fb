"""Ring attention: sequence-sharded SDPA over a mesh axis.

Capability upgrade over the reference (SURVEY §5.7): the reference caps
clips at the W=16-frame window because attention is single-device. Here the
joint sequence can shard across chips; each device holds a query block and
KV blocks rotate around the ring via ``ppermute`` (one hop per step, riding
ICI), with a flash-style online merge of partial results. HBM per device
scales as S/P, enabling longer windows / higher resolutions.

Round-4 redesign — the whole per-device computation is one ``custom_vjp``:

* **Forward** merges per-hop partial (out_j, lse_j) pairs online
  (log-sum-exp weighted), so only the running (B, H, S_loc, D) accumulator
  and LSE live across hops — never an (S_loc, S_loc) logits block in HBM
  when the flash hop kernel is used.
* **Backward** re-rotates KV from the SAVED LOCAL block and computes exact
  per-hop partial gradients from the global lse/delta (FlashAttention-2
  split): dq accumulates locally; dk/dv accumulators travel around the
  ring WITH their block and arrive home after a full cycle. Residuals are
  just (q, k, v, bias, out, lse) — the previous implementation
  differentiated through the fori_loop, saving per-hop logits-sized
  intermediates (n_dev × the flash memory the kernel exists to avoid).
* **Hop kernels**: ``impl='flash'`` runs the streaming Pallas kernels per
  hop (``ops/pallas/flash_attention.py`` — KV-blocked online softmax, VMEM
  accumulators), composing the repo's two long-sequence mechanisms;
  ``impl='xla'`` is an einsum hop for short local blocks where XLA's fused
  attention wins (same crossover logic as ``ops.attention.sdpa``).
  ``'auto'`` dispatches on the local block size.

Math: exact (not approximate) full bidirectional attention; fp32
accumulators for LSE/output and for the traveling dk/dv.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pallas import flash_attention as fa

NEG_INF = -1e30

# local tokens past which the per-hop streaming flash kernel beats the
# einsum hop. Measured AT this boundary on the chip (bench_ring.py,
# RESULTS.md ring table round-5 rows): flash wins 4.2x fwd / 2.0x grad at
# exactly 1024 local tokens and the gap holds through 8192; below 1024 the
# hop body is single-digit microseconds (unmeasurable through the relay
# and not a regime ring sharding is used for).
_FLASH_MIN_LOCAL = 1024


def _rotate(x, axis_name, n_dev):
    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
    return jax.lax.ppermute(x, axis_name, perm)


def _hop_fwd_xla(q, kk, vv, bb, scale):
    """One einsum hop -> (out_j fp32 normalized, lse_j fp32). Block logits
    live only inside this hop's fusion (fine at small S_loc)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   kk.astype(jnp.float32)) * scale
    s = s + bb[:, None, None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vv.astype(jnp.float32)) / l
    return o, m + jnp.log(l)


def _hop_bwd_xla(q, kk, vv, bb, g, out, lse, scale):
    """Exact partial grads for one visiting block given the GLOBAL
    lse/delta (summing over hops reproduces the full gradients)."""
    qf = q.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kk.astype(jnp.float32)) * scale
    s = s + bb[:, None, None, :]
    p = jnp.exp(s - lse)                                   # global softmax
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vv.astype(jnp.float32))
    delta = jnp.sum(gf * out.astype(jnp.float32), axis=-1, keepdims=True)
    ds = p * (dp - delta)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kk.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * scale
    return dq, dk, dv


def _hop_fwd_flash(q, kk, vv, bb, scale):
    out, lse = fa.stream_fwd_lse(q, kk, vv, bb, scale)
    return out.astype(jnp.float32), lse


def _hop_bwd_flash(q, kk, vv, bb, g, out, lse, scale):
    return fa.stream_bwd(q, kk, vv, bb, g, out.astype(q.dtype), lse, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ring_attn(q, k, v, bias, scale, axis_name, use_flash):
    out, _ = _ring_fwd_impl(q, k, v, bias, scale, axis_name, use_flash)
    return out


def _ring_fwd_impl(q, k, v, bias, scale, axis_name, use_flash):
    n_dev = jax.lax.psum(1, axis_name)
    b, h, s_loc, d = q.shape
    hop = _hop_fwd_flash if use_flash else _hop_fwd_xla

    def merge(o_acc, lse_acc, o_j, lse_j):
        m = jnp.maximum(lse_acc, lse_j)
        w1 = jnp.exp(lse_acc - m)                 # 0 at the -inf init
        w2 = jnp.exp(lse_j - m)
        denom = w1 + w2
        o_acc = (o_acc * w1 + o_j * w2) / denom
        return o_acc, m + jnp.log(denom)

    def step(i, carry):
        o_acc, lse_acc, kk, vv, bb = carry
        o_j, lse_j = hop(q, kk, vv, bb, scale)
        o_acc, lse_acc = merge(o_acc, lse_acc, o_j, lse_j)
        # rotate KV (and its mask bias) to the next device
        kk = _rotate(kk, axis_name, n_dev)
        vv = _rotate(vv, axis_name, n_dev)
        bb = _rotate(bb, axis_name, n_dev)
        return o_acc, lse_acc, kk, vv, bb

    init = (jnp.zeros((b, h, s_loc, d), jnp.float32),
            jnp.full((b, h, s_loc, 1), -jnp.inf, jnp.float32),
            k, v, bias)
    # rotate only between blocks: the final block's rotation would move
    # the full K/V/bias one ICI hop just to be discarded
    o_acc, lse_acc, kk, vv, bb = jax.lax.fori_loop(
        0, n_dev - 1, step, init)
    o_j, lse_j = hop(q, kk, vv, bb, scale)
    o_acc, lse_acc = merge(o_acc, lse_acc, o_j, lse_j)
    return o_acc.astype(q.dtype), lse_acc


def _ring_fwd(q, k, v, bias, scale, axis_name, use_flash):
    out, lse = _ring_fwd_impl(q, k, v, bias, scale, axis_name, use_flash)
    return out, (q, k, v, bias, out, lse)


def _ring_bwd(scale, axis_name, use_flash, res, g):
    q, k, v, bias, out, lse = res
    n_dev = jax.lax.psum(1, axis_name)
    hop = _hop_bwd_flash if use_flash else _hop_bwd_xla

    def step(i, carry):
        dq_acc, kk, vv, bb, dk_acc, dv_acc = carry
        dq_j, dk_j, dv_j = hop(q, kk, vv, bb, g, out, lse, scale)
        dq_acc = dq_acc + dq_j.astype(jnp.float32)
        dk_acc = dk_acc + dk_j.astype(jnp.float32)
        dv_acc = dv_acc + dv_j.astype(jnp.float32)
        # dk/dv travel WITH their block; after the full n_dev-hop cycle
        # they are back on the block's home device
        kk = _rotate(kk, axis_name, n_dev)
        vv = _rotate(vv, axis_name, n_dev)
        bb = _rotate(bb, axis_name, n_dev)
        dk_acc = _rotate(dk_acc, axis_name, n_dev)
        dv_acc = _rotate(dv_acc, axis_name, n_dev)
        return dq_acc, kk, vv, bb, dk_acc, dv_acc

    zero_kv = jnp.zeros(k.shape, jnp.float32)
    init = (jnp.zeros(q.shape, jnp.float32), k, v, bias, zero_kv, zero_kv)
    dq, _, _, _, dk, dv = jax.lax.fori_loop(0, n_dev, step, init)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(bias))  # the bias is a non-differentiable mask


_ring_attn.defvjp(_ring_fwd, _ring_bwd)


def sequence_sharded_sdpa(
    q: jax.Array, k: jax.Array, v: jax.Array,
    mesh: Mesh, axis: str = "tensor",
    scale: Optional[float] = None,
    batch_axis: Optional[str] = None,
    key_mask: Optional[jax.Array] = None,
    impl: str = "auto",
) -> jax.Array:
    """Exact SDPA with the sequence dim sharded over ``mesh[axis]``.

    q,k,v: (B, H, S, D) with S divisible by the axis size. Returns (B,H,S,D)
    sharded the same way. ``batch_axis`` additionally shards the batch dim
    (compose with data parallelism: B must divide by that axis size).
    ``key_mask``: optional (B, Sk) bool — sharded over ``axis`` and rotated
    with KV, so masked (mask-ratio jitter) training composes with ring.
    ``impl``: 'flash' (streaming Pallas hop kernels), 'xla' (einsum hop),
    or 'auto' (flash once the LOCAL block crosses the streaming-pays
    boundary and the head dim is kernel-aligned).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n_ring = mesh.shape[axis]
    s_loc = q.shape[2] // n_ring
    if impl == "auto":
        local_shape = (q.shape[0], q.shape[1], s_loc, q.shape[3])
        use_flash = (s_loc >= _FLASH_MIN_LOCAL
                     and fa.supports(local_shape, local_shape))
    else:
        use_flash = impl == "flash"
    if key_mask is None:
        bias = jnp.zeros(k.shape[:1] + k.shape[2:3], jnp.float32)
    else:
        # same finite mask value as the XLA path (-1e30, not -inf: keeps
        # the online merge NaN-free when a whole block is masked)
        bias = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)
    spec = P(batch_axis, None, axis, None)
    mspec = P(batch_axis, axis)
    def body(q_, k_, v_, b_):
        # positional call: custom_vjp nondiff_argnums are positional
        return _ring_attn(q_, k_, v_, b_, scale, axis, use_flash)

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec, mspec),
        out_specs=spec, check_vma=False)
    return fn(q, k, v, bias)
