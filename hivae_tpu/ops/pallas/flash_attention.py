"""Fused attention kernels (Pallas/TPU), forward + custom-VJP backward.

The model family's attention is full bidirectional over short sequences
(256-600 tokens: image patches + motion tokens; ref runs them through torch
SDPA, e.g. /root/reference/model/modules.py joint blocks). At these sizes the
whole per-(batch, head-group) problem fits in VMEM, so the optimal TPU
schedule is not a flash-style KV loop but a single fused block: one kernel
computes QK^T -> softmax -> PV entirely on-chip, eliminating the HBM round
trips between the four ops of the unfused path.

TPU-shape specifics (why this beats a naive per-head kernel):

* **Head batching**: the grid is (B, H/HB) and each program computes HB heads
  with one batched ``dot_general`` — big MXU ops and ~HB× fewer grid steps.
  HB adapts to the VMEM budget.
* **Tile alignment**: production sequences are 260 tokens (256 patches + 4
  motion tokens), which misaligns the 8/16-row sublane tiling. Inputs are
  padded to a multiple of 16 on the sequence dims; padded keys are masked
  with a static iota inside the kernel, padded query rows are sliced off.
* **Masking as additive bias**: the per-batch key mask (traced mask-ratio
  jitter) enters as a (B, Sk) fp32 additive bias so the same kernel serves
  masked and unmasked attention.
* **Trainable**: a custom VJP recomputes the (cheap, VMEM-resident) softmax
  in a second fused kernel and emits dq/dk/dv in one pass, so the kernel is
  usable inside the jitted train step, not just inference.

Numerics: logits and softmax accumulate in fp32 regardless of compute dtype;
the probs are cast back to the value dtype for the PV matmul — bit-matching
``ops.attention._sdpa_xla`` within rounding.

Sequences past ``MAX_SEQ`` fall back to the XLA path via ``supports()``:
at 2048 tokens even a single head's fp32 logits (16.7 MB) overflow the 16 MB
VMEM, so the full-block schedule tops out at 1024 (measured: the kernel beats
XLA 2.9x fwd / 2.0x grad there; XLA wins below ~512 — see
``ops.attention.sdpa``'s 'auto' dispatch and benchmarks/RESULTS.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_SEQ = 1024      # hb=1 VMEM ceiling: 2*S*S fp32 + operands < 16M
MIN_ALIGN = 8
SEQ_ALIGN = 16      # sublane tile for bf16; also a multiple of the fp32 tile
NEG_INF = -1e30


def supports(q_shape, k_shape) -> bool:
    """True when even the hb=1 (single-head) schedule fits VMEM — the
    backward pass is the binding case: 3 fp32 (Sq,Sk) buffers (p/dp/ds)
    plus 6 operand blocks. ~2048 tokens or d=512 at 1024 tokens overflow
    the 16 MB core and must take the XLA path."""
    sq, d = q_shape[2], q_shape[3]
    sk = k_shape[2]
    if d % MIN_ALIGN != 0:
        return False
    sqp, skp = _round_up(sq, SEQ_ALIGN), _round_up(sk, SEQ_ALIGN)
    worst = 3 * sqp * skp * 4 + (2 * sqp * d + 4 * skp * d) * 4
    return worst <= 14_500_000


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_hb(h: int, sq: int, sk: int, d: int, itemsize: int,
             n_ss_bufs: int, budget: int) -> int:
    """Largest divisor of h whose VMEM working set fits the budget.

    ``n_ss_bufs`` fp32 (S,S) buffers (logits/probs fwd; p/dp/ds bwd) plus the
    operand/output blocks."""
    for hb in range(h, 0, -1):
        if h % hb:
            continue
        ss = n_ss_bufs * hb * sq * sk * 4
        ops = hb * (2 * sq * d + 4 * sk * d) * max(itemsize, 4)
        if ss + ops <= budget:
            return hb
    return 1


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, sk_real):
    q = q_ref[0]  # (HB, Sq, D)
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    logits = logits + bias_ref[0][None]  # (1,1,Sk) bcast
    skp = logits.shape[-1]
    if skp != sk_real:  # static: mask the padded key columns
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, skp), 2)
        logits = jnp.where(col >= sk_real, NEG_INF, logits)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, sk_real):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    # recompute the softmax (VMEM-resident; cheaper than an HBM round trip)
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    logits = logits + bias_ref[0][None]  # (1,1,Sk) bcast
    skp = logits.shape[-1]
    if skp != sk_real:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, skp), 2)
        logits = jnp.where(col >= sk_real, NEG_INF, logits)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)          # fp32 (HB, Sq, Sk)
    # dv = p^T @ do
    dv_ref[0] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # dp = do @ v^T ; dlogits = p * (dp - rowsum(dp*p))
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds.astype(q.dtype)
    dq_ref[0] = (jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


def _pad_seq(x, sp):
    s = x.shape[2]
    if s == sp:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, sp - s), (0, 0)))


def _specs(b, h, hb, sqp, skp, d):
    qs = pl.BlockSpec((1, hb, sqp, d), lambda i, j: (i, j, 0, 0),
                      memory_space=pltpu.VMEM)
    ks = pl.BlockSpec((1, hb, skp, d), lambda i, j: (i, j, 0, 0),
                      memory_space=pltpu.VMEM)
    bs = pl.BlockSpec((1, 1, skp), lambda i, j: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    return qs, ks, bs


def _prep(q, k, v, bias):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    sqp, skp = _round_up(sq, SEQ_ALIGN), _round_up(sk, SEQ_ALIGN)
    qp = _pad_seq(q, sqp)
    kp = _pad_seq(k, skp)
    vp = _pad_seq(v, skp)
    if bias is None:
        bp = jnp.zeros((b, 1, skp), jnp.float32)
    else:
        bp = jnp.pad(bias.astype(jnp.float32),
                     ((0, 0), (0, skp - sk)))[:, None]
    return qp, kp, vp, bp, sqp, skp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash(q, k, v, bias, scale):
    return _flash_fwd_impl(q, k, v, bias, scale)


def _flash_fwd_impl(q, k, v, bias, scale):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    qp, kp, vp, bp, sqp, skp = _prep(q, k, v, bias)
    hb = _pick_hb(h, sqp, skp, d, q.dtype.itemsize,
                  n_ss_bufs=2, budget=6 * 2**20)
    qs, ks, bs = _specs(b, h, hb, sqp, skp, d)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, sk_real=sk),
        grid=(b, h // hb),
        in_specs=[qs, ks, ks, bs],
        out_specs=qs,
        out_shape=jax.ShapeDtypeStruct((b, h, sqp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * sqp * skp * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * q.dtype.itemsize,
            transcendentals=b * h * sqp * skp,
        ),
        interpret=jax.default_backend() == "cpu",
    )(qp, kp, vp, bp)
    return out[:, :, :sq]


def _flash_fwd(q, k, v, bias, scale):
    return _flash_fwd_impl(q, k, v, bias, scale), (q, k, v, bias)


def _flash_bwd(scale, res, g):
    q, k, v, bias = res
    b, h, sq, d = q.shape
    sk = k.shape[2]
    qp, kp, vp, bp, sqp, skp = _prep(q, k, v, bias)
    gp = _pad_seq(g, sqp)
    hb = _pick_hb(h, sqp, skp, d, q.dtype.itemsize,
                  n_ss_bufs=3, budget=10 * 2**20)
    qs, ks, bs = _specs(b, h, hb, sqp, skp, d)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, sk_real=sk),
        grid=(b, h // hb),
        in_specs=[qs, ks, ks, bs, qs],
        out_specs=(qs, ks, ks),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sqp, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, skp, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, skp, d), v.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * sqp * skp * d,
            bytes_accessed=3 * (qp.size + kp.size + vp.size)
            * q.dtype.itemsize,
            transcendentals=b * h * sqp * skp,
        ),
        interpret=jax.default_backend() == "cpu",
    )(qp, kp, vp, bp, gp)
    # the bias only ever carries the -inf key mask; its cotangent is unused
    dbias = jnp.zeros_like(bias)
    return dq[:, :, :sq], dk[:, :, :sk], dv[:, :, :sk], dbias


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    scale: float,
                    bias: jax.Array | None = None) -> jax.Array:
    """Fused SDPA. q,k,v: (B, H, S, D); bias: optional (B, Sk) fp32 additive
    key bias (0 attend / -1e30 drop) -> (B, H, Sq, D)."""
    if bias is None:
        bias = jnp.zeros((q.shape[0], k.shape[2]), jnp.float32)
    return _flash(q, k, v, bias, scale)
