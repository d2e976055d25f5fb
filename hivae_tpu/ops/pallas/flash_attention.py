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

Past ``_full_block_fits`` (~1024 tokens) the schedule no longer fits (at 2048 tokens a
single head's fp32 logits are 16.7 MB against 16 MB VMEM) and dispatch moves
to the **streaming schedule**: a true flash attention — grid over KV blocks
with running max / denominator / accumulator carried in VMEM scratch (online
softmax), so VMEM holds only (BQ, BK) tiles regardless of sequence length,
and the S×S logits never exist in HBM. Forward saves the per-row LSE; the
custom-VJP backward is two streaming passes (dq over KV blocks; dk/dv over Q
blocks) using the saved LSE and the precomputed delta = rowsum(do·o), the
standard FlashAttention-2 recomputation split. This is what makes the
>16-frame / long-window story real (SURVEY §5.7): the reference caps its
windows at W=16 (model/pipeline.py:1295-1378); here 2048-4096-token joint
sequences run at full MXU utilisation instead of spilling.

Dispatch (see ``ops.attention.sdpa`` 'auto' and benchmarks/RESULTS.md):
XLA below ~512 tokens; full-block (2.9x fwd / 2.0x grad vs XLA at 1024)
up to 1024; streaming above.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_ALIGN = 8
SEQ_ALIGN = 16      # sublane tile for bf16; also a multiple of the fp32 tile
NEG_INF = -1e30

# Full-block schedule tuning knobs (module-level so bench_fullblock_tune.py
# can sweep them on the chip; defaults are the measured winners — see
# benchmarks/RESULTS.md "Full-block kernel tuning").
_FB_FWD_BUDGET = 6 * 2**20   # VMEM budget for _pick_hb, forward
_FB_BWD_BUDGET = 10 * 2**20  # VMEM budget for _pick_hb, backward
_FB_LANE_ALIGN = SEQ_ALIGN   # key-axis (lane) padding multiple


def _full_block_fits(q_shape, k_shape) -> bool:
    """True when even the hb=1 (single-head) full-block schedule fits VMEM —
    the backward pass is the binding case: 3 fp32 (Sq,Sk) buffers (p/dp/ds)
    plus 6 operand blocks. ~2048 tokens or d=512 at 1024 tokens overflow
    the 16 MB core and dispatch to the streaming schedule instead."""
    sq, d = q_shape[2], q_shape[3]
    sk = k_shape[2]
    sqp, skp = _round_up(sq, SEQ_ALIGN), _round_up(sk, SEQ_ALIGN)
    worst = 3 * sqp * skp * 4 + (2 * sqp * d + 4 * skp * d) * 4
    return worst <= 14_500_000


def supports(q_shape, k_shape) -> bool:
    """True when some Pallas schedule (full-block or streaming) handles the
    shape; head_dim must be sublane-aligned. The streaming schedule has no
    sequence ceiling, so this is now only an alignment gate."""
    d = q_shape[3]
    if d % MIN_ALIGN != 0 or k_shape[3] % MIN_ALIGN != 0:
        return False
    # streaming blocks are 128-lane tiles; tiny head dims would waste the
    # MXU and tiny sequences belong to XLA anyway
    return True


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    """Pallas must run interpreted on CPU. Checking jax.default_backend()
    alone misses the ``init_on_cpu`` path — eager CPU execution via
    ``jax.default_device(cpu)`` inside a TPU-backend process — which would
    otherwise try (and fail) to compile the kernel for the CPU backend."""
    dev = jax.config.jax_default_device
    if dev is not None and getattr(dev, "platform", None) == "cpu":
        return True
    return jax.default_backend() == "cpu"


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


def _ln_block(x, g_ref, b_ref, eps):
    """Per-head LayerNorm over the head dim of an (HB, S, D) block, fp32,
    mirroring ``flax.linen.LayerNorm`` with ``use_fast_variance`` bit-for-bit
    (mean2 - mean^2; mul = rsqrt(var+eps) * scale; y = (x-mean)*mul + bias).
    Returns the block cast back to the input dtype — the same rounding the
    unfused path applies before the QK^T matmul."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    mul = jax.lax.rsqrt(var + eps) * g_ref[0][None, None]
    y = (xf - mean) * mul + b_ref[0][None, None]
    return y.astype(x.dtype)


def _fwd_kernel_qknorm(q_ref, k_ref, v_ref, bias_ref, gq_ref, bq_ref,
                       gk_ref, bk_ref, o_ref, *, scale, sk_real, eps):
    """Full-block forward with the per-head qk LayerNorm fused in: q/k arrive
    RAW (pre-norm) and are normalized in VMEM, killing the two separate
    LN passes (+ their fp32 HBM round trips) the unfused path pays per
    attention — measured 3.4 ms of the 34.3 ms flagship forward
    (benchmarks/RESULTS.md round-5 trace table)."""
    q = _ln_block(q_ref[0], gq_ref, bq_ref, eps)
    k = _ln_block(k_ref[0], gk_ref, bk_ref, eps)
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
    sqp, skp = _round_up(sq, SEQ_ALIGN), _round_up(sk, _FB_LANE_ALIGN)
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
                  n_ss_bufs=2, budget=_FB_FWD_BUDGET)
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
        interpret=_interpret(),
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
                  n_ss_bufs=3, budget=_FB_BWD_BUDGET)
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
        interpret=_interpret(),
    )(qp, kp, vp, bp, gp)
    # the bias only ever carries the -inf key mask; its cotangent is unused
    dbias = jnp.zeros_like(bias)
    return dq[:, :, :sq], dk[:, :, :sk], dv[:, :, :sk], dbias


_flash.defvjp(_flash_fwd, _flash_bwd)


def qk_layernorm(x, g, b, eps):
    """XLA reference of the kernel's fused per-head LayerNorm (identical op
    order to ``flax.linen.LayerNorm`` with fast variance: mul = rsqrt(var +
    eps) * scale; y = (x - mean) * mul + bias; fp32 stats, output cast back
    to the input dtype). Used by the non-full-block fallbacks, by
    ``ops.attention`` for the XLA/packed/ring paths, and by the fused
    path's backward recompute — one truth source for the norm math."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    mul = jax.lax.rsqrt(var + eps) * g
    return ((xf - mean) * mul + b).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _flash_qknorm(q, k, v, bias, gq, bq, gk, bk, scale, eps):
    return _flash_qknorm_fwd_impl(q, k, v, bias, gq, bq, gk, bk, scale, eps)


def _flash_qknorm_fwd_impl(q, k, v, bias, gq, bq, gk, bk, scale, eps):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    qp, kp, vp, bp, sqp, skp = _prep(q, k, v, bias)
    hb = _pick_hb(h, sqp, skp, d, q.dtype.itemsize,
                  n_ss_bufs=2, budget=_FB_FWD_BUDGET)
    qs, ks, bs = _specs(b, h, hb, sqp, skp, d)
    ps = pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    norms = [p.astype(jnp.float32).reshape(1, d) for p in (gq, bq, gk, bk)]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_qknorm, scale=scale, sk_real=sk,
                          eps=eps),
        grid=(b, h // hb),
        in_specs=[qs, ks, ks, bs, ps, ps, ps, ps],
        out_specs=qs,
        out_shape=jax.ShapeDtypeStruct((b, h, sqp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * sqp * skp * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * q.dtype.itemsize,
            transcendentals=b * h * sqp * skp,
        ),
        interpret=_interpret(),
    )(qp, kp, vp, bp, *norms)
    return out[:, :, :sq]


def _flash_qknorm_vjp_fwd(q, k, v, bias, gq, bq, gk, bk, scale, eps):
    out = _flash_qknorm_fwd_impl(q, k, v, bias, gq, bq, gk, bk, scale, eps)
    return out, (q, k, v, bias, gq, bq, gk, bk)


def _flash_qknorm_vjp_bwd(scale, eps, res, g):
    """Backward = VJP of the unfused reference composition (XLA LN feeding
    the existing full-block custom-VJP kernel). The fused kernel buys the
    *primal* forward; the backward recompute is exactly the math the
    unfused path would run, so training numerics are unchanged."""
    q, k, v, bias, gq, bq, gk, bk = res

    def ref(q, k, v, bias, gq, bq, gk, bk):
        return _flash(qk_layernorm(q, gq, bq, eps),
                      qk_layernorm(k, gk, bk, eps), v, bias, scale)

    _, vjp = jax.vjp(ref, q, k, v, bias, gq, bq, gk, bk)
    return vjp(g)


_flash_qknorm.defvjp(_flash_qknorm_vjp_fwd, _flash_qknorm_vjp_bwd)


# -----------------------------------------------------------------------------
# Streaming schedule (past _full_block_fits): KV-blocked online softmax, FlashAttention-2
# recomputation backward. VMEM holds only (BQ, BK) tiles; running max /
# denominator / output accumulator live in VMEM scratch across the KV grid
# dimension (innermost, sequential on TPU).
# -----------------------------------------------------------------------------

_BQ = 512       # query block rows (sublane-tiled)
_BK = 512       # key block columns (lane-tiled)


def _pick_stream_hb(h: int, bq: int, bk: int, d: int, itemsize: int,
                    n_live: int) -> int:
    """Head-batch factor for the streaming grid: the largest divisor of h
    whose working set fits VMEM. A single-head grid step does only
    4*bq*bk*d FLOPs (67 MFLOP at d=64) — too little to amortize the
    per-step grid overhead, which is what capped the hb=1 schedule at
    ~30 TFLOP/s. Batching HB heads into one step multiplies the MXU work
    per step while the DMA pipeline depth stays the same.

    The dominant VMEM term is NOT the operand blocks but the kernel's live
    fp32 (HB, BQ, BK) intermediates — logits/probs forward (n_live=2),
    plus dp/ds in the backward passes (n_live=4): at bq=bk=512 each is
    1 MB per head, and the compiler's scoped-vmem accounting measured the
    dkv pass at 17.4 MB for hb=4 against the 16 MB core (so the backward
    passes land at hb=2 where the forward, hardware-verified at 13.1 MB,
    keeps hb=4). Operand/output blocks (double-buffered) and scratch are
    the smaller tail term."""
    blocks = (2 * (2 * bq * d + 2 * bk * d) * max(itemsize, 2)
              + (2 * 128 + d) * bq * 4 + 2 * bk * d * 4)
    per_head = n_live * bq * bk * 4 + blocks
    for hb in range(h, 0, -1):
        if h % hb == 0 and hb * per_head <= 15 * 2**20:
            return hb
    return 1


def _stream_pad(x, target):
    s = x.shape[2]
    return x if s == target else jnp.pad(
        x, ((0, 0), (0, 0), (0, target - s), (0, 0)))


def _axis_blocks(s16, cap):
    """(padded_len, block) for one sequence axis: short axes are a single
    16-aligned block; long axes pad to a 128 multiple and take the largest
    of (cap, 3·cap/4, cap/2, 128) that divides it — minimising pad waste
    (e.g. 1104 tokens -> 1152 with 384-blocks, not 1536 with 512-blocks)
    while keeping lane-aligned blocks."""
    if s16 <= cap:
        return s16, s16
    sp = _round_up(s16, 128)
    for b in (cap, 3 * cap // 4, cap // 2):
        if sp % b == 0:
            return sp, b
    return sp, 128  # sp is a 128-multiple by construction


def _stream_geom(sq, sk):
    sq16, sk16 = _round_up(sq, SEQ_ALIGN), _round_up(sk, SEQ_ALIGN)
    sqp, bq = _axis_blocks(sq16, _BQ)
    skp, bk = _axis_blocks(sk16, _BK)
    return sqp, skp, bq, bk


def _stream_bias(bias_ref, j, bk):
    """The bias rides as a full (1, 1, Skp) row per batch (Mosaic requires
    the last two block dims to be 8/128-tiled or whole — a (1, bk) block
    over (B, Sk) is illegal); the KV window is sliced at the ref (Mosaic
    lowers pl.ds ref indexing, not value-level dynamic_slice). Multi-block
    axes use bk in {512, 256, 128}, so j*bk stays 128-lane aligned."""
    if bias_ref.shape[2] == bk:
        return bias_ref[0]               # (1, BK)
    return bias_ref[0, :, pl.ds(pl.multiple_of(j * bk, bk), bk)]


def _stream_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                       m_scr, l_scr, acc_scr, *, scale, bk):
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                        # (HB, BQ, D)
    k = k_ref[0]                        # (HB, BK, D)
    v = v_ref[0]
    # The bias row carries the key-pad mask (_stream_prep), so the VPU
    # work on the (HB, BQ, BK) tile is scale, bias-add, exp and the row
    # reductions — no per-block iota/compare/where. (The scale multiply
    # must stay between the dot and the bias add: adding a broadcast row
    # directly onto the raw MXU output crashes Mosaic's
    # ApplyVectorLayoutPass, vector_extract_rule limits 64 vs 1.)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale      # (HB, BQ, BK)
    s = s + _stream_bias(bias_ref, j, bk)[None]

    m_prev = m_scr[:, :, :1]            # (HB, BQ, 1)
    l_prev = l_scr[:, :, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)              # fp32 (HB, BQ, BK)
    corr = jnp.exp(m_prev - m_new)      # (HB, BQ, 1)
    l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == nk - 1)
    def _finish():
        l = l_scr[:, :, :1]
        o_ref[0] = (acc_scr[...] / l).astype(o_ref.dtype)
        lse_ref[0] = m_scr[:, :, :1] + jnp.log(l)


def _stream_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                      delta_ref, dq_ref, acc_scr, *, scale, sk_real, bk):
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                        # (HB, BQ, D)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    s = s + _stream_bias(bias_ref, j, bk)[None]
    # the iota/where is redundant with the NEG_INF-padded bias but is kept
    # in the BACKWARD kernels as layout laundering: without an elementwise
    # select between the row-broadcast add and the lane-broadcast lse
    # subtract, Mosaic's ApplyVectorLayoutPass crashes (vector_extract_rule
    # limits 64 vs 1). The forward kernel computes its max in-kernel and
    # does not need it.
    col = j * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col >= sk_real, NEG_INF, s)
    p = jnp.exp(s - lse_ref[0])                          # (HB, BQ, BK)
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0])
    # dq = scale * ds @ k; the scale lands on the small (HB, BQ, D) tile
    acc_scr[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale

    @pl.when(j == nk - 1)
    def _finish():
        dq_ref[0] = acc_scr[...].astype(dq_ref.dtype)


def _stream_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                       delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                       *, scale, sk_real, bk):
    i = pl.program_id(3)
    ni = pl.num_programs(3)
    j = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]                        # (HB, BQ, D) — i-block
    k = k_ref[0]                        # (HB, BK, D) — j-block
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale      # (HB, BQ, BK)
    s = s + _stream_bias(bias_ref, j, bk)[None]
    col = j * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col >= sk_real, NEG_INF, s)  # layout laundering, see dq
    p = jnp.exp(s - lse_ref[0])
    # dv_j += p^T @ do_i
    dv_scr[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0])
    # dk_j += ds^T @ q_i * scale — on the small (HB, BK, D) tile
    dk_scr[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale

    @pl.when(i == ni - 1)
    def _finish():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _stream_prep(q, k, v, bias):
    """Pads operands and folds the padded-key mask into the bias row
    (NEG_INF beyond sk), eliminating the per-logit iota/compare/where from
    the inner kernels — 3 fewer elementwise ops per logit on the VPU,
    which is a double-digit share of the forward wall time at d=64."""
    b = q.shape[0]
    sq, sk = q.shape[2], k.shape[2]
    sqp, skp, bq, bk = _stream_geom(sq, sk)
    qp = _stream_pad(q, sqp)
    kp = _stream_pad(k, skp)
    vp = _stream_pad(v, skp)
    # (B, 1, Skp): whole row per program — see _stream_bias. Key padding is
    # masked here (NEG_INF columns), not in the kernels; the online-softmax
    # update is self-correcting for all-masked leading blocks (a later real
    # block's corr = exp(m_prev - m_new) zeroes the transient 1.0 probs).
    if bias is None:
        bp = jnp.zeros((b, sk), jnp.float32)
    else:
        bp = bias.astype(jnp.float32)
    bp = jnp.pad(bp, ((0, 0), (0, skp - sk)),
                 constant_values=NEG_INF)[:, None]
    return qp, kp, vp, bp, sqp, skp, bq, bk


def _stream_specs(hb, bq, bk, d, skp):
    """Block specs for grid (B, H/HB, nQ, nK) with q-major indexing. Each
    program carries HB heads (see ``_pick_stream_hb``). The lse / delta
    rows travel as (B, H, Sqp, 1) so the (bq, 1) block obeys the Mosaic
    last-two-dims tiling rule."""
    qs = pl.BlockSpec((1, hb, bq, d), lambda b, h, i, j: (b, h, i, 0),
                      memory_space=pltpu.VMEM)
    ks = pl.BlockSpec((1, hb, bk, d), lambda b, h, i, j: (b, h, j, 0),
                      memory_space=pltpu.VMEM)
    bs = pl.BlockSpec((1, 1, skp), lambda b, h, i, j: (b, 0, 0),
                      memory_space=pltpu.VMEM)
    rs = pl.BlockSpec((1, hb, bq, 1), lambda b, h, i, j: (b, h, i, 0),
                      memory_space=pltpu.VMEM)  # per-q-row lse/delta
    return qs, ks, bs, rs


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_stream(q, k, v, bias, scale):
    out, _ = _stream_fwd_impl(q, k, v, bias, scale)
    return out


def _stream_fwd_impl(q, k, v, bias, scale):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    qp, kp, vp, bp, sqp, skp, bq, bk = _stream_prep(q, k, v, bias)
    hb = _pick_stream_hb(h, bq, bk, d, q.dtype.itemsize, n_live=2)
    qs, ks, bs, rs = _stream_specs(hb, bq, bk, d, skp)
    out, lse = pl.pallas_call(
        functools.partial(_stream_fwd_kernel, scale=scale, bk=bk),
        grid=(b, h // hb, sqp // bq, skp // bk),
        in_specs=[qs, ks, ks, bs],
        out_specs=(qs, rs),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sqp, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sqp, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((hb, bq, 128), jnp.float32),   # running max
            pltpu.VMEM((hb, bq, 128), jnp.float32),   # running denominator
            pltpu.VMEM((hb, bq, d), jnp.float32),     # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * sqp * skp * d,
            bytes_accessed=(qp.size + (kp.size + vp.size) * (sqp // bq))
            * q.dtype.itemsize,
            transcendentals=b * h * sqp * skp,
        ),
        interpret=_interpret(),
    )(qp, kp, vp, bp)
    return out[:, :, :sq], lse


def _flash_stream_fwd(q, k, v, bias, scale):
    out, lse = _stream_fwd_impl(q, k, v, bias, scale)
    return out, (q, k, v, bias, out, lse)


def _flash_stream_bwd(scale, res, g):
    q, k, v, bias, out, lse = res
    dq, dk, dv = stream_bwd(q, k, v, bias, g, out, lse, scale)
    # key_bias is the non-differentiable key mask (see flash_attention)
    return dq, dk, dv, jnp.zeros_like(bias)


def stream_bwd(q, k, v, bias, g, out, lse, scale):
    """FlashAttention-2 recomputation backward given the (global) ``out``
    and ``lse`` — (dq, dk, dv), unpadded.

    ``lse`` may be padded (B, H, Sqp, 1) from ``_stream_fwd_impl`` or
    unpadded (B, H, Sq, 1) from a caller that sliced/merged it (ring
    attention merges per-hop LSEs into a GLOBAL one and calls this per
    hop; with the global lse/delta the per-hop partial gradients sum
    exactly to the full gradients). Zero-padding the lse rows is safe:
    padded q rows have q=0 so their probs are bounded (exp(bias) <= 1)
    and their do/delta rows are zero, so they contribute nothing.
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    qp, kp, vp, bp, sqp, skp, bq, bk = _stream_prep(q, k, v, bias)
    gp = _stream_pad(g, sqp)
    if lse.shape[2] != sqp:
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, sqp - lse.shape[2]),
                            (0, 0)))
    # delta_i = rowsum(do_i * o_i) — cheap bandwidth-bound reduction, XLA
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sqp - sq)))[..., None]
    hb = _pick_stream_hb(h, bq, bk, d, q.dtype.itemsize, n_live=4)
    qs, ks, bs, rs = _stream_specs(hb, bq, bk, d, skp)

    dq = pl.pallas_call(
        functools.partial(_stream_dq_kernel, scale=scale, sk_real=sk,
                          bk=bk),
        grid=(b, h // hb, sqp // bq, skp // bk),
        in_specs=[qs, ks, ks, bs, qs, rs, rs],
        out_specs=qs,
        out_shape=jax.ShapeDtypeStruct((b, h, sqp, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((hb, bq, d), jnp.float32)],
        interpret=_interpret(),
    )(qp, kp, vp, bp, gp, lse, delta)

    # kv-major grid: (B, H/HB, nK, nQ) — q blocks stream past each kv block
    qs2 = pl.BlockSpec((1, hb, bq, d), lambda b_, h_, j, i: (b_, h_, i, 0),
                       memory_space=pltpu.VMEM)
    ks2 = pl.BlockSpec((1, hb, bk, d), lambda b_, h_, j, i: (b_, h_, j, 0),
                       memory_space=pltpu.VMEM)
    bs2 = pl.BlockSpec((1, 1, skp), lambda b_, h_, j, i: (b_, 0, 0),
                       memory_space=pltpu.VMEM)
    rs2 = pl.BlockSpec((1, hb, bq, 1), lambda b_, h_, j, i: (b_, h_, i, 0),
                       memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_stream_dkv_kernel, scale=scale, sk_real=sk,
                          bk=bk),
        grid=(b, h // hb, skp // bk, sqp // bq),
        in_specs=[qs2, ks2, ks2, bs2, qs2, rs2, rs2],
        out_specs=(ks2, ks2),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, skp, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, skp, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((hb, bk, d), jnp.float32),
            pltpu.VMEM((hb, bk, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(qp, kp, vp, bp, gp, lse, delta)

    return dq[:, :, :sq], dk[:, :, :sk], dv[:, :, :sk]


_flash_stream.defvjp(_flash_stream_fwd, _flash_stream_bwd)


def stream_fwd_lse(q, k, v, bias, scale):
    """Streaming forward returning (out, lse) with lse sliced to Sq —
    the building block ring attention merges across hops."""
    out, lse = _stream_fwd_impl(q, k, v, bias, scale)
    return out, lse[:, :, :q.shape[2]]


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    scale: float,
                    bias: jax.Array | None = None,
                    qk_norm: tuple | None = None,
                    qk_norm_eps: float = 1e-6) -> jax.Array:
    """Fused SDPA. q,k,v: (B, H, S, D); bias: optional (B, Sk) fp32 additive
    **key-mask** bias (0 attend / -1e30 drop) -> (B, H, Sq, D).

    The bias is a non-differentiable mask by contract: both schedules return
    a zero cotangent for it (a learned additive bias would silently get no
    gradient — pass such a bias through the XLA path instead).

    ``qk_norm``: optional (gamma_q, beta_q, gamma_k, beta_k), each (D,) — q/k
    then arrive RAW and the per-head LayerNorm (flax fast-variance semantics,
    fp32 stats, eps ``qk_norm_eps``) is fused into the full-block kernel,
    eliminating the separate LN passes and their HBM round trips (3.4 ms of
    the flagship forward, RESULTS.md round 5). The norm params DO get
    gradients (backward recomputes the unfused composition). The streaming
    schedule normalizes via XLA first — same math, unfused.

    Dispatch: full-block fused kernel while the (Sq, Sk) logits fit VMEM
    (<=1024 tokens), streaming online-softmax schedule beyond.
    """
    if bias is None:
        bias = jnp.zeros((q.shape[0], k.shape[2]), jnp.float32)
    if qk_norm is not None:
        gq, bq, gk, bk = qk_norm
        if _full_block_fits(q.shape, k.shape):
            return _flash_qknorm(q, k, v, bias, gq, bq, gk, bk, scale,
                                 qk_norm_eps)
        q = qk_layernorm(q, gq, bq, qk_norm_eps)
        k = qk_layernorm(k, gk, bk, qk_norm_eps)
    if _full_block_fits(q.shape, k.shape):
        return _flash(q, k, v, bias, scale)
    return _flash_stream(q, k, v, bias, scale)
