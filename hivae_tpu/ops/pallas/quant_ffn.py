"""Fused int8 FFN-up + tanh-gelu + per-token requantize (serving path).

The int8 sampler gap breakdown (benchmarks/bench_quant_breakdown.py, real
chip, round 4) measured the separate per-token activation-quant pass at
~3.0 ms of the 34.3 ms int8 DiT forward, HBM-roofline-bound (~660 GB/s on
the 34 MB FFN-down input) — recoverable only by quantizing in the
producer's epilogue. This kernel IS that epilogue for the dominant case:
the FFN-down's int8 activations and per-token scales are emitted straight
from the FFN-up matmul, so the (M, N) gelu output never round-trips HBM
in bf16 (the naive chain writes 2·M·N bf16 bytes, re-reads them, and
writes M·N int8; the fused kernel writes M·N int8 + M scales, period).

Schedule: grid over M row-tiles; the int8 weight (K, N), its per-channel
scales, and the bias use constant index maps so they stay VMEM-resident
across grid steps. Each step runs ONE int8 MXU matmul over the full
contraction (K <= 1024 at every model geometry here, so no K loop),
dequantizes with (per-token sx · per-channel ws), applies the exact
tanh-gelu the bf16 path uses (``nn.gelu(approximate=True)``, reference
diffusers ``GELU(approximate='tanh')`` — modules.py FeedForward), reduces
the per-token abs-max IN VMEM, and writes int8 + scale.

Forward-only by design: the quant path serves samplers
(``hivae_tpu.ops.quant``), which never differentiate (round() is already
non-differentiable in the unfused path).

No reference counterpart — the reference serves eager fp16 torch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_ffn_up_quant", "supports"]

_LANE = 128
_VMEM_BUDGET = 12_000_000  # leave headroom under the ~16 MB core


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    """Pallas must run interpreted on CPU — including the ``init_on_cpu``
    eager-CPU scope inside a TPU process (same rule as flash_attention)."""
    dev = jax.config.jax_default_device
    if dev is not None and getattr(dev, "platform", None) == "cpu":
        return True
    return jax.default_backend() == "cpu"


def _pick_mt(k: int, n: int) -> int:
    """Largest M row-tile (multiple of the int8 sublane, 32) whose working
    set fits the budget: resident w8 (K·N) + per-step xq (MT·K), fp32
    accumulator/gelu (4·MT·N), int8 out (MT·N) and scales."""
    resident = k * n + n * 8
    for mt in (512, 256, 128, 64, 32):
        step = mt * k + 5 * mt * n + 16 * mt
        if resident + 2 * step <= _VMEM_BUDGET:  # 2x: pallas double-buffers
            return mt
    return 0


def supports(m: int, k: int, n: int) -> bool:
    """True when the fused schedule handles the geometry: lane-aligned
    contraction/output dims and a VMEM-feasible row tile. M is unrestricted
    (padded to the tile)."""
    if k % _LANE or n % _LANE:
        return False
    return _pick_mt(k, n) > 0


def _kernel(xq_ref, sx_ref, w_ref, ws_ref, b_ref, yq_ref, sy_ref):
    acc = jax.lax.dot_general(
        xq_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx_ref[:] * ws_ref[:]) + b_ref[:]
    y = jax.nn.gelu(y, approximate=True)
    m = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s = jnp.maximum(m, 1e-8) / 127.0
    yq_ref[:] = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    sy_ref[:] = s


@functools.partial(jax.jit, static_argnames=())
def fused_ffn_up_quant(xq: jax.Array, sx: jax.Array, w8: jax.Array,
                       wscale: jax.Array, bias: jax.Array):
    """(quantized x) -> int8 activations + scales for the FFN-down.

    ``xq``: (M, K) int8 per-token-quantized input; ``sx``: (M, 1) fp32 its
    scales; ``w8``: (K, N) int8 per-output-channel weights; ``wscale``:
    (N,) fp32; ``bias``: (N,) fp32 (pass zeros when the layer has none).
    Returns ``(yq, sy)``: (M, N) int8 and (M, 1) fp32 per-token scales of
    ``gelu_tanh(dequant(xq @ w8) + bias)``.
    """
    m, k = xq.shape
    n = w8.shape[1]
    mt = _pick_mt(k, n)
    assert mt > 0, "caller must gate on supports()"
    mp = _round_up(m, mt)
    if mp != m:
        xq = jnp.pad(xq, ((0, mp - m), (0, 0)))
        sx = jnp.pad(sx, ((0, mp - m), (0, 0)))
    ws2 = wscale.reshape(1, n).astype(jnp.float32)
    b2 = bias.reshape(1, n).astype(jnp.float32)
    grid = (mp // mt,)
    yq, sy = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((mt, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((mt, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, n), jnp.int8),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k + k * n + mp * n + 12 * n + 8 * mp,
            transcendentals=mp * n,
        ),
        interpret=_interpret(),
    )(xq, sx, w8, ws2, b2)
    if mp != m:
        yq, sy = yq[:m], sy[:m]
    return yq, sy
