"""Int8 quantized serving path (w8a8) for the DiT sampler.

No reference counterpart — the reference serves eager fp16 torch
(``model/pipeline.py``); this is a TPU-native capability. The v5e MXU runs
int8 x int8 -> int32 at ~2x its bf16 rate (measured on this stack:
338.7 vs 189.1 TFLOP/s effective on a 4096^3 matmul, dynamic activation
quantization included), so the matmul-heavy DiT Euler loop gains serving
throughput for free in quality terms. Measured end-to-end on the flagship
696M AMD_N (real chip, ``benchmarks/bench_quant.py``): 1.15x on the DiT
velocity forward and on the full 10-step Euler sampler (45.8 vs 39.9 f/s).

The gap to the raw 1.8x matmul anchor is MEASURED, not asserted
(``benchmarks/bench_quant_breakdown.py``, real chip, round 4): (1) at the
model's actual serving shapes (M ~ 4.2k tokens, K = 1024) the int8 MXU
delivers only 1.24-1.60x with dynamic act quant (1.71-1.75x with
pre-quantized activations) — the 1.8x anchor needs a 4096-deep
contraction; (2) the per-token act-quant pass costs ~3.0 ms of the
34.3 ms int8 forward and is itself HBM-roofline-bound as a separate pass
(~660 GB/s on the FFN-down input), so only in-kernel fusion could recover
it (~1.26x ceiling); (3) int8 inside attention is COUNTERPRODUCTIVE at
this geometry — QK^T (266x64x266) measures 0.44x and PV 0.83x vs bf16,
because tiny contraction depths leave the MXU pipeline-bound where int8's
2x peak cannot express itself; (4) the absolute Amdahl cap with
zero-cost quantized matmuls is ~1.9x (the ~20.5 ms unquantized floor is
attention + norms + AdaLN + layout transposes + embeds/head). 1.15x is
therefore within ~9% of the realistic ceiling for this model geometry.

Scheme (the standard w8a8 recipe for DiT-family models):

* **Weights**: per-output-channel symmetric int8, quantized once offline
  (:func:`quantize_params`). The bias rides along unquantized so a serving
  process can drop the bf16/fp32 kernels entirely
  (:func:`strip_quantized`) — a 4x weight-memory cut for the quantized
  layers.
* **Activations**: dynamic per-token symmetric int8, computed inside the
  program (one abs-max + scale per token — VPU work that XLA fuses into
  the surrounding elementwise ops).
* **Coverage**: only the large projections quantize by default — attention
  q/k/v/out, the FFN pair, motion-token embeds (``min(kernel dims) >=
  512``). AdaLN modulation layers (named ``linear``), the timestep MLP
  (``linear_1/2``) and the patch embed / output head (``proj`` /
  small dims) stay in the compute dtype: modulation scales multiply whole
  streams and the small layers are a rounding error in FLOPs — the usual
  accuracy/coverage trade for diffusion transformers.

**Convolutions** (the SD-VAE decode path) quantize too: per-output-channel
int8 weights with a dynamic per-tensor activation scale (per-token scales
do not factor out of a spatial convolution — each output pixel mixes
inputs from a 3x3 neighbourhood, so only a scalar activation scale is
exact). XLA lowers int8 ``conv_general_dilated`` straight onto the int8
MXU: measured 247 vs 171 TFLOP/s bf16 (1.45x) on the dominant decoder
conv shape (16x128x128, 512ch, 3x3; real v5e chip). Sensitive boundary
convs (``conv_in`` from the 4-channel latent, the 3-channel ``conv_out``,
the 1x1 quant convs) fall below the size predicate and stay in the
compute dtype.

Integration is a Flax method interceptor (:func:`quantized_calls`): the
model definition is untouched; during an intercepted ``apply``, any
``nn.Dense`` whose path is in the table runs the int8 kernel instead. The
samplers in :mod:`hivae_tpu.models.amd` accept ``quant_table=`` and wrap
only the Euler-loop DiT applies — motion encoding runs once per clip and
stays in the compute dtype.

``nn.scan``-stacked layers (``scan_layers=True``) carry 3-D kernels the
interceptor cannot address (one shared module path serves every
iteration); :func:`quantize_params` REFUSES such trees so a mostly-bf16
"int8" table can't ship silently — unstack first
(:func:`unstack_scanned`); the inference CLIs and ``export_sampler.py``
do this automatically under ``--quant int8``.
"""

import contextlib
from collections.abc import Mapping
from typing import Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["quantize_params", "quantized_calls", "maybe_quantized",
           "quant_dense", "quant_conv", "quant_act", "fused_quant_ffn",
           "strip_quantized", "unstack_scanned", "default_predicate"]

# Dense names never quantized regardless of size: AdaLN modulation
# ("linear"), timestep-embedding MLP ("linear_1/2").
_SKIP_NAMES = ("linear", "linear_1", "linear_2")


def default_predicate(path: Tuple[str, ...], kernel: jax.Array,
                      min_dim: int = 512) -> bool:
    """Quantize 2-D (Dense) kernels with both dims >= ``min_dim``, and 4-D
    (Conv, HWIO) kernels whose input features ``kh*kw*ic >= min_dim`` and
    output channels ``>= min_dim // 4`` — excluding modulation/timestep
    layers by name. The conv thresholds keep the VAE's sensitive boundary
    convs (4-channel latent in, 3-channel image out) in the compute dtype."""
    if path[-1] in _SKIP_NAMES:
        return False
    if kernel.ndim == 2:
        return min(kernel.shape) >= min_dim
    if kernel.ndim == 4:
        kh, kw, ic, oc = kernel.shape
        return kh * kw * ic >= min_dim and oc >= max(min_dim // 4, 1)
    return False


def _quantize_kernel(kernel: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(..., N) -> per-output-channel symmetric int8 + fp32 scale (N,).

    The abs-max reduces over every axis but the last (the output features
    for both Dense ``(K, N)`` and HWIO Conv ``(kh, kw, ic, oc)`` kernels).
    """
    k32 = jnp.asarray(kernel, jnp.float32)
    scale = jnp.maximum(
        jnp.max(jnp.abs(k32), axis=tuple(range(k32.ndim - 1))), 1e-8) / 127.0
    w8 = jnp.clip(jnp.round(k32 / scale), -127, 127).astype(jnp.int8)
    return w8, scale


def _walk(tree, path=()):
    if isinstance(tree, Mapping):  # plain dict or flax FrozenDict
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    else:
        yield path, tree


def quantize_params(params, predicate: Optional[Callable] = None,
                    scope: Optional[Tuple[str, ...]] = (
                        "diffusion_transformer",)) -> Dict[str, Dict]:
    """Build a quantization table from a Flax param tree.

    Returns ``{"a/b/to_q": {"w8", "scale"[, "bias"]}}`` keyed by the
    module path (``"/"``-joined ``Module.path``, i.e. the param-tree path
    without the ``"params"`` root and the ``kernel`` leaf). ``scope``
    restricts quantization to one submodule (default: the DiT — the only
    stack the samplers run per Euler step); pass ``None`` for the whole
    tree.
    """
    pred = predicate or default_predicate
    tree = (params.get("params", params)
            if isinstance(params, Mapping) else params)
    table: Dict[str, Dict] = {}
    for path, leaf in _walk(tree):
        if path[-1] != "kernel":
            continue
        mod_path = path[:-1]
        if scope is not None and mod_path[:len(scope)] != tuple(scope):
            continue
        if hasattr(leaf, "ndim") and leaf.ndim == 3:
            # a 3-D Dense kernel is an nn.scan-stacked layer: the
            # interceptor addresses modules by path, and the stacked layout
            # serves every iteration through ONE path — quantizing around
            # it would silently ship a mostly-bf16 "int8" model
            raise ValueError(
                f"{'/'.join(mod_path)} is an nn.scan-stacked kernel "
                "(scan_layers=True); convert with unstack_scanned() and "
                "serve the unrolled layout under quantization")
        if not pred(mod_path, leaf):
            continue
        w8, scale = _quantize_kernel(leaf)
        entry = {"w8": w8, "scale": scale}
        # carry the bias so serving can strip the bf16 kernel AND never
        # read the module's own params
        parent = tree
        for k in mod_path:
            parent = parent[k]
        if "bias" in parent:
            entry["bias"] = parent["bias"]
        table["/".join(mod_path)] = entry
    if not table:
        raise ValueError(
            "quantize_params matched no kernels — wrong scope, a "
            "scan_layers-stacked tree (unstack_scanned first), or dims "
            "below the predicate's threshold")
    return table


def quant_act(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-token symmetric dynamic int8: (..., K) -> ((..., K) int8,
    (..., 1) fp32 scales)."""
    xf = jnp.asarray(x, jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def quant_dense(x: jax.Array, w8: jax.Array, scale: jax.Array,
                bias: Optional[jax.Array] = None,
                out_dtype=None) -> jax.Array:
    """y = dequant(quant(x) @ w8) + bias — the int8-MXU dense.

    ``x``: (..., K) any float dtype; ``w8``: (K, N) int8; ``scale``: (N,)
    fp32 per-output-channel weight scale. Activations are quantized
    per-token (symmetric, dynamic).
    """
    xq, sx = quant_act(x)
    y = jax.lax.dot_general(xq, w8, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype if out_dtype is not None else x.dtype)


def fused_quant_ffn(x: jax.Array, up: Dict, down: Dict,
                    out_dtype=None) -> jax.Array:
    """The whole int8 FFN (up -> tanh-gelu -> down) with the intermediate
    activation quantized in the up-matmul's Pallas epilogue
    (``ops/pallas/quant_ffn.py``) — the (M, inner) gelu output never
    round-trips HBM in bf16, recovering the measured ~3 ms/forward
    act-quant pass (benchmarks/RESULTS.md, int8 gap breakdown concl. 3).

    ``up``/``down`` are quant-table entries ({"w8", "scale"[, "bias"]}).
    Numerics: identical quantization grid to the unfused chain except the
    gelu input/output stay fp32 in VMEM (the unfused chain rounds the
    matmul output to the compute dtype before gelu) — strictly tighter.
    """
    from .pallas.quant_ffn import fused_ffn_up_quant

    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1])
    xq, sx = quant_act(xf)
    n = up["w8"].shape[1]
    b_up = up.get("bias")
    b_up = (jnp.zeros((n,), jnp.float32) if b_up is None
            else jnp.asarray(b_up, jnp.float32))
    yq, sy = fused_ffn_up_quant(xq, sx, up["w8"], up["scale"], b_up)
    y = jax.lax.dot_general(yq, down["w8"], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sy * down["scale"])
    if "bias" in down:
        y = y + down["bias"].astype(jnp.float32)
    out = y.astype(out_dtype if out_dtype is not None else x.dtype)
    return out.reshape(lead + (down["w8"].shape[1],))


def maybe_quantized(quant_table: Optional[Dict[str, Dict]],
                    fuse_ffn: bool = True):
    """``quantized_calls(table)`` when a table is given, else a null
    context — lets call sites keep ONE code path:

        with maybe_quantized(qt):
            return integrate(...)
    """
    if quant_table:
        return quantized_calls(quant_table, fuse_ffn=fuse_ffn)
    return contextlib.nullcontext()


def quant_conv(x: jax.Array, w8: jax.Array, scale: jax.Array,
               bias: Optional[jax.Array] = None, *,
               strides=(1, 1), padding="SAME", out_dtype=None) -> jax.Array:
    """y = dequant(quant(x) conv w8) + bias — the int8-MXU 2-D convolution.

    ``x``: (N, H, W, C) any float dtype; ``w8``: (kh, kw, ic, oc) int8;
    ``scale``: (oc,) fp32 per-output-channel weight scale. The activation
    scale is dynamic per-tensor (a scalar is the only factoring that is
    exact under spatial mixing). XLA lowers the int8 conv onto the MXU at
    ~1.45x the bf16 conv rate (measured, module docstring).
    """
    xf = jnp.asarray(x, jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, w8, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype if out_dtype is not None else x.dtype)


def _canon_conv(m: nn.Conv, x: jax.Array):
    """(strides, padding) in ``lax.conv_general_dilated`` form for a flax
    ``nn.Conv``, or None when the module uses features the int8 path does
    not reproduce (grouped/dilated convs, non-2D, circular padding)."""
    if x.ndim != 4 or len(m.kernel_size) != 2 or m.feature_group_count != 1:
        return None
    for dil in (m.input_dilation, m.kernel_dilation):
        if dil not in (None, 1, (1, 1)):
            return None
    s = m.strides or 1
    strides = (s, s) if isinstance(s, int) else tuple(s)
    p = m.padding
    if isinstance(p, str):
        if p not in ("SAME", "VALID"):
            return None
        padding = p
    elif isinstance(p, int):
        padding = ((p, p), (p, p))
    else:
        padding = tuple((pp, pp) if isinstance(pp, int) else tuple(pp)
                        for pp in p)
        if len(padding) != 2:
            return None
    return strides, padding


def quantized_calls(quant_table: Dict[str, Dict], fuse_ffn: bool = True):
    """Context manager: inside, any ``nn.Dense`` / ``nn.Conv`` whose module
    path is in ``quant_table`` runs the int8 kernel instead of its bf16
    matmul/conv. Active at trace time — wrap the ``model.apply`` (or the
    jitted region) whose layers should quantize.

    When BOTH Dense layers of a ``models.blocks.FeedForward`` are in the
    table and the geometry is lane-aligned, the whole FFN runs
    :func:`fused_quant_ffn` (the Pallas up+gelu+requantize epilogue) —
    ``fuse_ffn=False`` keeps the per-Dense path for A/B benches."""
    # lazy: models imports ops, so ops cannot import models at module scope
    from ..models.blocks import FeedForward

    def interceptor(next_fn, args, kwargs, context):
        m = context.module
        if context.method_name == "__call__":
            if fuse_ffn and isinstance(m, FeedForward):
                up = quant_table.get("/".join(m.path + ("net_0",)))
                down = quant_table.get("/".join(m.path + ("net_2",)))
                if up is not None and down is not None:
                    from .pallas.quant_ffn import supports

                    x = args[0]
                    rows = 1
                    for s in x.shape[:-1]:
                        rows *= s
                    k, n = up["w8"].shape
                    if supports(rows, k, n):
                        return fused_quant_ffn(
                            x, up, down, out_dtype=m.dtype or x.dtype)
                    # unsupported geometry: per-Dense interception below
            if isinstance(m, nn.Dense):
                entry = quant_table.get("/".join(m.path))
                if entry is not None:
                    return quant_dense(args[0], entry["w8"], entry["scale"],
                                       entry.get("bias"),
                                       out_dtype=m.dtype or args[0].dtype)
            elif isinstance(m, nn.Conv):
                entry = quant_table.get("/".join(m.path))
                if entry is not None:
                    geom = _canon_conv(m, args[0])
                    if geom is None:
                        # a silent bf16 fallback would read a kernel that
                        # strip_quantized may have pruned — fail loudly
                        raise NotImplementedError(
                            f"quantized conv {'/'.join(m.path)} uses a "
                            "geometry the int8 path does not reproduce "
                            "(grouped/dilated/non-2D); exclude it from the "
                            "quantization predicate")
                    return quant_conv(
                        args[0], entry["w8"], entry["scale"],
                        entry.get("bias"), strides=geom[0],
                        padding=geom[1],
                        out_dtype=m.dtype or args[0].dtype)
        return next_fn(*args, **kwargs)

    return nn.intercept_methods(interceptor)


def strip_quantized(params, quant_table: Dict[str, Dict]):
    """Drop the float kernels — and the biases the table carries a copy of
    — of quantized layers from the param tree (the interceptor never reads
    them): the serving tree holds int8 + scales in the table and bf16/fp32
    for everything else. Accepts plain dicts or flax FrozenDicts (returns
    plain dicts, which flax ``apply`` accepts)."""
    quantized = {tuple(k.split("/")) for k in quant_table}
    with_bias = {tuple(k.split("/")) for k, e in quant_table.items()
                 if "bias" in e}

    def prune(tree, path=()):
        if not isinstance(tree, Mapping):
            return tree
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if k == "kernel" and path in quantized:
                continue
            if k == "bias" and path in with_bias:
                continue
            out[k] = prune(v, p)
        return out

    if isinstance(params, Mapping) and "params" in params:
        return {**params, "params": prune(params["params"])}
    return prune(params)


def unstack_scanned(params, num_layers: int, stacked_name: str = "layers"):
    """Convert an ``nn.scan``-stacked DiT param subtree to the unrolled
    layout so a ``scan_layers=False`` model can load (and quantize) it.

    The scanned layout keeps one ``layers`` module whose children
    (``object_block`` / ``camera_block`` / ``spatial_block``) carry a
    leading layer axis; the unrolled layout names them
    ``{child}s_{i}`` at the DiT level (``models/dit.py:397-429``).
    """

    def split(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if k == stacked_name and isinstance(v, dict):
                for child, sub in v.items():
                    for i in range(num_layers):
                        out[f"{child}s_{i}"] = jax.tree_util.tree_map(
                            lambda leaf, i=i: leaf[i], sub)
            else:
                out[k] = split(v)
        return out

    return split(params)
