"""Transformer block library (flax.linen).

Capability-parity rebuild of the reference block zoo
(reference: ``model/modules.py:651-2415``), designed TPU-first:

  * attention runs through ``ops.attention.sdpa`` (fp32 softmax, optional
    Pallas flash kernel) on (B, H, S, D) arrays;
  * patch embedding is a reshape+matmul (MXU-friendly) rather than a conv;
  * AdaLN-Zero modulation is expressed as one fused linear producing all
    chunks, with scale/shift/gate applied as elementwise epilogues XLA fuses
    into the surrounding matmuls;
  * joint-sequence blocks concatenate streams once per block and split after,
    exactly mirroring the reference's "concat then self-attend" design.

Torch-checkpoint compatibility: every parameter maps 1:1 onto the reference's
diffusers modules; see ``utils/torch_convert.py`` for the name map.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import attention as attn_ops
from ..ops import embeddings as emb_ops

Dtype = Any


def _split_heads(x: jax.Array, heads: int) -> jax.Array:
    b, s, _ = x.shape
    return x.reshape(b, s, heads, -1).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


class _QKNormParams(nn.Module):
    """Parameter container with exactly ``nn.LayerNorm``'s tree
    ({scale, bias}, fp32, ones/zeros init) so checkpoints and the torch
    converter are unchanged; the norm itself is applied inside
    ``ops.attention.sdpa`` — fused into the Pallas full-block kernel on
    that dispatch path, XLA reference math elsewhere."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        return scale, bias


class Attention(nn.Module):
    """Multi-head attention matching diffusers ``Attention`` semantics.

    ``qk_norm`` applies per-head LayerNorm (eps 1e-6) to q and k after the
    head split — the reference enables this on all self-attention blocks
    (``modules.py:699-707``) and disables it on the A2M cross-attentions.
    The norm is delegated to ``ops.attention.sdpa`` (fused into the Pallas
    kernel where that path dispatches). Output dim always equals ``dim``
    (the query dim).
    """

    dim: int
    heads: int
    head_dim: int
    qk_norm: bool = True
    qkv_bias: bool = True
    out_bias: bool = True
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None,
                 key_mask: Optional[jax.Array] = None) -> jax.Array:
        ctx = x if context is None else context
        inner = self.heads * self.head_dim
        dense = lambda name: nn.Dense(inner, use_bias=self.qkv_bias, name=name,
                                      dtype=self.dtype)
        q = _split_heads(dense("to_q")(x), self.heads)
        k = _split_heads(dense("to_k")(ctx), self.heads)
        v = _split_heads(dense("to_v")(ctx), self.heads)
        qk_params = None
        if self.qk_norm:
            # norms run fp32 (AMP semantics) and cast back to the compute
            # dtype; applied inside sdpa so the Pallas path fuses them
            gq, bq = _QKNormParams(self.head_dim, name="norm_q")()
            gk, bk = _QKNormParams(self.head_dim, name="norm_k")()
            qk_params = (gq, bq, gk, bk)
        out = attn_ops.sdpa(q, k, v, key_mask=key_mask, qk_norm=qk_params,
                            qk_norm_eps=self.eps)
        out = _merge_heads(out)
        return nn.Dense(self.dim, use_bias=self.out_bias, name="to_out",
                        dtype=self.dtype)(out)


class FeedForward(nn.Module):
    """MLP with tanh-approximate GELU (reference ``activation_fn=
    'gelu-approximate'`` -> diffusers ``GELU(approximate='tanh')``)."""

    dim: int
    inner_dim: Optional[int] = None
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.inner_dim or 4 * self.dim
        h = nn.Dense(inner, use_bias=self.use_bias, name="net_0", dtype=self.dtype)(x)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(self.dim, use_bias=self.use_bias, name="net_2",
                        dtype=self.dtype)(h)


class TimestepEmbedding(nn.Module):
    """Sinusoid + 2-layer SiLU MLP, matching diffusers ``Timesteps`` +
    ``TimestepEmbedding`` (flip_sin_to_cos=True, freq_shift=0)."""

    sinusoid_dim: int
    time_embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, timesteps: jax.Array) -> jax.Array:
        emb = emb_ops.timestep_embedding(timesteps, self.sinusoid_dim)
        emb = emb.astype(self.dtype)
        emb = nn.Dense(self.time_embed_dim, name="linear_1", dtype=self.dtype)(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.time_embed_dim, name="linear_2", dtype=self.dtype)(emb)


class PatchEmbed(nn.Module):
    """Non-overlapping patchify as reshape+matmul (equivalent to the
    reference's stride-p Conv2d, ``modules.py:843-879``, but MXU-native).

    Input (N, C, H, W) -> (N, H/p * W/p, embed_dim), tokens row-major over
    (h, w) — identical ordering to conv + flatten(2).transpose.
    """

    patch_size: int
    embed_dim: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, c, h, w = x.shape
        p = self.patch_size
        # (N,C,H,W) -> (N, h, w, C*p*p) with channel-major patch layout that
        # matches Conv2d weight layout (O, I, ph, pw) flattened as I*ph*pw.
        x = x.reshape(n, c, h // p, p, w // p, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(n, (h // p) * (w // p), c * p * p)
        return nn.Dense(self.embed_dim, use_bias=self.use_bias, name="proj",
                        dtype=self.dtype)(x)


# ---------------------------------------------------------------------------
def modulate(x: jax.Array, scale: jax.Array, shift: jax.Array) -> jax.Array:
    """AdaLN modulation epilogue ``x * (1 + scale) + shift``.

    A named function (rather than inline arithmetic) so the forward-breakdown
    ablation bench can intercept it and measure the elementwise modulation
    cost in-program (benchmarks/bench_fwd_breakdown.py)."""
    return x * (1.0 + scale) + shift


# AdaLN variants
# ---------------------------------------------------------------------------


class AdaLNZero(nn.Module):
    """Joint two-stream AdaLN-Zero (reference ``AMDLayerNormZero``,
    ``modules.py:881-904``): one linear -> 6 chunks; a single shared affine
    LayerNorm normalizes both streams."""

    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jax.Array, encoder: jax.Array, temb: jax.Array):
        mods = nn.Dense(6 * self.embed_dim, name="linear",
                        dtype=self.dtype)(nn.silu(temb))
        shift, scale, gate, e_shift, e_scale, e_gate = jnp.split(mods, 6, axis=-1)
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        hidden = modulate(norm(hidden), scale[:, None], shift[:, None])
        encoder = modulate(norm(encoder), e_scale[:, None], e_shift[:, None])
        return hidden, encoder, gate[:, None], e_gate[:, None]


class AdaLNZeroSingle(nn.Module):
    """One-stream AdaLN-Zero (reference ``AMDLayerNormZero_OneVariable``,
    ``modules.py:906-928``): linear -> (shift, scale, gate)."""

    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jax.Array, temb: jax.Array):
        mods = nn.Dense(3 * self.embed_dim, name="linear",
                        dtype=self.dtype)(nn.silu(temb))
        shift, scale, gate = jnp.split(mods, 3, axis=-1)
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        hidden = modulate(norm(hidden), scale[:, None], shift[:, None])
        return hidden, gate[:, None]


class AdaLNZeroTriple(nn.Module):
    """Three-stream AdaLN-Zero (reference ``AMDLayerNormZero2Condition``,
    ``modules.py:930-956``): linear -> 9 chunks, shared norm."""

    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, cond1, cond2, temb):
        mods = nn.Dense(9 * self.embed_dim, name="linear",
                        dtype=self.dtype)(nn.silu(temb))
        (shift, scale, gate, c1_shift, c1_scale, c1_gate,
         c2_shift, c2_scale, c2_gate) = jnp.split(mods, 9, axis=-1)
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        hidden = modulate(norm(hidden), scale[:, None], shift[:, None])
        cond1 = modulate(norm(cond1), c1_scale[:, None], c1_shift[:, None])
        cond2 = modulate(norm(cond2), c2_scale[:, None], c2_shift[:, None])
        return hidden, cond1, cond2, gate[:, None], c1_gate[:, None], c2_gate[:, None]


class AdaLayerNorm(nn.Module):
    """Shift/scale AdaLN used for DiT output heads and the Any2Motion blocks
    (reference ``AdaLayerNorm`` with ``chunk_dim=1``, ``modules.py:958-1013``):
    linear(silu(temb)) -> (shift, scale); affine LayerNorm."""

    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        mods = nn.Dense(2 * self.embed_dim, name="linear",
                        dtype=self.dtype)(nn.silu(temb))
        shift, scale = jnp.split(mods, 2, axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return modulate(x, scale[:, None], shift[:, None])


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


class BasicTransformerBlock(nn.Module):
    """Pre-LN self-attention block (reference ``modules.py:651-743``)."""

    dim: int
    heads: int
    head_dim: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 key_mask: Optional[jax.Array] = None) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + Attention(self.dim, self.heads, self.head_dim,
                          qkv_bias=self.qkv_bias, name="attn1",
                          dtype=self.dtype)(h, key_mask=key_mask)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x + FeedForward(self.dim, name="ff", dtype=self.dtype)(h)


class BasicCrossTransformerBlock(nn.Module):
    """Pre-LN cross-attention block: Q = hidden, KV = context (reference
    ``modules.py:745-840``; used by the camera OnlyTemporal encoder)."""

    dim: int
    heads: int
    head_dim: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + Attention(self.dim, self.heads, self.head_dim,
                          qkv_bias=self.qkv_bias, name="attn1",
                          dtype=self.dtype)(h, context)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x + FeedForward(self.dim, name="ff", dtype=self.dtype)(h)


class JointTransformerBlock(nn.Module):
    """Two-stream joint block (reference ``AMDTransformerBlock``,
    ``modules.py:1016-1109``): AdaLN-Zero both streams, concat
    [encoder, hidden], self-attend, split, gated residuals; same for the FF.

    Returns (hidden, encoder).
    """

    dim: int
    heads: int
    head_dim: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jax.Array, encoder: jax.Array, temb: jax.Array,
                 hidden_key_mask: Optional[jax.Array] = None):
        enc_len = encoder.shape[1]
        mask = None
        if hidden_key_mask is not None:
            # joint order is [encoder, hidden]; the mask hides dropped
            # hidden-stream tokens (e.g. jitter-masked camera sites) as keys
            mask = jnp.concatenate(
                [jnp.ones(encoder.shape[:2], dtype=bool),
                 hidden_key_mask], axis=1)
        h, e, gate, e_gate = AdaLNZero(self.dim, name="norm1",
                                       dtype=self.dtype)(hidden, encoder, temb)
        joint = jnp.concatenate([e, h], axis=1)
        out = Attention(self.dim, self.heads, self.head_dim,
                        qkv_bias=self.qkv_bias, name="attn1",
                        dtype=self.dtype)(joint, key_mask=mask)
        hidden = hidden + gate * out[:, enc_len:]
        encoder = encoder + e_gate * out[:, :enc_len]

        h, e, gate, e_gate = AdaLNZero(self.dim, name="norm2",
                                       dtype=self.dtype)(hidden, encoder, temb)
        joint = jnp.concatenate([e, h], axis=1)
        out = FeedForward(self.dim, name="ff", dtype=self.dtype)(joint)
        hidden = hidden + gate * out[:, enc_len:]
        encoder = encoder + e_gate * out[:, :enc_len]
        return hidden, encoder


class DiTBlock(nn.Module):
    """Single-stream AdaLN-Zero DiT block (reference ``BasicDiTBlock``,
    ``modules.py:1111-1188``)."""

    dim: int
    heads: int
    head_dim: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        h, gate = AdaLNZeroSingle(self.dim, name="norm1", dtype=self.dtype)(x, temb)
        x = x + gate * Attention(self.dim, self.heads, self.head_dim,
                                 qkv_bias=self.qkv_bias, name="attn1",
                                 dtype=self.dtype)(h)
        h, gate = AdaLNZeroSingle(self.dim, name="norm2", dtype=self.dtype)(x, temb)
        return x + gate * FeedForward(self.dim, name="ff", dtype=self.dtype)(h)


class MotionTemporalBlock(nn.Module):
    """Self-attention block over the temporal motion axis, with optional
    AdaLN conditioning (reference ``AMDTransformerMotionBlock``,
    ``modules.py:1191-1285``). Without temb it reduces to a plain pre-LN
    block (the configuration used by the temporal motion encoder)."""

    dim: int
    heads: int
    head_dim: int
    use_adaln: bool = False
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        if self.use_adaln:
            h, gate = AdaLNZeroSingle(self.dim, name="norm1", dtype=self.dtype)(x, temb)
        else:
            h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
            gate = 1.0
        x = x + gate * Attention(self.dim, self.heads, self.head_dim,
                                 qkv_bias=self.qkv_bias, name="attn1",
                                 dtype=self.dtype)(h)
        if self.use_adaln:
            h, gate = AdaLNZeroSingle(self.dim, name="norm2", dtype=self.dtype)(x, temb)
        else:
            h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
            gate = 1.0
        return x + gate * FeedForward(self.dim, name="ff", dtype=self.dtype)(h)


class JointBlock2Condition(nn.Module):
    """Three-stream joint block (reference ``TransformerBlock2Condition``,
    ``modules.py:1288-1382``): 9-way AdaLN-Zero, concat
    [hidden, cond1, cond2], self-attend, split with per-stream gates."""

    dim: int
    heads: int
    head_dim: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, cond1, cond2, temb):
        hl, c1l = hidden.shape[1], cond1.shape[1]
        h, c1, c2, g, g1, g2 = AdaLNZeroTriple(self.dim, name="norm1",
                                               dtype=self.dtype)(hidden, cond1,
                                                                 cond2, temb)
        joint = jnp.concatenate([h, c1, c2], axis=1)
        out = Attention(self.dim, self.heads, self.head_dim,
                        qkv_bias=self.qkv_bias, name="attn1",
                        dtype=self.dtype)(joint)
        hidden = hidden + g * out[:, :hl]
        cond1 = cond1 + g1 * out[:, hl:hl + c1l]
        cond2 = cond2 + g2 * out[:, hl + c1l:]

        h, c1, c2, g, g1, g2 = AdaLNZeroTriple(self.dim, name="norm2",
                                               dtype=self.dtype)(hidden, cond1,
                                                                 cond2, temb)
        joint = jnp.concatenate([h, c1, c2], axis=1)
        out = FeedForward(self.dim, name="ff", dtype=self.dtype)(joint)
        hidden = hidden + g * out[:, :hl]
        cond1 = cond1 + g1 * out[:, hl:hl + c1l]
        cond2 = cond2 + g2 * out[:, hl + c1l:]
        return hidden, cond1, cond2


class JointBlock2ConditionSimple(nn.Module):
    """Three-stream joint block with AdaLN only on the hidden stream
    (reference ``TransformerBlock2Condition_SimpleAdaLN``,
    ``modules.py:1384-1484``); conditions get plain pre-LN, ungated."""

    dim: int
    heads: int
    head_dim: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, cond1, cond2, temb):
        hl, c1l = hidden.shape[1], cond1.shape[1]
        h, gate = AdaLNZeroSingle(self.dim, name="norm1", dtype=self.dtype)(hidden, temb)
        c1 = nn.LayerNorm(epsilon=1e-5, name="norm1_condition1")(cond1)
        c2 = nn.LayerNorm(epsilon=1e-5, name="norm1_condition2")(cond2)
        joint = jnp.concatenate([h, c1, c2], axis=1)
        out = Attention(self.dim, self.heads, self.head_dim,
                        qkv_bias=self.qkv_bias, name="attn1",
                        dtype=self.dtype)(joint)
        hidden = hidden + gate * out[:, :hl]
        cond1 = cond1 + out[:, hl:hl + c1l]
        cond2 = cond2 + out[:, hl + c1l:]

        h, gate = AdaLNZeroSingle(self.dim, name="norm2", dtype=self.dtype)(hidden, temb)
        c1 = nn.LayerNorm(epsilon=1e-5, name="norm2_condition1")(cond1)
        c2 = nn.LayerNorm(epsilon=1e-5, name="norm2_condition2")(cond2)
        joint = jnp.concatenate([h, c1, c2], axis=1)
        out = FeedForward(self.dim, name="ff", dtype=self.dtype)(joint)
        hidden = hidden + gate * out[:, :hl]
        cond1 = cond1 + out[:, hl:hl + c1l]
        cond2 = cond2 + out[:, hl + c1l:]
        return hidden, cond1, cond2


class Any2MotionBlock(nn.Module):
    """Motion denoiser block with 3D self-attn + two cross-attns (reference
    ``Any2MotionTransformerBlock``, ``modules.py:1487-1629``).

    Input is (B*F, L, D); self-attention runs over the flattened (F*L)
    sequence. The cross-attentions (refimg, extra condition) have no qk-norm,
    matching the reference's constructor defaults.
    """

    dim: int
    heads: int
    head_dim: int
    motion_frames: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, refimg, extra, temb):
        f = self.motion_frames
        bf, l, d = x.shape
        b = bf // f
        x = AdaLayerNorm(self.dim, name="norm1", dtype=self.dtype)(x, temb)
        x3d = x.reshape(b, f * l, d)
        x3d = x3d + Attention(self.dim, self.heads, self.head_dim,
                              qkv_bias=self.qkv_bias, name="attn1",
                              dtype=self.dtype)(x3d)
        x = x3d.reshape(bf, l, d)

        x = AdaLayerNorm(self.dim, name="norm2", dtype=self.dtype)(x, temb)
        x = x + Attention(self.dim, self.heads, self.head_dim, qk_norm=False,
                          qkv_bias=self.qkv_bias, name="attn2",
                          dtype=self.dtype)(x, refimg)
        x = AdaLayerNorm(self.dim, name="norm3", dtype=self.dtype)(x, temb)
        x = x + Attention(self.dim, self.heads, self.head_dim, qk_norm=False,
                          qkv_bias=self.qkv_bias, name="attn3",
                          dtype=self.dtype)(x, extra)
        x = AdaLayerNorm(self.dim, name="norm4", dtype=self.dtype)(x, temb)
        return x + FeedForward(self.dim, name="ff", dtype=self.dtype)(x)


class A2MMotionSelfAttnBlock(nn.Module):
    """A2M joint self-attention over [ref_motion; motion] (reference
    ``modules.py:1729-1813``). Streams: motion (N,F*L,D), ref (N,L,D)."""

    dim: int
    heads: int
    head_dim: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, motion, ref_motion, temb):
        l = ref_motion.shape[1]
        m, r, gate, r_gate = AdaLNZero(self.dim, name="norm1",
                                       dtype=self.dtype)(motion, ref_motion, temb)
        joint = jnp.concatenate([r, m], axis=1)
        out = Attention(self.dim, self.heads, self.head_dim,
                        qkv_bias=self.qkv_bias, name="attn",
                        dtype=self.dtype)(joint)
        motion = motion + gate * out[:, l:]
        ref_motion = ref_motion + r_gate * out[:, :l]

        m, r, gate, r_gate = AdaLNZero(self.dim, name="norm2",
                                       dtype=self.dtype)(motion, ref_motion, temb)
        joint = jnp.concatenate([r, m], axis=1)
        out = FeedForward(self.dim, name="ff", dtype=self.dtype)(joint)
        motion = motion + gate * out[:, l:]
        ref_motion = ref_motion + r_gate * out[:, :l]
        return motion, ref_motion


class A2MCrossAttnBlock(nn.Module):
    """Per-frame audio cross-attention (reference ``modules.py:1632-1726``).

    motion (N,F*L,D) and ref (N,L,D) are re-batched to (N*(F+1), L, D) frames
    which cross-attend to per-frame condition windows (N*(F+1), W, D); the
    cross-attn has no qk-norm (reference constructor).
    """

    dim: int
    heads: int
    head_dim: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, motion, ref_motion, condition, temb):
        n, fl, d = motion.shape
        l = ref_motion.shape[1]
        f1 = fl // l + 1  # frames + ref
        if condition.ndim == 4:
            condition = condition.reshape(n * condition.shape[1],
                                          condition.shape[2], condition.shape[3])

        m, r, gate, r_gate = AdaLNZero(self.dim, name="norm1",
                                       dtype=self.dtype)(motion, ref_motion, temb)
        joint = jnp.concatenate([r, m], axis=1).reshape(n * f1, l, d)
        out = Attention(self.dim, self.heads, self.head_dim, qk_norm=False,
                        qkv_bias=self.qkv_bias, name="attn",
                        dtype=self.dtype)(joint, condition)
        out = out.reshape(n, f1 * l, d)
        motion = motion + gate * out[:, l:]
        ref_motion = ref_motion + r_gate * out[:, :l]

        m, r, gate, r_gate = AdaLNZero(self.dim, name="norm2",
                                       dtype=self.dtype)(motion, ref_motion, temb)
        joint = jnp.concatenate([r, m], axis=1)
        out = FeedForward(self.dim, name="ff", dtype=self.dtype)(joint)
        motion = motion + gate * out[:, l:]
        ref_motion = ref_motion + r_gate * out[:, :l]
        return motion, ref_motion


class RefMotionRefImageBlock(nn.Module):
    """Self-attn + cross-attn(ref motion) + cross-attn(ref image) block
    (reference ``RefMotionRefImgeBlock``, ``modules.py:1929-2067``)."""

    dim: int
    heads: int
    head_dim: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, refmotion, refimg, temb):
        x = AdaLayerNorm(self.dim, name="norm1", dtype=self.dtype)(x, temb)
        x = x + Attention(self.dim, self.heads, self.head_dim,
                          qkv_bias=self.qkv_bias, name="attn1",
                          dtype=self.dtype)(x)
        x = AdaLayerNorm(self.dim, name="norm2", dtype=self.dtype)(x, temb)
        x = x + Attention(self.dim, self.heads, self.head_dim, qk_norm=False,
                          qkv_bias=self.qkv_bias, name="attn2",
                          dtype=self.dtype)(x, refmotion)
        x = AdaLayerNorm(self.dim, name="norm3", dtype=self.dtype)(x, temb)
        x = x + Attention(self.dim, self.heads, self.head_dim, qk_norm=False,
                          qkv_bias=self.qkv_bias, name="attn3",
                          dtype=self.dtype)(x, refimg)
        x = AdaLayerNorm(self.dim, name="norm4", dtype=self.dtype)(x, temb)
        return x + FeedForward(self.dim, name="ff", dtype=self.dtype)(x)


class MotionTransferBlock(nn.Module):
    """Two-stream joint block with hidden stream first in the concat
    (reference ``MotionTrensferBlock``, ``modules.py:2141-2232``; note the
    reference's FF path concatenates in the opposite order — we reproduce
    that exactly for checkpoint parity)."""

    dim: int
    heads: int
    head_dim: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, encoder, temb):
        ml = hidden.shape[1]
        h, e, gate, e_gate = AdaLNZero(self.dim, name="norm1",
                                       dtype=self.dtype)(hidden, encoder, temb)
        joint = jnp.concatenate([h, e], axis=1)
        out = Attention(self.dim, self.heads, self.head_dim,
                        qkv_bias=self.qkv_bias, name="attn1",
                        dtype=self.dtype)(joint)
        hidden = hidden + gate * out[:, :ml]
        encoder = encoder + e_gate * out[:, ml:]

        h, e, gate, e_gate = AdaLNZero(self.dim, name="norm2",
                                       dtype=self.dtype)(hidden, encoder, temb)
        joint = jnp.concatenate([e, h], axis=1)  # reference order (:2226)
        out = FeedForward(self.dim, name="ff", dtype=self.dtype)(joint)
        hidden = hidden + gate * out[:, :ml]
        encoder = encoder + e_gate * out[:, ml:]
        return hidden, encoder


class A2PTemporalSpatialBlock(nn.Module):
    """Temporal-then-spatial attention block for pose prediction (reference
    ``modules.py:2236-2334``). Input/output (N,F,L,D)."""

    dim: int
    heads: int
    head_dim: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, f, l, d = x.shape
        xt = x.transpose(0, 2, 1, 3).reshape(n * l, f, d)
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(xt)
        xt = xt + Attention(self.dim, self.heads, self.head_dim,
                            qkv_bias=self.qkv_bias, name="attn1",
                            dtype=self.dtype)(h)
        xs = xt.reshape(n, l, f, d).transpose(0, 2, 1, 3).reshape(n * f, l, d)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(xs)
        xs = xs + Attention(self.dim, self.heads, self.head_dim,
                            qkv_bias=self.qkv_bias, name="attn2",
                            dtype=self.dtype)(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(xs)
        xs = xs + FeedForward(self.dim, name="ff", dtype=self.dtype)(h)
        return xs.reshape(n, f, l, d)


class A2PCrossAudioBlock(nn.Module):
    """Per-frame cross-attention to audio windows (reference
    ``modules.py:2337-2415``). hidden (N,F,L,D), audio (N,F,W,D)."""

    dim: int
    heads: int
    head_dim: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, audio: jax.Array) -> jax.Array:
        n, f, l, d = x.shape
        xf = x.reshape(n * f, l, d)
        af = audio.reshape(n * f, audio.shape[2], d)
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(xf)
        xf = xf + Attention(self.dim, self.heads, self.head_dim,
                            qkv_bias=self.qkv_bias, name="attn1",
                            dtype=self.dtype)(h, af)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(xf)
        xf = xf + FeedForward(self.dim, name="ff", dtype=self.dtype)(h)
        return xf.reshape(n, f, l, d)


# ---------------------------------------------------------------------------
# Audio feature MLPs (reference modules.py:1817-1926)
# ---------------------------------------------------------------------------


class Mlp(nn.Module):
    """timm-style MLP: fc1 -> GELU -> fc2 (reference uses timm ``Mlp``)."""

    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_features, name="fc1", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_features, name="fc2", dtype=self.dtype)(x)


class AudioFeatureMlp(nn.Module):
    """(N,F,M,C) -> (N,F,outdim) flatten + MLP (reference ``:1852-1889``)."""

    outdim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, audio: jax.Array) -> jax.Array:
        n, f, m, d = audio.shape
        audio = audio.reshape(n, f, m * d)
        return Mlp(self.outdim, self.outdim, name="mlp", dtype=self.dtype)(audio)


class AudioToImageShapeMlp(nn.Module):
    """(N,F,M,C) -> (N,F,outchannel,h,w) (reference ``:1817-1850``)."""

    outchannel: int
    out_height: int
    out_width: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, audio: jax.Array) -> jax.Array:
        n, f, m, d = audio.shape
        outdim = self.outchannel * self.out_height * self.out_width
        audio = audio.reshape(n, f, m * d)
        audio = Mlp(outdim, outdim, name="mlp", dtype=self.dtype)(audio)
        return audio.reshape(n, f, self.outchannel, self.out_height, self.out_width)


class AudioFeatureWindowMlp(nn.Module):
    """(N,F,M,C) -> (N,F,window,outdim): three ReLU linears + LayerNorm
    (reference ``:1891-1926``)."""

    intermediate_dim: int
    window_size: int
    outdim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, audio: jax.Array) -> jax.Array:
        n, f, m, d = audio.shape
        x = audio.reshape(n, f, m * d)
        x = nn.relu(nn.Dense(self.intermediate_dim, name="ff1", dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.intermediate_dim, name="ff2", dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.window_size * self.outdim, name="ff3",
                             dtype=self.dtype)(x))
        x = x.reshape(n, f, self.window_size, self.outdim)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)
