"""Diffusion-transformer decoder zoo.

Capability parity with the reference's eight DiT variants (reference:
``model/transformer.py:703-2786``), rebuilt as explicit compositions of the
block library. All variants share the same skeleton: patchify the image
latent(s) (zi‖zt, 2x4 channels), linearly embed motion tokens, add 2-D sincos
image positions + 1-D motion positions, run joint blocks, AdaLN-out,
unpatchify to a velocity field (N, C, H, W).

Naming map (ours -> reference):
  ReconstructionDiT           AMDReconstructTransformerModel       (:703)
  ReconstructionDiTSplit      AMDReconstructSplitTransformerModel  (:856)
  VelocityDiT                 AMDDiffusionTransformerModel         (:1014)
  VelocityDiTDualStream       ...DualStream                        (:1261)
  VelocityDiTTempMotion       ...TempMotion                        (:1483)
  VelocityDiTImgSpatialTempMotion ...ImgSpatialTempMotion          (:1746)
  VelocityDiTImgSpatial       ...ImgSpatial                        (:2046)
  VelocityDiTSplitInput       ...SplitInput                        (:2359)
  DiT2Condition               DiffusionTransformerModel2Condition  (:2572)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import embeddings as emb_ops
from .blocks import (AdaLayerNorm, DiTBlock, JointBlock2Condition,
                     JointTransformerBlock, MotionTemporalBlock, PatchEmbed,
                     TimestepEmbedding)

Dtype = Any


def unpatchify(tokens: jax.Array, height: int, width: int, patch: int,
               channels: int) -> jax.Array:
    """(N, h*w, p*p*C) -> (N, C, H, W), inverse of PatchEmbed's layout
    (reference unpatchify: ``transformer.py:1255-1257``)."""
    n = tokens.shape[0]
    hp, wp = height // patch, width // patch
    x = tokens.reshape(n, hp, wp, channels, patch, patch)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(n, channels, height, width)


def _pos2d(hidden: int, h: int, w: int, p: int, dtype) -> jax.Array:
    return jnp.asarray(
        emb_ops.get_2d_sincos_pos_embed(hidden, (h // p, w // p))).astype(dtype)[None]


def _pos1d(hidden: int, length: int, dtype) -> jax.Array:
    return jnp.asarray(emb_ops.get_1d_sincos_pos_embed(hidden, length)).astype(dtype)[None]


def _dots_sans_ffn_policy(prim, *args, **params):
    """Save dot outputs EXCEPT the 4x-wide FFN up-projection.

    At 696M the dots policy's saved gelu inputs (~4x hidden per token per
    layer) are what push batch 2 past 16 GB (benchmarks/RESULTS.md); this
    middle policy recomputes just that one expansion matmul in the backward
    and keeps every same-width dot (QKV/out/down-proj) resident. A wide dot
    is identified structurally: 2-operand dot_general whose output features
    exceed 2x its contracted width."""
    if not jax.checkpoint_policies.dots_with_no_batch_dims_saveable(
            prim, *args, **params):
        return False
    if "dot_general" not in str(prim) or len(args) < 2:
        return True
    dims = params.get("dimension_numbers")
    if dims is None:
        return True
    (_, rcontract), _ = dims
    rhs = args[1]
    shape = getattr(rhs, "shape", None)
    if shape is None or len(shape) != 2:
        return True
    cdim = rcontract[0] if rcontract else 0
    in_features = shape[cdim]
    out_features = shape[1 - cdim]
    return out_features <= 2 * in_features


class _DiTBase(nn.Module):
    """Shared configuration for the velocity DiTs."""

    heads: int = 20
    head_dim: int = 64
    out_channels: int = 4
    num_layers: int = 12
    image_height: int = 32
    image_width: int = 32
    image_patch_size: int = 2
    image_in_channels: int = 4
    motion_token_num: int = 12
    motion_in_channels: int = 128
    time_embed_dim: int = 512
    remat: bool = False
    # 'full' recomputes the whole block in the backward pass (min memory);
    # 'dots' saves matmul outputs and recomputes only the cheap elementwise
    # tail (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) —
    # trades HBM for MFU when the chip has headroom
    remat_policy: str = "full"
    dtype: Dtype = jnp.float32

    @property
    def hidden_dim(self):
        return self.heads * self.head_dim

    def _remat_kwargs(self):
        if self.remat_policy == "dots":
            return {"policy":
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable}
        if self.remat_policy == "dots_sans_ffn":
            # dots minus the 4x-wide FFN up-projection — the batch-2 OOM
            # driver at 696M (RESULTS.md); recompute that matmul instead
            return {"policy": _dots_sans_ffn_policy}
        if self.remat_policy == "dots_offload":
            # keep dot outputs but in host memory: HBM cost of 'full',
            # recompute cost of 'dots', paid in PCIe/DMA traffic instead
            return {"policy":
                    jax.checkpoint_policies.offload_dot_with_no_batch_dims(
                        "device", "pinned_host")}
        return {}

    def _blk(self, cls):
        """Optionally wrap a block class in nn.remat (activation
        checkpointing; reference gradient_checkpointing plumbing)."""
        return nn.remat(cls, **self._remat_kwargs()) if self.remat else cls

    def _time_emb(self, timestep):
        return TimestepEmbedding(self.hidden_dim, self.time_embed_dim,
                                 name="time_embedding",
                                 dtype=self.dtype)(timestep)

    def _head(self, img_tokens, emb, height, width):
        x = nn.LayerNorm(epsilon=1e-5, name="norm_final")(img_tokens)
        x = AdaLayerNorm(self.hidden_dim, name="norm_out", dtype=self.dtype)(x, emb)
        x = nn.Dense(self.image_patch_size ** 2 * self.out_channels,
                     name="proj_out", dtype=self.dtype)(x)
        return unpatchify(x, height, width, self.image_patch_size,
                          self.out_channels)


class VelocityDiT(_DiTBase):
    """Main velocity DiT (reference ``AMDDiffusionTransformerModel:1014``).

    motion_type='plus': camera+object tokens summed, one joint sequence.
    motion_type='decouple': camera tokens drive layers [0, camera_layers) and
    object tokens drive layers [object_from, num_layers) — the reference's
    layer-ranged injection (``transformer.py:1206-1236``).
    """

    motion_type: str = "decouple"
    camera_layers: int = 8
    object_from: int = 6

    @nn.compact
    def __call__(self, camera_motion_target, image_hidden_states, timestep,
                 camera_motion_source=None, object_motion_source=None,
                 object_motion_target=None):
        n, ci, hi, wi = image_hidden_states.shape
        l = camera_motion_target.shape[1]
        hidden = self.hidden_dim
        msl = 2 * l + 2

        emb = self._time_emb(timestep)
        img = PatchEmbed(self.image_patch_size, hidden, name="image_patch_embed",
                         dtype=self.dtype)(image_hidden_states)
        img = img + _pos2d(hidden, hi, wi, self.image_patch_size, self.dtype)

        motion_embed = nn.Dense(hidden, name="motion_patch_embed", dtype=self.dtype)
        src_tok = jnp.broadcast_to(
            self.param("source_token", nn.initializers.zeros,
                       (1, 1, hidden)).astype(self.dtype), (n, 1, hidden))
        tgt_tok = jnp.broadcast_to(
            self.param("target_token", nn.initializers.zeros,
                       (1, 1, hidden)).astype(self.dtype), (n, 1, hidden))
        mpos = _pos1d(hidden, msl, self.dtype)

        blocks = [self._blk(JointTransformerBlock)(hidden, self.heads, self.head_dim,
                                        name=f"blocks_{i}", dtype=self.dtype)
                  for i in range(self.num_layers)]

        if self.motion_type == "plus":
            # either stream may ride alone (refimg-motion sampling passes a
            # single source/target pair, reference model_AMD.py:819)
            def _sum(a, b):
                return a if b is None else (b if a is None else a + b)

            src = motion_embed(_sum(camera_motion_source,
                                    object_motion_source))
            tgt = motion_embed(_sum(camera_motion_target,
                                    object_motion_target))
            motion = jnp.concatenate([src_tok, src, tgt_tok, tgt], axis=1) + mpos
            for blk in blocks:
                motion, img = blk(motion, img, emb)
        else:  # decouple
            cam_tgt = motion_embed(camera_motion_target)
            if camera_motion_source is not None:
                cam_src = motion_embed(camera_motion_source)
                cam = jnp.concatenate([src_tok, cam_src, tgt_tok, cam_tgt], axis=1)
                cam = cam + mpos
            else:
                cam = jnp.concatenate([tgt_tok, cam_tgt], axis=1)
                cam = cam + mpos[:, :l + 1]

            if object_motion_source is None:
                motion = cam
                for blk in blocks:
                    motion, img = blk(motion, img, emb)
            else:
                obj_src = motion_embed(object_motion_source) + mpos[:, 1:l + 1]
                # NB: reference reuses obj_src here (transformer.py:1198); we
                # reproduce it for checkpoint-parity of trained behavior.
                obj_tgt = obj_src + mpos[:, l + 2:msl]
                motion = cam
                for blk in blocks[:self.camera_layers]:
                    motion, img = blk(motion, img, emb)
                if camera_motion_source is not None:
                    s_tok = motion[:, 0:1]
                    t_tok = motion[:, l + 1:l + 2]
                else:
                    s_tok, t_tok = src_tok, motion[:, 0:1]
                motion = jnp.concatenate([s_tok, obj_src, t_tok, obj_tgt], axis=1)
                for blk in blocks[self.object_from:]:
                    motion, img = blk(motion, img, emb)

        return self._head(img, emb, hi, wi)


class VelocityDiTTempMotion(_DiTBase):
    """Per-frame object-motion joint blocks with a temporal image position
    (reference ``AMDDiffusionTransformerModelTempMotion:1483-1743``).

    Batch layout: N = n * target_frames; images carry both spatial 2-D and
    temporal 1-D positions.
    """

    object_motion_in_channels: int = 64
    motion_target_num_frame: int = 16
    scan_layers: bool = False

    @nn.compact
    def __call__(self, image_hidden_states, timestep,
                 object_motion_source=None, object_motion_target=None):
        n_t, ci, hi, wi = image_hidden_states.shape
        t = self.motion_target_num_frame
        n = n_t // t
        hidden = self.hidden_dim
        s = hi * wi // self.image_patch_size ** 2

        emb = self._time_emb(timestep)
        img = PatchEmbed(self.image_patch_size, hidden, name="image_patch_embed",
                         dtype=self.dtype)(image_hidden_states)
        img = img + _pos2d(hidden, hi, wi, self.image_patch_size, self.dtype)
        tpos = _pos1d(hidden, t, self.dtype)
        img = img.reshape(n, t, s, hidden).transpose(0, 2, 1, 3) + tpos[:, None]
        img = img.transpose(0, 2, 1, 3).reshape(n_t, s, hidden)

        l = object_motion_target.shape[1]
        msl = 2 * l + 2
        obj_embed = nn.Dense(hidden, name="object_motion_patch_embed",
                             dtype=self.dtype)
        src_tok = jnp.broadcast_to(
            self.param("source_token", nn.initializers.zeros,
                       (1, 1, hidden)).astype(self.dtype), (n_t, 1, hidden))
        tgt_tok = jnp.broadcast_to(
            self.param("target_token", nn.initializers.zeros,
                       (1, 1, hidden)).astype(self.dtype), (n_t, 1, hidden))
        motion = jnp.concatenate([src_tok, obj_embed(object_motion_source),
                                  tgt_tok, obj_embed(object_motion_target)],
                                 axis=1)
        motion = motion + _pos1d(hidden, msl, self.dtype)

        if self.scan_layers:
            layer_cls = nn.remat(_SpatialTempLayer, prevent_cse=False,
                                 **self._remat_kwargs()) \
                if self.remat else _SpatialTempLayer
            Stacked = nn.scan(layer_cls, variable_axes={"params": 0},
                              split_rngs={"params": True},
                              length=self.num_layers,
                              metadata_params={nn.meta.PARTITION_NAME: None})
            carry = (motion, None, img, emb, None, None)
            (motion, _, img, emb, _, _), _ = Stacked(
                hidden=hidden, heads=self.heads, head_dim=self.head_dim,
                n=n, t=t, s=s, use_object=True, use_camera=False,
                use_spatial=False, name="layers", dtype=self.dtype)(carry, None)
        else:
            for i in range(self.num_layers):
                motion, img = self._blk(JointTransformerBlock)(
                    hidden, self.heads, self.head_dim,
                    name=f"object_blocks_{i}", dtype=self.dtype)(motion, img, emb)
        return self._head(img, emb, hi, wi)


class _SpatialTempLayer(nn.Module):
    """One ImgSpatialTempMotion layer: object joint block + camera joint
    block + per-pixel temporal spatial block. Factored out so the DiT can
    stack layers with ``nn.scan`` (one compiled layer body instead of L
    unrolled copies — ~10x faster XLA compiles at identical math)."""

    hidden: int
    heads: int
    head_dim: int
    n: int
    t: int
    s: int
    use_object: bool = True
    use_camera: bool = True
    use_spatial: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, _):
        motion, cam, img, emb, emb_s, cam_mask = carry
        n, t, s, hidden = self.n, self.t, self.s, self.hidden
        if self.use_object:
            motion, img = JointTransformerBlock(
                hidden, self.heads, self.head_dim, name="object_block",
                dtype=self.dtype)(motion, img, emb)
        if self.use_camera:
            cam, img = JointTransformerBlock(
                hidden, self.heads, self.head_dim, name="camera_block",
                dtype=self.dtype)(cam, img, emb, hidden_key_mask=cam_mask)
        if self.use_spatial:
            img = img.reshape(n, t, s, hidden).transpose(0, 2, 1, 3).reshape(
                n * s, t, hidden)
            img = DiTBlock(hidden, self.heads, self.head_dim,
                           name="spatial_block", dtype=self.dtype)(img, emb_s)
            img = img.reshape(n, s, t, hidden).transpose(0, 2, 1, 3).reshape(
                n * t, s, hidden)
        return (motion, cam, img, emb, emb_s, cam_mask), None


class VelocityDiTImgSpatialTempMotion(_DiTBase):
    """Object joint block + camera joint block + per-pixel temporal spatial
    block per layer (reference
    ``AMDDiffusionTransformerModelImgSpatialTempMotion:1746-2043``).

    Camera motion arrives as (n, T, S, Dc) per-site tokens.
    ``scan_layers`` stacks the layers with ``nn.scan`` (stacked param layout;
    big compile-time win) — use the unrolled default for torch-checkpoint
    name compatibility.
    """

    use_camera: bool = True
    use_object: bool = True
    camera_motion_in_channels: int = 16
    object_motion_in_channels: int = 64
    motion_target_num_frame: int = 16
    scan_layers: bool = False

    @nn.compact
    def __call__(self, image_hidden_states, timestep,
                 camera_motion_target=None, object_motion_source=None,
                 object_motion_target=None, camera_site_mask=None):
        n_t, ci, hi, wi = image_hidden_states.shape
        t = self.motion_target_num_frame
        n = n_t // t
        hidden = self.hidden_dim
        s = hi * wi // self.image_patch_size ** 2

        emb = self._time_emb(timestep)
        # per-spatial-site emb: first frame's emb broadcast over sites
        emb_s = emb.reshape(n, t, -1)[:, 0:1, :]
        emb_s = jnp.broadcast_to(emb_s, (n, s, emb.shape[-1])).reshape(n * s, -1)

        img = PatchEmbed(self.image_patch_size, hidden, name="image_patch_embed",
                         dtype=self.dtype)(image_hidden_states)
        img = img + _pos2d(hidden, hi, wi, self.image_patch_size, self.dtype)
        tpos = _pos1d(hidden, t, self.dtype)
        img = img.reshape(n, t, s, hidden).transpose(0, 2, 1, 3) + tpos[:, None]
        img = img.transpose(0, 2, 1, 3).reshape(n_t, s, hidden)

        cam = cam_mask = None
        if camera_motion_target is not None:
            nc, tc, sc, dc = camera_motion_target.shape
            cam = camera_motion_target.reshape(nc * tc, sc, dc)
            cam = nn.Dense(hidden, name="camera_motion_patch_embed",
                           dtype=self.dtype)(cam)
            if camera_site_mask is not None:  # (n, sc) per clip -> per frame
                cam_mask = jnp.repeat(camera_site_mask, tc, axis=0)

        motion = None
        if object_motion_source is not None:
            l = object_motion_target.shape[1]
            msl = 2 * l + 2
            obj_embed = nn.Dense(hidden, name="object_motion_patch_embed",
                                 dtype=self.dtype)
            src_tok = jnp.broadcast_to(
                self.param("source_token", nn.initializers.zeros,
                           (1, 1, hidden)).astype(self.dtype), (n_t, 1, hidden))
            tgt_tok = jnp.broadcast_to(
                self.param("target_token", nn.initializers.zeros,
                           (1, 1, hidden)).astype(self.dtype), (n_t, 1, hidden))
            motion = jnp.concatenate(
                [src_tok, obj_embed(object_motion_source),
                 tgt_tok, obj_embed(object_motion_target)], axis=1)
            motion = motion + _pos1d(hidden, msl, self.dtype)

        if self.scan_layers and (motion is not None or cam is not None):
            # single-stream sampling (sample_cross: camera only;
            # sample_with_refimg_motion: object only) rides the same scan:
            # the static use_* flags skip the absent block, None threads
            # through the carry unchanged, and flax ignores the unused
            # stacked block params in the checkpoint tree
            layer_cls = nn.remat(_SpatialTempLayer, prevent_cse=False,
                                 **self._remat_kwargs()) \
                if self.remat else _SpatialTempLayer
            Stacked = nn.scan(
                layer_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.num_layers,
                metadata_params={nn.meta.PARTITION_NAME: None})
            carry = (motion, cam, img, emb, emb_s, cam_mask)
            (motion, cam, img, emb, emb_s, cam_mask), _ = Stacked(
                hidden=hidden, heads=self.heads, head_dim=self.head_dim,
                n=n, t=t, s=s, use_object=motion is not None,
                use_camera=cam is not None,
                name="layers", dtype=self.dtype)(carry, None)
        else:
            for i in range(self.num_layers):
                if motion is not None:
                    motion, img = self._blk(JointTransformerBlock)(
                        hidden, self.heads, self.head_dim,
                        name=f"object_blocks_{i}", dtype=self.dtype)(motion, img, emb)
                if cam is not None:
                    cam, img = self._blk(JointTransformerBlock)(
                        hidden, self.heads, self.head_dim,
                        name=f"camera_blocks_{i}", dtype=self.dtype)(
                            cam, img, emb, hidden_key_mask=cam_mask)
                # spatial block over per-pixel temporal tubes
                img = img.reshape(n, t, s, hidden).transpose(0, 2, 1, 3).reshape(
                    n * s, t, hidden)
                img = self._blk(DiTBlock)(hidden, self.heads, self.head_dim,
                               name=f"spatial_blocks_{i}", dtype=self.dtype)(img, emb_s)
                img = img.reshape(n, s, t, hidden).transpose(0, 2, 1, 3).reshape(
                    n_t, s, hidden)

        return self._head(img, emb, hi, wi)


class VelocityDiTImgSpatial(_DiTBase):
    """Joint motion/image blocks interleaved with per-pixel temporal spatial
    blocks (reference ``AMDDiffusionTransformerModelImgSpatial:2046-2356``).

    decouple mode splits layers: camera drives [0, camera_until), object
    [object_from, L) (reference ``:2279-2324``, thresholds 6/6).
    """

    motion_type: str = "plus"
    motion_target_num_frame: int = 16
    camera_until: int = 6
    object_from: int = 6

    @nn.compact
    def __call__(self, camera_motion_target, image_hidden_states, timestep,
                 camera_motion_source=None, object_motion_source=None,
                 object_motion_target=None):
        n_t, ci, hi, wi = image_hidden_states.shape
        l = camera_motion_target.shape[1]
        t = self.motion_target_num_frame
        n = n_t // t
        hidden = self.hidden_dim
        s = hi * wi // self.image_patch_size ** 2
        msl = 2 * l + 2
        cam_msl = msl if camera_motion_source is not None else l + 1

        emb = self._time_emb(timestep)
        emb_s = emb.reshape(n, t, -1)[:, 0:1, :]
        emb_s = jnp.broadcast_to(emb_s, (n, s, emb.shape[-1])).reshape(n * s, -1)

        img = PatchEmbed(self.image_patch_size, hidden, name="image_patch_embed",
                         dtype=self.dtype)(image_hidden_states)
        img = img + _pos2d(hidden, hi, wi, self.image_patch_size, self.dtype)
        tpos = _pos1d(hidden, t, self.dtype)
        img = img.reshape(n, t, s, hidden).transpose(0, 2, 1, 3) + tpos[:, None]
        img = img.transpose(0, 2, 1, 3).reshape(n_t, s, hidden)

        motion_embed = nn.Dense(hidden, name="motion_patch_embed", dtype=self.dtype)
        src_tok = jnp.broadcast_to(
            self.param("source_token", nn.initializers.zeros,
                       (1, 1, hidden)).astype(self.dtype), (n_t, 1, hidden))
        tgt_tok = jnp.broadcast_to(
            self.param("target_token", nn.initializers.zeros,
                       (1, 1, hidden)).astype(self.dtype), (n_t, 1, hidden))
        mpos = _pos1d(hidden, msl, self.dtype)

        def joint(i):
            return self._blk(JointTransformerBlock)(hidden, self.heads, self.head_dim,
                                         name=f"blocks_{i}", dtype=self.dtype)

        def spatial(i):
            return self._blk(DiTBlock)(hidden, self.heads, self.head_dim,
                            name=f"spatial_blocks_{i}", dtype=self.dtype)

        def run_layer(i, motion, img):
            motion, img = joint(i)(motion, img, emb)
            img = img.reshape(n, t, s, hidden).transpose(0, 2, 1, 3).reshape(
                n * s, t, hidden)
            img = spatial(i)(img, emb_s)
            img = img.reshape(n, s, t, hidden).transpose(0, 2, 1, 3).reshape(
                n_t, s, hidden)
            return motion, img

        if self.motion_type == "plus":
            # reference 'plus' path feeds object tokens only (:2239-2240)
            src = motion_embed(object_motion_source)
            tgt = motion_embed(object_motion_target)
            motion = jnp.concatenate([src_tok, src, tgt_tok, tgt], axis=1) + mpos
            for i in range(self.num_layers):
                motion, img = run_layer(i, motion, img)
        else:
            cam_tgt = motion_embed(camera_motion_target)
            if camera_motion_source is not None:
                cam_src = motion_embed(camera_motion_source)
                cam = jnp.concatenate([src_tok, cam_src, tgt_tok, cam_tgt],
                                      axis=1) + mpos
            else:
                cam = jnp.concatenate([tgt_tok, cam_tgt], axis=1) + mpos[:, :cam_msl]
            if object_motion_source is None:
                motion = cam
                for i in range(self.num_layers):
                    motion, img = run_layer(i, motion, img)
            else:
                obj_src = motion_embed(object_motion_source) + mpos[:, 1:l + 1]
                obj_tgt = obj_src + mpos[:, l + 2:msl]  # reference :2265
                motion = cam
                for i in range(min(self.camera_until, self.num_layers)):
                    motion, img = run_layer(i, motion, img)
                if camera_motion_source is not None:
                    s_tok, t_tok = motion[:, 0:1], motion[:, l + 1:l + 2]
                else:
                    s_tok, t_tok = src_tok, motion[:, 0:1]
                motion = jnp.concatenate([s_tok, obj_src, t_tok, obj_tgt], axis=1)
                for i in range(min(self.object_from, self.num_layers),
                               self.num_layers):
                    motion, img = run_layer(i, motion, img)

        return self._head(img, emb, hi, wi)


class VelocityDiTDualStream(_DiTBase):
    """Temporal motion block + joint image block per layer (reference
    ``AMDDiffusionTransformerModelDualStream:1261-1481``)."""

    motion_target_num_frame: int = 16

    @nn.compact
    def __call__(self, motion_source, motion_target, image_hidden_states,
                 timestep):
        n_t, ci, hi, wi = image_hidden_states.shape
        l = motion_target.shape[1]
        t = self.motion_target_num_frame
        n = n_t // t
        hidden = self.hidden_dim
        msl = 2 * l + 2

        emb = self._time_emb(timestep)
        emb_m = emb.reshape(n, t, -1)[:, 0]

        img = PatchEmbed(self.image_patch_size, hidden, name="image_patch_embed",
                         dtype=self.dtype)(image_hidden_states)
        img = img + _pos2d(hidden, hi, wi, self.image_patch_size, self.dtype)

        motion_embed = nn.Dense(hidden, name="motion_patch_embed", dtype=self.dtype)
        init = nn.initializers.normal(stddev=0.02)
        src_tok = jnp.broadcast_to(
            self.param("source_token", init, (1, 1, hidden)).astype(self.dtype),
            (n_t, 1, hidden))
        tgt_tok = jnp.broadcast_to(
            self.param("target_token", init, (1, 1, hidden)).astype(self.dtype),
            (n_t, 1, hidden))
        motion = jnp.concatenate([src_tok, motion_embed(motion_source),
                                  tgt_tok, motion_embed(motion_target)], axis=1)
        motion = motion + _pos1d(hidden, msl, self.dtype)
        motion = motion.reshape(n, t * msl, hidden)
        motion = motion + _pos1d(hidden, 2 * t * (l + 1), self.dtype)[:, :t * msl]

        for i in range(self.num_layers):
            motion = MotionTemporalBlock(hidden, self.heads, self.head_dim,
                                         use_adaln=True,
                                         name=f"motion_blocks_{i}",
                                         dtype=self.dtype)(motion, emb_m)
            motion = motion.reshape(n_t, msl, hidden)
            motion, img = self._blk(JointTransformerBlock)(hidden, self.heads,
                                                self.head_dim,
                                                name=f"blocks_{i}",
                                                dtype=self.dtype)(motion, img, emb)
            motion = motion.reshape(n, t * msl, hidden)

        return self._head(img, emb, hi, wi)


class ReconstructionDiT(_DiTBase):
    """Timestep-free reconstruction transformer (reference
    ``AMDReconstructTransformerModel:703-854``)."""

    @nn.compact
    def __call__(self, motion_source, motion_target, image_hidden_states):
        from .blocks import BasicTransformerBlock

        n, ci, hi, wi = image_hidden_states.shape
        l = motion_source.shape[1]
        hidden = self.hidden_dim
        msl = 2 * l + 2

        motion_embed = nn.Dense(hidden, name="motion_patch_embed", dtype=self.dtype)
        img = PatchEmbed(self.image_patch_size, hidden, name="image_patch_embed",
                         dtype=self.dtype)(image_hidden_states)
        isl = img.shape[1]
        src_tok = jnp.broadcast_to(
            self.param("source_token", nn.initializers.zeros,
                       (1, 1, hidden)).astype(self.dtype), (n, 1, hidden))
        tgt_tok = jnp.broadcast_to(
            self.param("target_token", nn.initializers.zeros,
                       (1, 1, hidden)).astype(self.dtype), (n, 1, hidden))
        motion = jnp.concatenate([src_tok, motion_embed(motion_source),
                                  tgt_tok, motion_embed(motion_target)], axis=1)
        motion = motion + _pos1d(hidden, msl, self.dtype)
        img = img + _pos2d(hidden, hi, wi, self.image_patch_size, self.dtype)

        x = jnp.concatenate([img, motion], axis=1)
        for i in range(self.num_layers):
            x = BasicTransformerBlock(hidden, self.heads, self.head_dim,
                                      name=f"blocks_{i}", dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_final")(x[:, :isl])
        x = nn.Dense(self.image_patch_size ** 2 * self.out_channels,
                     name="proj_out", dtype=self.dtype)(x)
        return unpatchify(x, hi, wi, self.image_patch_size, self.out_channels)


class ReconstructionDiTSplit(_DiTBase):
    """Reconstruction transformer with split zi/zt patch embeds (reference
    ``AMDReconstructSplitTransformerModel:856-1010``)."""

    @nn.compact
    def __call__(self, motion_source, motion_target, image_hidden_states):
        from .blocks import BasicTransformerBlock

        n, ci, hi, wi = image_hidden_states.shape
        l = motion_source.shape[1]
        hidden = self.hidden_dim
        msl = 2 * l + 2

        motion_embed = nn.Dense(hidden, name="motion_patch_embed", dtype=self.dtype)
        zi = PatchEmbed(self.image_patch_size, hidden, name="zi_image_patch_embed",
                        dtype=self.dtype)(image_hidden_states[:, :ci // 2])
        zt = PatchEmbed(self.image_patch_size, hidden, name="zt_image_patch_embed",
                        dtype=self.dtype)(image_hidden_states[:, ci // 2:])
        isl = zt.shape[1]
        pos = _pos2d(hidden, hi, wi, self.image_patch_size, self.dtype)
        zi, zt = zi + pos, zt + pos
        src_tok = jnp.broadcast_to(
            self.param("source_token", nn.initializers.zeros,
                       (1, 1, hidden)).astype(self.dtype), (n, 1, hidden))
        tgt_tok = jnp.broadcast_to(
            self.param("target_token", nn.initializers.zeros,
                       (1, 1, hidden)).astype(self.dtype), (n, 1, hidden))
        motion = jnp.concatenate([src_tok, motion_embed(motion_source),
                                  tgt_tok, motion_embed(motion_target)], axis=1)
        motion = motion + _pos1d(hidden, msl, self.dtype)

        x = jnp.concatenate([zt, zi, motion], axis=1)
        for i in range(self.num_layers):
            x = BasicTransformerBlock(hidden, self.heads, self.head_dim,
                                      name=f"blocks_{i}", dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_final")(x[:, :isl])
        x = nn.Dense(self.image_patch_size ** 2 * self.out_channels,
                     name="proj_out", dtype=self.dtype)(x)
        return unpatchify(x, hi, wi, self.image_patch_size, self.out_channels)


class VelocityDiTSplitInput(_DiTBase):
    """Split zi/zt patch embeds + grid motion + 3-D positions (reference
    ``AMDDiffusionTransformerModelSplitInput:2359-2569``)."""

    motion_patch_size: int = 1
    motion_frames: int = 15

    @nn.compact
    def __call__(self, motion_hidden_states, image_hidden_states, timestep):
        n, ci, hi, wi = image_hidden_states.shape
        hidden = self.hidden_dim
        p = self.image_patch_size
        iph, ipw = hi // p, wi // p
        isl = 2 * iph * ipw

        emb = self._time_emb(timestep)
        motion = PatchEmbed(self.motion_patch_size, hidden,
                            name="motion_patch_embed",
                            dtype=self.dtype)(motion_hidden_states)
        zi = PatchEmbed(p, hidden, name="zi_patch_embed",
                        dtype=self.dtype)(image_hidden_states[:, :ci // 2])
        zt = PatchEmbed(p, hidden, name="zt_patch_embed",
                        dtype=self.dtype)(image_hidden_states[:, ci // 2:])
        img = jnp.concatenate([zi, zt], axis=1)
        pos3d = jnp.asarray(emb_ops.get_3d_sincos_pos_embed(
            hidden, (ipw, iph), 2)).reshape(1, -1, hidden).astype(self.dtype)
        img = img + pos3d[:, :isl]

        for i in range(self.num_layers):
            motion, img = self._blk(JointTransformerBlock)(hidden, self.heads,
                                                self.head_dim,
                                                name=f"blocks_{i}",
                                                dtype=self.dtype)(motion, img, emb)
        pre = img[:, isl // 2:]
        return self._head(pre, emb, hi, wi)


class DiT2Condition(_DiTBase):
    """Three-stream DiT: image / ref-image / grid-motion (reference
    ``DiffusionTransformerModel2Condition:2572-2786``)."""

    motion_patch_size: int = 1
    motion_frames: int = 15

    @nn.compact
    def __call__(self, hidden_states, refimg_hidden_states,
                 motion_hidden_states, timestep):
        n, ci, hi, wi = hidden_states.shape
        _, cm, hm, wm = motion_hidden_states.shape
        hidden = self.hidden_dim
        p = self.image_patch_size
        iph = hi // p
        isl = iph * (wi // p)
        msl = (hm // self.motion_patch_size) * (wm // self.motion_patch_size)

        emb = self._time_emb(timestep)
        x = PatchEmbed(p, hidden, name="image_patch_embed",
                       dtype=self.dtype)(hidden_states)
        ref = PatchEmbed(p, hidden, name="refimg_patch_embed",
                         dtype=self.dtype)(refimg_hidden_states)
        motion = PatchEmbed(self.motion_patch_size, hidden,
                            name="motion_patch_embed",
                            dtype=self.dtype)(motion_hidden_states)

        img_pos = jnp.asarray(emb_ops.get_3d_sincos_pos_embed(
            hidden, (iph, iph), 2)).reshape(1, -1, hidden).astype(self.dtype)
        mph = hm // self.motion_patch_size
        mot_pos = jnp.asarray(emb_ops.get_3d_sincos_pos_embed(
            hidden, (mph, mph), self.motion_frames)).reshape(
                1, -1, hidden).astype(self.dtype)
        x = x + img_pos[:, :isl]
        ref = ref + img_pos[:, isl:2 * isl]
        motion = motion + mot_pos[:, :msl]

        for i in range(self.num_layers):
            x, ref, motion = JointBlock2Condition(hidden, self.heads,
                                                  self.head_dim,
                                                  name=f"blocks_{i}",
                                                  dtype=self.dtype)(x, ref,
                                                                    motion, emb)
        return self._head(x, emb, hi, wi)
