"""Label/text -> motion diffusion head.

Capability parity with the reference's text2motion package (reference:
``text2motion/t2m_model.py:17-490``): a label embedding is added to the
timestep embedding; object motion tokens are denoised (rectified flow)
conditioned on camera target motion, learnable alignment tokens, and the
reference image; per layer a motion self-block then a joint block over
[motion ‖ image] (``t2m_model.py:265-277``). A CLIP-style label embedding
table stands in for the reference's ``TextEncoder``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import embeddings as emb_ops
from ..ops import rectified_flow as rf
from .blocks import DiTBlock, Mlp, PatchEmbed, TimestepEmbedding

Dtype = Any


@dataclasses.dataclass(frozen=True)
class T2MConfig:
    label_dim: int = 512
    num_classes: int = 101           # UCF-101
    # must equal object_channel (the predicted velocity lives in
    # object-motion-token space); the reference's independent defaults
    # (512 vs 32) are unconstructible by its own loss
    motion_dim: int = 32
    refimg_width: int = 32
    refimg_height: int = 32
    refimg_patch_size: int = 2
    refimg_dim: int = 4
    num_frames: int = 16
    num_steps: int = 1000
    time_embed_dim: int = 768
    attention_head_dim: int = 128
    num_attention_heads: int = 16
    num_layers: int = 20
    camera_token_num: int = 8
    object_token_num: int = 16
    camera_channel: int = 8
    object_channel: int = 32

    @classmethod
    def from_dict(cls, d):
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})

    def to_dict(self):
        return dataclasses.asdict(self)


class Label2MotionDiffusionDecoder(nn.Module):
    cfg: T2MConfig
    dtype: Dtype = jnp.float32

    @property
    def hidden_dim(self):
        return self.cfg.num_attention_heads * self.cfg.attention_head_dim

    def embed_label(self, label: jax.Array) -> jax.Array:
        """int labels (N,) -> (N, label_dim) embeddings."""
        table = self.param("label_embedding", nn.initializers.normal(0.02),
                           (self.cfg.num_classes, self.cfg.label_dim))
        return table.astype(self.dtype)[label]

    @nn.compact
    def __call__(self, camera_target_motion, object_target_motion, label,
                 ref_img, timestep, object_source_motion=None,
                 noise: Optional[jax.Array] = None,
                 object_noisy: Optional[jax.Array] = None
                 ) -> Dict[str, jax.Array]:
        """camera_target (N,T,S,Cc), object_target (N*T,L,Co), label (N,) int
        or (N,label_dim) float, ref_img (N,T,C,H,W), timestep (N,)."""
        c = self.cfg
        hidden = self.hidden_dim
        n, t = ref_img.shape[:2]

        img = PatchEmbed(c.refimg_patch_size, hidden, name="patch_embed",
                         dtype=self.dtype)(
            ref_img.reshape((n * t,) + ref_img.shape[2:]))
        pos = jnp.asarray(emb_ops.get_2d_sincos_pos_embed(
            hidden, (c.refimg_height // c.refimg_patch_size,
                     c.refimg_width // c.refimg_patch_size))).astype(self.dtype)
        img = img + pos[None]

        if label.ndim == 1 and jnp.issubdtype(label.dtype, jnp.integer):
            label = self.embed_label(label)
        label_emb = Mlp(hidden, hidden, name="label_proj_in",
                        dtype=self.dtype)(label)
        temb = TimestepEmbedding(c.time_embed_dim, hidden,
                                 name="time_embedding",
                                 dtype=self.dtype)(timestep)
        emb = jnp.tile(temb + label_emb, (t, 1))

        cam = camera_target_motion.reshape(
            (-1,) + camera_target_motion.shape[2:])
        cam = nn.Dense(c.object_channel, name="camera_proj_in",
                       dtype=self.dtype)(cam)

        # rectified-flow noising of the object motion
        step = (1.0 - timestep / c.num_steps)[:, None, None]
        step = jnp.tile(step, (t, 1, 1))
        if object_noisy is not None:
            obj_zt = object_noisy
            vel_gt_object = jnp.zeros_like(obj_zt)
        else:
            if noise is None:
                noise = jax.random.normal(self.make_rng("noise"),
                                          object_target_motion.shape,
                                          object_target_motion.dtype)
            vel_gt_object = object_target_motion - noise
            obj_zt = step * object_target_motion + (1 - step) * noise

        bo = obj_zt.shape[0]
        align_c = jnp.broadcast_to(
            self.param("motion_align_c", nn.initializers.zeros,
                       (1, c.object_channel)).astype(self.dtype)[None],
            (bo, 1, c.object_channel))
        align_o = jnp.broadcast_to(
            self.param("motion_align_o", nn.initializers.zeros,
                       (1, c.object_channel)).astype(self.dtype)[None],
            (bo, 1, c.object_channel))

        if object_source_motion is not None:
            motion = jnp.concatenate([obj_zt, align_o, object_source_motion,
                                      align_c, cam], axis=1)
        else:
            motion = jnp.concatenate([obj_zt, align_c, cam], axis=1)
        x = Mlp(hidden, hidden, name="motion_proj_in", dtype=self.dtype)(motion)
        msl = x.shape[1]

        for i in range(c.num_layers):
            x = DiTBlock(hidden, c.num_attention_heads, c.attention_head_dim,
                         name=f"motion_blocks_{i}", dtype=self.dtype)(x, emb)
            joint = jnp.concatenate([x, img], axis=1)
            joint = DiTBlock(hidden, c.num_attention_heads,
                             c.attention_head_dim, name=f"image_blocks_{i}",
                             dtype=self.dtype)(joint, emb)
            x = joint[:, :msl]

        x = nn.LayerNorm(epsilon=1e-5, name="norm_final")(x)
        x = nn.Dense(c.motion_dim, name="proj_out", dtype=self.dtype)(x)

        if object_source_motion is not None:
            vel_pred_object = x[:, :c.object_token_num]
            vel_pred_camera = x[:, 2 * c.object_token_num + 2:]
        else:
            vel_pred_object = x[:, :c.object_token_num]
            vel_pred_camera = x[:, c.object_token_num + 1:]
        vel_pred_camera = nn.Dense(c.camera_channel, name="camera_proj_out",
                                   dtype=self.dtype)(vel_pred_camera)
        return {"vel_pred_camera": vel_pred_camera,
                "object_motion_with_noise": obj_zt,
                "vel_pred_object": vel_pred_object,
                "vel_gt_object": vel_gt_object}

    def __post_init__(self):
        super().__post_init__()
        if self.cfg.motion_dim != self.cfg.object_channel:
            raise ValueError(
                f"T2MConfig.motion_dim ({self.cfg.motion_dim}) must equal "
                f"object_channel ({self.cfg.object_channel}): the predicted "
                "velocity lives in object-motion-token space (reference "
                "t2m_model.py proj_out vs the RF target)")

    def loss(self, outputs: Dict[str, jax.Array]) -> jax.Array:
        d = (outputs["vel_pred_object"].astype(jnp.float32) -
             outputs["vel_gt_object"].astype(jnp.float32))
        return jnp.mean(jnp.square(d))


def sample(model: Label2MotionDiffusionDecoder, params, key, label,
           ref_img, camera_target_motion, sample_steps: int = 10,
           solver: str = "euler"):
    """Sample object motion tokens conditioned on label + camera. The whole
    walk is one ``lax.scan`` program (the former per-step Python loop paid
    one dispatch per step); ``solver='heun'`` uses the 2nd-order
    integrator."""
    c = model.cfg
    n, t = ref_img.shape[:2]
    shape = (n * t, c.object_token_num, c.object_channel)
    z0 = jax.random.normal(key, shape)
    step_seq = rf.sample_step_sequence(sample_steps, c.num_steps,
                                       c.num_steps)

    def vel_fn(z, tstep):
        out = model.apply(params, camera_target_motion, z, label, ref_img,
                          tstep[:n], object_noisy=z)
        return out["vel_pred_object"]

    integrate = rf.heun_sample if solver == "heun" else rf.euler_sample
    return integrate(vel_fn, z0, step_seq)
