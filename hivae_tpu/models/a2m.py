"""A2M / A2P: audio(+pose)-conditioned motion-token diffusion heads.

Capability parity with the reference's downstream heads (reference:
``model/model_A2M.py`` + the A2M transformers in
``model/transformer.py:2793-3867``):

  * ``A2MTransformerCrossAttnAudio``      — alternating joint self-attn +
    per-frame audio cross-attn blocks (reference ``:3137-3305``), wrapped by
    ``A2MModelCrossAttnAudio`` (reference ``model_A2M.py:875-1034``) — the
    production audio->motion head (config/a2m yamls).
  * pose / audio+pose variants (reference ``:3308-3708``).
  * ``A2MJointTransformer[Simple]``       — 3-stream joint blocks conditioned
    on per-frame audio embeddings (reference ``:2793-3133``), wrapped by
    ``A2MModelLearnableToken[SimpleAdaLN]`` (reference ``model_A2M.py:568-873``).
  * ``A2PTransformer``                    — audio->pose with mask tokens + 3-D
    positions (reference ``:3713-3867``).

Training forwards use the per-frame mask-weighted velocity MSE
(reference ``model_A2M.py:970-972``); sampling is a lax.scan Euler loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import embeddings as emb_ops
from ..ops import rectified_flow as rf
from .blocks import (A2MCrossAttnBlock, A2MMotionSelfAttnBlock,
                     A2PCrossAudioBlock, A2PTemporalSpatialBlock, AdaLayerNorm,
                     AudioFeatureMlp, AudioFeatureWindowMlp,
                     JointBlock2Condition, JointBlock2ConditionSimple,
                     PatchEmbed, TimestepEmbedding)
from .dit import unpatchify

Dtype = Any


def _pos1d(hidden, length, dtype):
    return jnp.asarray(emb_ops.get_1d_sincos_pos_embed(hidden, length)).astype(dtype)[None]


class A2MTransformerCrossAttnAudio(nn.Module):
    """Motion denoiser: per layer, a joint [ref;motion] self-attn block then a
    per-frame audio cross-attn block (reference ``:3137-3305``)."""

    motion_num_token: int = 12
    motion_inchannel: int = 128
    motion_frames: int = 128
    audio_in_channels: int = 128
    out_channels: int = 128
    heads: int = 8
    head_dim: int = 64
    num_layers: int = 16
    time_embed_dim: int = 512
    use_pose: bool = False
    pose_patch_size: int = 2
    pose_height: int = 32
    pose_width: int = 32
    use_audio: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, motion, ref_motion, audio=None, pose=None,
                 timestep=None):
        """motion (N,F,L,D), ref_motion (N,L,D), audio (N,F+1,W,Da),
        pose (N,F+1,C,h,w) -> velocity (N,F,L,D)."""
        n, f, l, d = motion.shape
        hidden = self.heads * self.head_dim

        emb = TimestepEmbedding(hidden, self.time_embed_dim,
                                name="time_embedding",
                                dtype=self.dtype)(timestep)
        motion = motion.reshape(n, f * l, d)
        motion = nn.Dense(hidden, name="motion_patch_embed",
                          dtype=self.dtype)(motion)
        ref = nn.Dense(hidden, name="refmotion_patch_embed",
                       dtype=self.dtype)(ref_motion)
        pos = _pos1d(hidden, self.motion_num_token +
                     self.motion_num_token * self.motion_frames, self.dtype)
        ref = ref + pos[:, :l]
        motion = motion + pos[:, l:l + f * l]

        if self.use_audio:
            audio = nn.Dense(hidden, name="audio_embed", dtype=self.dtype)(audio)
        if self.use_pose:
            nf = pose.shape[0] * pose.shape[1]
            pose_tok = PatchEmbed(self.pose_patch_size, hidden,
                                  name="pose_embed", dtype=self.dtype)(
                pose.reshape((nf,) + pose.shape[2:]))
            ppos = jnp.asarray(emb_ops.get_2d_sincos_pos_embed(
                hidden, (self.pose_height // self.pose_patch_size,
                         self.pose_width // self.pose_patch_size))).astype(
                self.dtype)[None]
            pose_tok = pose_tok + ppos
            pose_tok = pose_tok.reshape(n, nf // n, -1, hidden)

        for i in range(self.num_layers):
            motion, ref = A2MMotionSelfAttnBlock(
                hidden, self.heads, self.head_dim, name=f"motion_blocks_{i}",
                dtype=self.dtype)(motion, ref, emb)
            if self.use_audio:
                motion, ref = A2MCrossAttnBlock(
                    hidden, self.heads, self.head_dim,
                    name=f"audio_blocks_{i}", dtype=self.dtype)(
                    motion, ref, audio, emb)
            if self.use_pose:
                motion, ref = A2MCrossAttnBlock(
                    hidden, self.heads, self.head_dim,
                    name=f"pose_blocks_{i}", dtype=self.dtype)(
                    motion, ref, pose_tok, emb)

        motion = nn.LayerNorm(epsilon=1e-5, name="norm_final")(motion)
        motion = AdaLayerNorm(hidden, name="norm_out",
                              dtype=self.dtype)(motion, emb)
        motion = nn.Dense(self.out_channels, name="proj_out",
                          dtype=self.dtype)(motion)
        return motion.reshape(n, f, l, self.out_channels)


class A2MJointTransformer(nn.Module):
    """3-stream joint blocks over (motion, ref-motion, per-frame audio)
    (reference ``AudioMitionref_LearnableToken:2793-2961``).
    ``simple_adaln`` selects the SimpleAdaLN block variant (``:2965-3133``)."""

    motion_num_token: int = 12
    motion_inchannel: int = 128
    motion_frames: int = 128
    extra_in_channels: int = 768
    out_channels: int = 128
    heads: int = 8
    head_dim: int = 64
    num_layers: int = 16
    time_embed_dim: int = 512
    simple_adaln: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, motion, ref_motion, extra, timestep):
        """motion (N,F,L,D), ref_motion (N,L,D), extra (N,F,De)."""
        n, f, l, d = motion.shape
        hidden = self.heads * self.head_dim
        emb = TimestepEmbedding(hidden, self.time_embed_dim,
                                name="time_embedding",
                                dtype=self.dtype)(timestep)
        motion = motion.reshape(n, f * l, d)
        motion = nn.Dense(hidden, name="motion_patch_embed",
                          dtype=self.dtype)(motion)
        ref = nn.Dense(hidden, name="refmotion_patch_embed",
                       dtype=self.dtype)(ref_motion)
        extra = nn.Dense(hidden, name="extra_embed", dtype=self.dtype)(extra)

        pos = _pos1d(hidden, self.motion_num_token +
                     self.motion_num_token * self.motion_frames, self.dtype)
        ref = ref + pos[:, :l]
        motion = motion + pos[:, l:l + f * l]
        extra = extra + _pos1d(hidden, self.motion_frames, self.dtype)[:, :f]

        block_cls = (JointBlock2ConditionSimple if self.simple_adaln
                     else JointBlock2Condition)
        for i in range(self.num_layers):
            motion, ref, extra = block_cls(hidden, self.heads, self.head_dim,
                                           name=f"blocks_{i}",
                                           dtype=self.dtype)(motion, ref,
                                                             extra, emb)

        motion = nn.LayerNorm(epsilon=1e-5, name="norm_final")(motion)
        motion = AdaLayerNorm(hidden, name="norm_out",
                              dtype=self.dtype)(motion, emb)
        motion = nn.Dense(self.out_channels, name="proj_out",
                          dtype=self.dtype)(motion)
        return motion.reshape(n, f, l, self.out_channels)


class A2PTransformer(nn.Module):
    """Audio -> pose latents with pose mask tokens (reference ``:3713-3867``)."""

    audio_in_channels: int = 128
    pose_height: int = 32
    pose_width: int = 32
    pose_inchannel: int = 4
    pose_patch_size: int = 4
    pose_frame: int = 17
    heads: int = 8
    head_dim: int = 64
    num_layers: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ref_pose, audio):
        """ref_pose (N,C,H,W), audio (N,F,W,Da) -> (N,F,C,H,W)."""
        n, c, h, w = ref_pose.shape
        f = audio.shape[1]
        hidden = self.heads * self.head_dim
        p = self.pose_patch_size
        itl = (self.pose_height // p) * (self.pose_width // p)

        audio = nn.Dense(hidden, name="audio_embed", dtype=self.dtype)(audio)
        ref_tok = PatchEmbed(p, hidden, name="pose_embed",
                             dtype=self.dtype)(ref_pose)[:, None]
        mask_tok = self.param("pose_mask_token",
                              lambda k: 0.02 * jax.random.normal(
                                  k, (1, itl, hidden)))
        mask_tok = jnp.broadcast_to(mask_tok[None].astype(self.dtype),
                                    (n, f - 1, itl, hidden))
        pose = jnp.concatenate([ref_tok, mask_tok], axis=1)

        for i in range(self.num_layers):
            pose = A2PTemporalSpatialBlock(
                hidden, self.heads, self.head_dim,
                name=f"temporal_spatial_blocks_{i}", dtype=self.dtype)(pose)
            pose = A2PCrossAudioBlock(
                hidden, self.heads, self.head_dim,
                name=f"audio_blocks_{i}", dtype=self.dtype)(pose, audio)

        pose = nn.LayerNorm(epsilon=1e-5, name="norm_final")(pose)
        pose = nn.Dense(p * p * self.pose_inchannel, name="proj_out",
                        dtype=self.dtype)(pose)
        out = unpatchify(pose.reshape(n * f, itl, -1), h, w, p,
                         self.pose_inchannel)
        return out.reshape(n, f, self.pose_inchannel, h, w)


# -----------------------------------------------------------------------------
# Top-level A2M models
# -----------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class A2MConfig:
    """Mirror of the reference ``@register_to_config`` kwargs + OmegaConf
    yamls (e.g. ``config/a2m/cross_audio_t1d512_l16_dim1024.yaml``)."""

    audio_inchannel: int = 384
    audio_block: int = 50
    motion_num_token: int = 12
    motion_in_channel: int = 128
    motion_frames: int = 128
    num_step: int = 1000
    # audio feature encoder
    intermediate_dim: int = 1024
    window_size: int = 32
    encoder_out_dim: int = 768
    # pose
    pose_height: int = 32
    pose_width: int = 32
    pose_inchannel: int = 4
    pose_patch_size: int = 2
    # diffusion transformer
    diffusion_attn_head_dim: int = 64
    diffusion_attn_num_heads: int = 16
    diffusion_num_layers: int = 8
    # audio->pose predictor head (PosePre variant)
    pose_predictor_attn_head_dim: int = 64
    pose_predictor_attn_num_heads: int = 8
    pose_predictor_attn_num_layers: int = 4
    # grid-motion legacy variant (A2MModelMlp; reference model_A2M.py:212)
    motion_height: int = 4
    motion_width: int = 4
    motion_patch_size: int = 1
    image_inchannel: int = 4
    image_height: int = 32
    image_width: int = 32
    image_patch_size: int = 2
    time_embed_dim: int = 512

    @classmethod
    def from_dict(cls, d):
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})

    def to_dict(self):
        return dataclasses.asdict(self)


class A2MModelCrossAttnAudio(nn.Module):
    """Audio->motion diffusion head (reference ``model_A2M.py:875-1034``).

    variant: 'audio' | 'audio_pose' | 'pose' selects the conditioning blocks
    (reference classes ``A2MModel_CrossAtten_Audio[_Pose]`` / ``_Pose``).
    """

    cfg: A2MConfig
    variant: str = "audio"
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        use_audio = self.variant in ("audio", "audio_pose")
        use_pose = self.variant in ("pose", "audio_pose")
        if use_audio:
            self.audio_encoder = AudioFeatureWindowMlp(
                intermediate_dim=c.intermediate_dim,
                window_size=c.window_size, outdim=c.encoder_out_dim,
                dtype=self.dtype)
        self.diffusion = A2MTransformerCrossAttnAudio(
            motion_num_token=c.motion_num_token,
            motion_inchannel=c.motion_in_channel,
            motion_frames=c.motion_frames,
            audio_in_channels=c.encoder_out_dim,
            out_channels=c.motion_in_channel,
            heads=c.diffusion_attn_num_heads,
            head_dim=c.diffusion_attn_head_dim,
            num_layers=c.diffusion_num_layers,
            use_pose=use_pose, use_audio=use_audio,
            pose_height=c.pose_height, pose_width=c.pose_width,
            pose_patch_size=c.pose_patch_size, dtype=self.dtype)

    def _conditions(self, audio, ref_audio, pose, ref_pose):
        cond = {}
        if self.variant in ("audio", "audio_pose"):
            mix_audio = jnp.concatenate([ref_audio[:, None], audio], axis=1)
            cond["audio"] = self.audio_encoder(mix_audio)
        if self.variant in ("pose", "audio_pose"):
            cond["pose"] = jnp.concatenate([ref_pose[:, None], pose], axis=1)
        return cond

    def __call__(self, motion_gt, ref_motion, audio=None, ref_audio=None,
                 pose=None, ref_pose=None, mask=None, timestep=None):
        """Returns loss_dict with the per-frame mask-weighted velocity MSE."""
        c = self.cfg
        n, f, l, d = motion_gt.shape
        cond = self._conditions(audio, ref_audio, pose, ref_pose)

        kt, kz = jax.random.split(self.make_rng("noise"))
        if timestep is None:
            timestep = jax.random.randint(kt, (n,), 0, c.num_step + 1)
        z0 = jax.random.normal(kz, motion_gt.shape, motion_gt.dtype)
        zt, vel_gt = rf.get_train_tuple(motion_gt, timestep, z0,
                                        num_steps=c.num_step)
        vel_pred = self.diffusion(zt, ref_motion,
                                  timestep=timestep.astype(jnp.float32),
                                  **cond)
        if mask is None:
            mask = jnp.ones((n, f))
        diff = jnp.mean(jnp.square(vel_pred.astype(jnp.float32) -
                                   vel_gt.astype(jnp.float32)), axis=(2, 3))
        diff_loss = jnp.sum(diff * mask) / jnp.sum(mask)
        return {"loss": diff_loss, "diff_loss": diff_loss}

    def velocity(self, zt, ref_motion, timestep, **cond):
        return self.diffusion(zt, ref_motion, timestep=timestep, **cond)

    def conditions(self, audio=None, ref_audio=None, pose=None, ref_pose=None):
        return self._conditions(audio, ref_audio, pose, ref_pose)


class A2MModelPosePre(nn.Module):
    """Audio->motion head with a jointly-trained audio->pose predictor
    (reference ``A2MModel_CrossAtten_Audio_PosePre:1218-1420``).

    The decoder's pose conditioning is *predicted* from (ref_pose, audio) by
    an ``A2PTransformer`` rather than taken from ground truth, so sampling
    needs only one reference pose frame; training adds a mask-weighted pose
    MSE on top of the velocity loss (reference ``:1350-1356``). Note: the
    reference passes head-count/head-dim to its A2PTransformer swapped
    (``:1275-1276``); here they are wired by name.
    """

    cfg: A2MConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.audio_encoder = AudioFeatureWindowMlp(
            intermediate_dim=c.intermediate_dim,
            window_size=c.window_size, outdim=c.encoder_out_dim,
            dtype=self.dtype)
        self.pose_predictor = A2PTransformer(
            audio_in_channels=c.encoder_out_dim,
            pose_height=c.pose_height, pose_width=c.pose_width,
            pose_inchannel=c.pose_inchannel,
            pose_patch_size=c.pose_patch_size,
            heads=c.pose_predictor_attn_num_heads,
            head_dim=c.pose_predictor_attn_head_dim,
            num_layers=c.pose_predictor_attn_num_layers, dtype=self.dtype)
        self.diffusion = A2MTransformerCrossAttnAudio(
            motion_num_token=c.motion_num_token,
            motion_inchannel=c.motion_in_channel,
            motion_frames=c.motion_frames,
            audio_in_channels=c.encoder_out_dim,
            out_channels=c.motion_in_channel,
            heads=c.diffusion_attn_num_heads,
            head_dim=c.diffusion_attn_head_dim,
            num_layers=c.diffusion_num_layers,
            use_pose=True, use_audio=True,
            pose_height=c.pose_height, pose_width=c.pose_width,
            pose_patch_size=c.pose_patch_size, dtype=self.dtype)

    def _conditions(self, audio, ref_audio, ref_pose):
        mix_audio = jnp.concatenate([ref_audio[:, None], audio], axis=1)
        audio_feature = self.audio_encoder(mix_audio)       # (N,F+1,W,D)
        mix_pose_pre = self.pose_predictor(ref_pose, audio_feature)
        return {"audio": audio_feature, "pose": mix_pose_pre}

    def __call__(self, motion_gt, ref_motion, audio=None, ref_audio=None,
                 pose=None, ref_pose=None, mask=None, timestep=None):
        """``pose`` is the GT pose video (N,F,C,H,W) for the auxiliary loss;
        returns {loss, diff_loss, pose_loss}."""
        c = self.cfg
        n, f, l, d = motion_gt.shape
        cond = self._conditions(audio, ref_audio, ref_pose)

        kt, kz = jax.random.split(self.make_rng("noise"))
        if timestep is None:
            timestep = jax.random.randint(kt, (n,), 0, c.num_step + 1)
        z0 = jax.random.normal(kz, motion_gt.shape, motion_gt.dtype)
        zt, vel_gt = rf.get_train_tuple(motion_gt, timestep, z0,
                                        num_steps=c.num_step)
        vel_pred = self.diffusion(zt, ref_motion,
                                  timestep=timestep.astype(jnp.float32),
                                  **cond)
        if mask is None:
            mask = jnp.ones((n, f))
        diff = jnp.mean(jnp.square(vel_pred.astype(jnp.float32) -
                                   vel_gt.astype(jnp.float32)), axis=(2, 3))
        diff_loss = jnp.sum(diff * mask) / jnp.sum(mask)

        pose_pre = cond["pose"][:, 1:]                       # drop ref frame
        perr = jnp.mean(jnp.square(pose_pre.astype(jnp.float32) -
                                   pose.astype(jnp.float32)), axis=(2, 3, 4))
        pose_loss = jnp.sum(perr * mask) / jnp.sum(mask)
        return {"loss": diff_loss + pose_loss, "diff_loss": diff_loss,
                "pose_loss": pose_loss}

    def velocity(self, zt, ref_motion, timestep, **cond):
        return self.diffusion(zt, ref_motion, timestep=timestep, **cond)

    def conditions(self, audio=None, ref_audio=None, pose=None,
                   ref_pose=None):
        return self._conditions(audio, ref_audio, ref_pose)

    def predict_pose(self, audio, ref_audio, ref_pose):
        """Pose-only path (the reference's ``vis.py`` visualization surface)."""
        return self._conditions(audio, ref_audio, ref_pose)["pose"]


class A2MModelLearnableToken(nn.Module):
    """Joint 3-stream A2M head with MLP audio features (reference
    ``A2MModel_LearnableToken:568`` / ``_SimpleAdaLN:723``)."""

    cfg: A2MConfig
    simple_adaln: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.audio_encoder = AudioFeatureMlp(outdim=c.encoder_out_dim,
                                             dtype=self.dtype)
        self.diffusion = A2MJointTransformer(
            motion_num_token=c.motion_num_token,
            motion_inchannel=c.motion_in_channel,
            motion_frames=c.motion_frames,
            extra_in_channels=c.encoder_out_dim,
            out_channels=c.motion_in_channel,
            heads=c.diffusion_attn_num_heads,
            head_dim=c.diffusion_attn_head_dim,
            num_layers=c.diffusion_num_layers,
            simple_adaln=self.simple_adaln, dtype=self.dtype)

    def __call__(self, motion_gt, ref_motion, audio, ref_audio=None,
                 mask=None, timestep=None):
        c = self.cfg
        n, f, l, d = motion_gt.shape
        audio_feature = self.audio_encoder(audio)  # (N,F,D)

        kt, kz = jax.random.split(self.make_rng("noise"))
        if timestep is None:
            timestep = jax.random.randint(kt, (n,), 0, c.num_step + 1)
        z0 = jax.random.normal(kz, motion_gt.shape, motion_gt.dtype)
        zt, vel_gt = rf.get_train_tuple(motion_gt, timestep, z0,
                                        num_steps=c.num_step)
        vel_pred = self.diffusion(zt, ref_motion, audio_feature,
                                  timestep.astype(jnp.float32))
        if mask is None:
            mask = jnp.ones((n, f))
        diff = jnp.mean(jnp.square(vel_pred.astype(jnp.float32) -
                                   vel_gt.astype(jnp.float32)), axis=(2, 3))
        diff_loss = jnp.sum(diff * mask) / jnp.sum(mask)
        return {"loss": diff_loss, "diff_loss": diff_loss}

    def velocity(self, zt, ref_motion, timestep, audio_feature=None):
        return self.diffusion(zt, ref_motion, audio_feature, timestep)

    def conditions(self, audio=None, **_):
        return {"audio_feature": self.audio_encoder(audio)}


class Audio2MotionGridDiT(nn.Module):
    """Three-stream grid-motion denoiser (reference
    ``downstream_tasks/modules.py:1063-1270`` ``Audio2MotionAllSequence``):
    streams = patchified motion grids with 3-D positions, channel-concat
    (refimg ‖ pose) patch tokens with 2-D positions, and linearly embedded
    audio tokens; ``JointBlock2Condition`` blocks; AdaLN head unpatchified
    back to (N, F, C, h, w)."""

    heads: int = 16
    head_dim: int = 64
    motion_in_channels: int = 256
    refimg_in_channels: int = 4
    extra_in_channels: int = 768
    out_channels: int = 256
    num_layers: int = 8
    image_height: int = 32
    image_width: int = 32
    image_patch_size: int = 2
    motion_height: int = 4
    motion_width: int = 4
    motion_patch_size: int = 1
    motion_frames: int = 15
    time_embed_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, motion_hidden_states, refimg_hidden_states,
                 pose_hidden_states, extra_hidden_states, timestep):
        """motion (N,F,Cm,Hm,Wm), refimg/pose (N,C,H,W), extra (N,F,D),
        timestep (N,) -> velocity (N,F,Cm,Hm,Wm)."""
        hidden = self.heads * self.head_dim
        n, f, cm, hm, wm = motion_hidden_states.shape
        p = self.motion_patch_size
        mph, mpw = hm // p, wm // p
        iph = self.image_height // self.image_patch_size
        ipw = self.image_width // self.image_patch_size

        emb = TimestepEmbedding(hidden, self.time_embed_dim,
                                name="time_embedding",
                                dtype=self.dtype)(timestep)

        motion = PatchEmbed(p, hidden, name="motion_patch_embed",
                            dtype=self.dtype)(
            motion_hidden_states.reshape(n * f, cm, hm, wm))
        motion = motion.reshape(n, f * mph * mpw, hidden)
        mot_pos = jnp.asarray(emb_ops.get_3d_sincos_pos_embed(
            hidden, (mph, mph), f)).reshape(1, -1, hidden).astype(self.dtype)
        motion = motion + mot_pos[:, :f * mph * mpw]

        ref_pose = jnp.concatenate([refimg_hidden_states,
                                    pose_hidden_states], axis=1)
        ref_pose = PatchEmbed(self.image_patch_size, hidden,
                              name="refimg_pose_patch_embed",
                              dtype=self.dtype)(ref_pose)
        img_pos = jnp.asarray(emb_ops.get_2d_sincos_pos_embed(
            hidden, (iph, ipw))).astype(self.dtype)
        ref_pose = ref_pose + img_pos[None]

        extra = nn.Dense(hidden, name="extra_embed",
                         dtype=self.dtype)(extra_hidden_states)

        for i in range(self.num_layers):
            motion, ref_pose, extra = JointBlock2Condition(
                hidden, self.heads, self.head_dim, name=f"blocks_{i}",
                dtype=self.dtype)(motion, ref_pose, extra, emb)

        x = nn.LayerNorm(epsilon=1e-5, name="norm_final")(motion)
        x = AdaLayerNorm(hidden, name="norm_out", dtype=self.dtype)(x, emb)
        x = nn.Dense(p * p * self.out_channels, name="proj_out",
                     dtype=self.dtype)(x)
        out = unpatchify(x.reshape(n * f, mph * mpw, -1), hm, wm, p,
                         self.out_channels)
        return out.reshape(n, f, self.out_channels, hm, wm)


class A2MModelMlp(nn.Module):
    """Legacy grid-motion A2M head (reference ``A2MModel_Mlp``,
    ``model_A2M.py:212-385``): MLP audio encoder + the grid DiT above, RF
    velocity loss over (N,F,C,h,w) motion grids.

    The reference's ``sample`` is dead code (it calls the one-argument
    ``AudioFeatureMlp`` with two arguments, ``:353``); ``sample`` here
    implements the evident intent (encode audio, Euler-walk the grid).
    """

    cfg: A2MConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.audio_encoder = AudioFeatureMlp(outdim=c.encoder_out_dim,
                                             dtype=self.dtype)
        self.diffusion = Audio2MotionGridDiT(
            heads=c.diffusion_attn_num_heads,
            head_dim=c.diffusion_attn_head_dim,
            motion_in_channels=c.motion_in_channel,
            refimg_in_channels=c.image_inchannel,
            extra_in_channels=c.encoder_out_dim,
            out_channels=c.motion_in_channel,
            num_layers=c.diffusion_num_layers,
            image_height=c.image_height, image_width=c.image_width,
            image_patch_size=c.image_patch_size,
            motion_height=c.motion_height, motion_width=c.motion_width,
            motion_patch_size=c.motion_patch_size,
            motion_frames=c.motion_frames,
            time_embed_dim=c.time_embed_dim, dtype=self.dtype)

    def __call__(self, motion_gt, ref_img, audio, pose=None, ref_pose=None,
                 time_step=None):
        """motion_gt (N,F,C,h,w), ref_img/ref_pose (N,C,H,W),
        audio (N,F,M,D). Needs the 'noise' rng."""
        c = self.cfg
        n = motion_gt.shape[0]
        if ref_pose is None:
            ref_pose = jnp.zeros_like(ref_img)
        audio_feature = self.audio_encoder(audio)

        kt, kz = jax.random.split(self.make_rng("noise"))
        if time_step is None:
            time_step = jax.random.randint(kt, (n,), 0, c.num_step + 1)
        noise = jax.random.normal(kz, motion_gt.shape, motion_gt.dtype)
        t = rf.timestep_to_time(time_step, c.num_step,
                                ndim=motion_gt.ndim)
        zt = t * motion_gt + (1.0 - t) * noise
        vel_gt = motion_gt - noise

        vel_pred = self.diffusion(zt, ref_img, ref_pose, audio_feature,
                                  time_step.astype(jnp.float32))
        d = (vel_pred.astype(jnp.float32) - vel_gt.astype(jnp.float32))
        diff_loss = jnp.mean(jnp.square(d))
        return {"loss": diff_loss, "diff_loss": diff_loss}

    def velocity(self, zt, ref_img, ref_pose, audio_feature, timestep):
        return self.diffusion(zt, ref_img, ref_pose, audio_feature, timestep)

    def encode_audio(self, audio):
        return self.audio_encoder(audio)


def sample_grid(model: A2MModelMlp, params, key, ref_img, audio,
                ref_pose=None, sample_step: int = 10):
    """Euler-sample a (N,F,C,h,w) motion grid from audio + reference image."""
    cfg: A2MConfig = model.cfg
    n = ref_img.shape[0]
    f = audio.shape[1]
    if ref_pose is None:
        ref_pose = jnp.zeros_like(ref_img)
    audio_feature = model.apply(params, audio, method="encode_audio")
    z0 = jax.random.normal(key, (n, f, cfg.motion_in_channel,
                                 cfg.motion_height, cfg.motion_width))
    step_seq = rf.sample_step_sequence(sample_step, cfg.num_step)

    def vel_fn(zt, tstep):
        return model.apply(params, zt, ref_img, ref_pose, audio_feature,
                           tstep, method="velocity")

    return rf.euler_sample(vel_fn, z0, step_seq)


def sample(model, params, key, ref_motion, frames: int,
           sample_step: int = 10, audio=None, ref_audio=None, pose=None,
           ref_pose=None, solver: str = "euler",
           quant_table=None) -> jax.Array:
    """Sample motion tokens (reference ``model_A2M.py:980-1034``);
    ``solver='heun'`` uses the 2nd-order integrator.

    ``quant_table`` (``ops/quant.py::quantize_params(params, scope=None)``)
    runs the Euler loop's large projections on the int8 MXU — serving
    only; the one-shot audio/pose conditioning stays in the compute dtype
    (it runs outside the wrapped loop)."""
    cfg: A2MConfig = model.cfg
    n, l, d = ref_motion.shape
    cond = model.apply(params, audio=audio, ref_audio=ref_audio, pose=pose,
                       ref_pose=ref_pose, method="conditions")
    z0 = jax.random.normal(key, (n, frames, l, d), ref_motion.dtype)
    step_seq = rf.sample_step_sequence(sample_step, cfg.num_step)

    def vel_fn(zt, tstep):
        return model.apply(params, zt, ref_motion, tstep, method="velocity",
                           **cond)

    from ..ops.quant import maybe_quantized

    integrate = rf.heun_sample if solver == "heun" else rf.euler_sample
    with maybe_quantized(quant_table):
        return integrate(vel_fn, z0, step_seq)


# Jitted entry point (module static, params traced; frame/step counts shape
# the trace). Used by the audio->video pipeline so each window reuses one
# compiled program instead of dispatching eagerly op-by-op.
sample_jit = jax.jit(sample, static_argnums=(0,),
                     static_argnames=("frames", "sample_step", "solver"))
