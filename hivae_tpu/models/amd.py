"""AMD top-level models: frequency-decoupled motion autoencoding with a
rectified-flow DiT decoder.

Capability parity with the reference's model family (reference:
``model/model_AMD.py``):

  * ``AMDModel``     — dual object/camera encoders + default/dual/spatial DiT
    (reference ``AMDModel:32-892``).
  * ``AMDModelNew``  — the current main variant: camera =
    temporal-cross encoder on low-pass (grayscale) video, object = spatial
    encoder on RGB, DiT = TempMotion or ImgSpatialTempMotion (reference
    ``AMDModel_New:1663-2838``).

TPU-first design: the modules expose pure methods (``__call__`` for the
training forward, ``encode`` for motion extraction, ``velocity`` for a single
DiT evaluation); Euler sampling is a ``lax.scan`` over the step sequence in
``sample()`` / ``decode()`` below, so the entire ODE loop compiles to one XLA
program with donated carry buffers.

Semantics preserved exactly:
  * integer timesteps sampled ``randint(0, num_steps+1)`` per sample; for
    non-'default' DiTs, per *clip* and repeated over frames
    (reference ``:1960-1964``);
  * the forward's band cutoffs are (0.6 low, 0.5 high); sample/encode use
    (0.6, 0.6) (reference ``:1882-1886`` vs ``:2042-2046``);
  * per-step mask-ratio jitter (camera ``(0.6+0.4u)·r``, object ``0.5u·r``,
    reference ``:1857-1862``) happens *inside* the training forward as traced
    scalars: tokens are shuffled at full static length and the jittered
    complement is hidden via attention key-masks — numerically identical to
    the reference's gather, with no shape-driven retraces.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import frequency
from ..ops import quant
from ..ops import rectified_flow as rf
from ..ops.regularizers import diagonal_gaussian_regularize
from .dit import (VelocityDiT, VelocityDiTDualStream, VelocityDiTImgSpatial,
                  VelocityDiTImgSpatialTempMotion, VelocityDiTTempMotion)
from .motion_encoders import (MotionEncoderSpatial,
                              MotionEncoderSpatialTemporal,
                              MotionEncoderTemporalCross,
                              MotionSequenceTransformer)

Dtype = Any


def l2(pre: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(pre.astype(jnp.float32) -
                               gt.astype(jnp.float32)))


def l1(pre: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pre.astype(jnp.float32) - gt.astype(jnp.float32)))


@dataclasses.dataclass(frozen=True)
class AMDConfig:
    """Typed mirror of the reference's ``@register_to_config`` kwargs, so the
    reference's ``config.json`` files reload unchanged (``utils/config_io``)."""

    image_inchannel: int = 4
    image_height: int = 32
    image_width: int = 32
    video_frames: int = 16
    scheduler_num_step: int = 1000
    use_filter: bool = False
    filter_num: float = 0.4
    high_filter_num: float = 0.6
    use_grey: bool = False
    use_camera_down: bool = False
    use_regularizers: bool = False
    use_motiontemporal: bool = True
    klloss_weight: float = 0.005
    use_mask: bool = False
    motion_type: str = "plus"
    use_camera: bool = True
    use_object: bool = True
    # object motion encoder
    object_motion_token_num: int = 12
    object_motion_token_channel: int = 128
    object_enc_num_layers: int = 8
    enc_nhead: int = 8
    enc_ndim: int = 64
    motion_need_norm_out: bool = False
    # camera motion encoder
    camera_motion_token_num: int = 12
    camera_motion_token_channel: int = 128
    camera_enc_num_layers: int = 8
    # motion transformer
    motion_token_num: int = 12
    motion_token_channel: int = 128
    need_motion_transformer: bool = False
    motion_transformer_attn_head_dim: int = 64
    motion_transformer_attn_num_heads: int = 16
    motion_transformer_num_layers: int = 4
    # diffusion transformer
    diffusion_model_type: str = "default"
    diffusion_attn_head_dim: int = 64
    diffusion_attn_num_heads: int = 16
    diffusion_out_channels: int = 4
    diffusion_num_layers: int = 16
    image_patch_size: int = 2
    motion_patch_size: int = 1
    extract_motion_with_motion_transformer: bool = False
    # TPU-side option: activation-checkpoint the DiT blocks (the reference's
    # gradient_checkpointing switch)
    remat: bool = False
    # 'full' | 'dots': what the checkpointed blocks may keep. 'dots' saves
    # matmul outputs (jax.checkpoint_policies.dots_with_no_batch_dims_
    # saveable) and recomputes only the elementwise tail — higher MFU when
    # HBM has headroom
    remat_policy: str = "full"
    # stack DiT layers with nn.scan (faster compiles; stacked param layout)
    scan_layers: bool = False
    # attention implementation: 'auto' | 'xla' | 'pallas' | 'ring'. 'auto'
    # picks per-op by the measured in-program crossover (XLA <=256 tokens
    # w/ head-packing at tiny S, Pallas fused kernel above — see
    # ops/attention.py). 'ring' shards every attention's sequence dim over the
    # mesh 'tensor' axis (parallel/ring_attention.py; SURVEY §5.7) so long
    # windows scale past one chip's HBM; non-divisible sequences fall back
    # to XLA per-op
    attn_impl: str = "auto"

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "AMDConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def replace(self, **kw) -> "AMDConfig":
        return dataclasses.replace(self, **kw)


def _band_split(x_nthw: jax.Array, d_low: float, d_high: float):
    """(N,T,C,H,W) -> (low(d_low), high(d_high)) band videos, NCTHW fft."""
    x = x_nthw.transpose(0, 2, 1, 3, 4)  # n c t h w
    low, _ = frequency.freq_3d_split(x, d_low, d_low)
    _, high = frequency.freq_3d_split(x, d_high, d_high)
    return low.transpose(0, 2, 1, 3, 4), high.transpose(0, 2, 1, 3, 4)


class CameraDown(nn.Module):
    """Strided conv + maxpool camera downsampler (reference
    ``model_AMD.py:195-200``): 32x32 -> 8x8."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, C, H, W)
        x = x.transpose(0, 2, 3, 1)
        x = nn.Conv(16, (3, 3), strides=2, padding=1, name="conv1",
                    dtype=self.dtype)(x)
        x = nn.Conv(4, (3, 3), strides=1, padding=1, name="conv2",
                    dtype=self.dtype)(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x.transpose(0, 3, 1, 2)


class AMDModelNew(nn.Module):
    """Decoupled-motion video model (reference ``AMDModel_New``)."""

    cfg: AMDConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        if c.use_camera:
            cam_h = c.image_height // 4 if c.use_camera_down else c.image_height
            cam_w = c.image_width // 4 if c.use_camera_down else c.image_width
            self.camera_motion_encoder = MotionEncoderTemporalCross(
                img_height=cam_h, img_width=cam_w,
                img_inchannel=c.image_inchannel,
                img_patch_size=c.image_patch_size,
                motion_token_num=c.camera_motion_token_num,
                motion_channel=c.camera_motion_token_channel,
                need_norm_out=c.motion_need_norm_out,
                video_frames=c.video_frames,
                heads=c.enc_nhead, head_dim=c.enc_ndim,
                num_layers=c.camera_enc_num_layers, dtype=self.dtype)
        if c.use_object:
            self.object_motion_encoder = MotionEncoderSpatial(
                img_height=c.image_height, img_width=c.image_width,
                img_inchannel=c.image_inchannel,
                img_patch_size=c.image_patch_size,
                motion_token_num=c.object_motion_token_num,
                motion_channel=c.object_motion_token_channel,
                need_norm_out=c.motion_need_norm_out,
                heads=c.enc_nhead, head_dim=c.enc_ndim,
                num_layers=c.object_enc_num_layers, dtype=self.dtype)
        if c.use_camera_down:
            self.camera_down = CameraDown(dtype=self.dtype)
        if c.need_motion_transformer:
            self.motion_transformer = MotionSequenceTransformer(
                motion_token_num=c.motion_token_num,
                motion_token_channel=c.motion_token_channel,
                heads=c.motion_transformer_attn_num_heads,
                head_dim=c.motion_transformer_attn_head_dim,
                num_layers=c.motion_transformer_num_layers, dtype=self.dtype)

        dit_kw = dict(heads=c.diffusion_attn_num_heads,
                      head_dim=c.diffusion_attn_head_dim,
                      out_channels=c.diffusion_out_channels,
                      num_layers=c.diffusion_num_layers,
                      image_height=c.image_height, image_width=c.image_width,
                      image_patch_size=c.image_patch_size,
                      image_in_channels=c.image_inchannel * 2,
                      motion_token_num=c.motion_token_num,
                      motion_target_num_frame=c.video_frames,
                      remat=c.remat, remat_policy=c.remat_policy,
                      dtype=self.dtype)
        if c.diffusion_model_type == "default":
            self.diffusion_transformer = VelocityDiTTempMotion(
                object_motion_in_channels=c.object_motion_token_channel,
                scan_layers=c.scan_layers, **dit_kw)
        elif c.diffusion_model_type == "spatial":
            self.diffusion_transformer = VelocityDiTImgSpatialTempMotion(
                use_camera=c.use_camera, use_object=c.use_object,
                camera_motion_in_channels=c.camera_motion_token_channel,
                object_motion_in_channels=c.object_motion_token_channel,
                scan_layers=c.scan_layers, **dit_kw)
        else:
            raise ValueError(c.diffusion_model_type)

    # ----- motion extraction -------------------------------------------------

    def encode(self, video, ref_img, video_grey=None, ref_img_grey=None,
               camera_mask_ratio=None, object_mask_ratio=None,
               low_cut: float = 0.6, high_cut: float = 0.6,
               camera_mask=None):
        """-> (camera_target, object_source, object_target) as in the
        reference ``encode`` (``model_AMD.py:2379-2462``).

        ``camera_mask`` (N, 2T, C, H, W) optical-flow camera mask: when the
        config has ``use_mask``, the low-frequency band is multiplied by it
        before the camera encoder — the camera-only variant's trained-path
        behavior (reference ``AMDModel_Camera.forward:1137`` and
        ``.sample:1261``)."""
        c = self.cfg
        n, t = video.shape[:2]
        refimg_and_video = jnp.concatenate([ref_img, video], axis=1)

        camera_target = object_source = object_target = None
        if c.use_filter:
            grey = (jnp.concatenate([ref_img_grey, video_grey], axis=1)
                    if c.use_grey else refimg_and_video)
            lf, _ = _band_split(grey, low_cut, high_cut)
            if c.use_mask and camera_mask is not None:
                lf = lf * camera_mask
            lf_video = lf[:, t:]
        else:
            if c.use_mask:
                raise ValueError(
                    "cfg.use_mask=True requires cfg.use_filter=True: the "
                    "camera_mask multiplies the LOW-FREQUENCY band "
                    "(reference model_AMD.py:314), which only exists under "
                    "the FFT split — without it the mask would be "
                    "silently dropped")
            lf_video = video_grey if c.use_grey else video

        camera_site_mask = None
        if c.use_camera:
            if c.use_camera_down:
                b = lf_video.reshape((n * t,) + lf_video.shape[2:])
                b = self.camera_down(b)
                lf_video = b.reshape((n, t) + b.shape[1:])
            camera_target = self.camera_motion_encoder(lf_video,
                                                       camera_mask_ratio)
            if isinstance(camera_target, tuple):  # traced jitter: site mask
                camera_target, camera_site_mask = camera_target
            # camera-only variant: the reference's AMDModel_Camera transforms
            # the (n,t,l,d) target motion before the DiT (model_AMD.py:1176);
            # the dual-stream AMDModel_New never applies it in forward
            if (c.need_motion_transformer and not c.use_object and
                    not c.extract_motion_with_motion_transformer):
                camera_target = self.motion_transformer(camera_target)
        if c.use_object:
            object_motion = self.object_motion_encoder(refimg_and_video,
                                                       object_mask_ratio)
            object_source = object_motion[:, :t].reshape(
                (n * t,) + object_motion.shape[2:])
            object_target = object_motion[:, t:].reshape(
                (n * t,) + object_motion.shape[2:])
        if camera_site_mask is not None:
            return (camera_target, object_source, object_target,
                    camera_site_mask)
        return camera_target, object_source, object_target

    def extract_motion(self, video, mask_ratio=None):
        """Object-motion tokens for downstream (A2M) heads: (N,T,L,D).

        ``mask_ratio`` (static float) randomly drops encoder tokens — the
        GT-motion ablation knob (reference ``AMDTestPipeLine.__init__``
        ``pipeline.py:266-287``; its own forward is uncallable against the
        current models — ``extract_motion`` takes no ratio at
        ``model_AMD.py:841/2787`` — so this implements the declared
        intent)."""
        motion = self.object_motion_encoder(video, mask_ratio)
        if (self.cfg.need_motion_transformer and
                self.cfg.extract_motion_with_motion_transformer):
            motion = self.motion_transformer(motion)
        return motion

    # ----- DiT velocity -------------------------------------------------------

    def velocity(self, image_hidden_states, timestep, camera_target=None,
                 object_source=None, object_target=None,
                 camera_site_mask=None):
        c = self.cfg
        if c.diffusion_model_type == "default":
            # TempMotion DiT has no camera stream (reference transformer.py:1631)
            return self.diffusion_transformer(
                image_hidden_states, timestep,
                object_motion_source=object_source,
                object_motion_target=object_target)
        if c.use_object and not c.use_camera:
            return self.diffusion_transformer(
                image_hidden_states, timestep,
                object_motion_source=object_source,
                object_motion_target=object_target)
        if c.use_camera and not c.use_object:
            return self.diffusion_transformer(
                image_hidden_states, timestep,
                camera_motion_target=camera_target,
                camera_site_mask=camera_site_mask)
        return self.diffusion_transformer(
            image_hidden_states, timestep,
            camera_motion_target=camera_target,
            object_motion_source=object_source,
            object_motion_target=object_target,
            camera_site_mask=camera_site_mask)

    # ----- training forward ---------------------------------------------------

    def __call__(self, video, ref_img, video_grey=None, ref_img_grey=None,
                 time_step=None, camera_mask_ratio=None,
                 object_mask_ratio=None, return_meta_info=False,
                 camera_mask=None):
        """Training step core (reference ``AMDModel_New.forward:1844-2017``;
        with ``use_mask`` + ``camera_mask``, the camera-variant forward
        ``AMDModel_Camera.forward:1086-1223``).

        Needs rngs: 'noise' (timesteps + flow noise), 'mask' if masking.
        Returns (pre, vel, loss_dict).
        """
        c = self.cfg
        n, t = video.shape[:2]
        if c.use_mask and camera_mask is None:
            raise ValueError(
                "cfg.use_mask=True: the training forward requires the "
                "dataset's optical-flow camera_mask (reference "
                "model_AMD.py:1137 multiplies the LF band by it)")
        if c.need_motion_transformer and c.use_object and self.is_initializing():
            # the dual-stream New model's forward never runs the motion
            # transformer (it serves extract_motion / refimg-motion
            # sampling), so materialize its params at init time
            self.motion_transformer(jnp.zeros(
                (1, c.video_frames, c.object_motion_token_num,
                 c.object_motion_token_channel)))
        # per-step mask-ratio jitter (reference :1857-1862): traced scalars
        # so the kept count varies per step at a static sequence shape
        if camera_mask_ratio is not None:
            u = jax.random.uniform(self.make_rng("mask"))
            camera_mask_ratio = (0.6 + 0.4 * u) * camera_mask_ratio
        if object_mask_ratio is not None:
            u = jax.random.uniform(self.make_rng("mask"))
            object_mask_ratio = (0.5 * u) * object_mask_ratio
        encoded = self.encode(
            video, ref_img, video_grey, ref_img_grey,
            camera_mask_ratio, object_mask_ratio, low_cut=0.6, high_cut=0.5,
            camera_mask=camera_mask)
        camera_site_mask = None
        if len(encoded) == 4:
            camera_target, object_source, object_target, camera_site_mask = \
                encoded
        else:
            camera_target, object_source, object_target = encoded

        zi = ref_img.reshape((n * t,) + ref_img.shape[2:])
        zj = video.reshape((n * t,) + video.shape[2:])

        key = self.make_rng("noise")
        kt, kz = jax.random.split(key)
        if time_step is None:
            if c.diffusion_model_type != "default":
                time_step = jax.random.randint(kt, (n,), 0, c.scheduler_num_step + 1)
                time_step = jnp.repeat(time_step, t)
            else:
                time_step = jax.random.randint(kt, (n * t,), 0,
                                               c.scheduler_num_step + 1)
        z0 = jax.random.normal(kz, zj.shape, zj.dtype)
        zt, vel = rf.get_train_tuple(zj, time_step, z0,
                                     num_steps=c.scheduler_num_step)

        image_hidden = jnp.concatenate([zi, zt], axis=1)
        pre = self.velocity(image_hidden, time_step.astype(jnp.float32),
                            camera_target, object_source, object_target,
                            camera_site_mask=camera_site_mask)

        diff_loss = l2(pre, vel)
        rec_zj = rf.get_target_with_zt_vel(zt, pre, time_step,
                                           num_steps=c.scheduler_num_step)
        rec_loss = l2(rec_zj, zj)
        loss_dict = {"loss": diff_loss, "diff_loss": diff_loss,
                     "rec_loss": rec_loss}
        if return_meta_info:  # reference forward's meta dict (:2009-2015)
            loss_dict = dict(loss_dict, zi=zi, zj=zj, zt=zt, pre=pre,
                             rec_zj=rec_zj, time_step=time_step)
        return pre, vel, loss_dict


class AMDModel(nn.Module):
    """Original dual-encoder AMD model (reference ``AMDModel:32-892``)."""

    cfg: AMDConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        enc_kw = dict(img_inchannel=c.image_inchannel,
                      img_patch_size=c.image_patch_size,
                      need_norm_out=c.motion_need_norm_out,
                      heads=c.enc_nhead, head_dim=c.enc_ndim,
                      dtype=self.dtype)
        if c.use_motiontemporal:
            self.object_motion_encoder = MotionEncoderSpatialTemporal(
                img_height=c.image_height, img_width=c.image_width,
                motion_token_num=c.object_motion_token_num,
                motion_channel=c.object_motion_token_channel,
                video_frames=c.video_frames,
                num_layers=c.object_enc_num_layers, **enc_kw)
            self.camera_motion_encoder = MotionEncoderSpatialTemporal(
                img_height=c.image_height, img_width=c.image_width,
                motion_token_num=c.camera_motion_token_num,
                motion_channel=c.camera_motion_token_channel,
                video_frames=c.video_frames,
                num_layers=c.camera_enc_num_layers, **enc_kw)
        else:
            self.object_motion_encoder = MotionEncoderSpatial(
                img_height=c.image_height, img_width=c.image_width,
                motion_token_num=c.object_motion_token_num,
                motion_channel=c.object_motion_token_channel,
                num_layers=c.object_enc_num_layers, **enc_kw)
            self.camera_motion_encoder = MotionEncoderSpatial(
                img_height=c.image_height // 4, img_width=c.image_width // 4,
                motion_token_num=c.camera_motion_token_num,
                motion_channel=c.camera_motion_token_channel,
                num_layers=c.camera_enc_num_layers, **enc_kw)
        if c.use_camera_down:
            self.camera_down = CameraDown(dtype=self.dtype)

        if c.use_regularizers:
            self.camera_target_motion_map = nn.Dense(
                c.motion_token_channel, name="camera_target_motion_map",
                dtype=self.dtype)
            self.camera_source_motion_map = nn.Dense(
                c.motion_token_channel, name="camera_source_motion_map",
                dtype=self.dtype)
            self.object_target_motion_map = nn.Dense(
                c.motion_token_channel, name="object_target_motion_map",
                dtype=self.dtype)
            self.object_source_motion_map = nn.Dense(
                c.motion_token_channel, name="object_source_motion_map",
                dtype=self.dtype)
        else:
            if c.camera_motion_token_channel != c.motion_token_channel:
                self.camera_motion_map = nn.Dense(
                    c.motion_token_channel, name="camera_motion_map",
                    dtype=self.dtype)
            if c.object_motion_token_channel != c.motion_token_channel:
                self.object_motion_map = nn.Dense(
                    c.motion_token_channel, name="object_motion_map",
                    dtype=self.dtype)

        if c.need_motion_transformer:
            self.motion_transformer = MotionSequenceTransformer(
                motion_token_num=c.motion_token_num,
                motion_token_channel=c.motion_token_channel,
                heads=c.motion_transformer_attn_num_heads,
                head_dim=c.motion_transformer_attn_head_dim,
                num_layers=c.motion_transformer_num_layers, dtype=self.dtype)

        dit_kw = dict(heads=c.diffusion_attn_num_heads,
                      head_dim=c.diffusion_attn_head_dim,
                      out_channels=c.diffusion_out_channels,
                      num_layers=c.diffusion_num_layers,
                      image_height=c.image_height, image_width=c.image_width,
                      image_patch_size=c.image_patch_size,
                      image_in_channels=c.image_inchannel * 2,
                      motion_token_num=c.motion_token_num,
                      motion_in_channels=c.motion_token_channel,
                      remat=c.remat, remat_policy=c.remat_policy,
                      dtype=self.dtype)
        if c.diffusion_model_type == "default":
            self.diffusion_transformer = VelocityDiT(
                motion_type=c.motion_type, **dit_kw)
        elif c.diffusion_model_type == "dual":
            self.diffusion_transformer = VelocityDiTDualStream(
                motion_target_num_frame=c.video_frames, **dit_kw)
        elif c.diffusion_model_type == "spatial":
            self.diffusion_transformer = VelocityDiTImgSpatial(
                motion_type=c.motion_type,
                motion_target_num_frame=c.video_frames, **dit_kw)
        else:
            raise ValueError(c.diffusion_model_type)

    def encode(self, video, ref_img, video_grey=None, ref_img_grey=None,
               mask_ratio=None, camera_mask=None):
        """-> dict with camera/object source/target motions (+ kl_loss).

        ``camera_mask`` (N, 2T, C, H, W): with ``use_mask``, multiplies the
        low-frequency band before the camera encoder (reference
        ``AMDModel.forward:314``)."""
        c = self.cfg
        n, t = video.shape[:2]
        refimg_and_video = jnp.concatenate([ref_img, video], axis=1)

        if c.use_filter:
            src = (jnp.concatenate([ref_img_grey, video_grey], axis=1)
                   if c.use_grey else refimg_and_video)
            lf, _ = _band_split(src, c.filter_num, c.filter_num)
            _, hf = _band_split(src, c.high_filter_num, c.high_filter_num)
            if c.use_mask and camera_mask is not None:
                lf = lf * camera_mask
            if c.use_camera_down:
                b = lf.reshape((n * 2 * t,) + lf.shape[2:])
                b = self.camera_down(b)
                lf = b.reshape((n, 2 * t) + b.shape[1:])
            object_motion = self.object_motion_encoder(hf, mask_ratio)
            camera_motion = self.camera_motion_encoder(lf, mask_ratio)
        else:
            cam_in = refimg_and_video
            if c.use_camera_down:
                b = cam_in.reshape((n * 2 * t,) + cam_in.shape[2:])
                b = self.camera_down(b)
                cam_in = b.reshape((n, 2 * t) + b.shape[1:])
            object_motion = self.object_motion_encoder(refimg_and_video,
                                                       mask_ratio)
            camera_motion = self.camera_motion_encoder(cam_in, mask_ratio)

        return self._split_project(object_motion, camera_motion, n, t)

    def _split_project(self, object_motion, camera_motion, n, t):
        """Split encoder outputs into source/target halves and project to the
        shared motion channel (tail of reference ``AMDModel.forward``).

        When ``need_motion_transformer``, the target streams run through the
        sequence-level motion transformer. The reference's own branch here is
        dead code (``model_AMD.py:371-374`` references ``target_motion``
        whose defining sum at ``:367-368`` is commented out -> NameError);
        the working single-stream analogue ``AMDModel_Camera`` (``:1176``)
        shows the intent — transform the (n,t,l,d) target motion before the
        DiT — which we apply to each target stream.
        """
        c = self.cfg

        def flat(m):
            return m.reshape((n * t,) + m.shape[2:])

        object_source, object_target = flat(object_motion[:, :t]), flat(object_motion[:, t:])
        camera_source, camera_target = flat(camera_motion[:, :t]), flat(camera_motion[:, t:])

        kl_loss = None
        if c.use_regularizers:
            ko, kc = jax.random.split(self.make_rng("noise_kl"))
            object_target, kl_o = diagonal_gaussian_regularize(
                object_target.transpose(0, 2, 1), ko)
            camera_target, kl_c = diagonal_gaussian_regularize(
                camera_target.transpose(0, 2, 1), kc)
            object_target = object_target.transpose(0, 2, 1)
            camera_target = camera_target.transpose(0, 2, 1)
            kl_loss = (kl_o + kl_c) / 2
            camera_source = self.camera_source_motion_map(camera_source)
            camera_target = self.camera_target_motion_map(camera_target)
            object_source = self.object_source_motion_map(object_source)
            object_target = self.object_target_motion_map(object_target)
        else:
            if c.camera_motion_token_channel != c.motion_token_channel:
                camera_source = self.camera_motion_map(camera_source)
                camera_target = self.camera_motion_map(camera_target)
            if c.object_motion_token_channel != c.motion_token_channel:
                object_source = self.object_motion_map(object_source)
                object_target = self.object_motion_map(object_target)

        if c.need_motion_transformer:
            def transform(m):
                m = m.reshape(n, t, *m.shape[1:])
                return self.motion_transformer(m).reshape(n * t, *m.shape[2:])

            camera_target = transform(camera_target)
            object_target = transform(object_target)

        return dict(camera_source=camera_source, camera_target=camera_target,
                    object_source=object_source, object_target=object_target,
                    kl_loss=kl_loss)

    def encode_diff_motion(self, video, ref_img, video_grey, ref_img_grey,
                           camera_video_grey, mask_ratio=None):
        """Motion encoding with the camera band taken from a *different*
        clip (reference ``AMDModel.sample_diff_motion:598-662``): HF/object
        from the subject's grey stream, LF/camera from ``camera_video_grey``,
        both at the fixed 0.4 cutoff the reference hardcodes here."""
        c = self.cfg
        n, t = video.shape[:2]
        hf_src = (jnp.concatenate([ref_img_grey, video_grey], axis=1)
                  if c.use_grey else jnp.concatenate([ref_img, video], axis=1))
        lf_src = jnp.concatenate([ref_img, camera_video_grey], axis=1)
        _, hf = _band_split(hf_src, 0.4, 0.4)
        lf, _ = _band_split(lf_src, 0.4, 0.4)
        if c.use_camera_down:
            b = lf.reshape((n * 2 * t,) + lf.shape[2:])
            b = self.camera_down(b)
            lf = b.reshape((n, 2 * t) + b.shape[1:])
        object_motion = self.object_motion_encoder(hf, mask_ratio)
        camera_motion = self.camera_motion_encoder(lf, mask_ratio)
        return self._split_project(object_motion, camera_motion, n, t)

    def extract_motion(self, video, mask_ratio=None):
        motion = self.object_motion_encoder(video, mask_ratio)
        if (self.cfg.need_motion_transformer and
                self.cfg.extract_motion_with_motion_transformer):
            motion = self.motion_transformer(motion)
        return motion

    def velocity(self, image_hidden_states, timestep, camera_source=None,
                 camera_target=None, object_source=None, object_target=None,
                 **_):
        if self.cfg.diffusion_model_type == "dual":
            return self.diffusion_transformer(
                _sum_streams(camera_source, object_source),
                _sum_streams(camera_target, object_target),
                image_hidden_states, timestep)
        return self.diffusion_transformer(
            camera_target, image_hidden_states, timestep,
            camera_motion_source=camera_source,
            object_motion_source=object_source,
            object_motion_target=object_target)

    def __call__(self, video, ref_img, video_grey=None, ref_img_grey=None,
                 time_step=None, mask_ratio=None, return_meta_info=False,
                 camera_mask=None):
        c = self.cfg
        n, t = video.shape[:2]
        if c.use_mask and camera_mask is None:
            raise ValueError(
                "cfg.use_mask=True: the training forward requires the "
                "dataset's optical-flow camera_mask (reference "
                "model_AMD.py:314 multiplies the LF band by it)")
        motions = self.encode(video, ref_img, video_grey, ref_img_grey,
                              mask_ratio, camera_mask=camera_mask)

        zi = ref_img.reshape((n * t,) + ref_img.shape[2:])
        zj = video.reshape((n * t,) + video.shape[2:])

        kt, kz = jax.random.split(self.make_rng("noise"))
        if time_step is None:
            if c.diffusion_model_type != "default":
                time_step = jax.random.randint(kt, (n,), 0,
                                               c.scheduler_num_step + 1)
                time_step = jnp.repeat(time_step, t)
            else:
                time_step = jax.random.randint(kt, (n * t,), 0,
                                               c.scheduler_num_step + 1)
        z0 = jax.random.normal(kz, zj.shape, zj.dtype)
        zt, vel = rf.get_train_tuple(zj, time_step, z0,
                                     num_steps=c.scheduler_num_step)

        image_hidden = jnp.concatenate([zi, zt], axis=1)
        pre = self.velocity(image_hidden, time_step.astype(jnp.float32),
                            **{k: v for k, v in motions.items()
                               if k != "kl_loss"})

        diff_loss = l2(pre, vel)
        rec_zj = rf.get_target_with_zt_vel(zt, pre, time_step,
                                           num_steps=c.scheduler_num_step)
        rec_loss = l2(rec_zj, zj)
        if c.use_regularizers:
            klloss = c.klloss_weight * motions["kl_loss"]
            loss_dict = {"loss": diff_loss + klloss, "diff_loss": diff_loss,
                         "rec_loss": rec_loss, "KLloss": klloss}
        else:
            loss_dict = {"loss": diff_loss, "diff_loss": diff_loss,
                         "rec_loss": rec_loss}
        if return_meta_info:
            loss_dict = dict(loss_dict, zi=zi, zj=zj, zt=zt, pre=pre,
                             rec_zj=rec_zj, time_step=time_step)
        return pre, vel, loss_dict


class AMDModelRec(nn.Module):
    """Non-diffusion reconstruction model (reference
    ``AMDModel_Rec:2840-3124``): dual spatial motion encoders, a learnable
    ``zt_token`` standing in for the noised target, and a timestep-free
    reconstruction transformer regressing zj directly."""

    cfg: AMDConfig
    is_split: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        from .dit import ReconstructionDiT, ReconstructionDiTSplit

        c = self.cfg
        enc_kw = dict(img_height=c.image_height, img_width=c.image_width,
                      img_inchannel=c.image_inchannel,
                      img_patch_size=c.image_patch_size,
                      motion_token_num=c.motion_token_num,
                      motion_channel=c.motion_token_channel,
                      need_norm_out=True, heads=c.enc_nhead,
                      head_dim=c.enc_ndim,
                      num_layers=c.object_enc_num_layers, dtype=self.dtype)
        self.object_motion_encoder = MotionEncoderSpatial(**enc_kw)
        self.camera_motion_encoder = MotionEncoderSpatial(**enc_kw)
        self.zt_token = self.param(
            "zt_token", lambda k: 0.02 * jax.random.normal(
                k, (1, c.image_inchannel, c.image_height, c.image_width)))
        dit_cls = ReconstructionDiTSplit if self.is_split else ReconstructionDiT
        self.transformer = dit_cls(
            heads=c.diffusion_attn_num_heads,
            head_dim=c.diffusion_attn_head_dim,
            out_channels=c.diffusion_out_channels,
            num_layers=c.diffusion_num_layers,
            image_height=c.image_height, image_width=c.image_width,
            image_patch_size=c.image_patch_size,
            image_in_channels=c.image_inchannel * 2,
            motion_token_num=c.motion_token_num,
            motion_in_channels=c.motion_token_channel, dtype=self.dtype)

    def __call__(self, video, ref_img):
        c = self.cfg
        n, t = video.shape[:2]
        refimg_and_video = jnp.concatenate([ref_img, video], axis=1)

        def flat(m):
            return m.reshape((n * t,) + m.shape[2:])

        obj = self.object_motion_encoder(refimg_and_video)
        cam = self.camera_motion_encoder(refimg_and_video)
        source_motion = flat(obj[:, :t]) + flat(cam[:, :t])
        target_motion = flat(obj[:, t:]) + flat(cam[:, t:])

        zi = ref_img.reshape((n * t,) + ref_img.shape[2:])
        zj = video.reshape((n * t,) + video.shape[2:])
        zt = jnp.broadcast_to(self.zt_token.astype(zj.dtype), zj.shape)

        image_hidden = jnp.concatenate([zi, zt], axis=1)
        pre = self.transformer(source_motion, target_motion, image_hidden)
        rec_loss = l2(pre, zj)
        return pre, {"loss": rec_loss, "rec_loss": rec_loss}


# -----------------------------------------------------------------------------
# Pure sampling drivers (lax.scan Euler loops over bound params)
# -----------------------------------------------------------------------------


def sample(model: nn.Module, params, key: jax.Array, video, ref_img,
           video_grey=None, ref_img_grey=None, sample_step: int = 50,
           start_step: Optional[int] = None, camera_mask_ratio=None,
           object_mask_ratio=None, camera_mask=None,
           solver: str = "euler",
           quant_table=None) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Video reconstruction: extract motion from ``video`` then Euler-decode
    from noise (reference ``AMDModel_New.sample:2020-2195``).

    ``camera_mask`` is consumed only by the camera-variant model
    (``AMDModelNew`` with ``use_mask``) — reference
    ``AMDModel_Camera.sample:1261``; the dual ``AMDModel.sample`` accepts it
    but its LF multiply is commented out in the reference (``:469``), so it
    is ignored there for parity.

    Returns (zi, sample, zj) each (N, T, C, H, W).
    """
    cfg: AMDConfig = model.cfg
    n, t = video.shape[:2]
    num_steps = cfg.scheduler_num_step
    start = num_steps if start_step is None else start_step

    kenc, knoise = jax.random.split(key)
    enc_kw = {}
    if isinstance(model, AMDModelNew):
        camera_target, object_source, object_target = model.apply(
            params, video, ref_img, video_grey, ref_img_grey,
            camera_mask_ratio, object_mask_ratio,
            camera_mask=camera_mask,
            method="encode", rngs={"mask": kenc})
        motions = dict(camera_target=camera_target,
                       object_source=object_source,
                       object_target=object_target)
    else:
        motions = model.apply(params, video, ref_img, video_grey,
                              ref_img_grey, camera_mask_ratio,
                              method="encode",
                              rngs={"mask": kenc, "noise_kl": kenc})
        motions.pop("kl_loss", None)

    zi = ref_img.reshape((n * t,) + ref_img.shape[2:])
    zj = video.reshape((n * t,) + video.shape[2:])
    z0 = jax.random.normal(knoise, zj.shape, zj.dtype)
    zt = _euler_decode(model, params, zi, z0, motions, sample_step, start,
                       z1=zj, solver=solver, quant_table=quant_table)

    unflat = lambda x: x.reshape((n, t) + x.shape[1:])
    return unflat(zi), unflat(zt), unflat(zj)


def decode(model: nn.Module, params, key: jax.Array, ref_img,
           motions: Dict[str, jax.Array], frames: int,
           sample_step: int = 50, start_step: Optional[int] = None,
           video=None, solver: str = "euler", quant_table=None):
    """Decode video latents from a reference frame + motion tokens
    (reference ``AMDModel_New.decode:2464-2536``). ref_img: (N,T,C,H,W).

    ``video`` (the target latents) is only needed when ``start_step`` is
    below the scheduler range — the walk then starts from the partially
    noised target, as the reference's ``decode`` does with its ``video``
    argument (``:2468,2479``).

    ``frames``: a single reference frame (N,1,C,H,W) is tiled to this
    length so it pairs with (N,frames,...) motion tokens; a pre-tiled
    ref_img must already match ``frames``."""
    cfg: AMDConfig = model.cfg
    n, t = ref_img.shape[:2]
    if t == 1 and frames > 1:
        ref_img = jnp.broadcast_to(
            ref_img, (n, frames) + ref_img.shape[2:])
        t = frames
    if t != frames:
        raise ValueError(
            f"decode: ref_img carries {t} frames but frames={frames}; "
            "pass a single frame (tiled here) or a matching clip")
    start = cfg.scheduler_num_step if start_step is None else start_step
    zi = ref_img.reshape((n * t,) + ref_img.shape[2:])
    z1 = None if video is None else video.reshape((n * t,) + video.shape[2:])
    z0 = jax.random.normal(key, zi.shape, zi.dtype)
    zt = _euler_decode(model, params, zi, z0, motions, sample_step, start,
                       z1=z1, solver=solver, quant_table=quant_table)
    return zt.reshape((n, t) + zt.shape[1:])


def _sum_streams(a, b):
    """camera+object sum that tolerates a single stream — the
    refimg-motion path carries its tokens in ONE stream (reference
    ``sample_with_refimg_motion:819`` passes a single source/target pair
    to the DiT regardless of motion_type)."""
    if a is None:
        return b
    if b is None:
        return a
    return a + b


def sample_with_refimg_motion(model, params, key: jax.Array, ref_img,
                              motion, sample_step: int = 10,
                              solver: str = "euler", mask_ratio=None,
                              quant_table=None):
    """Image + motion tokens -> video latents (reference
    ``AMDModel.sample_with_refimg_motion:760-839``): source motion extracted
    from the single reference frame, provided tokens as target.

    ref_img: (N,C,H,W); motion: (N,F,L,D). Returns (zi, sample) as
    (N,F,C,H,W). ``mask_ratio`` masks the source-motion extraction (the
    GT-ablation knob, see ``extract_motion``).
    """
    cfg: AMDConfig = model.cfg
    n, t, l, d = motion.shape
    # split only when masking: keeps the z0 noise stream (and so the
    # sampled videos for a fixed seed) identical to the pre-mask_ratio code
    enc_rngs = {}
    if mask_ratio is not None:
        key, kmask = jax.random.split(key)
        enc_rngs = {"rngs": {"mask": kmask}}
    if isinstance(model, AMDModelNew) or not cfg.use_motiontemporal:
        enc_in = ref_img[:, None]           # per-frame spatial encoder
        take = slice(None)
    else:
        # the pair-temporal encoder needs cat(ref, target) with an even
        # frame axis; a (ref, ref) pair's target-half tokens are "the
        # motion of the reference frame" — a single frame is otherwise
        # unencodable by this variant
        enc_in = jnp.concatenate([ref_img[:, None], ref_img[:, None]],
                                 axis=1)
        take = slice(1, None)
    src = model.apply(params, enc_in, mask_ratio,
                      method="extract_motion", **enc_rngs)[:, take]
    source_motion = jnp.broadcast_to(src, (n, t, l, d)).reshape(n * t, l, d)
    # reference :783 (the one executable motion-transformer branch): the
    # provided target tokens run through the sequence transformer unless
    # extract_motion already applied it
    if (cfg.need_motion_transformer and
            not cfg.extract_motion_with_motion_transformer):
        motion = model.apply(
            params, motion, method=lambda m, x: m.motion_transformer(x))
    target_motion = motion.reshape(n * t, l, d)
    motions = dict(object_source=source_motion, object_target=target_motion)
    if not isinstance(model, AMDModelNew):
        motions = dict(camera_source=source_motion,
                       camera_target=target_motion,
                       object_source=None, object_target=None)

    zi = jnp.repeat(ref_img[:, None], t, axis=1).reshape(
        (n * t,) + ref_img.shape[1:])
    z0 = jax.random.normal(key, zi.shape, zi.dtype)
    zt = _euler_decode(model, params, zi, z0, motions, sample_step,
                       cfg.scheduler_num_step, solver=solver,
                       quant_table=quant_table)
    unflat = lambda x: x.reshape((n, t) + x.shape[1:])
    return unflat(zi), unflat(zt)


def sample_cross(model, params, key: jax.Array, video_1, video_2, ref_img,
                 video_grey_1=None, video_grey_2=None, ref_img_grey=None,
                 sample_step: int = 50, start_step: Optional[int] = None,
                 camera_mask_ratio=None, object_mask_ratio=None,
                 solver: str = "euler", quant_table=None):
    """Cross-video motion transfer (reference
    ``AMDModel_New.sample_cross:2198-2375``): camera motion from video_1,
    object motion + appearance from video_2.

    Mirrors the reference's cutoffs: LF of video_1 at 0.5, HF of
    ref+video_2 at 0.6; only the camera stream drives the DiT.
    """
    assert isinstance(model, AMDModelNew)
    cfg: AMDConfig = model.cfg
    n, t = video_1.shape[:2]
    start = cfg.scheduler_num_step if start_step is None else start_step

    kenc, knoise = jax.random.split(key)
    cam_src_video = video_grey_1 if cfg.use_grey else video_1
    lf_video, _ = _band_split(cam_src_video, 0.5, 0.5)
    if cfg.use_camera_down:
        b = lf_video.reshape((n * t,) + lf_video.shape[2:])
        b = model.apply(params, b,
                        method=lambda m, x: m.camera_down(x))
        lf_video = b.reshape((n, t) + b.shape[1:])
    camera_target = model.apply(
        params, lf_video, camera_mask_ratio,
        method=lambda m, x, r: m.camera_motion_encoder(x, r),
        rngs={"mask": kenc})

    motions = dict(camera_target=camera_target, object_source=None,
                   object_target=None)
    zi = ref_img.reshape((n * t,) + ref_img.shape[2:])
    zj = video_2.reshape((n * t,) + video_2.shape[2:])
    z0 = jax.random.normal(knoise, zj.shape, zj.dtype)
    zt = _euler_decode(model, params, zi, z0, motions, sample_step, start,
                       z1=zj, solver=solver, quant_table=quant_table)
    unflat = lambda x: x.reshape((n, t) + x.shape[1:])
    return unflat(zi), unflat(zt), unflat(zj)


def sample_diff_motion(model, params, key: jax.Array, video, ref_img,
                       video_grey=None, ref_img_grey=None,
                       camera_video_grey=None, sample_step: int = 50,
                       start_step: Optional[int] = None,
                       mask_ratio=None, solver: str = "euler",
                       quant_table=None):
    """Reconstruct ``video`` but drive the camera/LF stream with motion from
    a different clip (reference ``AMDModel.sample_diff_motion:598-757``).

    Returns (zi, sample, zj) each (N, T, C, H, W).
    """
    cfg: AMDConfig = model.cfg
    n, t = video.shape[:2]
    start = cfg.scheduler_num_step if start_step is None else start_step

    kenc, knoise = jax.random.split(key)
    motions = model.apply(params, video, ref_img, video_grey, ref_img_grey,
                          camera_video_grey, mask_ratio,
                          method="encode_diff_motion",
                          rngs={"mask": kenc, "noise_kl": kenc})
    motions.pop("kl_loss", None)

    zi = ref_img.reshape((n * t,) + ref_img.shape[2:])
    zj = video.reshape((n * t,) + video.shape[2:])
    z0 = jax.random.normal(knoise, zj.shape, zj.dtype)
    zt = _euler_decode(model, params, zi, z0, motions, sample_step, start,
                       z1=zj, solver=solver, quant_table=quant_table)
    unflat = lambda x: x.reshape((n, t) + x.shape[1:])
    return unflat(zi), unflat(zt), unflat(zj)


def _euler_decode(model, params, zi, z0, motions, sample_step, start_step,
                  z1=None, solver: str = "euler", quant_table=None):
    """ODE-walk the DiT from ``start_step`` down. When ``start_step`` is
    below the scheduler's full range, the walk starts from the partially
    noised target (reference seeds with ``get_train_tuple(z1=zj,
    start_step)``), which requires ``z1``. ``solver``: 'euler' (reference
    parity) or 'heun' (2nd-order; ~half the steps at matched accuracy).

    ``quant_table`` (``ops/quant.py::quantize_params``) runs the DiT's big
    projections on the int8 MXU — serving-only; the one-shot motion
    encoding stays in the compute dtype."""
    num_steps = model.cfg.scheduler_num_step
    step_seq = rf.sample_step_sequence(sample_step, start_step, num_steps)
    z_start = rf.euler_start(z0, z1, start_step, num_steps)

    def vel_fn(zt, tstep):
        image_hidden = jnp.concatenate([zi, zt], axis=1)
        return model.apply(params, image_hidden, tstep, method="velocity",
                           **motions)

    integrate = rf.heun_sample if solver == "heun" else rf.euler_sample
    with quant.maybe_quantized(quant_table):
        return integrate(vel_fn, z_start, step_seq)


# -----------------------------------------------------------------------------
# Factories (reference model_AMD.py:3127-3211)
# -----------------------------------------------------------------------------


def _cfg(**kw) -> AMDConfig:
    return AMDConfig(**kw)


def AMD_S(dtype=jnp.float32, **kw) -> AMDModel:
    return AMDModel(cfg=_cfg(enc_nhead=8, enc_ndim=64,
                             diffusion_attn_head_dim=64,
                             diffusion_attn_num_heads=16,
                             diffusion_out_channels=4,
                             diffusion_num_layers=12, **kw), dtype=dtype)


def AMD_N(dtype=jnp.float32, **kw) -> AMDModelNew:
    return AMDModelNew(cfg=_cfg(enc_nhead=8, enc_ndim=64,
                                diffusion_attn_head_dim=64,
                                diffusion_attn_num_heads=16,
                                diffusion_out_channels=4,
                                diffusion_num_layers=12, **kw), dtype=dtype)


def AMD_L(dtype=jnp.float32, **kw) -> AMDModel:
    return AMDModel(cfg=_cfg(enc_nhead=16, enc_ndim=64,
                             diffusion_attn_head_dim=96,
                             diffusion_attn_num_heads=16,
                             diffusion_out_channels=4,
                             diffusion_num_layers=16, **kw), dtype=dtype)


def AMD_S_Camera(dtype=jnp.float32, **kw) -> AMDModelNew:
    """Camera-only variant (reference ``AMDModel_Camera:894-1661`` /
    ``AMD_S_Camera:3152``). The legacy class is a single-stream copy of the
    dual model, so here it's the unified model with the object stream off."""
    kw.setdefault("use_object", False)
    kw.setdefault("use_camera", True)
    return AMDModelNew(cfg=_cfg(enc_nhead=8, enc_ndim=64,
                                diffusion_attn_head_dim=64,
                                diffusion_attn_num_heads=16,
                                diffusion_out_channels=4,
                                diffusion_num_layers=12, **kw), dtype=dtype)


def AMD_S_Rec(dtype=jnp.float32, **kw) -> AMDModelRec:
    return AMDModelRec(cfg=_cfg(enc_nhead=8, enc_ndim=64,
                                diffusion_attn_head_dim=64,
                                diffusion_attn_num_heads=16,
                                diffusion_out_channels=4,
                                diffusion_num_layers=12, **kw), dtype=dtype)


def AMD_S_RecSplit(dtype=jnp.float32, **kw) -> AMDModelRec:
    return AMDModelRec(cfg=_cfg(enc_nhead=8, enc_ndim=64,
                                diffusion_attn_head_dim=64,
                                diffusion_attn_num_heads=16,
                                diffusion_out_channels=4,
                                diffusion_num_layers=12, **kw),
                       is_split=True, dtype=dtype)


AMD_MODELS = {
    "AMD_S": AMD_S,  # ~250M
    "AMD_S_Camera": AMD_S_Camera,
    "AMD_N": AMD_N,
    "AMD_L": AMD_L,  # ~700M
    "AMD_S_Rec": AMD_S_Rec,
    "AMD_S_RecSplit": AMD_S_RecSplit,
}


# -----------------------------------------------------------------------------
# Jitted entry points for pipelines/CLIs: the module is static (hashable
# frozen dataclass), params/keys/latents stay traced so weights are program
# arguments rather than embedded HLO constants. Step counts and mask ratios
# shape the trace, so they are static too.
# -----------------------------------------------------------------------------


def extract_motion(model: nn.Module, params, video: jax.Array,
                   mask_ratio=None, key: Optional[jax.Array] = None):
    """Frozen-model motion extraction (reference ``extract_motion``).

    ``mask_ratio`` needs a ``key`` for the token-drop jitter; without one
    the masked encoder would die inside Flax on a missing 'mask' rng.
    """
    rngs = {}
    if mask_ratio is not None:
        if key is None:
            raise ValueError("extract_motion(mask_ratio=...) needs key=")
        rngs = {"rngs": {"mask": key}}
    return model.apply(params, video, mask_ratio, method="extract_motion",
                       **rngs)


extract_motion_jit = jax.jit(extract_motion, static_argnums=(0,),
                             static_argnames=("mask_ratio",))
sample_jit = jax.jit(sample, static_argnums=(0,), static_argnames=(
    "sample_step", "start_step", "camera_mask_ratio", "object_mask_ratio",
    "solver"))
sample_with_refimg_motion_jit = jax.jit(
    sample_with_refimg_motion, static_argnums=(0,),
    static_argnames=("sample_step", "solver", "mask_ratio"))
sample_diff_motion_jit = jax.jit(sample_diff_motion, static_argnums=(0,),
                                 static_argnames=("sample_step", "start_step",
                                                  "mask_ratio", "solver"))
sample_cross_jit = jax.jit(sample_cross, static_argnums=(0,), static_argnames=(
    "sample_step", "start_step", "camera_mask_ratio", "object_mask_ratio",
    "solver"))
