"""Inference pipelines: video reconstruction, cross-video motion transfer,
and windowed autoregressive image+audio -> video.

Capability parity with the reference pipelines (reference:
``model/pipeline.py``):

  * ``AMDReconstructionPipeline``  ~ ``AMDPipeLine_single:619-794`` — read a
    clip, VAE-encode, AMD motion-extract + Euler-decode, VAE-decode, write;
    its ``sample_long`` is the windowed autoregressive long-video form
    (``AMDPipeLine:459-618``: each window's reference frame is the previous
    window's last *generated* frame, with ``mask_ratio``/``drop_prev_img``
    knobs and the 256-frame cap).
  * ``AMDCrossVideoPipeline``      ~ ``AMDPipeLine_single_cross:801`` —
    motion from one clip, appearance from another.
  * ``ImageAudio2VideoPipeline``   ~ ``ImageAudio2VideoPipeLine:1217-1528`` —
    W-frame windowed autoregressive loop chaining the last R frames/motions
    as reference for the next window (the reference's long-video mechanism).

TPU-first: host work (decode, resize, mp4 writing) stays in numpy/cv2/torch
CPU; ALL device work per clip/window is a single fused jitted program
(``_recon_clip`` / ``_cross_clip`` / ``_a2v_window`` / ``_gt_motion_window``)
with static shapes, so the autoregressive loop is one dispatch per window
and XLA fuses across the encode -> sample -> decode seams. Modules are
static jit arguments; parameters stay traced (weights are program
arguments, not HLO constants).
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import video as vio
from ..models import a2m as a2m_mod
from ..models import amd as amd_mod
from ..models import vae as vae_mod
from ..ops import quant as quant_ops


from functools import partial


@partial(jax.jit, static_argnums=(0, 1),
         static_argnames=("sample_step", "camera_mask_ratio",
                          "object_mask_ratio", "use_grey", "solver"))
def _recon_clip(vae, amd_model, vae_params, amd_params, pixels, grey, key,
                sample_step, camera_mask_ratio=None, object_mask_ratio=None,
                use_grey=False, solver="euler", quant_table=None,
                vae_quant_table=None):
    """Whole-clip reconstruction as ONE program: encode -> split ref/target
    -> motion sample -> decode -> uint8. A single dispatch per clip matters:
    per-op eager dispatch costs seconds on relayed runtimes and forfeits
    cross-stage fusion everywhere."""
    z = vae_mod.vae_encode(vae, vae_params, pixels[None])[0]
    refimg_z, gt_video_z = z[:1], z[1:][None]
    ref = jnp.broadcast_to(refimg_z[:, None], gt_video_z.shape)
    grey_kw = {}
    if use_grey:
        gz = vae_mod.vae_encode(vae, vae_params, grey[None])[0]
        grey_kw = dict(
            video_grey=gz[1:][None],
            ref_img_grey=jnp.broadcast_to(gz[:1][None], gt_video_z.shape))
    _, video_pre, _ = amd_mod.sample(
        amd_model, amd_params, key, gt_video_z, ref,
        sample_step=sample_step, camera_mask_ratio=camera_mask_ratio,
        object_mask_ratio=object_mask_ratio, solver=solver,
        quant_table=quant_table, **grey_kw)
    result = jnp.concatenate([refimg_z[None], video_pre], axis=1)
    return vae_mod.vae_decode_rgb(vae, vae_params, result,
                                  quant_table=vae_quant_table)[0]


@partial(jax.jit, static_argnums=(0, 1),
         static_argnames=("sample_step", "use_grey"))
def _cross_clip(vae, amd_model, vae_params, amd_params, pix1, pix2, grey1,
                grey2, key, sample_step, use_grey=False, quant_table=None,
                vae_quant_table=None):
    """Cross-video motion transfer as ONE program (motion from clip 1,
    appearance from clip 2) — same single-dispatch rationale as
    ``_recon_clip``."""
    enc = lambda px: vae_mod.vae_encode(vae, vae_params, px[None])[0]
    z1, z2 = enc(pix1), enc(pix2)
    ref = jnp.broadcast_to(z2[:1][None][:, :1], z2[1:][None].shape)
    kw = {}
    if use_grey:
        g1, g2 = enc(grey1), enc(grey2)
        kw = dict(video_grey_1=g1[1:][None], video_grey_2=g2[1:][None],
                  ref_img_grey=jnp.broadcast_to(
                      g2[:1][None][:, :1], g2[1:][None].shape))
    _, video_pre, _ = amd_mod.sample_cross(
        amd_model, amd_params, key, z1[1:][None], z2[1:][None], ref,
        sample_step=sample_step, quant_table=quant_table, **kw)
    result = jnp.concatenate([z2[:1][None], video_pre], axis=1)
    return vae_mod.vae_decode_rgb(vae, vae_params, result,
                                  quant_table=vae_quant_table)[0]


@partial(jax.jit, static_argnums=(0, 1),
         static_argnames=("sample_step", "use_grey"))
def _diff_motion_clip(vae, amd_model, vae_params, amd_params, pixels, grey,
                      camera_pixels, key, sample_step, use_grey=False,
                      quant_table=None, vae_quant_table=None):
    """Reconstruction with the camera/LF motion taken from a different clip
    (reference ``AMDModel.sample_diff_motion``) as ONE program. AMDModel
    (dual-encoder) only."""
    enc = lambda px: vae_mod.vae_encode(vae, vae_params, px[None])[0]
    z = enc(pixels)
    refimg_z, gt = z[:1], z[1:][None]
    ref = jnp.broadcast_to(refimg_z[:, None], gt.shape)
    gz = enc(grey) if use_grey else z
    cam_gz = enc(camera_pixels)  # caller passes the grey camera stream
    _, video_pre, _ = amd_mod.sample_diff_motion(
        amd_model, amd_params, key, gt, ref,
        video_grey=gz[1:][None],
        ref_img_grey=jnp.broadcast_to(gz[:1][None], gt.shape),
        camera_video_grey=cam_gz[1:][None], sample_step=sample_step,
        quant_table=quant_table)
    result = jnp.concatenate([refimg_z[None], video_pre], axis=1)
    return vae_mod.vae_decode_rgb(vae, vae_params, result,
                                  quant_table=vae_quant_table)[0]


@partial(jax.jit, static_argnums=(0, 1),
         static_argnames=("motion_steps", "video_steps"))
def _a2v_window(amd_model, a2m_model, amd_params, a2m_params, ref_motion,
                audio, ref_audio, m2v_ref, km, kv, motion_steps, video_steps,
                quant_table=None, a2m_quant_table=None):
    """One audio->video window (A2M motion sample + refimg-motion decode)
    as one program — one dispatch per window in the autoregressive loop."""
    motion_pre = a2m_mod.sample(
        a2m_model, a2m_params, km, ref_motion[:, -1],
        frames=audio.shape[1], sample_step=motion_steps, audio=audio,
        ref_audio=ref_audio[:, -1], quant_table=a2m_quant_table)
    _, video_pre = amd_mod.sample_with_refimg_motion(
        amd_model, amd_params, kv, m2v_ref, motion_pre,
        sample_step=video_steps, quant_table=quant_table)
    return motion_pre, video_pre


@partial(jax.jit, static_argnums=(0,),
         static_argnames=("sample_step", "mask_ratio", "use_grey",
                          "drop_prev_img", "solver"))
def _long_recon_window(amd_model, amd_params, cur_gt, prev_img, grey_cur_gt,
                       grey_prev_img, key, sample_step, mask_ratio=None,
                       use_grey=False, drop_prev_img=False, solver="euler",
                       quant_table=None):
    """One W-frame window of the autoregressive long-video reconstruction
    (reference ``AMDPipeLine.sample`` inner loop, ``pipeline.py:545-595``)
    as ONE program — compiled once and reused for every window including
    the ragged tail (same static W)."""
    ref = jnp.broadcast_to(prev_img[:, None], cur_gt.shape)
    if drop_prev_img:  # reference ``:558`` zeroes the reference frame
        ref = jnp.zeros_like(ref)
    kw = {}
    if use_grey:
        kw = dict(video_grey=grey_cur_gt,
                  ref_img_grey=jnp.broadcast_to(grey_prev_img[:, None],
                                                cur_gt.shape))
    if isinstance(amd_model, amd_mod.AMDModelNew):
        # The reference pipeline's single knob only exists on the dual
        # model's sample (``model_AMD.py:426``); map it to both encoder
        # ratios for the decoupled model.
        ratios = dict(camera_mask_ratio=mask_ratio,
                      object_mask_ratio=mask_ratio)
    else:
        ratios = dict(camera_mask_ratio=mask_ratio)
    _, video_pre, _ = amd_mod.sample(
        amd_model, amd_params, key, cur_gt, ref,
        sample_step=sample_step, solver=solver, quant_table=quant_table,
        **ratios, **kw)
    return video_pre


@partial(jax.jit, static_argnums=(0, 1),
         static_argnames=("sample_step", "mask_ratio"))
def _gt_motion_window(vae, amd_model, vae_params, amd_params, cur_gt,
                      m2v_ref, key, sample_step, mask_ratio=None,
                      quant_table=None):
    """One GT-motion ablation window (extract -> decode) as one program.
    ``mask_ratio`` masks the motion-token extraction (reference
    ``AMDTestPipeLine`` knob, ``pipeline.py:266,345``)."""
    # split only when masking (sample_with_refimg_motion convention):
    # the unmasked path's noise stream must not shift with this feature
    if mask_ratio is None:
        enc_rngs = {}
    else:
        key, kmask = jax.random.split(key)
        enc_rngs = {"rngs": {"mask": kmask}}
    motion = amd_model.apply(amd_params, cur_gt, mask_ratio,
                             method="extract_motion", **enc_rngs)
    return amd_mod.sample_with_refimg_motion(
        amd_model, amd_params, key, m2v_ref, motion,
        sample_step=sample_step, mask_ratio=mask_ratio,
        quant_table=quant_table)[1]


_QUANT_SCOPES = {
    # each table covers EXACTLY the modules its wrapped serving leg runs:
    # dead entries would waste HBM and make strip_quantized strip kernels
    # an unwrapped leg still reads
    "dit": ("diffusion_transformer",),   # AMD Euler loop
    "vae": ("decoder",),                 # decode leg only; encode stays bf16
    "a2m": ("diffusion",),               # A2M Euler loop; conditioning bf16
}


def _build_quant_table(quant, params, scope="dit", allow_empty=False):
    """``quant='int8'`` -> w8a8 table (``ops/quant.py``); built as ONE
    jitted program (eager per-leaf quant would be per-op dispatch on
    relayed runtimes). ``allow_empty``: a model whose layers all fall
    below the size predicate serves unquantized (None) instead of raising
    — the A2M head can legitimately be tiny."""
    if quant is None:
        return None
    if quant != "int8":
        raise ValueError(f"unknown quant mode {quant!r}; use 'int8' or None")
    fn = partial(quant_ops.quantize_params, scope=_QUANT_SCOPES[scope])
    try:
        return jax.jit(fn)(params)
    except ValueError as e:
        if allow_empty and "matched no kernels" in str(e):
            warnings.warn(
                f"quant: no {scope} layers clear the int8 size predicate; "
                "that leg serves in the compute dtype", stacklevel=2)
            return None
        raise


def _init_quant(quant, trees, allow_empty=()):
    """Build one table per (scope -> params) entry and strip the covered
    bf16 kernels+biases from the serving trees (the interceptor reads the
    table, never the module's own params — the advertised HBM cut).
    Returns ``(tables, stripped_trees)`` keyed like ``trees``.

    The returned trees are committed to the device: checkpoint restores
    and ``init_on_cpu`` yield HOST arrays, and a host tree passed as a jit
    argument re-uploads in full on EVERY dispatch — measured 28.9 s per
    A2V window on a 131M AMD through the relay vs 0.08 s once the tree is
    device-resident. Committing here makes every pipeline's
    window/clip loop pay the transfer exactly once."""
    tables, stripped = {}, {}
    for scope, params in trees.items():
        t = _build_quant_table(quant, params, scope,
                               allow_empty=scope in allow_empty)
        tree = quant_ops.strip_quantized(params, t) if t else params
        tables[scope] = jax.device_put(t) if t else t
        stripped[scope] = jax.device_put(tree)
    return tables, stripped


class AMDReconstructionPipeline:
    """Single-window video reconstruction through the motion bottleneck.

    ``quant='int8'`` runs the DiT Euler loop's large projections on the
    int8 MXU (~2x the bf16 matmul rate on v5e; see ``ops/quant.py``)."""

    def __init__(self, vae, vae_params, amd_model, amd_params,
                 window: int = 16, use_grey: bool = False,
                 sample_size: int = 256, quant: Optional[str] = None):
        self.vae = vae
        self.vae_params = vae_params
        self.amd_model = amd_model
        self.amd_params = amd_params
        self.window = window
        self.use_grey = use_grey
        self.sample_size = sample_size
        tables, trees = _init_quant(
            quant, {"dit": amd_params, "vae": vae_params})
        self.quant_table = tables["dit"]
        self.vae_quant_table = tables["vae"]
        self.amd_params = trees["dit"]
        self.vae_params = trees["vae"]

    def _load_clip(self, video_path: str, fps: int):
        total, video_fps = vio.video_metadata(video_path)
        idx = vio.sample_frames_with_fps(total, video_fps, self.window + 1,
                                         fps, start_index=0)
        frames = vio.read_video_frames(video_path, idx)
        pixels = vio.pixel_transform(frames, self.sample_size)
        grey = None
        if self.use_grey:
            grey = vio.pixel_transform(vio.to_grayscale(frames),
                                       self.sample_size)
        return pixels, grey

    def sample(self, video_path: str, output_path: Optional[str] = None,
               video_sample_step: int = 20, fps: int = 8,
               object_mask_ratio=None, camera_mask_ratio=None,
               key: Optional[jax.Array] = None,
               solver: str = "euler") -> np.ndarray:
        """Returns the reconstructed clip (F+1, C, H, W) uint8; writes mp4
        when ``output_path`` is given. ``solver='heun'`` uses the 2nd-order
        integrator (2 DiT calls/step, ~half the steps at matched accuracy)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        pixels, grey = self._load_clip(video_path, fps)

        out = np.asarray(_recon_clip(
            self.vae, self.amd_model, self.vae_params, self.amd_params,
            jnp.asarray(pixels), None if grey is None else jnp.asarray(grey),
            key, sample_step=video_sample_step,
            camera_mask_ratio=camera_mask_ratio,
            object_mask_ratio=object_mask_ratio, use_grey=self.use_grey,
            solver=solver, quant_table=self.quant_table,
            vae_quant_table=self.vae_quant_table))
        if output_path:
            vio.write_video(output_path, out, fps=fps)
        return out

    def sample_long(self, video_path: str, output_path: Optional[str] = None,
                    video_sample_step: int = 4,
                    mask_ratio: Optional[float] = None, fps: int = 30,
                    drop_prev_img: bool = False, max_frames: int = 256,
                    key: Optional[jax.Array] = None,
                    solver: str = "euler") -> np.ndarray:
        """Windowed autoregressive long-video reconstruction (reference
        ``AMDPipeLine.sample``, ``model/pipeline.py:488-604``): the clip is
        VAE-encoded once, then reconstructed W frames at a time with each
        window's reference frame taken from the PREVIOUS window's last
        *generated* frame (the refimg for window 0) — so reconstruction
        errors compound across windows, which is exactly what the
        reference's long-video mechanism exists to measure.

        Parity notes (cited against ``model/pipeline.py``):
          * frames are read consecutively — no fps resampling (``:511``) —
            up to ``max_frames`` + 1 (the reference's
            ``max_infer_length = 256``, ``:474,510``).
          * ``mask_ratio`` masks motion-encoder tokens, the dual model's
            single knob (``:562``); mapped to both camera/object ratios on
            ``AMDModelNew``, whose reference sample has no single-knob
            form. ``0.0`` is treated as off, matching the effect of the
            reference default.
          * ``drop_prev_img`` zeroes the reference frame (``:558``). The
            reference's ``drop_ref_img`` flag is accepted there but never
            read (``:495``), so it is not reproduced.
          * the ragged tail re-runs the final W frames; the overlap
            REPLACES the earlier predictions (the convention of
            ``ImageAudio2VideoPipeline``), where the reference appends the
            whole overlapped window (``:595``) and so returns more frames
            than the input clip has — a divergence from its own documented
            ``N,T+1`` contract that we treat as a bug.
          * with ``use_grey``, window 0's grey reference is the GREY
            refimg latent; the reference reuses the color refimg there
            (``:554``), which we likewise treat as a bug. Later windows
            use the grey GT frame before the window start (``:554``),
            reproduced exactly.
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        if not mask_ratio:
            mask_ratio = None
        w = self.window
        total, _ = vio.video_metadata(video_path)
        n_frames = min(total, max_frames + 1)
        frames = vio.read_video_frames(video_path, np.arange(n_frames))
        pixels = vio.pixel_transform(frames, self.sample_size)
        z = vae_mod.vae_encode_jit(self.vae, self.vae_params,
                                   jnp.asarray(pixels)[None])
        ref_z, gt_z = z[:, :1], z[:, 1:]
        grey_ref = grey_gt = None
        if self.use_grey:
            grey = vio.pixel_transform(vio.to_grayscale(frames),
                                       self.sample_size)
            gz = vae_mod.vae_encode_jit(self.vae, self.vae_params,
                                        jnp.asarray(grey)[None])
            grey_ref, grey_gt = gz[:, :1], gz[:, 1:]

        t = gt_z.shape[1]
        if t < w:
            raise ValueError(
                f"sample_long needs at least window+1={w + 1} frames; the "
                f"clip has {t + 1} (use sample() for single short clips)")
        num_windows = t // w
        offset = t % w

        def _window(s, e, prev, grey_prev, k):
            return _long_recon_window(
                self.amd_model, self.amd_params, gt_z[:, s:e], prev,
                None if grey_gt is None else grey_gt[:, s:e], grey_prev, k,
                sample_step=video_sample_step, mask_ratio=mask_ratio,
                use_grey=self.use_grey, drop_prev_img=drop_prev_img,
                solver=solver, quant_table=self.quant_table)

        pre_video = None
        for i in range(num_windows):
            key, kwin = jax.random.split(key)
            s, e = i * w, (i + 1) * w
            prev = ref_z[:, 0] if pre_video is None else pre_video[:, -1]
            grey_prev = None
            if self.use_grey:
                grey_prev = grey_ref[:, 0] if i == 0 else grey_gt[:, s - 1]
            video_pre = _window(s, e, prev, grey_prev, kwin)
            pre_video = video_pre if pre_video is None else jnp.concatenate(
                [pre_video, video_pre], axis=1)

        if offset > 0:
            key, kwin = jax.random.split(key)
            e = t
            s = e - w
            prev = ref_z[:, 0] if pre_video is None else pre_video[:, -1]
            grey_prev = None
            if self.use_grey:
                grey_prev = grey_ref[:, 0] if s == 0 else grey_gt[:, s - 1]
            video_pre = _window(s, e, prev, grey_prev, kwin)
            pre_video = (video_pre if pre_video is None else
                         jnp.concatenate([pre_video[:, :s], video_pre],
                                         axis=1))

        result = jnp.concatenate([ref_z, pre_video], axis=1)
        out = np.asarray(vae_mod.vae_decode_rgb_jit(
            self.vae, self.vae_params, result,
            quant_table=self.vae_quant_table)[0])
        if output_path:
            vio.write_video(output_path, out, fps=fps)
        return out


class AMDCrossVideoPipeline(AMDReconstructionPipeline):
    """Motion from ``video_path_1``, appearance from ``video_path_2``."""

    def sample_cross(self, video_path_1: str, video_path_2: str,
                     output_path: Optional[str] = None,
                     video_sample_step: int = 20, fps: int = 8,
                     key: Optional[jax.Array] = None) -> np.ndarray:
        key = key if key is not None else jax.random.PRNGKey(0)
        pix1, grey1 = self._load_clip(video_path_1, fps)
        pix2, grey2 = self._load_clip(video_path_2, fps)

        out = np.asarray(_cross_clip(
            self.vae, self.amd_model, self.vae_params, self.amd_params,
            jnp.asarray(pix1), jnp.asarray(pix2),
            None if grey1 is None else jnp.asarray(grey1),
            None if grey2 is None else jnp.asarray(grey2), key,
            sample_step=video_sample_step, use_grey=self.use_grey,
            quant_table=self.quant_table,
            vae_quant_table=self.vae_quant_table))
        if output_path:
            vio.write_video(output_path, out, fps=fps)
        return out


class AMDDiffMotionPipeline(AMDReconstructionPipeline):
    """Reconstruct ``video_path`` but take the camera/LF motion from
    ``camera_video_path`` (reference ``AMDModel.sample_diff_motion:598``;
    requires the dual-encoder ``AMDModel``)."""

    def sample_diff(self, video_path: str, camera_video_path: str,
                    output_path: Optional[str] = None,
                    video_sample_step: int = 20, fps: int = 8,
                    key: Optional[jax.Array] = None) -> np.ndarray:
        key = key if key is not None else jax.random.PRNGKey(0)
        pixels, grey = self._load_clip(video_path, fps)
        _, cam_grey = self._load_clip(camera_video_path, fps)
        if cam_grey is None:  # pipeline built without grey streams
            cam_grey = self._load_clip(camera_video_path, fps)[0]

        out = np.asarray(_diff_motion_clip(
            self.vae, self.amd_model, self.vae_params, self.amd_params,
            jnp.asarray(pixels),
            jnp.asarray(grey if grey is not None else pixels),
            jnp.asarray(cam_grey), key, sample_step=video_sample_step,
            use_grey=self.use_grey, quant_table=self.quant_table,
            vae_quant_table=self.vae_quant_table))
        if output_path:
            vio.write_video(output_path, out, fps=fps)
        return out


class GTMotionAblationPipeline:
    """Windowed GT-motion reconstruction ablation (reference
    ``AMDTestPipeLine:266-430``): extract ground-truth motion tokens per
    W-frame window (optionally masked) and decode chained on the previous
    window's last generated frame — isolates decoder quality from the A2M
    head."""

    def __init__(self, vae, vae_params, amd_model, amd_params,
                 window: int = 16, sample_size: int = 256,
                 quant: Optional[str] = None):
        self.vae = vae
        self.vae_params = vae_params
        self.amd_model = amd_model
        self.amd_params = amd_params
        self.window = window
        self.sample_size = sample_size
        tables, trees = _init_quant(
            quant, {"dit": amd_params, "vae": vae_params})
        self.quant_table = tables["dit"]
        self.vae_quant_table = tables["vae"]
        self.amd_params = trees["dit"]
        self.vae_params = trees["vae"]

    def reconstruct(self, video_path: str, output_path: Optional[str] = None,
                    num_windows: int = 2, video_sample_step: int = 10,
                    fps: int = 8, key: Optional[jax.Array] = None,
                    mask_ratio: Optional[float] = None) -> np.ndarray:
        """``mask_ratio``: fraction of motion tokens dropped at extraction —
        the reference's ablation knob (``AMDTestPipeLine``,
        ``pipeline.py:266``)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        w = self.window
        total, video_fps = vio.video_metadata(video_path)
        n_frames = num_windows * w + 1
        idx = vio.sample_frames_with_fps(total, video_fps, n_frames, fps,
                                         start_index=0)
        frames = vio.read_video_frames(video_path, idx)
        pixels = vio.pixel_transform(frames, self.sample_size)
        z = vae_mod.vae_encode_jit(self.vae, self.vae_params,
                               jnp.asarray(pixels)[None])
        ref_z, gt_z = z[:, :1], z[:, 1:]

        pre_video = None
        for i in range(num_windows):
            key, kv = jax.random.split(key)
            cur_gt = gt_z[:, i * w:(i + 1) * w]
            m2v_ref = ref_z[:, 0] if pre_video is None else pre_video[:, -1]
            video_pre = _gt_motion_window(
                self.vae, self.amd_model, self.vae_params, self.amd_params,
                cur_gt, m2v_ref, kv, sample_step=video_sample_step,
                mask_ratio=mask_ratio, quant_table=self.quant_table)
            pre_video = video_pre if pre_video is None else jnp.concatenate(
                [pre_video, video_pre], axis=1)

        result = jnp.concatenate([ref_z, pre_video], axis=1)
        out = np.asarray(vae_mod.vae_decode_rgb_jit(
            self.vae, self.vae_params, result,
            quant_table=self.vae_quant_table)[0])
        if output_path:
            vio.write_video(output_path, out, fps=fps)
        return out


class ImageAudio2VideoPipeline:
    """Windowed autoregressive audio-driven video generation.

    Mirrors the reference chaining (``pipeline.py:1295-1378``): each W-frame
    window extracts reference motion from the previous window's tail (R
    frames), samples motion with the A2M head, then decodes video latents
    with the AMD model conditioned on the last generated frame. A ragged
    tail re-runs the final window ending at the last audio frame.
    """

    def __init__(self, vae, vae_params, amd_model, amd_params, a2m_model,
                 a2m_params, window: int = 16, a2m_ref_num_frame: int = 8,
                 sample_size: int = 256,
                 need_motion_extract_model: bool = False,
                 quant: Optional[str] = None):
        """``need_motion_extract_model``: re-extract each window's reference
        motion from the previous window's *generated video latents* instead
        of chaining the predicted motion tokens — the knob of the
        reference's legacy A2V pipelines (``A2VPipeLine:72,140-147``,
        ``A2VInferencePipeLine:1056-1060``; their forwards are uncallable
        as written — see PARITY.md — so this implements the declared
        intent). Trades an extra motion-encoder call per window for
        grounding the motion chain in the decoded video.

        ``quant='int8'``: run the AMD DiT's video-decoding Euler loop,
        the A2M head's motion Euler loop and the VAE decode leg on the
        int8 MXU (``ops/quant.py``); the one-shot conditioning paths
        (motion extraction, audio encoding, VAE encode) stay in the
        compute dtype."""
        self.vae = vae
        self.vae_params = vae_params
        self.amd_model = amd_model
        self.amd_params = amd_params
        self.a2m_model = a2m_model
        self.a2m_params = a2m_params
        self.window = window
        self.ref_frames = a2m_ref_num_frame
        self.sample_size = sample_size
        self.need_motion_extract_model = need_motion_extract_model
        tables, trees = _init_quant(
            quant, {"dit": amd_params, "vae": vae_params,
                    "a2m": a2m_params}, allow_empty=("a2m",))
        self.quant_table = tables["dit"]
        self.vae_quant_table = tables["vae"]
        self.a2m_quant_table = tables["a2m"]
        self.amd_params = trees["dit"]
        self.vae_params = trees["vae"]
        self.a2m_params = trees["a2m"]
        assert window >= a2m_ref_num_frame

    def _pad_ref(self, x: jax.Array) -> jax.Array:
        """Left-pad the frame axis to R with zeros — exactly the reference's
        ``transform_a2m_ref`` (all four copies zero-pad:
        ``model/pipeline.py:195-206,388-396,1146-1154,1460-1468``; the
        ref_img pad at ``:1279`` is zeros too)."""
        r = self.ref_frames
        if x.shape[1] >= r:
            return x[:, -r:]
        pad = jnp.zeros((x.shape[0], r - x.shape[1]) + x.shape[2:], x.dtype)
        return jnp.concatenate([pad, x], axis=1)

    def predict(self, ref_img: jax.Array, ref_audio: jax.Array,
                audio: jax.Array, motion_sample_step: int = 4,
                video_sample_step: int = 4,
                key: Optional[jax.Array] = None) -> jax.Array:
        """ref_img (N,F0,C,H,W) pixels; ref_audio (N,F0,M,D); audio (N,T,M,D)
        -> video latents (N,T+1,c,h,w)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        w, r = self.window, self.ref_frames

        ref_img = self._pad_ref(ref_img)
        ref_z = vae_mod.vae_encode_jit(self.vae, self.vae_params, ref_img)
        random_ref = ref_z[:, -1]

        pre_motion = None
        pre_video = None
        total = audio.shape[1]
        num_windows = total // w
        offset = total % w

        for i in range(num_windows):
            key, km, kv = jax.random.split(key, 3)
            s, e = i * w, (i + 1) * w
            if i == 0:
                ref_motion = amd_mod.extract_motion_jit(
                    self.amd_model, self.amd_params, ref_z)
                cur_ref_audio = self._pad_ref(ref_audio)
            else:
                if self.need_motion_extract_model:
                    ref_motion = amd_mod.extract_motion_jit(
                        self.amd_model, self.amd_params, pre_video[:, -r:])
                else:
                    ref_motion = pre_motion[:, -r:]
                cur_ref_audio = audio[:, s - r:s]

            m2v_ref = random_ref if i == 0 else pre_video[:, -1]
            motion_pre, video_pre = _a2v_window(
                self.amd_model, self.a2m_model, self.amd_params,
                self.a2m_params, ref_motion, audio[:, s:e], cur_ref_audio,
                m2v_ref, km, kv, motion_steps=motion_sample_step,
                video_steps=video_sample_step, quant_table=self.quant_table,
                a2m_quant_table=self.a2m_quant_table)

            pre_motion = motion_pre if pre_motion is None else jnp.concatenate(
                [pre_motion, motion_pre], axis=1)
            pre_video = video_pre if pre_video is None else jnp.concatenate(
                [pre_video, video_pre], axis=1)

        if offset > 0 and pre_motion is not None:
            key, km, kv = jax.random.split(key, 3)
            e = total
            s = e - w
            if self.need_motion_extract_model:
                ref_motion = amd_mod.extract_motion_jit(
                    self.amd_model, self.amd_params, pre_video[:, s - r:s])
            else:
                ref_motion = pre_motion[:, s - r:s]
            motion_pre, video_pre = _a2v_window(
                self.amd_model, self.a2m_model, self.amd_params,
                self.a2m_params, ref_motion, audio[:, s:e],
                audio[:, s - r:s], pre_video[:, s - 1], km, kv,
                motion_steps=motion_sample_step,
                video_steps=video_sample_step, quant_table=self.quant_table,
                a2m_quant_table=self.a2m_quant_table)
            pre_motion = jnp.concatenate([pre_motion[:, :s], motion_pre], axis=1)
            pre_video = jnp.concatenate([pre_video[:, :s], video_pre], axis=1)

        return jnp.concatenate([ref_z[:, -1:], pre_video], axis=1)

    def _sample_motion(self, key, ref_motion, audio, ref_audio, steps):
        """One A2M sampling call; ref motion reduced to the last frame's
        tokens (the cross-attn A2M conditions on a single ref-motion set).
        Threads the a2m quant table — the stripped serving tree has no
        bf16 kernels for the covered layers."""
        return a2m_mod.sample_jit(
            self.a2m_model, self.a2m_params, key, ref_motion[:, -1],
            frames=audio.shape[1], sample_step=steps, audio=audio,
            ref_audio=ref_audio[:, -1], quant_table=self.a2m_quant_table)

    def sample(self, refimg_path: str, audio_emb: np.ndarray,
               output_path: Optional[str] = None,
               motion_sample_step: int = 8, video_sample_step: int = 20,
               fps: int = 25, key: Optional[jax.Array] = None,
               max_frames: Optional[int] = None,
               audio_path: Optional[str] = None) -> np.ndarray:
        """File-level driver (reference ``:1388-1438``): image path +
        precomputed whisper embeddings (T,M,D) -> decoded uint8 video.

        ``max_frames`` optionally caps the generated length; by default the
        full audio length is used (round-1 silently truncated to 256).
        ``audio_path``: the driving .wav — muxed into the written output
        (reference ``export_video_with_audio``, ``pipeline.py:210-263``).
        Note: without ffmpeg the muxed container is .avi, so the file
        written can differ from ``output_path`` by extension — pass
        ``output_path=None`` and call ``write_video`` yourself when you
        need the final path (as ``a2v_inference.py`` does)."""
        import cv2

        frame = cv2.cvtColor(cv2.imread(refimg_path), cv2.COLOR_BGR2RGB)
        pixels = vio.pixel_transform(frame[None], self.sample_size)
        ref_img = jnp.asarray(pixels)[None]  # (1,1,C,H,W)
        audio_emb = jnp.asarray(audio_emb)[None]
        if max_frames is not None:
            audio_emb = audio_emb[:, :max_frames]

        latents = self.predict(ref_img, audio_emb[:, :1], audio_emb[:, 1:],
                               motion_sample_step, video_sample_step, key=key)
        out = np.asarray(vae_mod.vae_decode_rgb_jit(
            self.vae, self.vae_params, latents,
            quant_table=self.vae_quant_table)[0])
        if output_path:
            vio.write_video(output_path, out, fps=fps,
                            audio_path=audio_path)
        return out
