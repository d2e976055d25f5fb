"""Production-GEOMETRY torch golden parity for AMDModelNew.

Round-3 VERDICT Weak #2: the golden suite pinned parity only at toy
geometry (16x16 latents, 4 frames, head_dim 12, 3 motion tokens) —
dim-dependent bugs (sincos table layout at production dims, padding
behavior at 260-token joint sequences, head-dim alignment) were
structurally invisible. This suite runs the flagship SHAPE of
``scripts/amd_t1d512_nonorm_spatial.sh`` (ref ``model_AMD.py:1844-2017``):

* 32x32 latents, patch 2 -> 256 image tokens (+4 motion = 260-token
  joint sequence, the production misalignment case for 8/16 tiling)
* 16 frames (temporal attention over 16, camera tokens 16x16)
* head_dim 64 x 16 heads (inner dim 1024), motion 4 tokens x 512 ch
* encoder dims 64x8 (production ``--enc_ndim/--enc_nhead`` defaults)

Layer COUNT is reduced to 2 (vs 12/8): parity bugs pinned here are
dimension-dependent, not depth-dependent, and depth at these dims would
multiply CPU golden time ~6x for no additional coverage.

Catch proof: deliberately injecting a sincos off-by-one at these dims
(swapping the 2D pos-embed's H/W halves, or rotating the 1D table by one
row) fails test_velocity_parity while the toy-geometry suite still passes
— verified during round 4 (the injection was reverted; see CHANGES_r4.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torch_ref as TR
from hivae_tpu.models import amd

pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)

# flagship geometry (scripts/amd_t1d512_nonorm_spatial.sh), depth reduced
PROD_CFG = dict(image_height=32, image_width=32, video_frames=16,
                image_patch_size=2, use_filter=True, use_grey=True,
                diffusion_model_type="spatial",
                object_motion_token_num=4, object_motion_token_channel=512,
                object_enc_num_layers=2, enc_nhead=8, enc_ndim=64,
                camera_motion_token_num=16, camera_motion_token_channel=16,
                camera_enc_num_layers=2, motion_token_num=4,
                motion_token_channel=512, diffusion_attn_head_dim=64,
                diffusion_attn_num_heads=16, diffusion_num_layers=2)

N, T, LAT = 1, 16, 32


@pytest.fixture(scope="module")
def stack():
    cfg = amd.AMDConfig(**PROD_CFG)
    model = amd.AMDModelNew(cfg=cfg)
    rng = np.random.RandomState(0)
    video = rng.randn(N, T, 4, LAT, LAT).astype(np.float32)
    ref = np.broadcast_to(video[:, :1], video.shape).copy()
    grey = rng.randn(N, T, 4, LAT, LAT).astype(np.float32)
    ref_grey = np.broadcast_to(grey[:, :1], grey.shape).copy()
    params = model.init({"params": KEY, "noise": KEY}, jnp.asarray(video),
                        jnp.asarray(ref), jnp.asarray(grey),
                        jnp.asarray(ref_grey))
    return model, params, cfg, video, ref, grey, ref_grey


class TestProductionForwardGolden:
    def test_velocity_parity(self, stack):
        """Training forward at production dims: 260-token joint attention,
        1024-dim sincos tables, 16-frame temporal camera encoding."""
        model, params, cfg, video, ref, grey, ref_grey = stack
        time_step = jnp.asarray(
            np.linspace(50, 950, N * T).astype(np.int32))
        pre, vel, meta = model.apply(
            params, jnp.asarray(video), jnp.asarray(ref), jnp.asarray(grey),
            jnp.asarray(ref_grey), time_step=time_step,
            return_meta_info=True, rngs={"noise": KEY})

        cam_t, obj_s, obj_t = TR.amd_new_encode(
            params["params"], video, ref, grey, ref_grey, cfg, 0.6, 0.5)
        pre_t = TR.amd_new_velocity(
            params, TR.t(np.asarray(meta["zi"])),
            TR.t(np.asarray(meta["zt"])),
            np.asarray(time_step, np.float32), cam_t, obj_s, obj_t, cfg)
        # slightly wider than the toy-geometry tolerance: ~4x longer
        # reduction chains (1024-dim dots, 260-key softmax) in fp32
        np.testing.assert_allclose(np.asarray(pre), pre_t.numpy(),
                                   rtol=5e-4, atol=2e-4)

    def test_encode_parity(self, stack):
        model, params, cfg, video, ref, grey, ref_grey = stack
        cam, obj_s, obj_t = model.apply(
            params, jnp.asarray(video), jnp.asarray(ref), jnp.asarray(grey),
            jnp.asarray(ref_grey), method="encode")
        cam_t, obj_s_t, obj_t_t = TR.amd_new_encode(
            params["params"], video, ref, grey, ref_grey, cfg, 0.6, 0.6)
        np.testing.assert_allclose(np.asarray(cam), cam_t.numpy(),
                                   rtol=5e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(obj_s), obj_s_t.numpy(),
                                   rtol=5e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(obj_t), obj_t_t.numpy(),
                                   rtol=5e-4, atol=2e-4)


class TestProductionSampleGolden:
    def test_two_step_sample_parity(self, stack):
        """amd.sample (lax.scan Euler) vs the reference-semantics python
        Euler loop at the flagship shape, same weights, same z0."""
        model, params, cfg, video, ref, grey, ref_grey = stack
        key = jax.random.PRNGKey(3)
        _, zt, _ = amd.sample(model, params, key, jnp.asarray(video),
                              jnp.asarray(ref), jnp.asarray(grey),
                              jnp.asarray(ref_grey), sample_step=2)

        kenc, knoise = jax.random.split(key)
        zj = jnp.asarray(video).reshape((N * T, 4, LAT, LAT))
        z0 = np.asarray(jax.random.normal(knoise, zj.shape, zj.dtype))
        zt_t = TR.amd_new_sample(params, video, ref, grey, ref_grey, z0,
                                 sample_step=2, cfg=cfg)
        np.testing.assert_allclose(np.asarray(zt), zt_t.numpy(),
                                   rtol=1e-3, atol=1e-3)


class TestProductionBf16:
    def test_bf16_velocity_tracks_fp32(self, stack):
        """The bf16 compute path at production dims must track the fp32
        golden within bf16-aware tolerance (AMP parity: fp32 norms &
        softmax, bf16 matmuls)."""
        model, params, cfg, video, ref, grey, ref_grey = stack
        bf_model = amd.AMDModelNew(cfg=cfg, dtype=jnp.bfloat16)
        ts = jnp.asarray(np.linspace(50, 950, N * T).astype(np.int32))
        kwargs = dict(time_step=ts, rngs={"noise": KEY})
        pre32, _, _ = model.apply(
            params, jnp.asarray(video), jnp.asarray(ref), jnp.asarray(grey),
            jnp.asarray(ref_grey), **kwargs)
        pre16, _, _ = bf_model.apply(
            params, jnp.asarray(video), jnp.asarray(ref), jnp.asarray(grey),
            jnp.asarray(ref_grey), **kwargs)
        err = np.abs(np.asarray(pre16, np.float32) - np.asarray(pre32))
        scale = np.abs(np.asarray(pre32)).mean() + 1e-6
        assert err.mean() / scale < 0.03, (err.mean(), scale)
