"""End-to-end torch golden parity for AMDModelNew (the BASELINE 0.1 dB gate's
executable evidence): full forward velocity AND a 4-step Euler sample against
the torch restatement in torch_ref.py with shared weights, plus a numerical
convert->run->compare round trip through utils/torch_convert."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torch_ref as TR
from hivae_tpu.models import amd

pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)

CFG = dict(image_height=16, image_width=16, video_frames=4,
           image_patch_size=2, use_filter=True, use_grey=True,
           diffusion_model_type="spatial",
           object_motion_token_num=3, object_motion_token_channel=24,
           object_enc_num_layers=2, enc_nhead=2, enc_ndim=12,
           camera_motion_token_num=4, camera_motion_token_channel=10,
           camera_enc_num_layers=2, motion_token_num=3,
           motion_token_channel=24, diffusion_attn_head_dim=12,
           diffusion_attn_num_heads=2, diffusion_num_layers=2)


@pytest.fixture(scope="module")
def stack():
    cfg = amd.AMDConfig(**CFG)
    model = amd.AMDModelNew(cfg=cfg)
    rng = np.random.RandomState(0)
    video = rng.randn(2, 4, 4, 16, 16).astype(np.float32)
    ref = np.broadcast_to(video[:, :1], video.shape).copy()
    grey = rng.randn(2, 4, 4, 16, 16).astype(np.float32)
    ref_grey = np.broadcast_to(grey[:, :1], grey.shape).copy()
    params = model.init({"params": KEY, "noise": KEY}, jnp.asarray(video),
                        jnp.asarray(ref), jnp.asarray(grey),
                        jnp.asarray(ref_grey))
    return model, params, cfg, video, ref, grey, ref_grey


class TestForwardGolden:
    def test_velocity_parity(self, stack):
        """Full training forward: encoders + spatial DiT velocity must match
        the torch restatement at fp32 tolerance (reference semantics:
        model_AMD.py:1844-2017)."""
        model, params, cfg, video, ref, grey, ref_grey = stack
        time_step = jnp.asarray(np.repeat([250, 750], 4), jnp.int32)
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
        np.testing.assert_allclose(np.asarray(pre), pre_t.numpy(),
                                   rtol=2e-4, atol=5e-5)

    def test_encode_parity(self, stack):
        """Motion encodings at the sample-time cutoffs (0.6, 0.6) match
        (reference encode: model_AMD.py:2379-2462)."""
        model, params, cfg, video, ref, grey, ref_grey = stack
        cam, obj_s, obj_t = model.apply(
            params, jnp.asarray(video), jnp.asarray(ref), jnp.asarray(grey),
            jnp.asarray(ref_grey), method="encode")
        cam_t, obj_s_t, obj_t_t = TR.amd_new_encode(
            params["params"], video, ref, grey, ref_grey, cfg, 0.6, 0.6)
        np.testing.assert_allclose(np.asarray(cam), cam_t.numpy(),
                                   rtol=2e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(obj_s), obj_s_t.numpy(),
                                   rtol=2e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(obj_t), obj_t_t.numpy(),
                                   rtol=2e-4, atol=5e-5)

    def test_camera_mask_encode_parity(self, stack):
        """use_mask: the optical-flow camera_mask multiplies the LF band
        before the camera encoder (reference AMDModel_Camera.forward:1137,
        .sample:1261). Non-trivial mask; object stream must be unaffected."""
        model, params, cfg, video, ref, grey, ref_grey = stack
        masked = amd.AMDModelNew(cfg=cfg.replace(use_mask=True))
        rng = np.random.RandomState(7)
        mask = (rng.rand(2, 8, 1, 16, 16) > 0.5).astype(np.float32)
        mask = np.broadcast_to(mask, (2, 8, 4, 16, 16)).copy()
        cam, obj_s, obj_t = masked.apply(
            params, jnp.asarray(video), jnp.asarray(ref), jnp.asarray(grey),
            jnp.asarray(ref_grey), camera_mask=jnp.asarray(mask),
            method="encode")
        cam_t, obj_s_t, obj_t_t = TR.amd_new_encode(
            params["params"], video, ref, grey, ref_grey, cfg, 0.6, 0.6,
            camera_mask=mask)
        np.testing.assert_allclose(np.asarray(cam), cam_t.numpy(),
                                   rtol=2e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(obj_s), obj_s_t.numpy(),
                                   rtol=2e-4, atol=5e-5)
        # BOTH object halves must be mask-invariant (a wrong slice routing
        # the mask into object_target would otherwise pass)
        np.testing.assert_allclose(np.asarray(obj_t), obj_t_t.numpy(),
                                   rtol=2e-4, atol=5e-5)
        # the mask must actually change the camera stream
        cam_unmasked, _, _ = model.apply(
            params, jnp.asarray(video), jnp.asarray(ref), jnp.asarray(grey),
            jnp.asarray(ref_grey), method="encode")
        assert not np.allclose(np.asarray(cam), np.asarray(cam_unmasked))


class TestSampleGolden:
    def test_four_step_sample_parity(self, stack):
        """amd.sample (lax.scan Euler) against the reference's python Euler
        loop (model_AMD.py:2020-2195), same weights, same z0."""
        model, params, cfg, video, ref, grey, ref_grey = stack
        key = jax.random.PRNGKey(3)
        _, zt, _ = amd.sample(model, params, key, jnp.asarray(video),
                              jnp.asarray(ref), jnp.asarray(grey),
                              jnp.asarray(ref_grey), sample_step=4)

        # pin the same z0 that sample() drew internally
        kenc, knoise = jax.random.split(key)
        zj = jnp.asarray(video).reshape((8, 4, 16, 16))
        z0 = np.asarray(jax.random.normal(knoise, zj.shape, zj.dtype))
        zt_t = TR.amd_new_sample(params, video, ref, grey, ref_grey, z0,
                                 sample_step=4, cfg=cfg)
        np.testing.assert_allclose(np.asarray(zt), zt_t.numpy(),
                                   rtol=5e-4, atol=5e-4)


def _export_to_torch_state(params):
    """Inverse of convert_torch_state for this model family: flax tree ->
    reference-named torch state dict (Linear kernels transposed)."""
    from hivae_tpu.utils.torch_convert import flax_path_to_torch_key

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    state = {}
    for keypath, leaf in flat:
        path = tuple(p.key if hasattr(p, "key") else str(p) for p in keypath)
        lookup = path[1:] if path and path[0] == "params" else path
        tkey = flax_path_to_torch_key(lookup)
        arr = np.asarray(leaf)
        if path[-1] == "kernel":
            assert arr.ndim == 2, f"unexpected kernel rank at {tkey}"
            arr = np.ascontiguousarray(arr.T)
        state[tkey] = arr
    return state


class TestConvertRoundTrip:
    def test_convert_run_compare(self, stack):
        """Numerical checkpoint-compat proof: reference-named torch state ->
        convert_torch_state -> identical params -> identical forward."""
        from hivae_tpu.utils.torch_convert import convert_torch_state

        model, params, cfg, video, ref, grey, ref_grey = stack
        torch_state = _export_to_torch_state(params)
        template = jax.tree.map(jnp.zeros_like, params)
        converted, report = convert_torch_state(template, torch_state,
                                                strict=True)
        assert not report["missing"]
        assert not report["unused"], report["unused"][:5]
        for a, b in zip(jax.tree.leaves(converted), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        ts = jnp.asarray(np.repeat([100, 900], 4), jnp.int32)
        kwargs = dict(time_step=ts, rngs={"noise": KEY})
        pre_a, _, _ = model.apply(params, jnp.asarray(video),
                                  jnp.asarray(ref), jnp.asarray(grey),
                                  jnp.asarray(ref_grey), **kwargs)
        pre_b, _, _ = model.apply(converted, jnp.asarray(video),
                                  jnp.asarray(ref), jnp.asarray(grey),
                                  jnp.asarray(ref_grey), **kwargs)
        np.testing.assert_array_equal(np.asarray(pre_a), np.asarray(pre_b))
