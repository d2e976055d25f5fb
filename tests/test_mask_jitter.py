"""Traced (jittered) mask-ratio path: key-masked attention at static shape
must be numerically identical to the reference's gather-style masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hivae_tpu.models import amd
from hivae_tpu.models.blocks import JointTransformerBlock
from hivae_tpu.models.motion_encoders import (MotionEncoderSpatial,
                                              MotionEncoderTemporalCross,
                                              shuffle_mask_tokens)

pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)


class TestShuffleMaskTokens:
    def test_matches_gather_subset(self):
        x = jax.random.normal(KEY, (3, 16, 8))
        xs, keep = shuffle_mask_tokens(jax.random.PRNGKey(1), x,
                                       jnp.asarray(0.5))
        assert keep.shape == (3, 16)
        assert int(keep.sum()) == 3 * 8  # floor(16 * 0.5) per row
        from hivae_tpu.models.motion_encoders import random_mask_tokens

        xg = random_mask_tokens(jax.random.PRNGKey(1), x, 0.5)
        np.testing.assert_allclose(np.asarray(xs[:, :8]), np.asarray(xg))


class TestEncoderEquivalence:
    def test_spatial_encoder_traced_vs_gather(self):
        enc = MotionEncoderSpatial(img_height=16, img_width=16,
                                   motion_token_num=4, motion_channel=16,
                                   heads=2, head_dim=8, num_layers=2)
        video = jax.random.normal(KEY, (2, 3, 4, 16, 16))
        params = enc.init({"params": KEY, "mask": KEY}, video, 0.5)
        out_static = enc.apply(params, video, 0.5, rngs={"mask": KEY})
        out_traced = enc.apply(params, video, jnp.asarray(0.5),
                               rngs={"mask": KEY})
        np.testing.assert_allclose(np.asarray(out_static),
                                   np.asarray(out_traced), atol=2e-5)

    def test_temporal_cross_traced_vs_gather(self):
        enc = MotionEncoderTemporalCross(img_height=16, img_width=16,
                                         motion_token_num=4,
                                         motion_channel=16, video_frames=4,
                                         heads=2, head_dim=8, num_layers=2)
        video = jax.random.normal(KEY, (2, 4, 4, 16, 16))
        params = enc.init({"params": KEY, "mask": KEY}, video, 0.5)
        out_static = enc.apply(params, video, 0.5, rngs={"mask": KEY})
        out_traced, keep = enc.apply(params, video, jnp.asarray(0.5),
                                     rngs={"mask": KEY})
        s_kept = out_static.shape[2]
        assert int(keep.sum()) == keep.shape[0] * s_kept
        # kept sites (same shuffle prefix) must agree exactly
        np.testing.assert_allclose(np.asarray(out_traced[:, :, :s_kept]),
                                   np.asarray(out_static), atol=2e-5)


class TestJointBlockMask:
    def test_hidden_key_mask_equals_removal(self):
        blk = JointTransformerBlock(dim=16, heads=2, head_dim=8)
        hidden = jax.random.normal(KEY, (2, 6, 16))
        encoder = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
        temb = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
        params = blk.init(KEY, hidden, encoder, temb)
        mask = jnp.asarray([[True] * 4 + [False] * 2] * 2)
        h_masked, e_masked = blk.apply(params, hidden, encoder, temb,
                                       hidden_key_mask=mask)
        h_rm, e_rm = blk.apply(params, hidden[:, :4], encoder, temb)
        np.testing.assert_allclose(np.asarray(h_masked[:, :4]),
                                   np.asarray(h_rm), atol=2e-5)
        np.testing.assert_allclose(np.asarray(e_masked), np.asarray(e_rm),
                                   atol=2e-5)


class TestForwardJitter:
    def test_jittered_forward_runs_and_varies(self):
        tiny = dict(image_height=16, image_width=16, video_frames=4,
                    object_motion_token_num=4, object_motion_token_channel=32,
                    object_enc_num_layers=1, enc_nhead=2, enc_ndim=16,
                    camera_motion_token_num=4, camera_motion_token_channel=16,
                    camera_enc_num_layers=1, motion_token_num=4,
                    motion_token_channel=32, diffusion_attn_head_dim=16,
                    diffusion_attn_num_heads=4, diffusion_num_layers=1)
        cfg = amd.AMDConfig(use_filter=True, use_grey=True,
                            diffusion_model_type="spatial", **tiny)
        model = amd.AMDModelNew(cfg=cfg)
        video = jax.random.normal(KEY, (2, 4, 4, 16, 16))
        ref = jnp.broadcast_to(video[:, :1], video.shape)
        params = model.init({"params": KEY, "noise": KEY, "mask": KEY},
                            video, ref, video, ref, None, 0.5, 0.5)
        losses = []
        for seed in range(3):
            _, _, ld = model.apply(
                params, video, ref, video, ref, None, 0.5, 0.5,
                rngs={"noise": KEY, "mask": jax.random.PRNGKey(seed)})
            assert np.isfinite(float(ld["loss"]))
            losses.append(float(ld["loss"]))
        # the per-step jitter must actually vary the masked computation
        assert len(set(losses)) > 1
