"""A2M/A2P model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hivae_tpu.models import a2m

KEY = jax.random.PRNGKey(0)

CFG = a2m.A2MConfig(audio_inchannel=16, audio_block=5, motion_num_token=4,
                    motion_in_channel=32, motion_frames=3, window_size=4,
                    encoder_out_dim=32, intermediate_dim=32,
                    pose_height=16, pose_width=16,
                    diffusion_attn_head_dim=16, diffusion_attn_num_heads=4,
                    diffusion_num_layers=2)


def _data():
    motion = jax.random.normal(KEY, (2, 3, 4, 32))
    audio = jax.random.normal(KEY, (2, 3, 5, 16))
    pose = jax.random.normal(KEY, (2, 3, 4, 16, 16))
    return motion, motion[:, 0], audio, audio[:, 0], pose, pose[:, 0]


class TestA2MCrossAttn:
    @pytest.mark.parametrize("variant,keys", [
        ("audio", ("audio", "ref_audio")),
        ("audio_pose", ("audio", "ref_audio", "pose", "ref_pose")),
        ("pose", ("pose", "ref_pose")),
    ])
    def test_forward_and_sample(self, variant, keys):
        motion, ref_motion, audio, ref_audio, pose, ref_pose = _data()
        all_kw = dict(audio=audio, ref_audio=ref_audio, pose=pose,
                      ref_pose=ref_pose)
        kw = {k: all_kw[k] for k in keys}
        m = a2m.A2MModelCrossAttnAudio(cfg=CFG, variant=variant)
        p = m.init({"params": KEY, "noise": KEY}, motion, ref_motion, **kw)
        ld = m.apply(p, motion, ref_motion, **kw, rngs={"noise": KEY})
        assert np.isfinite(float(ld["loss"]))
        out = a2m.sample(m, p, KEY, ref_motion, frames=3, sample_step=2, **kw)
        assert out.shape == motion.shape

    def test_mask_weighting(self):
        """A fully-masked frame must not contribute to the loss."""
        motion, ref_motion, audio, ref_audio, *_ = _data()
        m = a2m.A2MModelCrossAttnAudio(cfg=CFG, variant="audio")
        p = m.init({"params": KEY, "noise": KEY}, motion, ref_motion,
                   audio=audio, ref_audio=ref_audio)
        full = m.apply(p, motion, ref_motion, audio=audio,
                       ref_audio=ref_audio, mask=jnp.ones((2, 3)),
                       rngs={"noise": KEY})
        partial = m.apply(p, motion, ref_motion, audio=audio,
                          ref_audio=ref_audio,
                          mask=jnp.array([[1., 1., 0.], [1., 1., 0.]]),
                          rngs={"noise": KEY})
        assert float(full["loss"]) != float(partial["loss"])


class TestA2MLearnableToken:
    @pytest.mark.parametrize("simple", [False, True])
    def test_forward_and_sample(self, simple):
        motion, ref_motion, audio, *_ = _data()
        m = a2m.A2MModelLearnableToken(cfg=CFG, simple_adaln=simple)
        p = m.init({"params": KEY, "noise": KEY}, motion, ref_motion, audio)
        ld = m.apply(p, motion, ref_motion, audio, rngs={"noise": KEY})
        assert np.isfinite(float(ld["loss"]))
        out = a2m.sample(m, p, KEY, ref_motion, frames=3, sample_step=2,
                         audio=audio)
        assert out.shape == motion.shape


class TestA2P:
    def test_shapes(self):
        m = a2m.A2PTransformer(pose_height=16, pose_width=16,
                               pose_patch_size=4, heads=4, head_dim=16,
                               num_layers=2)
        ref_pose = jax.random.normal(KEY, (2, 4, 16, 16))
        audio = jax.random.normal(KEY, (2, 4, 6, 64))
        p = m.init(KEY, ref_pose, audio)
        out = m.apply(p, ref_pose, audio)
        assert out.shape == (2, 4, 4, 16, 16)


class TestPosePre:
    def test_forward_sample_and_pose_head(self):
        """Joint audio->pose predictor variant (reference
        ``A2MModel_CrossAtten_Audio_PosePre:1218-1420``)."""
        from hivae_tpu.models import a2m

        cfg = a2m.A2MConfig(
            audio_inchannel=16, audio_block=5, motion_num_token=4,
            motion_in_channel=32, motion_frames=4, intermediate_dim=64,
            window_size=4, encoder_out_dim=32, pose_height=8, pose_width=8,
            pose_patch_size=2, diffusion_attn_head_dim=16,
            diffusion_attn_num_heads=2, diffusion_num_layers=2,
            pose_predictor_attn_head_dim=16, pose_predictor_attn_num_heads=2,
            pose_predictor_attn_num_layers=1)
        model = a2m.A2MModelPosePre(cfg=cfg)
        k = jax.random.PRNGKey(0)
        motion = jax.random.normal(k, (2, 4, 4, 32))
        audio = jax.random.normal(k, (2, 4, 5, 16))
        pose = jax.random.normal(k, (2, 4, 4, 8, 8))
        params = model.init({"params": k, "noise": k}, motion, motion[:, 0],
                            audio=audio, ref_audio=audio[:, 0], pose=pose,
                            ref_pose=pose[:, 0])
        ld = model.apply(params, motion, motion[:, 0], audio=audio,
                         ref_audio=audio[:, 0], pose=pose,
                         ref_pose=pose[:, 0], rngs={"noise": k})
        assert set(ld) == {"loss", "diff_loss", "pose_loss"}
        assert np.isfinite(float(ld["loss"]))
        out = a2m.sample(model, params, k, motion[:, 0], frames=4,
                         sample_step=2, audio=audio, ref_audio=audio[:, 0],
                         ref_pose=pose[:, 0])
        assert out.shape == motion.shape
        pp = model.apply(params, audio, audio[:, 0], pose[:, 0],
                         method="predict_pose")
        assert pp.shape == (2, 5, 4, 8, 8)


class TestA2MMlpGrid:
    """Legacy grid-motion variant (reference A2MModel_Mlp,
    model_A2M.py:212-385)."""

    def test_forward_and_sample(self):
        from hivae_tpu.models.a2m import A2MConfig, A2MModelMlp, sample_grid

        cfg = A2MConfig(audio_inchannel=8, audio_block=3,
                        motion_in_channel=6, motion_frames=2,
                        motion_height=4, motion_width=4,
                        image_inchannel=4, image_height=8, image_width=8,
                        image_patch_size=2, encoder_out_dim=16,
                        time_embed_dim=32, diffusion_attn_head_dim=8,
                        diffusion_attn_num_heads=2, diffusion_num_layers=2)
        m = A2MModelMlp(cfg=cfg)
        n, f = 2, 2
        motion = jax.random.normal(KEY, (n, f, 6, 4, 4))
        ref_img = jax.random.normal(KEY, (n, 4, 8, 8))
        audio = jax.random.normal(KEY, (n, f, 3, 8))
        p = m.init({"params": KEY, "noise": KEY}, motion, ref_img, audio)
        ld = m.apply(p, motion, ref_img, audio, rngs={"noise": KEY})
        assert np.isfinite(float(ld["loss"]))
        z = sample_grid(m, p, KEY, ref_img, audio, sample_step=2)
        assert z.shape == (n, f, 6, 4, 4)
        assert bool(jnp.all(jnp.isfinite(z)))
