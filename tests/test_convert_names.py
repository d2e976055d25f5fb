"""Name-mapping checks for transformer-model checkpoint conversion."""

import jax
import jax.numpy as jnp

from hivae_tpu.models.motion_encoders import MotionEncoderSpatial
from hivae_tpu.utils import torch_convert as tc

KEY = jax.random.PRNGKey(0)


class TestTransformerKeyNames:
    def test_motion_encoder_keys(self):
        m = MotionEncoderSpatial(img_height=8, img_width=8, img_patch_size=2,
                                 motion_token_num=2, motion_channel=8,
                                 heads=2, head_dim=8, num_layers=1,
                                 need_norm_out=False)
        x = jax.ShapeDtypeStruct((1, 2, 4, 8, 8), jnp.float32)
        shapes = jax.eval_shape(lambda v: m.init(KEY, v), x)
        flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
        keys = {tc.flax_path_to_torch_key(tuple(p.key for p in kp)[1:])
                for kp, _ in flat}
        expected_subset = {
            "motion_token",
            "motion_embed.weight", "motion_embed.bias",
            "patch_embed.proj.weight", "patch_embed.proj.bias",
            "transformer_blocks.0.norm1.weight",
            "transformer_blocks.0.attn1.to_q.weight",
            "transformer_blocks.0.attn1.norm_q.weight",
            "transformer_blocks.0.attn1.to_out.0.weight",
            "transformer_blocks.0.ff.net.0.proj.weight",
            "transformer_blocks.0.ff.net.2.weight",
            "norm_final.weight", "proj_out.weight",
        }
        missing = expected_subset - keys
        assert not missing, f"missing mapped keys: {sorted(missing)}"

    def test_amd_model_new_keys(self):
        """Spot-check the full AMDModelNew tree maps to reference names."""
        from hivae_tpu.models import amd

        cfg = amd.AMDConfig(
            image_height=8, image_width=8, image_patch_size=2, video_frames=2,
            use_filter=True, use_grey=True, object_motion_token_num=2,
            object_motion_token_channel=8, object_enc_num_layers=1,
            enc_nhead=2, enc_ndim=8, camera_motion_token_num=2,
            camera_motion_token_channel=8, camera_enc_num_layers=1,
            motion_token_num=2, motion_token_channel=8,
            diffusion_model_type="spatial", diffusion_attn_head_dim=8,
            diffusion_attn_num_heads=2, diffusion_num_layers=1)
        m = amd.AMDModelNew(cfg=cfg)
        v = jax.ShapeDtypeStruct((1, 2, 4, 8, 8), jnp.float32)
        shapes = jax.eval_shape(
            lambda x: m.init({"params": KEY, "noise": KEY}, x, x, x, x), v)
        flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
        keys = {tc.flax_path_to_torch_key(tuple(p.key for p in kp)[1:])
                for kp, _ in flat}
        expected_subset = {
            "camera_motion_encoder.motion_token",
            "camera_motion_encoder.transformer_blocks.0.attn1.to_q.weight",
            "object_motion_encoder.patch_embed.proj.weight",
            "object_motion_encoder.transformer_blocks.0.ff.net.0.proj.weight",
            "diffusion_transformer.time_embedding.linear_1.weight",
            "diffusion_transformer.image_patch_embed.proj.weight",
            "diffusion_transformer.camera_motion_patch_embed.weight",
            "diffusion_transformer.object_motion_patch_embed.weight",
            "diffusion_transformer.object_transformer_blocks.0.norm1.linear.weight",
            "diffusion_transformer.camera_transformer_blocks.0.attn1.norm_q.weight",
            "diffusion_transformer.spatial_blocks.0.norm1.norm.weight",
            "diffusion_transformer.source_token",
            "diffusion_transformer.norm_out.linear.weight",
            "diffusion_transformer.proj_out.weight",
        }
        missing = expected_subset - keys
        assert not missing, f"missing mapped keys: {sorted(missing)}"

    def test_lpips_key_rules(self):
        assert tc.flax_path_to_torch_key(
            ("net", "features_0", "kernel")) == "net.features.0.weight"
        assert tc.flax_path_to_torch_key(
            ("lin0", "kernel")) == "lin0.model.1.weight"

    def test_camera_down_rule(self):
        assert tc.flax_path_to_torch_key(
            ("camera_down", "conv1", "kernel")) == "camera_down.0.weight"
