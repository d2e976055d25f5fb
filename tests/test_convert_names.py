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

    def test_lpips_key_rules(self):
        assert tc.flax_path_to_torch_key(
            ("net", "features_0", "kernel")) == "net.features.0.weight"
        assert tc.flax_path_to_torch_key(
            ("lin0", "kernel")) == "lin0.model.1.weight"

    def test_camera_down_rule(self):
        assert tc.flax_path_to_torch_key(
            ("camera_down", "conv1", "kernel")) == "camera_down.0.weight"
