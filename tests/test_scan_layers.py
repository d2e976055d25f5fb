"""Scanned-layer DiT: math equivalence with the unrolled layout via the
checkpoint converter (unrolled params -> torch keys -> stacked params)."""

import numpy as np
import jax
import jax.numpy as jnp

from hivae_tpu.models import amd
from hivae_tpu.utils import torch_convert as tc

import pytest
pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)

CFG = dict(image_height=16, image_width=16, video_frames=4,
           use_filter=True, use_grey=True,
           object_motion_token_num=4, object_motion_token_channel=32,
           object_enc_num_layers=1, enc_nhead=2, enc_ndim=16,
           camera_motion_token_num=4, camera_motion_token_channel=16,
           camera_enc_num_layers=1, motion_token_num=4,
           motion_token_channel=32, diffusion_model_type="spatial",
           diffusion_attn_head_dim=16, diffusion_attn_num_heads=4,
           diffusion_num_layers=2)


def _to_torch_state(params):
    state = {}
    for kp, val in jax.tree_util.tree_flatten_with_path(params)[0]:
        path = tuple(p.key for p in kp)
        v = np.asarray(val)
        if path[-1] == "kernel":
            v = v.T if v.ndim == 2 else np.transpose(v, (3, 2, 0, 1))
        state[tc.flax_path_to_torch_key(path[1:])] = v
    return state


class TestScanEquivalence:
    def test_scan_matches_unrolled_through_converter(self):
        video = jax.random.normal(KEY, (2, 4, 4, 16, 16))
        ref = jnp.broadcast_to(video[:, :1], video.shape)

        unrolled = amd.AMDModelNew(cfg=amd.AMDConfig(**CFG))
        u_params = unrolled.init({"params": KEY, "noise": KEY},
                                 video, ref, video, ref)
        torch_state = _to_torch_state(u_params)

        scanned = amd.AMDModelNew(cfg=amd.AMDConfig(scan_layers=True, **CFG))
        s_template = scanned.init({"params": KEY, "noise": KEY},
                                  video, ref, video, ref)
        s_params, report = tc.convert_torch_state(s_template, torch_state)
        assert not report["missing"], report["missing"][:5]

        nkey = jax.random.PRNGKey(7)
        pre_u, vel_u, _ = unrolled.apply(u_params, video, ref, video, ref,
                                         rngs={"noise": nkey})
        pre_s, vel_s, _ = scanned.apply(s_params, video, ref, video, ref,
                                        rngs={"noise": nkey})
        np.testing.assert_allclose(np.asarray(pre_s), np.asarray(pre_u),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(vel_s), np.asarray(vel_u),
                                   rtol=1e-4, atol=1e-5)
