"""remat_policy='dots' must change memory behavior only — outputs and grads
stay identical to the 'full' remat and the no-remat baseline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hivae_tpu.models import amd

pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)

CFG = dict(image_height=8, image_width=8, video_frames=4,
           use_filter=True, use_grey=True,
           object_motion_token_num=2, object_motion_token_channel=32,
           object_enc_num_layers=1, enc_nhead=2, enc_ndim=16,
           camera_motion_token_num=4, camera_motion_token_channel=16,
           camera_enc_num_layers=1, motion_token_num=2,
           motion_token_channel=32, diffusion_model_type="spatial",
           diffusion_attn_head_dim=16, diffusion_attn_num_heads=2,
           diffusion_num_layers=2)


def _loss_and_grad(model, params, video, ref):
    def loss(p):
        _, _, d = model.apply(p, video, ref, video, ref,
                              rngs={"noise": jax.random.PRNGKey(7)})
        return d["loss"]

    return loss(params), jax.grad(loss)(params)


@pytest.mark.parametrize("policy", ["full", "dots", "dots_sans_ffn"])
def test_remat_policy_matches_no_remat(policy):
    video = jax.random.normal(KEY, (1, 4, 4, 8, 8))
    ref = jnp.broadcast_to(video[:, :1], video.shape)

    base = amd.AMDModelNew(cfg=amd.AMDConfig(**CFG))
    params = base.init({"params": KEY, "noise": KEY}, video, ref, video, ref)

    l0, g0 = _loss_and_grad(base, params, video, ref)
    rem = amd.AMDModelNew(cfg=amd.AMDConfig(remat=True, remat_policy=policy,
                                            **CFG))
    l1, g1 = _loss_and_grad(rem, params, video, ref)

    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    a = jax.tree.leaves(g0)
    b = jax.tree.leaves(g1)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-5, atol=1e-6)
