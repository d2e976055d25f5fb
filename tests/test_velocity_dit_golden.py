"""Torch golden for the main VelocityDiT family (reference
``AMDDiffusionTransformerModel:1014-1259``): both the 'plus' motion path
(summed camera+object tokens) and the 'decouple' layer-ranged injection
(camera drives layers [0, camera_layers), object drives [object_from, L) —
reference ``transformer.py:1206-1236``) must match an independent torch
restatement to fp32 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_ref as R
from hivae_tpu.models.dit import VelocityDiT
from hivae_tpu.ops import embeddings as emb_ops

pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)

N, L, D = 2, 3, 8
HEADS, HEAD_DIM, LAYERS = 2, 8, 4
HID = HEADS * HEAD_DIM
HI = WI = 8
PATCH = 2
CAMERA_LAYERS, OBJECT_FROM = 2, 1


def _mk(seed, *shape):
    return jax.random.normal(jax.random.PRNGKey(seed), shape)


def torch_velocity_dit(p, image_hidden, timestep, cam_src, cam_tgt,
                       obj_src, obj_tgt, motion_type):
    msl = 2 * L + 2
    emb = R.time_embed(p["time_embedding"], np.asarray(timestep), HID)
    img = R.patchify(p["image_patch_embed"], R.t(image_hidden).float(), PATCH)
    img = img + R.t(emb_ops.get_2d_sincos_pos_embed(
        HID, (HI // PATCH, WI // PATCH))).float()[None]
    mpos = R.t(emb_ops.get_1d_sincos_pos_embed(HID, msl)).float()[None]
    me = lambda x: R.lin(p["motion_patch_embed"], R.t(x).float())
    src_tok = R.t(p["source_token"]).float().expand(N, -1, -1)
    tgt_tok = R.t(p["target_token"]).float().expand(N, -1, -1)

    def blocks(rng, motion, img):
        for i in rng:
            motion, img = R.joint_block(p[f"blocks_{i}"], motion, img, emb,
                                        HEADS, HEAD_DIM, HID)
        return motion, img

    if motion_type == "plus":
        src = me(np.asarray(cam_src) + np.asarray(obj_src))
        tgt = me(np.asarray(cam_tgt) + np.asarray(obj_tgt))
        motion = torch.cat([src_tok, src, tgt_tok, tgt], 1) + mpos
        motion, img = blocks(range(LAYERS), motion, img)
    else:
        cam = torch.cat([src_tok, me(cam_src), tgt_tok, me(cam_tgt)], 1)
        cam = cam + mpos
        o_src = me(obj_src) + mpos[:, 1:L + 1]
        o_tgt = o_src + mpos[:, L + 2:msl]  # reference reuses obj_src
        motion, img = blocks(range(CAMERA_LAYERS), cam, img)
        s_tok, t_tok = motion[:, 0:1], motion[:, L + 1:L + 2]
        motion = torch.cat([s_tok, o_src, t_tok, o_tgt], 1)
        motion, img = blocks(range(OBJECT_FROM, LAYERS), motion, img)

    x = R.ln(p["norm_final"], img)
    x = R.adalayer_norm(p["norm_out"], x, emb, HID)
    x = R.lin(p["proj_out"], x)
    return R.unpatchify(x, HI, WI, PATCH, 4)


class TestVelocityDiTGolden:
    @pytest.mark.parametrize("motion_type", ["plus", "decouple"])
    def test_velocity_parity(self, motion_type):
        model = VelocityDiT(
            heads=HEADS, head_dim=HEAD_DIM, out_channels=4,
            num_layers=LAYERS, image_height=HI, image_width=WI,
            image_patch_size=PATCH, image_in_channels=8,
            motion_token_num=L, motion_in_channels=D,
            motion_type=motion_type, camera_layers=CAMERA_LAYERS,
            object_from=OBJECT_FROM)

        img = _mk(1, N, 8, HI, WI)
        cam_src, cam_tgt = _mk(2, N, L, D), _mk(3, N, L, D)
        obj_src, obj_tgt = _mk(4, N, L, D), _mk(5, N, L, D)
        timestep = jnp.array([100.0, 900.0])

        params = model.init(KEY, cam_tgt, img, timestep,
                            camera_motion_source=cam_src,
                            object_motion_source=obj_src,
                            object_motion_target=obj_tgt)
        out = model.apply(params, cam_tgt, img, timestep,
                          camera_motion_source=cam_src,
                          object_motion_source=obj_src,
                          object_motion_target=obj_tgt)

        ref = torch_velocity_dit(params["params"], np.asarray(img), timestep,
                                 cam_src, cam_tgt, obj_src, obj_tgt,
                                 motion_type)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   rtol=2e-4, atol=2e-4)
