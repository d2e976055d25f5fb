"""Torch golden for the label->motion head (reference
``text2motion/t2m_model.py:17-490``): the flax
``Label2MotionDiffusionDecoder`` forward (label+time embedding, RF noising,
alignment tokens, per-layer motion DiT block + joint [motion|image] DiT
block, split camera/object heads) must match an independent torch
restatement to fp32 tolerance. The reference's frame-major
``emb.repeat(t,1)`` broadcast quirk is reproduced deliberately."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import torch_ref as R
from hivae_tpu.models import t2m as t2m_mod
from hivae_tpu.ops import embeddings as emb_ops

pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)

N, T = 2, 3
HEADS, HEAD_DIM, LAYERS = 2, 8, 2
HID = HEADS * HEAD_DIM
HI = WI = 8
PATCH = 2
CAM_S, CAM_C = 4, 8        # camera token num / channel
OBJ_L, OBJ_C = 3, 16       # object token num / channel
TED = 24                   # time_embed_dim (sinusoid dim)

CFG = t2m_mod.T2MConfig(
    label_dim=12, num_classes=5, motion_dim=OBJ_C,
    refimg_width=WI, refimg_height=HI, refimg_patch_size=PATCH,
    refimg_dim=4, num_frames=T, time_embed_dim=TED,
    attention_head_dim=HEAD_DIM, num_attention_heads=HEADS,
    num_layers=LAYERS, camera_token_num=CAM_S, object_token_num=OBJ_L,
    camera_channel=CAM_C, object_channel=OBJ_C)


def mlp(p, x):
    return R.lin(p["fc2"], F.gelu(R.lin(p["fc1"], x)))


def torch_t2m(p, cam_tgt, obj_tgt, label_idx, ref_img, timestep, noise):
    img = R.patchify(p["patch_embed"],
                     R.t(ref_img).float().reshape(N * T, 4, HI, WI), PATCH)
    img = img + R.t(emb_ops.get_2d_sincos_pos_embed(
        HID, (HI // PATCH, WI // PATCH))).float()[None]

    label = R.t(p["label_embedding"]).float()[R.t(label_idx).long()]
    label_emb = mlp(p["label_proj_in"], label)
    temb = R.time_embed(p["time_embedding"], np.asarray(timestep), TED)
    emb = (temb + label_emb).repeat(T, 1)  # frame-major, as the reference

    cam = R.t(cam_tgt).float().reshape(-1, CAM_S, CAM_C)
    cam = R.lin(p["camera_proj_in"], cam)

    ts = R.t(np.asarray(timestep)).float()
    step = (1.0 - ts / CFG.num_steps)[:, None, None].repeat(T, 1, 1)
    obj = R.t(obj_tgt).float()
    nz = R.t(noise).float()
    obj_zt = step * obj + (1 - step) * nz
    vel_gt = obj - nz

    bo = obj_zt.shape[0]
    align_c = R.t(p["motion_align_c"]).float()[None].expand(bo, -1, -1)
    align_o = R.t(p["motion_align_o"]).float()[None].expand(bo, -1, -1)
    motion = torch.cat([obj_zt, align_c, cam], dim=1)
    x = mlp(p["motion_proj_in"], motion)
    msl = x.shape[1]

    for i in range(LAYERS):
        x = R.dit_block(p[f"motion_blocks_{i}"], x, emb, HEADS, HEAD_DIM, HID)
        joint = torch.cat([x, img], dim=1)
        joint = R.dit_block(p[f"image_blocks_{i}"], joint, emb, HEADS,
                            HEAD_DIM, HID)
        x = joint[:, :msl]

    x = R.ln(p["norm_final"], x)
    x = R.lin(p["proj_out"], x)
    vel_pred_object = x[:, :OBJ_L]
    vel_pred_camera = R.lin(p["camera_proj_out"], x[:, OBJ_L + 1:])
    return vel_pred_object, vel_pred_camera, vel_gt


class TestT2MGolden:
    def test_forward_parity(self):
        model = t2m_mod.Label2MotionDiffusionDecoder(cfg=CFG)
        cam_tgt = jax.random.normal(KEY, (N, T, CAM_S, CAM_C))
        obj_tgt = jax.random.normal(jax.random.PRNGKey(1),
                                    (N * T, OBJ_L, OBJ_C))
        ref_img = jax.random.normal(jax.random.PRNGKey(2), (N, T, 4, HI, WI))
        noise = jax.random.normal(jax.random.PRNGKey(3), obj_tgt.shape)
        label = jnp.array([1, 4])
        timestep = jnp.array([200.0, 800.0])

        params = model.init({"params": KEY, "noise": KEY},
                            cam_tgt, obj_tgt, label, ref_img, timestep,
                            noise=noise)
        out = model.apply(params, cam_tgt, obj_tgt, label, ref_img, timestep,
                          noise=noise)

        po, pc, gt = torch_t2m(params["params"], cam_tgt, obj_tgt, label,
                               ref_img, timestep, noise)
        np.testing.assert_allclose(np.asarray(out["vel_gt_object"]),
                                   gt.numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["vel_pred_object"]),
                                   po.numpy(), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(out["vel_pred_camera"]),
                                   pc.numpy(), rtol=2e-4, atol=2e-4)
