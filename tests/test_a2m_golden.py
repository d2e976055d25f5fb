"""Full-model torch golden for the audio->motion head: the flax
``A2MModelCrossAttnAudio`` velocity (audio window MLP + alternating joint
self-attn / per-frame audio cross-attn blocks, reference
``model_A2M.py:875-1034`` + ``transformer.py:3137-3305``) must match an
independent torch restatement to fp32 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from hivae_tpu.models import a2m as a2m_mod
from hivae_tpu.ops import embeddings as emb_ops

import torch_ref as R

pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)

N, FRAMES, L, D = 2, 3, 2, 8
HEADS, HEAD_DIM, LAYERS = 2, 8, 2
AUD_M, AUD_D, WIN, ENC_OUT = 4, 6, 4, 16
HID = HEADS * HEAD_DIM

CFG = a2m_mod.A2MConfig(
    audio_inchannel=AUD_D, audio_block=AUD_M, motion_num_token=L,
    motion_in_channel=D, motion_frames=FRAMES, intermediate_dim=12,
    window_size=WIN, encoder_out_dim=ENC_OUT,
    diffusion_attn_head_dim=HEAD_DIM, diffusion_attn_num_heads=HEADS,
    diffusion_num_layers=LAYERS)


def audio_window_mlp(p, audio):
    n, f, m, d = audio.shape
    x = audio.reshape(n, f, m * d)
    x = F.relu(R.lin(p["ff1"], x))
    x = F.relu(R.lin(p["ff2"], x))
    x = F.relu(R.lin(p["ff3"], x))
    x = x.reshape(n, f, WIN, ENC_OUT)
    return R.ln(p["norm"], x)


def a2m_self_block(p, motion, ref, temb):
    l = ref.shape[1]
    m, r, gate, r_gate = R.adaln_zero(p["norm1"], motion, ref, temb, HID)
    joint = torch.cat([r, m], 1)
    out = R.attention(p["attn"], joint, joint, HEADS, HEAD_DIM)
    motion = motion + gate * out[:, l:]
    ref = ref + r_gate * out[:, :l]
    m, r, gate, r_gate = R.adaln_zero(p["norm2"], motion, ref, temb, HID)
    out = R.ff(p["ff"], torch.cat([r, m], 1))
    return motion + gate * out[:, l:], ref + r_gate * out[:, :l]


def a2m_cross_block(p, motion, ref, cond, temb):
    n, fl, d = motion.shape
    l = ref.shape[1]
    f1 = fl // l + 1
    if cond.dim() == 4:
        cond = cond.reshape(n * cond.shape[1], cond.shape[2], cond.shape[3])
    m, r, gate, r_gate = R.adaln_zero(p["norm1"], motion, ref, temb, HID)
    joint = torch.cat([r, m], 1).reshape(n * f1, l, d)
    out = R.attention(p["attn"], joint, cond, HEADS, HEAD_DIM, qk_norm=False)
    out = out.reshape(n, f1 * l, d)
    motion = motion + gate * out[:, l:]
    ref = ref + r_gate * out[:, :l]
    m, r, gate, r_gate = R.adaln_zero(p["norm2"], motion, ref, temb, HID)
    out = R.ff(p["ff"], torch.cat([r, m], 1))
    return motion + gate * out[:, l:], ref + r_gate * out[:, :l]


def torch_velocity(params, zt, ref_motion, audio_feat, timestep):
    dif = params["params"]["diffusion"]
    temb = R.time_embed(dif["time_embedding"], timestep, HID)
    motion = R.lin(dif["motion_patch_embed"],
                   R.t(zt).reshape(N, FRAMES * L, D).float())
    ref = R.lin(dif["refmotion_patch_embed"], R.t(ref_motion).float())
    pos = R.t(emb_ops.get_1d_sincos_pos_embed(
        HID, L + L * FRAMES)).float()[None]
    ref = ref + pos[:, :L]
    motion = motion + pos[:, L:L + FRAMES * L]
    audio = R.lin(dif["audio_embed"], audio_feat)
    for i in range(LAYERS):
        motion, ref = a2m_self_block(dif[f"motion_blocks_{i}"],
                                     motion, ref, temb)
        motion, ref = a2m_cross_block(dif[f"audio_blocks_{i}"],
                                      motion, ref, audio, temb)
    motion = R.ln(dif["norm_final"], motion)
    motion = R.adalayer_norm(dif["norm_out"], motion, temb, HID)
    motion = R.lin(dif["proj_out"], motion)
    return motion.reshape(N, FRAMES, L, D)


class TestA2MGolden:
    def test_velocity_and_audio_encoder_parity(self):
        model = a2m_mod.A2MModelCrossAttnAudio(cfg=CFG, variant="audio")
        zt = jax.random.normal(KEY, (N, FRAMES, L, D))
        ref_motion = jax.random.normal(jax.random.PRNGKey(1), (N, L, D))
        audio = jax.random.normal(jax.random.PRNGKey(2),
                                  (N, FRAMES, AUD_M, AUD_D))
        ref_audio = jax.random.normal(jax.random.PRNGKey(3),
                                      (N, AUD_M, AUD_D))
        timestep = jnp.array([250.0, 777.0])

        params = model.init(
            {"params": KEY, "noise": KEY}, zt, ref_motion,
            audio=audio, ref_audio=ref_audio, timestep=timestep.astype(int))

        cond = model.apply(params, audio=audio, ref_audio=ref_audio,
                           method="conditions")
        vel = model.apply(params, zt, ref_motion, timestep,
                          audio=cond["audio"], method="velocity")

        # torch restatement
        mix = np.concatenate([np.asarray(ref_audio)[:, None],
                              np.asarray(audio)], axis=1)
        feat = audio_window_mlp(params["params"]["audio_encoder"],
                                R.t(mix).float())
        np.testing.assert_allclose(np.asarray(cond["audio"]),
                                   feat.numpy(), rtol=2e-5, atol=2e-5)

        ref_vel = torch_velocity(params, np.asarray(zt),
                                 np.asarray(ref_motion), feat,
                                 np.asarray(timestep))
        np.testing.assert_allclose(np.asarray(vel), ref_vel.numpy(),
                                   rtol=2e-4, atol=2e-4)
