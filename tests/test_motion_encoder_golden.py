"""Torch golden parity for the temporal-cross camera motion encoder — the
reference's MotionEncoderLearnTokenOnlyTemporalTransformer
(transformer.py:406-586) restated in torch with shared weights."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from hivae_tpu.models.motion_encoders import MotionEncoderTemporalCross
from hivae_tpu.ops import embeddings as emb_ops

import pytest
pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)


def _t(x):
    return torch.from_numpy(np.asarray(x))


import torch_ref as R

# the single torch restatement lives in torch_ref (see
# test_joint_block_golden.py note)
attention = R.attention
ff = R.ff


def lin(p, name, x):
    return R.lin(p[name], x)


def ln(p, name, x, eps=1e-5):
    return R.ln(p[name], x, eps=eps)


class TestCameraEncoderGolden:
    def test_parity(self):
        n, t, c, hw = 2, 4, 4, 8
        heads, head_dim, layers = 2, 8, 2
        ltok, mch, patch = 4, 8, 2
        hidden = heads * head_dim
        iph = hw // patch
        s = iph * iph

        rng = np.random.RandomState(0)
        video = rng.randn(n, t, c, hw, hw).astype(np.float32)

        m = MotionEncoderTemporalCross(
            img_height=hw, img_width=hw, img_inchannel=c,
            img_patch_size=patch, motion_token_num=ltok, motion_channel=mch,
            need_norm_out=True, video_frames=t, heads=heads,
            head_dim=head_dim, num_layers=layers)
        variables = m.init(KEY, jnp.asarray(video))
        out = np.asarray(m.apply(variables, jnp.asarray(video)))
        p = variables["params"]

        # ---- torch restatement (transformer.py:495-556) ----
        x = _t(video).reshape(n * t, c, hw, hw)
        # patchify as matmul (channel-major patches, see PatchEmbed)
        xp = x.reshape(n * t, c, iph, patch, iph, patch)
        xp = xp.permute(0, 2, 4, 1, 3, 5).reshape(n * t, s, c * patch * patch)
        tok = lin(p["patch_embed"], "proj", xp)
        spos = _t(emb_ops.get_2d_sincos_pos_embed(hidden, (iph, iph)))
        tok = tok + spos[None]
        tpos = _t(emb_ops.get_1d_sincos_pos_embed(hidden, t))
        tok = tok.reshape(n, t, s, hidden) + tpos[None, :, None, :]

        mtok = _t(p["motion_token"])  # (1, ltok, mch)
        mtok = lin(p, "motion_embed", mtok)  # (1, ltok, hidden)
        mtok = mtok[None].repeat(n, s, 1, 1)  # (n, s, ltok, hidden)
        # ltok == t here so no repeat_interleave
        mtok = mtok.reshape(n * s, t, hidden) + tpos[None]

        kv = tok.permute(0, 2, 1, 3).reshape(n * s, t, hidden)
        for i in range(layers):
            bp = p[f"blocks_{i}"]
            h = ln(bp, "norm1", mtok)
            mtok = mtok + attention(bp["attn1"], h, kv, heads, head_dim)
            h = ln(bp, "norm2", mtok)
            mtok = mtok + ff(bp["ff"], h)

        mtok = ln(p, "norm_final", mtok)
        mtok = lin(p, "proj_out", mtok)
        mtok = F.layer_norm(mtok, (mch,), eps=1e-5)  # norm_out, no affine
        ref = mtok.reshape(n, s, t, mch).permute(0, 2, 1, 3).numpy()

        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
