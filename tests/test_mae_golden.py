"""Torch golden for the MAE ViT (reference ``model/model_MAE.py:32-355``):
the mask_ratio=0 reconstruct path (patchify + cls + ViT encoder + decoder
with restored order) must match an independent torch restatement. With no
masking the internal random shuffle is a pure permutation that the decoder
restores, and the transformer is permutation-equivariant, so the torch
restatement runs in natural order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import torch_ref as R
from hivae_tpu.models import mae as mae_mod
from hivae_tpu.ops import embeddings as emb_ops

pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)

N = 2
HI = WI = 8
PATCH = 2
DIM, DEPTH, HEADS = 32, 2, 2
DDIM, DDEPTH, DHEADS = 24, 2, 2


def vit_block(p, x, heads, dim):
    h = R.ln(p["norm1"], x, eps=1e-6)
    x = x + R.attention(p["attn"], h, h, heads, dim // heads, qk_norm=False)
    h = R.ln(p["norm2"], x, eps=1e-6)
    h = F.gelu(R.lin(p["mlp_fc1"], h))
    return x + R.lin(p["mlp_fc2"], h)


def torch_mae_reconstruct(p, imgs):
    gh, gw = HI // PATCH, WI // PATCH
    x = R.patchify(p["patch_embed"], R.t(imgs).float(), PATCH)
    pos = R.t(np.concatenate(
        [np.zeros((1, DIM), np.float32),
         emb_ops.get_2d_sincos_pos_embed(DIM, (gh, gw))], 0)).float()
    x = x + pos[None, 1:]
    cls = R.t(p["cls_token"]).float() + pos[None, :1]
    x = torch.cat([cls.expand(N, -1, -1), x], dim=1)
    for i in range(DEPTH):
        x = vit_block(p[f"blocks_{i}"], x, HEADS, DIM)
    x = R.ln(p["norm"], x, eps=1e-6)

    x = R.lin(p["decoder_embed"], x)
    dpos = R.t(np.concatenate(
        [np.zeros((1, DDIM), np.float32),
         emb_ops.get_2d_sincos_pos_embed(DDIM, (gh, gw))], 0)).float()
    x = x + dpos[None]
    for i in range(DDEPTH):
        x = vit_block(p[f"decoder_blocks_{i}"], x, DHEADS, DDIM)
    x = R.ln(p["decoder_norm"], x, eps=1e-6)
    pred = R.lin(p["decoder_pred"], x)[:, 1:]
    # MAE unpatchify (n h w p p c layout)
    n, s, d = pred.shape
    c = d // (PATCH * PATCH)
    x = pred.reshape(n, gh, gw, PATCH, PATCH, c).permute(0, 5, 1, 3, 2, 4)
    return x.reshape(n, c, gh * PATCH, gw * PATCH)


class TestMAEGolden:
    def test_reconstruct_parity(self):
        model = mae_mod.MaskedAutoencoderViT(
            img_size=(HI, WI), patch_size=PATCH, in_chans=4,
            embed_dim=DIM, depth=DEPTH, num_heads=HEADS,
            decoder_embed_dim=DDIM, decoder_depth=DDEPTH,
            decoder_num_heads=DHEADS)
        imgs = jax.random.normal(KEY, (N, 4, HI, WI))
        params = model.init({"params": KEY, "mask": KEY}, imgs)
        out = model.apply(params, imgs, rngs={"mask": jax.random.PRNGKey(5)},
                          method="reconstruct")
        ref = torch_mae_reconstruct(params["params"], imgs)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   rtol=2e-4, atol=2e-4)
