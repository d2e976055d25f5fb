"""Torch golden parity for the joint AdaLN-Zero transformer block — the
reference's AMDTransformerBlock (modules.py:1016-1109) restated in torch and
compared end-to-end against our JointTransformerBlock with shared weights."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from hivae_tpu.models import blocks as B

import pytest
pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)


def _np(x):
    return np.asarray(x)


def _t(x):
    return torch.from_numpy(np.asarray(x))


import torch_ref as R

# one torch restatement of attention/ff/adaln lives in torch_ref — a local
# copy could silently drift from the semantics the other goldens pin
torch_attention = lambda p, x, heads, head_dim: R.attention(
    p, x, x, heads, head_dim)
torch_ff = R.ff
torch_adaln_zero = R.adaln_zero


class TestJointBlockGolden:
    def test_parity(self):
        dim, heads, head_dim = 32, 4, 8
        rng = np.random.RandomState(0)
        hidden = rng.randn(2, 6, dim).astype(np.float32)
        encoder = rng.randn(2, 10, dim).astype(np.float32)
        temb = rng.randn(2, 16).astype(np.float32)

        m = B.JointTransformerBlock(dim=dim, heads=heads, head_dim=head_dim)
        variables = m.init(KEY, jnp.asarray(hidden), jnp.asarray(encoder),
                           jnp.asarray(temb))
        out_h, out_e = m.apply(variables, jnp.asarray(hidden),
                               jnp.asarray(encoder), jnp.asarray(temb))
        p = variables["params"]

        # torch restatement of AMDTransformerBlock.forward
        ht, et, tt = _t(hidden), _t(encoder), _t(temb)
        nh, ne, gate, e_gate = torch_adaln_zero(p["norm1"], ht, et, tt, dim)
        joint = torch.cat([ne, nh], dim=1)
        attn = torch_attention(p["attn1"], joint, heads, head_dim)
        el = encoder.shape[1]
        ht = ht + gate * attn[:, el:]
        et = et + e_gate * attn[:, :el]
        nh, ne, gate, e_gate = torch_adaln_zero(p["norm2"], ht, et, tt, dim)
        joint = torch.cat([ne, nh], dim=1)
        ff = torch_ff(p["ff"], joint)
        ht = ht + gate * ff[:, el:]
        et = et + e_gate * ff[:, :el]

        np.testing.assert_allclose(_np(out_h), ht.numpy(), rtol=2e-4,
                                   atol=2e-5)
        np.testing.assert_allclose(_np(out_e), et.numpy(), rtol=2e-4,
                                   atol=2e-5)
