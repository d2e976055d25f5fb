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


def torch_attention(p, x, heads, head_dim, eps=1e-6):
    b, s, _ = x.shape

    def lin(name, inp):
        return inp @ _t(p[name]["kernel"]) + _t(p[name]["bias"])

    q = lin("to_q", x).view(b, s, heads, head_dim).transpose(1, 2)
    k = lin("to_k", x).view(b, s, heads, head_dim).transpose(1, 2)
    v = lin("to_v", x).view(b, s, heads, head_dim).transpose(1, 2)
    q = F.layer_norm(q, (head_dim,), _t(p["norm_q"]["scale"]),
                     _t(p["norm_q"]["bias"]), eps=eps)
    k = F.layer_norm(k, (head_dim,), _t(p["norm_k"]["scale"]),
                     _t(p["norm_k"]["bias"]), eps=eps)
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.transpose(1, 2).reshape(b, s, heads * head_dim)
    return lin("to_out", o)


def torch_ff(p, x):
    h = x @ _t(p["net_0"]["kernel"]) + _t(p["net_0"]["bias"])
    h = F.gelu(h, approximate="tanh")
    return h @ _t(p["net_2"]["kernel"]) + _t(p["net_2"]["bias"])


def torch_adaln_zero(p, hidden, encoder, temb, dim):
    mods = F.silu(temb) @ _t(p["linear"]["kernel"]) + _t(p["linear"]["bias"])
    shift, scale, gate, e_shift, e_scale, e_gate = mods.chunk(6, dim=1)
    w, bias = _t(p["norm"]["scale"]), _t(p["norm"]["bias"])
    hidden = F.layer_norm(hidden, (dim,), w, bias, eps=1e-5) * \
        (1 + scale[:, None]) + shift[:, None]
    encoder = F.layer_norm(encoder, (dim,), w, bias, eps=1e-5) * \
        (1 + e_scale[:, None]) + e_shift[:, None]
    return hidden, encoder, gate[:, None], e_gate[:, None]


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
