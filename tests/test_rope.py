"""RoPE op tests: parity with a complex-arithmetic restatement of the
reference semantics (reference ``model/attention.py:20-117``) plus the
relative-position invariant."""

import jax
import jax.numpy as jnp
import numpy as np

from hivae_tpu.ops import rope


def _reference_rotate(x, seq_len, dim, base=10000.0):
    """Complex-multiply restatement of the reference apply_rotary_emb."""
    i = np.arange(1, dim // 2 + 1, dtype=np.float64)
    theta = base ** (-2.0 * (i - 1.0) / dim)
    freqs = np.exp(1j * np.outer(np.arange(seq_len), theta))
    xc = x.reshape(x.shape[:-1] + (-1, 2))
    xc = xc[..., 0] + 1j * xc[..., 1]
    out = xc * freqs[None, :, None, :]
    return np.stack([out.real, out.imag], axis=-1).reshape(x.shape)


class TestRope:
    def test_matches_complex_reference(self):
        b, s, h, d = 2, 7, 3, 16
        x = np.random.RandomState(0).randn(b, s, h, d).astype(np.float32)
        cos, sin = rope.precompute_freqs_cis(d, s)
        got, _ = rope.apply_rotary_emb(jnp.asarray(x), jnp.asarray(x),
                                       cos, sin)
        want = _reference_rotate(x.astype(np.float64), s, d)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_norm_preserved(self):
        x = jnp.asarray(np.random.RandomState(1).randn(1, 9, 2, 32),
                        jnp.float32)
        cos, sin = rope.precompute_freqs_cis(32, 9)
        r, _ = rope.apply_rotary_emb(x, x, cos, sin)
        np.testing.assert_allclose(jnp.linalg.norm(r, axis=-1),
                                   jnp.linalg.norm(x, axis=-1), rtol=1e-5)

    def test_relative_position_property(self):
        # q_m . k_n must depend only on (m - n)
        d, s = 8, 6
        rs = np.random.RandomState(2)
        q1 = jnp.asarray(np.tile(rs.randn(1, 1, 1, d), (1, s, 1, 1)),
                         jnp.float32)
        k1 = jnp.asarray(np.tile(rs.randn(1, 1, 1, d), (1, s, 1, 1)),
                         jnp.float32)
        cos, sin = rope.precompute_freqs_cis(d, s)
        rq, rk = rope.apply_rotary_emb(q1, k1, cos, sin)
        dots = np.asarray(jnp.einsum("bshd,bthd->st", rq, rk))
        for delta in range(1, s - 1):
            diag = np.diagonal(dots, offset=delta)
            np.testing.assert_allclose(diag, diag[0] * np.ones_like(diag),
                                       atol=1e-4)

    def test_rope_attention_shape(self):
        x = jnp.asarray(np.random.RandomState(3).randn(2, 5, 4, 16),
                        jnp.float32)
        out = rope.rope_attention(x, x, x)
        assert out.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(out)))
