"""Pallas fused-attention kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hivae_tpu.ops import attention as A
from hivae_tpu.ops.pallas.flash_attention import flash_attention, supports

KEY = jax.random.PRNGKey(0)


class TestFusedAttention:
    @pytest.mark.parametrize("shape", [(2, 4, 64, 32), (1, 2, 260, 64),
                                       (2, 16, 260, 64), (1, 1, 20, 8)])
    def test_matches_xla(self, shape):
        b, h, s, d = shape
        q = jax.random.normal(KEY, shape)
        k = jax.random.normal(jax.random.PRNGKey(1), shape)
        v = jax.random.normal(jax.random.PRNGKey(2), shape)
        ref = A.sdpa(q, k, v, implementation="xla")
        out = flash_attention(q, k, v, scale=d ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_cross_attention_shapes(self):
        q = jax.random.normal(KEY, (1, 2, 16, 32))
        k = jax.random.normal(KEY, (1, 2, 48, 32))
        v = jax.random.normal(KEY, (1, 2, 48, 32))
        ref = A.sdpa(q, k, v, implementation="xla")
        out = flash_attention(q, k, v, scale=32 ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_key_mask_matches_xla(self):
        b, h, s, d = 2, 4, 36, 32
        q = jax.random.normal(KEY, (b, h, s, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d))
        mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.7, (b, s))
        mask = mask.at[:, 0].set(True)  # keep >=1 key per row
        ref = A.sdpa(q, k, v, key_mask=mask, implementation="xla")
        out = A.sdpa(q, k, v, key_mask=mask, implementation="pallas")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("shape", [(1, 2, 20, 16), (1, 2, 64, 32)])
    def test_grad_matches_xla(self, shape):
        b, h, s, d = shape
        q = jax.random.normal(KEY, shape)
        k = jax.random.normal(jax.random.PRNGKey(1), shape)
        v = jax.random.normal(jax.random.PRNGKey(2), shape)

        def loss(fn, q, k, v):
            return jnp.sum(jnp.sin(fn(q, k, v)))

        ref_fn = lambda q, k, v: A.sdpa(q, k, v, implementation="xla")
        pal_fn = lambda q, k, v: flash_attention(q, k, v, scale=d ** -0.5)
        g_ref = jax.grad(lambda *a: loss(ref_fn, *a), argnums=(0, 1, 2))(
            q, k, v)
        g_pal = jax.grad(lambda *a: loss(pal_fn, *a), argnums=(0, 1, 2))(
            q, k, v)
        for a, b_ in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       rtol=5e-3, atol=5e-3)

    def test_grad_with_mask(self):
        b, h, s, d = 1, 2, 20, 16
        q = jax.random.normal(KEY, (b, h, s, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d))
        mask = jnp.ones((b, s), bool).at[:, -5:].set(False)

        def loss(impl, q, k, v):
            return jnp.sum(
                jnp.sin(A.sdpa(q, k, v, key_mask=mask, implementation=impl)))

        g_ref = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2))(
            q, k, v)
        g_pal = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2))(
            q, k, v)
        for a, b_ in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       rtol=5e-3, atol=5e-3)

    def test_supports(self):
        assert supports((1, 2, 256, 64), (1, 2, 256, 64))
        assert not supports((1, 2, 4096, 64), (1, 2, 4096, 64))
        assert not supports((1, 2, 64, 63), (1, 2, 64, 63))


class TestAutoDispatch:
    def test_crossover_selection(self, monkeypatch):
        calls = []
        import hivae_tpu.ops.pallas.flash_attention as FA

        real = FA.flash_attention

        def spy(q, k, v, **kw):
            calls.append(q.shape)
            return real(q, k, v, **kw)

        monkeypatch.setattr(FA, "flash_attention", spy)

        short = jax.random.normal(KEY, (1, 2, 64, 32))
        A.sdpa(short, short, short, implementation="auto")
        assert calls == []  # below the crossover -> XLA

        long_ = jax.random.normal(KEY, (1, 2, 768, 32))
        A.sdpa(long_, long_, long_, implementation="auto")
        assert calls and calls[0][2] == 768  # above -> Pallas

    def test_auto_falls_back_when_unsupported(self, monkeypatch):
        import hivae_tpu.ops.pallas.flash_attention as FA

        def boom(*a, **kw):
            raise AssertionError("pallas should not be called")

        monkeypatch.setattr(FA, "flash_attention", boom)
        # d=512 at 1024 tokens overflows the hb=1 VMEM budget -> XLA path
        x = jax.random.normal(KEY, (1, 1, 1024, 512))
        out = A.sdpa(x, x, x, implementation="auto")
        assert out.shape == x.shape
