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
        # long sequences are handled by the streaming schedule now
        assert supports((1, 2, 4096, 64), (1, 2, 4096, 64))
        assert supports((1, 2, 2048, 512), (1, 2, 2048, 512))
        # misaligned head dim remains unsupported
        assert not supports((1, 2, 64, 63), (1, 2, 64, 63))

    def test_full_block_ceiling(self):
        from hivae_tpu.ops.pallas.flash_attention import _full_block_fits

        assert _full_block_fits((1, 2, 1024, 64), (1, 2, 1024, 64))
        assert not _full_block_fits((1, 2, 2048, 64), (1, 2, 2048, 64))


class TestStreamingSchedule:
    """KV-blocked online-softmax schedule (S > 1024). Multi-block behavior
    is exercised cheaply by shrinking the block constants so interpret mode
    stays fast."""

    def _fa(self, monkeypatch, bq, bk):
        import hivae_tpu.ops.pallas.flash_attention as FA

        monkeypatch.setattr(FA, "_BQ", bq)
        monkeypatch.setattr(FA, "_BK", bk)
        return FA

    @pytest.mark.parametrize("shape,blocks", [
        ((1, 2, 200, 32), (64, 64)),    # 4x4 kv grid, ragged tail
        ((2, 2, 128, 16), (32, 64)),    # uneven bq/bk
        ((1, 4, 160, 96), (64, 64)),    # AMD_L head_dim=96, hb>1
    ])
    def test_streaming_matches_xla(self, monkeypatch, shape, blocks):
        FA = self._fa(monkeypatch, *blocks)
        b, h, s, d = shape
        q = jax.random.normal(KEY, shape)
        k = jax.random.normal(jax.random.PRNGKey(1), shape)
        v = jax.random.normal(jax.random.PRNGKey(2), shape)
        ref = A.sdpa(q, k, v, implementation="xla")
        bias = jnp.zeros((b, s), jnp.float32)
        out = FA._flash_stream(q, k, v, bias, d ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_streaming_key_mask(self, monkeypatch):
        FA = self._fa(monkeypatch, 64, 64)
        b, h, s, d = 2, 2, 150, 32
        q = jax.random.normal(KEY, (b, h, s, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d))
        mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.7, (b, s))
        mask = mask.at[:, 0].set(True)
        ref = A.sdpa(q, k, v, key_mask=mask, implementation="xla")
        bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
        out = FA._flash_stream(q, k, v, bias, d ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_streaming_grad_matches_xla(self, monkeypatch):
        FA = self._fa(monkeypatch, 64, 64)
        b, h, s, d = 1, 2, 200, 16
        q = jax.random.normal(KEY, (b, h, s, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d))
        mask = jnp.ones((b, s), bool).at[:, -37:].set(False)
        bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)

        def loss_stream(q, k, v):
            return jnp.sum(jnp.sin(FA._flash_stream(q, k, v, bias,
                                                    d ** -0.5)))

        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(
                A.sdpa(q, k, v, key_mask=mask, implementation="xla")))

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        g_str = jax.grad(loss_stream, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g_ref, g_str):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       rtol=5e-3, atol=5e-3)

    def test_dispatch_uses_streaming_past_full_block(self):
        """flash_attention at 2048 tokens must route to the streaming
        schedule (supports() no longer bails to XLA there)."""
        b, h, s, d = 1, 1, 2048, 32
        q = jax.random.normal(KEY, (b, h, s, d), jnp.float32)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d))
        ref = A.sdpa(q, k, v, implementation="xla")
        out = A.sdpa(q, k, v, implementation="pallas")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)


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

    def test_in_program_crossover_boundary(self, monkeypatch):
        """The 'auto' threshold is the IN-PROGRAM crossover (256^2 logits,
        bench_fwd_breakdown round 5): the flagship's S=260 joint blocks
        must dispatch Pallas; S=256 and below stays XLA."""
        calls = []
        import hivae_tpu.ops.pallas.flash_attention as FA

        real = FA.flash_attention
        monkeypatch.setattr(
            FA, "flash_attention",
            lambda q, k, v, **kw: calls.append(q.shape) or real(q, k, v, **kw))

        at256 = jax.random.normal(KEY, (1, 2, 256, 32))
        A.sdpa(at256, at256, at256, implementation="auto")
        assert calls == []

        joint = jax.random.normal(KEY, (1, 2, 260, 32))
        A.sdpa(joint, joint, joint, implementation="auto")
        assert calls and calls[0][2] == 260

    def test_auto_falls_back_when_unsupported(self, monkeypatch):
        import hivae_tpu.ops.pallas.flash_attention as FA

        def boom(*a, **kw):
            raise AssertionError("pallas should not be called")

        monkeypatch.setattr(FA, "flash_attention", boom)
        # misaligned head dim is the one remaining unsupported case -> XLA
        x = jax.random.normal(KEY, (1, 1, 768, 60))
        out = A.sdpa(x, x, x, implementation="auto")
        assert out.shape == x.shape
