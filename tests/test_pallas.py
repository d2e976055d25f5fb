"""Pallas fused-attention kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hivae_tpu.ops import attention as A
from hivae_tpu.ops.pallas.flash_attention import flash_attention, supports

KEY = jax.random.PRNGKey(0)


class TestFusedAttention:
    @pytest.mark.parametrize("shape", [(2, 4, 64, 32), (1, 2, 260, 64)])
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

    def test_supports(self):
        assert supports((1, 2, 256, 64), (1, 2, 256, 64))
        assert not supports((1, 2, 4096, 64), (1, 2, 4096, 64))
        assert not supports((1, 2, 64, 63), (1, 2, 64, 63))
