"""Ring attention vs full attention on the fake 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hivae_tpu.ops import attention as A
from hivae_tpu.parallel import create_mesh
from hivae_tpu.parallel.ring_attention import sequence_sharded_sdpa


class TestRingAttention:
    @pytest.mark.parametrize("shape", [(2, 4, 64, 32), (1, 2, 128, 16)])
    def test_matches_full_attention(self, shape):
        mesh = create_mesh((1, 1, 8))
        b, h, s, d = shape
        q = jax.random.normal(jax.random.PRNGKey(0), shape)
        k = jax.random.normal(jax.random.PRNGKey(1), shape)
        v = jax.random.normal(jax.random.PRNGKey(2), shape)
        ref = A.sdpa(q, k, v, implementation="xla")
        with mesh:
            out = sequence_sharded_sdpa(q, k, v, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_gradients_match(self):
        """Autodiff through the ring matches full-attention gradients."""
        mesh = create_mesh((1, 1, 8))
        shape = (1, 2, 64, 16)
        q = jax.random.normal(jax.random.PRNGKey(0), shape)
        k = jax.random.normal(jax.random.PRNGKey(1), shape)
        v = jax.random.normal(jax.random.PRNGKey(2), shape)

        def loss_ring(q, k, v):
            with mesh:
                return jnp.sum(jnp.square(sequence_sharded_sdpa(q, k, v, mesh)))

        def loss_full(q, k, v):
            return jnp.sum(jnp.square(A.sdpa(q, k, v, implementation="xla")))

        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
        for gr, gf in zip(g_ring, g_full):
            np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                       rtol=5e-4, atol=5e-4)

    def test_two_device_axis(self):
        mesh = create_mesh((4, 1, 2))
        shape = (2, 2, 32, 16)
        q = jax.random.normal(jax.random.PRNGKey(0), shape)
        k = jax.random.normal(jax.random.PRNGKey(1), shape)
        v = jax.random.normal(jax.random.PRNGKey(2), shape)
        ref = A.sdpa(q, k, v, implementation="xla")
        with mesh:
            out = sequence_sharded_sdpa(q, k, v, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
