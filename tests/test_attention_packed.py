"""Head-packed small-S attention: parity with the naive XLA path.

The per-pixel temporal blocks run attention at S = frames with B*H in the
thousands; XLA's batched tiny matmuls measured ~12 ms of the flagship's
39.4 ms velocity forward (benchmarks/bench_fwd_breakdown.py). The packed
path groups G heads into one (G*S, D) block behind a block-diagonal mask —
these tests pin exact-math parity (forward, masked, gradients, degenerate
fully-masked rows) and the dispatch predicate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hivae_tpu.ops import attention as A


def _qkv(key, b, h, s, d, sk=None, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, h, s, d), dtype)
    k = jax.random.normal(ks[1], (b, h, sk or s, d), dtype)
    v = jax.random.normal(ks[2], (b, h, sk or s, d), dtype)
    return q, k, v


class TestPackPredicate:
    def test_packs_tiny_s_large_bh(self):
        assert A._pack_group((256, 16, 16, 64), (256, 16, 16, 64)) == 8

    def test_no_pack_large_s(self):
        assert A._pack_group((16, 16, 266, 64), (16, 16, 266, 64)) == 1

    def test_no_pack_small_bh(self):
        assert A._pack_group((2, 4, 16, 64), (2, 4, 16, 64)) == 1

    def test_group_divides_bh(self):
        # bh = 96 = 2^5 * 3: cap 8 but largest pow2 divisor path
        g = A._pack_group((6, 16, 16, 64), (6, 16, 16, 64))
        assert g >= 2 and (6 * 16) % g == 0

    def test_cross_attention_shapes(self):
        # Sq=4 motion queries vs Sk=17 temporal keys (camera encoder shape)
        g = A._pack_group((64, 8, 4, 64), (64, 8, 17, 64))
        assert g >= 2 and g * 17 <= A._PACK_LEN


class TestPackedParity:
    @pytest.mark.parametrize("b,h,s,d", [(16, 8, 16, 32), (64, 4, 16, 64),
                                         (32, 4, 8, 16)])
    def test_forward_matches_naive(self, b, h, s, d):
        q, k, v = _qkv(jax.random.PRNGKey(0), b, h, s, d)
        g = A._pack_group(q.shape, k.shape)
        assert g > 1
        ref = A._sdpa_xla(q, k, v, s ** -0.5)
        out = A._sdpa_xla_packed(q, k, v, s ** -0.5, None, g)
        # same math; tolerance covers fp32 summation-order/fma differences
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_cross_attention_matches(self):
        q, k, v = _qkv(jax.random.PRNGKey(1), 32, 8, 4, 32, sk=17)
        g = A._pack_group(q.shape, k.shape)
        assert g > 1
        ref = A._sdpa_xla(q, k, v, 0.2)
        out = A._sdpa_xla_packed(q, k, v, 0.2, None, g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-6, atol=2e-6)

    def test_masked_matches(self):
        b, h, s, d = 32, 4, 16, 32
        q, k, v = _qkv(jax.random.PRNGKey(2), b, h, s, d)
        mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.7, (b, s))
        g = A._pack_group(q.shape, k.shape)
        ref = A._sdpa_xla(q, k, v, s ** -0.5, mask)
        out = A._sdpa_xla_packed(q, k, v, s ** -0.5, mask, g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-6, atol=2e-6)

    def test_fully_masked_row_degenerates_identically(self):
        """A row whose keys are ALL masked must give the same (uniform over
        its own block) output as the naive path — the off-block bias sits
        strictly below the key-mask value to guarantee it."""
        b, h, s, d = 16, 4, 16, 16
        q, k, v = _qkv(jax.random.PRNGKey(4), b, h, s, d)
        mask = jnp.ones((b, s), bool).at[3].set(False)  # row 3 fully masked
        g = A._pack_group(q.shape, k.shape)
        ref = A._sdpa_xla(q, k, v, s ** -0.5, mask)
        out = A._sdpa_xla_packed(q, k, v, s ** -0.5, mask, g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-6, atol=2e-6)

    def test_gradients_match(self):
        b, h, s, d = 16, 8, 16, 32
        q, k, v = _qkv(jax.random.PRNGKey(5), b, h, s, d)
        g = A._pack_group(q.shape, k.shape)

        def loss(fn, *a):
            return jnp.sum(jnp.sin(fn(*a)))

        gr = jax.grad(lambda q, k, v: loss(
            A._sdpa_xla, q, k, v, s ** -0.5), argnums=(0, 1, 2))(q, k, v)
        gp = jax.grad(lambda q, k, v: loss(
            A._sdpa_xla_packed, q, k, v, s ** -0.5, None, g),
            argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gr, gp):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       rtol=5e-6, atol=5e-6)

    def test_sdpa_auto_routes_packed(self, monkeypatch):
        """'auto' must actually ROUTE tiny-S/large-BH shapes through the
        HEAD-packed path — asserted by instrumenting the callee, not by
        re-testing the predicate (ADVICE r4: value-equality can't detect a
        dispatch regression). Head packing (not batch packing) is the
        measured in-program winner — see the dispatch comment in sdpa."""
        b, h, s, d = 64, 8, 16, 32
        q, k, v = _qkv(jax.random.PRNGKey(6), b, h, s, d)
        called = []
        orig = A._sdpa_xla_packed
        monkeypatch.setattr(
            A, "_sdpa_xla_packed",
            lambda *a, **kw: called.append(True) or orig(*a, **kw))
        out = A.sdpa(q, k, v, implementation="auto")
        assert called, "auto did not dispatch to the head-packed path"
        ref = A._sdpa_xla(q, k, v, d ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-6, atol=2e-6)

    def test_batch_packed_not_dispatched(self, monkeypatch):
        """The batch-packed variant is a measured in-program dead-end and
        must NOT be dispatched by 'auto' (kept only for direct use)."""
        b, h, s, d = 64, 8, 16, 32
        q, k, v = _qkv(jax.random.PRNGKey(8), b, h, s, d)
        monkeypatch.setattr(
            A, "_sdpa_xla_packed_batch",
            lambda *a, **kw: (_ for _ in ()).throw(
                AssertionError("auto dispatched the batch-packed path")))
        A.sdpa(q, k, v, implementation="auto")

    def test_sdpa_explicit_xla_stays_naive(self, monkeypatch):
        """Explicit implementation='xla' must NOT head-pack — kernel A/B
        benches rely on 'xla' meaning the literal einsum+softmax path
        (round-4 VERDICT weak #3)."""
        b, h, s, d = 64, 8, 16, 32
        q, k, v = _qkv(jax.random.PRNGKey(7), b, h, s, d)
        assert A._pack_group(q.shape, k.shape) > 1  # shape WOULD pack
        for fn in ("_sdpa_xla_packed", "_sdpa_xla_packed_batch"):
            monkeypatch.setattr(
                A, fn,
                lambda *a, **kw: (_ for _ in ()).throw(
                    AssertionError("explicit xla routed through packed path")))
        out = A.sdpa(q, k, v, implementation="xla")
        ref = A._sdpa_xla(q, k, v, d ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-6, atol=2e-6)


class TestBatchPackedParity:
    """The native-layout BATCH-packed path (round 5): packs G batch
    elements' sequences instead of G heads, so the layout round trip
    cancels against _split_heads/_merge_heads — zero copies, measured
    1.6x vs head packing in a realistic mini-block (RESULTS.md)."""

    @pytest.mark.parametrize("b,h,s,d", [(16, 8, 16, 32), (64, 4, 16, 64),
                                         (32, 4, 8, 16)])
    def test_forward_matches_naive(self, b, h, s, d):
        q, k, v = _qkv(jax.random.PRNGKey(10), b, h, s, d)
        g = A._pack_batch_group(q.shape, k.shape)
        assert g > 1
        ref = A._sdpa_xla(q, k, v, s ** -0.5)
        out = A._sdpa_xla_packed_batch(q, k, v, s ** -0.5, None, g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_cross_attention_matches(self):
        b, h, sq, sk, d = 64, 8, 4, 17, 64
        q, k, v = _qkv(jax.random.PRNGKey(11), b, h, sq, d, sk=sk)
        g = A._pack_batch_group(q.shape, k.shape)
        assert g > 1
        ref = A._sdpa_xla(q, k, v, d ** -0.5)
        out = A._sdpa_xla_packed_batch(q, k, v, d ** -0.5, None, g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_masked_matches(self):
        b, h, s, d = 32, 8, 16, 32
        q, k, v = _qkv(jax.random.PRNGKey(12), b, h, s, d)
        mask = jax.random.bernoulli(jax.random.PRNGKey(13), 0.7, (b, s))
        mask = mask.at[:, 0].set(True)  # no fully-masked rows here
        g = A._pack_batch_group(q.shape, k.shape)
        ref = A._sdpa_xla(q, k, v, d ** -0.5, mask)
        out = A._sdpa_xla_packed_batch(q, k, v, d ** -0.5, mask, g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_fully_masked_row_degenerates_identically(self):
        b, h, s, d = 16, 8, 16, 32
        q, k, v = _qkv(jax.random.PRNGKey(14), b, h, s, d)
        mask = jnp.ones((b, s), bool).at[3].set(False)  # row 3 fully masked
        g = A._pack_batch_group(q.shape, k.shape)
        ref = A._sdpa_xla(q, k, v, d ** -0.5, mask)
        out = A._sdpa_xla_packed_batch(q, k, v, d ** -0.5, mask, g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match(self):
        b, h, s, d = 16, 4, 16, 32
        q, k, v = _qkv(jax.random.PRNGKey(15), b, h, s, d)
        g = A._pack_batch_group(q.shape, k.shape)

        def loss(fn, *a):
            return jnp.sum(jnp.square(fn(*a)))

        gr = jax.grad(lambda q, k, v: loss(
            lambda *a: A._sdpa_xla(*a, s ** -0.5), q, k, v),
            argnums=(0, 1, 2))(q, k, v)
        gp = jax.grad(lambda q, k, v: loss(
            lambda *a: A._sdpa_xla_packed_batch(*a, s ** -0.5, None, g),
            q, k, v), argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gr, gp):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       rtol=5e-6, atol=5e-6)
