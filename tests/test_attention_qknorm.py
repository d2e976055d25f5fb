"""Fused qk-norm attention: parity, gradients, dispatch, mask composition.

Round 5: the per-head q/k LayerNorms moved from separate flax modules into
``ops.attention.sdpa`` (fused into the Pallas full-block kernel on that
path) — measured 3.4 ms of separate LN passes in the flagship forward
(benchmarks/RESULTS.md). These tests pin:

  * fused kernel == XLA-LN + attention reference, fwd and grad (incl. the
    norm params' own grads — the fused path's custom VJP must not drop them);
  * every non-fused dispatch (explicit xla, packed, streaming fallback)
    applies the identical norm math;
  * sdpa actually ROUTES through the fused kernel when expected
    (instrumented-callee pattern, ADVICE r4 #1);
  * the (B, Sk) key mask composes with the fused path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hivae_tpu.ops import attention as A
from hivae_tpu.ops.pallas import flash_attention as fa


def _mk(b=2, h=4, sq=40, sk=40, d=16, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    q = jax.random.normal(ks[0], (b, h, sq, d), dtype)
    k = jax.random.normal(ks[1], (b, h, sk, d), dtype)
    v = jax.random.normal(ks[2], (b, h, sk, d), dtype)
    gq = jax.random.normal(ks[3], (d,), jnp.float32) * 0.1 + 1.0
    bq = jax.random.normal(ks[4], (d,), jnp.float32) * 0.1
    gk = jax.random.normal(ks[5], (d,), jnp.float32) * 0.1 + 1.0
    bk = jax.random.normal(ks[6], (d,), jnp.float32) * 0.1
    return q, k, v, (gq, bq, gk, bk)


def _ref(q, k, v, params, eps=1e-6, key_mask=None):
    gq, bq, gk, bk = params
    qn = fa.qk_layernorm(q, gq, bq, eps)
    kn = fa.qk_layernorm(k, gk, bk, eps)
    return A.sdpa(qn, kn, v, key_mask=key_mask, implementation="xla")


@pytest.fixture
def fuse_on(monkeypatch):
    """Force the fused-kernel regime (default is off — the A/B at the
    flagship measured the fused kernel 0.55 ms/fwd slower, RESULTS.md r5 —
    but the kernel path must stay covered)."""
    monkeypatch.setattr(A, "_QKNORM_FUSE", True)


class TestFusedQKNorm:
    def test_fused_fullblock_matches_reference(self, fuse_on):
        q, k, v, params = _mk()
        out = A.sdpa(q, k, v, qk_norm=params, implementation="pallas")
        ref = _ref(q, k, v, params)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_default_unfused_pallas_matches_reference(self):
        """Default regime (_QKNORM_FUSE=False): pallas dispatch pre-norms
        via XLA then runs the plain kernel — same math."""
        assert A._QKNORM_FUSE is False
        q, k, v, params = _mk()
        out = A.sdpa(q, k, v, qk_norm=params, implementation="pallas")
        ref = _ref(q, k, v, params)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_fused_grads_match_reference(self, fuse_on):
        q, k, v, params = _mk(sq=24, sk=24)

        def loss_fused(q, k, v, params):
            o = A.sdpa(q, k, v, qk_norm=params, implementation="pallas")
            return jnp.sum(o * o)

        def loss_ref(q, k, v, params):
            o = _ref(q, k, v, params)
            return jnp.sum(o * o)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, params)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, params)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5, rtol=3e-5)

    def test_norm_param_grads_nonzero(self, fuse_on):
        q, k, v, params = _mk(sq=24, sk=24)

        def loss(params):
            o = A.sdpa(q, k, v, qk_norm=params, implementation="pallas")
            return jnp.sum(o * o)

        g = jax.grad(loss)(params)
        for leaf in jax.tree.leaves(g):
            assert float(jnp.abs(leaf).sum()) > 0

    def test_key_mask_composes(self, fuse_on):
        q, k, v, params = _mk()
        mask = jnp.arange(k.shape[2])[None, :] < 30
        mask = jnp.broadcast_to(mask, (q.shape[0], k.shape[2]))
        out = A.sdpa(q, k, v, qk_norm=params, key_mask=mask,
                     implementation="pallas")
        ref = _ref(q, k, v, params, key_mask=mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_bf16_matches_unfused_bf16(self, fuse_on):
        q, k, v, params = _mk(dtype=jnp.bfloat16)
        out = A.sdpa(q, k, v, qk_norm=params, implementation="pallas")
        ref = _ref(q, k, v, params)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2)

    def test_sdpa_routes_through_fused_kernel(self, fuse_on, monkeypatch):
        """Instrumented callee: deleting the fused branch must fail this."""
        q, k, v, params = _mk()
        called = {}
        orig = fa._flash_qknorm

        def spy(*args, **kw):
            called["yes"] = True
            return orig(*args, **kw)

        monkeypatch.setattr(fa, "_flash_qknorm", spy)
        A.sdpa(q, k, v, qk_norm=params, implementation="pallas")
        assert called.get("yes")

    def test_explicit_xla_never_fuses(self, monkeypatch):
        q, k, v, params = _mk()

        def boom(*args, **kw):
            raise AssertionError("fused kernel must not run under xla")

        monkeypatch.setattr(fa, "_flash_qknorm", boom)
        out = A.sdpa(q, k, v, qk_norm=params, implementation="xla")
        ref = _ref(q, k, v, params)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)

    def test_streaming_fallback_applies_norm(self, monkeypatch):
        """When the full-block schedule doesn't fit, flash_attention must
        normalize via XLA then stream — same math."""
        q, k, v, params = _mk(b=1, h=2, sq=40, sk=40)
        monkeypatch.setattr(fa, "_full_block_fits", lambda *a: False)
        out = fa.flash_attention(q, k, v, scale=q.shape[-1] ** -0.5,
                                 qk_norm=params)
        ref = _ref(q, k, v, params)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_packed_path_applies_norm(self):
        """Tiny-S / large-BH under 'auto' head-packs; the norm must be
        applied before packing with identical math."""
        q, k, v, params = _mk(b=64, h=4, sq=8, sk=8, d=16)
        out = A.sdpa(q, k, v, qk_norm=params, implementation="auto")
        ref = _ref(q, k, v, params)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


class TestQKNormAttentionModule:
    """blocks.Attention after the refactor: the param tree must be
    unchanged (norm_q/{scale,bias}) and outputs bit-identical to the old
    inline-LayerNorm formulation on the XLA path."""

    def test_param_tree_and_parity(self):
        import flax
        import flax.linen as nn
        from hivae_tpu.models import blocks as B

        m = B.Attention(dim=64, heads=4, head_dim=16, dtype=jnp.float32)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 12, 64))
        p = m.init(key, x)
        flat = flax.traverse_util.flatten_dict(p["params"])
        assert ("norm_q", "scale") in flat and ("norm_q", "bias") in flat
        assert flat[("norm_q", "scale")].dtype == jnp.float32

        def dense(name):
            return lambda y: (y @ p["params"][name]["kernel"]
                              + p["params"][name]["bias"])

        qh = B._split_heads(dense("to_q")(x), 4)
        kh = B._split_heads(dense("to_k")(x), 4)
        vh = B._split_heads(dense("to_v")(x), 4)
        ln = nn.LayerNorm(epsilon=1e-6)
        qh = ln.apply({"params": p["params"]["norm_q"]}, qh)
        kh = ln.apply({"params": p["params"]["norm_k"]}, kh)
        out = A.sdpa(qh.astype(jnp.float32), kh.astype(jnp.float32), vh)
        ref = (B._merge_heads(out) @ p["params"]["to_out"]["kernel"]
               + p["params"]["to_out"]["bias"])
        np.testing.assert_array_equal(np.asarray(m.apply(p, x)),
                                      np.asarray(ref))
