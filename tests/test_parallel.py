"""Sharding tests on the fake 8-device CPU mesh."""

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from hivae_tpu.parallel import (batch_sharding, create_mesh,
                                infer_param_sharding)


class TestMesh:
    def test_default_is_data_parallel(self):
        mesh = create_mesh()
        assert mesh.shape["data"] == 8
        assert mesh.shape["fsdp"] == mesh.shape["tensor"] == 1

    def test_3d_mesh(self):
        mesh = create_mesh((2, 2, 2))
        assert dict(mesh.shape) == {"data": 2, "fsdp": 2, "tensor": 2}


class TestShardingRules:
    def test_tp_rules(self):
        mesh = create_mesh((2, 2, 2))
        assert infer_param_sharding("blocks_0.attn1.to_q.kernel",
                                    (256, 256), mesh)[-1] == "tensor"
        s = infer_param_sharding("blocks_0.attn1.to_out.kernel", (256, 256),
                                 mesh)
        assert s[0] == "tensor"
        # norm params replicate
        assert infer_param_sharding("norm1.scale", (256,), mesh) == P(None)

    def test_fsdp_shards_large_only(self):
        mesh = create_mesh((1, 8, 1))
        big = infer_param_sharding("some.kernel", (1024, 1024), mesh)
        assert "fsdp" in big
        small = infer_param_sharding("some.kernel", (8, 8), mesh)
        assert small == P(None, None)

    def test_batch_sharding(self):
        mesh = create_mesh((4, 2, 1))
        s = batch_sharding(mesh)
        assert s.spec == P(("data", "fsdp"))


class TestEndToEnd:
    def test_sharded_matmul_matches_local(self):
        mesh = create_mesh((2, 2, 2))
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 64))
        w = jax.random.normal(jax.random.PRNGKey(1), (64, 64))
        expected = np.asarray(x @ w)
        xs = jax.device_put(x, batch_sharding(mesh))
        ws = jax.device_put(w, jax.sharding.NamedSharding(
            mesh, infer_param_sharding("to_q.kernel", w.shape, mesh)))
        out = jax.jit(lambda a, b: a @ b)(xs, ws)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5,
                                   atol=1e-5)


class TestOptShardingByPath:
    def test_moments_match_params_by_path(self):
        """Every Adam moment leaf must carry exactly its parameter's
        sharding — matched by tree path. Regression for the round-2
        shape-keyed match: two same-shaped kernels with different TP specs
        (to_q column-parallel vs to_out row-parallel) must not share one."""
        import jax.numpy as jnp

        from hivae_tpu.training.train_state import (TrainState, _path_key,
                                                    make_optimizer,
                                                    shard_train_step)

        mesh = create_mesh((1, 2, 2))
        params = {"params": {"attn1": {
            "to_q": {"kernel": jnp.zeros((256, 256))},
            "to_out": {"kernel": jnp.zeros((256, 256))}}}}
        state = TrainState.create(params, make_optimizer(1e-4))

        _, shardings = shard_train_step(lambda s, b, r: (s, {}), mesh, state)

        p_specs = {_path_key(kp): s.spec for kp, s in
                   jax.tree_util.tree_leaves_with_path(shardings.params)}
        q_key = ("params", "attn1", "to_q", "kernel")
        o_key = ("params", "attn1", "to_out", "kernel")
        assert p_specs[q_key] != p_specs[o_key]  # distinct TP specs

        matched = 0
        for kp, s in jax.tree_util.tree_leaves_with_path(
                shardings.opt_state):
            key = _path_key(kp)
            for start in range(len(key)):
                if key[start:] in p_specs:
                    assert s.spec == p_specs[key[start:]], key
                    matched += 1
                    break
        # mu + nu for each of the two kernels at minimum
        assert matched >= 4
