"""Real multi-process jax.distributed validation on CPU (docs/MULTIHOST.md):
two subprocesses, 4 virtual devices each, one global 8-device mesh, a psum
and a jitted data-parallel step over a globally-sharded batch."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PID_IDX"]),
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

mesh = Mesh(np.asarray(jax.devices()).reshape(8, 1), ("data", "model"))

# global (8, 4) batch: each process provides its addressable shards
sharding = NamedSharding(mesh, P("data", None))
global_shape = (8, 4)
local_rows = np.arange(global_shape[0] * global_shape[1], dtype=np.float32)
local_rows = local_rows.reshape(global_shape)

arrays = []
for d in jax.local_devices():
    idx = sharding.addressable_devices_indices_map(global_shape)[d]
    arrays.append(jax.device_put(local_rows[idx], d))
batch = jax.make_array_from_single_device_arrays(global_shape, sharding,
                                                 arrays)

@jax.jit
def step(x):
    return jnp.sum(x * 2.0)

total = float(step(batch))
expected = float(local_rows.sum() * 2.0)
assert abs(total - expected) < 1e-3, (total, expected)

# cross-host-sharded checkpoint round trip: every process calls save(),
# Orbax writes each process's addressable shards (no host gather)
from hivae_tpu.training.checkpoint import CheckpointManager

ckpt = CheckpointManager(os.environ["CKPT_DIR"], max_to_keep=2)
# leaves must be GLOBAL arrays in multihost (like jitted-step outputs);
# a host-local scalar is not serializable
rep = NamedSharding(mesh, P())
step_arr = jax.jit(lambda: jnp.ones((), jnp.int32), out_shardings=rep)()
state = {"w": batch, "step": step_arr}
ckpt.save(7, state, blocking=True)
restored = ckpt.restore(state)
np.testing.assert_allclose(
    np.asarray(jax.device_get(restored["w"].addressable_shards[0].data)),
    np.asarray(jax.device_get(state["w"].addressable_shards[0].data)))
assert int(restored["step"]) == 1
assert ckpt.latest_step() == 7

print(f"proc {jax.process_index()} OK total={total}", flush=True)
"""


class TestMultihost:
    def test_two_process_cluster(self, tmp_path):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

        script = tmp_path / "worker.py"
        script.write_text(WORKER)
        env_base = {k: v for k, v in os.environ.items()
                    if not k.startswith(("JAX_", "XLA_"))}
        procs = []
        for pid in range(2):
            env = dict(env_base, COORD=f"127.0.0.1:{port}",
                       PID_IDX=str(pid),
                       CKPT_DIR=str(tmp_path / "ckpt"),
                       REPO_ROOT=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
            procs.append(subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out.decode())
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-3000:]
        assert any("proc 0 OK" in o for o in outs)
        assert any("proc 1 OK" in o for o in outs)
