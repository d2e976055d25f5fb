"""Small shared utilities (reference ``model/utils.py`` parity)."""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def init_on_cpu(fn, *args, **kwargs):
    """Run a (model.init-style) function on the host CPU backend.

    Eager execution on some TPU runtimes is unreliable for exotic ops
    (e.g. complex einsums in the frequency band split); initializing on CPU
    and letting the first jitted step transfer the params is robust and
    avoids giant init programs. Falls back to the default device when no
    CPU backend is registered.
    """
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        return fn(*args, **kwargs)
    with jax.default_device(cpu):
        return fn(*args, **kwargs)


def commit_to_device(tree: Any) -> Any:
    """``jax.device_put`` a param tree once, before any dispatch loop.

    Checkpoint restores and :func:`init_on_cpu` yield HOST arrays, and a
    host tree passed as a jit argument re-uploads in full on EVERY
    dispatch — measured 28.9 s per A2V window through the relay on a 131M
    AMD vs 0.08 s once committed (the device work is milliseconds; the
    rest was the 524 MB fp32 tree crossing the wire per window). Every
    serving surface that calls a ``*_jit`` wrapper in a loop must commit
    its trees first; the pipeline classes do this in their constructors
    (``pipelines/pipeline.py::_init_quant``)."""
    return jax.device_put(tree)


def count_params(params: Any) -> int:
    """Total parameter count of a pytree (reference ``print_param_num``)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def print_param_num(name: str, params: Any) -> int:
    n = count_params(params)
    print(f"* {name}: {n/1e6:.1f}M parameters")
    return n


def save_args(args, directory: str, name: str = "args.txt") -> None:
    """Snapshot CLI args next to checkpoints (reference ``save_cfg``,
    ``model/utils.py:40-47``)."""
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, name), "w") as f:
        for k, v in sorted(vars(args).items()):
            f.write(f"{k}: {v}\n")
