"""Device mesh construction.

The reference's entire distributed story is torch DDP over NCCL
(SURVEY.md §2.5). Here a single ``jax.sharding.Mesh`` over all chips carries
every parallelism axis; XLA GSPMD emits the collectives over ICI/DCN:

  * ``data``   — batch sharding (DP; reference parity)
  * ``fsdp``   — parameter/optimizer sharding (ZeRO-3-style; capability
                 upgrade over the reference, needed for AMD_L+)
  * ``tensor`` — within-layer weight sharding (TP)

Multihost: call ``jax.distributed.initialize()`` before ``create_mesh`` —
the mesh spans all processes' devices; data loading uses
``jax.process_index()`` to shard files.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "fsdp", "tensor")


def create_mesh(shape: Optional[Tuple[int, int, int]] = None,
                axis_names: Sequence[str] = AXES,
                devices=None) -> Mesh:
    """Mesh over all devices. ``shape=None`` -> pure data parallelism
    (all devices on 'data'), the reference's topology."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    want = int(np.prod(shape))
    assert want <= n, f"mesh {shape} needs {want} devices, have {n}"
    # a mesh smaller than the host's device count (e.g. a 1-device mesh on
    # an 8-device test host) takes the leading devices
    return Mesh(devices.flat[:want].reshape(shape), axis_names)


def local_mesh(axis_names: Sequence[str] = AXES) -> Mesh:
    """Single-device mesh (useful to keep one code path on 1 chip)."""
    return create_mesh((1,) * len(axis_names), axis_names)
