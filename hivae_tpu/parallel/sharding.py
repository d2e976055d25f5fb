"""Sharding rules: parameter PartitionSpecs over the (data, fsdp, tensor) mesh.

Instead of annotating every module, shardings are inferred from parameter
paths + shapes (t5x-style). Under GSPMD this is semantics-preserving: any
spec choice yields the same math, only different collective placement.

Default policy:
  * batch -> ('data', 'fsdp')   (fsdp axis also consumes batch, ZeRO-style)
  * TP rules (when mesh['tensor'] > 1): attention qkv / FFN-in kernels shard
    their output dim on 'tensor'; attention-out / FFN-out kernels shard the
    input dim (Megatron pairing — one all-reduce per block, rides ICI).
  * FSDP (when mesh['fsdp'] > 1): every remaining kernel >= min_size shards
    its largest eligible dim on 'fsdp'.
  * norms / biases / small tables replicate.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over the dotted flax path, dim to shard on 'tensor'):
# dim = -1 -> output/column parallel ; dim = 0 -> input/row parallel
_TP_RULES = [
    (r"\bto_q\.kernel$", -1),
    (r"\bto_k\.kernel$", -1),
    (r"\bto_v\.kernel$", -1),
    (r"\bto_out\.kernel$", 0),
    (r"\bnet_0\.kernel$", -1),
    (r"\bnet_2\.kernel$", 0),
    (r"\bfc1\.kernel$", -1),
    (r"\bfc2\.kernel$", 0),
]


def _path_str(keypath) -> str:
    return ".".join(p.key if hasattr(p, "key") else str(p) for p in keypath)


def infer_param_sharding(path: str, shape, mesh: Mesh,
                         min_fsdp_size: int = 2 ** 16) -> P:
    """PartitionSpec for one parameter."""
    tensor_n = mesh.shape.get("tensor", 1)
    fsdp_n = mesh.shape.get("fsdp", 1)
    ndim = len(shape)
    spec = [None] * ndim

    if tensor_n > 1 and ndim >= 1:
        for pat, dim in _TP_RULES:
            if re.search(pat, path):
                d = dim % ndim
                if shape[d] % tensor_n == 0:
                    spec[d] = "tensor"
                break

    if fsdp_n > 1 and int(np.prod(shape)) >= min_fsdp_size:
        # shard the largest still-unsharded dim divisible by fsdp
        order = sorted(range(ndim), key=lambda d: -shape[d])
        for d in order:
            if spec[d] is None and shape[d] % fsdp_n == 0:
                spec[d] = "fsdp"
                break

    return P(*spec)


def param_shardings(params: Any, mesh: Mesh,
                    min_fsdp_size: int = 2 ** 16) -> Any:
    """NamedSharding tree matching ``params``."""
    def one(keypath, leaf):
        spec = infer_param_sharding(_path_str(keypath), leaf.shape, mesh,
                                    min_fsdp_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays shard their leading dim over (data, fsdp)."""
    axes = [a for a in ("data", "fsdp") if mesh.shape.get(a, 1) > 1]
    return NamedSharding(mesh, P(tuple(axes) if axes else None))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
