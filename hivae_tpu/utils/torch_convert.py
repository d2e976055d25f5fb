"""Torch-safetensors -> flax parameter conversion.

The BASELINE north star requires the reference's checkpoints (AMD / A2M
models, SD-VAE, LPIPS-VGG) to reload unchanged. Conversion is *shape-driven*:
we walk the flax parameter tree (the template), derive the corresponding
torch key with name rules, and transform each tensor to the flax layout:

  * Linear weight  (out,in)        -> kernel (in,out)        [transpose]
  * Conv2d weight  (O,I,kh,kw)     -> kernel (kh,kw,I,O)     [transpose]
  * Patchify conv  (O,I,p,p)       -> dense kernel (I*p*p,O) [reshape+T]
    (our PatchEmbed is a matmul; the channel-major patch layout matches the
    conv weight flattening exactly — see models/blocks.py:PatchEmbed)
  * Norm weight    (C,)            -> scale                  [copy]

Name rules cover the diffusers/reference module naming (ModuleList indices,
``to_out.0``, FeedForward ``net.0.proj``/``net.2``, Sequential camera_down).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

# flax path piece -> torch name piece (applied to the joined dotted name)
_RULES: List[Tuple[str, str]] = [
    (r"\bblocks_(\d+)\b", r"transformer_blocks.\1"),
    (r"\bobject_blocks_(\d+)\b", r"object_transformer_blocks.\1"),
    (r"\bcamera_blocks_(\d+)\b", r"camera_transformer_blocks.\1"),
    (r"\bspatial_blocks_(\d+)\b", r"spatial_blocks.\1"),
    (r"\bmotion_blocks_(\d+)\b", r"motion_blocks.\1"),
    (r"\baudio_blocks_(\d+)\b", r"audio_blocks.\1"),
    (r"\bpose_blocks_(\d+)\b", r"pose_blocks.\1"),
    (r"\btemporal_spatial_blocks_(\d+)\b", r"temporal_spatial_blocks.\1"),
    (r"\bresnets_(\d+)\b", r"resnets.\1"),
    (r"\battentions_(\d+)\b", r"attentions.\1"),
    (r"\bdownsamplers_(\d+)\b", r"downsamplers.\1"),
    (r"\bupsamplers_(\d+)\b", r"upsamplers.\1"),
    (r"\bdown_blocks_(\d+)\b", r"down_blocks.\1"),
    (r"\bup_blocks_(\d+)\b", r"up_blocks.\1"),
    (r"\bdownblock_(\d+)\b", r"downblock.\1"),
    (r"\bupblock_(\d+)\b", r"upblock.\1"),
    (r"\bmap_(\d+)\b", r"map.\1"),
    (r"\bnet_0\b", "net.0.proj"),
    (r"\bnet_2\b", "net.2"),
    (r"\bto_out\b", "to_out.0"),
    (r"\bcamera_down\.conv1\b", "camera_down.0"),
    (r"\bcamera_down\.conv2\b", "camera_down.1"),
    (r"\bfeatures_(\d+)\b", r"features.\1"),   # torchvision VGG16
    (r"\blin(\d)\b", r"lin\1.model.1"),        # LPIPS heads
]

_LEAF = {"kernel": "weight", "scale": "weight", "bias": "bias",
         "embedding": "weight"}


def flax_path_to_torch_key(path: Tuple[str, ...]) -> str:
    """('encoder','down_blocks_0','resnets_1','conv1','kernel') ->
    'encoder.down_blocks.0.resnets.1.conv1.weight'."""
    *mods, leaf = path
    name = ".".join(mods)
    for pat, rep in _RULES:
        name = re.sub(pat, rep, name)
    leaf_name = _LEAF.get(leaf, leaf)
    return f"{name}.{leaf_name}" if name else leaf_name


def _to_flax_layout(torch_arr: np.ndarray, target_shape: Tuple[int, ...],
                    leaf: str) -> Optional[np.ndarray]:
    t = np.asarray(torch_arr)
    shape = tuple(target_shape)
    if leaf == "kernel":
        # kernels ALWAYS need the layout transform — even square matrices,
        # where the torch and flax shapes coincide but the layout differs.
        if t.ndim == 2 and t.T.shape == shape:
            return np.ascontiguousarray(t.T)  # Linear
        if t.ndim == 4:
            conv = np.transpose(t, (2, 3, 1, 0))  # Conv2d -> HWIO
            if conv.shape == shape:
                return np.ascontiguousarray(conv)
            flat = t.reshape(t.shape[0], -1).T  # Patchify conv -> matmul
            if flat.shape == shape:
                return np.ascontiguousarray(flat)
        return None
    if t.shape == shape:
        return t
    if t.size == int(np.prod(shape)):
        return t.reshape(shape)
    return None


# scanned-layer stack names -> per-layer flax-style names (the _RULES then
# map these onto the torch ModuleList names)
_SCAN_BLOCK_NAMES = {
    "object_block": "object_blocks",
    "camera_block": "camera_blocks",
    "spatial_block": "spatial_blocks",
}


def _try_stacked(torch_state, lookup, target_shape, leaf, prefix):
    """Assemble a scanned (nn.scan-stacked) parameter of shape (L, ...) from
    the reference's per-layer ModuleList keys."""
    if "layers" not in lookup:
        return None
    i = lookup.index("layers")
    if i + 1 >= len(lookup) or lookup[i + 1] not in _SCAN_BLOCK_NAMES:
        return None
    num_layers = target_shape[0]
    per_shape = tuple(target_shape[1:])
    stack = []
    for layer in range(num_layers):
        per_path = (lookup[:i] +
                    (f"{_SCAN_BLOCK_NAMES[lookup[i + 1]]}_{layer}",) +
                    lookup[i + 2:])
        tkey = prefix + flax_path_to_torch_key(per_path)
        if tkey not in torch_state:
            return None
        arr = _to_flax_layout(torch_state[tkey], per_shape, leaf)
        if arr is None:
            return None
        stack.append((tkey, arr))
    return stack


def convert_torch_state(
    flax_params: Any,
    torch_state: Dict[str, np.ndarray],
    prefix: str = "",
    strict: bool = True,
):
    """Fill a flax param tree from a torch state dict.

    Handles both the unrolled layer layout (1:1 keys) and the nn.scan
    stacked layout (one flax leaf <- L per-layer torch keys). Returns
    (params, report) where report lists missing flax leaves and unused torch
    keys. With ``strict`` a missing leaf raises.
    """
    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    treedef = jax.tree_util.tree_structure(flax_params)
    used, missing, out = set(), [], []
    for keypath, leaf_val in flat:
        path = tuple(
            p.key if hasattr(p, "key") else str(p) for p in keypath)
        # drop the top-level 'params' collection name if present
        lookup = path[1:] if path and path[0] == "params" else path
        tkey = prefix + flax_path_to_torch_key(lookup)
        if tkey not in torch_state:
            stacked = _try_stacked(torch_state, lookup, leaf_val.shape,
                                   path[-1], prefix)
            if stacked is not None:
                for k, _ in stacked:
                    used.add(k)
                out.append(np.stack([a for _, a in stacked]).astype(
                    np.asarray(leaf_val).dtype))
                continue
        if tkey in torch_state:
            arr = _to_flax_layout(torch_state[tkey], leaf_val.shape, path[-1])
            if arr is None:
                raise ValueError(
                    f"shape mismatch for {tkey}: torch "
                    f"{np.asarray(torch_state[tkey]).shape} vs flax "
                    f"{leaf_val.shape}")
            used.add(tkey)
            out.append(arr.astype(np.asarray(leaf_val).dtype
                                  if hasattr(leaf_val, "dtype") else np.float32))
        else:
            missing.append(tkey)
            out.append(np.asarray(leaf_val))
    if missing and strict:
        raise KeyError(f"missing {len(missing)} torch keys, e.g. "
                       f"{missing[:10]}")
    unused = [k for k in torch_state if k not in used]
    params = jax.tree_util.tree_unflatten(treedef, out)
    return params, {"missing": missing, "unused": unused}


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors file into numpy arrays (no torch needed)."""
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


# Key aliases for older diffusers VAE attention naming.
_VAE_ATTN_ALIASES = [
    ("query", "to_q"), ("key", "to_k"), ("value", "to_v"),
    ("proj_attn", "to_out.0"),
]


def normalize_vae_keys(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        for old, new in _VAE_ATTN_ALIASES:
            k = k.replace(f".{old}.", f".{new}.")
        v = np.asarray(v)
        # old-style attention projections stored as (C,C,1,1) convs
        if any(s in k for s in ("to_q", "to_k", "to_v", "to_out.0")) and \
                "weight" in k and v.ndim == 4 and v.shape[2:] == (1, 1) and \
                ("encoder" in k or "decoder" in k):
            v = v[:, :, 0, 0]
        out[k] = v
    return out
