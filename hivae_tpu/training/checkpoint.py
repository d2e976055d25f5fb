"""Checkpoint save/restore/rotate + config IO.

Parity with the reference's Accelerate+safetensors flow
(``train_amd.py:499-517``, ``model/utils.py:178-237``): rotating
``checkpoint-{step}`` directories holding model/optimizer/step state, a
``config.json`` written next to checkpoints, newest-checkpoint discovery by
the same ``checkpoint-(\\d+)`` regex, and partial-load of torch safetensors
references via ``utils/torch_convert``.

Native checkpoints use Orbax (async-capable, multihost-aware); torch
safetensors reload unchanged through the converter.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, List, Optional

import jax
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"checkpoint-(\d+)")


def save_config(config: Dict[str, Any], directory: str,
                name: str = "config.json") -> None:
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, name), "w") as f:
        json.dump(config, f, indent=2, default=str)


def load_config(path: str) -> Dict[str, Any]:
    if os.path.isdir(path):
        path = os.path.join(path, "config.json")
    with open(path) as f:
        return json.load(f)


def find_latest_checkpoint(directory: str) -> Optional[str]:
    """Newest ``checkpoint-{step}`` subdir (reference ``utils.py:217-237``)."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        m = _CKPT_RE.fullmatch(name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(directory, name)
    return best


def checkpoint_step(path: str) -> int:
    m = _CKPT_RE.search(os.path.basename(os.path.normpath(path)))
    return int(m.group(1)) if m else 0


class CheckpointManager:
    """Rotating Orbax checkpointer for TrainState pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, step: int, state: Any, blocking: bool = True) -> str:
        # finish any in-flight async save first (Orbax forbids overlap)
        self._ckptr.wait_until_finished()
        path = os.path.join(self.directory, f"checkpoint-{step}")
        multihost = jax.process_count() > 1
        if multihost:
            # barrier BEFORE the primary's rmtree: every process must have
            # drained its own in-flight async writes first, or re-saving the
            # same step (in-loop async save + final blocking save) lets
            # process 0 delete the directory under other hosts' writers
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("ckpt_drain_" + str(step))
        if jax.process_index() == 0 and os.path.exists(path):
            shutil.rmtree(path)
        if multihost:
            # all processes must reach save() together, after the primary's
            # cleanup; Orbax then writes each process's addressable shards
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("ckpt_save_" + str(step))
        self._ckptr.save(path, state)
        if blocking:
            self._ckptr.wait_until_finished()
        if jax.process_index() == 0:
            # count the (possibly still uncommitted) new save toward the
            # limit: an async save is invisible to the directory listing
            # until it commits, and rotating without it would keep
            # max_to_keep OLD checkpoints plus the in-flight one — a full
            # TrainState directory over the configured disk budget
            self._rotate(pending_step=step)
        return path

    def wait(self) -> None:
        """Block until any in-flight async save has committed."""
        self._ckptr.wait_until_finished()

    def restore(self, state_template: Any,
                path: Optional[str] = None) -> Any:
        path = path or find_latest_checkpoint(self.directory)
        if path is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._ckptr.restore(path, state_template)

    def latest_step(self) -> Optional[int]:
        path = find_latest_checkpoint(self.directory)
        return checkpoint_step(path) if path else None

    def _rotate(self, pending_step: Optional[int] = None) -> None:
        steps = []
        for name in os.listdir(self.directory):
            if _CKPT_RE.fullmatch(name):
                steps.append(int(_CKPT_RE.fullmatch(name).group(1)))
        if pending_step is not None and pending_step not in steps:
            steps.append(pending_step)
        steps.sort()
        doomed = steps[:-self.max_to_keep] if self.max_to_keep else []
        for s in doomed:
            if s == pending_step:
                continue  # never delete the save in flight
            shutil.rmtree(os.path.join(self.directory, f"checkpoint-{s}"),
                          ignore_errors=True)


def load_pretrain_partial(flax_params: Any, safetensors_path: str,
                          skip_patterns: tuple = ()) -> Any:
    """Partial torch-safetensors load with key filtering (reference
    ``model_load_pretrain``, ``utils.py:178-185``): keys matching
    ``skip_patterns`` keep their fresh values; everything else converts."""
    from ..utils.torch_convert import convert_torch_state, load_safetensors

    state = load_safetensors(safetensors_path)
    for pat in skip_patterns:
        state = {k: v for k, v in state.items() if pat not in k}
    params, report = convert_torch_state(flax_params, state, strict=False)
    return params, report
