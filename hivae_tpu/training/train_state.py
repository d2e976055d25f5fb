"""Train state + sharded train step for the AMD trainers.

Functional equivalent of the reference's Accelerate loop
(``train_amd.py:408-522``): AdamW + warmup schedule + grad clipping, with
gradient all-reduce emitted by GSPMD over the mesh instead of NCCL DDP.
The whole step (optionally including frozen-VAE encoding) is one jitted
program; batches shard over (data, fsdp), parameters per
``parallel.sharding`` rules.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..parallel import batch_sharding, param_shardings, replicate


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    # exponential moving average of params (capability upgrade over the
    # reference, which has no EMA); None when ema_decay == 0
    ema_params: Any = None
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.0)

    @classmethod
    def create(cls, params, tx, ema_decay: float = 0.0):
        ema = jax.tree.map(jnp.copy, params) if ema_decay > 0 else None
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx,
                   ema_params=ema, ema_decay=ema_decay)

    def apply_gradients(self, grads):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        ema = self.ema_params
        if ema is not None:
            d = self.ema_decay
            ema = jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) *
                               (1.0 - d), ema, params)
        return self.replace(step=self.step + 1, params=params,
                            opt_state=opt_state, ema_params=ema)

    @property
    def eval_params(self):
        """EMA params when tracked, else the live params."""
        return self.params if self.ema_params is None else self.ema_params


def make_optimizer(learning_rate: float = 1e-4,
                   warmup_steps: int = 0,
                   total_steps: Optional[int] = None,
                   schedule: str = "constant",
                   weight_decay: float = 1e-2,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                   max_grad_norm: float = 1.0,
                   accumulate_steps: int = 1,
                   mu_dtype=None) -> optax.GradientTransformation:
    """AdamW + diffusers-style LR schedule + global-norm clipping
    (reference ``train_amd.py:255-261,490-492``). ``accumulate_steps`` > 1
    wraps the chain in optax.MultiSteps (reference
    ``--gradient_accumulation_steps``)."""
    if schedule == "constant":
        if warmup_steps > 0:
            sched = optax.join_schedules(
                [optax.linear_schedule(0.0, learning_rate, warmup_steps),
                 optax.constant_schedule(learning_rate)], [warmup_steps])
        else:
            # no fake 1-step warmup: the reference's diffusers 'constant'
            # schedule applies the full LR from step 0 (a linear leg of
            # length 1 would zero the first update)
            sched = optax.constant_schedule(learning_rate)
    elif schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, total_steps or 10 ** 6)
    else:
        raise ValueError(schedule)
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(sched, b1=b1, b2=b2, eps=eps,
                    weight_decay=weight_decay, mu_dtype=mu_dtype),
    )
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def make_train_step(
    model,
    *,
    donate: bool = True,
) -> Callable:
    """Build the jitted AMD train step.

    batch: dict with 'video', 'ref_img' (+ optional 'video_grey',
    'ref_img_grey') of latent clips (N,T,C,H,W). Loss/grads in fp32; the
    model's compute dtype governs matmul precision.
    """

    def loss_fn(params, batch, rng):
        rngs = {"noise": rng}
        _, _, loss_dict = model.apply(
            params, batch["video"], batch["ref_img"],
            batch.get("video_grey"), batch.get("ref_img_grey"), rngs=rngs)
        return loss_dict["loss"], loss_dict

    def train_step(state: TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        step_rng = jax.random.fold_in(rng, state.step)
        (_, loss_dict), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, step_rng)
        new_state = state.apply_gradients(grads)
        metrics = dict(loss_dict)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def shard_train_step(train_step, mesh, state: TrainState,
                     donate_state: bool = True,
                     n_extra_replicated: int = 0):
    """jit the step with explicit shardings over ``mesh``; donates the state
    buffer so parameters update in place. ``n_extra_replicated`` trailing
    arguments (e.g. frozen VAE/LPIPS params) are replicated. Returns
    (jitted_step, state_shardings) — device_put the initial state with the
    latter (None on a single-device mesh, where plain jit placement is used:
    some TPU runtimes cannot fetch NamedSharding-annotated outputs)."""
    if mesh.devices.size == 1:
        jitted = jax.jit(train_step,
                         donate_argnums=(0,) if donate_state else ())
        return jitted, None
    p_shard = param_shardings(state.params, mesh)
    state_shardings = TrainState(
        step=replicate(mesh), params=p_shard,
        opt_state=jax.tree.map(lambda _: replicate(mesh), state.opt_state),
        tx=state.tx,
        ema_params=None if state.ema_params is None else p_shard,
        ema_decay=state.ema_decay)
    # refine: match moment tensors to their parameter shardings
    state_shardings = _match_opt_shardings(state_shardings, state, p_shard,
                                           mesh)
    b_shard = batch_sharding(mesh)

    in_shardings = (state_shardings, b_shard, replicate(mesh)) + \
        (replicate(mesh),) * n_extra_replicated
    jitted = jax.jit(
        train_step,
        in_shardings=in_shardings,
        out_shardings=(state_shardings, replicate(mesh)),
        donate_argnums=(0,) if donate_state else ())
    return jitted, state_shardings


def _path_key(keypath) -> tuple:
    """Tree path -> hashable tuple of name components (dict keys, attr
    names, sequence indices)."""
    out = []
    for p in keypath:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "name"):
            out.append(str(p.name))
        elif hasattr(p, "idx"):
            out.append(int(p.idx))
        else:
            out.append(str(p))
    return tuple(out)


def _match_opt_shardings(state_shardings: TrainState, state: TrainState,
                         p_shard, mesh):
    """Adam moments mirror their parameter's sharding, matched by tree PATH.

    The moment trees (mu/nu, MultiSteps' accumulated grads) embed the params
    pytree under a prefix, so each moment leaf's path ends with its
    parameter's path — match that suffix (and the shape, defensively).
    A shape-keyed match (round 2) silently gave two same-shaped params with
    different specs the first one's spec; scalars (count) replicate."""
    param_specs = {}
    for (kp, leaf), s in zip(jax.tree_util.tree_leaves_with_path(state.params),
                             jax.tree_util.tree_leaves(p_shard)):
        param_specs[_path_key(kp)] = (leaf.shape, s)

    def pick(kp, leaf):
        key = _path_key(kp)
        shape = getattr(leaf, "shape", None)
        for start in range(len(key)):
            hit = param_specs.get(key[start:])
            if hit is not None and hit[0] == shape:
                return hit[1]
        return replicate(mesh)

    opt_shard = jax.tree_util.tree_map_with_path(pick, state.opt_state)
    return state_shardings.replace(opt_state=opt_shard)
