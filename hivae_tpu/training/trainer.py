"""AMD training driver — the reference ``train_amd.py`` loop rebuilt for TPU.

One jitted program per step covering frozen-VAE encoding (the reference
encodes on-the-fly each step, ``train_amd.py:425-431``), the AMD forward,
loss, grads, and the AdamW update — batches shard over the mesh's
(data, fsdp) axes, parameters per the sharding rules, and GSPMD emits the
gradient all-reduce the reference got from DDP/NCCL.

Also covers the reference's auxiliary loop behavior: NaN checks
(``:435-436,461``), loss logging (psum-mean instead of accelerator.gather),
checkpoint save/rotate/resume (``:499-517``), and periodic validation that
samples the model and writes image/video panels to tensorboard
(``log_validation:311-406``).
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import amd as amd_mod
from ..models import vae as vae_mod
from ..parallel import batch_sharding, create_mesh
from . import checkpoint as ckpt_lib
from .train_state import (TrainState, make_optimizer, shard_train_step)


@dataclasses.dataclass
class TrainConfig:
    output_dir: str = "exp/amd"
    learning_rate: float = 1e-4
    weight_decay: float = 1e-2
    warmup_steps: int = 0
    lr_schedule: str = "constant"
    max_grad_norm: float = 1.0
    max_steps: int = 100_000
    log_every: int = 50
    save_every: int = 2000
    eval_every: int = 2000
    checkpoint_total_limit: int = 2
    seed: int = 0
    mixed_precision: str = "bf16"          # 'bf16' | 'no'
    mesh_shape: Optional[tuple] = None      # None -> all-data mesh
    camera_mask_ratio: Optional[float] = None
    object_mask_ratio: Optional[float] = None
    resume: bool = False
    # fetch the loss scalar every K steps; keeps the async dispatch queue
    # shallow (deep queues break host fetches on some TPU runtimes) and
    # bounds how far training runs ahead of error detection
    sync_every: int = 1
    # perceptual loss: velocity MSE + w * LPIPS(decoded rec, GT pixels)
    # (reference LpipsMseLoss, model/loss.py:248-330); requires lpips params
    perceptual_weight: float = 0.0
    # capture a jax.profiler trace for N steps (starting at profile_start,
    # after warmup/compile) into <output_dir>/profile; 0 disables
    profile_steps: int = 0
    profile_start: int = 5
    # Adam moment dtype: 'bf16' halves optimizer HBM (the difference
    # between batch 1 and batch 2 for the 696M model on a 16G chip);
    # None keeps fp32 moments
    mu_dtype: Optional[str] = None
    # gradient accumulation (reference --gradient_accumulation_steps)
    accumulate_steps: int = 1
    # EMA of the params, updated in-step on device; 0 disables. Validation
    # samples with the EMA weights when tracked; checkpoints carry both
    # trees (capability upgrade — the reference has no EMA)
    ema_decay: float = 0.0
    # dtype for host->device batch transfer: 'fp32' (exact) or 'bf16'
    # (halves upload bytes; numerically identical when the model compute
    # dtype is bf16, since the step casts pixels to bf16 anyway)
    transfer_dtype: str = "fp32"
    # NaN handling (reference asserts after VAE encode and on the loss every
    # step, train_amd.py:435-436,461):
    #   'none' — only the log-time finite check (cheapest)
    #   'halt' — check at every sync point; dump the offending batch to
    #            <output_dir>/nan_batch_step<N>.npz and raise
    #   'skip' — in-step guard: a non-finite loss/grad step is dropped on
    #            device (state kept), counted in metrics['nan_skipped']
    nan_policy: str = "none"


class AMDTrainer:
    """Composable trainer: bring a model+params, a frozen VAE, and a batch
    iterator of *pixel* clips; everything device-side is jitted once."""

    def __init__(self, model, params, vae, vae_params, config: TrainConfig,
                 tb_writer=None, lpips=None, lpips_params=None):
        self.model = model
        self.config = config
        self.vae = vae
        self.vae_params = vae_params
        self.lpips = lpips
        self.lpips_params = lpips_params
        self.mesh = create_mesh(config.mesh_shape)
        self.tb = tb_writer

        impl = getattr(getattr(model, "cfg", None), "attn_impl", "auto")
        from ..ops import attention as attn_ops

        attn_ops.set_default_implementation(impl)
        if impl == "ring":
            dp = dict(self.mesh.shape).get("data", 1)
            attn_ops.set_ring_context(
                self.mesh, "tensor",
                batch_axis="data" if dp > 1 else None)

        import jax.numpy as _jnp
        tx = make_optimizer(config.learning_rate, config.warmup_steps,
                            config.max_steps, config.lr_schedule,
                            config.weight_decay,
                            max_grad_norm=config.max_grad_norm,
                            accumulate_steps=config.accumulate_steps,
                            mu_dtype=_jnp.bfloat16
                            if config.mu_dtype == "bf16" else None)
        # copy: the jitted step donates the state, which may alias the
        # caller's params when device_put is a no-op
        params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        self.state = TrainState.create(params, tx,
                                       ema_decay=config.ema_decay)
        self.ckpt = ckpt_lib.CheckpointManager(
            os.path.join(config.output_dir, "checkpoints"),
            max_to_keep=config.checkpoint_total_limit)
        self.global_step = 0
        if config.resume and self.ckpt.latest_step() is not None:
            self.state = self.ckpt.restore(self.state)
            self.global_step = int(self.state.step)

        self._step_fn, self._state_shardings = self._build_step()
        if self._state_shardings is not None:
            self.state = jax.device_put(self.state, self._state_shardings)

    # -- step construction ---------------------------------------------------

    def _build_step(self):
        model, vae, vae_params = self.model, self.vae, self.vae_params
        cfg = self.config
        use_grey = getattr(model.cfg, "use_grey", False)
        use_mask = getattr(model.cfg, "use_mask", False)

        use_lpips = cfg.perceptual_weight > 0 and self.lpips is not None
        lpips = self.lpips

        # frozen params travel as explicit jit arguments: embedding them as
        # trace-time constants requires a host fetch the relay can't always
        # perform, and constants bloat the compiled program
        self._frozen = {"vae": self.vae_params}
        if use_lpips:
            self._frozen["lpips"] = self.lpips_params

        use_regularizers = getattr(model.cfg, "use_regularizers", False)

        def train_step(state: TrainState, batch, rng, frozen):
            rng = jax.random.fold_in(rng, state.step)
            # independent posterior noise per VAE encode (the reference
            # samples each encode separately, train_amd.py:425-431; reusing
            # one key across same-shaped tensors would correlate the noise)
            kv, kr, kgv, kgr, kn, km, kkl = jax.random.split(rng, 7)

            def encode(key, pixels):
                return vae_mod.vae_encode(vae, frozen["vae"], pixels, key)

            # encode outside loss_fn: the latents don't depend on the
            # trained params, so the frozen encoder has no business inside
            # the differentiated region
            video_z = encode(kv, batch["videos"])
            ref_z = encode(kr, batch["ref_img"])
            kwargs = {}
            if use_grey:
                kwargs["video_grey"] = encode(kgv, batch["grey_videos"])
                kwargs["ref_img_grey"] = encode(kgr, batch["ref_grey_img"])
            if use_mask:
                # optical-flow camera mask, already at latent resolution
                # (N, 2T, C, h, w) — the reference feeds it straight to the
                # model (train_amd.py:433,455), no VAE encode
                kwargs["camera_mask"] = batch["camera_mask"]
            if isinstance(model, amd_mod.AMDModelNew):
                kwargs["camera_mask_ratio"] = cfg.camera_mask_ratio
                kwargs["object_mask_ratio"] = cfg.object_mask_ratio

            rngs = {"noise": kn, "mask": km}
            if use_regularizers:
                rngs["noise_kl"] = kkl  # KL posterior sampling (amd.py
                # _split_project; reference model_AMD.py:343-349)

            def loss_fn(params):
                _, _, loss_dict = model.apply(
                    params, video_z, ref_z, rngs=rngs,
                    return_meta_info=use_lpips, **kwargs)
                loss = loss_dict["loss"]
                if use_lpips:
                    decoded = vae.apply(
                        frozen["vae"],
                        loss_dict["rec_zj"] / vae_mod.SD_VAE_SCALE,
                        method="decode")
                    gt = batch["videos"].reshape(
                        (-1,) + batch["videos"].shape[2:])
                    p_loss = jnp.mean(lpips.apply(
                        frozen["lpips"], decoded, gt))
                    loss = loss + cfg.perceptual_weight * p_loss
                    loss_dict = {k: v for k, v in loss_dict.items()
                                 if v is not None and jnp.ndim(v) == 0}
                    loss_dict["lpips_loss"] = p_loss
                    loss_dict["loss"] = loss
                return loss, loss_dict

            (_, loss_dict), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads)
            import optax
            metrics = dict(loss_dict)
            metrics["grad_norm"] = optax.global_norm(grads)
            if cfg.nan_policy == "skip":
                finite = (jnp.isfinite(metrics["loss"]) &
                          jnp.isfinite(metrics["grad_norm"]))
                new_state = jax.tree.map(
                    lambda new, old: jnp.where(finite, new, old),
                    new_state, state)
                metrics["nan_skipped"] = 1.0 - finite.astype(jnp.float32)
            # fp32 metrics: bf16 host fetches are not universally supported
            metrics = jax.tree.map(lambda x: x.astype(jnp.float32), metrics)
            return new_state, metrics

        with self._mesh_ctx():
            return shard_train_step(train_step, self.mesh, self.state,
                                    n_extra_replicated=1)

    def _mesh_ctx(self):
        # a Mesh context makes jit emit NamedSharding-annotated outputs,
        # which some TPU runtimes cannot fetch; skip it on one device
        return self.mesh if self.mesh.devices.size > 1 else \
            contextlib.nullcontext()

    # -- loop ----------------------------------------------------------------

    def _start_profile(self):
        """Begin a jax.profiler trace (the reference has no profiler at all;
        SURVEY §5.1 calls for trace hooks in the TPU build). Best-effort:
        relayed runtimes may not support device traces."""
        try:
            import jax.profiler as jprof

            self._profile_dir = os.path.join(self.config.output_dir,
                                             "profile")
            jprof.start_trace(self._profile_dir)
            self._profiling = True
        except Exception as e:  # pragma: no cover - backend dependent
            print(f"profiler unavailable: {e}")
            self._profiling = False

    def _stop_profile(self, metrics):
        if not getattr(self, "_profiling", False):
            return
        try:
            import jax.profiler as jprof

            jax.tree_util.tree_map(lambda x: x.block_until_ready(),
                                   metrics)
            jprof.stop_trace()
            print(f"profiler trace written to {self._profile_dir}")
        except Exception as e:  # pragma: no cover
            print(f"profiler stop failed: {e}")
        self._profiling = False

    def fit(self, batches: Iterable[Dict[str, np.ndarray]],
            max_steps: Optional[int] = None) -> Dict[str, float]:
        cfg = self.config
        limit = max_steps or cfg.max_steps
        rng = jax.random.PRNGKey(cfg.seed)
        b_shard = batch_sharding(self.mesh)
        last_metrics: Dict[str, float] = {}
        t0 = time.perf_counter()

        dp = self.mesh.shape.get("data", 1) * self.mesh.shape.get("fsdp", 1)

        def cast(v):
            v = np.asarray(v)
            if cfg.transfer_dtype == "bf16" and v.dtype == np.float32:
                v = v.astype(jnp.bfloat16.dtype)  # ml_dtypes.bfloat16
            return v

        def to_device(batch):
            bsz = next(v.shape[0] for v in batch.values()
                       if not isinstance(v, list))
            if bsz % dp != 0:
                raise ValueError(
                    f"batch size {bsz} must be divisible by the "
                    f"data-parallel extent {dp} (mesh {dict(self.mesh.shape)})")
            if self.mesh.devices.size == 1:
                return {k: jnp.asarray(cast(v)) for k, v in batch.items()
                        if not isinstance(v, list)}
            return {k: jax.device_put(jnp.asarray(cast(v)), b_shard)
                    for k, v in batch.items() if not isinstance(v, list)}

        # one-batch device prefetch: batch N+1 uploads while step N runs,
        # so the (possibly slow) host->device transfer never serializes
        # with compute even when sync_every fetches the loss every step
        it = iter(batches)
        with self._mesh_ctx():
            try:
                batch = next(it)
            except StopIteration:
                batch = None
            device_batch = to_device(batch) if batch is not None else None
            while device_batch is not None and self.global_step < limit:
                host_batch = batch
                if (cfg.profile_steps and
                        self.global_step == cfg.profile_start):
                    self._start_profile()
                self.state, metrics = self._step_fn(self.state, device_batch,
                                                    rng, self._frozen)
                self.global_step += 1
                # prefetch the next batch before any host sync below
                if self.global_step < limit:
                    try:
                        batch = next(it)
                        device_batch = to_device(batch)
                    except StopIteration:
                        batch, device_batch = None, None
                else:
                    batch, device_batch = None, None
                if (cfg.profile_steps and self.global_step ==
                        cfg.profile_start + cfg.profile_steps):
                    self._stop_profile(metrics)

                if cfg.sync_every and self.global_step % cfg.sync_every == 0:
                    loss_val = float(metrics["loss"])
                    if cfg.nan_policy == "halt" and not np.isfinite(loss_val):
                        dump = os.path.join(
                            cfg.output_dir,
                            f"nan_batch_step{self.global_step}.npz")
                        os.makedirs(cfg.output_dir, exist_ok=True)
                        np.savez(dump, **{k: np.asarray(v)
                                          for k, v in host_batch.items()
                                          if not isinstance(v, list)})
                        raise FloatingPointError(
                            f"non-finite loss {loss_val} at step "
                            f"{self.global_step}; offending batch dumped to "
                            f"{dump}")

                if self.global_step % cfg.log_every == 0 or \
                        self.global_step >= limit:
                    last_metrics = {k: float(v) for k, v in metrics.items()}
                    if (cfg.nan_policy != "skip" and
                            not np.isfinite(last_metrics["loss"])):
                        raise FloatingPointError(
                            f"non-finite loss at step {self.global_step}: "
                            f"{last_metrics}")
                    dt = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    last_metrics["steps_per_sec"] = cfg.log_every / max(dt, 1e-9)
                    self._log(last_metrics)

                if self.global_step % cfg.save_every == 0:
                    self.save(blocking=False)
        self.ckpt.wait()  # make the last async save durable before returning
        return last_metrics

    def save(self, blocking: bool = True):
        """Checkpoint the train state. The in-loop path passes
        blocking=False (training resumes while Orbax commits in the
        background; the next save or fit-exit waits). Explicit calls —
        final save before process exit — default to blocking, otherwise
        the interpreter can shut down with the write still in flight,
        leaving only an orbax tmp dir.

        Multihost: every process participates — Orbax writes each
        process's addressable shards directly (no host gather of
        non-addressable data, which would fail on cross-host-sharded
        state)."""
        if jax.process_count() > 1:
            self.ckpt.save(self.global_step, self.state, blocking=blocking)
        elif jax.process_index() == 0:
            self.ckpt.save(self.global_step, jax.device_get(self.state),
                           blocking=blocking)

    def _log(self, metrics: Dict[str, float]):
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(f"train/{k}", v, self.global_step)

    # -- validation ----------------------------------------------------------

    def validate(self, batch: Dict[str, np.ndarray], sample_step: int = 2,
                 key: Optional[jax.Array] = None,
                 grid_path: Optional[str] = None) -> np.ndarray:
        """Sample reconstructions for a pixel batch and (optionally) write
        tensorboard panels. Returns decoded uint8 video (N,T,C,H,W)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        kv, ks = jax.random.split(key)
        video_z = vae_mod.vae_encode(self.vae, self.vae_params,
                                     jnp.asarray(batch["videos"]))
        ref_z = vae_mod.vae_encode(self.vae, self.vae_params,
                                   jnp.asarray(batch["ref_img"]))
        kwargs = {}
        if getattr(self.model.cfg, "use_grey", False):
            kwargs["video_grey"] = vae_mod.vae_encode(
                self.vae, self.vae_params, jnp.asarray(batch["grey_videos"]))
            kwargs["ref_img_grey"] = vae_mod.vae_encode(
                self.vae, self.vae_params, jnp.asarray(batch["ref_grey_img"]))
        if (getattr(self.model.cfg, "use_mask", False) and
                "camera_mask" in batch):
            # reference validate threads the mask into sample too
            # (train_amd.py:330,347)
            kwargs["camera_mask"] = jnp.asarray(batch["camera_mask"])
        _, sample_z, _ = amd_mod.sample(self.model, self.state.eval_params,
                                        ks, video_z, ref_z,
                                        sample_step=sample_step, **kwargs)
        video = vae_mod.vae_decode(self.vae, self.vae_params, sample_z)
        out = np.asarray(vae_mod.latents_to_rgb(video))
        if grid_path is not None:
            from ..data.video import save_videos_grid

            save_videos_grid(grid_path, out)
        if self.tb is not None:
            self.tb.add_images("val/first_frame_pred", out[:, 0],
                               self.global_step)
            gt = np.asarray(vae_mod.latents_to_rgb(
                jnp.asarray(batch["videos"])))
            self.tb.add_images("val/first_frame_gt", gt[:, 0],
                               self.global_step)
            try:
                self.tb.add_video("val/video_pred", out, self.global_step,
                                  fps=8)
            except Exception:
                pass  # tensorboardX video needs moviepy; images suffice
        return out
