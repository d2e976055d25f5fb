"""Label→motion trainer CLI — parity with the reference ``train_t2m.py``:
a frozen AMD model extracts camera/object motion; the label-conditioned
decoder trains to denoise object motion."""

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", type=str, default="exp/t2m")
    p.add_argument("--exp_name", type=str, default="t2m")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mp", type=str, default="bf16")
    p.add_argument("--max_train_steps", type=int, default=100_000)
    p.add_argument("--train_batch_size", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="EMA of params on device; 0 disables")
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--save_checkpoint_interval_step", type=int, default=2000)
    p.add_argument("--t2m_config", type=str, default=None,
                   help="json T2MConfig overrides")
    p.add_argument("--amd_config", type=str, required=True)
    p.add_argument("--amd_ckpt", type=str, required=True)
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--model_type", type=str, default="AMD_N")
    p.add_argument("--video_dir", type=str, required=True,
                   help="class-labeled video tree (UCF-101 layout)")
    p.add_argument("--video_frames", type=int, default=16)
    p.add_argument("--sample_size", type=int, default=256)
    p.add_argument("--dataloader_num_workers", type=int, default=8)
    return p.parse_args()


def main():
    args = parse_args()

    from hivae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    import json

    import jax
    import jax.numpy as jnp

    from amd_inference import load_amd
    from hivae_tpu.data.datasets import DataLoader, LabelVideoDataset
    from hivae_tpu.models import t2m as t2m_mod
    from hivae_tpu.models import vae as vae_mod
    from hivae_tpu.parallel import batch_sharding, create_mesh
    from hivae_tpu.training import checkpoint as ckpt_lib
    from hivae_tpu.training.train_state import (TrainState, make_optimizer,
                                                shard_train_step)

    dtype = jnp.bfloat16 if args.mp in ("bf16", "fp16") else jnp.float32
    out_dir = os.path.join(args.output_dir, args.exp_name)
    key = jax.random.PRNGKey(args.seed)

    amd_model, amd_params = load_amd(args, dtype)
    from hivae_tpu.models import amd as amd_lib
    if not isinstance(amd_model, amd_lib.AMDModelNew):
        raise SystemExit(
            "train_t2m requires --model_type AMD_N (or another AMDModelNew "
            "config): it consumes the decoupled encode() tuple "
            "(camera_target, object_source, object_target); the dual "
            "AMDModel's encode returns a different geometry (reference "
            "train_t2m.py trains against AMD_New only)")
    vae = vae_mod.AutoencoderKL(dtype=dtype)
    from hivae_tpu.utils.misc import init_on_cpu
    vae_params = init_on_cpu(lambda: vae.init(
        key, jnp.zeros((1, 3, args.sample_size, args.sample_size))))
    if args.vae_ckpt:
        from hivae_tpu.utils.torch_convert import (convert_torch_state,
                                                   load_safetensors,
                                                   normalize_vae_keys)
        state = normalize_vae_keys(load_safetensors(args.vae_ckpt))
        vae_params, _ = convert_torch_state(vae_params, state, strict=False)

    overrides = {}
    if args.t2m_config:
        with open(args.t2m_config) as f:
            overrides = json.load(f)
    cfg = t2m_mod.T2MConfig.from_dict({"num_frames": args.video_frames,
                                       **overrides})
    model = t2m_mod.Label2MotionDiffusionDecoder(cfg=cfg, dtype=dtype)

    def _init_model():
        # inputs built inside the CPU scope to avoid cross-backend copies
        n, t = 1, args.video_frames
        cam = jnp.zeros((n, t, cfg.camera_token_num, cfg.camera_channel))
        obj = jnp.zeros((n * t, cfg.object_token_num, cfg.object_channel))
        label = jnp.zeros((n,), jnp.int32)
        ref = jnp.zeros((n, t, cfg.refimg_dim, cfg.refimg_height,
                         cfg.refimg_width))
        k = jax.random.PRNGKey(args.seed)
        return model.init({"params": k, "noise": k}, cam, obj, label, ref,
                          jnp.zeros((n,)))

    params = init_on_cpu(_init_model)
    ckpt_lib.save_config(cfg.to_dict(), out_dir)

    dataset = LabelVideoDataset(args.video_dir,
                                sample_n_frames=args.video_frames,
                                sample_size=args.sample_size, use_grey=True)
    loader = DataLoader(dataset, args.train_batch_size,
                        num_workers=args.dataloader_num_workers,
                        shard_id=jax.process_index(),
                        num_shards=jax.process_count())

    mesh = create_mesh()
    tx = make_optimizer(args.learning_rate, args.lr_warmup_steps,
                        args.max_train_steps)
    state = TrainState.create(params, tx,
                              ema_decay=args.ema_decay)

    def train_step(state, batch, rng, frozen):
        import optax

        # frozen VAE/AMD ride as replicated arguments, and every encode
        # gets its own key (a shared key draws identical posterior noise
        # for same-shaped streams — videos vs grey_videos)
        rng = jax.random.fold_in(rng, state.step)
        kv, kr, kg, kgr, kt, kn = jax.random.split(rng, 6)
        video_z = vae_mod.vae_encode(vae, frozen["vae"], batch["videos"], kv)
        ref_z = vae_mod.vae_encode(vae, frozen["vae"], batch["ref_img"], kr)
        grey_z = vae_mod.vae_encode(vae, frozen["vae"],
                                    batch["grey_videos"], kg)
        ref_grey_z = vae_mod.vae_encode(vae, frozen["vae"],
                                        batch["ref_grey_img"], kgr)
        cam_t, obj_s, obj_t = amd_model.apply(
            frozen["amd"], video_z, ref_z, grey_z, ref_grey_z,
            method="encode")
        n = video_z.shape[0]
        timestep = jax.random.randint(kt, (n,), 0, cfg.num_steps + 1)
        # camera tokens reduced to the configured token budget
        cam_small = cam_t[:, :, :cfg.camera_token_num, :cfg.camera_channel]
        obj_small = obj_t[:, :cfg.object_token_num, :cfg.object_channel]

        def loss_fn(params):
            out = model.apply(params, cam_small, obj_small, batch["label"],
                              ref_z, timestep.astype(jnp.float32),
                              rngs={"noise": kn})
            loss = model.apply(params, out, method="loss")
            return loss, {"loss": loss}

        (_, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads)
        metrics = dict(ld)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    ckpt = ckpt_lib.CheckpointManager(os.path.join(out_dir, "checkpoints"))
    frozen = {"vae": vae_params, "amd": amd_params}
    with mesh:
        step_fn, shardings = shard_train_step(train_step, mesh, state,
                                              n_extra_replicated=1)
        state = jax.device_put(state, shardings)
        b_shard = batch_sharding(mesh)
        step = 0
        if len(loader) == 0:
            raise SystemExit(
                "dataset yields ZERO batches (fewer usable items than "
                "train_batch_size with drop_last) — the training loop "
                "would spin forever; shrink the batch or add data")
        while step < args.max_train_steps:
            for batch in loader:
                if step >= args.max_train_steps:
                    break
                db = {k: jax.device_put(jnp.asarray(v), b_shard)
                      for k, v in batch.items() if not isinstance(v, list)}
                state, metrics = step_fn(state, db, key, frozen)
                step += 1
                if step % 50 == 0:
                    print(f"step {step}: loss={float(metrics['loss']):.4f}")
                if step % args.save_checkpoint_interval_step == 0:
                    ckpt.save(step, jax.device_get(state))
    ckpt.save(step, jax.device_get(state))
    if step:  # short runs (< the 50-step print cadence) otherwise end silent
        print("final metrics:",
              {k: float(v) for k, v in jax.device_get(metrics).items()})


if __name__ == "__main__":
    main()
