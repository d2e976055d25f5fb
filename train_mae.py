"""MAE trainer CLI — parity with the reference ``train_mae.py``: trains a
MaskedAutoencoderViT on frozen-VAE latents of single frames."""

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", type=str, default="exp/mae")
    p.add_argument("--exp_name", type=str, default="mae")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mp", type=str, default="bf16")
    p.add_argument("--model_type", type=str, default="MAE_S",
                   help="key into hivae_tpu.models.mae.MAE_MODELS "
                        "(MAE_S, MAE_L, or a registered custom factory)")
    p.add_argument("--mask_ratio", type=float, default=0.75)
    p.add_argument("--norm_pix_loss", type=lambda v: v.lower() == "true",
                   default=False)
    p.add_argument("--max_train_steps", type=int, default=100_000)
    p.add_argument("--train_batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=1.5e-4)
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="EMA of params on device; 0 disables")
    p.add_argument("--lr_warmup_steps", type=int, default=1000)
    p.add_argument("--save_checkpoint_interval_step", type=int, default=2000)
    p.add_argument("--video_dir", type=str, required=True)
    p.add_argument("--sample_size", type=int, default=256)
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--dataloader_num_workers", type=int, default=8)
    return p.parse_args()


def main():
    args = parse_args()

    from hivae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from hivae_tpu.data.datasets import DataLoader, VideoClipDataset
    from hivae_tpu.models import mae as mae_mod
    from hivae_tpu.models import vae as vae_mod
    from hivae_tpu.parallel import batch_sharding, create_mesh
    from hivae_tpu.training import checkpoint as ckpt_lib
    from hivae_tpu.training.train_state import (TrainState, make_optimizer,
                                                shard_train_step)

    dtype = jnp.bfloat16 if args.mp in ("bf16", "fp16") else jnp.float32
    out_dir = os.path.join(args.output_dir, args.exp_name)
    key = jax.random.PRNGKey(args.seed)

    model = mae_mod.MAE_MODELS[args.model_type](
        dtype=dtype, norm_pix_loss=args.norm_pix_loss)
    from hivae_tpu.utils.misc import init_on_cpu
    params = init_on_cpu(lambda: model.init(
        {"params": jax.random.PRNGKey(args.seed),
         "mask": jax.random.PRNGKey(args.seed)},
        jnp.zeros((1, model.in_chans) + tuple(model.img_size))))

    vae = vae_mod.AutoencoderKL(dtype=dtype)
    vae_params = init_on_cpu(lambda: vae.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3, args.sample_size, args.sample_size))))
    if args.vae_ckpt:
        from hivae_tpu.utils.torch_convert import (convert_torch_state,
                                                   load_safetensors,
                                                   normalize_vae_keys)
        state = normalize_vae_keys(load_safetensors(args.vae_ckpt))
        vae_params, _ = convert_torch_state(vae_params, state, strict=False)

    dataset = VideoClipDataset(args.video_dir, sample_n_frames=1,
                               sample_size=args.sample_size)
    loader = DataLoader(dataset, args.train_batch_size,
                        num_workers=args.dataloader_num_workers,
                        shard_id=jax.process_index(),
                        num_shards=jax.process_count())

    mesh = create_mesh()
    tx = make_optimizer(args.learning_rate, args.lr_warmup_steps,
                        args.max_train_steps, schedule="cosine")
    state = TrainState.create(params, tx,
                              ema_decay=args.ema_decay)

    def train_step(state, batch, rng, frozen):
        # frozen VAE rides as a replicated argument (closing over it bakes
        # ~80M weights into the HLO as constants; see models/vae.py)
        rng = jax.random.fold_in(rng, state.step)
        kv, km = jax.random.split(rng)
        z = vae_mod.vae_encode(vae, frozen["vae"], batch["videos"], kv)
        z = z.reshape((-1,) + z.shape[2:])

        def loss_fn(params):
            loss, _, _ = model.apply(params, z, args.mask_ratio,
                                     rngs={"mask": km})
            return loss, {"loss": loss}

        (_, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads), ld

    ckpt = ckpt_lib.CheckpointManager(os.path.join(out_dir, "checkpoints"))
    frozen = {"vae": vae_params}
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
