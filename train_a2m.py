"""A2M trainer CLI — parity with the reference ``train_a2m.py``: a frozen
AMD model provides motion-token ground truth on the fly; only the audio
decoder head trains. Model spec comes from a yaml/json with ``model_type``
and ``model`` kwargs (reference ``config/a2m/*.yaml``)."""

import argparse
import json
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", type=str, default="exp/a2m")
    p.add_argument("--exp_name", type=str, default="a2m")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mp", type=str, default="bf16")
    p.add_argument("--max_train_steps", type=int, default=100_000)
    p.add_argument("--train_batch_size", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="EMA of params on device; 0 disables")
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--save_checkpoint_interval_step", type=int, default=2000)
    p.add_argument("--checkpoint_total_limit", type=int, default=2)
    # models
    p.add_argument("--a2m_config", type=str, required=True,
                   help="json or yaml: {model_type, model: {...}}")
    p.add_argument("--amd_config", type=str, required=True)
    p.add_argument("--amd_ckpt", type=str, required=True)
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--model_type", type=str, default="AMD_N")
    # data
    p.add_argument("--dataset", type=str, default="A2MVideoAudio",
                   choices=["A2MVideoAudio", "A2MVideoAudioPoseRandomRef"],
                   help="consecutive-ref (reference A2MVideoAudio[Pose]) or "
                        "random-outside-clip reference "
                        "(A2MVideoAudioPoseRandomRef, dataset.py:1063)")
    p.add_argument("--video_dir", type=str, required=True,
                   help="pkl list of {video_path, audio_emb_path}")
    p.add_argument("--video_frames", type=int, default=16)
    p.add_argument("--sample_size", type=int, default=256)
    p.add_argument("--dataloader_num_workers", type=int, default=8)
    return p.parse_args()


def build_a2m(spec, dtype):
    from hivae_tpu.models import a2m

    model_type = spec["model_type"]
    cfg = a2m.A2MConfig.from_dict(spec.get("model", {}))
    table = {
        "A2MModel_CrossAtten_Audio": lambda: a2m.A2MModelCrossAttnAudio(
            cfg=cfg, variant="audio", dtype=dtype),
        "A2MModel_CrossAtten_Audio_Pose": lambda: a2m.A2MModelCrossAttnAudio(
            cfg=cfg, variant="audio_pose", dtype=dtype),
        "A2MModel_CrossAtten_Pose": lambda: a2m.A2MModelCrossAttnAudio(
            cfg=cfg, variant="pose", dtype=dtype),
        "A2MModel_LearnableToken": lambda: a2m.A2MModelLearnableToken(
            cfg=cfg, dtype=dtype),
        "A2MModel_SimpleAdaLN": lambda: a2m.A2MModelLearnableToken(
            cfg=cfg, simple_adaln=True, dtype=dtype),
        "A2MModel_CrossAtten_Audio_PosePre": lambda: a2m.A2MModelPosePre(
            cfg=cfg, dtype=dtype),
    }
    return table[model_type](), cfg


def main():
    args = parse_args()

    from hivae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from amd_inference import load_amd
    from hivae_tpu.data.datasets import (DataLoader, VideoAudioDataset,
                                         VideoAudioRandomRefDataset)
    from hivae_tpu.models import vae as vae_mod
    from hivae_tpu.parallel import batch_sharding, create_mesh
    from hivae_tpu.training import checkpoint as ckpt_lib
    from hivae_tpu.training.train_state import (TrainState, make_optimizer,
                                                shard_train_step)

    dtype = jnp.bfloat16 if args.mp in ("bf16", "fp16") else jnp.float32
    out_dir = os.path.join(args.output_dir, args.exp_name)
    os.makedirs(out_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)

    # frozen AMD + VAE
    amd_model, amd_params = load_amd(args, dtype)
    vae = vae_mod.AutoencoderKL(dtype=dtype)
    from hivae_tpu.utils.misc import init_on_cpu
    vae_params = init_on_cpu(lambda: vae.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3, args.sample_size, args.sample_size))))
    if args.vae_ckpt:
        from hivae_tpu.utils.torch_convert import (convert_torch_state,
                                                   load_safetensors,
                                                   normalize_vae_keys)
        state = normalize_vae_keys(load_safetensors(args.vae_ckpt))
        vae_params, _ = convert_torch_state(vae_params, state, strict=False)

    # audio decoder under training (json, or the reference's OmegaConf
    # yaml files, e.g. config/a2m/cross_audio_t1d512_l16_dim1024.yaml)
    with open(args.a2m_config) as f:
        text = f.read()
    if args.a2m_config.endswith((".yaml", ".yml")):
        import yaml

        spec = yaml.safe_load(text)
    else:
        spec = json.loads(text)
    a2m_model, a2m_cfg = build_a2m(spec, dtype)
    def _init_a2m():
        # inputs built inside the CPU scope to avoid cross-backend copies
        motion = jnp.zeros((1, args.video_frames, a2m_cfg.motion_num_token,
                            a2m_cfg.motion_in_channel))
        audio = jnp.zeros((1, args.video_frames, a2m_cfg.audio_block,
                           a2m_cfg.audio_inchannel))
        k = jax.random.PRNGKey(args.seed)
        return a2m_model.init({"params": k, "noise": k}, motion,
                              motion[:, 0], audio=audio,
                              ref_audio=audio[:, 0])

    a2m_params = init_on_cpu(_init_a2m)
    ckpt_lib.save_config(spec, out_dir)

    ds_cls = (VideoAudioRandomRefDataset
              if args.dataset == "A2MVideoAudioPoseRandomRef"
              else VideoAudioDataset)
    dataset = ds_cls(args.video_dir,
                     sample_n_frames=args.video_frames,
                     sample_size=args.sample_size)
    loader = DataLoader(dataset, args.train_batch_size,
                        num_workers=args.dataloader_num_workers,
                        shard_id=jax.process_index(),
                        num_shards=jax.process_count())

    mesh = create_mesh()
    tx = make_optimizer(args.learning_rate, args.lr_warmup_steps,
                        args.max_train_steps)
    state = TrainState.create(a2m_params, tx,
                              ema_decay=args.ema_decay)

    def train_step(state, batch, rng, frozen):
        # the frozen VAE/AMD trees ride as replicated ARGUMENTS — closing
        # over them would bake hundreds of MB into the HLO as constants
        # (see models/vae.py jit-entry note) and replicate them outside
        # the sharding system on a multi-device mesh
        rng = jax.random.fold_in(rng, state.step)
        kv, kvr, kp, kpr, kn = jax.random.split(rng, 5)
        gt_z = vae_mod.vae_encode(vae, frozen["vae"], batch["gt_video"], kv)
        # the reference frame is ONE frame repeated by the dataset: encode
        # it once, not n identical copies; and with its own key (a shared
        # key would draw the SAME posterior noise as same-shaped streams)
        ref_z = vae_mod.vae_encode(vae, frozen["vae"],
                                   batch["ref_video"][:, :1], kvr)
        motion_gt = amd_model.apply(frozen["amd"], gt_z,
                                    method="extract_motion")
        ref_motion = amd_model.apply(frozen["amd"], ref_z,
                                     method="extract_motion")[:, 0]

        pose_kw = {}
        if "gt_pose" in batch:  # DWPose stream, VAE-encoded like the video
            pose_kw = dict(
                pose=vae_mod.vae_encode(vae, frozen["vae"],
                                        batch["gt_pose"], kp),
                ref_pose=vae_mod.vae_encode(
                    vae, frozen["vae"], batch["ref_pose"][:, None],
                    kpr)[:, 0])

        def loss_fn(params):
            ld = a2m_model.apply(params, motion_gt, ref_motion,
                                 audio=batch["gt_audio"],
                                 ref_audio=batch["ref_audio"],
                                 mask=batch["mask"], **pose_kw,
                                 rngs={"noise": kn})
            return ld["loss"], ld

        (_, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads)
        metrics = dict(ld)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    ckpt = ckpt_lib.CheckpointManager(os.path.join(out_dir, "checkpoints"),
                                      args.checkpoint_total_limit)
    frozen = {"vae": vae_params, "amd": amd_params}
    with mesh:
        step_fn, state_shardings = shard_train_step(train_step, mesh, state,
                                                    n_extra_replicated=1)
        state = jax.device_put(state, state_shardings)
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
                device_batch = {k: jax.device_put(jnp.asarray(v), b_shard)
                                for k, v in batch.items()
                                if not isinstance(v, list)}
                state, metrics = step_fn(state, device_batch, key, frozen)
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
