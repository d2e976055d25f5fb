"""AMD trainer CLI — argparse-compatible with the reference ``train_amd.py``.

Builds the model from flags (or ``--amd_config`` json / reloads a reference
checkpoint), a frozen SD-VAE, the video dataset, and runs the sharded TPU
training loop. Flags keep the reference's names (``train_amd.py:38-138``)
so the shipped launcher scripts translate directly.
"""

import argparse
import json
import os


def str2bool(v):
    if isinstance(v, bool):
        return v
    return v.lower() in ("yes", "true", "t", "y", "1")


def parse_args():
    p = argparse.ArgumentParser()
    # run
    p.add_argument("--output_dir", type=str, default="exp/amd")
    p.add_argument("--exp_name", type=str, default="amd")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mp", type=str, default="bf16",
                   choices=["bf16", "fp16", "no"])
    p.add_argument("--max_train_steps", type=int, default=100_000)
    p.add_argument("--train_batch_size", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--lr_scheduler", type=str, default="constant")
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--save_checkpoint_interval_step", type=int, default=2000)
    p.add_argument("--checkpoint_total_limit", type=int, default=2)
    p.add_argument("--eval_interval_step", type=int, default=2000)
    p.add_argument("--resume_training", type=str2bool, default=False)
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace for N steps")
    p.add_argument("--mu_dtype", type=str, default=None,
                   choices=[None, "bf16"],
                   help="bf16 Adam moments halve optimizer HBM")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--transfer_dtype", type=str, default="fp32",
                   choices=["fp32", "bf16"],
                   help="host->device batch dtype; bf16 halves upload "
                        "bytes (identical numerics under --mp bf16)")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="EMA of params (e.g. 0.999); validation samples "
                        "with the EMA weights, checkpoints carry both "
                        "trees. 0 disables")
    p.add_argument("--nan_policy", type=str, default="none",
                   choices=["none", "halt", "skip"],
                   help="non-finite loss handling: halt = dump batch + "
                        "raise (reference assert semantics), skip = drop "
                        "the step on device and continue")
    p.add_argument("--mesh", type=str, default=None,
                   help="data,fsdp,tensor e.g. '4,2,1'; default all-data")
    # model
    p.add_argument("--model_type", type=str, default="AMD_N")
    p.add_argument("--amd_config", type=str, default=None)
    p.add_argument("--pretrain_path", type=str, default=None)
    p.add_argument("--video_frames", type=int, default=16)
    p.add_argument("--image_height", type=int, default=32)
    p.add_argument("--image_width", type=int, default=32)
    p.add_argument("--use_filter", type=str2bool, default=True)
    p.add_argument("--use_grey", type=str2bool, default=True)
    p.add_argument("--use_camera", type=str2bool, default=True)
    p.add_argument("--use_object", type=str2bool, default=True)
    p.add_argument("--use_camera_down", type=str2bool, default=False)
    p.add_argument("--use_regularizers", type=str2bool, default=False)
    p.add_argument("--motion_type", type=str, default="plus")
    p.add_argument("--diffusion_model_type", type=str, default="spatial")
    p.add_argument("--object_motion_token_num", type=int, default=4)
    p.add_argument("--object_motion_token_channel", type=int, default=512)
    p.add_argument("--camera_motion_token_num", type=int, default=16)
    p.add_argument("--camera_motion_token_channel", type=int, default=16)
    p.add_argument("--motion_token_num", type=int, default=4)
    p.add_argument("--motion_token_channel", type=int, default=512)
    p.add_argument("--camera_mask_ratio", type=float, default=None)
    p.add_argument("--object_mask_ratio", type=float, default=None)
    p.add_argument("--use_mask", type=str2bool, default=False,
                   help="optical-flow camera_mask: dataset computes it and "
                        "the model multiplies the LF band by it before the "
                        "camera encoder (reference train_amd.py:67,433 -> "
                        "model_AMD.py:314/1137). The reference defaults this "
                        "to True but only the AMDModel/Camera variants "
                        "consume it; off by default here")
    p.add_argument("--mask_video_ratio", type=float, default=0.5,
                   help="flow_mask camera-region budget (reference "
                        "dataset.py:38)")
    # architecture depth/width overrides (tiny-config and ablation support)
    p.add_argument("--object_enc_num_layers", type=int, default=8)
    p.add_argument("--camera_enc_num_layers", type=int, default=8)
    p.add_argument("--enc_nhead", type=int, default=8)
    p.add_argument("--enc_ndim", type=int, default=64)
    p.add_argument("--diffusion_num_layers", type=int, default=12)
    p.add_argument("--diffusion_attn_num_heads", type=int, default=16)
    p.add_argument("--diffusion_attn_head_dim", type=int, default=64)
    p.add_argument("--image_patch_size", type=int, default=2)
    p.add_argument("--remat", type=str2bool, default=False)
    p.add_argument("--remat_policy", type=str, default="full",
                   choices=["full", "dots", "dots_sans_ffn", "dots_offload"],
                   help="'dots' keeps matmul outputs through the remat "
                        "(more HBM, higher MFU); 'dots_sans_ffn' drops only "
                        "the 4x-wide FFN up-projection from the saved set "
                        "(batch 2 at 696M); 'dots_offload' keeps dot "
                        "outputs in host memory (native TPU hosts only: "
                        "relayed remote compilers reject pinned_host "
                        "memory spaces)")
    p.add_argument("--scan_layers", type=str2bool, default=False,
                   help="nn.scan-stack DiT layers (faster compiles)")
    p.add_argument("--attn_impl", type=str, default="auto",
                   choices=["auto", "xla", "pallas", "ring"],
                   help="attention kernel; 'auto' = XLA under 512 tokens, "
                        "fused Pallas above; 'ring' = sequence-sharded over "
                        "the mesh tensor axis (long-window scaling)")
    # data
    p.add_argument("--dataset", type=str, default="AMDConsecutiveVideo")
    p.add_argument("--video_dir", type=str, required=True)
    p.add_argument("--sample_fps", type=int, default=8)
    p.add_argument("--sample_size", type=int, default=256)
    p.add_argument("--dataloader_num_workers", type=int, default=8)
    # vae
    p.add_argument("--vae_ckpt", type=str, default=None,
                   help="sd-vae safetensors; random weights if omitted")
    return p.parse_args()


def build_model(args, dtype):
    from hivae_tpu.models import amd

    if args.amd_config:
        with open(args.amd_config) as f:
            cfg = amd.AMDConfig.from_dict(json.load(f))
        cls = amd.AMDModelNew if args.model_type == "AMD_N" else amd.AMDModel
        return cls(cfg=cfg, dtype=dtype)
    kw = dict(video_frames=args.video_frames,
              image_height=args.image_height, image_width=args.image_width,
              use_filter=args.use_filter, use_grey=args.use_grey,
              use_camera=args.use_camera, use_object=args.use_object,
              use_camera_down=args.use_camera_down,
              use_regularizers=args.use_regularizers,
              motion_type=args.motion_type,
              diffusion_model_type=args.diffusion_model_type,
              object_motion_token_num=args.object_motion_token_num,
              object_motion_token_channel=args.object_motion_token_channel,
              camera_motion_token_num=args.camera_motion_token_num,
              camera_motion_token_channel=args.camera_motion_token_channel,
              motion_token_num=args.motion_token_num,
              motion_token_channel=args.motion_token_channel,
              object_enc_num_layers=args.object_enc_num_layers,
              camera_enc_num_layers=args.camera_enc_num_layers,
              image_patch_size=args.image_patch_size,
              remat=args.remat, remat_policy=args.remat_policy,
              scan_layers=args.scan_layers,
              use_mask=args.use_mask,
              attn_impl=args.attn_impl)
    cls = {"AMD_N": amd.AMDModelNew, "AMD_S": amd.AMDModel,
           "AMD_L": amd.AMDModel}.get(args.model_type)
    if cls is None:
        return amd.AMD_MODELS[args.model_type](dtype=dtype, **kw)
    cfg = amd.AMDConfig(
        enc_nhead=args.enc_nhead, enc_ndim=args.enc_ndim,
        diffusion_attn_head_dim=args.diffusion_attn_head_dim,
        diffusion_attn_num_heads=args.diffusion_attn_num_heads,
        diffusion_num_layers=args.diffusion_num_layers, **kw)
    return cls(cfg=cfg, dtype=dtype)


def main():
    args = parse_args()

    import jax

    if os.environ.get("HIVAE_MULTIHOST") == "1":
        # multihost pod: one process per host; the mesh spans all devices.
        # On TPU pods initialize() autodetects the topology; for explicit
        # topologies (and the CPU-based multiprocess test) set
        # HIVAE_COORDINATOR / HIVAE_NUM_PROCESSES / HIVAE_PROCESS_ID.
        # See docs/MULTIHOST.md.
        kw = {}
        if os.environ.get("HIVAE_COORDINATOR"):
            kw = dict(
                coordinator_address=os.environ["HIVAE_COORDINATOR"],
                num_processes=int(os.environ["HIVAE_NUM_PROCESSES"]),
                process_id=int(os.environ["HIVAE_PROCESS_ID"]))
        jax.distributed.initialize(**kw)
    import jax.numpy as jnp

    from hivae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from tensorboardX import SummaryWriter

    from hivae_tpu.data.datasets import DataLoader, RandomPairDataset, \
        VideoClipDataset
    from hivae_tpu.models import vae as vae_mod
    from hivae_tpu.training import checkpoint as ckpt_lib
    from hivae_tpu.training.trainer import AMDTrainer, TrainConfig

    dtype = jnp.bfloat16 if args.mp in ("bf16", "fp16") else jnp.float32
    out_dir = os.path.join(args.output_dir, args.exp_name)
    os.makedirs(out_dir, exist_ok=True)

    # model + vae
    model = build_model(args, dtype)
    from hivae_tpu.utils.misc import init_on_cpu

    def _init_model():
        # inputs built inside the CPU scope: mixing device-resident arrays
        # into a CPU-eager init forces cross-backend copies.
        key = jax.random.PRNGKey(args.seed)
        lh, lw = args.image_height, args.image_width
        dummy = jnp.zeros((1, args.video_frames, 4, lh, lw))
        init_kw = {}
        if getattr(model.cfg, "use_grey", False):
            init_kw = dict(video_grey=dummy, ref_img_grey=dummy)
        if getattr(model.cfg, "use_mask", False):
            init_kw["camera_mask"] = jnp.ones(
                (1, 2 * args.video_frames, 4, lh, lw))
        return model.init({"params": key, "noise": key}, dummy, dummy,
                          **init_kw)

    params = init_on_cpu(_init_model)
    key = jax.random.PRNGKey(args.seed)
    if args.pretrain_path:
        params, report = ckpt_lib.load_pretrain_partial(params,
                                                        args.pretrain_path)
        print(f"loaded pretrain: {len(report['missing'])} missing keys")
    ckpt_lib.save_config(model.cfg.to_dict(), out_dir)
    from hivae_tpu.utils.misc import print_param_num, save_args
    save_args(args, out_dir)
    print_param_num(args.model_type, params)

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

    # data
    ds_cls = {"AMDConsecutiveVideo": VideoClipDataset,
              "AMDRandomPair": RandomPairDataset}[args.dataset]
    dataset = ds_cls(args.video_dir, sample_n_frames=args.video_frames,
                     sample_size=args.sample_size, target_fps=args.sample_fps,
                     use_grey=getattr(model.cfg, "use_grey", False),
                     use_mask=getattr(model.cfg, "use_mask", False),
                     mask_video_ratio=args.mask_video_ratio,
                     mask_latent_size=(model.cfg.image_height,
                                       model.cfg.image_width),
                     mask_latent_channels=model.cfg.image_inchannel,
                     seed=args.seed)
    loader = DataLoader(dataset, args.train_batch_size,
                        num_workers=args.dataloader_num_workers,
                        seed=args.seed, shard_id=jax.process_index(),
                        num_shards=jax.process_count())

    mesh_shape = tuple(int(x) for x in args.mesh.split(",")) if args.mesh \
        else None
    config = TrainConfig(
        output_dir=out_dir, learning_rate=args.learning_rate,
        warmup_steps=args.lr_warmup_steps, lr_schedule=args.lr_scheduler,
        weight_decay=args.adam_weight_decay,
        max_grad_norm=args.max_grad_norm, max_steps=args.max_train_steps,
        save_every=args.save_checkpoint_interval_step,
        eval_every=args.eval_interval_step,
        checkpoint_total_limit=args.checkpoint_total_limit, seed=args.seed,
        mesh_shape=mesh_shape, resume=args.resume_training,
        camera_mask_ratio=args.camera_mask_ratio,
        object_mask_ratio=args.object_mask_ratio,
        profile_steps=args.profile_steps, mu_dtype=args.mu_dtype,
        accumulate_steps=args.gradient_accumulation_steps,
        nan_policy=args.nan_policy, ema_decay=args.ema_decay,
        transfer_dtype=args.transfer_dtype)

    tb = SummaryWriter(os.path.join(out_dir, "tracker")) \
        if jax.process_index() == 0 else None
    trainer = AMDTrainer(model, params, vae, vae_params, config, tb_writer=tb)

    def batch_stream():
        while True:
            for batch in loader:
                yield batch

    metrics = trainer.fit(batch_stream())
    trainer.save()
    print("final metrics:", metrics)


if __name__ == "__main__":
    main()
