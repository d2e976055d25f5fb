"""Reconstruction quality evaluation CLI.

Computes PSNR and SSIM (and LPIPS when weights are provided) between AMD
reconstructions and ground-truth clips over a directory of videos — the
working replacement for the reference's commented-out ``model/metric.py``
(BASELINE: PSNR within 0.1 dB of the reference)."""

import argparse
import glob
import json
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--amd_config", type=str, required=True)
    p.add_argument("--amd_ckpt", type=str, required=True)
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--lpips_vgg", type=str, default=None,
                   help="torchvision vgg16 state dict (optional)")
    p.add_argument("--lpips_head", type=str, default=None,
                   help="LPIPS vgg.pth head checkpoint (optional)")
    p.add_argument("--video_dir", type=str, required=True)
    p.add_argument("--video_frames", type=int, default=16)
    p.add_argument("--sample_step", type=int, default=20)
    p.add_argument("--max_videos", type=int, default=50)
    p.add_argument("--model_type", type=str, default="AMD_N")
    p.add_argument("--output_json", type=str, default=None)
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from amd_inference import load_amd
    from hivae_tpu.data import video as vio
    from hivae_tpu.models import amd as amd_mod
    from hivae_tpu.models import vae as vae_mod
    from hivae_tpu.utils import metrics as M
    from hivae_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    dtype = jnp.bfloat16
    model, params = load_amd(args, dtype)
    from hivae_tpu.utils.misc import init_on_cpu
    vae = vae_mod.AutoencoderKL(dtype=dtype)
    vae_params = init_on_cpu(lambda: vae.init(jax.random.PRNGKey(0),
                                              jnp.zeros((1, 3, 256, 256))))
    if args.vae_ckpt:
        from hivae_tpu.utils.torch_convert import (convert_torch_state,
                                                   load_safetensors,
                                                   normalize_vae_keys)
        state = normalize_vae_keys(load_safetensors(args.vae_ckpt))
        vae_params, _ = convert_torch_state(vae_params, state, strict=False)

    lpips = lpips_params = None
    if args.lpips_vgg:
        from hivae_tpu.losses import LPIPS
        from hivae_tpu.utils.torch_convert import (convert_torch_state,
                                                   load_safetensors)

        lpips = LPIPS()
        lp = lpips.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)),
                        jnp.zeros((1, 3, 64, 64)))
        vgg = {f"net.{k}": v for k, v in
               load_safetensors(args.lpips_vgg).items()}
        if args.lpips_head:
            vgg.update(load_safetensors(args.lpips_head))
        lpips_params, _ = convert_torch_state(lp, vgg, strict=False)

    # commit once: host trees re-upload in full on every per-clip dispatch
    # (utils/misc.py::commit_to_device)
    from hivae_tpu.utils.misc import commit_to_device
    params = commit_to_device(params)
    vae_params = commit_to_device(vae_params)
    if lpips_params is not None:
        lpips_params = commit_to_device(lpips_params)

    use_grey = getattr(model.cfg, "use_grey", False)
    videos = sorted(glob.glob(os.path.join(args.video_dir, "**", "*.mp4"),
                              recursive=True))[:args.max_videos]
    psnr_j = jax.jit(M.psnr)
    ssim_j = jax.jit(M.ssim)
    lpips_j = jax.jit(M.lpips_distance, static_argnums=(0,)) \
        if lpips is not None else None
    psnrs, ssims, lpips_vals = [], [], []
    for i, vp in enumerate(videos):
        try:
            total, fps = vio.video_metadata(vp)
            idx = vio.sample_frames_with_fps(total, fps,
                                             args.video_frames + 1, 8,
                                             start_index=0)
            frames = vio.read_video_frames(vp, idx)
            pixels = vio.pixel_transform(frames)
            z = vae_mod.vae_encode_jit(vae, vae_params, jnp.asarray(pixels)[None])
            gt_z = z[:, 1:]
            ref = jnp.broadcast_to(z[:, :1], gt_z.shape)
            kw = {}
            if use_grey:
                grey = vio.pixel_transform(vio.to_grayscale(frames))
                gz = vae_mod.vae_encode_jit(vae, vae_params,
                                        jnp.asarray(grey)[None])
                kw = dict(video_grey=gz[:, 1:],
                          ref_img_grey=jnp.broadcast_to(gz[:, :1],
                                                        gt_z.shape))
            _, rec_z, _ = amd_mod.sample_jit(model, params, jax.random.PRNGKey(i),
                                         gt_z, ref,
                                         sample_step=args.sample_step, **kw)
            rec = vae_mod.vae_decode_jit(vae, vae_params, rec_z)
            gt = jnp.asarray(pixels[1:])[None]
            psnr = float(psnr_j(rec, gt))
            psnrs.append(psnr)
            sv = float(ssim_j(rec, gt))
            ssims.append(sv)
            line = f"[{i+1}/{len(videos)}] {os.path.basename(vp)}: " \
                   f"PSNR {psnr:.2f} dB  SSIM {sv:.4f}"
            if lpips is not None:
                lv = float(lpips_j(lpips, lpips_params, rec, gt))
                lpips_vals.append(lv)
                line += f"  LPIPS {lv:.4f}"
            print(line)
        except Exception as e:
            print(f"FAILED {vp}: {e}")

    result = {"psnr_mean": float(np.mean(psnrs)) if psnrs else None,
              "psnr_std": float(np.std(psnrs)) if psnrs else None,
              "ssim_mean": float(np.mean(ssims)) if ssims else None,
              "lpips_mean": float(np.mean(lpips_vals)) if lpips_vals else None,
              "num_videos": len(psnrs)}
    print(json.dumps(result))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
