"""Offline motion-token extraction CLI — parity with the reference
``extract_motion.py``: iterate a video list, extract object-motion tokens
with a frozen AMD model, save per-video arrays."""

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--amd_config", type=str, required=True)
    p.add_argument("--amd_ckpt", type=str, required=True)
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--video_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="motion_out")
    p.add_argument("--video_frames", type=int, default=16)
    p.add_argument("--chunk_frames", type=int, default=16,
                   help="frames per device call (reference cat_video)")
    p.add_argument("--model_type", type=str, default="AMD_N")
    return p.parse_args()


def main():
    args = parse_args()

    from hivae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    import glob

    import jax
    import jax.numpy as jnp
    import numpy as np

    from amd_inference import load_amd
    from hivae_tpu.data import video as vio
    from hivae_tpu.models import vae as vae_mod

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

    # commit once: host trees re-upload in full on every per-clip dispatch
    # (utils/misc.py::commit_to_device)
    from hivae_tpu.utils.misc import commit_to_device
    params = commit_to_device(params)
    vae_params = commit_to_device(vae_params)

    # the library wrapper keeps params a traced argument — a lambda
    # closing over them would bake the checkpoint into the HLO as
    # constants (models/vae.py jit-entry note)
    from hivae_tpu.models.amd import extract_motion_jit
    extract = lambda z: extract_motion_jit(model, params, z)
    os.makedirs(args.output_dir, exist_ok=True)
    videos = sorted(glob.glob(os.path.join(args.video_dir, "**", "*.mp4"),
                              recursive=True))
    for vp in videos:
        try:
            total, fps = vio.video_metadata(vp)
            idx = vio.sample_frames_with_fps(total, fps, args.video_frames,
                                             8, start_index=0)
            frames = vio.read_video_frames(vp, idx)
            pixels = vio.pixel_transform(frames)
            z = vae_mod.vae_encode_jit(vae, vae_params, jnp.asarray(pixels)[None])
            # chunked extraction (reference model/utils.py:19-37 cat_video)
            chunks = [extract(z[:, s:s + args.chunk_frames])
                      for s in range(0, z.shape[1], args.chunk_frames)]
            motion = np.concatenate([np.asarray(c) for c in chunks], axis=1)
            name = os.path.splitext(os.path.basename(vp))[0]
            np.save(os.path.join(args.output_dir, f"{name}_motion.npy"),
                    motion)
            print(f"{vp}: motion {motion.shape}")
        except Exception as e:
            print(f"FAILED {vp}: {e}")


if __name__ == "__main__":
    main()
