"""Offline frequency-band decode visualizer — parity with the reference
``frenquence_filter_decode.py``: VAE-encode a clip, split latents into
low/high bands at a given cutoff, decode each band back to pixels, and write
side-by-side mp4s. (BASELINE config 3 surface.)"""

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--video_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="freq_out")
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--cutoff", type=float, default=0.5)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--mode", type=str, default="fft",
                   choices=["fft", "wavelet"])
    return p.parse_args()


def main():
    args = parse_args()

    from hivae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hivae_tpu.data import video as vio
    from hivae_tpu.models import vae as vae_mod
    from hivae_tpu.ops import frequency, wavelet

    from hivae_tpu.utils.misc import init_on_cpu
    vae = vae_mod.AutoencoderKL()
    vae_params = init_on_cpu(lambda: vae.init(jax.random.PRNGKey(0),
                                              jnp.zeros((1, 3, 256, 256))))
    if args.vae_ckpt:
        from hivae_tpu.utils.torch_convert import (convert_torch_state,
                                                   load_safetensors,
                                                   normalize_vae_keys)
        state = normalize_vae_keys(load_safetensors(args.vae_ckpt))
        vae_params, _ = convert_torch_state(vae_params, state, strict=False)

    # commit once: a host tree re-uploads in full on every decode dispatch
    # (one per band here; utils/misc.py::commit_to_device)
    from hivae_tpu.utils.misc import commit_to_device
    vae_params = commit_to_device(vae_params)

    total, fps = vio.video_metadata(args.video_path)
    idx = vio.sample_frames_with_fps(total, fps, args.frames, args.fps,
                                     start_index=0)
    frames = vio.read_video_frames(args.video_path, idx)
    pixels = vio.pixel_transform(frames)
    z = vae_mod.vae_encode_jit(vae, vae_params, jnp.asarray(pixels)[None])

    os.makedirs(args.output_dir, exist_ok=True)
    name = os.path.splitext(os.path.basename(args.video_path))[0]

    if args.mode == "fft":
        @jax.jit
        def fft_bands(z):
            zc = z.transpose(0, 2, 1, 3, 4)  # n c t h w
            low, high = frequency.freq_3d_split(zc, args.cutoff, args.cutoff)
            return (low.transpose(0, 2, 1, 3, 4),
                    high.transpose(0, 2, 1, 3, 4))
        low, high = fft_bands(z)
        bands = {"low": low, "high": high}
    else:
        @jax.jit
        def dwt_bands(z):
            ll, hl, lh, hh = wavelet.dwt2(z[0])
            up = lambda b: jnp.repeat(jnp.repeat(b, 2, -2), 2, -1)
            return tuple(up(b)[None] for b in (ll, hl, lh, hh))
        bands = dict(zip(("ll", "hl", "lh", "hh"), dwt_bands(z)))

    for band, lat in bands.items():
        out = np.asarray(vae_mod.vae_decode_rgb_jit(vae, vae_params, lat)[0])
        path = os.path.join(args.output_dir,
                            f"{name}_{args.mode}_{band}.mp4")
        vio.write_video(path, out, fps=args.fps)
        print("saved:", path)


if __name__ == "__main__":
    main()
