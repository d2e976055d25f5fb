"""Audio-driven video generation CLI: reference image + audio -> talking video.

The user-facing driver for the windowed autoregressive A2V pipeline
(reference ``ImageAudio2VideoPipeLine``, ``model/pipeline.py:1217-1528``,
which the reference runs from ad-hoc scripts): loads the frozen AMD motion
decoder, the trained A2M head, and the SD-VAE; consumes a reference image
plus per-frame whisper embeddings (``get_whisper_emb.py`` output, .npy);
writes the generated video with the driving audio muxed in
(``--audio_wav``; reference ``export_video_with_audio:210-263``).
"""

import argparse
import json
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--amd_config", type=str, required=True)
    p.add_argument("--amd_ckpt", type=str, required=True)
    p.add_argument("--a2m_config", type=str, required=True,
                   help="json/yaml {model_type, model:{...}} (train_a2m "
                        "writes it next to checkpoints)")
    p.add_argument("--a2m_ckpt", type=str, required=True)
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--model_type", type=str, default="AMD_N")
    p.add_argument("--ref_image", type=str, required=True)
    p.add_argument("--audio_emb", type=str, required=True,
                   help=".npy per-frame whisper embedding (T, M, D)")
    p.add_argument("--audio_wav", type=str, default=None,
                   help="driving .wav to mux into the output video")
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--window", type=int, default=16)
    p.add_argument("--a2m_ref_num_frame", type=int, default=8)
    p.add_argument("--sample_size", type=int, default=256)
    p.add_argument("--video_frames", type=int, default=None,
                   help="AMD temporal geometry; defaults to --window "
                        "(they must agree: the model is built for "
                        "video_frames-frame windows)")
    p.add_argument("--motion_sample_step", type=int, default=8)
    p.add_argument("--video_sample_step", type=int, default=20)
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--quant", type=str, default=None, choices=["int8"],
                   help="int8: run the AMD DiT Euler loop's large "
                        "projections on the int8 MXU (ops/quant.py)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def load_a2m(args, dtype):
    import jax
    import jax.numpy as jnp

    from hivae_tpu.utils.misc import init_on_cpu
    from train_a2m import build_a2m

    with open(args.a2m_config) as f:
        text = f.read()
    if args.a2m_config.endswith((".yaml", ".yml")):
        import yaml

        spec = yaml.safe_load(text)
    else:
        spec = json.loads(text)
    model, cfg = build_a2m(spec, dtype)

    def _init():
        key = jax.random.PRNGKey(0)
        motion = jnp.zeros((1, args.video_frames, cfg.motion_num_token,
                            cfg.motion_in_channel))
        audio = jnp.zeros((1, args.video_frames, cfg.audio_block,
                           cfg.audio_inchannel))
        return model.init({"params": key, "noise": key}, motion,
                          motion[:, 0], audio=audio, ref_audio=audio[:, 0])

    params = init_on_cpu(_init)

    from hivae_tpu.training import checkpoint as ckpt_lib

    if args.a2m_ckpt.endswith(".safetensors"):
        params, report = ckpt_lib.load_pretrain_partial(params,
                                                        args.a2m_ckpt)
        print(f"converted torch a2m checkpoint; "
              f"missing={len(report['missing'])}")
    else:
        import orbax.checkpoint as ocp

        path = ckpt_lib.find_latest_checkpoint(args.a2m_ckpt) or \
            args.a2m_ckpt
        restored = ocp.StandardCheckpointer().restore(path)
        key = "ema_params" if (args.use_ema and isinstance(restored, dict)
                               and restored.get("ema_params") is not None) \
            else "params"
        params = restored.get(key, restored) if hasattr(restored, "get") \
            else restored
        if "params" not in params:
            params = {"params": params}
    return model, params


def main():
    args = parse_args()
    if args.video_frames is None:
        args.video_frames = args.window
    elif args.video_frames != args.window:
        raise SystemExit(
            f"--video_frames {args.video_frames} != --window "
            f"{args.window}: the AMD model's temporal geometry must match "
            "the pipeline's window (pass only --window)")

    from hivae_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from amd_inference import load_amd
    from hivae_tpu.models import vae as vae_mod
    from hivae_tpu.pipelines import ImageAudio2VideoPipeline
    from hivae_tpu.utils.misc import init_on_cpu

    dtype = jnp.bfloat16
    amd_model, amd_params = load_amd(args, dtype)
    a2m_model, a2m_params = load_a2m(args, dtype)

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

    pipe = ImageAudio2VideoPipeline(
        vae, vae_params, amd_model, amd_params, a2m_model, a2m_params,
        window=args.window, a2m_ref_num_frame=args.a2m_ref_num_frame,
        sample_size=args.sample_size, quant=args.quant)

    audio_emb = np.load(args.audio_emb)
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    out = pipe.sample(args.ref_image, audio_emb, output_path=None,
                      motion_sample_step=args.motion_sample_step,
                      video_sample_step=args.video_sample_step,
                      fps=args.fps, key=jax.random.PRNGKey(args.seed),
                      max_frames=args.max_frames)
    # write here so the path actually produced is the one reported —
    # muxing without ffmpeg switches the container to .avi
    from hivae_tpu.data import video as vio

    written = vio.write_video(args.output, out, fps=args.fps,
                              audio_path=args.audio_wav)
    print(f"generated {out.shape[0]} frames -> {written}"
          f"{' (audio muxed)' if args.audio_wav else ''}")


if __name__ == "__main__":
    main()
