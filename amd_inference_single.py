"""Single-pair / cross-video motion-transfer CLI — parity with the reference
``amd_inference_single.py`` (AMDPipeLine_single_cross)."""

import argparse

from amd_inference import load_amd


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--amd_config", type=str, required=True)
    p.add_argument("--amd_ckpt", type=str, required=True)
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--video_path_1", type=str, required=True,
                   help="motion source")
    p.add_argument("--video_path_2", type=str, required=True,
                   help="appearance source")
    p.add_argument("--diff_motion", action="store_true",
                   help="AMDModel diff-motion mode: reconstruct video_2 "
                        "with the camera/LF motion of video_1 "
                        "(reference sample_diff_motion)")
    p.add_argument("--output_path", type=str, default="output/cross.mp4")
    p.add_argument("--video_frames", type=int, default=16)
    p.add_argument("--sample_step", type=int, default=20)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--model_type", type=str, default="AMD_N")
    p.add_argument("--use_ema", action="store_true",
                   help="load the EMA tree from an Orbax checkpoint")
    return p.parse_args()


def main():
    args = parse_args()

    from hivae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from hivae_tpu.models import vae as vae_mod
    from hivae_tpu.pipelines import (AMDCrossVideoPipeline,
                                     AMDDiffMotionPipeline)

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

    use_grey = getattr(model.cfg, "use_grey", False)
    if args.diff_motion:
        from hivae_tpu.models import amd as amd_lib
        if isinstance(model, amd_lib.AMDModelNew):
            raise SystemExit(
                "--diff_motion requires the dual-encoder AMDModel "
                "(--model_type AMD_S or AMD_L): sample_diff_motion's "
                "encode_diff_motion only exists there (reference "
                "AMDModel.sample_diff_motion:598)")
        pipe = AMDDiffMotionPipeline(vae, vae_params, model, params,
                                     window=args.video_frames,
                                     use_grey=use_grey)
        pipe.sample_diff(args.video_path_2, args.video_path_1,
                         args.output_path,
                         video_sample_step=args.sample_step, fps=args.fps)
    else:
        pipe = AMDCrossVideoPipeline(vae, vae_params, model, params,
                                     window=args.video_frames,
                                     use_grey=use_grey)
        pipe.sample_cross(args.video_path_1, args.video_path_2,
                          args.output_path,
                          video_sample_step=args.sample_step, fps=args.fps)
    print("saved:", args.output_path)


if __name__ == "__main__":
    main()
