"""Convert a reference torch safetensors checkpoint into a native Orbax
checkpoint (and validate the key mapping).

Usage:
  python convert_checkpoint.py --kind amd --config config.json \\
      --src model.safetensors --dst ckpt/converted
  python convert_checkpoint.py --kind vae --src sd-vae.safetensors --dst ...
"""

import argparse
import json


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--kind", type=str, required=True,
                   choices=["amd", "amd_new", "vae", "a2m"])
    p.add_argument("--config", type=str, default=None,
                   help="config.json for model kinds")
    p.add_argument("--src", type=str, required=True)
    p.add_argument("--dst", type=str, required=True)
    p.add_argument("--strict", action="store_true")
    return p.parse_args()


def build_template(args):
    # key/dummies are created inside the init_on_cpu scope so every eager
    # init op stays on the host backend (no cross-backend copies).
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)

    if args.kind == "vae":
        from hivae_tpu.models import vae as vae_mod

        model = vae_mod.AutoencoderKL()
        return model.init(key, jnp.zeros((1, 3, 256, 256)))

    with open(args.config) as f:
        cfg_dict = json.load(f)

    if args.kind in ("amd", "amd_new"):
        from hivae_tpu.models import amd

        cfg = amd.AMDConfig.from_dict(cfg_dict)
        cls = amd.AMDModelNew if args.kind == "amd_new" else amd.AMDModel
        model = cls(cfg=cfg)
        lh, lw = cfg.image_height, cfg.image_width
        dummy = jnp.zeros((1, cfg.video_frames, cfg.image_inchannel,
                           lh, lw))
        kw = dict(video_grey=dummy, ref_img_grey=dummy) if cfg.use_grey else {}
        return model.init({"params": key, "noise": key}, dummy, dummy, **kw)

    from hivae_tpu.models import a2m

    cfg = a2m.A2MConfig.from_dict(cfg_dict.get("model", cfg_dict))
    model = a2m.A2MModelCrossAttnAudio(cfg=cfg, variant="audio")
    motion = jnp.zeros((1, 4, cfg.motion_num_token, cfg.motion_in_channel))
    audio = jnp.zeros((1, 4, cfg.audio_block, cfg.audio_inchannel))
    return model.init({"params": key, "noise": key}, motion, motion[:, 0],
                      audio=audio, ref_audio=audio[:, 0])


def main():
    args = parse_args()

    from hivae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    import orbax.checkpoint as ocp

    from hivae_tpu.utils.torch_convert import (convert_torch_state,
                                               load_safetensors,
                                               normalize_vae_keys)

    from hivae_tpu.utils.misc import init_on_cpu

    template = init_on_cpu(build_template, args)
    state = load_safetensors(args.src)
    if args.kind == "vae":
        state = normalize_vae_keys(state)
    params, report = convert_torch_state(template, state, strict=args.strict)
    print(f"converted: {len(state) - len(report['unused'])} keys used, "
          f"{len(report['missing'])} flax leaves missing, "
          f"{len(report['unused'])} torch keys unused")
    if report["missing"]:
        print("missing (first 10):", report["missing"][:10])
    if report["unused"]:
        print("unused (first 10):", report["unused"][:10])
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(args.dst, params)
    ckptr.wait_until_finished()  # the save is async; block before exit
    print("saved:", args.dst)


if __name__ == "__main__":
    main()
