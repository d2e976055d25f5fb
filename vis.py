"""Pose-predictor visualization CLI — parity with the reference ``vis.py``:
load an A2M PosePre model, run the audio->pose head over (audio embedding,
pose video) pairs, VAE-decode the predicted pose latents and write a
side-by-side frame grid video (frames tiled as ``f h (b w) c``)."""

import argparse
import glob
import json
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--a2m_config", type=str, required=True,
                   help="json: {model_type, model: {...}} (PosePre)")
    p.add_argument("--a2m_ckpt", type=str, default=None,
                   help="Orbax dir or .safetensors (optional: random init)")
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--audio_emb_dir", type=str, required=True,
                   help="*.npy whisper embeddings, (T, M, D)")
    p.add_argument("--pose_video_dir", type=str, required=True,
                   help="pose mp4s named like the embeddings")
    p.add_argument("--output_path", type=str, default="pose_vis.mp4")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--sample_frames", type=int, default=17)
    p.add_argument("--sample_size", type=int, default=256)
    p.add_argument("--fps", type=int, default=8)
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hivae_tpu.data import video as vio
    from hivae_tpu.models import vae as vae_mod
    from hivae_tpu.training import checkpoint as ckpt_lib
    from hivae_tpu.utils.cache import enable_compile_cache
    from hivae_tpu.utils.misc import init_on_cpu
    from train_a2m import build_a2m

    enable_compile_cache()
    dtype = jnp.float32

    with open(args.a2m_config) as f:
        spec = json.load(f)
    model, cfg = build_a2m(spec, dtype)

    def _init():
        k = jax.random.PRNGKey(0)
        f = args.sample_frames - 1
        motion = jnp.zeros((1, f, cfg.motion_num_token, cfg.motion_in_channel))
        audio = jnp.zeros((1, f, cfg.audio_block, cfg.audio_inchannel))
        pose = jnp.zeros((1, f, cfg.pose_inchannel, cfg.pose_height,
                          cfg.pose_width))
        return model.init({"params": k, "noise": k}, motion, motion[:, 0],
                          audio=audio, ref_audio=audio[:, 0], pose=pose,
                          ref_pose=pose[:, 0])

    params = init_on_cpu(_init)
    if args.a2m_ckpt:
        if args.a2m_ckpt.endswith(".safetensors"):
            params, _ = ckpt_lib.load_pretrain_partial(params, args.a2m_ckpt)
        else:
            import orbax.checkpoint as ocp
            path = (ckpt_lib.find_latest_checkpoint(args.a2m_ckpt)
                    or args.a2m_ckpt)
            # train_a2m checkpoints hold a full TrainState ({step, params,
            # opt_state, ema_params}) — restore WITHOUT a bare-params
            # template (structure mismatch) and unwrap, like
            # a2v_inference.load_a2m
            restored = ocp.StandardCheckpointer().restore(path)
            params = restored.get("params", restored) \
                if hasattr(restored, "get") else restored
            if "params" not in params:
                params = {"params": params}

    vae = vae_mod.AutoencoderKL(dtype=dtype)
    vae_params = init_on_cpu(lambda: vae.init(jax.random.PRNGKey(0),
                                              jnp.zeros((1, 3, 256, 256))))
    if args.vae_ckpt:
        from hivae_tpu.utils.torch_convert import (convert_torch_state,
                                                   load_safetensors,
                                                   normalize_vae_keys)
        state = normalize_vae_keys(load_safetensors(args.vae_ckpt))
        vae_params, _ = convert_torch_state(vae_params, state, strict=False)

    # pair embeddings with same-named pose videos (reference vis.py:27-47)
    embs = sorted(glob.glob(os.path.join(args.audio_emb_dir,
                                         "*.npy")))[:args.batch]
    afs, pvs = [], []
    for e in embs:
        name = os.path.splitext(os.path.basename(e))[0]
        if name.endswith("_emb"):  # legacy embedding suffix
            name = name[:-4]
        vp = os.path.join(args.pose_video_dir, name + ".mp4")
        af = np.load(e)
        total, _ = vio.video_metadata(vp)
        usable = min(len(af), total)
        assert usable >= args.sample_frames, f"{name}: too short"
        s = np.random.randint(0, usable - args.sample_frames + 1)
        idx = list(range(s, s + args.sample_frames))
        afs.append(af[idx])
        frames = vio.read_video_frames(vp, idx)
        pvs.append(vio.pixel_transform(frames, args.sample_size))
    afs = jnp.asarray(np.stack(afs), dtype)
    pvs = jnp.asarray(np.stack(pvs), dtype)

    @jax.jit
    def predict(vae_p, a2m_p, audio_emb, pose_pixels):
        ref_pose_z = vae_mod.vae_encode(vae, vae_p, pose_pixels[:, :1])[:, 0]
        pose_pre = model.apply(a2m_p, audio_emb[:, 1:], audio_emb[:, 0],
                               ref_pose_z, method="predict_pose")
        return vae_mod.vae_decode_rgb(vae, vae_p, pose_pre)

    vis = np.asarray(predict(vae_params, params, afs, pvs))  # (B,F,C,H,W)
    grid = vis.transpose(1, 3, 0, 4, 2)  # f h b w c
    grid = grid.reshape(grid.shape[0], grid.shape[1], -1, grid.shape[-1])
    vio.write_video(args.output_path, grid.transpose(0, 3, 1, 2),
                    fps=args.fps)
    print("saved:", args.output_path)


if __name__ == "__main__":
    main()
