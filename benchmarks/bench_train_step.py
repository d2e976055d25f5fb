"""AMD training-step benchmark on one chip.

Measures the full jitted step (AMD_N forward + backward + AdamW) on latent
clips at the reference's main config scale (16 frames, 32x32 latents,
batch 4 — ``scripts/amd_t1d512_nonorm_spatial.sh``). Prints steps/s and the
effective frames/s/chip.
"""

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--model", type=str, default="AMD_N")
    args = p.parse_args()

    from hivae_tpu.models import amd
    from hivae_tpu.training.train_state import (TrainState, make_optimizer,
                                                make_train_step)

    dtype = jnp.bfloat16
    model = amd.AMD_N(dtype=dtype, use_filter=True, use_grey=True,
                      video_frames=args.frames,
                      camera_motion_token_num=args.frames,
                      camera_motion_token_channel=16,
                      object_motion_token_num=4,
                      object_motion_token_channel=512,
                      motion_token_num=4, motion_token_channel=512,
                      diffusion_model_type="spatial")

    key = jax.random.PRNGKey(0)
    shape = (args.batch, args.frames, 4, 32, 32)
    video = jax.random.normal(key, shape)
    ref = jnp.broadcast_to(video[:, :1], shape)

    def init():
        return model.init({"params": key, "noise": key}, video, ref, video,
                          ref)

    shapes = jax.eval_shape(init)
    n_params = sum(int(jnp.prod(jnp.array(x.shape)))
                   for x in jax.tree.leaves(shapes))
    print(f"params: {n_params/1e6:.1f}M")
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    tx = make_optimizer(1e-4)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model), donate_argnums=(0,))
    batch = {"video": video, "ref_img": ref, "video_grey": video,
             "ref_img_grey": ref}

    t0 = time.perf_counter()
    state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"step: {dt*1e3:.1f} ms  |  {1/dt:.2f} steps/s  |  "
          f"{args.batch*args.frames/dt:.1f} frames/s/chip  |  "
          f"loss={float(metrics['loss']):.4f}")


if __name__ == "__main__":
    main()
