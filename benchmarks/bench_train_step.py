"""AMD training-step benchmark on one chip.

Measures the full jitted step (AMD_N forward + backward + AdamW) on latent
clips at the reference's main config scale (16 frames, 32x32 latents —
``scripts/amd_t1d512_nonorm_spatial.sh``). Synchronization is a scalar loss
fetch per step (device->host round-trip included), which is what a real
training loop pays.

Measured on TPU v5e (bf16, 695M-param spatial AMD_N), stepped loop with a
per-step scalar fetch: full remat batch 2 = 612 ms (52.3 f/s/chip); the
best config is --remat_policy dots --batch 1 = 289 ms (55.3 f/s/chip), of
which ~156 ms is device work (see RESULTS.md roofline account; the rest is
relay fetch/dispatch a native host does not pay).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--remat_policy", type=str, default="full",
                   choices=["full", "dots", "dots_sans_ffn",
                            "dots_offload"])
    p.add_argument("--attn_impl", type=str, default="xla",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--mu_dtype", type=str, default="fp32",
                   choices=["fp32", "bf16"])
    args = p.parse_args()

    from hivae_tpu.models import amd
    from hivae_tpu.training.train_state import (TrainState, make_optimizer,
                                                make_train_step)
    from hivae_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    dtype = jnp.bfloat16
    model = amd.AMD_N(dtype=dtype, use_filter=True, use_grey=True,
                      video_frames=args.frames,
                      camera_motion_token_num=args.frames,
                      camera_motion_token_channel=16,
                      object_motion_token_num=4,
                      object_motion_token_channel=512,
                      motion_token_num=4, motion_token_channel=512,
                      diffusion_model_type="spatial",
                      remat=not args.no_remat,
                      remat_policy=args.remat_policy,
                      attn_impl=args.attn_impl)

    key = jax.random.PRNGKey(0)
    shape = (args.batch, args.frames, 4, 32, 32)
    video = jax.random.normal(key, shape)
    ref = jnp.broadcast_to(video[:, :1], shape)

    shapes = jax.eval_shape(lambda: model.init(
        {"params": key, "noise": key}, video, ref, video, ref))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))
    print(f"params: {n_params/1e6:.1f}M")
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    state = TrainState.create(params, make_optimizer(
        1e-4, mu_dtype=jnp.bfloat16 if args.mu_dtype == "bf16" else None))
    raw_step = make_train_step(model)

    def step_scalar(state, batch, rng):
        s, m = raw_step(state, batch, rng)
        return s, m["loss"]

    step = jax.jit(step_scalar, donate_argnums=(0,))
    batch = {"video": video, "ref_img": ref, "video_grey": video,
             "ref_img_grey": ref}

    t0 = time.perf_counter()
    state, loss = step(state, batch, key)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s "
          f"loss={float(loss):.3f}")

    if args.iters < 1:
        raise SystemExit("--iters must be >= 1")
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        state, loss = step(state, batch, key)
        lv = float(loss)  # forces completion (scalar round trip)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(f"step: {dt*1e3:.0f} ms | {1/dt:.2f} steps/s | "
          f"{args.batch*args.frames/dt:.1f} frames/s/chip | loss={lv:.4f}")


if __name__ == "__main__":
    main()
