"""Long-window sampling benchmark: past the reference's W=16 cap.

The reference handles long video only by windowed autoregression at W=16
(``model/pipeline.py:1295-1378``); single-window attention sequences are
what cap it. Here the flagship AMD_N's temporal attention grows with the
window (512 tokens at W=16, 1024 at W=32, 2048 at W=64), crossing from XLA
into the full-block and then the streaming Pallas schedules — this bench
times a full jitted reconstruction sample (motion encode + N-step Euler)
at increasing windows, with the attention impl switchable, to show the
long-window story holds end-to-end in the model, not just in the kernel
microbench.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_longwindow.py \
      --frames 64 --attn auto
"""

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--sample_step", type=int, default=10)
    p.add_argument("--attn", type=str, default="auto",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--scale", type=str, default="260M",
                   choices=["260M", "696M"])
    args = p.parse_args()

    from hivae_tpu.models import amd
    from hivae_tpu.ops import attention as A
    from hivae_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    A.set_default_implementation(args.attn)

    dtype = jnp.bfloat16
    kw = dict(enc_nhead=8, enc_ndim=64, diffusion_attn_head_dim=64,
              diffusion_attn_num_heads=16, diffusion_out_channels=4,
              use_filter=True, use_grey=True, video_frames=args.frames,
              camera_motion_token_num=args.frames,
              camera_motion_token_channel=16,
              object_motion_token_num=4,
              diffusion_model_type="spatial")
    if args.scale == "260M":
        kw.update(object_motion_token_channel=256, motion_token_channel=256,
                  diffusion_num_layers=8)
    else:
        kw.update(object_motion_token_channel=512, motion_token_channel=512,
                  diffusion_num_layers=12)
    model = amd.AMDModelNew(cfg=amd.AMDConfig(**kw), dtype=dtype)

    t = args.frames
    lat = (1, t, 4, 32, 32)

    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(lambda: model.init(
        {"params": key, "noise": key}, jnp.zeros(lat), jnp.zeros(lat),
        jnp.zeros(lat), jnp.zeros(lat)))
    # Zero weights: build CPU-resident (a 700-output on-device zeros
    # program compiles pathologically slowly through the relay), then
    # commit the whole tree to the chip with ONE jitted identity program —
    # per-leaf device_put pays a WAN round trip per tensor (>20 min/GB),
    # while a single call uploads ~1 GB in ~5 s. Timed calls below then
    # pass device-resident handles and measure pure compute.
    from hivae_tpu.utils.misc import count_params, init_on_cpu

    params = init_on_cpu(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))
    t0 = time.perf_counter()
    params = jax.jit(lambda p: p)(params)
    jax.block_until_ready(params)
    print(f"param commit to device: {time.perf_counter()-t0:.1f}s")
    print(f"params: {count_params(params)/1e6:.0f}M  window={t}  "
          f"attn={args.attn}")

    key = jax.random.PRNGKey(1)
    video = jax.random.normal(key, lat, dtype)
    ref = jnp.broadcast_to(video[:, :1], lat).astype(dtype)

    def sync(x):
        return float(jnp.sum(x[0, 0, 0, 0, :4].astype(jnp.float32)))

    t0 = time.perf_counter()
    _, zt, _ = amd.sample_jit(model, params, key, video, ref, video, ref,
                              sample_step=args.sample_step)
    sync(zt)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s")

    best = float("inf")
    for _ in range(args.iters):
        t0 = time.perf_counter()
        _, zt, _ = amd.sample_jit(model, params, key, video, ref, video,
                                  ref, sample_step=args.sample_step)
        sync(zt)
        best = min(best, time.perf_counter() - t0)
    print(f"sample({args.sample_step} steps, {t} frames): {best*1e3:.0f} ms"
          f" | {t/best:.1f} frames/s | {best/t*1e3:.1f} ms/frame")


if __name__ == "__main__":
    main()
