"""Int8 (w8a8) serving-path benchmark: flagship DiT velocity forward and
the full Euler sampler, bf16 vs quantized, on the real chip.

Same differenced-scan method as bench_components.py (two scan lengths,
min-of-3, slope) so the relay's per-program transport floor cancels. The
weights are zeros (timing does not depend on values; weights stay traced
program arguments so XLA cannot fold them).
"""

import argparse
import time

import jax
import jax.numpy as jnp


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:4].astype(jnp.float32)))


def bench(fn, args, iters):
    def make_loop(n):
        @jax.jit
        def loop(first, *rest):
            def body(x, _):
                out = fn(x, *rest)
                leaf = jax.tree.leaves(out)[0]
                # full-reduction delta: a one-element slice would let XLA
                # dead-code-eliminate everything outside that element's
                # receptive field (measured 9x inflation on conv stacks)
                delta = jnp.sum(leaf.astype(jnp.float32)).astype(x.dtype)
                return x + delta * 1e-20, None
            x, _ = jax.lax.scan(body, first, None, length=n)
            return x
        return loop

    def timed(loop):
        sync(loop(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(loop(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(make_loop(iters))
    t2 = timed(make_loop(5 * iters))
    return (t2 - t1) / (4 * iters)


def bench_vae(args):
    """VAE decode (the serving output leg): bf16 vs the int8 conv path —
    per-output-channel int8 weights, dynamic per-tensor activations, the
    boundary convs excluded by the predicate (ops/quant.py)."""
    from functools import partial

    from hivae_tpu.models import vae as vae_mod
    from hivae_tpu.ops import quant

    model = vae_mod.AutoencoderKL(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda: model.init(key, jnp.zeros((1, 3, 256, 256))))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    table = jax.jit(partial(
        quant.quantize_params, scope=("decoder",)))(params)
    convs = sum(1 for e in table.values() if e["w8"].ndim == 4)
    print(f"VAE quantized layers: {len(table)} ({convs} convs)  "
          f"int8 bytes: {sum(int(e['w8'].size) for e in table.values())/1e6:.0f} MB")

    z = jax.random.normal(key, (1, args.frames, 4, 32, 32))

    def dec(z, qt):
        return vae_mod.vae_decode(model, params, z, quant_table=qt)

    t_bf = bench(lambda z: dec(z, None), (z,), 2)
    print(f"VAE decode ({args.frames}f)  bf16: {t_bf*1e3:8.1f} ms  "
          f"{args.frames/t_bf:6.1f} f/s")
    t_q = bench(lambda z: dec(z, table), (z,), 2)
    print(f"VAE decode ({args.frames}f)  int8: {t_q*1e3:8.1f} ms  "
          f"{args.frames/t_q:6.1f} f/s   speedup {t_bf/t_q:.2f}x")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--sample_step", type=int, default=10)
    p.add_argument("--part", choices=["dit", "vae", "all"],
                   default="all")
    args = p.parse_args()

    from hivae_tpu.models import amd
    from hivae_tpu.ops import quant
    from hivae_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    dtype = jnp.bfloat16
    if args.part in ("vae", "all"):
        bench_vae(args)
    if args.part == "vae":
        return
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

    shapes = jax.eval_shape(lambda: model.init(
        {"params": key, "noise": key}, video, ref, video, ref))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    table = jax.jit(quant.quantize_params)(params)
    n_q = len(table)
    q_bytes = sum(int(e["w8"].size) for e in table.values())
    print(f"quantized layers: {n_q}  int8 weight bytes: {q_bytes/1e6:.0f} MB")

    n, t = args.batch, args.frames
    enc = jax.jit(lambda v, r: model.apply(params, v, r, v, r,
                                           method="encode"))(video, ref)
    cam_t, obj_s, obj_t = enc[:3]
    zi = ref.reshape((n * t,) + ref.shape[2:])
    zt = video.reshape((n * t,) + video.shape[2:])
    img = jnp.concatenate([zi, zt], axis=1)
    tstep = jnp.full((n * t,), 500.0)

    def vel(img, ts, c, s, o):
        return model.apply(params, img, ts, camera_target=c, object_source=s,
                           object_target=o, method="velocity")

    def vel_q(img, ts, c, s, o):
        with quant.quantized_calls(table):
            return model.apply(params, img, ts, camera_target=c,
                               object_source=s, object_target=o,
                               method="velocity")

    def vel_q_unfused(img, ts, c, s, o):
        # per-Dense int8 chain (separate act-quant pass between FFN
        # matmuls) — the A/B for the Pallas fused up+gelu+requant epilogue
        with quant.quantized_calls(table, fuse_ffn=False):
            return model.apply(params, img, ts, camera_target=c,
                               object_source=s, object_target=o,
                               method="velocity")

    a = (img, tstep, cam_t, obj_s, obj_t)
    t_bf = bench(vel, a, args.iters)
    print(f"DiT velocity fwd  bf16: {t_bf*1e3:8.2f} ms")
    t_qu = bench(vel_q_unfused, a, args.iters)
    print(f"DiT velocity fwd  int8 (unfused ffn): {t_qu*1e3:8.2f} ms   "
          f"speedup {t_bf/t_qu:.2f}x")
    t_q = bench(vel_q, a, args.iters)
    print(f"DiT velocity fwd  int8: {t_q*1e3:8.2f} ms   "
          f"speedup {t_bf/t_q:.2f}x   (ffn-fusion win {t_qu/t_q:.2f}x)")

    def sampler(video, ref, quant_table):
        _, out, _ = amd.sample(model, params, jax.random.PRNGKey(1), video,
                               ref, video_grey=video, ref_img_grey=ref,
                               sample_step=args.sample_step,
                               quant_table=quant_table)
        return out

    t_bf = bench(lambda v, r: sampler(v, r, None), (video, ref), 2)
    fps = args.batch * args.frames / t_bf
    print(f"sampler ({args.sample_step} Euler)  bf16: {t_bf*1e3:8.1f} ms  "
          f"{fps:6.1f} f/s")
    t_q = bench(lambda v, r: sampler(v, r, table), (video, ref), 2)
    fps_q = args.batch * args.frames / t_q
    print(f"sampler ({args.sample_step} Euler)  int8: {t_q*1e3:8.1f} ms  "
          f"{fps_q:6.1f} f/s   speedup {t_bf/t_q:.2f}x")


if __name__ == "__main__":
    main()
