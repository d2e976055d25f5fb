"""Component-time breakdown of the flagship train step (696M AMD_N spatial).

Differenced scan timing per component (same method as bench_attention.py:
two scan lengths, min-of-3, slope = per-iteration device time) so the
relay's per-program transport floor cancels. Answers "where do the 289 ms
of the dots@b1 step go": band split, camera/object encoders, DiT forward,
full forward, full forward+backward.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:4].astype(jnp.float32)))


def bench(fn, args, iters):
    """The first arg is the scan carry, perturbed by each iteration's output
    so nothing is loop-invariant (XLA would hoist an unchained body to a
    single execution)."""

    def make_loop(n):
        @jax.jit
        def loop(first, *rest):
            def body(x, _):
                out = fn(x, *rest)
                # reduce over EVERY output leaf: a one-element slice of the
                # first leaf lets XLA dead-code-eliminate sibling outputs
                # and everything outside that element's receptive field
                # (the conv-stack pitfall bench_quant.py documents; here it
                # also dropped the object encoder from the 'encode' row and
                # most dW matmuls from the grad row)
                delta = sum(jnp.sum(l.astype(jnp.float32))
                            for l in jax.tree.leaves(out))
                return x + delta.astype(x.dtype) * 1e-20, None
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    from hivae_tpu.models import amd
    from hivae_tpu.ops import frequency
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
                      remat=True, remat_policy="dots")

    key = jax.random.PRNGKey(0)
    shape = (args.batch, args.frames, 4, 32, 32)
    video = jax.random.normal(key, shape)
    ref = jnp.broadcast_to(video[:, :1], shape)

    shapes = jax.eval_shape(lambda: model.init(
        {"params": key, "noise": key}, video, ref, video, ref))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    n, t = args.batch, args.frames

    rows = []

    def row(name, fn, a, iters=None):
        dt = bench(fn, a, iters or args.iters)
        rows.append((name, dt))
        print(f"{name:32s} {dt*1e3:8.2f} ms")

    # 1. 3D band split of the grey stream (both cutoffs, as in forward)
    grey_cat = jnp.concatenate([ref, video], axis=1).transpose(0, 2, 1, 3, 4)
    row("band_split (two cutoffs)",
        lambda x: (frequency.freq_3d_split(x, 0.6, 0.6)[0] +
                   frequency.freq_3d_split(x, 0.5, 0.5)[1]),
        (grey_cat,))

    # 2. encoders (camera + object) via model.encode
    row("encode (cam+obj encoders)",
        lambda v, r: model.apply(params, v, r, v, r, method="encode"),
        (video, ref))

    # 3. DiT velocity forward alone (setup encode must be jitted: eager
    # complex ops raise UNIMPLEMENTED on relayed runtimes)
    enc = jax.jit(lambda v, r: model.apply(params, v, r, v, r,
                                           method="encode"))(video, ref)
    cam_t, obj_s, obj_t = enc[:3]
    zi = ref.reshape((n * t,) + ref.shape[2:])
    zt = video.reshape((n * t,) + video.shape[2:])
    img = jnp.concatenate([zi, zt], axis=1)
    tstep = jnp.full((n * t,), 500.0)
    row("DiT velocity fwd",
        lambda img, ts, c, s, o: model.apply(
            params, img, ts, camera_target=c, object_source=s,
            object_target=o, method="velocity"),
        (img, tstep, cam_t, obj_s, obj_t))

    # 4. full training forward (loss)
    def fwd(v, r):
        _, _, d = model.apply(params, v, r, v, r,
                              rngs={"noise": jax.random.PRNGKey(1)})
        return d["loss"]
    row("train forward (loss)", fwd, (video, ref))

    # 5. forward+backward
    grad_fn = jax.grad(lambda p, v, r: model.apply(
        p, v, r, v, r, rngs={"noise": jax.random.PRNGKey(1)})[2]["loss"])
    row("train fwd+bwd (grads)",
        lambda v, r: grad_fn(params, v, r), (video, ref),
        iters=max(2, args.iters // 2))

    total = dict(rows)
    fb = total.get("train fwd+bwd (grads)", 0)
    print(f"\nfwd+bwd = {fb*1e3:.1f} ms; measured full step (incl. Adam "
          f"update) was 289 ms at this config — see RESULTS.md")


if __name__ == "__main__":
    main()
