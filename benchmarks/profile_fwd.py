"""Op-level profile of the flagship velocity forward (real chip).

Captures a ``jax.profiler`` trace and aggregates XLA-op durations straight
from the xplane proto (no TensorBoard UI needed on this host), to settle
where ablation deltas actually go — in particular the ~3 ms gap between the
joint-block Pallas attention measured standalone (171 us x 16 = 2.7 ms) and
its in-program ablation delta (6.1 ms, bench_fwd_breakdown round 5).

Modes:
  --what full   : the 696M velocity forward (default)
  --what joint  : standalone scan over the joint-shape Pallas attention
                  (B=16,H=16,S=266,d=64) for a like-for-like kernel-duration
                  comparison in the same methodology.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_fwd.py
"""

import argparse
import collections
import glob
import os
import tempfile

import jax
import jax.numpy as jnp


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:4].astype(jnp.float32)))


def build_full():
    from hivae_tpu.models import amd

    dtype = jnp.bfloat16
    model = amd.AMD_N(dtype=dtype, use_filter=True, use_grey=True,
                      video_frames=16, camera_motion_token_num=16,
                      camera_motion_token_channel=16,
                      object_motion_token_num=4,
                      object_motion_token_channel=512,
                      motion_token_num=4, motion_token_channel=512,
                      diffusion_model_type="spatial")
    key = jax.random.PRNGKey(0)
    n, t = 1, 16
    shape = (n, t, 4, 32, 32)
    video = jax.random.normal(key, shape)
    ref = jnp.broadcast_to(video[:, :1], shape)
    shapes = jax.eval_shape(lambda: model.init(
        {"params": key, "noise": key}, video, ref, video, ref))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    enc = jax.jit(lambda v, r: model.apply(params, v, r, v, r,
                                           method="encode"))(video, ref)
    cam_t, obj_s, obj_t = enc[:3]
    zi = ref.reshape((n * t,) + ref.shape[2:])
    zt = video.reshape((n * t,) + video.shape[2:])
    img = jnp.concatenate([zi, zt], axis=1)
    tstep = jnp.full((n * t,), 500.0)

    @jax.jit
    def fwd(img, ts, c, s, o):
        return model.apply(params, img, ts, camera_target=c,
                           object_source=s, object_target=o,
                           method="velocity")

    return fwd, (img, tstep, cam_t, obj_s, obj_t)


def build_joint():
    from hivae_tpu.ops.pallas import flash_attention as fa

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    shape = (16, 16, 266, 64)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)

    @jax.jit
    def fwd(q, k, v):
        # 16 chained calls ~ one forward's worth of joint attention
        def body(x, _):
            o = fa.flash_attention(x, k, v, scale=64 ** -0.5)
            return (x + o * 1e-6).astype(x.dtype), None
        x, _ = jax.lax.scan(body, q, None, length=16)
        return x

    return fwd, (q, k, v)


def aggregate(trace_dir, top):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        totals = collections.Counter()
        counts = collections.Counter()
        for line in plane.lines:
            # ONLY the synchronous op line: "Async XLA Ops" durations span
            # their overlap with compute — summing them double-counts
            # (measured 3x inflation on the flagship forward)
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
        if not totals:
            continue
        print(f"\n== plane: {plane.name} "
              f"(total op-ms {sum(totals.values()):.2f}) ==")
        for name, ms in totals.most_common(top):
            print(f"{ms:9.3f} ms  x{counts[name]:<5d} {name[:110]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", choices=["full", "joint"], default="full")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--keep", type=str, default="",
                   help="keep the trace dir at this path")
    args = p.parse_args()

    fn, fargs = build_full() if args.what == "full" else build_joint()
    sync(fn(*fargs))  # compile outside the trace
    trace_dir = args.keep or tempfile.mkdtemp(prefix="fwdtrace_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.iters):
        sync(fn(*fargs))
    jax.profiler.stop_trace()
    print(f"trace in {trace_dir}")
    aggregate(trace_dir, args.top)


if __name__ == "__main__":
    main()
