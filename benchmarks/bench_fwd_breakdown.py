"""Where do the NON-matmul ~20 ms of the DiT velocity forward go?

``bench_quant_breakdown.py`` settled the dense-matmul share of the flagship
forward (19.07 ms of 39.4 ms) and RESULTS.md attributes the remainder to
"attention math, norms, AdaLN, layout transposes and embeds/head" — asserted
from the settlement table, never measured in place. This bench measures it
by ablation inside the REAL 696M program (same differenced-scan method as
``bench_components.py``):

* ``full``          — the DiT velocity forward, anchor (~39.4 ms).
* ``no_attn_core``  — ``ops.attention.sdpa`` replaced by a shape-preserving
  mix ``q + 1e-3*(k + v)`` (keeps every qkv/out Dense live — returning bare
  ``q`` would let XLA dead-code-eliminate the k/v projections, the pitfall
  bench_quant.py documents). Difference = QK^T + softmax + PV.
* ``no_norms``      — every ``nn.LayerNorm`` intercepted to identity
  (flax ``intercept_methods``, the quant-interceptor pattern): covers the
  AdaLN inner norms and FFN norms. Difference = LayerNorm reduce+normalize
  traffic. NOTE (round 5): the per-head qk norms moved inside
  ``ops.attention.sdpa`` (qk_norm= param), so they are NO LONGER ablated by
  this row — the sdpa stub rows ablate them together with the attention
  core instead.
* ``no_both``       — both ablations (checks additivity / fusion overlap).
* ``transpose_tax`` — the per-layer joint->spatial->joint relayout pair
  ((n,t,s,h) -> (n*s,t,h) -> back) at flagship shape, standalone x16
  layers: an upper bound on what deleting the layout round trip could buy.

Residual = full − attn_core − norms − 19.07 (dense matmuls) = modulate
arithmetic + patch/motion embeds + head + the in-program layout moves.

Run on the real chip; zeros params via eval_shape (FLOPs/memory identical,
no oversized init HLO through the relay).
"""

import argparse
import time

import jax
import jax.numpy as jnp


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:4].astype(jnp.float32)))


def bench(fn, args, iters):
    """Differenced scan (bench_components method): every output leaf reduces
    into the carry so XLA cannot DCE any branch; two scan lengths cancel the
    relay transport floor."""

    def make_loop(n):
        @jax.jit
        def loop(first, *rest):
            def body(x, _):
                out = fn(x, *rest)
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


def identity_norms():
    """Context: every nn.LayerNorm returns its input unchanged (the scale/
    shift params go unused; shapes/layout identical, fp32 upcast skipped)."""
    import flax.linen as nn

    def interceptor(next_fn, args, kwargs, context):
        if (isinstance(context.module, nn.LayerNorm)
                and context.method_name == "__call__"):
            return args[0]
        return next_fn(*args, **kwargs)

    return nn.intercept_methods(interceptor)


def identity_adaln():
    """Context: every AdaLN module (Zero/Single/Triple/AdaLayerNorm) returns
    its inputs unmodulated with all-ones gates — ablates the mod-producing
    Dense+silu, the shared LayerNorm AND the modulate/gate elementwise, so
    full − no_adaln is the whole AdaLN apparatus in-program. (The per-layer
    mod Denses are M=batch·frames matmuls — 16 rows at the flagship — which
    the 19.07 ms dense-matmul share does NOT include.)"""
    import flax.linen as nn
    from hivae_tpu.models import blocks as B

    def ones_gate(x):
        return jnp.ones((x.shape[0], 1, x.shape[-1]), x.dtype)

    def interceptor(next_fn, args, kwargs, context):
        m = context.module
        if context.method_name == "__call__":
            if type(m) is B.AdaLNZero:
                hidden, encoder = args[0], args[1]
                return hidden, encoder, ones_gate(hidden), ones_gate(encoder)
            if type(m) is B.AdaLNZeroSingle:
                return args[0], ones_gate(args[0])
            if type(m) is B.AdaLNZeroTriple:
                h, c1, c2 = args[0], args[1], args[2]
                return (h, c1, c2, ones_gate(h), ones_gate(c1),
                        ones_gate(c2))
            if type(m) is B.AdaLayerNorm:
                return args[0]
        return next_fn(*args, **kwargs)

    return nn.intercept_methods(interceptor)


class patched_modulate:
    """Context: blocks.modulate -> identity (drops the (1+scale)*x+shift
    elementwise epilogues; the mod Dense, LayerNorm and gates stay live)."""

    def __enter__(self):
        from hivae_tpu.models import blocks as B
        self._orig = B.modulate
        B.modulate = lambda x, scale, shift: x
        return self

    def __exit__(self, *exc):
        from hivae_tpu.models import blocks as B
        B.modulate = self._orig
        return False


class patched_sdpa:
    """Context: ops.attention.sdpa -> shape-preserving qkv mix (self-attn
    blocks only — q/k/v share (B,H,S,D) there, which is every block in the
    flagship DiT). ``when(q)`` selects which call sites ablate (by shape),
    so the attention-core time can be SPLIT between the joint blocks
    (S~266-514) and the per-pixel temporal blocks (S=frames)."""

    def __init__(self, when=None):
        self._when = when or (lambda q: True)

    def __enter__(self):
        from hivae_tpu.ops import attention as attn_ops
        self._orig = attn_ops.sdpa
        orig, when = self._orig, self._when
        attn_ops.sdpa = lambda q, k, v, **kw: (
            (q + 1e-3 * (k + v)).astype(q.dtype) if when(q)
            else orig(q, k, v, **kw))
        return self

    def __exit__(self, *exc):
        from hivae_tpu.ops import attention as attn_ops
        attn_ops.sdpa = self._orig
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--matmul-ms", type=float, default=19.07,
                   help="dense-matmul share of the forward in ms, from "
                        "bench_quant_breakdown.py's reconstruction — pass "
                        "the re-measured value if that bench is re-run "
                        "(only used at the default batch/frames)")
    args = p.parse_args()

    from hivae_tpu.models import amd
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
                      diffusion_model_type="spatial")

    key = jax.random.PRNGKey(0)
    n, t = args.batch, args.frames
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
    vel_args = (img, tstep, cam_t, obj_s, obj_t)

    def velocity(img, ts, c, s, o):
        return model.apply(params, img, ts, camera_target=c,
                           object_source=s, object_target=o,
                           method="velocity")

    def vel_no_norms(*a):
        with identity_norms():
            return velocity(*a)

    def vel_no_attn(*a):
        with patched_sdpa():
            return velocity(*a)

    def vel_no_attn_small(*a):  # only the per-pixel temporal blocks (S=t)
        with patched_sdpa(when=lambda q: q.shape[2] <= 32):
            return velocity(*a)

    def vel_no_attn_joint(*a):  # only the joint blocks (S~266/514)
        with patched_sdpa(when=lambda q: q.shape[2] > 32):
            return velocity(*a)

    def vel_no_both(*a):
        with patched_sdpa(), identity_norms():
            return velocity(*a)

    rows = {}

    def row(name, fn, a):
        dt = bench(fn, a, args.iters)
        rows[name] = dt
        print(f"{name:24s} {dt*1e3:8.2f} ms")

    def vel_forced(impl, when):
        """Force ``impl`` at the call sites ``when(q)`` selects; the rest
        keep the normal dispatch."""
        def fn(*a):
            from hivae_tpu.ops import attention as attn_ops
            orig = attn_ops.sdpa

            def forced(q, k, v, **kw):
                if when(q):
                    kw["implementation"] = impl
                return orig(q, k, v, **kw)

            attn_ops.sdpa = forced
            try:
                return velocity(*a)
            finally:
                attn_ops.sdpa = orig
        return fn

    joint = lambda q: q.shape[2] > 32   # joint blocks (S~266/514)
    small = lambda q: q.shape[2] <= 32  # per-pixel temporal blocks (S=t)

    row("full", velocity, vel_args)
    # the settlement table's crossover was measured STANDALONE, where XLA
    # flash-fuses the whole softmax; inside the full program its fusion
    # degrades (the no_attn_joint_S ablation found ~10 ms of joint-block
    # attention vs the standalone 92 us x 16 = 1.5 ms). The Pallas kernel's
    # cost is fusion-context-independent — this row decides the predicate.
    # (Forcing pallas at tiny-S would pad 16 -> 128 per side, a 64x FLOP
    # waste, so only the joint blocks are forced.)
    row("full (attn=pallas)", vel_forced("pallas", joint), vel_args)
    # packed-off baseline: explicit 'xla' is the literal naive path (it
    # never head-packs), so this row minus "full" is the head-packing win
    # on the small-S temporal blocks.
    row("full (small-S unpacked)", vel_forced("xla", small), vel_args)
    row("no_attn_core", vel_no_attn, vel_args)
    row("no_attn_small_S", vel_no_attn_small, vel_args)
    row("no_attn_joint_S", vel_no_attn_joint, vel_args)
    row("no_norms", vel_no_norms, vel_args)
    row("no_both", vel_no_both, vel_args)

    def vel_no_modulate(*a):
        with patched_modulate():
            return velocity(*a)

    def vel_no_adaln(*a):
        with identity_adaln():
            return velocity(*a)

    # round-5 residual split: the AdaLN apparatus (per-layer M=16 mod
    # Denses + shared LN + modulate/gate elementwise) vs just the
    # modulate elementwise
    row("no_modulate", vel_no_modulate, vel_args)
    row("no_adaln", vel_no_adaln, vel_args)

    # layout tax: the spatial block's joint->temporal->joint relayout pair,
    # standalone, x num_layers (16 at the flagship)
    hidden, s = 1024, 256
    layers = 16

    def relayout(x):
        y = x.reshape(n, t, s, hidden).transpose(0, 2, 1, 3).reshape(
            n * s, t, hidden)
        y = y + 1.0  # a consumer in the temporal layout (prevents
        #              transpose-pair cancellation)
        return y.reshape(n, s, t, hidden).transpose(0, 2, 1, 3).reshape(
            n * t, s, hidden)

    x0 = jnp.zeros((n * t, s, hidden), dtype)
    row("transpose_pair_x16",
        lambda x: jax.lax.fori_loop(0, layers, lambda i, y: relayout(y), x),
        (x0,))

    full = rows["full"]
    attn = full - rows["no_attn_core"]
    attn_small = full - rows["no_attn_small_S"]
    attn_joint = full - rows["no_attn_joint_S"]
    norms = full - rows["no_norms"]
    both = full - rows["no_both"]
    matmul = (args.matmul_ms * 1e-3
              if (args.batch, args.frames) == (1, 16) else None)
    print()
    print(f"attention core (QK^T+softmax+PV): {attn*1e3:7.2f} ms")
    print(f"  of which small-S temporal (S<=32): {attn_small*1e3:7.2f} ms")
    print(f"  of which joint blocks (S>32):      {attn_joint*1e3:7.2f} ms")
    print(f"LayerNorms (incl. qk norms):      {norms*1e3:7.2f} ms")
    print(f"both-ablation (additivity check): {both*1e3:7.2f} ms "
          f"vs sum {100*(attn+norms)/max(both,1e-12):.0f}%")
    mod = full - rows["no_modulate"]
    adaln = full - rows["no_adaln"]
    print(f"modulate elementwise:             {mod*1e3:7.2f} ms")
    print(f"AdaLN apparatus (dense+LN+mod+gates): {adaln*1e3:7.2f} ms")
    if matmul is not None:
        resid = full - attn - norms - matmul
        print(f"dense matmuls (bench_quant_breakdown): {matmul*1e3:7.2f} ms")
        print(f"residual (modulate+embeds+head+layout): {resid*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
