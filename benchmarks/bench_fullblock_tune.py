"""Tune the full-block Pallas attention schedule at the flagship joint shape.

Round 5 routed the flagship's joint-block attention (S=260/266, B*H=256,
d=64) onto the full-block kernel (in-program crossover, RESULTS.md
"Forward breakdown by ablation") — which makes its 171 us/layer forward the
single biggest attention cost in the velocity forward (2.7 ms across 16
layers). At this shape the kernel runs ~28 TF/s: the grid is (B, H/hb) = 64
steps at the default hb=4, i.e. ~2.7 us/step — plausibly per-step-overhead
bound, and the 272-lane logits are not 128-aligned (Mosaic pads the vregs
to 384 lanes internally either way).

This bench sweeps the two knobs the kernel now exposes as module constants
(`_FB_FWD_BUDGET`/`_FB_BWD_BUDGET` -> head-batch factor via _pick_hb;
`_FB_LANE_ALIGN` -> key-axis padding multiple) and times forward and grad
with the differenced-scan method. The winners become the constants'
defaults; parity is pinned by tests/test_pallas.py either way (the knobs
change schedule, not math).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_fullblock_tune.py
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
    p.add_argument("--b", type=int, default=16)
    p.add_argument("--h", type=int, default=16)
    p.add_argument("--s", type=int, default=260)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    from hivae_tpu.ops.pallas import flash_attention as fa

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    shape = (args.b, args.h, args.s, args.d)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)
    scale = args.d ** -0.5
    flops_fwd = 4 * args.b * args.h * args.s * args.s * args.d

    def fwd(q, k, v):
        return fa.flash_attention(q, k, v, scale=scale)

    def grad(q, k, v):
        def loss(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v, scale=scale)
                           .astype(jnp.float32))
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    mb = 2**20
    print(f"shape b{args.b} h{args.h} s{args.s} d{args.d}  "
          f"(useful fwd GFLOP {flops_fwd/1e9:.2f})")
    for lane in (16, 128):
        for fwd_budget, bwd_budget in ((6 * mb, 10 * mb),
                                       (9 * mb, 12 * mb),
                                       (12 * mb, 13 * mb)):
            fa._FB_LANE_ALIGN = lane
            fa._FB_FWD_BUDGET = fwd_budget
            fa._FB_BWD_BUDGET = bwd_budget
            sqp = fa._round_up(args.s, fa.SEQ_ALIGN)
            skp = fa._round_up(args.s, lane)
            hb_f = fa._pick_hb(args.h, sqp, skp, args.d, 2, 2, fwd_budget)
            hb_b = fa._pick_hb(args.h, sqp, skp, args.d, 2, 3, bwd_budget)
            t_f = bench(fwd, (q, k, v), args.iters)
            t_g = bench(grad, (q, k, v), max(args.iters // 2, 8))
            print(f"lane={lane:>3} fwd_budget={fwd_budget//mb:>2}MB "
                  f"(hb={hb_f:>2}) : fwd {t_f*1e6:7.1f} us "
                  f"({flops_fwd/t_f/1e12:5.1f} TF/s) | "
                  f"bwd_budget={bwd_budget//mb}MB (hb={hb_b:>2}) : "
                  f"grad {t_g*1e6:7.1f} us")


if __name__ == "__main__":
    main()
