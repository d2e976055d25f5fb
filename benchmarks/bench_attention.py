"""Attention micro-benchmark: XLA SDPA vs the fused Pallas kernel.

Production shape: joint-sequence blocks run (N*T, heads, 260, 64) bf16
(256 image patches + 4 motion tokens). Timing fenced by a scalar fetch
(relay ``block_until_ready`` is a no-op).
"""

import argparse
import time

import jax
import jax.numpy as jnp

from hivae_tpu.ops import attention as A
from hivae_tpu.ops.pallas.flash_attention import flash_attention
from hivae_tpu.utils.cache import enable_compile_cache


def sync(x):
    return float(jnp.sum(x[0, 0, 0, :4].astype(jnp.float32)))


def bench(fn, args, iters=50):
    """Difference two scan lengths (N and N+iters) so the relay transport
    floor (tens of ms per program call) and the scalar-fetch cost cancel;
    the slope is the true per-iteration device time."""

    def make_loop(n):
        @jax.jit
        def loop(q, k, v):
            def body(q, _):
                o = fn(q, k, v)
                return o + q * 1e-6, None  # chain to serialize the scan
            out, _ = jax.lax.scan(body, q, None, length=n)
            return out
        return loop

    short, long_ = make_loop(iters), make_loop(11 * iters)

    def timed(loop):
        sync(loop(*args))  # warmup/compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(loop(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(short), timed(long_)
    return (t2 - t1) / (10 * iters)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--h", type=int, default=16)
    p.add_argument("--s", type=int, default=260)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--grad", action="store_true")
    args = p.parse_args()

    enable_compile_cache()
    shape = (args.b, args.h, args.s, args.d)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, shape, jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.bfloat16)
    scale = args.d ** -0.5

    flops = 2 * 2 * args.b * args.h * args.s * args.s * args.d
    print(f"shape {shape} bf16, fwd {flops/1e9:.2f} GFLOP")

    xla = lambda q, k, v: A.sdpa(q, k, v, implementation="xla")
    pal = lambda q, k, v: flash_attention(q, k, v, scale=scale)
    t_x = bench(xla, (q, k, v), args.iters)
    t_p = bench(pal, (q, k, v), args.iters)
    print(f"fwd  xla    {t_x*1e6:8.1f} us  {flops/t_x/1e12:6.1f} TFLOP/s")
    print(f"fwd  pallas {t_p*1e6:8.1f} us  {flops/t_p/1e12:6.1f} TFLOP/s")

    if args.grad:
        def bench_g(fn):
            def f(q, k, v):
                return jnp.sum(fn(q, k, v).astype(jnp.float32))
            # ALL THREE cotangents: grad wrt q alone lets XLA drop the
            # dk/dv matmuls on its path while the Pallas custom-vjp always
            # computes the full backward — an apples-to-oranges comparison
            # that understated the Pallas win
            gfn = jax.grad(f, argnums=(0, 1, 2))

            def make_loop(n):
                @jax.jit
                def loop(q, k, v):
                    def body(q, _):
                        dq, dk, dv = gfn(q, k, v)
                        chain = (dq + dk * 1e-3 + dv * 1e-3) * 1e-6
                        return q + chain, None
                    out, _ = jax.lax.scan(body, q, None, length=n)
                    return out
                return loop

            def timed(loop):
                sync(loop(q, k, v))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    sync(loop(q, k, v))
                    best = min(best, time.perf_counter() - t0)
                return best

            t1 = timed(make_loop(args.iters))
            t2 = timed(make_loop(11 * args.iters))
            return (t2 - t1) / (10 * args.iters)

        gx = bench_g(lambda q, k, v: A.sdpa(q, k, v, implementation="xla"))
        gp = bench_g(lambda q, k, v: flash_attention(q, k, v, scale=scale))
        gflops = flops * 3.5  # fwd + ~2.5x bwd
        print(f"grad xla    {gx*1e6:8.1f} us  {gflops/gx/1e12:6.1f} TFLOP/s")
        print(f"grad pallas {gp*1e6:8.1f} us  {gflops/gp/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
