"""Ring-attention hop benchmark: einsum hop vs streaming-flash hop.

The ring's per-device cost is (n_dev hops) x (one hop body) + rotation;
the rotation (ppermute bytes) is IDENTICAL between hop implementations, so
the single-chip measurable quantity is the hop body at the local block
geometry ring exists for (>=2048 local tokens). A 1-device mesh runs the
full ``sequence_sharded_sdpa`` machinery (shard_map + custom VJP + merge)
with exactly one hop — the composition's real code path, minus the ICI
traffic a single chip cannot have.

Differenced-scan timing (two scan lengths, min-of-3) per RESULTS.md
methodology. Run with PYTHONPATH=/root/repo:/root/.axon_site on the chip.
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:4].astype(jnp.float32)))


def bench(fn, args, iters=8):
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
    p.add_argument("--b", type=int, default=1)
    p.add_argument("--h", type=int, default=8)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--s_loc", type=int, nargs="+", default=[2048, 4096])
    p.add_argument("--grad", action="store_true")
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    from hivae_tpu.parallel import local_mesh
    from hivae_tpu.parallel.ring_attention import sequence_sharded_sdpa
    from hivae_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    mesh = local_mesh()
    key = jax.random.PRNGKey(0)

    for s in args.s_loc:
        shape = (args.b, args.h, s, args.d)
        q = jax.random.normal(key, shape, jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.bfloat16)
        flops_fwd = 4 * args.b * args.h * s * s * args.d
        for impl in ("xla", "flash"):
            with mesh:
                ring = functools.partial(sequence_sharded_sdpa, mesh=mesh,
                                         impl=impl)
                if args.grad:
                    def loss(q, k, v, _ring=ring):
                        return jnp.sum(_ring(q, k, v).astype(jnp.float32))
                    fn = jax.grad(loss, argnums=(0, 1, 2))
                else:
                    fn = ring
                dt = bench(fn, (q, k, v), iters=args.iters)
            mult = 3.5 if args.grad else 1.0
            tfs = flops_fwd * mult / dt / 1e12
            mode = "grad" if args.grad else "fwd"
            print(f"s_loc={s:5d} impl={impl:5s} {mode}: "
                  f"{dt*1e6:9.1f} us/iter  {tfs:6.1f} TF/s")


if __name__ == "__main__":
    main()
