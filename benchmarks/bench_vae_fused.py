"""Headline-bench methodology probe: dispatch overhead in the VAE roundtrip.

bench.py times encode+decode as two jitted dispatches per iteration. Through
the axon relay each dispatch costs a WAN round trip; this probe measures how
much of the headline number that eats by comparing, on identical zeros
weights and input:

  a) split   — encode; decode (bench.py's loop)
  b) fused   — one jit(decode(encode(x))) program per iteration
  c) scanned — one program running the roundtrip ``--iters`` times via
               lax.fori_loop (zero per-iteration dispatch; pure device rate)

If (c) >> (a), bench.py under-reports the chip and should move to the fused
program. Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_vae_fused.py
"""

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--frames", type=int, default=16)
    args = p.parse_args()

    from hivae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from hivae_tpu.models import vae as vae_mod

    model = vae_mod.AutoencoderKL(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((args.frames, 3, 256, 256), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(key, img[:1]))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    encode = jax.jit(lambda x: model.apply(params, x, method="encode_moments"))
    decode = jax.jit(lambda z: model.apply(params, z, method="decode"))

    @jax.jit
    def fused(x):
        z = model.apply(params, x, method="encode_moments")[:, :4]
        return model.apply(params, z, method="decode")

    @jax.jit
    def scanned(x):
        def body(_, carry):
            z = model.apply(params, carry, method="encode_moments")[:, :4]
            return model.apply(params, z, method="decode").astype(jnp.float32)
        return jax.lax.fori_loop(0, args.iters, body, x)

    def sync(x):
        return float(jnp.sum(x[0, 0, 0, :4].astype(jnp.float32)))

    # --- a) split (bench.py methodology)
    out = decode(encode(img)[:, :4]); sync(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        z = encode(img)[:, :4]
        out = decode(z)
    sync(out)
    dt = time.perf_counter() - t0
    print(f"split:   {args.frames*args.iters/dt:7.1f} f/s  ({dt*1e3:.0f} ms)")

    # --- b) fused
    out = fused(img); sync(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fused(img)
    sync(out)
    dt = time.perf_counter() - t0
    print(f"fused:   {args.frames*args.iters/dt:7.1f} f/s  ({dt*1e3:.0f} ms)")

    # --- c) scanned (pure device rate, zero dispatch)
    out = scanned(img); sync(out)
    t0 = time.perf_counter()
    out = scanned(img)
    sync(out)
    dt = time.perf_counter() - t0
    print(f"scanned: {args.frames*args.iters/dt:7.1f} f/s  ({dt*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
