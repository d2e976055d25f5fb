"""Where does the int8 sampler's 1.15x stop? (VERDICT r3 weak #6)

Decomposes the flagship 696M DiT velocity forward into its quantizable
matmuls and measures each leg on the real chip, bf16 vs int8, at the
ACTUAL serving shapes (M = 16 frames x 260 joint tokens = 4160; the
module-docstring 1.8x anchor was a 4096^3 matmul, K = 4x deeper):

  1. bf16 matmul                                   t_bf
  2. quant_dense (dynamic per-token act quant)     t_q
  3. int8 matmul with PRE-quantized activations    t_q_pre   (isolates the
     act-quant pass: t_q - t_q_pre)
  4. the act-quant pass alone                      t_pass

then reconstructs the velocity forward by Amdahl:

  T_int8_pred = T_bf_fwd - sum(count * t_bf) + sum(count * t_q)

and compares against the measured int8 forward (bench_quant.py --part dit).
If the per-shape int8 rate at K=1024 is far below the 4096^3 anchor, the
sampler gap is the MXU's K-depth behavior, not the quant pass — and the
1.15x is a shape ceiling, not an implementation loss.

Differenced-scan timing throughout (two scan lengths, min-of-3, slope);
weights are traced zeros (timing is value-independent, XLA cannot fold).
"""

import argparse
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
                return x + (delta * 1e-20).astype(x.dtype), None
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
    p.add_argument("--m", type=int, default=4160,
                   help="batch-of-tokens: 16 frames x 260 joint tokens")
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    from hivae_tpu.ops import quant

    M = args.m
    key = jax.random.PRNGKey(0)
    # (label, K, N, count in one 696M velocity forward). The spatial model
    # runs a JOINT block (M = 16 frames x 266 joint tokens) AND a per-pixel
    # temporal SPATIAL block (M = 256 sites x 16 frames = 4096) per layer
    # (models/dit.py::VelocityDiTImgSpatial.run_layer), so each of the
    # flagship's 16 layers (amd.py: diffusion_num_layers=16) contributes
    # 2x the usual qkv/out + ffn set at M ~ 4.2k.
    L = 16
    shapes = [
        ("qkv/out 1024x1024", 1024, 1024, 4 * L * 2),
        ("ffn    1024x4096", 1024, 4096, L * 2),
        ("ffn    4096x1024", 4096, 1024, L * 2),
        ("anchor 4096x4096", 4096, 4096, 0),
    ]

    def row(label, K, N, count):
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        w = jnp.zeros((K, N), jnp.bfloat16)
        w8 = jnp.zeros((K, N), jnp.int8)
        scale = jnp.ones((N,), jnp.float32)
        xq = jnp.zeros((M, K), jnp.int8)

        t_bf = bench(lambda x, w: x @ w, (x, w), args.iters)
        t_q = bench(lambda x, w8, s: quant.quant_dense(x, w8, s),
                    (x, w8, scale), args.iters)

        def pre_mm(xq, w8, s):
            y = jax.lax.dot_general(xq, w8, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * s).astype(jnp.bfloat16)

        t_pre = bench(pre_mm, (xq, w8, scale), args.iters)

        def act_pass(x):
            xf = x.astype(jnp.float32)
            sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                             1e-8) / 127.0
            return jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)

        t_pass = bench(act_pass, (x,), args.iters)

        flops = 2 * M * K * N
        print(f"{label}  bf16 {t_bf*1e6:7.1f} us ({flops/t_bf/1e12:5.1f} TF/s)"
              f"  int8+dynq {t_q*1e6:7.1f} us ({flops/t_q/1e12:5.1f} TF/s,"
              f" {t_bf/t_q:4.2f}x)  int8-pre {t_pre*1e6:7.1f} us"
              f" ({flops/t_pre/1e12:5.1f} TF/s, {t_bf/t_pre:4.2f}x)"
              f"  act-pass {t_pass*1e6:6.1f} us")
        return t_bf * count, t_q * count, (t_q - t_pre) * count

    tot_bf = tot_q = tot_pass = 0.0
    for label, K, N, count in shapes:
        b, q, ps = row(label, K, N, count)
        tot_bf += b
        tot_q += q
        tot_pass += ps

    # Would int8 QK^T / PV inside the attention pay? Measure the joint
    # block's actual attention matmul geometry (B*H batched, S=266, d=64):
    # tiny contraction depths keep the MXU pipeline-bound, so int8's 2x
    # peak cannot express itself — this leg documents that directly.
    BH, S, D = 16 * 16, 266, 64
    qa = jax.random.normal(key, (BH, S, D), jnp.bfloat16)
    ka = jax.random.normal(key, (BH, D, S), jnp.bfloat16)
    q8 = jnp.zeros((BH, S, D), jnp.int8)
    k8 = jnp.zeros((BH, D, S), jnp.int8)
    pa = jax.random.normal(key, (BH, S, S), jnp.bfloat16)
    va = jax.random.normal(key, (BH, S, D), jnp.bfloat16)
    p8 = jnp.zeros((BH, S, S), jnp.int8)
    v8 = jnp.zeros((BH, S, D), jnp.int8)

    def bmm(a, b):
        return jax.lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=(
                                       jnp.int32 if a.dtype == jnp.int8
                                       else jnp.float32))

    for name, a, b, a8, b8 in (("QK^T (266x64x266)", qa, ka, q8, k8),
                               ("PV   (266x266x64)", pa, va, p8, v8)):
        t_bf = bench(bmm, (a, b), args.iters)
        t_i8 = bench(bmm, (a8, b8), args.iters)
        fl = 2 * BH * S * S * D
        print(f"attn {name}  bf16 {t_bf*1e6:7.1f} us ({fl/t_bf/1e12:5.1f}"
              f" TF/s)  int8-pre {t_i8*1e6:7.1f} us ({fl/t_i8/1e12:5.1f}"
              f" TF/s, {t_bf/t_i8:4.2f}x)")

    print(f"\nper-forward quantizable-matmul time: bf16 {tot_bf*1e3:6.2f} ms"
          f" -> int8 {tot_q*1e3:6.2f} ms (of which act-quant pass"
          f" ~{tot_pass*1e3:5.2f} ms)")
    print("Amdahl: T_int8_fwd_pred = T_bf_fwd - {:.2f} ms + {:.2f} ms; plug"
          " the measured velocity-forward T_bf_fwd from bench_quant.py"
          " --part dit".format(tot_bf * 1e3, tot_q * 1e3))


if __name__ == "__main__":
    main()
