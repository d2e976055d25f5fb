"""Headline benchmark: video VAE encode+decode throughput (16 frames @ 256²).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); the driver-set target is
>=10x PyTorch-CPU and A100-parity frames/sec/chip.

``A100_FPS`` (the ``vs_baseline`` anchor) is a derived roofline figure, not
a measurement: one 16-frame roundtrip costs 14.14 TFLOP (XLA cost analysis:
encode 4.30 + decode 9.84 TFLOP, benchmarks/RESULTS.md), so 60 frames/s
corresponds to an A100 (312 TFLOP/s fp16 dense peak per the public NVIDIA
A100 80GB datasheet, the one external constant the derivation rests on)
sustaining ~17% MFU on the sd-vae conv stack — the ballpark eager-torch
fp16 diffusers VAEs reach in practice. The anchor is REPRODUCIBLE, not just
derived: ``benchmarks/bench_torch_cpu.py`` auto-detects CUDA and, run once
on any A100 host, measures this exact workload in eager torch fp16 —
substitute its output for A100_FPS the day a GPU is available.
vs_baseline >= 1.0 therefore means "at least A100-class"; the measured TPU
number's own MFU is reported in RESULTS.md (~80% of a v5e's 197 TFLOP/s
bf16 peak).

Timing note: ``block_until_ready`` is a no-op through the axon relay, so the
loop is fenced by a scalar host fetch (a real device sync) instead.

Outage note: the axon relay is a tunnel that can be transiently DOWN
(backend init raises UNAVAILABLE) — round 3's driver capture was lost to
exactly that. The measurement therefore runs in a SUBPROCESS (a failed
backend init is cached inside a JAX process, so in-process retry is
useless) and the wrapper retries with bounded backoff on transient relay
errors before failing loudly.
"""

import json
import os
import subprocess
import sys
import time

# error signatures that mark a transient relay/backend outage (retryable)
TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "Unable to initialize backend",
    "DEADLINE_EXCEEDED",
    "failed to connect",
    "Connection refused",
    "Socket closed",
)
# bounded backoff: ~7.5 min total wait — long enough to ride out a relay
# blip, short enough that a real outage fails the run instead of hanging it
RETRY_DELAYS = (30.0, 120.0, 300.0)


def _is_transient(text: str) -> bool:
    return any(m in text for m in TRANSIENT_MARKERS)


def run_with_retries(cmd=None, delays=None, sleep=time.sleep,
                     stderr=sys.stderr):
    """Run the inner measurement subprocess, retrying transient failures.

    Returns the inner process's stdout on success. Raises SystemExit with
    the inner output on a non-transient failure or after exhausting
    retries (fail loudly — never emit a fake JSON line).
    """
    if cmd is None:
        cmd = [sys.executable, os.path.abspath(__file__)]
    if delays is None:
        delays = RETRY_DELAYS
    env = dict(os.environ, HIVAE_BENCH_INNER="1")
    attempts = len(delays) + 1
    for i in range(attempts):
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
        if proc.returncode == 0:
            if proc.stderr:
                print(proc.stderr, file=stderr, end="")
            return proc.stdout
        blob = proc.stdout + proc.stderr
        transient = _is_transient(blob)
        print(f"bench attempt {i + 1}/{attempts} failed "
              f"(rc={proc.returncode}, transient={transient})",
              file=stderr)
        if not transient or i == attempts - 1:
            print(blob, file=stderr, end="")
            raise SystemExit(proc.returncode or 1)
        print(blob[-400:], file=stderr)
        print(f"retrying in {delays[i]:.0f}s ...", file=stderr)
        sleep(delays[i])
    raise SystemExit(1)  # unreachable


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

A100_FPS = 60.0
FRAMES = 16
RES = 256


def main():
    from hivae_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from hivae_tpu.models import vae as vae_mod

    dtype = jnp.bfloat16
    model = vae_mod.AutoencoderKL(dtype=dtype)
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((FRAMES, 3, RES, RES), jnp.float32)
    # zeros-params via eval_shape: same FLOPs/memory as real weights but no
    # giant init program (the remote compiler rejects oversized HLO payloads)
    shapes = jax.eval_shape(lambda: model.init(key, img[:1]))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    encode = jax.jit(lambda x: model.apply(params, x, method="encode_moments"))
    decode = jax.jit(lambda z: model.apply(params, z, method="decode"))

    def sync(x):
        # scalar fetch = real device fence (relay block_until_ready no-ops)
        return float(jnp.sum(x[0, 0, 0, :4].astype(jnp.float32)))

    # warmup / compile
    z = encode(img)[:, :4]
    out = decode(z)
    sync(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        z = encode(img)[:, :4]
        out = decode(z)
    sync(out)
    dt = time.perf_counter() - t0

    fps = FRAMES * iters / dt

    # Supplementary: the int8 (w8a8) serving path on the decode leg — a
    # capability number, reported alongside the headline (which stays the
    # bf16 roundtrip for cross-round comparability). Guarded: the headline
    # must survive any int8-path failure.
    record = {
        "metric": "vae_encode_decode_frames_per_sec_per_chip_16f_256",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / A100_FPS, 3),
    }
    try:
        from functools import partial

        from hivae_tpu.ops import quant

        table = jax.jit(partial(quant.quantize_params,
                        scope=("decoder",)))(params)
        dec_q = jax.jit(lambda z: vae_mod.vae_decode(
            model, params, z[:, None], quant_table=table)[:, 0])
        dec_bf = jax.jit(lambda z: vae_mod.vae_decode(
            model, params, z[:, None])[:, 0])
        sync(dec_q(z)); sync(dec_bf(z))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = dec_bf(z)
        sync(out)
        t_bf = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = dec_q(z)
        sync(out)
        t_q = time.perf_counter() - t0
        record["int8_decode_fps"] = round(FRAMES * iters / t_q, 2)
        record["int8_decode_speedup"] = round(t_bf / t_q, 3)
    except Exception as e:  # noqa: BLE001 — supplementary only
        import sys
        print(f"int8 supplementary measurement failed: {e!r}",
              file=sys.stderr)

    # Supplementary 2 (round 5): the flagship 696M DiT 10-step Euler
    # sampler, bf16 and int8 — the serving numbers the round-5 predicate +
    # fused-FFN work moved (RESULTS.md "Round-5 re-baseline"). Same
    # differenced-scan method and model construction as
    # benchmarks/bench_quant.py --part dit, so the programs hit the
    # persistent compile cache. Guarded like the int8 leg: the headline
    # must survive any failure here.
    try:
        record.update(_dit_sampler_supplementary())
    except Exception as e:  # noqa: BLE001 — supplementary only
        import sys
        print(f"dit sampler supplementary measurement failed: {e!r}",
              file=sys.stderr)
    print(json.dumps(record))


def _dit_sampler_supplementary(frames=16, sample_step=10):
    from hivae_tpu.models import amd
    from hivae_tpu.ops import quant

    def bench(fn, args, iters):
        def make_loop(n):
            @jax.jit
            def loop(first, *rest):
                def body(x, _):
                    out = fn(x, *rest)
                    leaf = jax.tree.leaves(out)[0]
                    delta = jnp.sum(leaf.astype(jnp.float32)).astype(x.dtype)
                    return x + delta * 1e-20, None
                x, _ = jax.lax.scan(body, first, None, length=n)
                return x

            return loop

        def sync(x):
            return float(jnp.sum(jnp.ravel(x)[:4].astype(jnp.float32)))

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

    model = amd.AMD_N(dtype=jnp.bfloat16, use_filter=True, use_grey=True,
                      video_frames=frames, camera_motion_token_num=frames,
                      camera_motion_token_channel=16,
                      object_motion_token_num=4,
                      object_motion_token_channel=512,
                      motion_token_num=4, motion_token_channel=512,
                      diffusion_model_type="spatial")
    key = jax.random.PRNGKey(0)
    shape = (1, frames, 4, 32, 32)
    video = jax.random.normal(key, shape)
    ref = jnp.broadcast_to(video[:, :1], shape)
    shapes = jax.eval_shape(lambda: model.init(
        {"params": key, "noise": key}, video, ref, video, ref))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    table = jax.jit(quant.quantize_params)(params)

    def sampler(video, ref, quant_table):
        _, out, _ = amd.sample(model, params, jax.random.PRNGKey(1), video,
                               ref, video_grey=video, ref_img_grey=ref,
                               sample_step=sample_step,
                               quant_table=quant_table)
        return out

    t_bf = bench(lambda v, r: sampler(v, r, None), (video, ref), 2)
    t_q = bench(lambda v, r: sampler(v, r, table), (video, ref), 2)
    return {
        "dit_sampler_bf16_fps": round(frames / t_bf, 2),
        "dit_sampler_int8_fps": round(frames / t_q, 2),
    }


if __name__ == "__main__":
    if os.environ.get("HIVAE_BENCH_INNER"):
        main()
    else:
        sys.stdout.write(run_with_retries())
