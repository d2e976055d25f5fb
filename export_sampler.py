"""Export the fused reconstruction sampler as a serialized StableHLO artifact.

TPU-native deployment path (no reference equivalent — the reference serves by
importing torch code): ``jax.export`` lowers the ONE-program clip sampler
(`pipelines._recon_clip`: VAE encode -> motion encode -> Euler scan -> VAE
decode -> uint8) to a versioned, self-contained StableHLO module that a
serving binary (or another process/framework) can load and run without this
package, Flax, or Python model code. Weights stay call-time arguments so one
artifact serves any checkpoint of the same config.

    python export_sampler.py --amd_config config.json --out sampler.jaxexp \
        [--amd_ckpt dir-or-safetensors] [--frames 16] [--size 256]
        [--sample_step 10] [--platform tpu cpu] [--check]

``--check`` deserializes the artifact and runs it on zeros via jax.export's
calling convention, printing the output shape/dtype.
"""

import argparse
import json

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--amd_config", type=str, required=True)
    p.add_argument("--amd_ckpt", type=str, default=None,
                   help="Orbax checkpoint dir or torch .safetensors; "
                        "random init if omitted (weights are call-time "
                        "args — the artifact itself is weightless)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--sample_step", type=int, default=10)
    p.add_argument("--platform", type=str, nargs="+", default=["tpu"],
                   help="lowering platforms, e.g. --platform tpu cpu")
    p.add_argument("--quant", type=str, default=None, choices=["int8"],
                   help="int8: the exported program runs the DiT Euler "
                        "loop and the VAE decode leg on the int8 MXU; the "
                        "w8a8 tables become call-time arguments (build "
                        "them with ops.quant.quantize_params)")
    p.add_argument("--check", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from hivae_tpu.models import amd as amd_mod
    from hivae_tpu.models import vae as vae_mod
    from hivae_tpu.pipelines.pipeline import _recon_clip
    from hivae_tpu.utils.misc import init_on_cpu

    with open(args.amd_config) as f:
        cfg = amd_mod.AMDConfig.from_dict(json.load(f))
    cfg = cfg.replace(video_frames=args.frames)
    was_scanned = getattr(cfg, "scan_layers", False)
    if args.quant and was_scanned:
        # the int8 interceptor addresses Denses by module path; nn.scan's
        # stacked layout serves every layer through ONE path, so quantized
        # serving exports the unrolled layout (params converted below;
        # quantize_params refuses stacked trees as a backstop)
        cfg = cfg.replace(scan_layers=False)
        print("quant: exporting the unrolled layer layout "
              "(scan_layers=False)")
    model = amd_mod.AMDModelNew(cfg=cfg, dtype=jnp.bfloat16)
    vae = vae_mod.AutoencoderKL(dtype=jnp.bfloat16)

    lh, lw = cfg.image_height, cfg.image_width
    use_grey = cfg.use_grey

    def _init():
        key = jax.random.PRNGKey(0)
        v = jnp.zeros((1, args.frames, 4, lh, lw))
        amd_params = model.init({"params": key, "noise": key}, v, v,
                                v if use_grey else None,
                                v if use_grey else None)
        vae_params = vae.init(key, jnp.zeros((1, 3, args.size, args.size)))
        return amd_params, vae_params

    amd_params, vae_params = init_on_cpu(_init)

    # ring needs its mesh installed outside training — but only after the
    # CPU-eager init, which must not dispatch onto the TPU mesh
    from hivae_tpu.ops.attention import install_attn_impl

    install_attn_impl(cfg)
    if args.amd_ckpt:
        from hivae_tpu.training import checkpoint as ckpt_lib
        if args.amd_ckpt.endswith(".safetensors"):
            amd_params, report = ckpt_lib.load_pretrain_partial(
                amd_params, args.amd_ckpt)
            print(f"converted torch ckpt; missing={len(report['missing'])}")
        else:
            import orbax.checkpoint as ocp
            path = (ckpt_lib.find_latest_checkpoint(args.amd_ckpt)
                    or args.amd_ckpt)
            restored = ocp.StandardCheckpointer().restore(path)
            amd_params = restored.get("params", restored)
            if "params" not in amd_params:
                amd_params = {"params": amd_params}
            if args.quant and was_scanned:
                from hivae_tpu.ops.quant import unstack_scanned
                amd_params = {"params": unstack_scanned(
                    amd_params["params"], cfg.diffusion_num_layers)}

    f1 = args.frames + 1
    pix = jax.ShapeDtypeStruct((f1, 3, args.size, args.size), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    shapes_of = lambda t: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), t)

    if args.quant == "int8":
        # w8a8 serving: the tables are call-time args like the weights, so
        # one artifact still serves any checkpoint of the config (build the
        # tables with ops.quant.quantize_params at load time)
        from functools import partial

        from hivae_tpu.ops import quant as quant_ops

        qt_spec = jax.eval_shape(quant_ops.quantize_params, amd_params)
        vqt_spec = jax.eval_shape(
            partial(quant_ops.quantize_params, scope=("decoder",)),
            vae_params)

        def serve(vae_params, amd_params, qt, vqt, pixels, grey, key):
            return _recon_clip(vae, model, vae_params, amd_params, pixels,
                               grey, key, sample_step=args.sample_step,
                               use_grey=use_grey, quant_table=qt,
                               vae_quant_table=vqt)

        specs = (shapes_of(vae_params), shapes_of(amd_params),
                 shapes_of(qt_spec), shapes_of(vqt_spec), pix, pix, key)
    else:
        def serve(vae_params, amd_params, pixels, grey, key):
            return _recon_clip(vae, model, vae_params, amd_params, pixels,
                               grey, key, sample_step=args.sample_step,
                               use_grey=use_grey)

        specs = (shapes_of(vae_params), shapes_of(amd_params), pix, pix,
                 key)

    exp = jexport.export(jax.jit(serve),
                         platforms=tuple(args.platform))(*specs)
    blob = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {args.out}: {len(blob)/1e6:.2f} MB, "
          f"platforms={exp.platforms}, "
          f"out={exp.out_avals[0].shape} {exp.out_avals[0].dtype}")

    if args.check:
        rt = jexport.deserialize(blob)
        zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), specs)
        out = rt.call(*zeros)
        print(f"check OK: output {out.shape} {out.dtype}, "
              f"finite={bool(np.isfinite(np.asarray(out, np.float32)).all())}")


if __name__ == "__main__":
    main()
