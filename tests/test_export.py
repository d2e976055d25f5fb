"""jax.export round-trip of the fused reconstruction sampler: the serialized
StableHLO artifact must run and match the live program (serving path,
export_sampler.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hivae_tpu.models import amd as amd_mod
from hivae_tpu.models import vae as vae_mod
from hivae_tpu.pipelines.pipeline import _recon_clip

pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)
SIZE, LAT, W = 32, 4, 4


def test_export_roundtrip_matches_live():
    from jax import export as jexport

    vae = vae_mod.AutoencoderKL(cfg=vae_mod.VAEConfig(
        block_out_channels=(4, 8, 8, 8), layers_per_block=1,
        norm_num_groups=4))
    vae_params = vae.init(KEY, jnp.zeros((1, 3, SIZE, SIZE)))
    cfg = amd_mod.AMDConfig(
        image_height=LAT, image_width=LAT, image_patch_size=1,
        video_frames=W, use_filter=True, use_grey=True,
        object_motion_token_num=2, object_motion_token_channel=16,
        object_enc_num_layers=1, enc_nhead=2, enc_ndim=8,
        camera_motion_token_num=W, camera_motion_token_channel=8,
        camera_enc_num_layers=1, motion_token_num=2, motion_token_channel=16,
        diffusion_model_type="spatial", diffusion_attn_head_dim=8,
        diffusion_attn_num_heads=2, diffusion_num_layers=1)
    model = amd_mod.AMDModelNew(cfg=cfg)
    v = jnp.zeros((1, W, 4, LAT, LAT))
    amd_params = model.init({"params": KEY, "noise": KEY}, v, v, v, v)

    def serve(vae_params, amd_params, pixels, grey, key):
        return _recon_clip(vae, model, vae_params, amd_params, pixels,
                           grey, key, sample_step=2, use_grey=True)

    pix_spec = jax.ShapeDtypeStruct((W + 1, 3, SIZE, SIZE), jnp.float32)
    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
    specs = (jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                          vae_params),
             jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                          amd_params),
             pix_spec, pix_spec, key_spec)

    exp = jexport.export(jax.jit(serve), platforms=("cpu",))(*specs)
    blob = exp.serialize()
    assert len(blob) > 1000

    rng = np.random.RandomState(0)
    pix = rng.uniform(-1, 1, (W + 1, 3, SIZE, SIZE)).astype(np.float32)
    grey = np.broadcast_to(pix.mean(1, keepdims=True),
                           pix.shape).astype(np.float32)
    k = np.asarray(jax.random.PRNGKey(3), np.uint32)

    live = serve(vae_params, amd_params, pix, grey, k)
    rt = jexport.deserialize(blob)
    served = rt.call(vae_params, amd_params, pix, grey, k)
    assert served.shape == live.shape and served.dtype == live.dtype
    np.testing.assert_array_equal(np.asarray(served), np.asarray(live))


def test_export_quantized_roundtrip():
    """--quant int8 form: the w8a8 tables are call-time args; the artifact
    round-trips and matches the live quantized program."""
    from jax import export as jexport

    from hivae_tpu.ops import quant

    vae = vae_mod.AutoencoderKL(cfg=vae_mod.VAEConfig(
        block_out_channels=(4, 8, 8, 8), layers_per_block=1,
        norm_num_groups=4))
    vae_params = vae.init(KEY, jnp.zeros((1, 3, SIZE, SIZE)))
    cfg = amd_mod.AMDConfig(
        image_height=LAT, image_width=LAT, image_patch_size=1,
        video_frames=W, use_filter=True, use_grey=True,
        object_motion_token_num=2, object_motion_token_channel=16,
        object_enc_num_layers=1, enc_nhead=2, enc_ndim=8,
        camera_motion_token_num=W, camera_motion_token_channel=8,
        camera_enc_num_layers=1, motion_token_num=2, motion_token_channel=16,
        diffusion_model_type="spatial", diffusion_attn_head_dim=8,
        diffusion_attn_num_heads=2, diffusion_num_layers=1)
    model = amd_mod.AMDModelNew(cfg=cfg)
    v = jnp.zeros((1, W, 4, LAT, LAT))
    amd_params = model.init({"params": KEY, "noise": KEY}, v, v, v, v)

    pred = lambda p, k: quant.default_predicate(p, k, min_dim=8)
    qt = quant.quantize_params(amd_params, predicate=pred)
    vqt = quant.quantize_params(vae_params, predicate=pred, scope=None)

    def serve(vae_params, amd_params, qt, vqt, pixels, grey, key):
        return _recon_clip(vae, model, vae_params, amd_params, pixels,
                           grey, key, sample_step=2, use_grey=True,
                           quant_table=qt, vae_quant_table=vqt)

    pix_spec = jax.ShapeDtypeStruct((W + 1, 3, SIZE, SIZE), jnp.float32)
    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
    sh = lambda t: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), t)
    specs = (sh(vae_params), sh(amd_params), sh(qt), sh(vqt),
             pix_spec, pix_spec, key_spec)

    exp = jexport.export(jax.jit(serve), platforms=("cpu",))(*specs)
    blob = exp.serialize()

    rng = np.random.RandomState(0)
    pix = rng.uniform(-1, 1, (W + 1, 3, SIZE, SIZE)).astype(np.float32)
    grey = np.broadcast_to(pix.mean(1, keepdims=True),
                           pix.shape).astype(np.float32)
    k = np.asarray(jax.random.PRNGKey(3), np.uint32)

    live = serve(vae_params, amd_params, qt, vqt, pix, grey, k)
    rt = jexport.deserialize(blob)
    served = rt.call(vae_params, amd_params, qt, vqt, pix, grey, k)
    np.testing.assert_array_equal(np.asarray(served), np.asarray(live))
