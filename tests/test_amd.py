"""AMD model family: forward/sample shape tests + parameter-count anchors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hivae_tpu.models import amd

KEY = jax.random.PRNGKey(0)

TINY = dict(image_height=16, image_width=16, video_frames=4,
            object_motion_token_num=4, object_motion_token_channel=32,
            object_enc_num_layers=2, enc_nhead=2, enc_ndim=16,
            camera_motion_token_num=4, camera_motion_token_channel=16,
            camera_enc_num_layers=2, motion_token_num=4,
            motion_token_channel=32, diffusion_attn_head_dim=16,
            diffusion_attn_num_heads=4, diffusion_num_layers=2)


def _data(c=4, t=4, hw=16):
    video = jax.random.normal(KEY, (2, t, c, hw, hw))
    ref = jnp.broadcast_to(video[:, :1], video.shape)
    return video, ref


class TestAMDModelNew:
    @pytest.mark.parametrize("dit", ["spatial", "default"])
    def test_forward_and_sample(self, dit):
        cfg = amd.AMDConfig(use_filter=True, use_grey=True,
                            diffusion_model_type=dit, **TINY)
        model = amd.AMDModelNew(cfg=cfg)
        video, ref = _data()
        params = model.init({"params": KEY, "noise": KEY}, video, ref, video, ref)
        pre, vel, ld = model.apply(params, video, ref, video, ref,
                                   rngs={"noise": KEY})
        assert pre.shape == vel.shape == (8, 4, 16, 16)
        assert np.isfinite(float(ld["loss"]))
        zi, zt, zj = amd.sample(model, params, KEY, video, ref, video, ref,
                                sample_step=2)
        assert zt.shape == video.shape
        np.testing.assert_allclose(np.asarray(zj), np.asarray(video))

    def test_encode_decode_roundtrip_shapes(self):
        cfg = amd.AMDConfig(use_filter=True, use_grey=True,
                            diffusion_model_type="spatial", **TINY)
        model = amd.AMDModelNew(cfg=cfg)
        video, ref = _data()
        params = model.init({"params": KEY, "noise": KEY}, video, ref, video, ref)
        cam_t, obj_s, obj_t = model.apply(params, video, ref, video, ref,
                                          method="encode")
        assert cam_t.shape == (2, 4, 64, 16)  # (n, t, sites, cam_ch)
        assert obj_s.shape == obj_t.shape == (8, 4, 32)
        motions = dict(camera_target=cam_t, object_source=obj_s,
                       object_target=obj_t)
        out = amd.decode(model, params, KEY, ref, motions, frames=4,
                         sample_step=2)
        assert out.shape == video.shape

    def test_masking_path(self):
        cfg = amd.AMDConfig(use_filter=True, use_grey=True,
                            diffusion_model_type="spatial", **TINY)
        model = amd.AMDModelNew(cfg=cfg)
        video, ref = _data()
        params = model.init({"params": KEY, "noise": KEY, "mask": KEY},
                            video, ref, video, ref, None, 0.5, 0.25)
        pre, _, ld = model.apply(params, video, ref, video, ref, None, 0.5,
                                 0.25, rngs={"noise": KEY, "mask": KEY})
        assert np.isfinite(float(ld["loss"]))


class TestAMDModel:
    @pytest.mark.parametrize("dit,motion_type", [("default", "plus"),
                                                 ("default", "decouple"),
                                                 ("spatial", "decouple"),
                                                 ("dual", "plus")])
    def test_forward_and_sample(self, dit, motion_type):
        kw = dict(TINY)
        kw["camera_motion_token_channel"] = 32
        cfg = amd.AMDConfig(use_filter=True, diffusion_model_type=dit,
                            motion_type=motion_type, use_motiontemporal=True,
                            **kw)
        model = amd.AMDModel(cfg=cfg)
        video, ref = _data()
        params = model.init({"params": KEY, "noise": KEY, "noise_kl": KEY},
                            video, ref)
        pre, vel, ld = model.apply(params, video, ref,
                                   rngs={"noise": KEY, "noise_kl": KEY})
        assert pre.shape == (8, 4, 16, 16)
        assert np.isfinite(float(ld["loss"]))
        zi, zt, zj = amd.sample(model, params, KEY, video, ref, sample_step=2)
        assert zt.shape == video.shape

    def test_regularizer_path(self):
        kw = dict(TINY)
        kw["camera_motion_token_channel"] = 32
        cfg = amd.AMDConfig(use_regularizers=True, use_motiontemporal=False,
                            use_camera_down=True,
                            diffusion_model_type="default", **kw)
        model = amd.AMDModel(cfg=cfg)
        video, ref = _data()
        params = model.init({"params": KEY, "noise": KEY, "noise_kl": KEY},
                            video, ref)
        _, _, ld = model.apply(params, video, ref,
                               rngs={"noise": KEY, "noise_kl": KEY})
        assert "KLloss" in ld and np.isfinite(float(ld["KLloss"]))


class TestParamCounts:
    def test_amd_s_parameter_count(self):
        """AMD_S is documented at ~250M params (reference
        model_AMD.py:3205); check we land in that ballpark without
        allocating memory (eval_shape)."""
        model = amd.AMD_S()
        video = jax.ShapeDtypeStruct((1, 16, 4, 32, 32), jnp.float32)

        def init(v):
            return model.init({"params": KEY, "noise": KEY}, v, v)

        shapes = jax.eval_shape(init, video)
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))
        assert 150e6 < n < 350e6, f"AMD_S param count {n/1e6:.1f}M"

    def test_config_roundtrip(self):
        cfg = amd.AMDConfig(video_frames=8, diffusion_model_type="spatial")
        d = cfg.to_dict()
        # extra keys (diffusers ConfigMixin metadata) must be ignored
        d["_class_name"] = "AMDModel_New"
        cfg2 = amd.AMDConfig.from_dict(d)
        assert cfg2 == cfg


@pytest.mark.slow
class TestDiffMotionAndCamera:
    def test_sample_diff_motion(self):
        """Camera stream from a different clip (reference
        ``AMDModel.sample_diff_motion:598-757``)."""
        # decouple mode: camera tokens drive the early DiT layers (in the
        # reference's spatial 'plus' mode the camera stream is unused by
        # design — transformer.py:2235-2247 feeds object tokens only).
        cfg = amd.AMDConfig(use_filter=True, use_grey=True,
                            use_motiontemporal=False, use_camera_down=True,
                            motion_type="decouple",
                            diffusion_model_type="spatial", **TINY)
        model = amd.AMDModel(cfg=cfg)
        video, ref = _data()
        other = jax.random.normal(jax.random.PRNGKey(7), video.shape)
        params = model.init({"params": KEY, "noise": KEY, "noise_kl": KEY},
                            video, ref, video, ref)
        zi, zt, zj = amd.sample_diff_motion(model, params, KEY, video, ref,
                                            video, ref, other, sample_step=2)
        assert zt.shape == video.shape
        assert bool(jnp.all(jnp.isfinite(zt)))
        # swapping the camera source must change the output
        zt2 = amd.sample_diff_motion(model, params, KEY, video, ref, video,
                                     ref, video, sample_step=2)[1]
        assert float(jnp.abs(zt - zt2).max()) > 1e-6

    def test_camera_only_factory(self):
        factory_set = {"enc_nhead", "enc_ndim", "diffusion_attn_head_dim",
                       "diffusion_attn_num_heads", "diffusion_num_layers"}
        kw = {k: v for k, v in TINY.items() if k not in factory_set}
        model = amd.AMD_MODELS["AMD_S_Camera"](
            use_filter=True, use_grey=True,
            diffusion_model_type="spatial", **kw)
        assert model.cfg.use_object is False and model.cfg.use_camera
        video, ref = _data()
        params = model.init({"params": KEY, "noise": KEY}, video, ref,
                            video, ref)
        names = jax.tree_util.tree_leaves_with_path(params)
        flat = "".join(str(p) for p, _ in names)
        assert "object_motion_encoder" not in flat
        _, _, ld = model.apply(params, video, ref, video, ref,
                               rngs={"noise": KEY})
        assert np.isfinite(float(ld["loss"]))


@pytest.mark.slow
class TestMotionTransformer:
    """The sequence-level motion transformer must actually shape outputs
    when ``need_motion_transformer`` is set (the reference's own forward
    branch is dead code — ``model_AMD.py:371-374`` NameErrors — but the
    working single-stream analogue ``AMDModel_Camera:1176`` defines the
    intent)."""

    def _perturb(self, params, scale=0.05):
        import flax

        flat = flax.traverse_util.flatten_dict(params)
        out = {}
        for path, leaf in flat.items():
            if "motion_transformer" in path:
                leaf = leaf + scale * jnp.ones_like(leaf)
            out[path] = leaf
        return flax.traverse_util.unflatten_dict(out)

    def test_amd_forward_uses_motion_transformer(self):
        kw = dict(TINY)
        kw["camera_motion_token_channel"] = 32
        cfg = amd.AMDConfig(need_motion_transformer=True,
                            use_motiontemporal=False, use_camera_down=True,
                            diffusion_model_type="default",
                            motion_type="plus", **kw)
        model = amd.AMDModel(cfg=cfg)
        video, ref = _data()
        params = model.init({"params": KEY, "noise": KEY}, video, ref)
        flat = "".join(str(p) for p, _ in
                       jax.tree_util.tree_leaves_with_path(params))
        assert "motion_transformer" in flat
        pre, _, _ = model.apply(params, video, ref, rngs={"noise": KEY})
        pre2, _, _ = model.apply(self._perturb(params), video, ref,
                                 rngs={"noise": KEY})
        assert float(jnp.abs(pre - pre2).max()) > 1e-6

    def test_refimg_motion_path_uses_motion_transformer(self):
        cfg = amd.AMDConfig(use_filter=True, use_grey=True,
                            need_motion_transformer=True,
                            diffusion_model_type="spatial", **TINY)
        model = amd.AMDModelNew(cfg=cfg)
        video, ref = _data()
        params = model.init({"params": KEY, "noise": KEY}, video, ref,
                            video, ref)
        motion = model.apply(params, video, method="extract_motion")
        zi, zt = amd.sample_with_refimg_motion(model, params, KEY,
                                               ref[:, 0], motion,
                                               sample_step=2)
        zt2 = amd.sample_with_refimg_motion(model, self._perturb(params),
                                            KEY, ref[:, 0], motion,
                                            sample_step=2)[1]
        assert zt.shape == video.shape
        assert float(jnp.abs(zt - zt2).max()) > 1e-6

    def test_camera_only_motion_transformer(self):
        kw = {k: v for k, v in TINY.items()
              if k not in ("camera_motion_token_channel", "motion_token_num",
                           "motion_token_channel")}
        cfg = amd.AMDConfig(use_filter=True, use_grey=True, use_object=False,
                            need_motion_transformer=True,
                            camera_motion_token_channel=16,
                            motion_token_num=4, motion_token_channel=16,
                            diffusion_model_type="spatial", **kw)
        model = amd.AMDModelNew(cfg=cfg)
        video, ref = _data()
        params = model.init({"params": KEY, "noise": KEY}, video, ref,
                            video, ref)
        pre, _, _ = model.apply(params, video, ref, video, ref,
                                rngs={"noise": KEY})
        pre2, _, _ = model.apply(self._perturb(params), video, ref, video,
                                 ref, rngs={"noise": KEY})
        assert float(jnp.abs(pre - pre2).max()) > 1e-6


class TestStartStep:
    def test_euler_start_blend(self):
        from hivae_tpu.ops import rectified_flow as rf

        z0 = jnp.ones((2, 3))
        z1 = jnp.full((2, 3), 5.0)
        # full range -> pure noise start
        np.testing.assert_allclose(rf.euler_start(z0, z1, 1000, 1000), z0)
        # start at 750 -> t0 = 0.25: 0.25*5 + 0.75*1 = 2.0
        np.testing.assert_allclose(rf.euler_start(z0, z1, 750, 1000),
                                   jnp.full((2, 3), 2.0))
        with pytest.raises(ValueError):
            rf.euler_start(z0, None, 500, 1000)

    def test_sample_with_start_step(self):
        cfg = amd.AMDConfig(use_filter=True, use_grey=True,
                            diffusion_model_type="spatial", **TINY)
        model = amd.AMDModelNew(cfg=cfg)
        video, ref = _data()
        params = model.init({"params": KEY, "noise": KEY}, video, ref,
                            video, ref)
        # a very low start step keeps the walk near the (blended) target
        _, zt, _ = amd.sample(model, params, KEY, video, ref, video, ref,
                              sample_step=2, start_step=10)
        err_low = float(amd.l2(zt, video))
        _, zt_full, _ = amd.sample(model, params, KEY, video, ref, video,
                                   ref, sample_step=2)
        err_full = float(amd.l2(zt_full, video))
        assert err_low < err_full  # starting nearer the target must help


class TestReviewFixes:
    """Round-3 review findings: single-stream plus/dual refimg-motion
    sampling, scan-layers single-stream serving, decode() frame tiling,
    and the use_mask-without-filter guard."""

    def test_refimg_motion_plus_default(self):
        """AMDModel (motion_type='plus', default DiT): the provided tokens
        ride as the single motion stream (reference model_AMD.py:819)."""
        cfg = amd.AMDConfig(use_filter=True, use_grey=True,
                            diffusion_model_type="default",
                            motion_type="plus", **TINY)
        model = amd.AMDModel(cfg=cfg)
        video, ref = _data()
        params = model.init({"params": KEY, "noise": KEY}, video, ref,
                            video, ref)
        motion = model.apply(params, video, method="extract_motion")
        zi, zt = amd.sample_with_refimg_motion(model, params, KEY, ref[:, 0],
                                               motion, sample_step=2)
        assert zt.shape == video.shape
        assert bool(jnp.all(jnp.isfinite(zt)))

    def test_refimg_motion_dual(self):
        cfg = amd.AMDConfig(use_filter=True, use_grey=True,
                            diffusion_model_type="dual", **TINY)
        model = amd.AMDModel(cfg=cfg)
        video, ref = _data()
        params = model.init({"params": KEY, "noise": KEY}, video, ref,
                            video, ref)
        motion = model.apply(params, video, method="extract_motion")
        zi, zt = amd.sample_with_refimg_motion(model, params, KEY, ref[:, 0],
                                               motion, sample_step=2)
        assert zt.shape == video.shape

    def test_scan_layers_single_stream(self):
        """A scan_layers spatial checkpoint serves the single-stream paths
        (sample_cross: camera only; refimg-motion: object only) with
        numerics equal to the unrolled layout on the unstacked params."""
        from hivae_tpu.ops.quant import unstack_scanned

        cfg_sc = amd.AMDConfig(use_filter=True, use_grey=True,
                               diffusion_model_type="spatial",
                               scan_layers=True, **TINY)
        scanned = amd.AMDModelNew(cfg=cfg_sc)
        video, ref = _data()
        p_sc = scanned.init({"params": KEY, "noise": KEY}, video, ref,
                            video, ref)
        # camera-only (sample_cross)
        zi, zt, zj = amd.sample_cross(scanned, p_sc, KEY, video, video, ref,
                                      video_grey_1=video, video_grey_2=video,
                                      ref_img_grey=ref, sample_step=2)
        assert zt.shape == video.shape
        # object-only (refimg-motion)
        motion = scanned.apply(p_sc, video, method="extract_motion")
        _, zt_o = amd.sample_with_refimg_motion(scanned, p_sc, KEY,
                                                ref[:, 0], motion,
                                                sample_step=2)
        # parity vs the unrolled layout
        unrolled = amd.AMDModelNew(cfg=amd.AMDConfig(
            use_filter=True, use_grey=True, diffusion_model_type="spatial",
            scan_layers=False, **TINY))
        p_un = {"params": unstack_scanned(p_sc["params"],
                                          cfg_sc.diffusion_num_layers)}
        _, zt_u = amd.sample_with_refimg_motion(unrolled, p_un, KEY,
                                                ref[:, 0], motion,
                                                sample_step=2)
        np.testing.assert_allclose(np.asarray(zt_o), np.asarray(zt_u),
                                   rtol=1e-4, atol=1e-4)

    def test_decode_tiles_single_ref_frame(self):
        cfg = amd.AMDConfig(use_filter=True, use_grey=True,
                            diffusion_model_type="spatial", **TINY)
        model = amd.AMDModelNew(cfg=cfg)
        video, ref = _data()
        params = model.init({"params": KEY, "noise": KEY}, video, ref,
                            video, ref)
        cam_t, obj_s, obj_t = model.apply(params, video, ref, video, ref,
                                          method="encode")
        motions = dict(camera_target=cam_t, object_source=obj_s,
                       object_target=obj_t)
        out = amd.decode(model, params, KEY, ref[:, :1], motions, frames=4,
                         sample_step=2)
        assert out.shape == video.shape
        with pytest.raises(ValueError, match="frames"):
            amd.decode(model, params, KEY, ref[:, :2], motions, frames=4,
                       sample_step=2)

    def test_use_mask_requires_filter(self):
        cfg = amd.AMDConfig(use_filter=False, use_grey=True, use_mask=True,
                            diffusion_model_type="spatial", **TINY)
        model = amd.AMDModelNew(cfg=cfg)
        video, ref = _data()
        mask = jnp.ones((2, 8, 4, 16, 16))
        with pytest.raises(ValueError, match="use_filter"):
            model.init({"params": KEY, "noise": KEY}, video, ref, video,
                       ref, camera_mask=mask)
