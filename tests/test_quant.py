"""Int8 w8a8 serving-path tests (``hivae_tpu/ops/quant.py``): kernel
accuracy, table construction, interceptor wiring through the samplers,
stripped-tree serving, and the scanned->unrolled param conversion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hivae_tpu.models import amd as amd_mod
from hivae_tpu.ops import quant

KEY = jax.random.PRNGKey(0)
LAT = 4
W = 4


def tiny_pred(path, kernel):
    """The default predicate at a test-sized threshold."""
    return quant.default_predicate(path, kernel, min_dim=8)


@pytest.fixture(scope="module")
def tiny_amd():
    cfg = amd_mod.AMDConfig(
        image_height=LAT, image_width=LAT, image_patch_size=1,
        video_frames=W, use_filter=True, use_grey=True,
        object_motion_token_num=2, object_motion_token_channel=16,
        object_enc_num_layers=1, enc_nhead=2, enc_ndim=8,
        camera_motion_token_num=W, camera_motion_token_channel=8,
        camera_enc_num_layers=1, motion_token_num=2, motion_token_channel=16,
        diffusion_model_type="spatial", diffusion_attn_head_dim=8,
        diffusion_attn_num_heads=2, diffusion_num_layers=2)
    model = amd_mod.AMDModelNew(cfg=cfg)
    v = jnp.zeros((1, W, 4, LAT, LAT))
    params = model.init({"params": KEY, "noise": KEY}, v, v, v, v)
    return model, params


class TestQuantDense:
    def test_accuracy(self):
        k1, k2 = jax.random.split(KEY)
        x = jax.random.normal(k1, (64, 128))
        w = jax.random.normal(k2, (128, 96)) / np.sqrt(128)
        b = jnp.ones((96,)) * 0.1
        w8, scale = quant._quantize_kernel(w)
        y = quant.quant_dense(x, w8, scale, b)
        ref = x @ w + b
        rel = (jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
        assert float(rel) < 0.02, float(rel)

    def test_batched_input(self):
        x = jax.random.normal(KEY, (2, 3, 5, 32))
        w = jax.random.normal(KEY, (32, 16))
        w8, scale = quant._quantize_kernel(w)
        y = quant.quant_dense(x, w8, scale)
        assert y.shape == (2, 3, 5, 16)
        ref = x @ w
        assert float(jnp.max(jnp.abs(y - ref))) < 0.1 * float(
            jnp.max(jnp.abs(ref)))

    def test_preserves_dtype(self):
        x = jax.random.normal(KEY, (4, 32), jnp.bfloat16)
        w = jax.random.normal(KEY, (32, 8))
        w8, scale = quant._quantize_kernel(w)
        assert quant.quant_dense(x, w8, scale).dtype == jnp.bfloat16


class TestQuantizeParams:
    def test_scopes_to_dit_and_skips_modulation(self, tiny_amd):
        _, params = tiny_amd
        table = quant.quantize_params(params, predicate=tiny_pred)
        assert table, "no layers quantized"
        for path in table:
            parts = path.split("/")
            assert parts[0] == "diffusion_transformer", path
            assert parts[-1] not in ("linear", "linear_1", "linear_2"), path
        # attention + FFN projections are covered
        names = {p.split("/")[-1] for p in table}
        assert {"to_q", "to_k", "to_v", "to_out"} <= names
        assert {"net_0", "net_2"} <= names
        # entries carry int8 weights, fp32 scales and the bias
        e = next(iter(table.values()))
        assert e["w8"].dtype == jnp.int8
        assert e["scale"].dtype == jnp.float32
        assert e["scale"].shape == (e["w8"].shape[1],)

    def test_default_threshold_skips_small(self, tiny_amd):
        """At the production threshold (512) the 16-wide tiny model has
        nothing to quantize -> loud error, not a silent no-op table."""
        _, params = tiny_amd
        with pytest.raises(ValueError, match="no kernels"):
            quant.quantize_params(params)

    def test_jittable(self, tiny_amd):
        _, params = tiny_amd
        table = jax.jit(
            lambda p: quant.quantize_params(p, predicate=tiny_pred))(params)
        assert all(e["w8"].dtype == jnp.int8 for e in table.values())


class TestQuantizedSampling:
    def test_sample_close_to_fp(self, tiny_amd):
        model, params = tiny_amd
        table = quant.quantize_params(params, predicate=tiny_pred)
        v = jax.random.normal(KEY, (1, W, 4, LAT, LAT))
        ref = jnp.broadcast_to(v[:, :1], v.shape)
        common = dict(video_grey=v, ref_img_grey=ref, sample_step=2)
        _, fp, _ = amd_mod.sample_jit(model, params, KEY, v, ref, **common)
        _, q, _ = amd_mod.sample_jit(model, params, KEY, v, ref,
                                     quant_table=table, **common)
        assert q.shape == fp.shape
        assert bool(jnp.all(jnp.isfinite(q)))
        # interception actually changed the math ...
        assert not np.array_equal(np.asarray(q), np.asarray(fp))
        # ... but only by quantization noise
        rel = float(jnp.linalg.norm(q - fp) / jnp.linalg.norm(fp))
        assert rel < 0.15, rel

    def test_stripped_tree_serves_identically(self, tiny_amd):
        model, params = tiny_amd
        table = quant.quantize_params(params, predicate=tiny_pred)
        stripped = quant.strip_quantized(params, table)
        n_full = len(jax.tree_util.tree_leaves(params))
        n_strip = len(jax.tree_util.tree_leaves(stripped))
        # kernels AND the biases the table carries copies of are dropped
        n_biased = sum(1 for e in table.values() if "bias" in e)
        assert n_strip == n_full - len(table) - n_biased
        v = jax.random.normal(KEY, (1, W, 4, LAT, LAT))
        ref = jnp.broadcast_to(v[:, :1], v.shape)
        common = dict(video_grey=v, ref_img_grey=ref, sample_step=2,
                      quant_table=table)
        _, q_full, _ = amd_mod.sample_jit(model, params, KEY, v, ref, **common)
        _, q_strip, _ = amd_mod.sample_jit(model, stripped, KEY, v, ref,
                                           **common)
        np.testing.assert_array_equal(np.asarray(q_full), np.asarray(q_strip))


class TestUnstackScanned:
    def test_velocity_parity(self, tiny_amd):
        model, _ = tiny_amd
        cfg_sc = amd_mod.AMDConfig(
            **{**{f.name: getattr(model.cfg, f.name)
                  for f in model.cfg.__dataclass_fields__.values()},
               "scan_layers": True})
        scanned = amd_mod.AMDModelNew(cfg=cfg_sc)
        v = jnp.zeros((1, W, 4, LAT, LAT))
        p_sc = scanned.init({"params": KEY, "noise": KEY}, v, v, v, v)
        p_un = {"params": quant.unstack_scanned(
            p_sc["params"], cfg_sc.diffusion_num_layers)}

        img = jax.random.normal(KEY, (W, 8, LAT, LAT))
        tstep = jnp.full((W,), 500, jnp.int32)
        cam = jax.random.normal(KEY, (1, W, LAT * LAT, 8))
        obj = jax.random.normal(KEY, (W, 2, 16))
        kw = dict(camera_target=cam, object_source=obj, object_target=obj)
        out_sc = scanned.apply(p_sc, img, tstep, method="velocity", **kw)
        out_un = model.apply(p_un, img, tstep, method="velocity", **kw)
        np.testing.assert_allclose(np.asarray(out_sc), np.asarray(out_un),
                                   atol=1e-5)

    def test_unstacked_quantizes(self, tiny_amd):
        model, _ = tiny_amd
        cfg_sc = amd_mod.AMDConfig(
            **{**{f.name: getattr(model.cfg, f.name)
                  for f in model.cfg.__dataclass_fields__.values()},
               "scan_layers": True})
        scanned = amd_mod.AMDModelNew(cfg=cfg_sc)
        v = jnp.zeros((1, W, 4, LAT, LAT))
        p_sc = scanned.init({"params": KEY, "noise": KEY}, v, v, v, v)
        p_un = {"params": quant.unstack_scanned(
            p_sc["params"], cfg_sc.diffusion_num_layers)}
        table = quant.quantize_params(p_un, predicate=tiny_pred)
        layers = {p.split("/")[1] for p in table}
        assert any(k.startswith("object_blocks_") for k in layers)
        assert any(k.startswith("camera_blocks_") for k in layers)
        assert any(k.startswith("spatial_blocks_") for k in layers)


class TestQuantConv:
    """Int8 conv path (the VAE decode serving leg)."""

    def test_accuracy_vs_lax(self):
        k1, k2 = jax.random.split(KEY)
        x = jax.random.normal(k1, (2, 8, 8, 16))
        w = jax.random.normal(k2, (3, 3, 16, 24)) / np.sqrt(9 * 16)
        b = jnp.full((24,), 0.05)
        w8, scale = quant._quantize_kernel(w)
        assert scale.shape == (24,)
        y = quant.quant_conv(x, w8, scale, b, strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
        assert rel < 0.03, rel

    def test_predicate_covers_vae_decoder_only_where_safe(self):
        """Production threshold: big 3x3 convs quantize; the sensitive
        boundary convs (4-ch latent in, 3-ch image out, 1x1 quant convs)
        do not."""
        p = quant.default_predicate
        big = jnp.zeros((3, 3, 512, 512))
        assert p(("decoder", "mid_block", "resnets_0", "conv1"), big)
        assert p(("decoder", "up_blocks_3", "resnets_0", "conv1"),
                 jnp.zeros((3, 3, 128, 128)))
        assert not p(("decoder", "conv_in"), jnp.zeros((3, 3, 4, 512)))
        assert not p(("decoder", "conv_out"), jnp.zeros((3, 3, 128, 3)))
        assert not p(("post_quant_conv",), jnp.zeros((1, 1, 4, 4)))
        # 1x1 shortcut with 512 inputs clears the bar (it is MXU work)
        assert p(("decoder", "up_blocks_1", "resnets_0", "conv_shortcut"),
                 jnp.zeros((1, 1, 512, 256)))

    def test_vae_decode_int8_close_to_fp(self):
        """Tiny AutoencoderKL: the interceptor swaps the decoder's convs +
        mid-block attention for int8 kernels; output stays within
        quantization noise of the fp path (GroupNorm renormalizes between
        convs, so per-layer error does not compound)."""
        from hivae_tpu.models import vae as vae_mod

        cfg = vae_mod.VAEConfig(block_out_channels=(16, 32),
                                norm_num_groups=4)
        model = vae_mod.AutoencoderKL(cfg=cfg)
        x = jax.random.normal(KEY, (2, 3, 32, 32))
        params = model.init(KEY, x[:1])
        table = quant.quantize_params(
            params, predicate=lambda p, k: quant.default_predicate(
                p, k, min_dim=32), scope=None)
        conv_paths = [p for p, e in table.items() if e["w8"].ndim == 4]
        assert conv_paths, "no convs quantized"
        z = jax.random.normal(KEY, (2, 1, cfg.latent_channels, 4, 4))
        fp = vae_mod.vae_decode(model, params, z)
        q = vae_mod.vae_decode(model, params, z, quant_table=table)
        assert not np.array_equal(np.asarray(q), np.asarray(fp))
        rel = float(jnp.linalg.norm(q - fp) / jnp.linalg.norm(fp))
        assert rel < 0.1, rel
        # stripping the covered kernels serves identically
        stripped = quant.strip_quantized(params, table)
        q2 = vae_mod.vae_decode(model, stripped, z, quant_table=table)
        np.testing.assert_array_equal(np.asarray(q), np.asarray(q2))

    def test_strided_downsample_conv(self):
        """Flax geometry canonicalization: stride-2 VALID conv (the VAE
        encoder's Downsample2D) routes through the int8 path exactly."""
        import flax.linen as nn
        from hivae_tpu.models.conv_blocks import Downsample2D

        m = Downsample2D(24)
        x = jax.random.normal(KEY, (1, 8, 8, 16))
        params = m.init(KEY, x)
        table = quant.quantize_params(
            params, predicate=lambda p, k: k.ndim == 4, scope=None)
        fp = m.apply(params, x)
        with quant.quantized_calls(table):
            q = m.apply(params, x)
        assert q.shape == fp.shape
        rel = float(jnp.linalg.norm(q - fp) / jnp.linalg.norm(fp))
        assert 0 < rel < 0.05, rel

    def test_unsupported_geometry_is_loud(self):
        import flax.linen as nn

        class G(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Conv(16, (3, 3), feature_group_count=2,
                               padding=1, name="gconv")(x)

        m = G()
        x = jax.random.normal(KEY, (1, 8, 8, 16))
        params = m.init(KEY, x)
        table = quant.quantize_params(
            params, predicate=lambda p, k: True, scope=None)
        with pytest.raises(NotImplementedError, match="geometry"):
            with quant.quantized_calls(table):
                m.apply(params, x)


class TestFusedQuantFFN:
    """Pallas fused FFN-up + gelu + requantize epilogue
    (``ops/pallas/quant_ffn.py``) vs the unfused per-Dense int8 chain."""

    DIM, INNER = 128, 512  # lane-aligned (the kernel's supports() gate)

    def _entries(self, key, use_bias=True):
        k1, k2, k3 = jax.random.split(key, 3)
        w_up = jax.random.normal(k1, (self.DIM, self.INNER)) / np.sqrt(
            self.DIM)
        w_dn = jax.random.normal(k2, (self.INNER, self.DIM)) / np.sqrt(
            self.INNER)
        up8, sup = quant._quantize_kernel(w_up)
        dn8, sdn = quant._quantize_kernel(w_dn)
        up = {"w8": up8, "scale": sup}
        down = {"w8": dn8, "scale": sdn}
        if use_bias:
            up["bias"] = jax.random.normal(k3, (self.INNER,)) * 0.1
            down["bias"] = jnp.full((self.DIM,), 0.05)
        return (w_up, w_dn), (up, down)

    def _unfused(self, x, up, down):
        h = quant.quant_dense(x, up["w8"], up["scale"], up.get("bias"),
                              out_dtype=jnp.float32)
        h = jax.nn.gelu(h, approximate=True)
        return quant.quant_dense(h, down["w8"], down["scale"],
                                 down.get("bias"), out_dtype=x.dtype)

    @pytest.mark.parametrize("rows", [64, 70])  # 70: exercises M padding
    def test_matches_unfused_chain(self, rows):
        (w_up, w_dn), (up, down) = self._entries(KEY)
        x = jax.random.normal(jax.random.PRNGKey(9), (rows, self.DIM))
        fused = quant.fused_quant_ffn(x, up, down)
        unfused = self._unfused(x, up, down)
        fp = jax.nn.gelu(x @ w_up + up["bias"], approximate=True) @ w_dn \
            + down["bias"]
        # both are the same grid; fused keeps gelu fp32 in VMEM (strictly
        # tighter), so compare each against the fp reference
        for y in (fused, unfused):
            rel = float(jnp.linalg.norm(y - fp) / jnp.linalg.norm(fp))
            assert rel < 0.03, rel
        rel = float(jnp.linalg.norm(fused - unfused)
                    / jnp.linalg.norm(unfused))
        assert rel < 0.01, rel

    def test_no_bias_and_batched_lead_dims(self):
        _, (up, down) = self._entries(KEY, use_bias=False)
        x = jax.random.normal(KEY, (2, 3, 32, self.DIM), jnp.bfloat16)
        y = quant.fused_quant_ffn(x, up, down)
        assert y.shape == x.shape and y.dtype == jnp.bfloat16
        ref = self._unfused(x.reshape(-1, self.DIM), up, down)
        rel = float(jnp.linalg.norm(
            y.reshape(-1, self.DIM).astype(jnp.float32)
            - ref.astype(jnp.float32)) / jnp.linalg.norm(
                ref.astype(jnp.float32)))
        assert rel < 0.02, rel

    def test_supports_gate(self):
        from hivae_tpu.ops.pallas import quant_ffn as qf

        assert qf.supports(4096, 1024, 4096)   # the flagship FFN-up
        assert not qf.supports(64, 96, 512)    # K not lane-aligned
        assert not qf.supports(64, 128, 200)   # N not lane-aligned

    def test_interceptor_routes_ffn(self, monkeypatch):
        """quantized_calls must ROUTE an aligned FeedForward through the
        fused path (instrumented callee, the ADVICE-r4 dispatch pattern),
        and fuse_ffn=False must keep the per-Dense chain."""
        from hivae_tpu.models.blocks import FeedForward

        m = FeedForward(self.DIM, inner_dim=self.INNER)
        x = jax.random.normal(KEY, (4, 8, self.DIM))
        params = m.init(KEY, x)
        table = quant.quantize_params(
            params, predicate=lambda p, k: True, scope=None)
        assert set(table) == {"net_0", "net_2"}
        fp = m.apply(params, x)

        called = []
        orig = quant.fused_quant_ffn
        monkeypatch.setattr(
            quant, "fused_quant_ffn",
            lambda *a, **kw: called.append(True) or orig(*a, **kw))
        with quant.quantized_calls(table):
            fused = m.apply(params, x)
        assert called, "aligned FFN did not dispatch to the fused path"
        called.clear()
        with quant.quantized_calls(table, fuse_ffn=False):
            unfused = m.apply(params, x)
        assert not called
        rel = float(jnp.linalg.norm(fused - fp) / jnp.linalg.norm(fp))
        assert rel < 0.03, rel
        rel = float(jnp.linalg.norm(fused - unfused)
                    / jnp.linalg.norm(unfused))
        assert 0 <= rel < 0.01, rel

    def test_interceptor_skips_unaligned_ffn(self, monkeypatch):
        """dim=96 (not lane-aligned): the FFN must fall through to the
        per-Dense int8 path, never the Pallas kernel."""
        from hivae_tpu.models.blocks import FeedForward

        m = FeedForward(96, inner_dim=384)
        x = jax.random.normal(KEY, (4, 96))
        params = m.init(KEY, x)
        table = quant.quantize_params(
            params, predicate=lambda p, k: True, scope=None)
        monkeypatch.setattr(
            quant, "fused_quant_ffn",
            lambda *a, **kw: (_ for _ in ()).throw(
                AssertionError("unaligned FFN routed to the fused kernel")))
        fp = m.apply(params, x)
        with quant.quantized_calls(table):
            q = m.apply(params, x)
        rel = float(jnp.linalg.norm(q - fp) / jnp.linalg.norm(fp))
        assert 0 < rel < 0.05, rel


class TestA2MQuant:
    def test_a2m_sample_close_to_fp(self):
        """The A2M motion sampler's Euler loop quantizes via quant_table=
        (the a2m leg of the A2V serving path)."""
        from hivae_tpu.models import a2m as a2m_mod

        frames, l, d = 3, 2, 8
        cfg = a2m_mod.A2MConfig(
            audio_inchannel=6, audio_block=4, motion_num_token=l,
            motion_in_channel=d, motion_frames=frames, intermediate_dim=12,
            window_size=4, encoder_out_dim=16, diffusion_attn_head_dim=8,
            diffusion_attn_num_heads=2, diffusion_num_layers=2)
        model = a2m_mod.A2MModelCrossAttnAudio(cfg=cfg, variant="audio")
        ref_motion = jax.random.normal(KEY, (1, l, d))
        audio = jax.random.normal(KEY, (1, frames, 4, 6))
        ref_audio = jax.random.normal(KEY, (1, 4, 6))
        params = model.init(
            {"params": KEY, "noise": KEY},
            jax.random.normal(KEY, (1, frames, l, d)), ref_motion,
            audio=audio, ref_audio=ref_audio)
        table = quant.quantize_params(params, predicate=tiny_pred,
                                      scope=None)
        common = dict(frames=frames, sample_step=2, audio=audio,
                      ref_audio=ref_audio)
        fp = a2m_mod.sample(model, params, KEY, ref_motion, **common)
        q = a2m_mod.sample(model, params, KEY, ref_motion,
                           quant_table=table, **common)
        assert q.shape == fp.shape
        assert not np.array_equal(np.asarray(q), np.asarray(fp))
        rel = float(jnp.linalg.norm(q - fp) / jnp.linalg.norm(fp))
        assert rel < 0.2, rel


class TestScanStackedRefusal:
    def test_quantize_params_refuses_stacked_tree(self, tiny_amd):
        """A scan_layers tree must fail LOUDLY (a table built around the
        3-D stacked kernels would silently serve the transformer in bf16
        while claiming int8)."""
        model, _ = tiny_amd
        cfg_sc = amd_mod.AMDConfig(
            **{**{f.name: getattr(model.cfg, f.name)
                  for f in model.cfg.__dataclass_fields__.values()},
               "scan_layers": True})
        scanned = amd_mod.AMDModelNew(cfg=cfg_sc)
        v = jnp.zeros((1, W, 4, LAT, LAT))
        p_sc = scanned.init({"params": KEY, "noise": KEY}, v, v, v, v)
        with pytest.raises(ValueError, match="scan"):
            quant.quantize_params(p_sc, predicate=tiny_pred)
