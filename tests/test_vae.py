"""VAE tests: torch golden parity for the conv blocks, full-model shape
round-trips, and torch-checkpoint conversion (name map + layouts)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from hivae_tpu.models import conv_blocks as CB
from hivae_tpu.models import vae as vae_mod
from hivae_tpu.utils import torch_convert as tc

KEY = jax.random.PRNGKey(0)


def _np(x):
    return np.asarray(x)


def _t(x):
    return torch.from_numpy(np.asarray(x))


class TestConvBlockGolden:
    def test_resnet_block_matches_torch(self):
        """Golden vs the diffusers ResnetBlock2D formula restated in torch."""
        rng = np.random.RandomState(0)
        x = rng.randn(2, 8, 8, 8).astype(np.float32)  # NHWC, C=8
        m = CB.ResnetBlock2D(out_channels=16, groups=4)
        params = m.init(KEY, jnp.asarray(x))["params"]
        out = _np(CB.ResnetBlock2D(out_channels=16, groups=4).apply(
            {"params": params}, jnp.asarray(x)))

        xt = _t(x).permute(0, 3, 1, 2)  # NCHW

        def gn(t, p, groups):
            return F.group_norm(t, groups, _t(p["scale"]), _t(p["bias"]),
                                eps=1e-6)

        def conv(t, p, stride=1, padding=1):
            w = _t(p["kernel"]).permute(3, 2, 0, 1)
            return F.conv2d(t, w, _t(p["bias"]), stride=stride,
                            padding=padding)

        h = F.silu(gn(xt, params["norm1"], 4))
        h = conv(h, params["conv1"])
        h = F.silu(gn(h, params["norm2"], 4))
        h = conv(h, params["conv2"])
        sc = conv(xt, params["conv_shortcut"], padding=0)
        ref = (sc + h).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_downsample_asymmetric_pad(self):
        rng = np.random.RandomState(1)
        x = rng.randn(1, 9, 9, 4).astype(np.float32)
        m = CB.Downsample2D(out_channels=4)
        params = m.init(KEY, jnp.asarray(x))["params"]
        out = _np(m.apply({"params": params}, jnp.asarray(x)))

        xt = _t(x).permute(0, 3, 1, 2)
        xt = F.pad(xt, (0, 1, 0, 1))
        w = _t(params["conv"]["kernel"]).permute(3, 2, 0, 1)
        ref = F.conv2d(xt, w, _t(params["conv"]["bias"]), stride=2)
        np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_upsample_nearest(self):
        rng = np.random.RandomState(2)
        x = rng.randn(1, 4, 4, 4).astype(np.float32)
        m = CB.Upsample2D(out_channels=4)
        params = m.init(KEY, jnp.asarray(x))["params"]
        out = _np(m.apply({"params": params}, jnp.asarray(x)))
        xt = F.interpolate(_t(x).permute(0, 3, 1, 2), scale_factor=2,
                           mode="nearest")
        w = _t(params["conv"]["kernel"]).permute(3, 2, 0, 1)
        ref = F.conv2d(xt, w, _t(params["conv"]["bias"]), padding=1)
        np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-4, atol=1e-5)


TINY_CFG = vae_mod.VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                             norm_num_groups=4)


@pytest.mark.slow
class TestAutoencoderKL:
    def test_roundtrip_shapes(self):
        model = vae_mod.AutoencoderKL(cfg=TINY_CFG)
        x = jax.random.normal(KEY, (2, 3, 32, 32))
        params = model.init(KEY, x)
        rec, dist = model.apply(params, x)
        assert rec.shape == x.shape
        assert dist.mean.shape == (2, 4, 16, 16)

        video = jax.random.normal(KEY, (1, 3, 3, 32, 32))
        z = vae_mod.vae_encode(model, params, video)
        assert z.shape == (1, 3, 4, 16, 16)
        out = vae_mod.vae_decode(model, params, z)
        assert out.shape == video.shape

    def test_key_names_match_diffusers(self):
        """The generated torch keys for the full-size VAE must be exactly the
        diffusers AutoencoderKL (sd-vae-ft-mse) state-dict keys."""
        model = vae_mod.AutoencoderKL()  # full config
        x = jax.ShapeDtypeStruct((1, 3, 64, 64), jnp.float32)
        shapes = jax.eval_shape(lambda v: model.init(KEY, v), x)
        flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
        gen = set()
        for kp, _ in flat:
            path = tuple(p.key for p in kp)
            gen.add(tc.flax_path_to_torch_key(path[1:]))

        expected = set()
        blocks = [128, 256, 512, 512]

        def resnet(prefix, has_shortcut):
            for mod in ["norm1", "conv1", "norm2", "conv2"]:
                expected.add(f"{prefix}.{mod}.weight")
                expected.add(f"{prefix}.{mod}.bias")
            if has_shortcut:
                expected.add(f"{prefix}.conv_shortcut.weight")
                expected.add(f"{prefix}.conv_shortcut.bias")

        def mid(prefix):
            resnet(f"{prefix}.resnets.0", False)
            resnet(f"{prefix}.resnets.1", False)
            for mod in ["group_norm", "to_q", "to_k", "to_v", "to_out.0"]:
                expected.add(f"{prefix}.attentions.0.{mod}.weight")
                expected.add(f"{prefix}.attentions.0.{mod}.bias")

        for side in ["encoder", "decoder"]:
            for mod in ["conv_in", "conv_out", "conv_norm_out"]:
                expected.add(f"{side}.{mod}.weight")
                expected.add(f"{side}.{mod}.bias")
            mid(f"{side}.mid_block")
        for i in range(4):
            ch_changes = i > 0 and blocks[i] != blocks[i - 1]
            for j in range(2):
                resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                       ch_changes and j == 0)
            if i < 3:
                expected.add(f"encoder.down_blocks.{i}.downsamplers.0.conv.weight")
                expected.add(f"encoder.down_blocks.{i}.downsamplers.0.conv.bias")
        rev = blocks[::-1]
        for i in range(4):
            for j in range(3):
                ch_changes = i > 0 and rev[i] != rev[i - 1]
                resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                       ch_changes and j == 0)
            if i < 3:
                expected.add(f"decoder.up_blocks.{i}.upsamplers.0.conv.weight")
                expected.add(f"decoder.up_blocks.{i}.upsamplers.0.conv.bias")
        for mod in ["quant_conv", "post_quant_conv"]:
            expected.add(f"{mod}.weight")
            expected.add(f"{mod}.bias")

        assert gen == expected, (
            f"only-ours: {sorted(gen - expected)[:8]}, "
            f"only-diffusers: {sorted(expected - gen)[:8]}")

    def test_checkpoint_conversion_roundtrip(self):
        """Export tiny-VAE params to a torch-layout state dict, convert back,
        and check the model output is unchanged."""
        model = vae_mod.AutoencoderKL(cfg=TINY_CFG)
        x = jax.random.normal(KEY, (1, 3, 32, 32))
        params = model.init(KEY, x)

        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        torch_state = {}
        for kp, val in flat:
            path = tuple(p.key for p in kp)
            tkey = tc.flax_path_to_torch_key(path[1:])
            v = _np(val)
            if path[-1] == "kernel":
                if v.ndim == 2:
                    v = v.T
                elif v.ndim == 4:
                    v = np.transpose(v, (3, 2, 0, 1))
            torch_state[tkey] = v

        zeros = jax.tree.map(jnp.zeros_like, params)
        restored, report = tc.convert_torch_state(zeros, torch_state)
        assert not report["missing"] and not report["unused"]
        out0, _ = model.apply(params, x)
        out1, _ = model.apply(restored, x)
        np.testing.assert_allclose(_np(out0), _np(out1), rtol=1e-5, atol=1e-6)
