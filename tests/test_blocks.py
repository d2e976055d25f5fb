"""Block library tests: torch golden parity for the attention core + shape
checks for every block variant."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from hivae_tpu.models import blocks as B

KEY = jax.random.PRNGKey(0)


def _np(x):
    return np.asarray(x)


class TestAttentionGolden:
    """Restate diffusers Attention (qk_norm='layer_norm', eps=1e-6) in torch
    and check our flax module gives identical output with shared weights."""

    @pytest.mark.parametrize("qk_norm", [True, False])
    @pytest.mark.parametrize("cross", [True, False])
    def test_parity(self, qk_norm, cross):
        dim, heads, head_dim, sq, sk, b = 32, 4, 8, 6, 5, 2
        rng = np.random.RandomState(0)
        x = rng.randn(b, sq, dim).astype(np.float32)
        ctx = rng.randn(b, sk, dim).astype(np.float32) if cross else x

        m = B.Attention(dim=dim, heads=heads, head_dim=head_dim, qk_norm=qk_norm)
        params = m.init(KEY, jnp.asarray(x), jnp.asarray(ctx))
        out = _np(m.apply(params, jnp.asarray(x), jnp.asarray(ctx)))

        p = params["params"]

        def lin(name, inp):
            w = torch.from_numpy(_np(p[name]["kernel"]))
            bias = torch.from_numpy(_np(p[name]["bias"]))
            return inp @ w + bias

        xt, ct = torch.from_numpy(x), torch.from_numpy(ctx)
        q = lin("to_q", xt).view(b, sq, heads, head_dim).transpose(1, 2)
        k = lin("to_k", ct).view(b, -1, heads, head_dim).transpose(1, 2)
        v = lin("to_v", ct).view(b, -1, heads, head_dim).transpose(1, 2)
        if qk_norm:
            gq = torch.from_numpy(_np(p["norm_q"]["scale"]))
            bq = torch.from_numpy(_np(p["norm_q"]["bias"]))
            gk = torch.from_numpy(_np(p["norm_k"]["scale"]))
            bk = torch.from_numpy(_np(p["norm_k"]["bias"]))
            q = F.layer_norm(q, (head_dim,), gq, bq, eps=1e-6)
            k = F.layer_norm(k, (head_dim,), gk, bk, eps=1e-6)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, sq, heads * head_dim)
        ref = lin("to_out", o).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestFeedForwardGolden:
    def test_gelu_tanh_parity(self):
        dim = 16
        rng = np.random.RandomState(1)
        x = rng.randn(2, 5, dim).astype(np.float32)
        m = B.FeedForward(dim=dim)
        params = m.init(KEY, jnp.asarray(x))
        out = _np(m.apply(params, jnp.asarray(x)))

        p = params["params"]
        xt = torch.from_numpy(x)
        h = xt @ torch.from_numpy(_np(p["net_0"]["kernel"])) + torch.from_numpy(
            _np(p["net_0"]["bias"]))
        h = F.gelu(h, approximate="tanh")
        ref = (h @ torch.from_numpy(_np(p["net_2"]["kernel"])) +
               torch.from_numpy(_np(p["net_2"]["bias"]))).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestPatchEmbedGolden:
    def test_conv_equivalence(self):
        """Our reshape+matmul patchify must equal a stride-p Conv2d."""
        p_sz, c, dim = 2, 4, 16
        rng = np.random.RandomState(2)
        x = rng.randn(2, c, 8, 8).astype(np.float32)
        m = B.PatchEmbed(patch_size=p_sz, embed_dim=dim)
        params = m.init(KEY, jnp.asarray(x))
        out = _np(m.apply(params, jnp.asarray(x)))

        kernel = _np(params["params"]["proj"]["kernel"])  # (c*p*p, dim)
        bias = _np(params["params"]["proj"]["bias"])
        # torch conv weight layout: (O, I, ph, pw)
        w = torch.from_numpy(kernel.T.reshape(dim, c, p_sz, p_sz))
        conv = F.conv2d(torch.from_numpy(x), w, torch.from_numpy(bias),
                        stride=p_sz)
        ref = conv.flatten(2).transpose(1, 2).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestBlockShapes:
    x = jnp.ones((2, 10, 64))
    enc = jnp.ones((2, 6, 64))
    temb = jnp.ones((2, 48))

    def test_joint_block(self):
        m = B.JointTransformerBlock(dim=64, heads=4, head_dim=16)
        p = m.init(KEY, self.x, self.enc, self.temb)
        h, e = m.apply(p, self.x, self.enc, self.temb)
        assert h.shape == (2, 10, 64) and e.shape == (2, 6, 64)

    def test_2condition_blocks(self):
        for cls in (B.JointBlock2Condition, B.JointBlock2ConditionSimple):
            m = cls(dim=64, heads=4, head_dim=16)
            p = m.init(KEY, self.x, self.enc, self.enc, self.temb)
            h, c1, c2 = m.apply(p, self.x, self.enc, self.enc, self.temb)
            assert h.shape == (2, 10, 64)
            assert c1.shape == c2.shape == (2, 6, 64)

    def test_motion_temporal_block(self):
        m = B.MotionTemporalBlock(dim=64, heads=4, head_dim=16, use_adaln=False)
        p = m.init(KEY, self.x)
        assert m.apply(p, self.x).shape == (2, 10, 64)
        m = B.MotionTemporalBlock(dim=64, heads=4, head_dim=16, use_adaln=True)
        p = m.init(KEY, self.x, self.temb)
        assert m.apply(p, self.x, self.temb).shape == (2, 10, 64)

    def test_any2motion_block(self):
        m = B.Any2MotionBlock(dim=64, heads=4, head_dim=16, motion_frames=5)
        xf = jnp.ones((10, 4, 64))  # (b*f, l, d) with b=2,f=5
        ref = jnp.ones((10, 3, 64))
        extra = jnp.ones((10, 7, 64))
        t = jnp.ones((10, 48))
        p = m.init(KEY, xf, ref, extra, t)
        assert m.apply(p, xf, ref, extra, t).shape == (10, 4, 64)

    def test_a2m_blocks(self):
        motion = jnp.ones((2, 12, 64))
        ref = jnp.ones((2, 4, 64))
        m = B.A2MMotionSelfAttnBlock(dim=64, heads=4, head_dim=16)
        p = m.init(KEY, motion, ref, self.temb)
        o1, o2 = m.apply(p, motion, ref, self.temb)
        assert o1.shape == (2, 12, 64) and o2.shape == (2, 4, 64)

        cond = jnp.ones((2, 4, 5, 64))  # (n, F+1, W, d)
        m = B.A2MCrossAttnBlock(dim=64, heads=4, head_dim=16)
        p = m.init(KEY, motion, ref, cond, self.temb)
        o1, o2 = m.apply(p, motion, ref, cond, self.temb)
        assert o1.shape == (2, 12, 64) and o2.shape == (2, 4, 64)

    def test_a2p_blocks(self):
        x = jnp.ones((2, 3, 4, 64))
        m = B.A2PTemporalSpatialBlock(dim=64, heads=4, head_dim=16)
        p = m.init(KEY, x)
        assert m.apply(p, x).shape == (2, 3, 4, 64)
        audio = jnp.ones((2, 3, 6, 64))
        m = B.A2PCrossAudioBlock(dim=64, heads=4, head_dim=16)
        p = m.init(KEY, x, audio)
        assert m.apply(p, x, audio).shape == (2, 3, 4, 64)

    def test_audio_mlps(self):
        audio = jnp.ones((2, 5, 10, 16))
        m = B.AudioFeatureMlp(outdim=64)
        p = m.init(KEY, audio)
        assert m.apply(p, audio).shape == (2, 5, 64)
        m = B.AudioToImageShapeMlp(outchannel=8, out_height=4, out_width=4)
        p = m.init(KEY, audio)
        assert m.apply(p, audio).shape == (2, 5, 8, 4, 4)
        m = B.AudioFeatureWindowMlp(intermediate_dim=32, window_size=3, outdim=24)
        p = m.init(KEY, audio)
        assert m.apply(p, audio).shape == (2, 5, 3, 24)

    def test_motion_transfer_and_refmotion_blocks(self):
        m = B.MotionTransferBlock(dim=64, heads=4, head_dim=16)
        p = m.init(KEY, self.x, self.enc, self.temb)
        h, e = m.apply(p, self.x, self.enc, self.temb)
        assert h.shape == (2, 10, 64) and e.shape == (2, 6, 64)
        m = B.RefMotionRefImageBlock(dim=64, heads=4, head_dim=16)
        p = m.init(KEY, self.x, self.enc, self.enc, self.temb)
        assert m.apply(p, self.x, self.enc, self.enc, self.temb).shape == (2, 10, 64)
