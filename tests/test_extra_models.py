"""MAE / CNN AE / t2m / AMDModelRec shape+loss tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hivae_tpu.models import amd, mae, model_ae, t2m

KEY = jax.random.PRNGKey(0)


@pytest.mark.slow
class TestMAE:
    def test_forward_and_reconstruct(self):
        m = mae.MaskedAutoencoderViT(img_size=(8, 8), patch_size=2,
                                     embed_dim=32, depth=2, num_heads=2,
                                     decoder_embed_dim=16, decoder_depth=1,
                                     decoder_num_heads=2)
        x = jax.random.normal(KEY, (2, 4, 8, 8))
        p = m.init({"params": KEY, "mask": KEY}, x)
        loss, pred, mask = m.apply(p, x, 0.75, rngs={"mask": KEY})
        assert np.isfinite(float(loss))
        assert pred.shape == (2, 16, 16)
        assert float(mask.sum()) == 2 * 12  # 75% of 16 patches
        rec = m.apply(p, x, method="reconstruct", rngs={"mask": KEY})
        assert rec.shape == x.shape

    def test_patchify_roundtrip(self):
        m = mae.MaskedAutoencoderViT(img_size=(8, 8), patch_size=2)
        x = jax.random.normal(KEY, (2, 4, 8, 8))
        np.testing.assert_allclose(
            np.asarray(m.unpatchify(m.patchify(x))), np.asarray(x), rtol=1e-6)


@pytest.mark.slow
class TestCNNMotionAE:
    def test_forward(self):
        m = model_ae.CNNMotionAE(block_out_channels_down=(8, 16, 16, 16))
        v = jax.random.normal(KEY, (1, 3, 4, 16, 16))
        p = m.init(KEY, v)
        pred = m.apply(p, v)
        assert pred.shape == v.shape
        loss = m.apply(p, pred, v, method="loss")
        assert np.isfinite(float(loss))


@pytest.mark.slow
class TestT2M:
    def test_forward_and_sample(self):
        cfg = t2m.T2MConfig(label_dim=16, num_classes=5, motion_dim=32,
                            refimg_height=8, refimg_width=8, refimg_dim=4,
                            num_frames=2, time_embed_dim=32,
                            attention_head_dim=8, num_attention_heads=4,
                            num_layers=2, camera_token_num=3,
                            object_token_num=4, camera_channel=8,
                            object_channel=32)
        m = t2m.Label2MotionDiffusionDecoder(cfg=cfg)
        n, tt = 2, 2
        cam = jax.random.normal(KEY, (n, tt, 3, 8))
        obj = jax.random.normal(KEY, (n * tt, 4, 32))
        label = jnp.array([0, 3])
        ref = jax.random.normal(KEY, (n, tt, 4, 8, 8))
        ts = jnp.array([100.0, 900.0])
        p = m.init({"params": KEY, "noise": KEY}, cam, obj, label, ref, ts)
        out = m.apply(p, cam, obj, label, ref, ts, rngs={"noise": KEY})
        assert out["vel_pred_object"].shape == (n * tt, 4, 32)
        assert out["vel_pred_camera"].shape[-1] == 8
        loss = m.apply(p, out, method="loss")
        assert np.isfinite(float(loss))
        z = t2m.sample(m, p, KEY, label, ref, cam, sample_steps=2)
        assert z.shape == (n * tt, 4, 32)


@pytest.mark.slow
class TestAMDModelRec:
    def test_forward(self):
        cfg = amd.AMDConfig(image_height=16, image_width=16, video_frames=4,
                            object_motion_token_num=4,
                            object_enc_num_layers=1, enc_nhead=2, enc_ndim=16,
                            motion_token_num=4, motion_token_channel=32,
                            diffusion_attn_head_dim=16,
                            diffusion_attn_num_heads=4,
                            diffusion_num_layers=2)
        for split in (False, True):
            m = amd.AMDModelRec(cfg=cfg, is_split=split)
            v = jax.random.normal(KEY, (2, 4, 4, 16, 16))
            p = m.init(KEY, v, v)
            pre, ld = m.apply(p, v, v)
            assert pre.shape == (8, 4, 16, 16)
            assert np.isfinite(float(ld["loss"]))


class TestTextConditioning:
    """Free-text t2m path (reference text2motion/modules.py:272-297): pooled
    CLIP embeddings condition the decoder in place of label ids."""

    def _cfg(self):
        return t2m.T2MConfig(label_dim=16, num_classes=5, motion_dim=32,
                             refimg_height=8, refimg_width=8, refimg_dim=4,
                             num_frames=2, time_embed_dim=32,
                             attention_head_dim=8, num_attention_heads=4,
                             num_layers=2, camera_token_num=3,
                             object_token_num=4, camera_channel=8,
                             object_channel=32)

    def test_fallback_encoder_deterministic(self):
        from hivae_tpu.data.text import TextEncoder

        enc = TextEncoder(width=16)
        seq1, pool1 = enc(["a person waves", "a dog runs"])
        seq2, pool2 = enc(["a person waves", "a dog runs"])
        assert seq1.shape == (2, 77, 16) and pool1.shape == (2, 16)
        np.testing.assert_array_equal(pool1, pool2)
        assert np.abs(pool1[0] - pool1[1]).max() > 1e-6

    def test_free_text_embeddings_condition_the_decoder(self):
        from hivae_tpu.data.text import TextEncoder

        cfg = self._cfg()
        m = t2m.Label2MotionDiffusionDecoder(cfg=cfg)
        n, tt = 2, 2
        cam = jax.random.normal(KEY, (n, tt, 3, 8))
        obj = jax.random.normal(KEY, (n * tt, 4, 32))
        ref = jax.random.normal(KEY, (n, tt, 4, 8, 8))
        ts = jnp.array([100.0, 900.0])
        _, pooled = TextEncoder(width=cfg.label_dim)(
            ["a person waves", "a dog runs"])
        text_emb = jnp.asarray(pooled)
        p = m.init({"params": KEY, "noise": KEY}, cam, obj, text_emb, ref, ts)
        out = m.apply(p, cam, obj, text_emb, ref, ts, rngs={"noise": KEY})
        assert out["vel_pred_object"].shape == (n * tt, 4, 32)
        # a different caption must change the prediction
        _, pooled2 = TextEncoder(width=cfg.label_dim)(
            ["a cat sleeps", "a dog runs"])
        out2 = m.apply(p, cam, obj, jnp.asarray(pooled2), ref, ts,
                       rngs={"noise": KEY})
        assert float(jnp.abs(out["vel_pred_object"] -
                             out2["vel_pred_object"]).max()) > 1e-6

    def test_clip_cli(self, tmp_path, monkeypatch):
        import os
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, repo)
        import get_clip_emb

        caps = tmp_path / "caps.txt"
        caps.write_text("vid1\ta person waves\nvid2\ta dog runs\n")
        out = tmp_path / "embs"
        monkeypatch.setattr(sys, "argv", [
            "get_clip_emb.py", "--captions", str(caps),
            "--output_dir", str(out), "--width", "16"])
        get_clip_emb.main()
        from hivae_tpu.data.text import load_text_embedding

        z = load_text_embedding(str(out / "vid1.npy"))
        assert z.shape == (16,)
