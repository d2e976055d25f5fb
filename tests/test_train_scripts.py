"""End-to-end smoke runs of the downstream trainer SCRIPTS (train_a2m,
train_mae) on tiny models: two real optimizer steps through each script's
``main()``, exercising the frozen-params-as-replicated-arguments step
signature the round-3 review added (previously these mains had zero test
coverage and shipped broken paths)."""

import dataclasses
import json
import os
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

SIZE, LAT, W = 32, 4, 4


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Two tiny clips with audio-embedding sidecars + a pkl index + a tiny
    AMD config json + an Orbax AMD checkpoint, as train_a2m expects."""
    from hivae_tpu.data import video as vio
    from hivae_tpu.models import amd as amd_mod

    d = tmp_path_factory.mktemp("trainsmoke")
    rng = np.random.RandomState(0)
    meta = []
    for i in range(2):
        vp = str(d / f"c{i}.mp4")
        frames = rng.randint(0, 255, (12, SIZE, SIZE, 3), dtype=np.uint8)
        vio.write_video(vp, frames, fps=8)
        ep = str(d / f"c{i}.npy")
        np.save(ep, rng.randn(12, 5, 8).astype(np.float32))
        meta.append({"name": f"c{i}", "video_path": vp,
                     "audio_emb_path": ep})
    index = str(d / "index.pkl")
    with open(index, "wb") as f:
        pickle.dump(meta, f)

    amd_cfg = amd_mod.AMDConfig(
        image_height=LAT, image_width=LAT, image_patch_size=1,
        video_frames=W, use_filter=True, use_grey=True,
        object_motion_token_num=2, object_motion_token_channel=16,
        object_enc_num_layers=1, enc_nhead=2, enc_ndim=8,
        camera_motion_token_num=W, camera_motion_token_channel=8,
        camera_enc_num_layers=1, motion_token_num=2, motion_token_channel=16,
        diffusion_model_type="spatial", diffusion_attn_head_dim=8,
        diffusion_attn_num_heads=2, diffusion_num_layers=1)
    amd_config_path = str(d / "amd_config.json")
    with open(amd_config_path, "w") as f:
        json.dump(dataclasses.asdict(amd_cfg), f)

    model = amd_mod.AMDModelNew(cfg=amd_cfg)
    v = jnp.zeros((1, W, 4, LAT, LAT))
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "noise": key}, v, v, v, v)
    import orbax.checkpoint as ocp
    ckpt_dir = str(d / "checkpoints" / "checkpoint-1")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_dir, {"params": params["params"]})
    ckptr.wait_until_finished()

    a2m_config_path = str(d / "a2m_config.json")
    with open(a2m_config_path, "w") as f:
        json.dump({"model_type": "A2MModel_CrossAtten_Audio",
                   "model": dict(
                       audio_inchannel=8, audio_block=5, motion_num_token=2,
                       motion_in_channel=16, motion_frames=W, window_size=2,
                       encoder_out_dim=16, intermediate_dim=16,
                       diffusion_attn_head_dim=8, diffusion_attn_num_heads=2,
                       diffusion_num_layers=1)}, f)
    return dict(dir=str(d), index=index, amd_config=amd_config_path,
                amd_ckpt=str(d / "checkpoints"), a2m_config=a2m_config_path)


def _run_main(module, argv, monkeypatch):
    # single-device mesh: the conftest's 8 virtual devices would demand
    # batch % 8 == 0 and 8x the CPU compile/step cost for a smoke
    from hivae_tpu import parallel as par
    monkeypatch.setattr(par, "create_mesh",
                        lambda *a, **kw: par.local_mesh())
    monkeypatch.setattr(sys, "argv", argv)
    module.main()


def test_train_a2m_two_steps(assets, tmp_path, monkeypatch):
    import train_a2m

    out = str(tmp_path / "a2m_out")
    _run_main(train_a2m, [
        "train_a2m.py", "--a2m_config", assets["a2m_config"],
        "--amd_config", assets["amd_config"],
        "--amd_ckpt", assets["amd_ckpt"],
        "--video_dir", assets["index"], "--output_dir", out,
        "--exp_name", "s", "--train_batch_size", "1",
        "--max_train_steps", "2", "--video_frames", str(W),
        "--sample_size", str(SIZE), "--mp", "no",
        "--save_checkpoint_interval_step", "100",
        "--dataloader_num_workers", "1",
    ], monkeypatch)
    from hivae_tpu.training.checkpoint import find_latest_checkpoint
    assert find_latest_checkpoint(os.path.join(out, "s", "checkpoints"))


def test_train_mae_two_steps(tmp_path, monkeypatch, assets):
    import train_mae
    from hivae_tpu.models import mae as mae_mod

    monkeypatch.setitem(
        mae_mod.MAE_MODELS, "MAE_TINY",
        lambda dtype=jnp.float32, **kw: mae_mod.MaskedAutoencoderViT(
            img_size=(LAT, LAT), patch_size=1, in_chans=4, embed_dim=16, depth=1,
            num_heads=2, decoder_embed_dim=16, decoder_depth=1,
            decoder_num_heads=2, dtype=dtype, **kw))
    out = str(tmp_path / "mae_out")
    _run_main(train_mae, [
        "train_mae.py", "--video_dir", assets["dir"], "--output_dir", out,
        "--exp_name", "s", "--model_type", "MAE_TINY",
        "--train_batch_size", "1", "--max_train_steps", "2",
        "--sample_size", str(SIZE), "--mp", "no",
        "--save_checkpoint_interval_step", "100",
        "--lr_warmup_steps", "0",
    ], monkeypatch)
    from hivae_tpu.training.checkpoint import find_latest_checkpoint
    assert find_latest_checkpoint(os.path.join(out, "s", "checkpoints"))


def test_train_t2m_two_steps(assets, tmp_path, monkeypatch):
    """Two steps of the label->motion trainer on a class-labeled tree
    (UCF-101 layout) against the tiny frozen AMD."""
    import train_t2m
    from hivae_tpu.data import video as vio

    rng = np.random.RandomState(1)
    tree = tmp_path / "labeled"
    for cls in ("clsA", "clsB"):
        cdir = tree / cls
        cdir.mkdir(parents=True)
        frames = rng.randint(0, 255, (10, SIZE, SIZE, 3), dtype=np.uint8)
        vio.write_video(str(cdir / "v.mp4"), frames, fps=8)

    t2m_cfg = str(tmp_path / "t2m.json")
    with open(t2m_cfg, "w") as f:
        json.dump(dict(label_dim=16, num_classes=2, motion_dim=16,
                       refimg_width=LAT, refimg_height=LAT,
                       refimg_patch_size=1, refimg_dim=4,
                       time_embed_dim=32, attention_head_dim=8,
                       num_attention_heads=2, num_layers=1,
                       camera_token_num=4, camera_channel=8,
                       object_token_num=2, object_channel=16), f)

    out = str(tmp_path / "t2m_out")
    _run_main(train_t2m, [
        "train_t2m.py", "--t2m_config", t2m_cfg,
        "--amd_config", assets["amd_config"],
        "--amd_ckpt", assets["amd_ckpt"],
        "--video_dir", str(tree), "--output_dir", out,
        "--exp_name", "s", "--train_batch_size", "1",
        "--max_train_steps", "2", "--video_frames", str(W),
        "--sample_size", str(SIZE), "--mp", "no",
        "--save_checkpoint_interval_step", "100",
    ], monkeypatch)
    from hivae_tpu.training.checkpoint import find_latest_checkpoint
    assert find_latest_checkpoint(os.path.join(out, "s", "checkpoints"))
