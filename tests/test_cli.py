"""In-process smoke test of the train_amd.py CLI wiring."""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    from hivae_tpu.data import video as vio

    d = tmp_path_factory.mktemp("cli_videos")
    rng = np.random.RandomState(0)
    for i in range(8):
        frames = rng.randint(0, 255, (9, 32, 32, 3), dtype=np.uint8)
        vio.write_video(str(d / f"c{i}.mp4"), frames, fps=8)
    return str(d)


class TestTrainAMDCLI:
    def test_two_steps(self, video_dir, tmp_path, monkeypatch):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, repo)
        import train_amd

        argv = [
            "train_amd.py",
            "--video_dir", video_dir,
            "--output_dir", str(tmp_path),
            "--exp_name", "smoke",
            "--model_type", "AMD_N",
            "--diffusion_model_type", "spatial",
            "--mp", "no",
            "--video_frames", "4",
            "--image_height", "4", "--image_width", "4",
            "--image_patch_size", "1",
            "--sample_size", "32",
            "--train_batch_size", "8",  # divisible by the 8-device data axis
            "--max_train_steps", "2",
            "--save_checkpoint_interval_step", "100",
            "--object_motion_token_num", "2",
            "--object_motion_token_channel", "16",
            "--object_enc_num_layers", "1",
            "--camera_enc_num_layers", "1",
            "--enc_nhead", "2", "--enc_ndim", "8",
            "--camera_motion_token_num", "4",
            "--camera_motion_token_channel", "8",
            "--motion_token_num", "2", "--motion_token_channel", "16",
            "--diffusion_num_layers", "1",
            "--diffusion_attn_num_heads", "2",
            "--diffusion_attn_head_dim", "8",
            "--dataloader_num_workers", "2",
        ]
        monkeypatch.setattr(sys, "argv", argv)
        train_amd.main()
        out = tmp_path / "smoke"
        assert (out / "config.json").exists()
        assert (out / "checkpoints").exists()


class TestBuildIndexCLI:
    def test_builds_train_eval_pkls(self, video_dir, tmp_path, monkeypatch):
        import pickle

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, repo)
        import build_index

        # sidecar audio embeddings for half the clips
        emb_dir = tmp_path / "embs"
        emb_dir.mkdir()
        for i in range(4):
            np.save(str(emb_dir / f"c{i}.npy"),
                    np.zeros((9, 5, 8), np.float32))
        out = tmp_path / "train.pkl"
        ev = tmp_path / "eval.pkl"
        monkeypatch.setattr(sys, "argv", [
            "build_index.py", "--video_dir", video_dir,
            "--audio_emb_dir", str(emb_dir), "--output", str(out),
            "--eval_output", str(ev), "--eval_num", "1",
            "--min_frames", "9"])
        build_index.main()
        train = pickle.load(open(out, "rb"))
        evl = pickle.load(open(ev, "rb"))
        # 4 have embeddings, 4 skipped; 1 held out for eval
        assert len(train) == 3 and len(evl) == 1
        assert all("audio_emb_path" in e for e in train + evl)
        # and the entries are loadable by the dataset index reader
        from hivae_tpu.data.datasets import list_videos
        entries = list_videos(str(out))
        assert len(entries) == 3


class TestDiffMotionFilterCLI:
    def test_two_sample_mode(self, video_dir, tmp_path, monkeypatch):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, repo)
        import diff_motion_filter

        vids = sorted(os.listdir(video_dir))
        argv = ["diff_motion_filter.py",
                "--video_path", os.path.join(video_dir, vids[0]),
                "--video_path_2", os.path.join(video_dir, vids[1]),
                "--s_window_sizes", "16",
                "--direction_thresholds", "0.5",
                "--output_dir", str(tmp_path)]
        monkeypatch.setattr(sys, "argv", argv)
        diff_motion_filter.main()
        outs = os.listdir(tmp_path)
        assert any("camera_two_sample" in o for o in outs)
        assert any(o.endswith("_camera.png") for o in outs)


class TestGetClipEmbCLI:
    def test_fallback_encoder_writes_npy(self, tmp_path, monkeypatch):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, repo)
        import get_clip_emb

        txt = tmp_path / "captions.txt"
        txt.write_text("a red ball\na moving square\n")
        out = tmp_path / "embs"
        argv = ["get_clip_emb.py", "--captions", str(txt),
                "--output_dir", str(out)]
        monkeypatch.setattr(sys, "argv", argv)
        get_clip_emb.main()
        files = sorted(os.listdir(out))
        assert len(files) == 2
        e = np.load(out / files[0])
        assert e.ndim == 1 and np.isfinite(e).all()


class TestA2VInferenceCLI:
    def test_generates_video_with_audio(self, tmp_path, monkeypatch):
        """a2v_inference.py end-to-end: tiny AMD + A2M checkpoints, ref
        image + whisper-style embedding + driving wav -> video file whose
        container carries the audio stream."""
        import wave

        import cv2
        import jax
        import jax.numpy as jnp
        import orbax.checkpoint as ocp

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, repo)
        from hivae_tpu.models import a2m as a2m_mod
        from hivae_tpu.models import amd as amd_mod

        KEY = jax.random.PRNGKey(0)
        W, LAT, SIZE = 4, 4, 32
        amd_cfg = amd_mod.AMDConfig(
            image_height=LAT, image_width=LAT, image_patch_size=1,
            video_frames=W, use_filter=True, use_grey=True,
            object_motion_token_num=2, object_motion_token_channel=16,
            object_enc_num_layers=1, enc_nhead=2, enc_ndim=8,
            camera_motion_token_num=W, camera_motion_token_channel=8,
            camera_enc_num_layers=1, motion_token_num=2,
            motion_token_channel=16, diffusion_model_type="spatial",
            diffusion_attn_head_dim=8, diffusion_attn_num_heads=2,
            diffusion_num_layers=1)
        amd = amd_mod.AMDModelNew(cfg=amd_cfg)
        v = jnp.zeros((1, W, 4, LAT, LAT))
        amd_params = amd.init({"params": KEY, "noise": KEY}, v, v, v, v)

        a2m_spec = {"model_type": "A2MModel_CrossAtten_Audio",
                    "model": dict(audio_inchannel=8, audio_block=3,
                                  motion_num_token=2, motion_in_channel=16,
                                  motion_frames=W, window_size=2,
                                  encoder_out_dim=16, intermediate_dim=16,
                                  diffusion_attn_head_dim=8,
                                  diffusion_attn_num_heads=2,
                                  diffusion_num_layers=1)}
        a2m_cfg = a2m_mod.A2MConfig.from_dict(a2m_spec["model"])
        a2m = a2m_mod.A2MModelCrossAttnAudio(cfg=a2m_cfg, variant="audio")
        motion = jnp.zeros((1, W, 2, 16))
        audio = jnp.zeros((1, W, 3, 8))
        a2m_params = a2m.init({"params": KEY, "noise": KEY}, motion,
                              motion[:, 0], audio=audio,
                              ref_audio=audio[:, 0])

        import json as _json

        import numpy as _np

        amd_dir = tmp_path / "amd"
        (amd_dir / "checkpoints").mkdir(parents=True)
        (amd_dir / "config.json").write_text(_json.dumps(amd_cfg.to_dict()))
        ocp.StandardCheckpointer().save(
            str(amd_dir / "checkpoints" / "checkpoint-1"),
            {"params": jax.device_get(amd_params)})
        a2m_dir = tmp_path / "a2m"
        (a2m_dir / "checkpoints").mkdir(parents=True)
        (a2m_dir / "spec.json").write_text(_json.dumps(a2m_spec))
        ocp.StandardCheckpointer().save(
            str(a2m_dir / "checkpoints" / "checkpoint-1"),
            {"params": jax.device_get(a2m_params)})

        rng = _np.random.RandomState(0)
        img_path = str(tmp_path / "ref.png")
        cv2.imwrite(img_path, rng.randint(0, 255, (SIZE, SIZE, 3),
                                          dtype=_np.uint8))
        emb_path = str(tmp_path / "emb.npy")
        _np.save(emb_path, rng.randn(2 * W + 1, 3, 8).astype(_np.float32))
        wav_path = str(tmp_path / "drv.wav")
        pcm = (_np.sin(_np.arange(32000) / 10) * 20000).astype("<i2")
        with wave.open(wav_path, "wb") as wv:
            wv.setnchannels(1)
            wv.setsampwidth(2)
            wv.setframerate(16000)
            wv.writeframes(pcm.tobytes())

        out_path = str(tmp_path / "out" / "gen.mp4")
        import a2v_inference

        argv = ["a2v_inference.py",
                "--amd_config", str(amd_dir / "config.json"),
                "--amd_ckpt", str(amd_dir / "checkpoints"),
                "--a2m_config", str(a2m_dir / "spec.json"),
                "--a2m_ckpt", str(a2m_dir / "checkpoints"),
                "--ref_image", img_path,
                "--audio_emb", emb_path,
                "--audio_wav", wav_path,
                "--output", out_path,
                "--window", str(W), "--a2m_ref_num_frame", "2",
                "--sample_size", str(SIZE), "--video_frames", str(W),
                "--motion_sample_step", "2", "--video_sample_step", "2",
                "--fps", "8"]
        monkeypatch.setattr(sys, "argv", argv)
        a2v_inference.main()

        # no ffmpeg in the image -> AVI fallback with a real audio stream
        written = out_path[:-4] + ".avi"
        assert os.path.exists(written)
        data = open(written, "rb").read()
        assert b"auds" in data and b"01wb" in data
        cap = cv2.VideoCapture(written)
        n = 0
        while cap.read()[0]:
            n += 1
        cap.release()
        assert n == 2 * W + 1  # ref frame + generated frames
