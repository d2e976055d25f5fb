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
