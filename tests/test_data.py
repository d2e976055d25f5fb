"""Dataset + loader + flow-mask + checkpoint tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hivae_tpu.data import video as vio
from hivae_tpu.data.datasets import (DataLoader, RandomPairDataset,
                                     VideoAudioDataset, VideoClipDataset,
                                     list_videos)
from hivae_tpu.data.flow_mask import flow_mask
from hivae_tpu.training import checkpoint as ckpt


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    rng = np.random.RandomState(0)
    for i in range(3):
        frames = rng.randint(0, 255, (12, 48, 48, 3), dtype=np.uint8)
        vio.write_video(str(d / f"clip{i}.mp4"), frames, fps=8)
    return str(d)


class TestDatasets:
    def test_clip_dataset(self, video_dir):
        ds = VideoClipDataset(video_dir, sample_n_frames=4, sample_size=32,
                              use_grey=True)
        assert len(ds) == 3
        s = ds[0]
        assert s["videos"].shape == (4, 3, 32, 32)
        assert s["ref_img"].shape == (4, 3, 32, 32)
        assert s["grey_videos"].shape == (4, 3, 32, 32)
        # grayscale has identical channels
        np.testing.assert_allclose(s["grey_videos"][:, 0],
                                   s["grey_videos"][:, 1])
        # reference frame is repeated
        np.testing.assert_allclose(s["ref_img"][0], s["ref_img"][3])

    def test_camera_mask_geometry(self, video_dir):
        # the mask must follow the model's latent geometry, not a
        # hard-coded 32x32x4 (code-review round-3 finding)
        ds = VideoClipDataset(video_dir, sample_n_frames=4, sample_size=32,
                              use_mask=True, mask_latent_size=(16, 8),
                              mask_latent_channels=8)
        s = ds[0]
        assert s["camera_mask"].shape == (8, 8, 16, 8)
        assert set(np.unique(s["camera_mask"])) <= {0.0, 1.0}
        # default stays the 4x32x32 latent layout over 2T frames
        ds = VideoClipDataset(video_dir, sample_n_frames=4, sample_size=32,
                              use_mask=True)
        assert ds[0]["camera_mask"].shape == (8, 4, 32, 32)

    def test_error_retry(self, video_dir):
        meta = list_videos(video_dir)
        meta.insert(0, {"name": "bad", "video_path": "/nonexistent.mp4"})
        ds = VideoClipDataset(meta, sample_n_frames=4, sample_size=32)
        s = ds[0]  # falls back to a random good sample
        assert s["videos"].shape == (4, 3, 32, 32)

    def test_random_pair(self, video_dir):
        ds = RandomPairDataset(video_dir, sample_n_frames=4, sample_size=32)
        s = ds[0]
        assert s["videos"].shape == s["ref_img"].shape == (4, 3, 32, 32)

    def test_video_audio(self, video_dir, tmp_path):
        audio = np.random.randn(12, 5, 8).astype(np.float32)
        emb = str(tmp_path / "emb.npy")
        np.save(emb, audio)
        meta = [{"name": "clip0",
                 "video_path": os.path.join(video_dir, "clip0.mp4"),
                 "audio_emb_path": emb}]
        ds = VideoAudioDataset(meta, sample_n_frames=4, sample_size=32)
        s = ds[0]
        assert s["gt_video"].shape == (4, 3, 32, 32)
        assert s["gt_audio"].shape == (4, 5, 8)
        assert s["ref_audio"].shape == (5, 8)
        assert s["mask"].shape == (4,)

    def test_video_audio_random_ref(self, video_dir, tmp_path):
        """A2MVideoAudioPoseRandomRef (reference dataset.py:1063-1259):
        reference frame drawn from outside the sampled clip."""
        from hivae_tpu.data.datasets import VideoAudioRandomRefDataset

        audio = np.random.randn(12, 5, 8).astype(np.float32)
        emb = str(tmp_path / "emb_rr.npy")
        np.save(emb, audio)
        meta = [{"name": "clip0",
                 "video_path": os.path.join(video_dir, "clip0.mp4"),
                 "audio_emb_path": emb}]
        ds = VideoAudioRandomRefDataset(meta, sample_n_frames=4,
                                        sample_size=32)
        s = ds[0]
        assert s["gt_video"].shape == (4, 3, 32, 32)
        assert s["gt_audio"].shape == (4, 5, 8)
        assert s["mask"].sum() == 4
        # the ref index must fall outside the clip: over several draws the
        # ref audio row should differ from the clip's leading row sometimes
        idx, _ = ds._sample_indices(12)
        ref, clip = idx[0], idx[1:]
        assert ref < clip[0] or ref > clip[-1]

    def test_random_ref_falls_back_when_clip_covers_video(self, video_dir,
                                                          tmp_path):
        from hivae_tpu.data.datasets import VideoAudioRandomRefDataset

        audio = np.random.randn(12, 5, 8).astype(np.float32)
        emb = str(tmp_path / "emb_rr2.npy")
        np.save(emb, audio)
        meta = [{"name": "clip0",
                 "video_path": os.path.join(video_dir, "clip0.mp4"),
                 "audio_emb_path": emb}]
        ds = VideoAudioRandomRefDataset(meta, sample_n_frames=12,
                                        sample_size=32)
        idx, _ = ds._sample_indices(12)
        assert idx[0] == idx[1]  # no outside frame -> clip start (ref :1144)

    def test_loader(self, video_dir):
        ds = VideoClipDataset(video_dir, sample_n_frames=2, sample_size=32)
        dl = DataLoader(ds, batch_size=2, num_workers=2, drop_last=True)
        batches = list(dl)
        assert len(batches) == 1
        assert batches[0]["videos"].shape == (2, 2, 3, 32, 32)
        assert isinstance(batches[0]["name"], list)

    def test_loader_sharding(self, video_dir):
        """Shards are padded to EQUAL length by wrap-around (torch
        DistributedSampler semantics): unequal per-host batch counts would
        deadlock cross-host collectives when one host runs a step the
        others never enter."""
        ds = VideoClipDataset(video_dir, sample_n_frames=2, sample_size=32)
        d0 = DataLoader(ds, batch_size=1, shuffle=False, shard_id=0,
                        num_shards=2)
        d1 = DataLoader(ds, batch_size=1, shuffle=False, shard_id=1,
                        num_shards=2)
        assert len(d0) == len(d1) == 2  # 3 items -> padded to 4

    def test_loader_sharding_more_shards_than_items(self, video_dir):
        """Dataset smaller than the shard count: one wrap-around doubling
        is not enough — the pad must repeat the index list until every
        shard has the same (non-zero) length."""
        ds = VideoClipDataset(video_dir, sample_n_frames=2, sample_size=32)
        n = len(ds)  # 3 in this fixture
        shards = [DataLoader(ds, batch_size=1, shuffle=False, shard_id=i,
                             num_shards=2 * n + 1)._indices()
                  for i in range(2 * n + 1)]
        assert all(len(s) == 1 for s in shards)
        assert all(0 <= s[0] < n for s in shards)

    def test_loader_worker_error_propagates(self, video_dir):
        """A worker exception must surface in the consumer, not hang the
        epoch forever on results.get()."""

        class Broken(VideoClipDataset):
            def __getitem__(self, i):
                raise OSError("decode exploded")

            def _get(self, i):  # bypass any retry wrapper
                raise OSError("decode exploded")

        ds = Broken(video_dir, sample_n_frames=2, sample_size=32)
        loader = DataLoader(ds, batch_size=1, shuffle=False, num_workers=2)
        with pytest.raises(RuntimeError, match="worker failed"):
            next(iter(loader))


class TestVideoGrid:
    def test_save_videos_grid(self, tmp_path):
        videos = np.random.randint(0, 255, (3, 2, 3, 16, 16), dtype=np.uint8)
        path = str(tmp_path / "grid.mp4")
        vio.save_videos_grid(path, videos, n_cols=2)
        total, _ = vio.video_metadata(path)
        assert total == 2
        frames = vio.read_video_frames(path, np.array([0]))
        assert frames.shape == (1, 32, 32, 3)  # 2 rows x 2 cols of 16px


class TestFlowMask:
    def test_shapes_and_values(self):
        rng = np.random.RandomState(0)
        f1 = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
        f2 = np.roll(f1, 5, axis=1)
        cam, obj = flow_mask(f1, f2)
        assert cam.shape == obj.shape == (32, 32)
        assert set(np.unique(cam)).issubset({0.0, 1.0})


class TestCheckpoint:
    def test_save_restore_rotate(self, tmp_path):
        mgr = ckpt.CheckpointManager(str(tmp_path), max_to_keep=2)
        state = {"w": jnp.arange(4.0), "step": jnp.zeros(())}
        for step in [10, 20, 30]:
            s = jax.tree.map(lambda x: x + step, state)
            mgr.save(step, s)
        names = sorted(os.listdir(tmp_path))
        assert "checkpoint-10" not in names
        assert {"checkpoint-20", "checkpoint-30"} <= set(names)
        assert mgr.latest_step() == 30
        restored = mgr.restore(state)
        np.testing.assert_allclose(np.asarray(restored["w"]),
                                   np.arange(4.0) + 30)

    def test_find_latest(self, tmp_path):
        for s in [5, 100, 50]:
            os.makedirs(tmp_path / f"checkpoint-{s}")
        assert ckpt.find_latest_checkpoint(str(tmp_path)).endswith(
            "checkpoint-100")
        assert ckpt.checkpoint_step("foo/checkpoint-123") == 123

    def test_config_roundtrip(self, tmp_path):
        cfg = {"a": 1, "b": [1, 2], "c": "x"}
        ckpt.save_config(cfg, str(tmp_path))
        assert ckpt.load_config(str(tmp_path)) == cfg
