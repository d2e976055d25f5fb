"""End-to-end pipeline tests on tiny models + synthetic video files."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hivae_tpu.data import video as vio
from hivae_tpu.models import a2m as a2m_mod
from hivae_tpu.models import amd as amd_mod
from hivae_tpu.models import vae as vae_mod
from hivae_tpu.pipelines import (AMDCrossVideoPipeline,
                                 AMDReconstructionPipeline,
                                 ImageAudio2VideoPipeline)

KEY = jax.random.PRNGKey(0)
SIZE = 32   # pixel resolution
LAT = 4     # latent resolution (SIZE/8)
W = 4       # window frames


@pytest.fixture(scope="module")
def tiny_stack():
    vae = vae_mod.AutoencoderKL(cfg=vae_mod.VAEConfig(
        block_out_channels=(4, 8, 8, 8), layers_per_block=1,
        norm_num_groups=4))
    vae_params = vae.init(KEY, jnp.zeros((1, 3, SIZE, SIZE)))

    amd_cfg = amd_mod.AMDConfig(
        image_height=LAT, image_width=LAT, image_patch_size=1,
        video_frames=W, use_filter=True, use_grey=True,
        object_motion_token_num=2, object_motion_token_channel=16,
        object_enc_num_layers=1, enc_nhead=2, enc_ndim=8,
        camera_motion_token_num=W, camera_motion_token_channel=8,
        camera_enc_num_layers=1, motion_token_num=2, motion_token_channel=16,
        diffusion_model_type="spatial", diffusion_attn_head_dim=8,
        diffusion_attn_num_heads=2, diffusion_num_layers=1)
    amd = amd_mod.AMDModelNew(cfg=amd_cfg)
    v = jnp.zeros((1, W, 4, LAT, LAT))
    amd_params = amd.init({"params": KEY, "noise": KEY}, v, v, v, v)

    a2m_cfg = a2m_mod.A2MConfig(
        audio_inchannel=8, audio_block=3, motion_num_token=2,
        motion_in_channel=16, motion_frames=W, window_size=2,
        encoder_out_dim=16, intermediate_dim=16,
        diffusion_attn_head_dim=8, diffusion_attn_num_heads=2,
        diffusion_num_layers=1)
    a2m = a2m_mod.A2MModelCrossAttnAudio(cfg=a2m_cfg, variant="audio")
    motion = jnp.zeros((1, W, 2, 16))
    audio = jnp.zeros((1, W, 3, 8))
    a2m_params = a2m.init({"params": KEY, "noise": KEY}, motion, motion[:, 0],
                          audio=audio, ref_audio=audio[:, 0])
    return dict(vae=vae, vae_params=vae_params, amd=amd,
                amd_params=amd_params, a2m=a2m, a2m_params=a2m_params)


@pytest.fixture(scope="module")
def video_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "test.mp4")
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (W + 3, SIZE, SIZE, 3), dtype=np.uint8)
    vio.write_video(path, frames, fps=8)
    return path


class TestVideoIO:
    def test_roundtrip(self, video_file):
        total, fps = vio.video_metadata(video_file)
        assert total == W + 3
        frames = vio.read_video_frames(video_file, np.arange(3))
        assert frames.shape == (3, SIZE, SIZE, 3)

    def test_pixel_transform_range(self, video_file):
        frames = vio.read_video_frames(video_file, np.arange(2))
        x = vio.pixel_transform(frames, SIZE)
        assert x.shape == (2, 3, SIZE, SIZE)
        assert -1.001 <= x.min() and x.max() <= 1.001

    def test_resize_matches_torchvision_semantics(self):
        """Non-square input: shorter side scaled to size, then center crop."""
        frames = np.zeros((1, 48, 96, 3), dtype=np.uint8)
        x = vio.pixel_transform(frames, 32)
        assert x.shape == (1, 3, 32, 32)

    def test_fps_sampling(self):
        idx = vio.sample_frames_with_fps(100, 30.0, 5, 3.0, start_index=0)
        assert len(idx) == 5 and idx[0] == 0
        assert np.all(np.diff(idx) > 0)


@pytest.mark.slow
class TestReconstructionPipeline:
    def test_sample(self, tiny_stack, video_file, tmp_path):
        pipe = AMDReconstructionPipeline(
            tiny_stack["vae"], tiny_stack["vae_params"], tiny_stack["amd"],
            tiny_stack["amd_params"], window=W, use_grey=True,
            sample_size=SIZE)
        out_path = str(tmp_path / "recon.mp4")
        out = pipe.sample(video_file, out_path, video_sample_step=2)
        assert out.shape == (W + 1, 3, SIZE, SIZE)
        assert out.dtype == np.uint8
        assert os.path.exists(out_path)

    def test_params_committed_at_construction(self, tiny_stack):
        """Serving trees must be device-committed ONCE at construction:
        checkpoint restores yield host numpy, and a host tree passed as a
        jit argument re-uploads in full on every window/clip dispatch
        (28.9 s/window measured on a 131M AMD through the relay vs 0.08 s
        committed — see RESULTS.md round 4)."""
        host_amd = jax.tree.map(np.asarray, tiny_stack["amd_params"])
        host_vae = jax.tree.map(np.asarray, tiny_stack["vae_params"])
        pipe = AMDReconstructionPipeline(
            tiny_stack["vae"], host_vae, tiny_stack["amd"], host_amd,
            window=W, sample_size=SIZE)
        for tree in (pipe.amd_params, pipe.vae_params):
            leaf = jax.tree.leaves(tree)[0]
            # device-backed jax.Array (uncommitted default-device placement
            # is fine — the point is it is NOT host numpy re-uploaded per
            # dispatch)
            assert isinstance(leaf, jax.Array)

    def test_quant_int8(self, tiny_stack, video_file):
        """quant='int8' builds a table over the tiny DiT and serves through
        the fused program (a low threshold is monkeypatched in ops.quant
        tests; here the production pipeline path must at least fail loudly
        on a model too small to quantize)."""
        import hivae_tpu.pipelines.pipeline as pl
        with pytest.raises(Exception, match="no kernels"):
            AMDReconstructionPipeline(
                tiny_stack["vae"], tiny_stack["vae_params"],
                tiny_stack["amd"], tiny_stack["amd_params"], window=W,
                use_grey=True, sample_size=SIZE, quant="int8")
        with pytest.raises(ValueError, match="unknown quant"):
            pl._build_quant_table("fp4", tiny_stack["amd_params"])

    def test_quant_table_through_fused_program(self, tiny_stack, video_file):
        """A hand-built (low-threshold) table threads through _recon_clip
        and changes the math only by quantization noise."""
        from hivae_tpu.ops import quant as quant_ops
        table = quant_ops.quantize_params(
            tiny_stack["amd_params"],
            predicate=lambda p, k: quant_ops.default_predicate(p, k, 8))
        mk = lambda: AMDReconstructionPipeline(
            tiny_stack["vae"], tiny_stack["vae_params"], tiny_stack["amd"],
            tiny_stack["amd_params"], window=W, use_grey=True,
            sample_size=SIZE)
        base_pipe, q_pipe = mk(), mk()
        q_pipe.quant_table = table
        base = base_pipe.sample(video_file, video_sample_step=2)
        q = q_pipe.sample(video_file, video_sample_step=2)
        assert q.shape == base.shape and q.dtype == np.uint8
        assert not np.array_equal(q, base)
        # uint8 frames: quantization shifts pixels only slightly
        diff = np.abs(q.astype(np.int32) - base.astype(np.int32))
        assert float(np.mean(diff)) < 16.0, float(np.mean(diff))

    def test_quant_strips_served_trees(self, tiny_stack, video_file,
                                       monkeypatch):
        """quant='int8' drops the covered bf16 kernels from the serving
        trees at construction (the documented -454 MB), and the stripped
        pipeline still samples."""
        from hivae_tpu.ops import quant as quant_ops
        from hivae_tpu.ops.quant import default_predicate as real_pred
        monkeypatch.setattr(quant_ops, "default_predicate",
                            lambda p, k: real_pred(p, k, min_dim=8))
        pipe = AMDReconstructionPipeline(
            tiny_stack["vae"], tiny_stack["vae_params"], tiny_stack["amd"],
            tiny_stack["amd_params"], window=W, use_grey=True,
            sample_size=SIZE, quant="int8")
        n_full = len(jax.tree_util.tree_leaves(tiny_stack["amd_params"]))
        n_strip = len(jax.tree_util.tree_leaves(pipe.amd_params))
        n_biased = sum(1 for e in pipe.quant_table.values() if "bias" in e)
        assert n_strip == n_full - len(pipe.quant_table) - n_biased
        assert pipe.vae_quant_table and all(
            k.startswith("decoder") for k in pipe.vae_quant_table)
        out = pipe.sample(video_file, video_sample_step=2)
        assert out.shape == (W + 1, 3, SIZE, SIZE)

    def test_cross(self, tiny_stack, video_file):
        pipe = AMDCrossVideoPipeline(
            tiny_stack["vae"], tiny_stack["vae_params"], tiny_stack["amd"],
            tiny_stack["amd_params"], window=W, use_grey=True,
            sample_size=SIZE)
        out = pipe.sample_cross(video_file, video_file, video_sample_step=2)
        assert out.shape == (W + 1, 3, SIZE, SIZE)


@pytest.mark.slow
class TestLongReconstruction:
    """The windowed autoregressive long-video form (reference
    ``AMDPipeLine.sample``, pipeline.py:488-604)."""

    @pytest.fixture(scope="class")
    def long_video(self, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("lv") / "long.mp4")
        rng = np.random.RandomState(7)
        # 2 full windows + a 2-frame ragged tail (+1 refimg frame)
        frames = rng.randint(0, 255, (2 * W + 2 + 1, SIZE, SIZE, 3),
                             dtype=np.uint8)
        vio.write_video(path, frames, fps=8)
        return path

    def test_windows_and_tail(self, tiny_stack, long_video, tmp_path):
        pipe = AMDReconstructionPipeline(
            tiny_stack["vae"], tiny_stack["vae_params"], tiny_stack["amd"],
            tiny_stack["amd_params"], window=W, use_grey=True,
            sample_size=SIZE)
        out_path = str(tmp_path / "long_recon.mp4")
        out = pipe.sample_long(long_video, out_path, video_sample_step=2)
        # output length equals the input clip length (tail overlap
        # replaces, it does not append — see sample_long docstring)
        assert out.shape == (2 * W + 2 + 1, 3, SIZE, SIZE)
        assert out.dtype == np.uint8
        assert os.path.exists(out_path)

    def test_max_frames_cap(self, tiny_stack, long_video):
        pipe = AMDReconstructionPipeline(
            tiny_stack["vae"], tiny_stack["vae_params"], tiny_stack["amd"],
            tiny_stack["amd_params"], window=W, use_grey=True,
            sample_size=SIZE)
        out = pipe.sample_long(long_video, video_sample_step=2,
                               max_frames=W)
        assert out.shape[0] == W + 1

    def test_knobs_change_output(self, tiny_stack, long_video):
        pipe = AMDReconstructionPipeline(
            tiny_stack["vae"], tiny_stack["vae_params"], tiny_stack["amd"],
            tiny_stack["amd_params"], window=W, use_grey=True,
            sample_size=SIZE)
        base = pipe.sample_long(long_video, video_sample_step=2,
                                max_frames=W)
        masked = pipe.sample_long(long_video, video_sample_step=2,
                                  max_frames=W, mask_ratio=0.5)
        dropped = pipe.sample_long(long_video, video_sample_step=2,
                                   max_frames=W, drop_prev_img=True)
        assert not np.array_equal(masked, base)
        assert not np.array_equal(dropped, base)
        # ratio 0.0 is "off" (the reference default's effect)
        off = pipe.sample_long(long_video, video_sample_step=2,
                               max_frames=W, mask_ratio=0.0)
        assert np.array_equal(off, base)

    def test_too_short_raises(self, tiny_stack, tmp_path):
        path = str(tmp_path / "short.mp4")
        frames = np.zeros((W - 1, SIZE, SIZE, 3), dtype=np.uint8)
        vio.write_video(path, frames, fps=8)
        pipe = AMDReconstructionPipeline(
            tiny_stack["vae"], tiny_stack["vae_params"], tiny_stack["amd"],
            tiny_stack["amd_params"], window=W, sample_size=SIZE)
        with pytest.raises(ValueError, match="window"):
            pipe.sample_long(path, video_sample_step=2)


@pytest.mark.slow
class TestGTMotionAblation:
    def test_windowed_reconstruction(self, tiny_stack, tmp_path):
        from hivae_tpu.pipelines import GTMotionAblationPipeline

        # needs 2*W+1 frames
        path = str(tmp_path / "long.mp4")
        rng = np.random.RandomState(1)
        frames = rng.randint(0, 255, (2 * W + 3, SIZE, SIZE, 3),
                             dtype=np.uint8)
        vio.write_video(path, frames, fps=8)
        pipe = GTMotionAblationPipeline(
            tiny_stack["vae"], tiny_stack["vae_params"], tiny_stack["amd"],
            tiny_stack["amd_params"], window=W, sample_size=SIZE)
        out = pipe.reconstruct(path, num_windows=2, video_sample_step=2)
        assert out.shape == (2 * W + 1, 3, SIZE, SIZE)

    def test_mask_ratio_knob(self, tiny_stack, tmp_path):
        """The reference's motion-token masking ablation (AMDTestPipeLine,
        pipeline.py:266): a non-zero ratio must change the reconstruction."""
        from hivae_tpu.pipelines import GTMotionAblationPipeline

        path = str(tmp_path / "m.mp4")
        rng = np.random.RandomState(2)
        frames = rng.randint(0, 255, (W + 3, SIZE, SIZE, 3), dtype=np.uint8)
        vio.write_video(path, frames, fps=8)
        pipe = GTMotionAblationPipeline(
            tiny_stack["vae"], tiny_stack["vae_params"], tiny_stack["amd"],
            tiny_stack["amd_params"], window=W, sample_size=SIZE)
        base = pipe.reconstruct(path, num_windows=1, video_sample_step=2)
        masked = pipe.reconstruct(path, num_windows=1, video_sample_step=2,
                                  mask_ratio=0.5)
        assert masked.shape == base.shape
        assert not np.array_equal(masked, base)

    def test_extract_motion_mask_ratio(self, tiny_stack):
        """Masked extraction needs a 'mask' rng: the public helper must
        thread it (round-3 code-review: it used to crash in Flax) and must
        fail loudly when the key is missing."""
        from hivae_tpu.models import amd as amd_mod

        video = jnp.zeros((1, 2, 4, SIZE // 8, SIZE // 8))
        out = amd_mod.extract_motion(tiny_stack["amd"],
                                     tiny_stack["amd_params"], video,
                                     mask_ratio=0.5, key=KEY)
        base = amd_mod.extract_motion(tiny_stack["amd"],
                                      tiny_stack["amd_params"], video)
        assert out.shape == base.shape
        with pytest.raises(ValueError, match="needs key"):
            amd_mod.extract_motion(tiny_stack["amd"],
                                   tiny_stack["amd_params"], video,
                                   mask_ratio=0.5)


@pytest.mark.slow
class TestImageAudio2Video:
    def test_predict_windows_and_tail(self, tiny_stack):
        pipe = ImageAudio2VideoPipeline(
            tiny_stack["vae"], tiny_stack["vae_params"], tiny_stack["amd"],
            tiny_stack["amd_params"], tiny_stack["a2m"],
            tiny_stack["a2m_params"], window=W, a2m_ref_num_frame=2,
            sample_size=SIZE)
        ref_img = jnp.zeros((1, 1, 3, SIZE, SIZE))
        ref_audio = jnp.zeros((1, 1, 3, 8))
        audio = jax.random.normal(KEY, (1, 2 * W + 2, 3, 8))  # 2 windows + tail
        out = pipe.predict(ref_img, ref_audio, audio, motion_sample_step=2,
                           video_sample_step=2)
        assert out.shape == (1, 2 * W + 2 + 1, 4, LAT, LAT)

    def test_need_motion_extract_model(self, tiny_stack):
        """The legacy pipelines' knob (ref A2VPipeLine:72,140-147): chain
        windows on motion re-extracted from the generated video rather than
        the predicted motion tokens — must change windows past the first."""
        mk = lambda flag: ImageAudio2VideoPipeline(
            tiny_stack["vae"], tiny_stack["vae_params"], tiny_stack["amd"],
            tiny_stack["amd_params"], tiny_stack["a2m"],
            tiny_stack["a2m_params"], window=W, a2m_ref_num_frame=2,
            sample_size=SIZE, need_motion_extract_model=flag)
        ref_img = jnp.zeros((1, 1, 3, SIZE, SIZE))
        ref_audio = jnp.zeros((1, 1, 3, 8))
        audio = jax.random.normal(KEY, (1, 2 * W, 3, 8))
        base = mk(False).predict(ref_img, ref_audio, audio,
                                 motion_sample_step=2, video_sample_step=2)
        reex = mk(True).predict(ref_img, ref_audio, audio,
                                motion_sample_step=2, video_sample_step=2)
        assert base.shape == reex.shape == (1, 2 * W + 1, 4, LAT, LAT)
        # window 0 has no previous video: identical by construction
        np.testing.assert_allclose(np.asarray(base[:, :W + 1]),
                                   np.asarray(reex[:, :W + 1]), atol=1e-5)
        assert not np.array_equal(np.asarray(base[:, W + 1:]),
                                  np.asarray(reex[:, W + 1:]))

    @pytest.mark.slow
    def test_long_audio_generates_full_length(self, tiny_stack):
        """Round-1 regression: `sample` silently truncated audio to 256
        frames; the windowed autoregression must cover the full length."""
        pipe = ImageAudio2VideoPipeline(
            tiny_stack["vae"], tiny_stack["vae_params"], tiny_stack["amd"],
            tiny_stack["amd_params"], tiny_stack["a2m"],
            tiny_stack["a2m_params"], window=W, a2m_ref_num_frame=2,
            sample_size=SIZE)
        frames = 258  # > the old hard cap
        ref_img = jnp.zeros((1, 1, 3, SIZE, SIZE))
        ref_audio = jnp.zeros((1, 1, 3, 8))
        audio = jax.random.normal(KEY, (1, frames, 3, 8))
        out = pipe.predict(ref_img, ref_audio, audio, motion_sample_step=1,
                           video_sample_step=1)
        assert out.shape == (1, frames + 1, 4, LAT, LAT)


@pytest.mark.slow
class TestDiffMotionPipeline:
    def test_sample_diff(self, video_file, tmp_path):
        from hivae_tpu.pipelines import AMDDiffMotionPipeline

        vae = vae_mod.AutoencoderKL(cfg=vae_mod.VAEConfig(
            block_out_channels=(4, 8, 8, 8), layers_per_block=1,
            norm_num_groups=4))
        vae_params = vae.init(KEY, jnp.zeros((1, 3, SIZE, SIZE)))
        cfg = amd_mod.AMDConfig(
            image_height=LAT, image_width=LAT, image_patch_size=1,
            video_frames=W, use_filter=True, use_grey=True,
            use_motiontemporal=False, use_camera_down=True,
            object_motion_token_num=2, object_motion_token_channel=16,
            object_enc_num_layers=1, enc_nhead=2, enc_ndim=8,
            camera_motion_token_num=2, camera_motion_token_channel=16,
            camera_enc_num_layers=1, motion_token_num=2,
            motion_token_channel=16, diffusion_model_type="spatial",
            motion_type="decouple", diffusion_attn_head_dim=8,
            diffusion_attn_num_heads=2, diffusion_num_layers=1)
        model = amd_mod.AMDModel(cfg=cfg)
        v = jnp.zeros((1, W, 4, LAT, LAT))
        params = model.init({"params": KEY, "noise": KEY, "noise_kl": KEY},
                            v, v, v, v)

        pipe = AMDDiffMotionPipeline(vae, vae_params, model, params,
                                     window=W, use_grey=True,
                                     sample_size=SIZE)
        out = pipe.sample_diff(video_file, video_file,
                               str(tmp_path / "diff.mp4"),
                               video_sample_step=2)
        assert out.shape == (W + 1, 3, SIZE, SIZE) and out.dtype == np.uint8
        assert os.path.exists(tmp_path / "diff.mp4")


@pytest.mark.slow
class TestFusedEquivalence:
    def test_recon_clip_matches_staged(self, tiny_stack, video_file):
        """The fused one-program reconstruction must equal running the
        stages (encode / sample / decode+rgb) as separate programs."""
        from hivae_tpu.pipelines.pipeline import _recon_clip

        s = tiny_stack
        pipe = AMDReconstructionPipeline(s["vae"], s["vae_params"], s["amd"],
                                         s["amd_params"], window=W,
                                         use_grey=True, sample_size=SIZE)
        pixels, grey = pipe._load_clip(video_file, 8)
        px, gr = jnp.asarray(pixels), jnp.asarray(grey)
        key = jax.random.PRNGKey(3)

        fused = np.asarray(_recon_clip(
            s["vae"], s["amd"], s["vae_params"], s["amd_params"], px, gr,
            key, sample_step=2, use_grey=True))

        z = vae_mod.vae_encode_jit(s["vae"], s["vae_params"], px[None])[0]
        gz = vae_mod.vae_encode_jit(s["vae"], s["vae_params"], gr[None])[0]
        gt = z[1:][None]
        ref = jnp.broadcast_to(z[:1][None], gt.shape)
        _, video_pre, _ = amd_mod.sample_jit(
            s["amd"], s["amd_params"], key, gt, ref, sample_step=2,
            video_grey=gz[1:][None],
            ref_img_grey=jnp.broadcast_to(gz[:1][None], gt.shape))
        result = jnp.concatenate([z[:1][None], video_pre], axis=1)
        staged = np.asarray(vae_mod.vae_decode_rgb_jit(
            s["vae"], s["vae_params"], result)[0])

        assert fused.shape == staged.shape
        # uint8 quantization: allow off-by-one from fusion reassociation
        assert np.mean(np.abs(fused.astype(int) - staged.astype(int)) <= 1) \
            > 0.999


class TestHeunPipeline:
    def test_heun_solver_runs(self, tiny_stack, video_file):
        """The 2nd-order solver path produces a valid clip through the
        fused reconstruction program."""
        from hivae_tpu.pipelines import AMDReconstructionPipeline

        pipe = AMDReconstructionPipeline(
            tiny_stack["vae"], tiny_stack["vae_params"], tiny_stack["amd"],
            tiny_stack["amd_params"], window=W, use_grey=True,
            sample_size=SIZE)
        out = pipe.sample(video_file, video_sample_step=2, solver="heun")
        assert out.shape[0] == W + 1 and out.dtype == np.uint8
        assert np.isfinite(out.astype(np.float32)).all()
