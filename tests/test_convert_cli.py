"""Smoke test of the convert_checkpoint.py CLI (round-1 bug: init_on_cpu
was called with a stray key argument -> TypeError on every invocation)."""

import json
import os
import sys


import pytest

pytestmark = pytest.mark.slow


class TestConvertCheckpointCLI:
    def test_amd_kind_end_to_end(self, tmp_path, monkeypatch):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, repo)
        import torch
        from safetensors.torch import save_file

        import convert_checkpoint

        cfg = dict(image_height=8, image_width=8, image_patch_size=1,
                   video_frames=2, use_filter=True, use_grey=True,
                   object_motion_token_num=2, object_motion_token_channel=8,
                   object_enc_num_layers=1, enc_nhead=2, enc_ndim=4,
                   camera_motion_token_num=2, camera_motion_token_channel=8,
                   camera_enc_num_layers=1, motion_token_num=2,
                   motion_token_channel=8, diffusion_model_type="spatial",
                   diffusion_attn_head_dim=4, diffusion_attn_num_heads=2,
                   diffusion_num_layers=1)
        cfg_path = tmp_path / "config.json"
        cfg_path.write_text(json.dumps(cfg))
        src = tmp_path / "model.safetensors"
        # a tiny (unmatched) torch state: the converter must run through,
        # report it unused, and still write an orbax checkpoint
        save_file({"some.unrelated.weight": torch.zeros(2, 2)}, str(src))
        dst = tmp_path / "converted"

        monkeypatch.setattr(sys, "argv", [
            "convert_checkpoint.py", "--kind", "amd_new",
            "--config", str(cfg_path), "--src", str(src),
            "--dst", str(dst)])
        convert_checkpoint.main()
        assert dst.exists()
