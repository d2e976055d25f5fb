"""Every example config in configs/ must build its model.

The configs mirror the reference's published variants (see
configs/README.md); this keeps them loadable as the model zoo evolves.
"""

import dataclasses
import glob
import json
import os

import pytest
import yaml

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.mark.parametrize("path", sorted(
    glob.glob(os.path.join(ROOT, "a2m", "*.yaml"))
    + glob.glob(os.path.join(ROOT, "p2m", "*.yaml"))))
def test_a2m_config_builds(path):
    from train_a2m import build_a2m

    with open(path) as f:
        spec = yaml.safe_load(f)
    model, cfg = build_a2m(spec, dtype=None)
    assert model is not None
    # the spec's model kwargs must all be real A2MConfig fields
    fields = {f.name for f in dataclasses.fields(cfg)}
    assert set(spec.get("model", {})) <= fields


@pytest.mark.parametrize("path", sorted(
    glob.glob(os.path.join(ROOT, "amd", "*.json"))))
def test_amd_config_builds(path):
    from hivae_tpu.models import amd

    with open(path) as f:
        d = json.load(f)
    cfg = amd.AMDConfig.from_dict(d)
    model = amd.AMDModelNew(cfg=cfg)
    assert model is not None
    assert dataclasses.asdict(cfg) == d  # exact round trip, no silent drops
