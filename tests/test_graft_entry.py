"""Driver-surface regression tests: entry() compiles, dryrun_multichip runs."""

import importlib.util
import os

import jax
import numpy as np

import pytest

pytestmark = pytest.mark.slow


def _load():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(repo, "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestGraftEntry:
    def test_entry_jits(self):
        mod = _load()
        fn, args = mod.entry()
        loss = jax.jit(fn)(*args)
        assert np.isfinite(float(loss))

    def test_dryrun_multichip(self):
        mod = _load()
        mod.dryrun_multichip(8)  # asserts finite loss internally
