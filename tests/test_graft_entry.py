"""Driver-contract tests for __graft_entry__.py."""
import importlib.util
import os

import pytest


def _load():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_traces():
    """entry() must return a jittable fn + example args that trace cleanly."""
    import jax

    mod = _load()
    fn, args = mod.entry()
    lowered = jax.jit(fn).lower(*args)  # trace + lower, no backend compile
    assert "func" in lowered.as_text()[:2000] or lowered is not None
