"""Tests for the post-hoc weight re-initialization (train/init.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transparent_object_detection_tpu.models import FocusModel
from transparent_object_detection_tpu.train.init import weights_init


@pytest.fixture(scope="module")
def params():
    model = FocusModel(
        num_classes=1, base_channels=8, base_depth=1, deep_mul=0.5, num_heads=2,
        dtype=jnp.float32,
    )
    v = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=True)
    return v["params"]


@pytest.mark.parametrize("kind", ["normal", "xavier", "kaiming", "orthogonal"])
def test_weights_init_changes_kernels(params, kind):
    new = weights_init(params, jax.random.key(1), kind)
    old_k = params["backbone"]["stem"]["conv"]["kernel"]
    new_k = new["backbone"]["stem"]["conv"]["kernel"]
    assert new_k.shape == old_k.shape
    assert float(jnp.abs(new_k - old_k).max()) > 0
    # BN scale near 1, bias zero
    np.testing.assert_allclose(
        np.asarray(new["backbone"]["stem"]["bn"]["scale"]).mean(), 1.0, atol=0.1
    )
    np.testing.assert_allclose(np.asarray(new["backbone"]["stem"]["bn"]["bias"]), 0.0)


def test_weights_init_unknown_raises(params):
    with pytest.raises(NotImplementedError):
        weights_init(params, jax.random.key(0), "bogus")


def test_weights_init_preserves_structure(params):
    new = weights_init(params, jax.random.key(2), "kaiming")
    assert jax.tree_util.tree_structure(new) == jax.tree_util.tree_structure(params)
