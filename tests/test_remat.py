"""Remat (jax.checkpoint) option: identical outputs and gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from transparent_object_detection_tpu.models import FocusModel


def _model(remat):
    return FocusModel(
        num_classes=1, base_channels=8, base_depth=1, deep_mul=0.5, num_heads=2,
        dtype=jnp.float32, remat=remat,
    )


def test_remat_same_forward_and_grad():
    x = jax.random.normal(jax.random.key(0), (1, 64, 64, 3), jnp.float32)
    m0, m1 = _model(False), _model(True)
    v = m0.init(jax.random.key(1), x, train=True)  # same tree works for both

    def loss(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return sum(jnp.sum(r.astype(jnp.float32) ** 2) for r in out["raw"])

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(v["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(v["params"])
    # remat changes summation order -> fp32 drift, incl. catastrophic
    # cancellation on near-zero bias grads; compare against the overall
    # gradient magnitude, not per-leaf.
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(g0))
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), g0, g1)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-4 * gmax
