"""TransformerEncoderBlock int8 serving path: param-tree parity with the
bf16 branch and numerics within quantization error (CPU: the fused kernel
falls back to its pure-JAX math twin)."""
import jax
import jax.numpy as jnp
import numpy as np

from transparent_object_detection_tpu.models.blocks import TransformerEncoderBlock


def _build(int8: bool, x):
    teb = TransformerEncoderBlock(
        num_heads=2, dtype=jnp.float32, int8_dense=int8, name="t"
    )
    return teb, teb.init(jax.random.key(1), x)


def test_param_tree_identical_and_numerics_close(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 256)), jnp.float32)
    teb_bf, v_bf = _build(False, x)
    teb_i8, v_i8 = _build(True, x)

    # identical structure AND identical init values (same names -> same RNG
    # folding): a bf16-trained checkpoint deploys int8 unchanged
    assert jax.tree_util.tree_structure(v_bf) == jax.tree_util.tree_structure(v_i8)
    for a, b in zip(jax.tree_util.tree_leaves(v_bf), jax.tree_util.tree_leaves(v_i8)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    o_bf = teb_bf.apply(v_bf, x)
    o_i8 = teb_i8.apply(v_i8, x)
    rel = np.abs(np.asarray(o_i8) - np.asarray(o_bf)) / (
        np.abs(np.asarray(o_bf)) + 1e-2
    )
    assert np.median(rel) < 0.05
    assert rel.mean() < 0.15
