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


def test_w4a4_mlp1_env_gate(rng, monkeypatch):
    """TOD_W4A4_MLP1=1 routes the mlp1 projection through the w4a4 path
    (int4 weights + per-row dynamic int4 activations — VERDICT r4 #3):
    same param tree as every other branch, numerics within 4-bit error of
    the bf16 oracle, and the handoff into mlp2's x_quant consumer intact."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 256)), jnp.float32)
    teb_bf, v_bf = _build(False, x)
    o_bf = np.asarray(teb_bf.apply(v_bf, x))

    monkeypatch.setenv("TOD_W4A4_MLP1", "1")
    teb_w4, v_w4 = _build(True, x)
    assert jax.tree_util.tree_structure(v_bf) == jax.tree_util.tree_structure(v_w4)
    o_w4 = np.asarray(teb_w4.apply(v_w4, x))
    rel = np.abs(o_w4 - o_bf) / (np.abs(o_bf) + 1e-2)
    assert np.median(rel) < 0.1
    assert rel.mean() < 0.3

    # default-off: without the env the int8 path is byte-identical to the
    # plain int8 branch
    monkeypatch.delenv("TOD_W4A4_MLP1")
    teb_i8, v_i8 = _build(True, x)
    o_i8 = np.asarray(teb_i8.apply(v_i8, x))
    monkeypatch.setenv("TOD_W4A4_MLP1", "0")
    o_i8_gated = np.asarray(teb_i8.apply(v_i8, x))
    np.testing.assert_array_equal(o_i8, o_i8_gated)
