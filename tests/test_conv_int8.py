"""ConvBNAct fused-int8 1x1 serving path (models/blocks.py int8=True):
param-tree parity with the bf16 conv branch, eligibility gating, and
numerics within quantization error (CPU: the fused kernel falls back to
its pure-JAX math twin). Replaces the reference Conv 1x1 instances
(reference model/blocks.py:22-58) on the serving path."""
import jax
import jax.numpy as jnp
import numpy as np

from transparent_object_detection_tpu.models.blocks import C2f, ConvBNAct


def _init_with_stats(mod, x, seed=1):
    v = mod.init({"params": jax.random.key(seed)}, x, train=True)
    # make BN stats non-trivial so the fold is actually exercised
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.3 if a.ndim == 1 else a, v["batch_stats"]
    )
    return {"params": v["params"], "batch_stats": stats}


def test_param_tree_identical_and_numerics_close(rng):
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 1536)), jnp.float32)
    conv_bf = ConvBNAct(1024, 1, dtype=jnp.float32, name="c")
    conv_i8 = ConvBNAct(1024, 1, dtype=jnp.float32, int8=True, name="c")
    v = _init_with_stats(conv_bf, x)
    v2 = _init_with_stats(conv_i8, x)

    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    o_bf = np.asarray(conv_bf.apply(v, x, train=False))
    o_i8 = np.asarray(conv_i8.apply(v2, x, train=False))
    assert o_bf.shape == o_i8.shape
    rel = np.abs(o_i8 - o_bf) / (np.abs(o_bf) + 1e-2)
    assert np.median(rel) < 0.05
    assert rel.mean() < 0.15


def test_train_mode_and_ineligible_shapes_stay_exact(rng):
    # train=True must route to the differentiable bf16 branch (bit-exact);
    # ineligible geometry (3x3 / odd token count / narrow features) must
    # also stay on the conv branch rather than hit the slow quant fallback.
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 1536)), jnp.float32)
    conv_bf = ConvBNAct(1024, 1, dtype=jnp.float32, name="c")
    conv_i8 = ConvBNAct(1024, 1, dtype=jnp.float32, int8=True, name="c")
    v = _init_with_stats(conv_bf, x)
    t_bf, _ = conv_bf.apply(v, x, train=True, mutable=["batch_stats"])
    t_i8, _ = conv_i8.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(t_bf), np.asarray(t_i8))

    # odd token count (15*15*1 = 225 not % 256) -> bf16 branch, exact
    x_odd = jnp.asarray(rng.normal(size=(1, 15, 15, 1536)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(conv_bf.apply(v, x_odd, train=False)),
        np.asarray(conv_i8.apply(v, x_odd, train=False)),
    )

    # measured-unprofitable geometry (bandwidth-bound 256->256) -> bf16
    # branch, exact
    x_n = jnp.asarray(rng.normal(size=(1, 16, 16, 256)), jnp.float32)
    conv_n_bf = ConvBNAct(256, 1, dtype=jnp.float32, name="c")
    conv_n_i8 = ConvBNAct(256, 1, dtype=jnp.float32, int8=True, name="c")
    vn = _init_with_stats(conv_n_bf, x_n)
    np.testing.assert_array_equal(
        np.asarray(conv_n_bf.apply(vn, x_n, train=False)),
        np.asarray(conv_n_i8.apply(vn, x_n, train=False)),
    )


def test_c2f_int8_1x1_checkpoint_interchange(rng):
    # C2f(1024): cv2 sees 1536 -> 1024 (measured-profitable -> int8 route);
    # cv1 (1024 -> 1024) stays bf16 by the same measured table
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 1024)), jnp.float32)
    c2f_bf = C2f(1024, n=1, shortcut=True, dtype=jnp.float32, name="m")
    c2f_i8 = C2f(1024, n=1, shortcut=True, dtype=jnp.float32, int8_1x1=True, name="m")
    v = _init_with_stats(c2f_bf, x)
    assert (
        jax.tree_util.tree_structure(v)
        == jax.tree_util.tree_structure(_init_with_stats(c2f_i8, x))
    )
    o_bf = np.asarray(c2f_bf.apply(v, x, train=False))
    o_i8 = np.asarray(c2f_i8.apply(v, x, train=False))
    rel = np.abs(o_i8 - o_bf) / (np.abs(o_bf) + 1e-2)
    assert np.median(rel) < 0.05
