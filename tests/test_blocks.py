"""Shape/behavior tests for the primitive blocks (models/blocks.py).

Mirrors the reference block contracts in model/blocks.py; everything runs in
float32 on CPU for numerical checks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transparent_object_detection_tpu.models.blocks import (
    C2f,
    CBAM,
    ConvBNAct,
    Bottleneck,
    SelfAttention,
    SPPF,
    TransformerEncoderBlock,
    autopad,
    dfl_expectation,
    fuse_conv_bn,
    _pick_num_heads,
)

DT = jnp.float32


def _init_apply(module, x, train=False):
    variables = module.init(jax.random.key(0), x, train=True)
    out = module.apply(variables, x, train=train)
    return out, variables


def test_autopad():
    assert autopad(1) == 0
    assert autopad(3) == 1
    assert autopad(7) == 3
    assert autopad(3, None, 2) == 2  # dilated: actual k=5


def test_convbnact_shapes_stride2():
    x = jnp.ones((2, 64, 64, 3), dtype=DT)
    out, _ = _init_apply(ConvBNAct(16, 3, strides=2, dtype=DT), x)
    assert out.shape == (2, 32, 32, 16)


def test_convbnact_odd_input_matches_torch_rule():
    # torch: floor((H + 2*(k//2) - k)/s) + 1
    x = jnp.ones((1, 65, 65, 3), dtype=DT)
    out, _ = _init_apply(ConvBNAct(8, 3, strides=2, dtype=DT), x)
    assert out.shape == (1, 33, 33, 8)


def test_bottleneck_residual_applied_only_when_channels_match():
    x = jnp.ones((1, 8, 8, 16), dtype=DT)
    out, _ = _init_apply(Bottleneck(16, shortcut=True, dtype=DT), x)
    assert out.shape == (1, 8, 8, 16)
    out2, _ = _init_apply(Bottleneck(32, shortcut=True, dtype=DT), x)
    assert out2.shape == (1, 8, 8, 32)


def test_c2f_shape():
    x = jnp.ones((2, 16, 16, 32), dtype=DT)
    out, variables = _init_apply(C2f(64, n=2, shortcut=True, dtype=DT), x)
    assert out.shape == (2, 16, 16, 64)
    # n bottlenecks present
    assert "m0" in variables["params"] and "m1" in variables["params"]


def test_sppf_shape_preserves_hw():
    x = jnp.ones((1, 20, 20, 64), dtype=DT)
    out, _ = _init_apply(SPPF(64, pool_size=5, dtype=DT), x)
    assert out.shape == (1, 20, 20, 64)


def test_dfl_expectation_golden():
    # All mass on bin 3 -> expectation 3.
    logits = jnp.full((1, 2, 4, 16), -1e9)
    logits = logits.at[..., 3].set(0.0)
    out = dfl_expectation(logits, 16)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)
    # Uniform distribution -> expectation (16-1)/2 = 7.5.
    out_u = dfl_expectation(jnp.zeros((1, 1, 4, 16)), 16)
    np.testing.assert_allclose(np.asarray(out_u), 7.5, atol=1e-5)


def test_cbam_shape_and_gating():
    x = jnp.ones((2, 8, 8, 32), dtype=DT)
    out, _ = _init_apply(CBAM(dtype=DT), x)
    assert out.shape == x.shape
    # Output is elementwise-gated input: |out| <= |x| everywhere.
    assert np.all(np.abs(np.asarray(out)) <= np.abs(np.asarray(x)) + 1e-6)


def test_self_attention_identity_at_init():
    # gamma initializes to 0 -> block is the identity at init (blocks.py:253).
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 16), dtype=DT)
    out, _ = _init_apply(SelfAttention(dtype=DT), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_self_attention_batch_independence():
    # Changing image 1 must not affect image 0's output (true batched attn).
    sa = SelfAttention(dtype=DT)
    x = jax.random.normal(jax.random.key(2), (2, 4, 4, 16), dtype=DT)
    variables = sa.init(jax.random.key(0), x, train=False)
    # Force gamma nonzero so attention actually contributes.
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    params = variables["params"]
    params = {**params, "gamma": jnp.ones((1,), dtype=DT)}
    out_a = sa.apply({"params": params}, x, train=False)
    x_mod = x.at[1].set(x[1] * 2.0 + 1.0)
    out_b = sa.apply({"params": params}, x_mod, train=False)
    np.testing.assert_allclose(np.asarray(out_a[0]), np.asarray(out_b[0]), atol=1e-5)


def test_teb_shape_and_batch_independence():
    # Repairs reference bug B2: attention must be per-image over HW tokens.
    teb = TransformerEncoderBlock(num_heads=4, dtype=DT)
    x = jax.random.normal(jax.random.key(3), (2, 4, 4, 16), dtype=DT)
    variables = teb.init(jax.random.key(0), x, train=False)
    out_a = teb.apply(variables, x, train=False)
    assert out_a.shape == x.shape
    x_mod = x.at[1].set(0.0)
    out_b = teb.apply(variables, x_mod, train=False)
    np.testing.assert_allclose(np.asarray(out_a[0]), np.asarray(out_b[0]), atol=1e-4)


def test_pick_num_heads():
    assert _pick_num_heads(2048, 8) == 8  # dh=256, lane-aligned
    assert _pick_num_heads(337, 8) == 1  # 337 is prime
    assert _pick_num_heads(12, 8) == 6
    assert _pick_num_heads(4, 8) == 4
    # lane preference: 1536 = 8*192 (unaligned) vs 6*256 (aligned) -> 6
    assert _pick_num_heads(1536, 8) == 6
    assert _pick_num_heads(512, 8) == 4  # 4*128 beats 8*64
    assert _pick_num_heads(1024, 8) == 8  # 8*128 aligned already


def test_fuse_conv_bn_equivalence():
    """Fused inference == BN inference (repairs reference bug B1)."""
    module = ConvBNAct(8, 3, dtype=DT)
    x = jax.random.normal(jax.random.key(4), (2, 8, 8, 4), dtype=DT)
    variables = module.init(jax.random.key(0), x, train=True)
    # Run a few train steps so batch_stats are non-trivial.
    _, updates = module.apply(variables, x * 3 + 1, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": updates["batch_stats"]}

    ref = module.apply(variables, x, train=False)
    fused_p, fused_s = fuse_conv_bn(variables["params"], variables["batch_stats"])
    fused = module.apply({"params": fused_p, "batch_stats": fused_s}, x, train=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_quantdense_matches_dense_and_shares_tree():
    """QuantDense: identical param tree to nn.Dense; int8 output within ~1%
    of the fp32 matmul; a bf16-trained checkpoint deploys as int8 directly."""
    import flax.linen as nn
    from transparent_object_detection_tpu.models.blocks import QuantDense

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 48)), jnp.float32)
    qd = QuantDense(32, dtype=jnp.float32)
    dn = nn.Dense(32, dtype=jnp.float32, param_dtype=jnp.float32)
    v = qd.init(jax.random.key(1), x)
    # same tree structure and shapes
    v_dense = dn.init(jax.random.key(1), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_dense)
    out_q = qd.apply(v, x)
    out_d = dn.apply(v, x)
    rel = float(jnp.abs(out_q - out_d).max() / (jnp.abs(out_d).max() + 1e-9))
    assert rel < 0.02, rel


def test_teb_int8_mode_same_params_small_drift():
    from transparent_object_detection_tpu.models.blocks import TransformerEncoderBlock

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 32)), jnp.float32)
    teb = TransformerEncoderBlock(num_heads=2, dtype=jnp.float32)
    teb_q = TransformerEncoderBlock(num_heads=2, dtype=jnp.float32, int8_dense=True)
    v = teb.init(jax.random.key(0), x, train=False)
    # int8 variant consumes the same variables
    out = teb.apply(v, x, train=False)
    out_q = teb_q.apply(v, x, train=False)
    rel = float(jnp.abs(out - out_q).max() / (jnp.abs(out).max() + 1e-9))
    assert rel < 0.05, rel
