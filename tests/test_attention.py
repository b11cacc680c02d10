"""Equivalence tests for the memory-efficient attention implementations."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transparent_object_detection_tpu.ops.attention import (
    attention,
    chunked_attention,
    reference_attention,
)


@pytest.fixture
def qkv(rng):
    b, n, dq, dv = 2, 640, 32, 64
    q = jnp.asarray(rng.normal(size=(b, n, dq)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, dq)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, dv)), jnp.float32)
    return q, k, v


def test_chunked_matches_reference(qkv):
    q, k, v = qkv
    ref = reference_attention(q, k, v, scale=0.17)
    chk = chunked_attention(q, k, v, scale=0.17, block_q=128)
    np.testing.assert_allclose(np.asarray(chk), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_chunked_ragged_n(rng):
    # N not divisible by block: padding path
    q = jnp.asarray(rng.normal(size=(1, 100, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 100, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 100, 8)), jnp.float32)
    ref = reference_attention(q, k, v)
    chk = chunked_attention(q, k, v, block_q=64)
    np.testing.assert_allclose(np.asarray(chk), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_chunked_differentiable(qkv):
    q, k, v = qkv

    def f(q):
        return chunked_attention(q, k, v, block_q=128).sum()

    g = jax.grad(f)(q)
    assert np.all(np.isfinite(np.asarray(g)))


def test_attention_auto_dispatch(qkv):
    q, k, v = qkv
    out = attention(q, k, v)  # CPU backend -> small n -> xla
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_interpreter_matches_reference(rng):
    """Run the Pallas flash kernel in interpreter mode on CPU."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from transparent_object_detection_tpu.ops import attention as attn_mod

    b, n, dq, dv = 2, 256, 16, 32
    bq = bk = 128
    q = jnp.asarray(rng.normal(size=(b, n, dq)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, dq)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, dv)), jnp.float32)

    out = pl.pallas_call(
        functools.partial(attn_mod._flash_kernel, scale=0.25),
        grid=(b, n // bq, n // bk),
        in_specs=[
            pl.BlockSpec((1, bq, dq), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, bk, dq), lambda bi, qi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, bk, dv), lambda bi, qi, ki: (bi, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, dv), lambda bi, qi, ki: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, dv), jnp.float32),
        ],
        interpret=True,
    )(q, k, v)
    ref = reference_attention(q, k, v, scale=0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_multihead_dispatch_matches_folded(rng):
    """Packed (B, N, H*D) multi-head == folding heads into batch."""
    from transparent_object_detection_tpu.ops.attention import attention, reference_attention

    b, n, h, d = 2, 256, 4, 16
    q = jnp.asarray(rng.normal(size=(b, n, h * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h * d)), jnp.float32)
    out = attention(q, k, v, scale=0.25, num_heads=h)  # auto -> xla via fold
    fold = lambda t: t.reshape(b, n, h, d).transpose(0, 2, 1, 3).reshape(b * h, n, d)
    ref = reference_attention(fold(q), fold(k), fold(v), scale=0.25)
    ref = ref.reshape(b, h, n, d).transpose(0, 2, 1, 3).reshape(b, n, h * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_mha_flash_interpreter_matches_reference(rng):
    """Run the packed multi-head Pallas kernel in interpreter mode on CPU."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from transparent_object_detection_tpu.ops import attention as attn_mod
    from transparent_object_detection_tpu.ops.attention import reference_attention

    b, n, h, d = 1, 256, 2, 128
    bq = bk = 128
    q = jnp.asarray(rng.normal(size=(b, n, h * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h * d)), jnp.float32)

    out = pl.pallas_call(
        functools.partial(attn_mod._mha_flash_kernel, scale=0.3),
        grid=(b, h, n // bq, n // bk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, hi, qi, ki: (bi, qi, hi)),
            pl.BlockSpec((1, bk, d), lambda bi, hi, qi, ki: (bi, ki, hi)),
            pl.BlockSpec((1, bk, d), lambda bi, hi, qi, ki: (bi, ki, hi)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bi, hi, qi, ki: (bi, qi, hi)),
        out_shape=jax.ShapeDtypeStruct((b, n, h * d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=True,
    )(q, k, v)

    fold = lambda t: t.reshape(b, n, h, d).transpose(0, 2, 1, 3).reshape(b * h, n, d)
    ref = reference_attention(fold(q), fold(k), fold(v), scale=0.3)
    ref = ref.reshape(b, h, n, d).transpose(0, 2, 1, 3).reshape(b, n, h * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_vmem_block_fitter_wide_head_dims():
    """The bf16 flash block fitter must shrink tiles for the phi='l'/'x'
    backbone SelfAttention (dv = C = 2048+) — a (800, 400) choice measured
    17.58M scoped VMEM on v5e (> the 16M limit) — while leaving the
    validated phi='s' configs untouched."""
    from transparent_object_detection_tpu.ops.attention import (
        _divisor_block,
        _fit_blocks_vmem,
    )

    # phi='l' SelfAttention: must shrink to something that fits
    bq, bk = _fit_blocks_vmem(
        6400, 256, 2048, _divisor_block(6400, 1024), _divisor_block(6400, 1024)
    )
    assert bq is not None and bk is not None
    budget = 14 * 1024 * 1024 + 512 * 1024
    wset = (
        2 * bq * 256 * 2 + 2 * bk * (256 + 2048) * 2 + 2 * bq * 2048 * 2
        + bq * 2048 * 4 + bq * bk * 4 + 2 * bq * 128 * 4
    )
    assert wset <= budget

    # validated phi='s' configs pass through unchanged
    assert _fit_blocks_vmem(6400, 256, 256, 400, 3200) == (400, 3200)
    assert _fit_blocks_vmem(6400, 64, 512, 800, 800) == (800, 800)

    # int8 picker: wide dv no longer returns unfittable full-width kv
    from transparent_object_detection_tpu.ops.attention_int8 import pick_blocks

    blocks = pick_blocks(6400, 256, 1, cv=2048)
    assert blocks is not None
    assert 2 * blocks[1] * (256 + 2048) <= (15 * 1024 * 1024 + 512 * 1024)
