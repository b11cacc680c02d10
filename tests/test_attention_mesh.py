"""Mesh-aware flash-attention routing: the shard_map wrap must hand each
shard its batch slice and reassemble outputs correctly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transparent_object_detection_tpu.ops import attention as attn_mod
from transparent_object_detection_tpu.parallel import batch_sharding, make_mesh


@pytest.fixture(autouse=True)
def _clear_mesh():
    yield
    attn_mod.set_attention_mesh(None)


def test_shard_map_wrap_splits_batch(monkeypatch, rng):
    mesh = make_mesh()
    attn_mod.set_attention_mesh(mesh)

    seen = []

    def fake_flash(q, k, v, scale, bq, bk):
        seen.append(q.shape)
        return attn_mod.reference_attention(q, k, v, scale)

    monkeypatch.setattr(attn_mod, "flash_attention_pallas", fake_flash)

    b, n, d = 8, 2048, 128
    q = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    q = jax.device_put(q, batch_sharding(mesh))
    k = jax.device_put(k, batch_sharding(mesh))
    v = jax.device_put(v, batch_sharding(mesh))

    out = attn_mod.attention(q, k, v, scale=0.1, impl="pallas")
    ref = attn_mod.reference_attention(q, k, v, scale=0.1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
    # each shard saw batch 1 (8 images / 8 devices)
    assert seen and all(s[0] == 1 for s in seen)


def test_no_mesh_passthrough(monkeypatch, rng):
    def fake_flash(q, k, v, scale, bq, bk):
        assert q.shape[0] == 4  # full batch, no shard_map
        return attn_mod.reference_attention(q, k, v, scale)

    monkeypatch.setattr(attn_mod, "flash_attention_pallas", fake_flash)
    q = jnp.asarray(rng.normal(size=(4, 2048, 64)), jnp.float32)
    out = attn_mod.attention(q, q, q, scale=0.1, impl="pallas")
    assert out.shape == (4, 2048, 64)


def test_int8_path_shard_map_splits_batch(monkeypatch, rng):
    """attention(int8=True) under a registered mesh routes the int8 kernel
    through shard_map with per-shard batch slices."""
    import transparent_object_detection_tpu.ops.attention_int8 as a8

    mesh = make_mesh()
    attn_mod.set_attention_mesh(mesh)

    seen = []

    def fake_int8(q, k, v, num_heads, scale, block_q, block_k):
        seen.append(q.shape)
        return attn_mod.reference_attention(q, k, v, scale)

    monkeypatch.setattr(a8, "flash_attention_mha_int8", fake_int8)

    b, n, d = 8, 2048, 128
    q = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    q = jax.device_put(q, batch_sharding(mesh))
    k = jax.device_put(k, batch_sharding(mesh))
    v = jax.device_put(v, batch_sharding(mesh))

    out = attn_mod.attention(q, k, v, scale=0.1, impl="pallas", num_heads=1, int8=True)
    ref = attn_mod.reference_attention(q, k, v, scale=0.1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
    assert seen and all(s[0] == 1 for s in seen)


def test_tp_mesh_shards_heads(monkeypatch, rng):
    """On a (data, model) mesh, the packed-head channel axis is sharded over
    the model axis: each rank's kernel sees heads/tp local heads — Megatron
    column-parallel qkv layout, zero collectives inside attention."""
    from transparent_object_detection_tpu.parallel.tp import make_2d_mesh

    mesh = make_2d_mesh(tp=4)  # dp2 x tp4 on the 8 CPU devices
    attn_mod.set_attention_mesh(mesh)

    seen = []

    def fake_mha(q, k, v, num_heads, scale, bq, bk):
        seen.append((q.shape, num_heads))
        b, n, c = q.shape
        d = c // num_heads
        fold = lambda t: t.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3).reshape(
            b * num_heads, n, d
        )
        out = attn_mod.reference_attention(fold(q), fold(k), fold(v), scale)
        return out.reshape(b, num_heads, n, d).transpose(0, 2, 1, 3).reshape(b, n, c)

    monkeypatch.setattr(attn_mod, "flash_attention_mha", fake_mha)
    attn_mod._diff_flash.cache_clear()

    b, n, h, d = 4, 2048, 8, 128
    c = h * d
    q = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)

    out = attn_mod.attention(q, k, v, scale=0.1, impl="pallas", num_heads=h)

    # oracle: per-head reference attention on the full arrays
    fold = lambda t: t.reshape(b, n, h, d).transpose(0, 2, 1, 3).reshape(b * h, n, d)
    ref = attn_mod.reference_attention(fold(q), fold(k), fold(v), 0.1)
    ref = ref.reshape(b, h, n, d).transpose(0, 2, 1, 3).reshape(b, n, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
    # each rank saw batch 4/2=2, channels c/4, and 8/4=2 local heads
    assert seen and all(
        s == ((2, n, c // 4), 2) for s in seen
    ), seen
    attn_mod._diff_flash.cache_clear()
