"""Weight re-initialization schemes (reference train_utils.py:93-128).

Applies normal / xavier / kaiming / orthogonal init to every conv/dense
kernel in a params pytree and N(1, 0.02)/0 to norm scales/biases — as a pure
pytree transform with an explicit PRNG key (flax modules are initialized at
init(); this mirrors the reference's post-hoc `weights_init(net, type)`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _kernel_init(init_type: str, gain: float):
    if init_type == "normal":
        return lambda k, s: gain * jax.random.normal(k, s)
    if init_type == "xavier":
        return jax.nn.initializers.glorot_normal(in_axis=-2, out_axis=-1)
    if init_type == "kaiming":
        return jax.nn.initializers.he_normal(in_axis=-2, out_axis=-1)
    if init_type == "orthogonal":
        return jax.nn.initializers.orthogonal(scale=gain)
    raise NotImplementedError(f"init method [{init_type}] is not implemented")


def weights_init(params: Any, key: jax.Array, init_type: str = "kaiming",
                 init_gain: float = 0.02) -> Any:
    """Re-draw kernels per `init_type`; norm scales ~ N(1, 0.02), biases 0."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    kinit = _kernel_init(init_type, init_gain)
    keys = jax.random.split(key, len(flat))
    out = []
    for (path, leaf), k in zip(flat, keys):
        names = [p.key for p in path if hasattr(p, "key")]
        last = names[-1] if names else ""
        parent = names[-2] if len(names) > 1 else ""
        is_norm = any(n in ("bn", "norm1", "norm2") for n in (parent,))
        if last == "kernel" and leaf.ndim >= 2:
            out.append(kinit(k, leaf.shape).astype(leaf.dtype))
        elif last == "scale" and is_norm:
            out.append((1.0 + 0.02 * jax.random.normal(k, leaf.shape)).astype(leaf.dtype))
        elif last == "bias" and is_norm:
            out.append(jnp.zeros_like(leaf))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
