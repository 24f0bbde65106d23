"""Minimal functional NN layer library (pure pytree params, jit-first).

The whole framework uses explicit parameter pytrees (nested dicts of
``jnp.ndarray``) and pure ``apply`` functions instead of a stateful module
system: this keeps ``jax.custom_vjp``, ``jax.checkpoint``, Pallas calls and
``pjit`` sharding annotations trivial to thread through. Initialization
follows the reference's PyTorch defaults (Kaiming-uniform fan-in for both
weight and bias, `torch.nn.Linear` semantics) so that parity runs start from
statistically identical weights.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

Params = Any


def torch_linear_init(key: jax.Array, din: int, dout: int, dtype=jnp.float32) -> Params:
    """Weight/bias init matching torch.nn.Linear defaults.

    W ~ U(-1/sqrt(din), 1/sqrt(din)) (kaiming_uniform with a=sqrt(5)),
    b ~ U(-1/sqrt(din), 1/sqrt(din)). Stored as [din, dout] (row-vector
    convention ``y = x @ W + b`` — transposed vs torch, natural for XLA).
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(din) if din > 0 else 0.0
    return {
        "w": jax.random.uniform(kw, (din, dout), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (dout,), dtype, -bound, bound),
    }


def dense_apply(p: Params, x: jax.Array) -> jax.Array:
    return jnp.matmul(x, p["w"], preferred_element_type=x.dtype) + p["b"]


# --- activations ------------------------------------------------------------


def elu_plus(x: jax.Array) -> jax.Array:
    """ELU(x) + 1 > 0 — the positivity-enforcing output activation of all
    integrand networks (reference `UMNNMAF.py:11-16`, `MonotonicNN.py:23-27`)."""
    return jax.nn.elu(x) + 1.0


ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "ReLU": jax.nn.relu,
    "LeakyReLU": lambda x: jax.nn.leaky_relu(x, 0.01),
    "ELU": jax.nn.elu,
    "ELUPlus": elu_plus,
    "Sigmoid": jax.nn.sigmoid,
    "Tanh": jnp.tanh,
    "Softplus": jax.nn.softplus,
    "Identity": lambda x: x,
}


# --- MLP --------------------------------------------------------------------


def mlp_init(
    key: jax.Array, sizes: Sequence[int], dtype=jnp.float32
) -> list[Params]:
    """Init an MLP with layer widths ``sizes = [din, h1, ..., dout]``."""
    keys = jax.random.split(key, len(sizes) - 1)
    return [
        torch_linear_init(k, d0, d1, dtype)
        for k, d0, d1 in zip(keys, sizes[:-1], sizes[1:])
    ]


def mlp_apply(
    layers: Sequence[Params],
    x: jax.Array,
    hidden_act: Callable[[jax.Array], jax.Array],
    out_act: Callable[[jax.Array], jax.Array] = ACTIVATIONS["Identity"],
) -> jax.Array:
    for p in layers[:-1]:
        x = hidden_act(dense_apply(p, x))
    return out_act(dense_apply(layers[-1], x))


def count_params(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
