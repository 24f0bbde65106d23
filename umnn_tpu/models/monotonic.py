"""Standalone monotone scalar regressor (MonotonicNN).

Reference semantics: `models/UMNN/MonotonicNN.py` in AWehenkel/UMNN. The
model learns a function strictly increasing in its first input:

    y(x, h) = exp(s(h)) * ∫_0^x f(t, h) dt + o(h)

with ``f = ELU(MLP(t, h)) + 1 > 0`` and a free network emitting the offset
``o`` and log-scale ``s`` from the conditioning variables ``h``
(`MonotonicNN.py:49-54`). The integral runs through the memory-efficient
Leibniz-VJP quadrature engine.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from umnn_tpu.nn.core import ACTIVATIONS, Params, mlp_apply, mlp_init
from umnn_tpu.ops.integrand_kernel import fused_cc_integral, pallas_available
from umnn_tpu.ops.quadrature import cc_quadrature, neural_integral


@dataclasses.dataclass(frozen=True)
class IntegrandNN:
    """Positive MLP integrand: ReLU hidden layers, ELU+1 output
    (`MonotonicNN.py:12-27`)."""

    in_d: int  # total input width: 1 (integration var) + conditioning dims
    hidden_layers: tuple[int, ...]

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return {"layers": mlp_init(key, [self.in_d, *self.hidden_layers, 1], dtype)}

    def apply(self, params: Params, x: jax.Array, h: jax.Array) -> jax.Array:
        inp = jnp.concatenate([x, h], axis=-1)
        return mlp_apply(
            params["layers"], inp, ACTIVATIONS["ReLU"], ACTIVATIONS["ELUPlus"]
        )


@dataclasses.dataclass(frozen=True)
class MonotonicNN:
    """Monotone-in-x1 regressor; ``in_d`` counts x plus conditioning dims.

    ``apply(params, x [B,1], h [B, in_d-1]) -> [B, 1]``.
    """

    in_d: int
    hidden_layers: tuple[int, ...]
    nb_steps: int = 50
    backend: str = "auto"

    def __post_init__(self):
        object.__setattr__(
            self, "integrand", IntegrandNN(self.in_d, tuple(self.hidden_layers))
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        ki, kh = jax.random.split(key)
        return {
            "integrand": self.integrand.init(ki, dtype),
            # free net: h -> (offset, log-scale)  (`MonotonicNN.py:33-42`)
            "hnet": mlp_init(kh, [self.in_d - 1, *self.hidden_layers, 2], dtype),
        }

    def apply(self, params: Params, x: jax.Array, h: jax.Array) -> jax.Array:
        out = mlp_apply(params["hnet"], h, ACTIVATIONS["ReLU"])
        offset = out[..., 0:1]
        scaling = jnp.exp(out[..., 1:2])
        use_pallas = len(self.hidden_layers) >= 1 and (
            self.backend == "pallas"
            or (self.backend == "auto" and pallas_available())
        )
        if use_pallas:
            n_np, w_np = cc_quadrature(self.nb_steps)
            layers = params["integrand"]["layers"]
            integral = fused_cc_integral(
                [l["w"] for l in layers],
                [l["b"] for l in layers],
                x[..., 0],
                h,
                jnp.asarray(n_np, x.dtype),
                jnp.asarray(w_np, x.dtype),
                neg_slope=0.0,  # ReLU hidden layers (`MonotonicNN.py:19-22`)
            )[..., None]
        else:
            x0 = jnp.zeros_like(x)
            integral = neural_integral(
                lambda p, xx, hh: self.integrand.apply(p, xx, hh),
                params["integrand"],
                x0,
                x,
                h,
                nb_steps=self.nb_steps,
            )
        return scaling * integral + offset
