"""Masked autoregressive networks (MADE) — TPU-native reimplementation.

Reference semantics: `models/UMNN/made.py` in AWehenkel/UMNN (itself a
Karpathy MADE re-implementation). Masks are *static* boolean numpy arrays
built once on the host and baked into the jit trace as constants — they
multiply the weights elementwise, which XLA folds into the matmul, so a
MaskedDense costs exactly one MXU matmul.

Layout contract (load-bearing for the UMNN integrand fold, see
`models/UMNN/UMNNMAF.py:263-284`): for ``nout = k * nin``, output column
``j*nin + d`` is the j-th output feature of input dimension ``d`` — the mask
of the last layer is replicated k times along the output axis
(`made.py:96-100`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .core import ACTIVATIONS, Params, dense_apply, mlp_init

__all__ = ["build_made_masks", "MADE", "ConditionalMADE"]


def build_made_masks(
    nin: int,
    hidden_sizes: Sequence[int],
    nout: int,
    *,
    natural_ordering: bool = True,
    random_degrees: bool = False,
    seed: int = 0,
) -> tuple[list[np.ndarray], np.ndarray]:
    """Construct MADE connectivity masks.

    Returns ``(masks, input_order)`` where ``masks[l]`` has shape
    ``[fan_in_l, fan_out_l]`` (row-vector convention) and ``input_order`` is
    the sampled ordering of the inputs (identity unless random).

    Degree assignment matches the reference exactly (`made.py:84-94`):
    deterministic mode assigns hidden unit ``i`` the degree
    ``nin - 1 - (i % nin)``; random mode samples uniform degrees in
    ``[min(prev_degrees), nin - 2]``. Hidden masks connect degree-monotone
    (<=) pairs; the output mask uses strict (<) and is tiled for
    ``nout = k * nin``.
    """
    if nout % nin != 0:
        raise ValueError(f"nout ({nout}) must be an integer multiple of nin ({nin})")
    rng = np.random.RandomState(seed)
    L = len(hidden_sizes)
    degrees: dict[int, np.ndarray] = {}
    if random_degrees:
        degrees[-1] = np.arange(nin) if natural_ordering else rng.permutation(nin)
        for l in range(L):
            degrees[l] = rng.randint(
                degrees[l - 1].min(), nin - 1, size=hidden_sizes[l]
            )
    else:
        degrees[-1] = np.arange(nin)
        for l in range(L):
            degrees[l] = np.array(
                [nin - 1 - (i % nin) for i in range(hidden_sizes[l])]
            )

    masks = [degrees[l - 1][:, None] <= degrees[l][None, :] for l in range(L)]
    out_mask = degrees[L - 1][:, None] < degrees[-1][None, :]
    if nout > nin:
        out_mask = np.concatenate([out_mask] * (nout // nin), axis=1)
    masks.append(out_mask)
    return [m.astype(np.float32) for m in masks], degrees[-1]


@dataclasses.dataclass(frozen=True)
class MADE:
    """Masked MLP enforcing the autoregressive property.

    ``apply`` maps ``x [..., nin] -> [..., nout]`` where output block
    ``j*nin + d`` depends only on ``x[..., :d]`` (under natural ordering).
    With ``nout == 2 * nin`` the Gaussian-MADE helpers
    (:meth:`forward_gaussian`, :meth:`log_likelihood`, :meth:`invert`)
    mirror the reference (`made.py:113-142`).
    """

    nin: int
    hidden_sizes: tuple[int, ...]
    nout: int
    natural_ordering: bool = True
    random_degrees: bool = False
    mask_seed: int = 0

    def __post_init__(self):
        masks, order = build_made_masks(
            self.nin,
            self.hidden_sizes,
            self.nout,
            natural_ordering=self.natural_ordering,
            random_degrees=self.random_degrees,
            seed=self.mask_seed,
        )
        object.__setattr__(self, "_masks", tuple(jnp.asarray(m) for m in masks))
        # i_map[d] = output slot holding dimension of degree d (`made.py:108-110`).
        i_map = order.copy()
        for k in range(len(order)):
            i_map[order[k]] = k
        object.__setattr__(self, "_input_order", order)
        object.__setattr__(self, "_i_map", i_map)

    @property
    def masks(self):
        return self._masks

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        sizes = [self.nin, *self.hidden_sizes, self.nout]
        return {"layers": mlp_init(key, sizes, dtype)}

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        act = ACTIVATIONS["ReLU"]
        layers = params["layers"]
        for p, m in zip(layers[:-1], self._masks[:-1]):
            x = act(dense_apply({"w": p["w"] * m, "b": p["b"]}, x))
        p, m = layers[-1], self._masks[-1]
        return dense_apply({"w": p["w"] * m, "b": p["b"]}, x)

    # --- Gaussian MADE (nout == 2*nin) -------------------------------------

    def _mu_sigma(self, params: Params, x: jax.Array):
        t = self.apply(params, x)
        return t[..., : self.nin], t[..., self.nin :]

    def forward_gaussian(self, params: Params, x: jax.Array) -> jax.Array:
        mu, sigma = self._mu_sigma(params, x)
        return (x - mu) * jnp.exp(-sigma)

    def log_likelihood(self, params: Params, x: jax.Array):
        mu, sigma = self._mu_sigma(params, x)
        z = (x - mu) * jnp.exp(-sigma)
        log_prob_gauss = -0.5 * jnp.sum(jnp.log(2 * jnp.pi) + z**2, axis=-1)
        return -jnp.sum(sigma, axis=-1) + log_prob_gauss, z

    def invert(self, params: Params, z: jax.Array) -> jax.Array:
        """Sequential inversion of the Gaussian MADE, one dim per step.

        Data-dependent loop expressed as ``lax.fori_loop`` with a gather on
        the (static) inversion order so the whole scan jit-compiles once.
        """
        if self.nout != 2 * self.nin:
            raise ValueError("invert requires a Gaussian MADE (nout == 2*nin)")
        order = jnp.asarray(self._i_map, jnp.int32)

        def body(d, u):
            idx = order[d]
            t = self.apply(params, u)
            mu = jnp.take(t, idx, axis=-1)
            sigma = jnp.take(t, self.nin + idx, axis=-1)
            val = jnp.take(z, idx, axis=-1) * jnp.exp(sigma) + mu
            return u.at[..., idx].set(val)

        return jax.lax.fori_loop(0, self.nin, body, jnp.zeros_like(z))


@dataclasses.dataclass(frozen=True)
class ConditionalMADE:
    """MADE over ``concat(context, x)`` with context outputs stripped.

    Reference: `made.py:146-192`. The underlying MADE sees
    ``nin_total = nin + cond_in`` inputs under natural ordering, so every
    output may depend on the full context but dimension ``d`` of ``x`` only
    on ``x[..., :d]``. Output blocks of width ``nin_total`` are sliced to
    their trailing ``nin`` columns (`made.py:165-168`).
    """

    nin: int
    cond_in: int
    hidden_sizes: tuple[int, ...]
    nout: int  # of the underlying MADE; must be k * (nin + cond_in)
    natural_ordering: bool = True
    random_degrees: bool = False
    mask_seed: int = 0

    def __post_init__(self):
        made = MADE(
            self.nin + self.cond_in,
            self.hidden_sizes,
            self.nout,
            natural_ordering=self.natural_ordering,
            random_degrees=self.random_degrees,
            mask_seed=self.mask_seed,
        )
        object.__setattr__(self, "_made", made)

    @property
    def nout_cond(self) -> int:
        """Width of the context-stripped output."""
        return (self.nout // (self.nin + self.cond_in)) * self.nin

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return self._made.init(key, dtype)

    def apply(self, params: Params, x: jax.Array, context: jax.Array) -> jax.Array:
        nt = self.nin + self.cond_in
        out = self._made.apply(params, jnp.concatenate([context, x], axis=-1))
        k = out.shape[-1] // nt
        out = out.reshape(*out.shape[:-1], k, nt)[..., self.cond_in :]
        return out.reshape(*x.shape[:-1], k * self.nin)
