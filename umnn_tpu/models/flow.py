"""UMNNMAFFlow: a stack of UMNN-MAF blocks with inter-block feature reversal.

Reference semantics: `models/UMNN/UMNNMAFFlow.py` in AWehenkel/UMNN. The
forward composes ``rev . net_{k} . rev . ... . rev . net_0`` with a trailing
reversal restoring the original ordering (`UMNNMAFFlow.py:72-76`); the
reversal alternates the autoregressive direction between blocks. All methods
are pure functions of an explicit params list (one pytree per block).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from umnn_tpu.nn.core import Params
from umnn_tpu.models.umnn_maf import UMNNMAF

__all__ = ["UMNNMAFFlow"]


@dataclasses.dataclass(frozen=True)
class UMNNMAFFlow:
    nb_flow: int = 1
    nb_in: int = 1
    hidden_derivative: tuple[int, ...] = (50, 50, 50, 50)
    hidden_embedding: tuple[int, ...] = (50, 50, 50, 50)
    embedding_s: int = 20
    nb_steps: int = 50
    act_func: str = "ELU"
    solver: str = "CCParallel"
    cond_in: int = 0
    backend: str = "auto"

    def __post_init__(self):
        block = UMNNMAF(
            input_size=self.nb_in,
            embedding_s=self.embedding_s,
            hidden_embedding=tuple(self.hidden_embedding),
            hidden_derivative=tuple(self.hidden_derivative),
            nb_steps=self.nb_steps,
            cond_in=self.cond_in,
            act_func=self.act_func,
            solver=self.solver,
            backend=self.backend,
        )
        object.__setattr__(self, "block", block)

    def init(self, key: jax.Array, dtype=jnp.float32) -> list[Params]:
        keys = jax.random.split(key, self.nb_flow)
        return [self.block.init(k, dtype) for k in keys]

    @staticmethod
    def _rev(x: jax.Array) -> jax.Array:
        return jnp.flip(x, axis=-1)

    def forward(self, params, x, context=None, **quad):
        for p in params:
            x = self._rev(self.block.forward(p, x, context, **quad))
        return self._rev(x)

    def compute_log_jac(self, params, x, context=None, **quad):
        """Accumulated diagonal log-Jacobian (`UMNNMAFFlow.py:92-98`).

        Note: per-block jacobians live in the *block-local* feature order;
        the sum is over dimensions downstream, so the alternating reversal
        does not need to be applied to the jacobian itself (matching the
        reference, which also accumulates without reversal).
        """
        log_jac = jnp.zeros(x.shape, x.dtype)
        for p in params:
            log_jac = log_jac + self.block.compute_log_jac(p, x, context)
            x = self._rev(self.block.forward(p, x, context, **quad))
        return log_jac

    def compute_log_jac_bis(self, params, x, context=None, **quad):
        """Returns (z, summed per-dim log-jac) — the VAE path
        (`UMNNMAFFlow.py:100-107`)."""
        log_jac = jnp.zeros(x.shape, x.dtype)
        for p in params:
            x, lj = self.block.compute_log_jac_bis(p, x, context, **quad)
            x = self._rev(x)
            log_jac = log_jac + lj
        return self._rev(x), log_jac

    def compute_ll(self, params, x, context=None, **quad):
        """Exact log-likelihood under a standard-normal base
        (`UMNNMAFFlow.py:109-119`)."""
        log_jac = jnp.zeros(x.shape, x.dtype)
        z = x
        for p in params:
            zi = self._rev(self.block.forward(p, x, context, **quad))
            log_jac = log_jac + self.block.compute_log_jac(p, x, context)
            x = zi
        z = self._rev(x)
        log_prob_gauss = -0.5 * jnp.sum(jnp.log(2 * jnp.pi) + z**2, axis=-1)
        ll = jnp.sum(log_jac, axis=-1) + log_prob_gauss
        return ll, z

    def compute_ll_bis(self, params, x, context=None, **quad):
        """Per-dimension ll decomposition (`UMNNMAFFlow.py:121-130`)."""
        log_jac = jnp.zeros(x.shape, x.dtype)
        for p in params:
            log_jac = log_jac + self.block.compute_log_jac(p, x, context)
            x = self._rev(self.block.forward(p, x, context, **quad))
        z = self._rev(x)
        log_prob_gauss = -0.5 * (jnp.log(2 * jnp.pi) + z**2)
        return log_jac + log_prob_gauss, z

    def compute_bpp(self, params, x, alpha=1e-6, context=None):
        """Bits/pixel for logit-dequantized images (`UMNNMAFFlow.py:132-137`)."""
        d = x.shape[-1]
        ll, z = self.compute_ll(params, x, context)
        sig = jax.nn.sigmoid(x)
        bpp = (
            -ll / (d * math.log(2))
            - math.log2(1 - 2 * alpha)
            + 8
            + jnp.sum(jnp.log2(sig) + jnp.log2(1 - sig), axis=-1) / d
        )
        return bpp, ll, z

    def invert(self, params, z, iters=10, context=None, method="bisection", **kw):
        """Inverse transform, blocks in reverse with matching reversals
        (`UMNNMAFFlow.py:78-90`).

        ``method``: "bisection" (the reference's gridded bracket refinement,
        dimension-sequential) or "newton" (parallel Jacobi-Newton over all
        dimensions — see :meth:`UMNNMAF.invert_newton`; pass ``iters``~30).
        """
        z = self._rev(z)
        inv = (
            self.block.invert_newton if method == "newton" else self.block.invert
        )
        for p in reversed(params):
            z = inv(p, self._rev(z), iters, context, **kw)
        return z

    def sample(self, params, key, n, iters=10, context=None, method="bisection", **kw):
        z = jax.random.normal(key, (n, self.nb_in))
        return self.invert(params, z, iters, context, method=method, **kw)

    # --- Lipschitz controls (`UMNNMAFFlow.py:143-151`) ----------------------

    def compute_lipschitz(self, params, key, nb_iter=10):
        L = jnp.asarray(1.0)
        for i, p in enumerate(params):
            L = L * self.block.compute_lipschitz(p, jax.random.fold_in(key, i), nb_iter)
        return L

    def force_lipschitz(self, params, key, L=1.5):
        return [
            self.block.force_lipschitz(p, jax.random.fold_in(key, i), L)
            for i, p in enumerate(params)
        ]
