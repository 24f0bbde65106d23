"""UMNN-MAF: autoregressive monotone flow block and integrand networks.

Reference semantics: `models/UMNN/UMNNMAF.py` in AWehenkel/UMNN. One block
computes the strictly-monotone autoregressive transform

    z_d = exp(s_d) * ( ∫_0^{x_d} f_d(t, h_d(x_{<d})) dt + z0_d )

where ``h = MADE(x)`` is the autoregressive embedding (its first D-block
doubles as the additive offset ``z0``, `UMNNMAF.py:80`), the integrands
``f_d`` are D tiny MLPs with *shared weights* evaluated as one folded matmul
(`UMNNMAF.py:263-284`), and ``s`` is a frozen per-dimension scaling
(`UMNNMAF.py:53`). The exact log-Jacobian is ``log f_d(x_d, h_d) + s_d``
(diagonal, because the transform is autoregressive; `UMNNMAF.py:136-139`).

TPU-first design notes
----------------------
* There is no autograd.Function / jit-mode dispatch (`UMNNMAF.py:85-132`):
  ``jax.custom_vjp`` covers training and inference under one `jax.jit`.
* The D-fold "megabatch" is expressed as a batched matmul
  ``[..., D, 1+e] @ [1+e, H]`` — XLA folds all leading axes (batch x
  quadrature-node x dim) into a single MXU sweep.
* Inversion is a fixed-shape gridded bisection under ``lax.fori_loop`` over
  dimensions (`UMNNMAF.py:182-232` uses data-dependent indexing; here it is
  masked argmin arithmetic that compiles once).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from umnn_tpu.nn.core import ACTIVATIONS, Params, dense_apply, mlp_init
from umnn_tpu.nn.made import MADE, ConditionalMADE
from umnn_tpu.ops.integrand_kernel import fused_cc_integral, pallas_available
from umnn_tpu.ops.quadrature import (
    cc_quadrature,
    integrate,
    integrate_sequential,
    neural_integral,
)

__all__ = ["IntegrandNetwork", "EmbeddingNetwork", "UMNNMAF"]


def _power_iteration_sigma(w: jax.Array, key: jax.Array, nb_iter: int = 10) -> jax.Array:
    """Estimate the spectral norm of a dense weight via power iteration
    (`UMNNMAF.py:26-34`)."""
    x = jax.random.normal(key, (w.shape[1], 1), w.dtype)

    def body(_, v):
        v = w.T @ (w @ v)
        return v / jnp.linalg.norm(v)

    x = jax.lax.fori_loop(0, nb_iter, body, x)
    return jnp.sqrt(jnp.linalg.norm(w.T @ (w @ x)) / jnp.linalg.norm(x))


@dataclasses.dataclass(frozen=True)
class IntegrandNetwork:
    """D independent positive scalar integrands with shared MLP weights.

    ``apply``: ``x [..., D], h [..., D*e] -> f [..., D]`` with
    ``f_d = act(MLP([x_d, h[0*D+d], ..., h[(e-1)*D+d]]))``. Hidden
    activation LeakyReLU(0.01); output 'ELU' (ELU+1) or 'Sigmoid'
    (`UMNNMAF.py:19,246-254`).
    """

    nnets: int  # D
    nin: int  # features per net: 1 + embedding size
    hidden_sizes: tuple[int, ...]
    nout: int = 1
    act_func: str = "ELU"

    @property
    def out_act(self):
        return ACTIVATIONS["ELUPlus" if self.act_func == "ELU" else self.act_func]

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        sizes = [self.nin, *self.hidden_sizes, self.nout]
        return {"layers": mlp_init(key, sizes, dtype)}

    def fold_features(self, x: jax.Array, h: jax.Array) -> jax.Array:
        """[..., D] x [..., D*e] -> per-dim feature rows [..., D, 1+e].

        Embedding layout contract: ``h[..., k*D + d]`` is the k-th feature of
        dim d (`UMNNMAF.py:276-284` reshape semantics).
        """
        D = self.nnets
        e = h.shape[-1] // D
        h_dm = jnp.moveaxis(h.reshape(*h.shape[:-1], e, D), -1, -2)  # [..., D, e]
        return jnp.concatenate([x[..., None], h_dm], axis=-1)

    def _mlp(self, params: Params, rows: jax.Array) -> jax.Array:
        act = ACTIVATIONS["LeakyReLU"]
        for p in params["layers"][:-1]:
            rows = act(dense_apply(p, rows))
        return self.out_act(dense_apply(params["layers"][-1], rows))

    def apply(self, params: Params, x: jax.Array, h: jax.Array) -> jax.Array:
        rows = self.fold_features(x, h)  # [..., D, 1+e]
        return self._mlp(params, rows)[..., 0]  # [..., D]

    def independent_forward(self, params: Params, xh: jax.Array) -> jax.Array:
        """Raw MLP on pre-concatenated rows [..., 1+e] -> [..., nout]
        (`UMNNMAF.py:286-287`, used by inversion)."""
        return self._mlp(params, xh)

    # --- Lipschitz control (`UMNNMAF.py:289-301`) ---------------------------

    def compute_lipschitz(self, params: Params, key: jax.Array, nb_iter: int = 10):
        L = jnp.asarray(1.0)
        for i, p in enumerate(params["layers"]):
            L = L * _power_iteration_sigma(
                p["w"].T, jax.random.fold_in(key, i), nb_iter
            )
        return L

    def force_lipschitz(self, params: Params, key: jax.Array, L: float = 1.5) -> Params:
        layers = []
        for i, p in enumerate(params["layers"]):
            sigma = _power_iteration_sigma(p["w"].T, jax.random.fold_in(key, i), 10)
            scale = jnp.maximum(sigma / L, 1.0)
            layers.append({"w": p["w"] / scale, "b": p["b"]})
        return {"layers": layers}


@dataclasses.dataclass(frozen=True)
class EmbeddingNetwork:
    """Conditioner pairing a (Conditional)MADE embedder with the integrand
    nets (`UMNNMAF.py:304-329`). Stateless: the reference caches
    ``m_embeding`` on the module; here `embed` simply returns it."""

    in_d: int
    hidden_embedding: tuple[int, ...]
    hidden_integrand: tuple[int, ...]
    out_made: int  # embedding size e per dimension
    cond_in: int = 0
    act_func: str = "ELU"

    def __post_init__(self):
        if self.cond_in > 0:
            made = ConditionalMADE(
                self.in_d,
                self.cond_in,
                self.hidden_embedding,
                (self.in_d + self.cond_in) * self.out_made,
                natural_ordering=True,
            )
        else:
            made = MADE(
                self.in_d,
                self.hidden_embedding,
                self.in_d * self.out_made,
                natural_ordering=True,
            )
        object.__setattr__(self, "made", made)
        object.__setattr__(
            self,
            "integrand",
            IntegrandNetwork(
                self.in_d, 1 + self.out_made, self.hidden_integrand, 1, self.act_func
            ),
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        km, ki = jax.random.split(key)
        return {
            "made": self.made.init(km, dtype),
            "integrand": self.integrand.init(ki, dtype),
        }

    def embed(
        self, params: Params, x: jax.Array, context: Optional[jax.Array] = None
    ) -> jax.Array:
        if self.cond_in > 0:
            if context is None:
                raise ValueError("conditional EmbeddingNetwork requires context")
            return self.made.apply(params["made"], x, context)
        return self.made.apply(params["made"], x)


@dataclasses.dataclass(frozen=True)
class UMNNMAF:
    """One autoregressive monotone flow block (`UMNNMAF.py:37-232`)."""

    input_size: int
    embedding_s: int = 20
    hidden_embedding: tuple[int, ...] = (50, 50, 50, 50)
    hidden_derivative: tuple[int, ...] = (50, 50, 50, 50)
    nb_steps: int = 50
    cond_in: int = 0
    act_func: str = "ELU"
    solver: str = "CCParallel"
    # "auto": on TPU, pick the fused Pallas kernel when the folded row count
    # B*D is large enough that the XLA megabatch VJP becomes HBM-bound.
    # The crossover depends on the integrand width (both pad to 128 lanes,
    # so Pallas cost is width-independent while XLA's grows with width):
    # scripts/backend_crossover.py measured ~12k rows at width 50 and
    # <=4k rows at width 100 (v5e, N=50). "xla"/"pallas" force a path.
    backend: str = "auto"
    # folded-row threshold for auto backend selection; None = width-aware
    # default from the measured crossovers above
    pallas_min_rows: int | None = None
    # fused-kernel tuning (see ops/integrand_kernel.py): rows per grid tile,
    # quadrature nodes folded per matmul M-block (None = all nodes in one
    # chunk when VMEM allows — measured fastest), dW contraction strategy
    pallas_tile_r: int = 128
    pallas_node_chunk: int | None = None
    pallas_dw_mode: str = "per_layer"
    # 2-node lane packing (None = auto when every layer fits 64 lanes)
    pallas_pack2: bool | None = None
    # 4-node lane packing (None = auto when every layer fits 32 lanes;
    # takes priority over pack2)
    pallas_pack4: bool | None = None

    def __post_init__(self):
        net = EmbeddingNetwork(
            self.input_size,
            tuple(self.hidden_embedding),
            tuple(self.hidden_derivative),
            self.embedding_s,
            self.cond_in,
            self.act_func,
        )
        object.__setattr__(self, "net", net)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return {
            "net": self.net.init(key, dtype),
            # frozen per-dim scaling (`UMNNMAF.py:53`): kept in the pytree,
            # gradient cut by stop_gradient at use sites.
            "scaling": jnp.zeros(self.input_size, dtype),
        }

    # --- core ---------------------------------------------------------------

    def auto_min_rows(self) -> int:
        """Folded-row count above which the fused kernel beats XLA.

        Measured crossovers (v5e, scripts/{pack2_ab,backend_crossover}.py):
        pack2-eligible shapes win from ~2.5k rows (0.607 vs 0.643 ms at the
        3000-row UCI parity config); unpacked width<=64 from ~12k; wide
        (>64, no packing but costlier XLA) from ~4k.
        """
        wide = max(self.hidden_derivative, default=0)
        if wide <= 64 and (1 + self.embedding_s) <= 64:
            return 2560
        return 12288 if wide <= 64 else 4096

    def _integrand_fn(self):
        integrand = self.net.integrand

        def f(p, x, h):
            return integrand.apply(p, x, h)

        return f

    def embed(self, params, x, context=None):
        return self.net.embed(params["net"], x, context)

    def _scale(self, params):
        return jnp.exp(jax.lax.stop_gradient(params["scaling"]))

    def forward_with_embedding(
        self,
        params: Params,
        x: jax.Array,
        h: jax.Array,
        nb_steps: Optional[int] = None,
        nodes: Optional[jax.Array] = None,
        weights: Optional[jax.Array] = None,
    ) -> jax.Array:
        z0 = h[..., : self.input_size]  # first embedding block (`UMNNMAF.py:80`)
        n_rows = int(np.prod(x.shape))
        min_rows = self.pallas_min_rows
        if min_rows is None:
            min_rows = self.auto_min_rows()
        use_pallas = self.solver == "CCParallel" and len(
            self.hidden_derivative
        ) >= 1 and (
            self.backend == "pallas"
            or (
                self.backend == "auto"
                and pallas_available()
                and n_rows >= min_rows
            )
        )
        if use_pallas and self.act_func == "ELU":
            if nodes is None or weights is None:
                n_np, w_np = cc_quadrature(nb_steps or self.nb_steps)
                nodes = jnp.asarray(n_np, x.dtype)
                weights = jnp.asarray(w_np, x.dtype)
            layers = params["net"]["integrand"]["layers"]
            e = self.embedding_s
            # per-dim feature layout: h[..., k*D + d] -> [..., D, e]
            h_dm = jnp.moveaxis(
                h.reshape(*h.shape[:-1], e, self.input_size), -1, -2
            )
            z = fused_cc_integral(
                [l["w"] for l in layers],
                [l["b"] for l in layers],
                x,
                h_dm,
                nodes,
                weights,
                neg_slope=0.01,
                tile_r=self.pallas_tile_r,
                node_chunk=self.pallas_node_chunk,
                dw_mode=self.pallas_dw_mode,
                pack2=self.pallas_pack2,
                pack4=self.pallas_pack4,
            )
        elif self.solver == "CC":
            # node-sequential low-memory path (`NeuralIntegral.py:37-99`)
            if nodes is None or weights is None:
                n_np, w_np = cc_quadrature(nb_steps or self.nb_steps)
                nodes = jnp.asarray(n_np, x.dtype)
                weights = jnp.asarray(w_np, x.dtype)
            z = integrate_sequential(
                self._integrand_fn(),
                params["net"]["integrand"],
                jnp.zeros_like(x),
                x,
                h,
                nodes,
                weights,
            )
        else:
            x0 = jnp.zeros_like(x)
            z = neural_integral(
                self._integrand_fn(),
                params["net"]["integrand"],
                x0,
                x,
                h,
                nb_steps=nb_steps or self.nb_steps,
                nodes=nodes,
                weights=weights,
            )
        return self._scale(params) * (z + z0)

    def forward(
        self,
        params: Params,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        nb_steps: Optional[int] = None,
        nodes: Optional[jax.Array] = None,
        weights: Optional[jax.Array] = None,
    ) -> jax.Array:
        h = self.embed(params, x, context)
        return self.forward_with_embedding(params, x, h, nb_steps, nodes, weights)

    def compute_log_jac(self, params, x, context=None):
        """Exact diagonal log-Jacobian: log f(x, h) + s (`UMNNMAF.py:136-139`)."""
        h = self.embed(params, x, context)
        jac = self.net.integrand.apply(params["net"]["integrand"], x, h)
        return jnp.log(jac + 1e-10) + jax.lax.stop_gradient(params["scaling"])

    def compute_log_jac_bis(self, params, x, context=None, **quad):
        h = self.embed(params, x, context)
        z = self.forward_with_embedding(params, x, h, **quad)
        jac = self.net.integrand.apply(params["net"]["integrand"], x, h)
        log_jac = jnp.log(jac + 1e-10) + jax.lax.stop_gradient(params["scaling"])
        return z, log_jac

    def compute_ll(self, params, x, context=None, **quad):
        z, log_jac = self.compute_log_jac_bis(params, x, context, **quad)
        z = jnp.clip(z, -10.0, 10.0)  # Gaussian-tail guard (`UMNNMAF.py:150`)
        log_prob_gauss = -0.5 * jnp.sum(jnp.log(2 * jnp.pi) + z**2, axis=-1)
        ll = log_prob_gauss + jnp.sum(log_jac, axis=-1)
        return ll, z

    def compute_bpp(self, params, x, alpha=1e-6, context=None):
        """Bits per pixel for logit-dequantized images (`UMNNMAF.py:164-170`,
        with the reference's `computeLL` typo fixed)."""
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

    # --- Lipschitz ----------------------------------------------------------

    def compute_lipschitz(self, params, key, nb_iter=10):
        return self.net.integrand.compute_lipschitz(
            params["net"]["integrand"], key, nb_iter
        )

    def force_lipschitz(self, params, key, L=1.5):
        new_int = self.net.integrand.force_lipschitz(
            params["net"]["integrand"], key, L
        )
        return {
            "net": {"made": params["net"]["made"], "integrand": new_int},
            "scaling": params["scaling"],
        }

    # --- inversion (`UMNNMAF.py:182-232`) -----------------------------------

    def invert_newton(
        self,
        params: Params,
        z: jax.Array,
        iters: int = 30,
        context: Optional[jax.Array] = None,
        x_bound: float = 50.0,
        damping: float = 1.0,
    ) -> jax.Array:
        """Parallel Jacobi-Newton inversion — all dimensions at once.

        TPU-native alternative to the reference's dimension-sequential
        bisection (`UMNNMAF.py:182-232`): iterate
        ``x <- x - (forward(x) - z) / J_diag(x)`` where the diagonal Jacobian
        ``J_diag = exp(s) * f(x, h)`` is available for free (the integrand is
        the derivative). For a triangular monotone map, dimension d is exact
        once dims < d have converged, so worst case is D iterations, but the
        sweep typically converges in 15-40 regardless of D (cf. Song et al.,
        arXiv 2002.03629 — parallel nonlinear-equation feedforward solving).
        Cost per iteration: one forward + one integrand eval over the full
        batch — for D=784 this is ~25x fewer integrand sweeps than the
        sequential bisection.
        """
        s = self._scale(params)

        def body(_, x):
            h = self.embed(params, x, context)
            zx = self.forward_with_embedding(params, x, h)
            jac = s * self.net.integrand.apply(params["net"]["integrand"], x, h)
            step = (zx - z) / jnp.maximum(jac, 1e-6)
            x = x - damping * step
            return jnp.clip(x, -x_bound, x_bound)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros_like(z))

    def invert(
        self,
        params: Params,
        z: jax.Array,
        iters: int = 10,
        context: Optional[jax.Array] = None,
        nb_candidates: int = 10,
        x_bound: float = 50.0,
    ) -> jax.Array:
        """Dimension-sequential gridded bisection.

        Per dimension j: re-embed with the partially inverted x (the
        autoregressive structure makes h_j depend only on x_{<j}), then
        refine a bracket by evaluating ``nb_candidates`` trial abscissae per
        round and shrinking around the argmin — accuracy about
        ``(2*x_bound/2) / nb_candidates^iters`` (reference claims
        25/100^iter for the 2-round interpretation, `UMNNMAFFlow.py:82`).
        All shapes static; compiles to one `lax.fori_loop` over D.
        """
        D = self.input_size
        e = self.embedding_s
        B = z.shape[0]
        grid = jnp.linspace(0.0, 1.0, nb_candidates)  # [C]
        s_all = self._scale(params)  # [D]
        nodes_np, weights_np = cc_quadrature(self.nb_steps)
        nodes = jnp.asarray(nodes_np, z.dtype)
        weights = jnp.asarray(weights_np, z.dtype)
        p_int = params["net"]["integrand"]
        integrand = self.net.integrand

        def f_scalar(p, xx, hh):
            # xx [..., 1], hh [..., e] -> [..., 1]
            return integrand.independent_forward(
                p, jnp.concatenate([xx, hh], axis=-1)
            )

        def dim_body(j, carry):
            x_inv = carry
            h = self.embed(params, x_inv, context)  # [B, D*e]
            # features of dim j: h[:, k*D + j], k = 0..e-1
            h_j = jax.lax.dynamic_slice_in_dim(
                h.reshape(B, e, D).transpose(0, 2, 1), j, 1, axis=1
            )[:, 0, :]  # [B, e]
            offset = h_j[:, 0:1]  # k=0 block is z0_j (`UMNNMAF.py:200`)
            s_j = jnp.take(s_all, j)
            z_j = jax.lax.dynamic_slice_in_dim(z, j, 1, axis=1)[:, 0]  # [B]

            def iter_body(i, lr):
                left, right = lr  # [B]
                xc = left[:, None] + grid[None, :] * (right - left)[:, None]  # [B,C]
                integral = integrate(
                    f_scalar,
                    p_int,
                    jnp.zeros((B, nb_candidates, 1), z.dtype),
                    xc[..., None],
                    jnp.broadcast_to(h_j[:, None, :], (B, nb_candidates, e)),
                    nodes,
                    weights,
                )[..., 0]  # [B, C]
                z_est = s_j * (offset + integral)  # [B, C]
                c_star = jnp.argmin(jnp.abs(z_est - z_j[:, None]), axis=1)  # [B]
                z_val = jnp.take_along_axis(z_est, c_star[:, None], axis=1)[:, 0]
                x_mid = jnp.take_along_axis(xc, c_star[:, None], axis=1)[:, 0]
                c_lo = jnp.clip(c_star - 1, 0, nb_candidates - 1)
                c_hi = jnp.clip(c_star + 1, 0, nb_candidates - 1)
                x_lo = jnp.take_along_axis(xc, c_lo[:, None], axis=1)[:, 0]
                x_hi = jnp.take_along_axis(xc, c_hi[:, None], axis=1)[:, 0]
                below = z_val < z_j  # monotone increasing transform
                new_left = jnp.where(below, x_mid, x_lo)
                new_right = jnp.where(below, x_hi, x_mid)
                return new_left, new_right

            left0 = jnp.full((B,), -x_bound, z.dtype)
            right0 = jnp.full((B,), x_bound, z.dtype)
            left, right = jax.lax.fori_loop(0, iters, iter_body, (left0, right0))
            x_j = 0.5 * (left + right)
            return jax.lax.dynamic_update_slice_in_dim(
                x_inv, x_j[:, None], j, axis=1
            )

        x_inv0 = jnp.zeros_like(z)
        return jax.lax.fori_loop(0, D, dim_body, x_inv0)
