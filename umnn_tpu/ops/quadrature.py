"""Clenshaw-Curtis quadrature engine with a memory-efficient Leibniz-rule VJP.

This is the numerical core of the framework (reference semantics:
`models/UMNN/ParallelNeuralIntegral.py:14-123` and `NeuralIntegral.py:37-99`
in AWehenkel/UMNN). Everything here is a TPU-first redesign:

* quadrature nodes/weights are host-side numpy constants baked into the jit
  trace (or passed as padded runtime arrays so that a *single* compilation
  serves every step count — the reference recompiles its graph per
  ``nb_steps``);
* the integrand is evaluated on all nodes at once as one batched megabatch
  (the reference's "CCParallel" mode) so the MXU sees a single large matmul
  chain instead of ``N+1`` small launches;
* :func:`neural_integral` wraps the quadrature in ``jax.custom_vjp``
  implementing the Leibniz integral rule: the forward saves only
  ``(x0, x, h, params)`` and the backward reconstructs all gradients with one
  extra node sweep — the JAX analogue of the reference's
  ``torch.autograd.Function`` memory-efficient backward
  (`ParallelNeuralIntegral.py:97-123`).

The math
--------
With nodes ``t_i = cos(i*pi/N)`` (from +1 down to -1) and CC weights ``w_i``:

    I(x0, xT) = (xT - x0)/2 * sum_i w_i f(x0 + (xT - x0)(t_i + 1)/2, h)

Leibniz rule for the VJP with cotangent ``g``:

    dL/dxT  =  g * f(xT, h)
    dL/dx0  = -g * f(x0, h)
    dL/dθ   =  VJP_θ[f at all nodes] with per-node cotangent
               g * (xT - x0)/2 * w_i           (same for dL/dh, summed over i)

For ``inv_f=True`` the integrand is ``1/f`` (used for inverse transforms).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "cc_quadrature",
    "padded_cc_quadrature",
    "integrate",
    "integrate_sequential",
    "integrate_autodiff",
    "neural_integral",
]

# Integrand signature: f(params, x, h) -> f_values, operating on the last axis;
# arbitrary leading batch axes must broadcast (pure function of pytree params).
Integrand = Callable[[Any, jax.Array, jax.Array], jax.Array]

_cc_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def cc_quadrature(nb_steps: int) -> tuple[np.ndarray, np.ndarray]:
    """Nodes and weights of (N+1)-point Clenshaw-Curtis quadrature on [-1, 1].

    Nodes are the Chebyshev extrema ``t_i = cos(i*pi/N)``, ordered from +1 to
    -1 (matching the reference's convention, `ParallelNeuralIntegral.py:30`).
    Weights come from the cosine expansion of the even-moment integrals
    ``\\int_{-1}^{1} T_k(t) dt = 2/(1-k^2)`` (k even), with endpoint weights
    halved. Exact for polynomials of degree <= N.

    Returns float64 numpy arrays (cast at use sites); cached per step count.
    """
    if nb_steps < 1:
        raise ValueError(f"nb_steps must be >= 1, got {nb_steps}")
    if nb_steps in _cc_cache:
        return _cc_cache[nb_steps]
    n = nb_steps
    i = np.arange(n + 1)
    nodes = np.cos(i * np.pi / n)
    # Chebyshev moments: m_k = 2/(1-k^2) for even k, 0 for odd k. Both the
    # node sum and the coefficient sum are double-primed (first/last terms
    # halved) — the k=N halving is what makes the rule exactly interpolatory
    # (exact for degree <= N); the reference omits it
    # (`ParallelNeuralIntegral.py:24-28`), costing O(1/N^3) accuracy.
    k = i.astype(np.float64)
    with np.errstate(divide="ignore"):
        moments = np.where(i % 2 == 0, 2.0 / (1.0 - k**2), 0.0)
    moments[0] = 1.0  # half of 2/(1-0^2)
    if n % 2 == 0:
        moments[-1] *= 0.5
    cosmat = np.cos(np.outer(i, i) * np.pi / n) * (2.0 / n)
    weights = cosmat @ moments
    weights[0] *= 0.5
    weights[-1] *= 0.5
    _cc_cache[nb_steps] = (nodes, weights)
    return nodes, weights


_padded_cache: dict[tuple, tuple[jax.Array, jax.Array]] = {}


def padded_cc_quadrature(
    nb_steps: int, max_steps: int, dtype=jnp.float32
) -> tuple[jax.Array, jax.Array]:
    """CC nodes/weights zero-padded to a fixed length ``max_steps + 1``.

    Padding nodes repeat the last abscissa (-1) and carry zero weight, so a
    single jit compilation (shape ``max_steps + 1``) evaluates any step count
    — the fix for the reference's per-``nb_steps`` retracing in its
    randomized-steps training mode (`UCIExperiments.py:130-132`).

    The returned *device* arrays are cached per (nb_steps, max_steps, dtype):
    randomized-steps training calls this every batch, and a fresh
    host->device upload per step costs a full transfer round-trip.
    """
    key = (nb_steps, max_steps, jnp.dtype(dtype).name)
    if key in _padded_cache:
        return _padded_cache[key]
    nodes, weights = cc_quadrature(nb_steps)
    pad = max_steps - nb_steps
    if pad < 0:
        raise ValueError(f"max_steps {max_steps} < nb_steps {nb_steps}")
    nodes = np.concatenate([nodes, np.full(pad, nodes[-1])])
    weights = np.concatenate([weights, np.zeros(pad)])
    out = (jnp.asarray(nodes, dtype), jnp.asarray(weights, dtype))
    _padded_cache[key] = out
    return out


def _node_positions(x0: jax.Array, xT: jax.Array, nodes: jax.Array) -> jax.Array:
    """Map [-1,1] nodes onto [x0, xT]: shape [..., K, D] from [..., D]."""
    half = (xT - x0) * 0.5
    # t goes 1 -> -1, so positions go xT -> x0.
    return x0[..., None, :] + half[..., None, :] * (nodes[:, None] + 1.0)


def _eval_nodes(
    integrand: Integrand,
    params: Any,
    x0: jax.Array,
    xT: jax.Array,
    h: jax.Array,
    nodes: jax.Array,
    inv_f: bool,
) -> jax.Array:
    """Evaluate the integrand on every quadrature node in one megabatch.

    Returns ``f`` with shape [..., K, D]. The node axis is inserted as a
    leading batch axis of the integrand call so that XLA sees one large
    ``[B*K(*D), features]`` matmul chain (the reference's CCParallel
    megabatch, `ParallelNeuralIntegral.py:50-61`).
    """
    X = _node_positions(x0, xT, nodes)  # [..., K, D]
    K = X.shape[-2]
    h_b = jnp.broadcast_to(h[..., None, :], (*h.shape[:-1], K, h.shape[-1]))
    f = integrand(params, X, h_b)
    if inv_f:
        f = 1.0 / f
    return f


def integrate(
    integrand: Integrand,
    params: Any,
    x0: jax.Array,
    xT: jax.Array,
    h: jax.Array,
    nodes: jax.Array,
    weights: jax.Array,
    inv_f: bool = False,
) -> jax.Array:
    """Plain (differentiable-by-tracing) Clenshaw-Curtis quadrature.

    ``x0, xT: [..., D]``, ``h: [..., E]`` -> integral ``[..., D]``. This is the
    naive path — `jax.grad` through it differentiates the quadrature *sum*
    (storing all node activations). Training uses :func:`neural_integral`.
    """
    f = _eval_nodes(integrand, params, x0, xT, h, nodes, inv_f)
    z = jnp.einsum("...kd,k->...d", f, weights)
    return z * (xT - x0) * 0.5


def integrate_sequential(
    integrand: Integrand,
    params: Any,
    x0: jax.Array,
    xT: jax.Array,
    h: jax.Array,
    nodes: jax.Array,
    weights: jax.Array,
    inv_f: bool = False,
) -> jax.Array:
    """Node-sequential Clenshaw-Curtis quadrature (the reference's ``"CC"``
    solver, `NeuralIntegral.py:37-66`).

    One integrand call per node under ``lax.scan``: peak activation memory is
    O(batch) instead of O(batch * (N+1)), at (N+1)x more (pipelined) steps —
    the memory/launch tradeoff the reference exposes via ``solver="CC"``.
    Differentiable by tracing through the scan (gradients checkpoint per
    node); combine with :func:`neural_integral` is unnecessary since the scan
    already stores only per-node residuals.
    """
    half = (xT - x0) * 0.5

    def body(acc, node_w):
        t, w = node_w
        X = x0 + half * (t + 1.0)
        f = integrand(params, X, h)
        if inv_f:
            f = 1.0 / f
        return acc + w * f, None

    acc0 = jnp.zeros(jnp.broadcast_shapes(x0.shape, xT.shape), xT.dtype)
    acc, _ = jax.lax.scan(body, acc0, (nodes, weights))
    return acc * half


def integrate_autodiff(
    integrand: Integrand,
    params: Any,
    x0: jax.Array,
    xT: jax.Array,
    h: jax.Array,
    nb_steps: int,
    inv_f: bool = False,
    dtype=jnp.float32,
) -> jax.Array:
    """Convenience wrapper: naive differentiable quadrature at ``nb_steps``.

    Serves as the gradient *oracle* in tests (the reference never had one:
    its finite-difference checks live in `tests/test_numerical_validation.py`).
    """
    nodes, weights = cc_quadrature(nb_steps)
    return integrate(
        integrand,
        params,
        x0,
        xT,
        h,
        jnp.asarray(nodes, dtype),
        jnp.asarray(weights, dtype),
        inv_f,
    )


# ---------------------------------------------------------------------------
# Memory-efficient custom VJP (Leibniz rule)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 7))
def _neural_integral(
    integrand: Integrand,
    params: Any,
    x0: jax.Array,
    xT: jax.Array,
    h: jax.Array,
    nodes: jax.Array,
    weights: jax.Array,
    inv_f: bool,
) -> jax.Array:
    return integrate(integrand, params, x0, xT, h, nodes, weights, inv_f)


def _ni_fwd(integrand, params, x0, xT, h, nodes, weights, inv_f):
    z = integrate(integrand, params, x0, xT, h, nodes, weights, inv_f)
    # Residuals: inputs only — no activations. The backward re-sweeps the
    # nodes (reference: `ParallelNeuralIntegral.py:101-107` forward under
    # no_grad saving only (x0, x, h)).
    return z, (params, x0, xT, h, nodes, weights)


def _ni_bwd(integrand, inv_f, res, g):
    params, x0, xT, h, nodes, weights = res

    def f_ends(x):
        f = integrand(params, x, h)
        return (1.0 / f) if inv_f else f

    # Leibniz endpoint terms (`ParallelNeuralIntegral.py:117-123`).
    dxT = f_ends(xT) * g
    dx0 = -f_ends(x0) * g

    # Parameter / embedding cotangents: one VJP through the node megabatch
    # with per-node cotangent g * (xT-x0)/2 * w_i
    # (`ParallelNeuralIntegral.py:66-94`). Node positions are treated as
    # constants here — their x-dependence is exactly what the endpoint terms
    # account for.
    X = jax.lax.stop_gradient(_node_positions(x0, xT, nodes))
    K = X.shape[-2]

    def f_nodes(p, hh):
        hb = jnp.broadcast_to(hh[..., None, :], (*hh.shape[:-1], K, hh.shape[-1]))
        f = integrand(p, X, hb)
        return (1.0 / f) if inv_f else f

    ct = (g * (xT - x0) * 0.5)[..., None, :] * weights[:, None]
    _, vjp = jax.vjp(f_nodes, params, h)
    dparams, dh = vjp(ct)
    return (dparams, dx0, dxT, dh, jnp.zeros_like(nodes), jnp.zeros_like(weights))


_neural_integral.defvjp(_ni_fwd, _ni_bwd)


def neural_integral(
    integrand: Integrand,
    params: Any,
    x0: jax.Array,
    xT: jax.Array,
    h: jax.Array,
    nb_steps: int | None = None,
    *,
    nodes: jax.Array | None = None,
    weights: jax.Array | None = None,
    inv_f: bool = False,
    dtype=jnp.float32,
) -> jax.Array:
    """``∫_{x0}^{xT} f(t, h) dt`` with the memory-efficient Leibniz VJP.

    Either pass ``nb_steps`` (nodes baked in as constants) or explicit
    ``nodes``/``weights`` arrays (e.g. from :func:`padded_cc_quadrature` for
    retrace-free randomized step counts).
    """
    if nodes is None or weights is None:
        if nb_steps is None:
            raise ValueError("pass nb_steps or explicit nodes/weights")
        n, w = cc_quadrature(nb_steps)
        nodes = jnp.asarray(n, dtype)
        weights = jnp.asarray(w, dtype)
    return _neural_integral(integrand, params, x0, xT, h, nodes, weights, inv_f)
