"""Likelihood-validity diagnostics for trained UMNN flows.

A UMNN-MAF log-density pairs an exact pointwise Jacobian term with a
Clenshaw-Curtis estimate of z = ∫ f — so a reported likelihood is only
meaningful while (a) the quadrature resolves the learned integrand and
(b) the network is numerically well-conditioned at the evaluation
precision. Round 4 captured an in-the-wild violation (PARITY_RUNS §2e):
a plateau-schedule ablation on bsds300 drove the flow into a regime
where the TPU's default bf16-input matmul passes moved its NLL by
±12-24 nats — with different sign for the XLA and Pallas backends — and
training logs reported NLL several nats *below* the entropy floor of
the data-generating process (impossible for a real normalized density).

This module is the library-level detector the reference has no
equivalent of (its torch pipeline evaluates in full f32 on GPU and
simply cannot observe the failure; `UCIExperiments.py:93-122` reports
whatever `compute_ll` returns). Script front-end:
``scripts/quad_probe.py``; eval-side mitigation for precision-fragile
models: ``jax.config.update("jax_default_matmul_precision", "highest")``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from umnn_tpu.ops.quadrature import padded_cc_quadrature


@dataclasses.dataclass(frozen=True)
class ValidityReport:
    """Per-check outcomes from :func:`density_validity_report`.

    ``nll``: mean NLL at the base node count (the number a driver would
    report). ``node_gap``: |NLL(max steps) − NLL(base steps)| — quadrature
    resolution error. ``bf16_gap``: |NLL(f32) − NLL(params+inputs rounded
    to bf16)| — sensitivity to the rounding the TPU MXU's default-precision
    matmul passes apply. ``n_nonfinite``: rows whose NLL is inf/nan at the
    base node count.
    """

    nll: float
    node_gap: float
    bf16_gap: float
    n_nonfinite: int
    rows: int

    def ok(self, node_tol: float = 0.05, bf16_tol: float = 1.0) -> bool:
        """Conservative pass/fail. Healthy parity-scale models measure
        node_gap < 1e-3 and bf16_gap < 0.6 nats; the captured degenerate
        model measured bf16_gap ≈ 19 nats (PARITY_RUNS §2e)."""
        return (
            self.n_nonfinite == 0
            and np.isfinite(self.nll)
            and self.node_gap < node_tol
            and self.bf16_gap < bf16_tol
        )


def _mean_nll(
    nll_fn: Callable, params: Any, x: jax.Array, steps: int, max_steps: int
) -> tuple[float, int]:
    nodes, weights = padded_cc_quadrature(steps, max_steps)
    v = np.asarray(nll_fn(params, x, nodes, weights))
    finite = np.isfinite(v)
    mean = float(v[finite].mean()) if finite.any() else float("nan")
    return mean, int((~finite).sum())


def density_validity_report(
    model: Any,
    params: Any,
    x: jax.Array,
    *,
    steps: int = 50,
    check_steps: int = 200,
    nll_fn: Optional[Callable] = None,
) -> ValidityReport:
    """Validate that ``model``'s reported likelihood on ``x`` is a real
    density estimate, not a quadrature/precision artifact.

    ``model`` needs ``compute_ll(params, x, nodes=..., weights=...)``
    (both ``UMNNMAF`` and ``UMNNMAFFlow`` qualify); pass ``nll_fn`` to
    override (signature ``(params, x, nodes, weights) -> per-row NLL``).

    Three checks, mirroring PARITY_RUNS §2e:

    * non-finite rows at the reporting node count;
    * node-convergence: rerun at ``check_steps`` (>= 4x is meaningful) —
      a resolved integrand moves < 1e-3 nats;
    * bf16-cast sensitivity: round params and inputs to bfloat16 (the
      rounding TPU default-precision matmuls apply to their inputs) and
      re-evaluate — a well-conditioned model moves well under a nat.
    """
    if nll_fn is None:
        def nll_fn(p, xb, nodes, weights):
            ll, _ = model.compute_ll(p, xb, nodes=nodes, weights=weights)
            return -ll
    nll_fn = jax.jit(nll_fn)

    max_steps = max(steps, check_steps)
    base, n_bad = _mean_nll(nll_fn, params, x, steps, max_steps)
    hi, _ = _mean_nll(nll_fn, params, x, check_steps, max_steps)

    cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jnp.asarray(a, jnp.bfloat16).astype(jnp.float32), t
    )
    b16, _ = _mean_nll(nll_fn, cast(params), cast(jnp.asarray(x)), steps, max_steps)

    return ValidityReport(
        nll=base,
        node_gap=abs(hi - base),
        bf16_gap=abs(b16 - base),
        n_nonfinite=n_bad,
        rows=int(np.shape(x)[0]),
    )
