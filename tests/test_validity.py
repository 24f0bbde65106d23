"""Tests for the likelihood-validity diagnostics (PARITY_RUNS §2e).

A healthy trained-ish flow must pass all three checks (no non-finite
rows, node-converged, bf16-insensitive); a synthetically ill-conditioned
flow (weights blown up until the integrand is spiky) must show
quadrature/precision gaps orders of magnitude larger.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umnn_tpu.models.flow import UMNNMAFFlow
from umnn_tpu.utils.validity import density_validity_report


@pytest.fixture(scope="module")
def flow_and_data():
    flow = UMNNMAFFlow(
        nb_flow=2,
        nb_in=4,
        hidden_embedding=(24, 24),
        hidden_derivative=(16, 16),
        embedding_s=4,
        nb_steps=20,
        backend="xla",
    )
    params = flow.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.RandomState(0).randn(64, 4).astype(np.float32)
    )
    return flow, params, x


def test_healthy_model_passes(flow_and_data):
    flow, params, x = flow_and_data
    rep = density_validity_report(flow, params, x, steps=20, check_steps=100)
    assert rep.rows == 64
    assert rep.n_nonfinite == 0
    assert rep.node_gap < 0.05, rep
    assert rep.bf16_gap < 1.0, rep
    assert rep.ok()


def test_degenerate_model_flagged(flow_and_data):
    flow, params, x = flow_and_data
    # blow up every weight: the integrand becomes spiky (huge Lipschitz),
    # under-resolved at 20 nodes and precision-fragile — the §2e regime
    bad = jax.tree_util.tree_map(lambda a: a * 24.0, params)
    good = density_validity_report(flow, params, x, steps=20, check_steps=100)
    rep = density_validity_report(flow, bad, x, steps=20, check_steps=100)
    assert (
        rep.node_gap > max(10 * good.node_gap, 0.05)
        or rep.bf16_gap > max(10 * good.bf16_gap, 1.0)
        or rep.n_nonfinite > 0
    ), (good, rep)
    assert not rep.ok()


def test_custom_nll_fn(flow_and_data):
    flow, params, x = flow_and_data

    def nll_fn(p, xb, nodes, weights):
        ll, _ = flow.compute_ll(p, xb, nodes=nodes, weights=weights)
        return -ll

    rep = density_validity_report(None, params, x, nll_fn=nll_fn, steps=20)
    assert rep.ok()
