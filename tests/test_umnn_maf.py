"""UMNN-MAF block and flow tests: monotonicity, exact log-Jacobian vs
autodiff, autoregressive triangularity, ll correctness, inversion round-trip.

Covers what the reference never tested (SURVEY.md §4): multi-block stacks,
inversion accuracy, conditioning.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umnn_tpu.models.flow import UMNNMAFFlow
from umnn_tpu.models.umnn_maf import UMNNMAF

D = 3
SMALL = dict(
    embedding_s=4,
    hidden_embedding=(24, 24),
    hidden_derivative=(24, 24),
    nb_steps=20,
)


@pytest.fixture(scope="module")
def block():
    m = UMNNMAF(input_size=D, **SMALL)
    params = m.init(jax.random.PRNGKey(0))
    return m, params


@pytest.fixture(scope="module")
def flow():
    f = UMNNMAFFlow(nb_flow=2, nb_in=D, **SMALL)
    params = f.init(jax.random.PRNGKey(1))
    return f, params


def test_block_monotone_in_each_dim(block):
    m, params = block
    x = jax.random.normal(jax.random.PRNGKey(2), (5, D))
    eps = 0.05
    z = m.forward(params, x)
    for d in range(D):
        z2 = m.forward(params, x.at[:, d].add(eps))
        assert (np.asarray(z2[:, d]) > np.asarray(z[:, d])).all(), f"dim {d}"


def test_block_jacobian_triangular_and_log_jac_exact(block):
    m, params = block
    x = jax.random.normal(jax.random.PRNGKey(3), (D,)) * 0.5
    J = np.asarray(jax.jacobian(lambda v: m.forward(params, v))(x))
    # strictly lower-triangular transform: J upper triangle ~ 0
    assert np.abs(np.triu(J, k=1)).max() < 1e-5
    # diagonal matches the closed-form log-jac (integrand value at endpoint)
    lj = np.asarray(m.compute_log_jac(params, x))
    np.testing.assert_allclose(np.log(np.diag(J)), lj, rtol=1e-3, atol=1e-4)


def test_block_ll_matches_change_of_variables(block):
    m, params = block
    x = jax.random.normal(jax.random.PRNGKey(4), (2, D)) * 0.5
    ll, z = m.compute_ll(params, x)
    for b in range(2):
        J = np.asarray(jax.jacobian(lambda v: m.forward(params, v))(x[b]))
        logdet = np.log(np.abs(np.diag(J))).sum()
        lp = -0.5 * np.sum(np.log(2 * np.pi) + np.asarray(z[b]) ** 2)
        np.testing.assert_allclose(float(ll[b]), lp + logdet, rtol=2e-3, atol=1e-3)


def test_block_grads_flow_to_all_params(block):
    m, params = block
    x = jax.random.normal(jax.random.PRNGKey(5), (4, D))

    def loss(p):
        ll, _ = m.compute_ll(p, x)
        return -jnp.mean(ll)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves_with_path(g)
    for path, leaf in leaves:
        name = jax.tree_util.keystr(path)
        if "scaling" in name:
            np.testing.assert_array_equal(leaf, 0.0)  # frozen buffer
        else:
            assert np.isfinite(np.asarray(leaf)).all(), name
            assert np.abs(np.asarray(leaf)).sum() > 0, f"dead gradient at {name}"


def test_flow_ll_matches_change_of_variables(flow):
    f, params = flow
    x = jax.random.normal(jax.random.PRNGKey(6), (2, D)) * 0.5
    ll, z = f.compute_ll(params, x)
    z2 = f.forward(params, x)
    np.testing.assert_allclose(z, z2, rtol=1e-5, atol=1e-6)
    for b in range(2):
        J = np.asarray(jax.jacobian(lambda v: f.forward(params, v))(x[b]))
        _, logdet = np.linalg.slogdet(J)
        lp = -0.5 * np.sum(np.log(2 * np.pi) + np.asarray(z[b]) ** 2)
        np.testing.assert_allclose(float(ll[b]), lp + logdet, rtol=2e-3, atol=2e-3)


def test_flow_invert_roundtrip(flow):
    f, params = flow
    x = jax.random.normal(jax.random.PRNGKey(7), (4, D)) * 0.5
    z = f.forward(params, x)
    x_rec = f.invert(params, z, iters=12)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=5e-3)


def test_block_invert_roundtrip(block):
    m, params = block
    x = jax.random.normal(jax.random.PRNGKey(8), (4, D)) * 0.5
    z = m.forward(params, x)
    x_rec = m.invert(params, z, iters=12)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=5e-3)


def test_conditional_block_uses_context():
    m = UMNNMAF(input_size=D, cond_in=2, **SMALL)
    params = m.init(jax.random.PRNGKey(9))
    x = jax.random.normal(jax.random.PRNGKey(10), (3, D))
    c1 = jnp.zeros((3, 2))
    c2 = jnp.ones((3, 2))
    z1 = m.forward(params, x, context=c1)
    z2 = m.forward(params, x, context=c2)
    assert np.abs(np.asarray(z1 - z2)).max() > 1e-4


def test_padded_steps_match_exact(flow):
    from umnn_tpu.ops.quadrature import padded_cc_quadrature

    f, params = flow
    x = jax.random.normal(jax.random.PRNGKey(11), (3, D)) * 0.5
    nodes, weights = padded_cc_quadrature(20, 40)
    ll_pad, _ = f.compute_ll(params, x, nodes=nodes, weights=weights, nb_steps=None)
    ll, _ = f.compute_ll(params, x)
    np.testing.assert_allclose(ll_pad, ll, rtol=1e-5)


def test_jit_compiles_once_forward(flow):
    f, params = flow
    fn = jax.jit(lambda p, x: f.compute_ll(p, x)[0])
    x = jax.random.normal(jax.random.PRNGKey(12), (8, D))
    ll = fn(params, x)
    assert np.isfinite(np.asarray(ll)).all()


def test_newton_invert_roundtrip():
    """Parallel Jacobi-Newton inversion matches forward round-trip."""
    from umnn_tpu.models.umnn_maf import UMNNMAF

    m = UMNNMAF(
        input_size=6,
        embedding_s=4,
        hidden_embedding=(24, 24),
        hidden_derivative=(16, 16),
        nb_steps=16,
        backend="xla",
    )
    params = m.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(11, 6), jnp.float32)
    z = m.forward(params, x)
    x_rec = m.invert_newton(params, z, iters=40)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=2e-3)


def test_newton_invert_flow_level():
    from umnn_tpu.models.flow import UMNNMAFFlow

    f = UMNNMAFFlow(
        nb_flow=2,
        nb_in=4,
        hidden_embedding=(24, 24),
        hidden_derivative=(16, 16),
        embedding_s=4,
        nb_steps=16,
        backend="xla",
    )
    params = f.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.RandomState(1).randn(9, 4), jnp.float32)
    z = f.forward(params, x)
    x_rec = f.invert(params, z, iters=40, method="newton")
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=5e-3)
