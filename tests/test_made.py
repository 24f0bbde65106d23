"""MADE tests: autoregressive property (Jacobian-based), layout contract,
Gaussian-MADE inversion, conditional stripping.

The reference only has an ad-hoc __main__ check (`made.py:195-239`); these
are the systematic versions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umnn_tpu.nn.made import MADE, ConditionalMADE, build_made_masks


def jacobian_dependency(fn, x):
    """Boolean [nout, nin] matrix: does output j depend on input i."""
    J = jax.jacobian(fn)(x)
    return np.abs(np.asarray(J)) > 1e-9


@pytest.mark.parametrize(
    "nin,hidden,nout",
    [
        (5, (32,), 5),
        (5, (32, 24), 5),
        (5, (32, 24), 10),
        (5, (64, 64), 15),
        (3, (16, 16, 16), 9),
    ],
)
def test_autoregressive_property(nin, hidden, nout):
    made = MADE(nin, hidden, nout)
    params = made.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (nin,))
    dep = jacobian_dependency(lambda v: made.apply(params, v), x)
    k = nout // nin
    for j in range(nout):
        d = j % nin  # output block layout: j = block*nin + d
        assert not dep[j, d:].any(), f"output {j} (dim {d}) sees inputs >= {d}"


def test_output_block_layout():
    """Output column k*nin + d must be the k-th feature of dim d: its
    dependency set is exactly x[:d] (for a wide enough net)."""
    nin, k = 4, 3
    made = MADE(nin, (64, 64), k * nin)
    params = made.init(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (nin,))
    dep = jacobian_dependency(lambda v: made.apply(params, v), x)
    for blk in range(k):
        for d in range(1, nin):  # d=0 depends on nothing
            j = blk * nin + d
            assert dep[j, :d].any(), f"output {j} should use some input < {d}"


def test_mask_degrees_match_reference_rule():
    # deterministic degrees: nin - 1 - (i % nin)  (`made.py:88-90`)
    masks, order = build_made_masks(3, (5,), 3)
    # hidden degrees: [2,1,0,2,1]; mask[i,j] = (input_degree_i <= hidden_degree_j)
    expect0 = (np.arange(3)[:, None] <= np.array([2, 1, 0, 2, 1])[None, :]).astype(
        np.float32
    )
    np.testing.assert_array_equal(masks[0], expect0)
    expect1 = (np.array([2, 1, 0, 2, 1])[:, None] < np.arange(3)[None, :]).astype(
        np.float32
    )
    np.testing.assert_array_equal(masks[1], expect1)
    np.testing.assert_array_equal(order, np.arange(3))


def test_gaussian_made_invert_roundtrip():
    nin = 6
    made = MADE(nin, (48, 48), 2 * nin)
    params = made.init(jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (7, nin))
    z = made.forward_gaussian(params, x)
    x_rec = made.invert(params, z)
    np.testing.assert_allclose(x_rec, x, rtol=1e-4, atol=1e-5)


def test_gaussian_made_ll_matches_change_of_variables():
    nin = 4
    made = MADE(nin, (32,), 2 * nin)
    params = made.init(jax.random.PRNGKey(6))
    x = jax.random.normal(jax.random.PRNGKey(7), (3, nin))
    ll, z = made.log_likelihood(params, x)
    # log|det J| = -sum(sigma); verify against autodiff jacobian per-sample
    for b in range(3):
        J = jax.jacobian(lambda v: made.forward_gaussian(params, v))(x[b])
        _, logdet = np.linalg.slogdet(np.asarray(J))
        lp = -0.5 * np.sum(np.log(2 * np.pi) + np.asarray(z[b]) ** 2)
        np.testing.assert_allclose(float(ll[b]), lp + logdet, rtol=1e-3)


def test_conditional_made_strips_context_columns():
    nin, cond, k = 4, 3, 2
    cm = ConditionalMADE(nin, cond, (32, 32), k * (nin + cond))
    params = cm.init(jax.random.PRNGKey(8))
    x = jax.random.normal(jax.random.PRNGKey(9), (5, nin))
    ctx = jax.random.normal(jax.random.PRNGKey(10), (5, cond))
    out = cm.apply(params, x, ctx)
    assert out.shape == (5, k * nin)
    assert cm.nout_cond == k * nin


def test_conditional_made_autoregressive_in_x_full_in_context():
    nin, cond = 4, 2
    cm = ConditionalMADE(nin, cond, (64, 64), 2 * (nin + cond))
    params = cm.init(jax.random.PRNGKey(11))
    x = jax.random.normal(jax.random.PRNGKey(12), (nin,))
    ctx = jax.random.normal(jax.random.PRNGKey(13), (cond,))
    dep_x = jacobian_dependency(lambda v: cm.apply(params, v, ctx), x)
    for j in range(dep_x.shape[0]):
        d = j % nin
        assert not dep_x[j, d:].any(), f"output {j} sees x[{d}:]"
    # every output may see the context (natural ordering puts context first)
    dep_c = jacobian_dependency(lambda c: cm.apply(params, x, c), ctx)
    # at least the later-dim outputs must actually use it
    assert dep_c[nin - 1].any()
