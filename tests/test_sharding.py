"""SPMD sharding tests on the 8-virtual-device CPU mesh (conftest env).

What the reference never had (it is single-device throughout — SURVEY.md
§2 P5/P6): these check that the pjit-compiled train/eval/IWAE steps (a) run
sharded over a mesh, (b) produce the same numbers as the single-device path,
and (c) leave params/grads replicated while the batch axis is sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umnn_tpu.models.flow import UMNNMAFFlow
from umnn_tpu.parallel.mesh import (
    batch_sharded,
    data_mesh,
    replicated,
    shard_batch,
)
from umnn_tpu.training.loops import make_optimizer, make_train_step


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return data_mesh(jax.devices()[:8])


@pytest.fixture(scope="module")
def flow():
    return UMNNMAFFlow(
        nb_flow=2,
        nb_in=4,
        hidden_embedding=(32, 32),
        hidden_derivative=(16, 16),
        embedding_s=4,
        nb_steps=12,
        backend="xla",
    )


def test_train_step_sharded_matches_single_device(mesh, flow):
    params = flow.init(jax.random.PRNGKey(0))
    opt = make_optimizer("adam", lr=1e-3, weight_decay=0.0)

    def loss_fn(p, xb):
        ll, _ = flow.compute_ll(p, xb)
        return -jnp.mean(ll)

    batch = jnp.asarray(np.random.RandomState(0).randn(32, 4), jnp.float32)

    step_1d = make_train_step(loss_fn, opt)
    p1, o1, l1 = step_1d(params, opt.init(params), batch)

    params2 = flow.init(jax.random.PRNGKey(0))
    step_8d = make_train_step(loss_fn, opt, mesh)
    pr = jax.device_put(params2, replicated(mesh))
    orr = jax.device_put(opt.init(params2), replicated(mesh))
    xb = jax.device_put(batch, batch_sharded(mesh))
    p8, o8, l8 = step_8d(pr, orr, xb)

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_output_shardings(mesh, flow):
    params = flow.init(jax.random.PRNGKey(0))
    opt = make_optimizer("adam", lr=1e-3)

    def loss_fn(p, xb):
        ll, _ = flow.compute_ll(p, xb)
        return -jnp.mean(ll)

    step = make_train_step(loss_fn, opt, mesh)
    pr = jax.device_put(params, replicated(mesh))
    orr = jax.device_put(opt.init(params), replicated(mesh))
    xb = jax.device_put(
        jnp.asarray(np.random.RandomState(1).randn(16, 4), jnp.float32),
        batch_sharded(mesh),
    )
    assert len(xb.sharding.device_set) == 8  # batch actually distributed
    p8, _, _ = step(pr, orr, xb)
    leaf = jax.tree.leaves(p8)[0]
    assert leaf.sharding.is_fully_replicated  # params replicated after update


def test_shard_batch_helper(mesh):
    x = np.random.RandomState(2).randn(24, 4).astype(np.float32)
    xs = shard_batch(jnp.asarray(x), mesh)
    np.testing.assert_allclose(np.asarray(xs), x)
    assert len(xs.sharding.device_set) == 8


def test_iwae_sharded_matches_unsharded(mesh):
    from umnn_tpu.models.vae.vae import VAE

    model = VAE(
        z_size=4, input_size=(1, 28, 28), input_type="binary",
    )
    params = model.init(jax.random.PRNGKey(0))
    x = (np.random.RandomState(3).rand(2, 1, 28, 28) > 0.5).astype(np.float32)

    from umnn_tpu.models.vae.iwae import calculate_likelihood

    ll_1, _ = calculate_likelihood(
        model, params, x, jax.random.PRNGKey(7), n_samples=64, minibatch=16
    )
    ll_8, _ = calculate_likelihood(
        model, params, x, jax.random.PRNGKey(7), n_samples=64, minibatch=16,
        mesh=mesh,
    )
    np.testing.assert_allclose(ll_1, ll_8, rtol=1e-4)
