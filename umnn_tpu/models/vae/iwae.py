"""IWAE importance-sampled log-likelihood, with the Monte-Carlo particle
axis sharded across the device mesh.

Reference semantics: `models/vae_lib/utils/log_likelihood.py:8-60` in
AWehenkel/UMNN — per datapoint, S samples (default 5000) evaluated in
minibatches of 500, ll = logsumexp(-loss_array) - log(S).

TPU-first redesign: instead of a Python double loop (datapoints x chunks),
one jitted step evaluates a [R, ...] block of replicated datapoints; the
particle axis rides the batch axis, so sharding the batch over the mesh
shards the particles (SURVEY.md §3.5 — the MC-particle axis is the eval
scaling axis).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from umnn_tpu.models.vae.losses import calculate_loss_array


def make_iwae_step(model, mesh=None):
    """Returns a jitted fn (params, x_rep [R,...], rng) -> per-replica loss [R]."""

    def step(params, x_rep, rng):
        outs = model.apply(params, x_rep, rng)
        x_mean, z_mu, z_var, ldj, z0, zk = outs
        return calculate_loss_array(
            x_mean, x_rep, z_mu, z_var, z0, zk, ldj,
            model.input_type, model.input_size,
        )

    if mesh is not None:
        from umnn_tpu.parallel.mesh import batch_sharded, replicated

        return jax.jit(
            step,
            in_shardings=(replicated(mesh), batch_sharded(mesh), replicated(mesh)),
            out_shardings=batch_sharded(mesh),
        )
    return jax.jit(step)


def calculate_likelihood(
    model,
    params,
    x_data: np.ndarray,
    rng: jax.Array,
    n_samples: int = 5000,
    minibatch: int = 500,
    mesh=None,
    verbose: bool = False,
) -> tuple[float, np.ndarray]:
    """Mean IWAE log-likelihood over a dataset (nats/datapoint)."""
    step = make_iwae_step(model, mesh)
    n_mb = max(n_samples // minibatch, 1)
    lls = []
    for i in range(x_data.shape[0]):
        x = jnp.asarray(x_data[i : i + 1])
        x_rep = jnp.repeat(x, minibatch, axis=0)
        losses = []
        for r in range(n_mb):
            rng, k = jax.random.split(rng)
            losses.append(np.asarray(step(params, x_rep, k)))
        a = -np.concatenate(losses)
        ll = float(jax.scipy.special.logsumexp(jnp.asarray(a)) - np.log(len(a)))
        lls.append(ll)
        if verbose and i % 10 == 0:
            print(f"iwae {i}/{x_data.shape[0]}: {np.mean(lls):.2f}")
    lls = np.asarray(lls)
    return float(lls.mean()), lls
