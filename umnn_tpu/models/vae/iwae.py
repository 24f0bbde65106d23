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
from umnn_tpu.training.loops import retry_transient


def make_iwae_step(model, mesh=None, apply_kwargs: Optional[dict] = None):
    """Returns a jitted fn (params, x_rep [R,...], rng) -> per-replica loss [R].

    ``apply_kwargs`` is closed over the jitted step — e.g. MMAF evaluation
    nodes/weights at 100 quadrature steps (`training.py:91-94,169-170`
    forces nb_steps=100 for MMAF validation/test, including the final IWAE).
    """

    def step(params, x_rep, rng):
        outs = model.apply(params, x_rep, rng, **(apply_kwargs or {}))
        x_mean, z_mu, z_var, ldj, z0, zk = outs
        return calculate_loss_array(
            x_mean, x_rep, z_mu, z_var, z0, zk, ldj,
            model.input_type, model.input_size,
        )

    if mesh is not None:
        from umnn_tpu.parallel.mesh import batch_sharded, replicated

        return retry_transient(jax.jit(
            step,
            in_shardings=(replicated(mesh), batch_sharded(mesh), replicated(mesh)),
            out_shardings=batch_sharded(mesh),
        ))
    return retry_transient(jax.jit(step))


def calculate_likelihood(
    model,
    params,
    x_data: np.ndarray,
    rng: jax.Array,
    n_samples: int = 5000,
    minibatch: int = 500,
    mesh=None,
    verbose: bool = False,
    data_chunk: int | None = None,
    apply_kwargs: Optional[dict] = None,
) -> tuple[float, np.ndarray]:
    """Mean IWAE log-likelihood over a dataset (nats/datapoint).

    Unlike the reference's per-datapoint Python loop
    (`log_likelihood.py:20-43`), ``data_chunk`` datapoints ride each device
    call (each repeated ``minibatch`` times along the batch axis), so the
    launch count drops by ``data_chunk``x — per-call dispatch dominates
    wall time on remote-device links. Per-datapoint logsumexp semantics are
    identical.

    The final partial chunk runs at its own (smaller) shape — one extra
    compilation instead of computing-then-discarding padded rows (up to
    (data_chunk-1)/data_chunk of the device work for small eval sets such
    as Freyfaces' 200-point test split).
    """
    n_data = x_data.shape[0]
    if data_chunk is None:
        data_chunk = max(4096 // minibatch, 1)
    data_chunk = min(data_chunk, n_data)
    step = make_iwae_step(model, mesh, apply_kwargs)
    n_mb = max(n_samples // minibatch, 1)
    lls = np.zeros(n_data)
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    for i0 in range(0, n_data, data_chunk):
        xc = np.asarray(x_data[i0 : i0 + data_chunk])
        c = xc.shape[0]
        # keep the sharded batch axis divisible by the mesh: pad the tail
        # chunk by at most (n_dev - 1) datapoints (vs data_chunk - 1 before)
        c_pad = c
        while (c_pad * minibatch) % n_dev:
            c_pad += 1
        if c_pad > c:
            xc = np.concatenate([xc, xc[:1].repeat(c_pad - c, axis=0)])
        # rows: datapoint-major [C*MB, ...] — row j*MB + r is particle r of
        # datapoint j
        x_rep = jnp.asarray(np.repeat(xc, minibatch, axis=0))
        parts = []
        for _ in range(n_mb):
            rng, k = jax.random.split(rng)
            parts.append(step(params, x_rep, k).reshape(c_pad, minibatch))
        a = -jnp.concatenate(parts, axis=1)  # [C_pad, S]
        ll_chunk = jax.scipy.special.logsumexp(a, axis=1) - jnp.log(a.shape[1])
        lls[i0 : i0 + c] = np.asarray(ll_chunk)[:c]
        if verbose:
            print(f"iwae {i0 + c}/{n_data}: {lls[: i0 + c].mean():.2f}")
    return float(lls.mean()), lls
