"""ELBO losses for the VAE family.

Reference semantics: `models/vae_lib/optimization/loss.py` in AWehenkel/UMNN.
Binary: BCE + beta * (log q(z0) - log p(zk) - ldj), batch-mean; multinomial:
256-way subpixel cross-entropy. ``*_loss_array`` variants return per-sample
losses for IWAE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from umnn_tpu.models.vae.distributions import (
    MAX_EPSILON,
    MIN_EPSILON,
    log_bernoulli,
    log_normal_diag,
    log_normal_standard,
)

NUM_CLASSES = 256


def _flat(x):
    return x.reshape(x.shape[0], -1)


def binary_loss(recon_x, x, z_mu, z_var, z0, zk, ldj, beta=1.0):
    """(loss, bce, kl), each batch-averaged (`loss.py:10-49`)."""
    B = x.shape[0]
    probs = jnp.clip(_flat(recon_x), MIN_EPSILON, MAX_EPSILON)
    bce = -jnp.sum(
        _flat(x) * jnp.log(probs) + (1 - _flat(x)) * jnp.log(1 - probs)
    )
    log_p_zk = log_normal_standard(zk)
    log_q_z0 = log_normal_diag(z0, z_mu, jnp.log(z_var))
    summed_logs = jnp.sum(log_q_z0 - log_p_zk)
    summed_ldj = jnp.sum(ldj)
    kl = summed_logs - summed_ldj
    loss = bce + beta * kl
    return loss / B, bce / B, kl / B


def multinomial_loss(x_logit, x, z_mu, z_var, z0, zk, ldj, input_size, beta=1.0):
    """256-way subpixel CE ELBO (`loss.py:52-97`). x in [0,1]."""
    B = x.shape[0]
    c, hh, ww = input_size
    logits = x_logit.reshape(B, NUM_CLASSES, c, hh, ww)
    target = (x * (NUM_CLASSES - 1)).astype(jnp.int32).reshape(B, c, hh, ww)
    logp = jax.nn.log_softmax(logits, axis=1)
    ce = -jnp.sum(
        jnp.take_along_axis(logp, target[:, None], axis=1)
    )
    log_p_zk = log_normal_standard(zk)
    log_q_z0 = log_normal_diag(z0, z_mu, jnp.log(z_var))
    kl = jnp.sum(log_q_z0 - log_p_zk) - jnp.sum(ldj)
    loss = ce + beta * kl
    return loss / B, ce / B, kl / B


def binary_loss_array(recon_x, x, z_mu, z_var, z0, zk, ldj, beta=1.0):
    """Per-sample ELBO for IWAE (`loss.py:100-123`)."""
    bce = -log_bernoulli(_flat(x), _flat(recon_x))
    log_p_zk = log_normal_standard(zk)
    log_q_z0 = log_normal_diag(z0, z_mu, jnp.log(z_var))
    return bce + beta * (log_q_z0 - log_p_zk - ldj)


def multinomial_loss_array(x_logit, x, z_mu, z_var, z0, zk, ldj, input_size, beta=1.0):
    B = x.shape[0]
    c, hh, ww = input_size
    logits = x_logit.reshape(B, NUM_CLASSES, c, hh, ww)
    target = (x * (NUM_CLASSES - 1)).astype(jnp.int32).reshape(B, c, hh, ww)
    logp = jax.nn.log_softmax(logits, axis=1)
    ce = -jnp.sum(
        jnp.take_along_axis(logp, target[:, None], axis=1).reshape(B, -1), axis=1
    )
    log_p_zk = log_normal_standard(zk)
    log_q_z0 = log_normal_diag(z0, z_mu, jnp.log(z_var))
    return ce + beta * (log_q_z0 - log_p_zk - ldj)


def bits_per_dim(nats: jax.Array | float, input_size) -> jax.Array | float:
    """nats -> bits/dim over the image: ``nats / (prod(input_size) * ln 2)``
    (`loss.py:249`, `training.py:157-158`, `log_likelihood.py:53-54`)."""
    import math

    import numpy as np

    return nats / (float(np.prod(input_size)) * math.log(2.0))


def calculate_loss(x_mean, x, z_mu, z_var, z0, zk, ldj, input_type, input_size, beta=1.0):
    """Dispatcher -> (loss, rec, kl, bpd) (`loss.py:238-254`).

    ``bpd`` is the reference's multinomial bits-per-dim of the full ELBO
    (``loss / (prod(input_size) * ln 2)``, `loss.py:249`); 0.0 for binary
    inputs exactly like the reference (`loss.py:245`).
    """
    if input_type == "binary":
        loss, rec, kl = binary_loss(x_mean, x, z_mu, z_var, z0, zk, ldj, beta)
        bpd = jnp.zeros(())
    else:
        loss, rec, kl = multinomial_loss(
            x_mean, x, z_mu, z_var, z0, zk, ldj, input_size, beta
        )
        bpd = bits_per_dim(loss, input_size)
    return loss, rec, kl, bpd


def calculate_loss_array(x_mean, x, z_mu, z_var, z0, zk, ldj, input_type, input_size):
    """Per-sample dispatcher (`loss.py:257-271`)."""
    if input_type == "binary":
        return binary_loss_array(x_mean, x, z_mu, z_var, z0, zk, ldj)
    return multinomial_loss_array(x_mean, x, z_mu, z_var, z0, zk, ldj, input_size)
