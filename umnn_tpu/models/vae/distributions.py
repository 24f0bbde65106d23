"""Log-density primitives for the VAE stack.

Reference semantics: `models/vae_lib/utils/distributions.py:18-65` in
AWehenkel/UMNN. Note `log_normal_diag` and `log_normal_standard` drop the
constant -0.5*log(2*pi) term (they are used only in differences/ELBOs where
it cancels); `log_normal_normalized` keeps it.
"""

from __future__ import annotations

import jax.numpy as jnp

MIN_EPSILON = 1e-5
MAX_EPSILON = 1.0 - 1e-5


def log_normal_diag(x, mean, log_var, reduce_dim=-1):
    log_norm = -0.5 * (log_var + (x - mean) ** 2 * jnp.exp(-log_var))
    return jnp.sum(log_norm, axis=reduce_dim)


def log_normal_normalized(x, mean, log_var, reduce_dim=-1):
    log_norm = (
        -((x - mean) ** 2) / (2.0 * jnp.exp(log_var))
        - 0.5 * log_var
        - 0.5 * jnp.log(2.0 * jnp.pi)
    )
    return jnp.sum(log_norm, axis=reduce_dim)


def log_normal_standard(x, reduce_dim=-1):
    return jnp.sum(-0.5 * x * x, axis=reduce_dim)


def log_bernoulli(x, mean, reduce_dim=-1):
    probs = jnp.clip(mean, MIN_EPSILON, MAX_EPSILON)
    log_bern = x * jnp.log(probs) + (1.0 - x) * jnp.log(1.0 - probs)
    return jnp.sum(log_bern, axis=reduce_dim)
