"""End-to-end fit regression: train through the integral to y = x^3.

Reference archetype 3 (`tests/test_numerical_validation.py:182-316`): an
IntegrandNetwork trained so that its integral fits y = x^3 must reach
MSE < 0.1 — the bar the reference's release gate enforces. This exercises
the full loop: quadrature forward, Leibniz custom VJP, optimizer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from umnn_tpu.models.monotonic import MonotonicNN


def test_monotonic_fit_x_cubed():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-2.0, 2.0, (512, 1)), jnp.float32)
    h = jnp.zeros((512, 1), jnp.float32)  # unconditional: dummy h
    y = x**3

    model = MonotonicNN(in_d=2, hidden_layers=(64, 64), nb_steps=30, backend="xla")
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)
    state = opt.init(params)

    def loss_fn(p):
        pred = model.apply(p, x, h)
        return jnp.mean((pred - y) ** 2)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    mse = None
    for _ in range(400):
        params, state, mse = step(params, state)
    assert float(mse) < 0.1, float(mse)  # reference bar (`:269-275`)

    # and the fit is genuinely monotone in x (guaranteed by construction)
    xs = jnp.linspace(-2.0, 2.0, 101)[:, None]
    pred = model.apply(params, xs, jnp.zeros((101, 1)))
    assert np.all(np.diff(np.asarray(pred[:, 0])) > -1e-6)
