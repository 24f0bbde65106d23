"""Quadrature core tests: closed forms, convergence, custom-VJP correctness.

Mirrors the reference's test archetypes (`tests/test_numerical_validation.py`
in AWehenkel/UMNN): analytic integrands vs exact antiderivatives, gradient
checks vs finite differences — plus what the reference lacked: the custom
Leibniz VJP checked against `jax.grad` of the naive differentiable quadrature.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umnn_tpu.ops.quadrature import (
    cc_quadrature,
    integrate,
    integrate_autodiff,
    neural_integral,
    padded_cc_quadrature,
)


# --- analytic integrands (params unused or scalar) --------------------------


def f_poly(params, x, h):
    # f(x) = 1 + x^2  ->  F(x) = x + x^3/3
    del params, h
    return 1.0 + x**2


def F_poly(x):
    return x + x**3 / 3.0


def f_exp(params, x, h):
    del params, h
    return jnp.exp(x)


def f_param(params, x, h):
    # f(x) = a * x^2 + h   (params and h both enter)
    return params["a"] * x**2 + h


class TestWeights:
    def test_exactness_on_polynomials(self):
        # (N+1)-point CC is exact for polynomials of degree <= N
        nodes, weights = cc_quadrature(8)
        for deg in range(9):
            integral = np.sum(weights * nodes**deg)
            exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
            assert abs(integral - exact) < 1e-12, f"degree {deg}"

    def test_weights_sum_to_two(self):
        for n in (1, 2, 5, 20, 50, 101):
            _, w = cc_quadrature(n)
            assert abs(w.sum() - 2.0) < 1e-12

    def test_node_ordering_matches_reference_convention(self):
        # t_0 = +1, t_N = -1 (reference `ParallelNeuralIntegral.py:30`)
        nodes, _ = cc_quadrature(10)
        assert nodes[0] == pytest.approx(1.0)
        assert nodes[-1] == pytest.approx(-1.0)


class TestIntegrate:
    def test_closed_form_poly(self):
        x0 = jnp.array([[0.0, -1.0]])
        xT = jnp.array([[2.0, 3.0]])
        h = jnp.zeros((1, 2))
        z = integrate_autodiff(f_poly, None, x0, xT, h, nb_steps=20)
        exact = F_poly(xT) - F_poly(x0)
        np.testing.assert_allclose(z, exact, rtol=1e-5)

    def test_closed_form_exp(self):
        x0 = jnp.array([[-0.5]])
        xT = jnp.array([[1.5]])
        h = jnp.zeros((1, 1))
        z = integrate_autodiff(f_exp, None, x0, xT, h, nb_steps=30)
        exact = jnp.exp(xT) - jnp.exp(x0)
        np.testing.assert_allclose(z, exact, rtol=1e-5)

    def test_error_decreases_with_steps(self):
        x0 = jnp.full((1, 1), -2.0)
        xT = jnp.full((1, 1), 2.0)
        h = jnp.zeros((1, 1))
        exact = float(jnp.exp(xT[0, 0]) - jnp.exp(x0[0, 0]))
        errs = []
        for n in (2, 4, 8, 16):
            z = integrate_autodiff(f_exp, None, x0, xT, h, nb_steps=n)
            errs.append(abs(float(z[0, 0]) - exact))
        assert errs[-1] < 1e-5
        assert all(errs[i + 1] <= errs[i] + 1e-12 for i in range(len(errs) - 1))

    def test_final_error_below_reference_bar(self):
        # reference bar: abs err < 1e-4 at 200 steps
        # (`tests/test_numerical_validation.py:91-97`)
        x0 = jnp.full((1, 1), 0.0)
        xT = jnp.full((1, 1), 1.0)
        h = jnp.zeros((1, 1))
        z = integrate_autodiff(f_poly, None, x0, xT, h, nb_steps=200)
        assert abs(float(z[0, 0]) - float(F_poly(1.0))) < 1e-4

    def test_reversed_bounds_negate(self):
        x0 = jnp.array([[0.3]])
        xT = jnp.array([[1.7]])
        h = jnp.zeros((1, 1))
        a = integrate_autodiff(f_poly, None, x0, xT, h, nb_steps=16)
        b = integrate_autodiff(f_poly, None, xT, x0, h, nb_steps=16)
        np.testing.assert_allclose(a, -b, rtol=1e-6)

    def test_inv_f(self):
        # ∫ 1/(1+x^2) = arctan
        x0 = jnp.array([[0.0]])
        xT = jnp.array([[1.0]])
        h = jnp.zeros((1, 1))
        z = integrate_autodiff(f_poly, None, x0, xT, h, nb_steps=30, inv_f=True)
        np.testing.assert_allclose(float(z[0, 0]), np.arctan(1.0), rtol=1e-5)

    def test_padded_matches_unpadded(self):
        x0 = jnp.array([[0.0, -1.0]])
        xT = jnp.array([[2.0, 3.0]])
        h = jnp.zeros((1, 2))
        nodes, weights = padded_cc_quadrature(20, 64)
        z_pad = integrate(f_poly, None, x0, xT, h, nodes, weights)
        z = integrate_autodiff(f_poly, None, x0, xT, h, nb_steps=20)
        np.testing.assert_allclose(z_pad, z, rtol=1e-6)


class TestNeuralIntegralVJP:
    """Custom Leibniz VJP vs the autodiff oracle and finite differences."""

    def _setup(self):
        key = jax.random.PRNGKey(1)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        B, D = 4, 3
        params = {"a": jax.random.normal(k1, ()) ** 2 + 0.5}
        x0 = jax.random.normal(k2, (B, D)) * 0.3
        xT = x0 + jax.random.uniform(k3, (B, D), minval=0.5, maxval=2.0)
        h = jax.random.normal(k4, (B, D)) * 0.1 + 2.0  # keep f > 0
        return params, x0, xT, h

    def test_forward_matches_naive(self):
        params, x0, xT, h = self._setup()
        z1 = neural_integral(f_param, params, x0, xT, h, nb_steps=24)
        z2 = integrate_autodiff(f_param, params, x0, xT, h, nb_steps=24)
        np.testing.assert_allclose(z1, z2, rtol=1e-6)

    def test_grads_match_autodiff_oracle(self):
        params, x0, xT, h = self._setup()

        def loss_custom(p, a, b, hh):
            return jnp.sum(jnp.sin(neural_integral(f_param, p, a, b, hh, nb_steps=40)))

        def loss_naive(p, a, b, hh):
            return jnp.sum(
                jnp.sin(integrate_autodiff(f_param, p, a, b, hh, nb_steps=40))
            )

        g1 = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(params, x0, xT, h)
        g2 = jax.grad(loss_naive, argnums=(0, 1, 2, 3))(params, x0, xT, h)
        # params and h grads agree to quadrature-exactness (integrand is
        # polynomial in x -> both exact); endpoint grads: Leibniz gives the
        # exact f(x), autodiff differentiates the (here exact) quadrature.
        np.testing.assert_allclose(g1[0]["a"], g2[0]["a"], rtol=1e-4)
        np.testing.assert_allclose(g1[1], g2[1], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(g1[2], g2[2], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(g1[3], g2[3], rtol=1e-4, atol=1e-5)

    def test_endpoint_grad_is_exact_leibniz(self):
        params, x0, xT, h = self._setup()

        def loss(b):
            return jnp.sum(neural_integral(f_param, params, x0, b, h, nb_steps=20))

        g = jax.grad(loss)(xT)
        np.testing.assert_allclose(g, f_param(params, xT, h), rtol=1e-5)

        def loss0(a):
            return jnp.sum(neural_integral(f_param, params, a, xT, h, nb_steps=20))

        g0 = jax.grad(loss0)(x0)
        np.testing.assert_allclose(g0, -f_param(params, x0, h), rtol=1e-5)

    def test_grads_vs_finite_differences(self):
        params, x0, xT, h = self._setup()

        def loss(p):
            return float(
                jnp.sum(neural_integral(f_param, p, x0, xT, h, nb_steps=30))
            )

        g = jax.grad(
            lambda p: jnp.sum(neural_integral(f_param, p, x0, xT, h, nb_steps=30))
        )(params)
        eps = 1e-3
        fd = (
            loss({"a": params["a"] + eps}) - loss({"a": params["a"] - eps})
        ) / (2 * eps)
        np.testing.assert_allclose(float(g["a"]), fd, rtol=1e-2)

    def test_mlp_integrand_grads_match_oracle(self):
        """The real case: an MLP integrand with pytree params."""
        from umnn_tpu.nn.core import ACTIVATIONS, mlp_apply, mlp_init

        key = jax.random.PRNGKey(7)
        kp, kx, kh = jax.random.split(key, 3)
        B, D, E = 8, 1, 4
        layers = mlp_init(kp, [1 + E, 16, 16, 1])

        def integrand(p, x, hh):
            inp = jnp.concatenate([x, hh], axis=-1)
            out = mlp_apply(p, inp, ACTIVATIONS["ReLU"], ACTIVATIONS["ELUPlus"])
            return out  # [..., 1]

        x0 = jnp.zeros((B, D))
        xT = jax.random.uniform(kx, (B, D), minval=0.5, maxval=2.0)
        h = jax.random.normal(kh, (B, E))

        def loss_c(p):
            return jnp.sum(neural_integral(integrand, p, x0, xT, h, nb_steps=32) ** 2)

        def loss_n(p):
            return jnp.sum(
                integrate_autodiff(integrand, p, x0, xT, h, nb_steps=32) ** 2
            )

        g1 = jax.grad(loss_c)(layers)
        g2 = jax.grad(loss_n)(layers)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)

    def test_jit_and_vmap_compose(self):
        params, x0, xT, h = self._setup()
        fn = jax.jit(
            lambda p, a, b, hh: neural_integral(f_param, p, a, b, hh, nb_steps=16)
        )
        z = fn(params, x0, xT, h)
        z2 = integrate_autodiff(f_param, params, x0, xT, h, nb_steps=16)
        np.testing.assert_allclose(z, z2, rtol=1e-6)
        # grad-of-jit
        g = jax.grad(lambda p: jnp.sum(fn(p, x0, xT, h)))(params)
        assert jnp.isfinite(g["a"])


class TestSequentialSolver:
    """integrate_sequential — the reference's low-memory "CC" solver
    (`NeuralIntegral.py:37-99`)."""

    def test_matches_parallel(self):
        from umnn_tpu.ops.quadrature import integrate_sequential

        n, w = cc_quadrature(40)
        nodes, weights = jnp.asarray(n, jnp.float32), jnp.asarray(w, jnp.float32)
        x0 = jnp.zeros((7, 3))
        xT = jnp.asarray(np.random.RandomState(0).randn(7, 3), jnp.float32)
        h = jnp.ones((7, 3))
        params = {"a": jnp.asarray(2.0)}
        z_seq = integrate_sequential(f_param, params, x0, xT, h, nodes, weights)
        z_par = integrate(f_param, params, x0, xT, h, nodes, weights)
        np.testing.assert_allclose(np.asarray(z_seq), np.asarray(z_par), atol=1e-5)

    def test_gradients_match_parallel(self):
        from umnn_tpu.ops.quadrature import integrate_sequential

        n, w = cc_quadrature(24)
        nodes, weights = jnp.asarray(n, jnp.float32), jnp.asarray(w, jnp.float32)
        x0 = jnp.zeros((5, 2))
        xT = jnp.asarray(np.random.RandomState(1).randn(5, 2), jnp.float32)
        h = jnp.full((5, 2), 0.3)

        def loss_seq(a, xT):
            return integrate_sequential(
                f_param, {"a": a}, x0, xT, h, nodes, weights
            ).sum()

        def loss_par(a, xT):
            return integrate(f_param, {"a": a}, x0, xT, h, nodes, weights).sum()

        ga, gx = jax.grad(loss_seq, argnums=(0, 1))(jnp.asarray(2.0), xT)
        ra, rx = jax.grad(loss_par, argnums=(0, 1))(jnp.asarray(2.0), xT)
        np.testing.assert_allclose(float(ga), float(ra), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-5)

    def test_umnn_maf_cc_solver(self):
        from umnn_tpu.models.umnn_maf import UMNNMAF

        cfg = dict(
            input_size=3,
            embedding_s=4,
            hidden_embedding=(16, 16),
            hidden_derivative=(16, 16),
            nb_steps=16,
        )
        m_par = UMNNMAF(solver="CCParallel", backend="xla", **cfg)
        m_seq = UMNNMAF(solver="CC", backend="xla", **cfg)
        params = m_par.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.RandomState(2).randn(9, 3), jnp.float32)
        z_par = m_par.forward(params, x)
        z_seq = m_seq.forward(params, x)
        np.testing.assert_allclose(np.asarray(z_seq), np.asarray(z_par), atol=1e-5)
