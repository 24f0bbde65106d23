"""Fused Pallas integrand-kernel tests (interpret mode on the CPU backend).

The kernel is the TPU-native replacement for the reference's CCParallel
megabatch (`ParallelNeuralIntegral.py:37-80`); these tests pin it against
the pure-JAX quadrature oracle in both value and all four gradient paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umnn_tpu.nn.core import ACTIVATIONS, mlp_apply, mlp_init
from umnn_tpu.ops.integrand_kernel import fused_cc_integral
from umnn_tpu.ops.quadrature import cc_quadrature, integrate_autodiff

E = 4
NB = 12


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    layers = mlp_init(key, [1 + E, 16, 16, 1])
    ws = [l["w"] for l in layers]
    bs = [l["b"] for l in layers]
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 2), minval=0.3, maxval=1.5)
    h = jax.random.normal(jax.random.PRNGKey(2), (3, 2, E))
    n_np, w_np = cc_quadrature(NB)
    nodes = jnp.asarray(n_np, jnp.float32)
    ccw = jnp.asarray(w_np, jnp.float32)
    return layers, ws, bs, x, h, nodes, ccw


def oracle(layers, x, h, neg_slope=0.01):
    hidden = (lambda v: jax.nn.leaky_relu(v, neg_slope)) if neg_slope else ACTIVATIONS["ReLU"]

    def f(p, X, H):
        inp = jnp.concatenate([X, H], axis=-1)
        return mlp_apply(p, inp, hidden, ACTIVATIONS["ELUPlus"])

    xf = x.reshape(-1, 1)
    hf = h.reshape(-1, E)
    out = integrate_autodiff(f, layers, jnp.zeros_like(xf), xf, hf, nb_steps=NB)
    return out.reshape(x.shape)


def _pack_kwargs(pack):
    """Pin an explicit pack level (1 = unpacked) — auto-selection would
    otherwise route every eligible shape to pack4."""
    return dict(pack2=pack == 2, pack4=pack == 4)


@pytest.mark.parametrize("pack", [1, 2, 4])
def test_forward_matches_oracle(setup, pack):
    layers, ws, bs, x, h, nodes, ccw = setup
    z_k = fused_cc_integral(
        ws, bs, x, h, nodes, ccw, tile_r=8, interpret=True, **_pack_kwargs(pack)
    )
    z_o = oracle(layers, x, h)
    np.testing.assert_allclose(z_k, z_o, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "dw_mode,pack",
    [("per_layer", 1), ("batched", 1), ("per_layer", 2), ("per_layer", 4)],
)
def test_all_gradients_match_oracle(setup, dw_mode, pack):
    layers, ws, bs, x, h, nodes, ccw = setup

    def loss_k(ws, bs, x, h):
        return jnp.sum(
            jnp.sin(
                fused_cc_integral(
                    ws, bs, x, h, nodes, ccw, tile_r=8, interpret=True,
                    dw_mode=dw_mode, **_pack_kwargs(pack),
                )
            )
        )

    def loss_o(layers, x, h):
        return jnp.sum(jnp.sin(oracle(layers, x, h)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(ws, bs, x, h)
    go = jax.grad(loss_o, argnums=(0, 1, 2))(layers, x, h)
    for a, l in zip(gk[0], go[0]):
        np.testing.assert_allclose(a, l["w"], rtol=1e-4, atol=1e-6)
    for a, l in zip(gk[1], go[0]):
        np.testing.assert_allclose(a, l["b"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(gk[2], go[1], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(gk[3], go[2], rtol=1e-4, atol=1e-6)


def test_relu_slope_variant(setup):
    layers, ws, bs, x, h, nodes, ccw = setup
    z_k = fused_cc_integral(
        ws, bs, x, h, nodes, ccw, tile_r=8, interpret=True, neg_slope=0.0
    )
    z_o = oracle(layers, x, h, neg_slope=0.0)
    np.testing.assert_allclose(z_k, z_o, rtol=1e-5, atol=1e-6)


def test_negative_endpoints(setup):
    """x < 0 integrates backwards (z negative for positive integrand)."""
    layers, ws, bs, _, h, nodes, ccw = setup
    x = -jax.random.uniform(jax.random.PRNGKey(3), (3, 2), minval=0.3, maxval=1.5)
    z_k = fused_cc_integral(ws, bs, x, h, nodes, ccw, tile_r=8, interpret=True)
    z_o = oracle(layers, x, h)
    np.testing.assert_allclose(z_k, z_o, rtol=1e-5, atol=1e-6)
    assert (np.asarray(z_k) < 0).all()


def test_model_level_pallas_backend_matches_xla():
    """UMNNMAF with backend='pallas' (interpret on CPU) == backend='xla'."""
    from umnn_tpu.models.umnn_maf import UMNNMAF

    cfg = dict(
        input_size=3,
        embedding_s=4,
        hidden_embedding=(16, 16),
        hidden_derivative=(16, 16),
        nb_steps=8,
    )
    m_x = UMNNMAF(backend="xla", **cfg)
    m_p = UMNNMAF(backend="pallas", **cfg)
    params = m_x.init(jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 3)) * 0.5
    z_x = m_x.forward(params, x)
    z_p = m_p.forward(params, x)
    np.testing.assert_allclose(z_p, z_x, rtol=1e-5, atol=1e-6)

    gx = jax.grad(lambda p: -jnp.mean(m_x.compute_ll(p, x)[0]))(params)
    gp = jax.grad(lambda p: -jnp.mean(m_p.compute_ll(p, x)[0]))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5)


def test_dx_gradient_at_zero():
    """dz/dx at x=0 is f(0,h) > 0 — the VJP must not zero it (the old
    z/x product-term guard did)."""
    from umnn_tpu.nn.core import mlp_init
    from umnn_tpu.ops.integrand_kernel import fused_cc_integral
    from umnn_tpu.ops.quadrature import cc_quadrature

    e = 6
    layers = mlp_init(jax.random.PRNGKey(0), [1 + e, 16, 16, 1])
    ws = [l["w"] for l in layers]
    bs = [l["b"] for l in layers]
    n_np, w_np = cc_quadrature(20)
    nodes = jnp.asarray(n_np, jnp.float32)
    ccw = jnp.asarray(w_np, jnp.float32)
    x = jnp.asarray([[0.0, 1e-9, 0.5]], jnp.float32)
    h = jnp.ones((1, 3, e), jnp.float32)

    dx = jax.grad(lambda xx: fused_cc_integral(ws, bs, xx, h, nodes, ccw).sum())(x)
    # ELU+1 integrand is strictly positive everywhere
    assert float(dx.min()) > 0.1, f"vanishing gradient at x~0: {dx}"
    # and at x=0 it must equal f(0, h) exactly (both integral terms vanish)
    from umnn_tpu.nn.core import ACTIVATIONS, dense_apply

    rows = jnp.concatenate([jnp.zeros((1, 1)), h[0, 0][None]], axis=-1)
    act = ACTIVATIONS["LeakyReLU"]
    for l in layers[:-1]:
        rows = act(dense_apply(l, rows))
    f0 = ACTIVATIONS["ELUPlus"](dense_apply(layers[-1], rows))[0, 0]
    np.testing.assert_allclose(float(dx[0, 0]), float(f0), rtol=1e-4)


def test_single_layer_integrand_rejected():
    from umnn_tpu.nn.core import mlp_init
    from umnn_tpu.ops.integrand_kernel import fused_cc_integral
    from umnn_tpu.ops.quadrature import cc_quadrature

    layers = mlp_init(jax.random.PRNGKey(0), [4, 1])
    n_np, w_np = cc_quadrature(8)
    with pytest.raises(ValueError, match="hidden layer"):
        fused_cc_integral(
            [layers[0]["w"]],
            [layers[0]["b"]],
            jnp.ones((2, 1)),
            jnp.ones((2, 1, 3)),
            jnp.asarray(n_np, jnp.float32),
            jnp.asarray(w_np, jnp.float32),
        )


def test_pack2_applicability_rules():
    """pack2 activates only when every layer's block fits half the lanes."""
    from umnn_tpu.ops.integrand_kernel import _pack2_applicable

    def fake(sizes):
        k = jax.random.PRNGKey(0)
        ls = mlp_init(k, sizes)
        return [l["w"] for l in ls]

    assert _pack2_applicable(fake([31, 50, 50, 50, 50, 1]))  # UCI shape
    assert _pack2_applicable(fake([5, 16, 16, 1]))
    # MNIST shape: 100-wide first hidden exceeds 64 lanes
    assert not _pack2_applicable(fake([31, 100, 50, 50, 50, 50, 1]))
    # wide conditioning: 1+e > 64
    assert not _pack2_applicable(fake([65, 50, 1]))
    # no hidden layer
    assert not _pack2_applicable(fake([31, 1]))


def test_auto_backend_threshold_width_aware():
    """The auto crossover must reflect the measured width-dependent points
    (pack2-eligible 2560, width<=64 unpacked 12288, wide 4096)."""
    from umnn_tpu.models.umnn_maf import UMNNMAF

    def min_rows(hidden, e=30):
        return UMNNMAF(
            input_size=4, embedding_s=e, hidden_embedding=(8,),
            hidden_derivative=hidden, nb_steps=8,
        ).auto_min_rows()

    assert min_rows((50, 50)) == 2560  # pack2-eligible
    assert min_rows((50, 50), e=80) == 12288  # conditioning too wide to pack
    assert min_rows((100, 50)) == 4096  # wide integrand


def test_pack4_applicability_rules():
    """pack4 activates only when every layer's block fits a QUARTER of the
    lanes (toy/monotonic shapes); wider shapes fall back to pack2/unpacked."""
    from umnn_tpu.ops.integrand_kernel import _pack4_applicable

    def fake(sizes):
        return [jnp.zeros((a, b)) for a, b in zip(sizes[:-1], sizes[1:])]

    assert _pack4_applicable(fake([5, 16, 16, 1]))   # test/toy shape
    assert _pack4_applicable(fake([31, 32, 32, 1]))  # boundary
    assert not _pack4_applicable(fake([33, 32, 32, 1]))  # 1+e too wide
    assert not _pack4_applicable(fake([31, 50, 50, 50, 50, 1]))  # UCI: pack2 only
    assert not _pack4_applicable(fake([5, 1]))  # no hidden layer


def test_pack4_odd_node_counts(setup):
    """K not divisible by 4: zero-weight padding groups must not change the
    integral (K=13 -> 16 slots; K=51 -> 52)."""
    layers, ws, bs, x, h, _, _ = setup
    for nb in (12, 50):  # K = nb + 1
        n_np, w_np = cc_quadrature(nb)
        nodes = jnp.asarray(n_np, jnp.float32)
        ccw = jnp.asarray(w_np, jnp.float32)
        zp = fused_cc_integral(
            ws, bs, x, h, nodes, ccw, tile_r=8, interpret=True, pack4=True
        )
        zu = fused_cc_integral(
            ws, bs, x, h, nodes, ccw, tile_r=8, interpret=True,
            pack2=False, pack4=False,
        )
        np.testing.assert_allclose(zp, zu, rtol=1e-5, atol=1e-6)
