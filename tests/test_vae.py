"""VAE family tests: shapes, ELBO finiteness, flow log-det correctness
against autodiff, gated-conv geometry vs torch semantics, IWAE sanity.

The reference has zero vae_lib tests (SURVEY.md §4); these are new.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umnn_tpu.models.vae import VAE_FAMILIES
from umnn_tpu.models.vae.flows import (
    IAF,
    householder_orthogonalize,
    iterative_orthogonalize,
    planar_flow,
    sylvester_flow,
    triangular_sylvester_flow,
)
from umnn_tpu.models.vae.losses import binary_loss, calculate_loss_array

Z = 8
B = 2
X_SHAPE = (B, 1, 28, 28)


def _binary_batch(key):
    return (jax.random.uniform(key, X_SHAPE) > 0.5).astype(jnp.float32)


SMALL_KW = dict(z_size=Z)
FLOW_KW = {
    "no_flow": {},
    "planar": dict(num_flows=2),
    "orthogonal": dict(num_flows=2, num_ortho_vecs=4),
    "householder": dict(num_flows=2, num_householder=2),
    "triangular": dict(num_flows=2),
    "iaf": dict(num_flows=2, made_h_size=24),
    "MMAF": dict(
        num_flows=1,
        made_h_size=16,
        hidden_derivative=(16, 16),
        hidden_embedding=(32, 32),
        embedding_size=4,
        nb_steps=8,
    ),
}


@pytest.mark.parametrize("family", sorted(VAE_FAMILIES))
def test_vae_forward_and_elbo(family):
    model = VAE_FAMILIES[family](**SMALL_KW, **FLOW_KW[family])
    params = model.init(jax.random.PRNGKey(0))
    x = _binary_batch(jax.random.PRNGKey(1))
    outs = model.apply(params, x, jax.random.PRNGKey(2))
    x_mean, z_mu, z_var, ldj, z0, zk = outs
    assert x_mean.shape == X_SHAPE
    assert z_mu.shape == (B, Z) and z_var.shape == (B, Z)
    assert zk.shape == (B, Z)
    assert (np.asarray(z_var) > 0).all()
    loss, bce, kl = binary_loss(x_mean, x, z_mu, z_var, z0, zk, ldj)
    assert np.isfinite(float(loss))
    # per-sample arrays
    arr = calculate_loss_array(
        x_mean, x, z_mu, z_var, z0, zk, ldj, "binary", (1, 28, 28)
    )
    assert arr.shape == (B,)
    assert np.isfinite(np.asarray(arr)).all()


@pytest.mark.parametrize("family", ["planar", "triangular", "MMAF"])
def test_vae_grads_finite(family):
    model = VAE_FAMILIES[family](**SMALL_KW, **FLOW_KW[family])
    params = model.init(jax.random.PRNGKey(0))
    x = _binary_batch(jax.random.PRNGKey(1))

    def loss_fn(p):
        x_mean, z_mu, z_var, ldj, z0, zk = model.apply(p, x, jax.random.PRNGKey(2))
        return binary_loss(x_mean, x, z_mu, z_var, z0, zk, ldj)[0]

    g = jax.grad(loss_fn)(params)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        name = jax.tree_util.keystr(path)
        assert np.isfinite(np.asarray(leaf)).all(), name


def _logdet_vs_autodiff(flow_fn, z):
    """Compare claimed log|det J| against autodiff jacobian per-sample.

    ``flow_fn`` takes the FULL batch; per-sample jacobians are computed by
    keeping the other rows fixed (flows here act row-wise)."""
    _, ld = flow_fn(z)
    for b in range(z.shape[0]):

        def single(v):
            zb = z.at[b].set(v)
            return flow_fn(zb)[0][b]

        J = jax.jacobian(single)(z[b])
        _, logdet = np.linalg.slogdet(np.asarray(J))
        np.testing.assert_allclose(float(ld[b]), logdet, rtol=1e-3, atol=1e-4)


def test_planar_logdet_exact():
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 4)
    z = jax.random.normal(ks[0], (3, Z))
    u = jax.random.normal(ks[1], (3, Z, 1)) * 0.5
    w = jax.random.normal(ks[2], (3, 1, Z)) * 0.5
    b = jax.random.normal(ks[3], (3, 1, 1))
    _logdet_vs_autodiff(lambda v: planar_flow(v, u, w, b), z)


def test_triangular_sylvester_logdet_exact():
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 4)
    z = jax.random.normal(ks[0], (2, Z))
    triu = jnp.triu(jnp.ones((Z, Z)), k=1)
    d1 = jnp.tanh(jax.random.normal(ks[1], (2, Z)))
    d2 = jnp.tanh(jax.random.normal(ks[2], (2, Z)))
    full = jax.random.normal(ks[3], (2, Z, Z)) * 0.3
    r1 = full * triu + jnp.eye(Z) * d1[:, :, None]
    r2 = jnp.swapaxes(full, 1, 2) * triu + jnp.eye(Z) * d2[:, :, None]
    b = jax.random.normal(jax.random.PRNGKey(5), (2, 1, Z)) * 0.1
    for permute in (False, True):
        _logdet_vs_autodiff(
            lambda v: triangular_sylvester_flow(
                v, r1[: v.shape[0]], r2[: v.shape[0]], b[: v.shape[0]], permute
            ),
            z,
        )


def test_sylvester_logdet_exact_with_orthogonal_q():
    key = jax.random.PRNGKey(6)
    ks = jax.random.split(key, 5)
    m = 4
    z = jax.random.normal(ks[0], (2, Z))
    triu = jnp.triu(jnp.ones((m, m)), k=1)
    d1 = jnp.tanh(jax.random.normal(ks[1], (2, m)))
    d2 = jnp.tanh(jax.random.normal(ks[2], (2, m)))
    full = jax.random.normal(ks[3], (2, m, m)) * 0.3
    r1 = full * triu + jnp.eye(m) * d1[:, :, None]
    r2 = jnp.swapaxes(full, 1, 2) * triu + jnp.eye(m) * d2[:, :, None]
    q = jax.random.normal(ks[4], (2, Z * m))
    q_ortho = iterative_orthogonalize(q, Z, m)
    # orthogonality check: Q^T Q = I
    qtq = np.einsum("bzm,bzn->bmn", np.asarray(q_ortho), np.asarray(q_ortho))
    np.testing.assert_allclose(qtq, np.broadcast_to(np.eye(m), (2, m, m)), atol=1e-4)
    b = jax.random.normal(jax.random.PRNGKey(7), (2, 1, m)) * 0.1
    _logdet_vs_autodiff(
        lambda v: sylvester_flow(
            v, r1[: v.shape[0]], r2[: v.shape[0]], q_ortho[: v.shape[0]], b[: v.shape[0]]
        ),
        z,
    )


def test_householder_q_is_orthogonal():
    q = jax.random.normal(jax.random.PRNGKey(8), (3, 2 * Z))
    H = householder_orthogonalize(q, Z, 2)
    hth = np.einsum("bij,bik->bjk", np.asarray(H), np.asarray(H))
    np.testing.assert_allclose(hth, np.broadcast_to(np.eye(Z), (3, Z, Z)), atol=1e-5)


def test_iaf_logdet_exact_and_autoregressive():
    iaf = IAF(z_size=Z, num_flows=2, num_hidden=1, h_size=16)
    params = iaf.init(jax.random.PRNGKey(9))
    z = jax.random.normal(jax.random.PRNGKey(10), (2, Z))
    h = jax.random.normal(jax.random.PRNGKey(11), (2, 16))
    _logdet_vs_autodiff(lambda v: iaf.apply(params, v, h[: v.shape[0]]), z)


def test_mmaf_flow_logdet_matches_autodiff():
    from umnn_tpu.models.vae.flows import MMAF

    mmaf = MMAF(
        z_size=4,
        num_flows=1,
        h_size=6,
        hidden_derivative=(16, 16),
        hidden_embedding=(24, 24),
        embedding_size=4,
        nb_steps=12,
    )
    params = mmaf.init(jax.random.PRNGKey(12))
    z = jax.random.normal(jax.random.PRNGKey(13), (2, 4)) * 0.5
    h = jax.random.normal(jax.random.PRNGKey(14), (2, 6))

    z_k, ld = mmaf.apply(params, z, h)
    for b in range(2):
        J = np.asarray(
            jax.jacobian(lambda v: mmaf.apply(params, v[None], h[b : b + 1])[0][0])(z[b])
        )
        _, logdet = np.linalg.slogdet(J)
        np.testing.assert_allclose(float(ld[b]), logdet, rtol=2e-3, atol=2e-3)


def test_decoder_output_range_binary():
    model = VAE_FAMILIES["no_flow"](**SMALL_KW)
    params = model.init(jax.random.PRNGKey(15))
    z = jax.random.normal(jax.random.PRNGKey(16), (B, Z))
    x_mean = model.decode(params, z)
    assert x_mean.shape == X_SHAPE
    a = np.asarray(x_mean)
    assert (a >= 0).all() and (a <= 1).all()


def test_freyfaces_geometry():
    model = VAE_FAMILIES["no_flow"](z_size=Z, input_size=(1, 28, 20))
    params = model.init(jax.random.PRNGKey(17))
    x = (jax.random.uniform(jax.random.PRNGKey(18), (B, 1, 28, 20)) > 0.5).astype(
        jnp.float32
    )
    x_mean, *_ = model.apply(params, x, jax.random.PRNGKey(19))
    assert x_mean.shape == (B, 1, 28, 20)


def test_pixelcnn_mask_matches_reference_semantics():
    """build_pixelcnn_mask replicates `vae_lib/models/layers.py:168-193`."""
    from umnn_tpu.models.vae.layers import build_pixelcnn_mask

    for n_in, n_out, diag in [(4, 8, False), (4, 8, True), (8, 4, False), (8, 4, True)]:
        m = build_pixelcnn_mask(n_in, n_out, (3, 3), diag)
        assert m.shape == (n_out, n_in, 3, 3)
        # spatial half-plane before center fully blocked
        assert (m[:, :, 0, :] == 0).all() and (m[:, :, 1, 0] == 0).all()
        # rows at/after center (except center tap) fully open
        assert (m[:, :, 2, :] == 1).all() and (m[:, :, 1, 2] == 1).all()
        # center tap carries the k-block triangularity
        c = m[:, :, 1, 1]
        if n_out >= n_in:
            k = n_out // n_in
            for i in range(n_in):
                assert (c[i * k : (i + 1) * k, i + 1 :] == 0).all()
                assert (c[i * k : (i + 1) * k, i : i + 1] == (0 if diag else 1)).all()


def test_masked_conv2d_autoregressive():
    """Output channel block i must not depend on input channels > i (same pixel)."""
    import jax
    import jax.numpy as jnp
    from umnn_tpu.models.vae.layers import (
        build_pixelcnn_mask,
        masked_conv2d,
        masked_conv2d_init,
    )

    n_in, n_out = 3, 6
    p = masked_conv2d_init(jax.random.PRNGKey(0), n_in, n_out)
    mask = jnp.asarray(build_pixelcnn_mask(n_in, n_out, (3, 3), diagonal_zeros=True))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, n_in, 5, 5))
    y0 = masked_conv2d(p, mask, x)
    # perturb input channel 2 at the center pixel: outputs for blocks of
    # channels 0..1 at that pixel must not change (diagonal_zeros=True)
    x2 = x.at[:, 2, 2, 2].add(10.0)
    y1 = masked_conv2d(p, mask, x2)
    delta = jnp.abs(y1 - y0)[:, :, 2, 2]  # same-pixel deltas [B, n_out]
    k = n_out // n_in
    assert float(delta[:, : 2 * k].max()) < 1e-6  # blocks for ch<2 unaffected


def test_accum_train_step_matches_full_batch():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from umnn_tpu.training.loops import (
        make_accum_train_step,
        make_optimizer,
        make_train_step,
    )

    w0 = {"w": jnp.ones((4,))}

    def loss_fn(params, batch):
        return jnp.mean((batch @ params["w"][:, None]) ** 2)

    opt = make_optimizer("adam", lr=1e-2, weight_decay=0.0, grad_clip=None)
    batch = jnp.asarray(np.random.RandomState(0).randn(16, 4), jnp.float32)

    s_full = make_train_step(loss_fn, opt)
    s_acc = make_accum_train_step(loss_fn, opt, accum_steps=4)
    p1, o1, l1 = s_full(w0, opt.init(w0), batch)
    p2, o2, l2 = s_acc({"w": jnp.ones((4,))}, opt.init(w0), batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(p2["w"]), atol=1e-5)


def test_iwae_tightens_with_more_samples():
    """IWAE bound is monotone in S in expectation (Burda et al. 2016):
    with shared randomness, mean ll at S=64 should be >= ll at S=1 minus
    Monte-Carlo slack."""
    import jax
    import numpy as np
    from umnn_tpu.models.vae.iwae import calculate_likelihood
    from umnn_tpu.models.vae.vae import VAE

    model = VAE(z_size=4, input_size=(1, 28, 28), input_type="binary")
    params = model.init(jax.random.PRNGKey(0))
    x = (np.random.RandomState(1).rand(2, 1, 28, 28) > 0.5).astype(np.float32)
    ll_1, _ = calculate_likelihood(
        model, params, x, jax.random.PRNGKey(5), n_samples=8, minibatch=8
    )
    ll_64, _ = calculate_likelihood(
        model, params, x, jax.random.PRNGKey(5), n_samples=64, minibatch=16
    )
    assert ll_64 >= ll_1 - 2.0, (ll_1, ll_64)


def test_iwae_tail_chunk_mesh_divisibility():
    """The shrunken tail chunk must stay divisible by the mesh: n_data=3
    with data_chunk=2 and minibatch=2 on the 8-device mesh forces the
    c_pad padding path (2 rows -> 8); results are finite, deterministic,
    and per-datapoint."""
    import jax
    import numpy as np
    from umnn_tpu.models.vae.iwae import calculate_likelihood
    from umnn_tpu.models.vae.vae import VAE
    from umnn_tpu.parallel.mesh import data_mesh

    mesh = data_mesh(jax.devices("cpu")[:8])
    model = VAE(z_size=4, input_size=(1, 28, 28), input_type="binary")
    params = model.init(jax.random.PRNGKey(0))
    x = (np.random.RandomState(1).rand(3, 1, 28, 28) > 0.5).astype(np.float32)
    ll_a, per_a = calculate_likelihood(
        model, params, x, jax.random.PRNGKey(7), n_samples=4, minibatch=2,
        data_chunk=2, mesh=mesh,
    )
    ll_b, per_b = calculate_likelihood(
        model, params, x, jax.random.PRNGKey(7), n_samples=4, minibatch=2,
        data_chunk=2, mesh=mesh,
    )
    assert np.isfinite(per_a).all() and per_a.shape == (3,)
    np.testing.assert_array_equal(per_a, per_b)


def test_calculate_loss_returns_reference_bpd():
    """calculate_loss returns bpd: 0 for binary (`loss.py:245`), and
    loss/(prod(input_size)*ln2) for multinomial (`loss.py:249`). With
    uniform logits, a pixel-matching flat posterior/prior (kl=0 by
    construction below), the CE term is exactly 560*ln(256) nats ->
    rec bpd exactly 8.0 bits/dim."""
    import jax
    import jax.numpy as jnp

    from umnn_tpu.models.vae.losses import bits_per_dim, calculate_loss

    input_size = (1, 28, 20)
    n_pix = 28 * 20
    B, Z = 3, 4
    key = jax.random.PRNGKey(0)
    x = jnp.floor(jax.random.uniform(key, (B, *input_size)) * 256) / 255.0
    logits = jnp.zeros((B, 256, *input_size))  # uniform 256-way head
    # z0 == zk with matching diag-gaussian posterior == prior -> kl = 0
    z = jax.random.normal(jax.random.PRNGKey(1), (B, Z))
    z_mu, z_var = jnp.zeros((B, Z)), jnp.ones((B, Z))
    ldj = jnp.zeros((B,))

    loss, rec, kl, bpd = calculate_loss(
        logits, x, z_mu, z_var, z, z, ldj, "multinomial", input_size
    )
    assert float(kl) == pytest.approx(0.0, abs=1e-5)
    assert float(rec) == pytest.approx(n_pix * np.log(256.0), rel=1e-4)
    assert float(bpd) == pytest.approx(float(loss) / (n_pix * np.log(2.0)), rel=1e-6)
    assert float(bits_per_dim(rec, input_size)) == pytest.approx(8.0, rel=1e-4)

    # binary: bpd is exactly 0 like the reference
    xb = (x > 0.5).astype(jnp.float32)
    probs = jnp.full((B, *input_size), 0.5)
    _, _, _, bpd_b = calculate_loss(
        probs, xb, z_mu, z_var, z, z, ldj, "binary", input_size
    )
    assert float(bpd_b) == 0.0
