"""Tests for the reference training/eval semantics wired in round 2:
MMAF eval at nb_steps=100, randomized-steps padding equivalence, dynamic
binarization, per-step Lipschitz post_update hook.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from umnn_tpu.data.images import load_vae_dataset
from umnn_tpu.models.vae.vae import MMAVAE
from umnn_tpu.ops.quadrature import padded_cc_quadrature
from umnn_tpu.training.loops import make_optimizer, make_train_step

Z, HS = 4, 16


@pytest.fixture(scope="module")
def mmavae():
    model = MMAVAE(
        z_size=Z,
        input_size=(1, 28, 28),
        input_type="binary",
        num_flows=1,
        made_h_size=HS,
        hidden_derivative=(8, 8),
        hidden_embedding=(16,),
        embedding_size=4,
        nb_steps=20,
    )
    params = model.init(jax.random.PRNGKey(0))
    x = (jax.random.uniform(jax.random.PRNGKey(1), (3, 1, 28, 28)) > 0.5).astype(
        jnp.float32
    )
    return model, params, x


def test_mmaf_eval_steps_change_the_value(mmavae):
    """Evaluating at 100 quadrature steps (the `training.py:91-94` eval
    convention) must actually change the flow output vs the 20-step train
    count — guards train_vae's eval path against silently using the
    training step count (round-1 VERDICT missing item 2a)."""
    model, params, x = mmavae
    rng = jax.random.PRNGKey(2)
    n20, w20 = padded_cc_quadrature(20, 100)
    n100, w100 = padded_cc_quadrature(100, 100)
    out20 = model.apply(params, x, rng, nodes=n20, weights=w20)
    out100 = model.apply(params, x, rng, nodes=n100, weights=w100)
    # same reparam noise (same rng) -> differences come from quadrature only.
    # z_k is the integral output (the ldj of a 1-block flow is an endpoint
    # evaluation and does not depend on the quadrature at all).
    assert not np.allclose(
        np.asarray(out20[5]), np.asarray(out100[5]), rtol=1e-7, atol=1e-7
    )
    # and the padded 100-step call must equal the unpadded 100-step call
    n100u, w100u = padded_cc_quadrature(100, 100)
    out100u = model.apply(params, x, rng, nodes=n100u, weights=w100u)
    np.testing.assert_allclose(
        np.asarray(out100[5]), np.asarray(out100u[5]), rtol=1e-6
    )


def test_padded_random_steps_equal_unpadded(mmavae):
    """padded(n, 100) == padded(n, n): the zero-weight padding nodes used by
    the randomized-steps mode contribute nothing (`flows.py:319-321`)."""
    model, params, x = mmavae
    rng = jax.random.PRNGKey(3)
    for n in (24, 58, 98):
        np_, wp = padded_cc_quadrature(n, 100)
        nu, wu = padded_cc_quadrature(n, n)
        zp = model.apply(params, x, rng, nodes=np_, weights=wp)
        zu = model.apply(params, x, rng, nodes=nu, weights=wu)
        np.testing.assert_allclose(
            np.asarray(zp[5]), np.asarray(zu[5]), rtol=2e-5, atol=1e-5
        )


def test_omniglot_dynamic_binarization_layout():
    """Omniglot synthetic: train real-valued (for the per-batch bernoulli
    draw, `training.py:28-29`), val/test already binary, flag set."""
    data = load_vae_dataset("omniglot", synthetic=True)
    assert data.dynamic_binarization
    assert not np.isin(data.trn, [0.0, 1.0]).all()  # real-valued train
    assert np.isin(data.val, [0.0, 1.0]).all()
    assert np.isin(data.tst, [0.0, 1.0]).all()
    # the loop's draw produces exact 0/1 batches
    rng = np.random.RandomState(0)
    b = rng.binomial(1, data.trn[:16]).astype(np.float32)
    assert np.isin(b, [0.0, 1.0]).all()
    # static mnist must NOT be flagged
    assert not load_vae_dataset("mnist", synthetic=True).dynamic_binarization


def test_post_update_runs_every_step():
    """The Lipschitz projection hook must run after EVERY optimizer step
    (`UCIExperiments.py:145-147` cadence, round-1 ADVICE medium)."""
    opt = make_optimizer("adam", lr=0.1, grad_clip=None)

    def loss_fn(p, b):
        return jnp.sum((p["w"] * b) ** 2)

    # projection caps |w| at 0.5 — with lr 0.1 and these grads, a per-epoch
    # cadence would leave |w| far above the cap between calls
    def post(p):
        return {"w": jnp.clip(p["w"], -0.5, 0.5)}

    step = make_train_step(loss_fn, opt, post_update=post)
    params = {"w": jnp.asarray([2.0, -3.0])}
    state = opt.init(params)
    for _ in range(3):
        params, state, _ = step(params, state, jnp.asarray([1.0, 1.0]))
        assert float(jnp.max(jnp.abs(params["w"]))) <= 0.5 + 1e-6


def test_retry_transient_behavior():
    """Transient remote-compile failures retry with backoff; real errors and
    exhausted retries re-raise."""
    import jax

    from umnn_tpu.training.loops import retry_transient

    calls = {"n": 0}

    def flaky(x):
        calls["n"] += 1
        if calls["n"] < 3:
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: http://127.0.0.1:1/remote_compile: read body: "
                "response body closed before all bytes were read"
            )
        return x + 1

    assert retry_transient(flaky, retries=3, base_delay=0.0)(1) == 2
    assert calls["n"] == 3

    def always_fails(x):
        raise jax.errors.JaxRuntimeError("remote_compile transient")

    with pytest.raises(jax.errors.JaxRuntimeError):
        retry_transient(always_fails, retries=2, base_delay=0.0)(1)

    def real_error(x):
        raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: shape mismatch")

    calls["n"] = 0

    def counting_real(x):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: shape mismatch")

    with pytest.raises(jax.errors.JaxRuntimeError):
        retry_transient(counting_real, retries=3, base_delay=0.0)(1)
    assert calls["n"] == 1  # non-transient: no retry
