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


def test_nonfinite_batch_skips_update():
    """A batch producing NaN/inf loss or grads must leave params AND
    optimizer moments untouched (the value-clip passes NaN through, so an
    unguarded step corrupts the whole rest of the run — seen on a bsds300
    run at epoch 35/120). Finite batches around it must still train."""
    opt = make_optimizer("adam", lr=0.1)

    def loss_fn(p, b):
        return jnp.sum(p["w"] * b)

    step = make_train_step(loss_fn, opt)
    params = {"w": jnp.asarray([1.0, 2.0])}
    state = opt.init(params)

    params1, state1, loss1 = step(params, state, jnp.asarray([1.0, 1.0]))
    assert np.isfinite(float(loss1))
    # numpy snapshots BEFORE the next call: the step donates params/state
    w1 = np.asarray(params1["w"]).copy()
    moments1 = [np.asarray(a).copy() for a in jax.tree_util.tree_leaves(state1)]

    # poisoned batch: NaN loss + NaN grads
    params2, state2, loss2 = step(
        params1, state1, jnp.asarray([np.nan, 1.0])
    )
    assert not np.isfinite(float(loss2))  # still reported to the log
    w2 = np.asarray(params2["w"]).copy()
    np.testing.assert_array_equal(w2, w1)
    for a, b in zip(jax.tree_util.tree_leaves(state2), moments1):
        np.testing.assert_array_equal(np.asarray(a), b)

    # training resumes normally on the next finite batch
    params3, _, loss3 = step(params2, state2, jnp.asarray([1.0, 1.0]))
    assert np.isfinite(float(loss3))
    assert np.isfinite(np.asarray(params3["w"])).all()
    assert not np.array_equal(np.asarray(params3["w"]), w2)


def test_finite_mean_excludes_guarded_batches():
    """The epoch train metric must describe the updates that actually
    happened: batches the step guard skipped (inf/nan loss) are excluded
    from the mean and counted (seen live: a 1.23M-row bsds300 draw has
    tail rows that overflow one batch loss per epoch)."""
    from umnn_tpu.training.loops import finite_mean

    mean, n = finite_mean([jnp.asarray(1.0), jnp.asarray(3.0)])
    assert mean == 2.0 and n == 0

    mean, n = finite_mean(
        [jnp.asarray(1.0), jnp.asarray(np.inf), jnp.asarray(3.0),
         jnp.asarray(np.nan)]
    )
    assert mean == 2.0 and n == 2

    mean, n = finite_mean([jnp.asarray(np.inf)])
    assert mean == np.inf and n == 1


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


def test_plateau_matches_torch_reduce_lr_on_plateau():
    """A/B against torch's actual ReduceLROnPlateau at the reference config
    (factor=0.5, patience=5, threshold=1e-2 — `UCIExperiments.py:86-87,
    209,213`) over adversarial metric sequences: tiny sub-threshold
    improvements, plateaus, negative losses (rel-threshold sign behavior),
    and post-reduction recovery."""
    import torch

    from umnn_tpu.training.loops import ReduceLROnPlateau

    rng = np.random.RandomState(0)
    sequences = [
        # sub-1% improvements must count as plateau
        list(10.0 * (1 - 0.001) ** np.arange(30)),
        # hard plateau then drop then plateau
        [5.0] * 8 + [1.0] + [1.0] * 12,
        # negative losses (UCI NLLs go negative): rel threshold flips side
        list(-1.0 - 0.05 * np.arange(20)),
        [-0.63] * 14,
        # noisy decay
        list(3.0 * np.exp(-0.05 * np.arange(40)) + 0.01 * rng.randn(40)),
    ]
    for seq in sequences:
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1e-3)
        tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, factor=0.5, patience=5, threshold=1e-2
        )
        ours = ReduceLROnPlateau(factor=0.5, patience=5)
        lr = 1e-3
        for metric in seq:
            tsched.step(metric)
            lr = ours.update(float(metric), lr)
            torch_lr = opt.param_groups[0]["lr"]
            assert lr == pytest.approx(torch_lr, rel=1e-12), (
                f"diverged at metric {metric}: ours {lr} vs torch {torch_lr}"
            )


def test_retry_transient_deadline_not_retried():
    """DEADLINE_EXCEEDED can surface after a donating step consumed its
    inputs — it must NOT be treated as transient (advisor r2)."""
    from umnn_tpu.training.loops import retry_transient

    calls = {"n": 0}

    def deadline(x):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError("DEADLINE_EXCEEDED: rpc timed out")

    with pytest.raises(jax.errors.JaxRuntimeError):
        retry_transient(deadline, retries=3, base_delay=0.0)(1)
    assert calls["n"] == 1


def test_retry_transient_reraises_original_on_deleted_buffer():
    """If a retry trips over already-donated buffers, the ORIGINAL transient
    error is re-raised, not the confusing deleted-buffer one (advisor r2)."""
    from umnn_tpu.training.loops import retry_transient

    calls = {"n": 0}

    def misclassified(x):
        calls["n"] += 1
        if calls["n"] == 1:
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: remote_compile: flaked but actually dispatched"
            )
        raise jax.errors.JaxRuntimeError(
            "INVALID_ARGUMENT: buffer has been deleted or donated"
        )

    with pytest.raises(jax.errors.JaxRuntimeError, match="remote_compile"):
        retry_transient(misclassified, retries=3, base_delay=0.0)(1)
    assert calls["n"] == 2


def test_post_update_receives_step_extras():
    """post_update gets the step's extra loss args so drivers can thread a
    fresh per-step power-iteration key (advisor r2: a fixed init vector can
    persistently underestimate sigma)."""
    opt = make_optimizer("adam", lr=0.1, grad_clip=None)

    def loss_fn(p, b, scale):
        return jnp.sum((p["w"] * b * scale) ** 2)

    def post(p, scale):  # traced: must use the extra arithmetically
        return {"w": p["w"] * 0 + scale}

    step = make_train_step(loss_fn, opt, post_update=post)
    params = {"w": jnp.asarray([2.0])}
    state = opt.init(params)
    for s in (3.0, 7.0):
        params, state, _ = step(params, state, jnp.asarray([1.0]), jnp.float32(s))
        assert float(params["w"][0]) == pytest.approx(s)


def test_synthetic_rows_scaling_and_floor_consistency():
    """Real-scale synthetic rows: load_uci(synthetic_rows=n) splits n rows
    10/10 and synthetic_floor(n) shares the same draw — the z-scored data
    under the true density must score exactly the floor (model-free check:
    mean true-NLL over the loader's own test split == floor)."""
    from umnn_tpu.data.uci import (
        SYNTH_REAL_ROWS,
        _synthetic_draw,
        _tail_splits_10_10,
        load_uci,
        synthetic_floor,
    )

    n = 5000
    data = load_uci("power", synthetic=True, synthetic_rows=n)
    assert len(data.trn) + len(data.val) + len(data.tst) == n
    assert len(data.tst) == n // 10

    # floor consistency: recompute the true mixture NLL from the shared draw
    raw, centers, A = _synthetic_draw("power", n_rows=n)
    trn, val, tst = _tail_splits_10_10(raw)
    s = np.vstack([trn, val]).std(0)
    cov = A.T @ A
    prec, (_, logdet) = np.linalg.inv(cov), np.linalg.slogdet(cov)
    lps = [
        -0.5 * (
            np.einsum("ni,ij,nj->n", tst - c, prec, tst - c)
            + raw.shape[1] * np.log(2 * np.pi) + logdet
        )
        for c in centers
    ]
    lp = np.logaddexp.reduce(np.stack(lps), 0) - np.log(3)
    expected = float(-(lp + np.log(s).sum()).mean())
    assert synthetic_floor("power", n_rows=n) == pytest.approx(expected, rel=1e-12)

    # a deliberately-wrong density (standard normal on z-scored data) must
    # score strictly worse than the floor
    d = data.tst.shape[1]
    naive = float(
        (0.5 * (data.tst.astype(np.float64) ** 2).sum(1)
         + 0.5 * d * np.log(2 * np.pi)).mean()
    )
    assert naive > synthetic_floor("power", n_rows=n)

    # real-scale table exists for every dataset
    assert set(SYNTH_REAL_ROWS) == {"power", "gas", "hepmass", "miniboone", "bsds300"}
