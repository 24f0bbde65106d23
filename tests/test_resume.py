"""Resume-state reconstruction (`umnn_tpu/training/resume.py`): normal
resume, and recovery from NaN checkpoints left by a pre-guard diverged run
(the bsds300 epoch-35 failure mode). Compile-free: checkpoint IO +
plateau replay + optimizer init only."""

import jax.numpy as jnp
import numpy as np

from umnn_tpu.training.checkpoint import BestTracker, CheckpointManager
from umnn_tpu.training.loops import (
    ReduceLROnPlateau,
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
)
from umnn_tpu.training.resume import resume_training_state


def _setup(tmp_path, poisoned: bool):
    optimizer = make_optimizer("adam", lr=1e-3)
    params = {"w": jnp.asarray([1.0, 2.0])}
    opt_state = optimizer.init(params)
    ckpt = CheckpointManager(tmp_path / "ckpt")

    # 4 finite epochs; with patience=1 and rel threshold 1e-2 the replayed
    # lr decays once on epoch 3 (4.89 and 4.88 both miss the 1% margin on
    # best=4.9)
    history = {"train": [5.1, 4.95, 4.9, 4.89], "valid": [5.0, 4.9, 4.89, 4.88], "test": []}
    good = {"w": jnp.asarray([0.5, 0.5])}
    ckpt.save_best("valid", good)

    if poisoned:
        bad = {"w": jnp.asarray([np.nan, np.nan])}
        bad_opt = optimizer.init(params)
        bad_opt = set_learning_rate(bad_opt, 1.5625e-5)  # NaN-era decayed lr
        history["train"] += [float("nan")] * 3
        history["valid"] += [float("nan")] * 3
        ckpt.save(4, good, set_learning_rate(optimizer.init(good), 5e-4))
        ckpt.save(5, bad, bad_opt, history)
    else:
        saved_opt = set_learning_rate(optimizer.init(good), 5e-4)
        ckpt.save(4, good, saved_opt, history)
    return optimizer, params, opt_state, ckpt, history


def test_resume_normal(tmp_path):
    optimizer, params, opt_state, ckpt, history = _setup(tmp_path, poisoned=False)
    plateau = ReduceLROnPlateau(factor=0.5, patience=1)
    best = BestTracker(ckpt)
    params, opt_state, lr, start_epoch, history = resume_training_state(
        ckpt, optimizer,
        template_params=params, template_opt_state=opt_state,
        history=history, plateau=plateau, best=best, init_lr=1e-3,
    )
    assert start_epoch == 4
    assert np.isclose(lr, 5e-4, rtol=1e-5)  # from the restored optimizer state (f32)
    np.testing.assert_allclose(np.asarray(params["w"]), [0.5, 0.5])
    # plateau counters replayed: one reduction happened, bad_epochs reset
    assert plateau.best == 4.9 and plateau.bad_epochs == 0
    # best trackers seeded from history — a worse new epoch must not stash
    assert best.best_valid == 4.88 and best.best_train == 4.89
    best.update(4.95, 4.95, params)
    assert not best._pending


def test_resume_nan_checkpoint_falls_back(tmp_path):
    optimizer, params, opt_state, ckpt, history = _setup(tmp_path, poisoned=True)
    plateau = ReduceLROnPlateau(factor=0.5, patience=1)
    best = BestTracker(ckpt)
    params, opt_state, lr, start_epoch, history = resume_training_state(
        ckpt, optimizer,
        template_params=params, template_opt_state=opt_state,
        history=history, plateau=plateau, best=best, init_lr=1e-3,
    )
    # truncated to the finite prefix
    assert start_epoch == 4
    assert len(history["valid"]) == 4 and np.isfinite(history["valid"]).all()
    # best-valid params restored, fresh finite moments, replayed lr
    np.testing.assert_allclose(np.asarray(params["w"]), [0.5, 0.5])
    assert np.isclose(lr, 5e-4, rtol=1e-5)  # one replayed reduction
    assert np.isclose(get_learning_rate(opt_state), 5e-4, rtol=1e-5)
    assert all(
        np.isfinite(np.asarray(a)).all()
        for a in __import__("jax").tree_util.tree_leaves(opt_state)
    )
    # poisoned step checkpoints at/after the cursor are gone; re-saving
    # epoch 4 cannot collide
    assert ckpt.latest_step() is None or ckpt.latest_step() < 4
    ckpt.save(4, params, opt_state, history)
    assert ckpt.latest_step() == 4
    assert best.best_valid == 4.88


def test_resume_nan_without_fallback_raises(tmp_path):
    import pytest

    optimizer = make_optimizer("adam", lr=1e-3)
    params = {"w": jnp.asarray([1.0])}
    opt_state = optimizer.init(params)
    ckpt = CheckpointManager(tmp_path / "ckpt")
    history = {"train": [float("nan")], "valid": [float("nan")], "test": []}
    ckpt.save(0, {"w": jnp.asarray([np.nan])}, opt_state, history)
    with pytest.raises(RuntimeError, match="no best-valid fallback"):
        resume_training_state(
            ckpt, optimizer,
            template_params=params, template_opt_state=opt_state,
            history=history, plateau=ReduceLROnPlateau(), init_lr=1e-3,
        )
