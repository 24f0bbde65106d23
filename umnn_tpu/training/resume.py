"""Checkpoint-resume state reconstruction (shared by the UCI/MNIST drivers).

The reference resumes by reloading `model_best_train.pt` plus the pickled
loss history as an epoch cursor (`UCIExperiments.py:93-122`); optimizer
moments and scheduler state are silently reset there. This helper restores
the full (params, opt_state) pair saved by our periodic checkpoints and
additionally:

* replays the plateau scheduler over the saved validation history so its
  best/bad-epoch counters continue instead of resetting;
* seeds the best-checkpoint trackers from history so early post-resume
  epochs cannot overwrite a better historical best;
* recovers from NON-FINITE checkpoints: a pre-guard run that diverged
  saved NaN periodic checkpoints (seen on a bsds300 run, epoch 35/120) —
  the history is truncated to its finite prefix, the best-valid params are
  reloaded, the plateau-replayed lr is installed into FRESH optimizer
  moments, and the poisoned step checkpoints are deleted so re-saving those
  epochs cannot collide.
"""

from __future__ import annotations

import jax
import numpy as np

from umnn_tpu.training.loops import get_learning_rate, set_learning_rate


def _all_finite(tree) -> bool:
    return all(
        np.isfinite(np.asarray(a)).all()
        for a in jax.tree_util.tree_leaves(tree)
    )


def resume_training_state(
    ckpt,
    optimizer,
    *,
    template_params,
    template_opt_state,
    history: dict,
    plateau,
    best=None,
    init_lr: float,
    logger=None,
):
    """Restore (params, opt_state, lr, start_epoch, history) from ``ckpt``.

    ``history`` must already be loaded (its length is the epoch cursor);
    ``plateau`` is mutated by replaying the finite validation history;
    ``best`` (a BestTracker) is seeded from history when given.
    """
    info = (logger.info if logger is not None else (lambda *a: None))
    params, opt_state = template_params, template_opt_state
    start_epoch = len(history["valid"])
    lr = init_lr
    restored = ckpt.restore(
        template={"params": params, "opt_state": opt_state}
    )
    if restored is not None:
        _, params, opt_state = restored
        # honor the (possibly plateau-reduced) lr inside the restored
        # optimizer state — resetting to init_lr would let the next
        # plateau RAISE the effective rate
        lr = get_learning_rate(opt_state)
        if not _all_finite(params):
            n_ok = next(
                (i for i, v in enumerate(history["valid"])
                 if not np.isfinite(v)),
                len(history["valid"]),
            )
            history["train"] = history["train"][:n_ok]
            history["valid"] = history["valid"][:n_ok]
            start_epoch = n_ok
            best_p = ckpt.load_best("valid", params)
            if best_p is None:
                raise RuntimeError(
                    "latest checkpoint is non-finite and no best-valid "
                    "fallback exists"
                )
            params = best_p
            ckpt.delete_steps_from(n_ok)  # NaN periodic ckpts
            lr = init_lr
            for v in history["valid"]:
                lr = plateau.update(v, lr)
            opt_state = optimizer.init(params)
            opt_state = set_learning_rate(opt_state, lr)
            info(
                "restored checkpoint was non-finite: resuming from "
                "best-valid params at epoch %d (replayed lr %g)",
                start_epoch, lr,
            )
        else:
            # replay the plateau counters; the lr itself comes from the
            # restored optimizer state
            replay_lr = init_lr
            for v in history["valid"]:
                replay_lr = plateau.update(v, replay_lr)
            info("resumed at epoch %d (lr %g)", start_epoch, lr)
        if best is not None:
            finite_t = [v for v in history["train"] if np.isfinite(v)]
            finite_v = [v for v in history["valid"] if np.isfinite(v)]
            if finite_t:
                best.best_train = min(finite_t)
            if finite_v:
                best.best_valid = min(finite_v)
    return params, opt_state, lr, start_epoch, history
