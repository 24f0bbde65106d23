"""Training loops: pjit-compiled train/eval steps with data-parallel sharding.

Replaces the reference's inline per-script loops (`UCIExperiments.py:125-192`,
`ToyExperiments.py:144-165`, `MNISTExperiment.py:140-225`) with one shared,
jit-once implementation:

* loss -> grad -> value-clip(1.0) -> optimizer update in a single compiled
  step (reference clips at 1.0, `UCIExperiments.py:143`);
* batch axis sharded over the mesh via NamedSharding constraints — XLA
  inserts the gradient all-reduce (ICI/DCN) automatically;
* ReduceLROnPlateau-equivalent implemented as a host-side scale on the
  learning rate (reference `UCIExperiments.py:86-87`).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from umnn_tpu.parallel.mesh import batch_sharded, data_mesh, replicated

Params = Any

# substrings marking *transient* COMPILE-PHASE failures (seen on the
# tunneled TPU service): safe to retry because nothing executed — input
# buffers (incl. donated ones) are only consumed on successful dispatch.
# DEADLINE_EXCEEDED is deliberately NOT in this list: it can surface after
# a donate_argnums step has already consumed its input buffers, in which
# case a retry would feed deleted buffers (advisor finding r2).
_TRANSIENT_ERRORS = ("remote_compile", "response body closed")

# a retry that trips over already-donated inputs raises one of these; the
# ORIGINAL failure is the actionable error, so re-raise that instead
_DONATED_ERRORS = ("deleted", "donated", "has been freed")


def retry_transient(fn: Callable, retries: int = 3, base_delay: float = 5.0):
    """Wrap a jitted step: retry transient compile-phase failures.

    A flaky compile service otherwise kills multi-hour training runs at the
    first step (it ended one round-2 MNIST run). Non-transient errors and
    exhausted retries re-raise unchanged. If a retry fails because the
    original (mis-classified) failure had already consumed donated input
    buffers, the original exception is re-raised rather than the confusing
    deleted-buffer one.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        original: Exception | None = None
        for attempt in range(retries):
            try:
                return fn(*args, **kwargs)
            except jax.errors.JaxRuntimeError as e:
                msg = str(e)
                if original is not None and any(t in msg for t in _DONATED_ERRORS):
                    raise original
                if attempt == retries - 1 or not any(
                    t in msg for t in _TRANSIENT_ERRORS
                ):
                    raise
                original = e
                time.sleep(base_delay * (attempt + 1))
        raise AssertionError("unreachable")

    return wrapped


@dataclasses.dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: int = 0


def make_optimizer(
    name: str = "adam",
    lr: float = 1e-3,
    weight_decay: float = 0.0,
    grad_clip: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    """Optimizer factory matching the reference configs.

    'adam' + wd (AdamW-style; reference uses torch Adam(weight_decay=...)
    which is L2-into-grad — optax.add_decayed_weights before the update
    matches that), 'adamax' (VAE path, `TrainVaeFlow.py:234`).
    """
    txs = []
    if grad_clip is not None:
        txs.append(optax.clip(grad_clip))  # value clip, like clip_grad_value_
    if name == "adam":
        if weight_decay:
            # torch Adam weight_decay adds wd*p to the gradient pre-moments
            txs.append(optax.add_decayed_weights(weight_decay))
        txs.append(optax.scale_by_adam())
    elif name == "adamax":
        txs.append(optax.scale_by_adamax(eps=1e-7))
    else:
        raise ValueError(f"unknown optimizer {name}")
    txs.append(optax.inject_hyperparams(optax.scale)(step_size=-lr))
    return optax.chain(*txs)


def set_learning_rate(opt_state, lr: float):
    """Update the injected lr in-place in the optimizer state pytree."""
    inner = opt_state[-1]
    inner.hyperparams["step_size"] = jnp.asarray(-lr, dtype=jnp.float32)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return -float(opt_state[-1].hyperparams["step_size"])


def make_train_step(
    loss_fn: Callable[..., jax.Array],
    optimizer: optax.GradientTransformation,
    mesh=None,
    extra_shardings: tuple[str, ...] = (),
    has_aux: bool = False,
    post_update: Optional[Callable[[Params], Params]] = None,
):
    """Build the jit-compiled SPMD train step.

    ``loss_fn(params, batch, *extras) -> scalar`` (or ``(scalar, aux)`` with
    ``has_aux``). With a mesh, the state is replicated and the batch axis
    sharded; gradients come out replicated (XLA all-reduces across the data
    axis). ``extra_shardings`` names the sharding of each extra loss arg
    after ``batch``: ``"shard"`` for batch-axis arrays (e.g. per-sample
    labels) or ``"rep"`` for replicated ones (e.g. quadrature weights, rng
    keys, scalars).

    ``post_update``: optional ``(params, *extras) -> params`` projection
    applied after the optimizer update *inside* the compiled step — e.g. the
    Lipschitz weight projection the reference runs after every ``opt.step()``
    (`UCIExperiments.py:145-147`, `MNISTExperiment.py:166-167`,
    `training.py:46-48`). Fusing it into the step keeps the per-batch cadence
    without an extra device dispatch. It receives the step's extra loss args
    so drivers can thread per-step randomness (e.g. a fresh power-iteration
    init key each batch, like the reference's fresh ``torch.randn`` per
    ``forceLipshitz`` call) without retracing.
    """

    def step(params, opt_state, batch, *extras):
        out, grads = jax.value_and_grad(loss_fn, has_aux=has_aux)(
            params, batch, *extras
        )
        loss, aux = out if has_aux else (out, None)
        # Non-finite guard: one diverged batch (inf/nan loss or grads — e.g.
        # an extreme tail sample overflowing the embedding net) must not
        # corrupt params/Adam moments for the rest of a multi-hour run; the
        # value-clip passes NaN through unchanged. Skip the update entirely
        # when anything is non-finite; the NaN loss still surfaces in the
        # epoch log so skipped batches stay visible. (A bsds300 run died
        # this way at epoch 35 of 120 — every later epoch was NaN.)
        ok = jnp.isfinite(loss)
        for g in jax.tree_util.tree_leaves(grads):
            ok = ok & jnp.all(jnp.isfinite(g))
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        params = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_params, params
        )
        opt_state = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_opt_state, opt_state
        )
        if post_update is not None:
            params = post_update(params, *extras)
        if has_aux:
            return params, opt_state, loss, aux
        return params, opt_state, loss

    if mesh is not None:
        rep = replicated(mesh)
        shd = batch_sharded(mesh)
        extra = tuple(shd if s == "shard" else rep for s in extra_shardings)
        out_shardings = (rep, rep, rep, rep) if has_aux else (rep, rep, rep)
        return retry_transient(jax.jit(
            step,
            in_shardings=(rep, rep, shd) + extra,
            out_shardings=out_shardings,
            donate_argnums=(0, 1),
        ))
    return retry_transient(jax.jit(step, donate_argnums=(0, 1)))


def finite_mean(losses) -> tuple[float, int]:
    """Mean of the finite entries of a stacked per-batch loss list.

    Companion to the train step's non-finite guard: a batch whose loss
    overflowed was *skipped* by the optimizer, so excluding it from the
    epoch metric keeps the logged train NLL describing the updates that
    actually happened. Returns ``(mean, n_excluded)``; mean is ``inf``
    when every batch diverged (which the guard makes near-impossible).
    """
    arr = np.asarray(jnp.stack(losses))
    finite = np.isfinite(arr)
    mean = float(arr[finite].mean()) if finite.any() else float("inf")
    return mean, int((~finite).sum())


def make_accum_train_step(
    loss_fn: Callable[[Params, Any], jax.Array],
    optimizer: optax.GradientTransformation,
    accum_steps: int,
    mesh=None,
):
    """Gradient-accumulation train step (the reference's ``max_forward``
    sub-batching, `MNISTExperiment.py:46,160-165`, `UCIExperiments.py:135-141`).

    The batch's leading axis is split into ``accum_steps`` microbatches
    scanned sequentially; per-microbatch grads are averaged before one
    optimizer update. Peak activation memory drops by ``accum_steps`` at the
    same math (loss is mean-of-means over equal microbatches). On TPU this is
    mostly obsoleted by the Leibniz custom VJP (which never stores node
    activations), but remains useful for very large embeddings/batches.
    """

    def step(params, opt_state, batch):
        micro = jax.tree.map(
            lambda a: a.reshape(accum_steps, a.shape[0] // accum_steps, *a.shape[1:]),
            batch,
        )

        def body(carry, mb):
            loss_acc, grad_acc = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, mb)
            return (
                loss_acc + loss,
                jax.tree.map(jnp.add, grad_acc, grads),
            ), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        (loss_sum, grad_sum), _ = jax.lax.scan(body, (jnp.zeros(()), zeros), micro)
        grads = jax.tree.map(lambda g: g / accum_steps, grad_sum)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_sum / accum_steps

    if mesh is not None:
        rep = replicated(mesh)
        shd = batch_sharded(mesh)
        return jax.jit(
            step,
            in_shardings=(rep, rep, shd),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0, 1),
        )
    return jax.jit(step, donate_argnums=(0, 1))


def make_eval_step(loss_fn: Callable[[Params, Any], jax.Array], mesh=None):
    if mesh is not None:
        rep = replicated(mesh)
        shd = batch_sharded(mesh)
        return retry_transient(
            jax.jit(loss_fn, in_shardings=(rep, shd), out_shardings=rep)
        )
    return retry_transient(jax.jit(loss_fn))


@dataclasses.dataclass
class ReduceLROnPlateau:
    """Host-side LR schedule matching torch's ReduceLROnPlateau exactly as
    the reference configures it: ``ReduceLROnPlateau(opt, factor=s_rate,
    patience=s_patience, threshold=1e-2)`` (`UCIExperiments.py:86-87`) with
    CLI defaults s_rate=0.5, s_patience=5 (`UCIExperiments.py:209,213`).

    torch semantics replicated: mode='min', threshold_mode='rel' (the torch
    default) so an epoch only counts as improvement when
    ``metric < best * (1 - threshold)``; LR reduces when ``bad_epochs >
    patience``; ``bad_epochs`` resets on reduction; reductions smaller than
    ``eps`` are skipped; min_lr defaults to 0 like torch.
    """

    factor: float = 0.5
    patience: int = 5
    threshold: float = 1e-2
    min_lr: float = 0.0
    eps: float = 1e-8
    best: float = float("inf")
    bad_epochs: int = 0

    def _is_better(self, metric: float) -> bool:
        # torch rel/min rule: a < best * (1 - threshold), sign included
        # (for negative best the margin flips side — replicated verbatim)
        return metric < self.best * (1.0 - self.threshold)

    def update(self, metric: float, lr: float) -> float:
        if self._is_better(metric):
            self.best = metric
            self.bad_epochs = 0
            return lr
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.bad_epochs = 0
            new_lr = max(lr * self.factor, self.min_lr)
            if lr - new_lr > self.eps:  # torch skips sub-eps updates
                return new_lr
        return lr


def batch_iter(
    x: np.ndarray,
    batch_size: int,
    rng: np.random.RandomState,
    shuffle: bool = True,
    with_counts: bool = False,
) -> Iterator:
    """Host-side minibatcher (drops no remainder; pads by wrap to keep
    shapes static for jit).

    With ``with_counts=True`` yields ``(batch, n_valid)`` so evaluation can
    ignore the wrap-padded duplicate rows of the final partial batch —
    averaging per-batch means over a padded batch double-counts the head of
    the dataset.
    """
    n = x.shape[0]
    idx = rng.permutation(n) if shuffle else np.arange(n)
    for i in range(0, n, batch_size):
        sel = idx[i : i + batch_size]
        n_valid = len(sel)
        if n_valid < batch_size:
            sel = np.concatenate([sel, idx[: batch_size - n_valid]])
        yield (x[sel], n_valid) if with_counts else x[sel]
