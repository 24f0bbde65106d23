"""UMNN-MAF density estimation on the UCI tabular suite.

Framework equivalent of the reference driver `UCIExperiments.py` (CLI
defaults replicated from its argparse, `UCIExperiments.py:196-217`):
nb_flow 5, hidden_embedding [512,512], hidden_derivative [50,50,50,50],
embedding 30, CC steps 50, Adam lr 1e-3 wd 1e-2, batch 500, grad clip 1.0.

TPU-first redesign of the loop:
* ONE jitted SPMD train step for every step count — randomized-steps mode
  (steps <= 0 -> nb_steps ~ 2*U{5,50} per batch, `UCIExperiments.py:130-132`)
  feeds zero-padded quadrature nodes/weights as runtime arrays instead of
  retracing per count;
* batch axis sharded over the device mesh; gradients all-reduced by XLA;
* ReduceLROnPlateau on validation loss (`UCIExperiments.py:86-87`),
  best-valid/best-train/best-train-valid checkpoints + loss-history resume
  cursor (`UCIExperiments.py:116-189`).

Usage:
    python examples/train_uci.py -data power -nb_epoch 5
(data files absent -> seeded synthetic stand-in with the right dims)
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from umnn_tpu.data.uci import UCI_DIMS, load_uci
from umnn_tpu.models.flow import UMNNMAFFlow
from umnn_tpu.ops.quadrature import padded_cc_quadrature
from umnn_tpu.parallel.mesh import batch_sharded, data_mesh, replicated
from umnn_tpu.training.checkpoint import BestTracker, CheckpointManager
from umnn_tpu.training.loops import (
    ReduceLROnPlateau,
    batch_iter,
    finite_mean,
    get_learning_rate,
    make_optimizer,
    make_train_step,
    retry_transient,
    set_learning_rate,
)
from umnn_tpu.utils.logging import MetricsWriter, get_logger

MAX_STEPS = 100  # randomized mode draws 2*U{5,49} -> max 98; padded shape 100


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-data", default="power", choices=sorted(UCI_DIMS))
    p.add_argument("-nb_epoch", type=int, default=500)
    p.add_argument("-nb_flow", type=int, default=5)
    p.add_argument("-nb_steps", type=int, default=50, help="<=0 for randomized")
    p.add_argument("-embedding_s", type=int, default=30)
    p.add_argument("-hidden_embedding", type=int, nargs="+", default=[512, 512])
    p.add_argument("-hidden_derivative", type=int, nargs="+", default=[50, 50, 50, 50])
    p.add_argument("-b_size", type=int, default=500)
    p.add_argument("-lr", type=float, default=1e-3)
    p.add_argument("-wd", type=float, default=1e-2)
    p.add_argument(
        "-s_rate", type=float, default=0.5,
        help="LR scheduling rate (`UCIExperiments.py:209`)",
    )
    p.add_argument(
        "-s_patience", type=int, default=5,
        help="epochs with no improvement before reducing lr "
             "(`UCIExperiments.py:213`)",
    )
    p.add_argument("-seed", type=int, default=0)
    p.add_argument("-folder", default="runs/uci")
    p.add_argument("-load", action="store_true", help="resume from checkpoint")
    p.add_argument(
        "-load_npz", default="",
        help="warm-start params from a compact float16 snapshot "
             "(scripts/snapshot_params.py); with -test, evaluates the "
             "snapshot directly — cross-round reproduction of committed "
             "results without the (uncommitted) Orbax ckpt dir",
    )
    p.add_argument(
        "-test", action="store_true",
        help="evaluation-only: load the best-train checkpoint and report "
             "test NLL (at 100 steps in randomized mode) without training "
             "(`UCIExperiments.py:93-122` loads model_best_train.pt)",
    )
    p.add_argument("-steps_per_epoch", type=int, default=0, help="0 = full epoch")
    p.add_argument(
        "-Lipshitz", type=float, default=0,
        help="max Lipschitz constant of integrand linears (0 = off; "
             "reference `UCIExperiments.py:216`, spelling kept)",
    )
    p.add_argument("-synthetic", action="store_true")
    p.add_argument(
        "-synthetic_rows", type=int, default=0,
        help="total synthetic stand-in rows before splits (0 = 20000 "
             "default; -1 = real dataset scale, see data/uci.py "
             "SYNTH_REAL_ROWS)",
    )
    args = p.parse_args()

    folder = Path(args.folder) / args.data
    folder.mkdir(parents=True, exist_ok=True)
    logger = get_logger("uci", folder / "train.log", source_file=__file__)
    metrics = MetricsWriter(folder / "metrics.jsonl")
    # -test (eval-only) re-runs must not clobber the original training config
    (folder / ("args_eval.json" if args.test else "args.json")).write_text(
        json.dumps(vars(args))
    )

    synth_rows = None
    if args.synthetic_rows == -1:
        from umnn_tpu.data.uci import SYNTH_REAL_ROWS

        synth_rows = SYNTH_REAL_ROWS[args.data]
    elif args.synthetic_rows > 0:
        synth_rows = args.synthetic_rows
    data = load_uci(
        args.data,
        synthetic=True if args.synthetic else None,
        synthetic_rows=synth_rows,
    )
    logger.info(
        "dataset %s: dims=%d train=%d valid=%d test=%d",
        data.name, data.n_dims, len(data.trn), len(data.val), len(data.tst),
    )

    random_steps = args.nb_steps <= 0
    eval_steps = 100 if random_steps else args.nb_steps
    # pad the node axis only in randomized-steps mode: zero-weight padding
    # nodes still cost integrand evaluations in both sweeps
    max_steps = MAX_STEPS if random_steps else max(eval_steps, args.nb_steps)
    model = UMNNMAFFlow(
        nb_flow=args.nb_flow,
        nb_in=data.n_dims,
        hidden_derivative=tuple(args.hidden_derivative),
        hidden_embedding=tuple(args.hidden_embedding),
        embedding_s=args.embedding_s,
        nb_steps=eval_steps,
    )
    params = model.init(jax.random.PRNGKey(args.seed))
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    logger.info("model params: %d  devices: %s", n_params, jax.devices())

    optimizer = make_optimizer("adam", lr=args.lr, weight_decay=args.wd, grad_clip=1.0)
    opt_state = optimizer.init(params)
    mesh = data_mesh()
    rep, shd = replicated(mesh), batch_sharded(mesh)

    lipschitz = args.Lipshitz > 0

    def loss_fn(prm, batch, nodes, weights, *unused_step_key):
        ll, _ = model.compute_ll(prm, batch, nodes=nodes, weights=weights)
        return -jnp.mean(ll)

    # Lipschitz projection after EVERY optimizer step, fused into the
    # compiled step (`UCIExperiments.py:145-147` projects per batch). A
    # fresh power-iteration key rides each step (the reference draws fresh
    # torch.randn per forceLipshitz call, `UMNNMAF.py:26-34`): the driver
    # passes a per-step PRNG key as an extra loss arg.
    post_update = None
    extra_shardings = ("rep", "rep")
    if lipschitz:
        extra_shardings = ("rep", "rep", "rep")

        def post_update(prm, nodes, weights, step_key):
            return model.force_lipschitz(prm, step_key, args.Lipshitz)

    train_step = make_train_step(
        loss_fn, optimizer, mesh, extra_shardings=extra_shardings,
        post_update=post_update,
    )
    def nll_vec_fn(prm, batch, nodes, weights):
        ll, _ = model.compute_ll(prm, batch, nodes=nodes, weights=weights)
        return -ll  # per-sample NLL: lets eval skip wrap-padded dup rows

    eval_step = retry_transient(jax.jit(
        nll_vec_fn, in_shardings=(rep, shd, rep, rep), out_shardings=rep
    ))
    eval_nodes, eval_weights = padded_cc_quadrature(eval_steps, max_steps)

    ckpt = CheckpointManager(folder / "ckpt")
    best = BestTracker(ckpt)
    if args.load_npz:
        # cross-round warm start from a committed compact snapshot
        # (scripts/snapshot_params.py); optimizer fresh. A subsequent -load
        # (full Orbax resume, below) takes precedence if its ckpt exists.
        from umnn_tpu.training.checkpoint import load_params_npz

        params = load_params_npz(args.load_npz, params)
        logger.info("warm-started params from %s (optimizer fresh)", args.load_npz)
    plateau = ReduceLROnPlateau(factor=args.s_rate, patience=args.s_patience)
    history = ckpt.load_history() if args.load else {"train": [], "valid": [], "test": []}
    start_epoch = len(history["valid"])  # loss-history resume cursor
    rng = np.random.RandomState(args.seed + 1)
    lr = args.lr
    if args.load and ckpt.latest_step() is not None:
        from umnn_tpu.training.resume import resume_training_state

        params, opt_state, lr, start_epoch, history = resume_training_state(
            ckpt, optimizer,
            template_params=params, template_opt_state=opt_state,
            history=history, plateau=plateau, best=best,
            init_lr=args.lr, logger=logger,
        )

    def eval_split(x):
        tot, n_tot = [], 0
        for b, nv in batch_iter(x, args.b_size, rng, shuffle=False, with_counts=True):
            vec = eval_step(params, jnp.asarray(b), eval_nodes, eval_weights)
            tot.append(vec[:nv].sum())
            n_tot += nv
        return float(jnp.stack(tot).sum()) / max(n_tot, 1)

    if args.test:
        # evaluation-only mode: the reference loads model_best_train.pt and
        # reports test NLL, forcing 100 steps in randomized mode
        # (`UCIExperiments.py:93-122`); eval_steps already carries that rule.
        # All saved best-tags are reported (primary = best-train, reference
        # semantics); no training happens.
        results = {}
        if args.load_npz:
            # params were already warm-started from the snapshot above —
            # evaluate them directly (committed-snapshot reproduction path)
            results["npz"] = eval_split(data.tst)
            logger.info(
                "TEST-ONLY (npz snapshot %s, %d steps): test NLL %.4f over %d rows",
                args.load_npz, eval_steps, results["npz"], len(data.tst),
            )
        for tag in () if args.load_npz else ("train", "valid", "train_valid"):
            loaded = ckpt.load_best(tag, params)
            if loaded is None:
                continue
            params = loaded
            results[tag] = eval_split(data.tst)
            logger.info(
                "TEST-ONLY (best-%s params, %d steps): test NLL %.4f over %d rows",
                tag, eval_steps, results[tag], len(data.tst),
            )
        if not results:
            logger.info("-test: no best checkpoint found under %s", ckpt.directory)
            return 1
        primary = "train" if "train" in results else next(iter(results))
        print(json.dumps({
            "dataset": data.name, "mode": "test_only", "ckpt": primary,
            "eval_steps": eval_steps, "test_nll": results[primary],
            "test_nll_by_ckpt": results,
        }))
        return 0

    lip_key = jax.random.PRNGKey(args.seed + 97)
    for epoch in range(start_epoch, args.nb_epoch):
        t0 = time.time()
        losses = []
        for i, b in enumerate(batch_iter(data.trn, args.b_size, rng)):
            if args.steps_per_epoch and i >= args.steps_per_epoch:
                break
            if random_steps:
                n_steps = 2 * rng.randint(5, 50)  # U{5,49} — randint high is exclusive (`UCIExperiments.py:131`)
            else:
                n_steps = args.nb_steps
            nodes, weights = padded_cc_quadrature(n_steps, max_steps)
            extras = (nodes, weights)
            if lipschitz:
                # fresh power-iteration init key per step (advisor r2)
                lip_key, k = jax.random.split(lip_key)
                extras = (nodes, weights, k)
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(b), *extras
            )
            losses.append(loss)
        # extreme tail rows in very large synthetic draws can overflow a
        # single batch loss to inf; the step guard skipped those updates,
        # so exclude them from the epoch metric too (keeps it informative)
        train_nll, n_skip = finite_mean(losses)
        if n_skip:
            logger.info(
                "epoch %d: %d/%d non-finite batch losses excluded from the "
                "train metric (updates were skipped by the step guard)",
                epoch, n_skip, len(losses),
            )
        valid_nll = eval_split(data.val)
        history["train"].append(train_nll)
        history["valid"].append(valid_nll)
        metrics.scalar("train_nll", train_nll, epoch)
        metrics.scalar("valid_nll", valid_nll, epoch)
        best.update(train_nll, valid_nll, params)
        new_lr = plateau.update(valid_nll, lr)
        if new_lr != lr:
            lr = new_lr
            opt_state = set_learning_rate(opt_state, lr)
            logger.info("epoch %d: lr -> %g", epoch, lr)
        if epoch % 5 == 0:
            ckpt.save(epoch, params, opt_state, history)
            # persist improved best stashes alongside the periodic save: a
            # killed run otherwise loses them (flush used to happen only at
            # the natural end — the r4 bsds300 resume lost its epoch-65
            # best-valid params that way)
            best.flush()
        logger.info(
            "epoch %3d  train NLL %.4f  valid NLL %.4f  lr %g  (%.1fs)",
            epoch, train_nll, valid_nll, lr, time.time() - t0,
        )

    best.flush()
    best_params = ckpt.load_best("valid", params)
    which = "best-valid"
    if best_params is not None:
        params = best_params
    else:
        # possible after a resume whose epochs never beat the historical
        # best (thresholds are seeded from history, params are not)
        which = "last-epoch (no best-valid stash on disk)"
    test_nll = eval_split(data.tst)
    history["test"].append(test_nll)
    ckpt.save(args.nb_epoch, params, opt_state, history)
    logger.info("FINAL test NLL (%s params): %.4f", which, test_nll)
    # stamp the reported NLL with a likelihood-validity report: quadrature
    # node-convergence + bf16-cast precision sensitivity on a valid slice
    # (PARITY_RUNS §2e — an ill-conditioned flow can report NLL below the
    # data's entropy floor; the reference cannot detect this at all)
    import dataclasses as _dc

    from umnn_tpu.utils.validity import density_validity_report

    rep = density_validity_report(
        model, params, jnp.asarray(data.val[:2000]),
        steps=eval_steps, check_steps=min(4 * eval_steps, 400),
    )
    logger.info(
        "validity: valid-slice NLL %.4f  node_gap %.4g  bf16_gap %.4g  "
        "nonfinite %d -> %s",
        rep.nll, rep.node_gap, rep.bf16_gap, rep.n_nonfinite,
        "OK" if rep.ok() else "SUSPECT",
    )
    print(json.dumps({
        "dataset": data.name, "test_nll": test_nll,
        "validity": dict(_dc.asdict(rep), ok=rep.ok()),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
