"""784-d (optionally class-conditional) MNIST density estimation with UMNN-MAF.

Framework equivalent of the reference driver `MNISTExperiment.py` (CLI
defaults from `MNISTExperiment.py:228-263`): nb_flow 5, hidden_embedding
[1024,1024,1024], hidden_derivative [100,50,50,50,50], batch 100, logit-
dequantized inputs, bits-per-pixel evaluation (`UMNNMAF.py:164-170` with
its computeLL typo fixed), generation via inversion + logit_back
(`MNISTExperiment.py:180-196`), per-batch Lipschitz projection when
``-Lipshitz`` > 0 (`MNISTExperiment.py:166-167`).

Randomized-steps mode (``-nb_steps <= 0``): nb_steps ~ 2*U{5,49} resampled
per batch (`MNISTExperiment.py:152-155`) via zero-padded quadrature nodes —
one compilation serves all step counts; eval runs at 100 steps (the
reference's randomized-mode eval convention, `UCIExperiments.py:104-105`).

Temperature-swept generation (``-temp_sweep``): rows are scaled by
temperatures arange(0.1, 1.1, 0.1), ten consecutive samples per temperature
(`MNISTExperiment.py:100-116`), with the bpp/ll of the generated batch
logged (`MNISTExperiment.py:124-126`) and a PNG grid saved.

Usage:
    python examples/train_mnist.py -nb_epoch 2 -synthetic
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
import optax

from umnn_tpu.data.images import load_mnist_flow, logit_back
from umnn_tpu.models.flow import UMNNMAFFlow
from umnn_tpu.ops.quadrature import padded_cc_quadrature
from umnn_tpu.parallel.mesh import batch_sharded, data_mesh, replicated
from umnn_tpu.training.checkpoint import BestTracker, CheckpointManager
from umnn_tpu.training.loops import (
    batch_iter,
    finite_mean,
    make_optimizer,
    make_train_step,
    retry_transient,
)
from umnn_tpu.utils.logging import MetricsWriter, get_logger


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-nb_epoch", type=int, default=500)
    p.add_argument("-nb_flow", type=int, default=5)
    p.add_argument("-nb_steps", type=int, default=50, help="<=0 for randomized")
    p.add_argument("-embedding_s", type=int, default=30)
    p.add_argument("-hidden_embedding", type=int, nargs="+", default=[1024, 1024, 1024])
    p.add_argument(
        "-hidden_derivative", type=int, nargs="+", default=[100, 50, 50, 50, 50]
    )
    p.add_argument("-b_size", type=int, default=100)
    p.add_argument("-lr", type=float, default=1e-3)
    p.add_argument("-wd", type=float, default=1e-2)
    p.add_argument(
        "-s_rate", type=float, default=0,
        help="plateau LR decay factor on valid bpp; 0 (default) = fixed LR, "
             "the reference MNIST semantics (`MNISTExperiment.py:43` has no "
             "scheduler). Used by the AR(1) gate runs to close the "
             "convergence tail.",
    )
    p.add_argument("-s_patience", type=int, default=5)
    p.add_argument(
        "-force_lr", type=float, default=0,
        help="on -load resume, override the checkpointed learning rate "
             "(0 = keep it). Rescue lever for runs whose plateau schedule "
             "collapsed the LR before convergence: at bpp~7 a 1%%-relative "
             "improvement per patience window is unreachable, so the torch "
             "ReduceLROnPlateau semantics freeze long AR(1)-gate runs early.",
    )
    p.add_argument("-conditionnal", action="store_true", help="class-conditional")
    p.add_argument("-gen", type=int, default=0, help="generate N images at the end")
    p.add_argument("-nb_iter", type=int, default=10, help="inversion iterations")
    p.add_argument("-temperature", type=float, default=0.5)
    p.add_argument(
        "-temp_sweep", action="store_true",
        help="scale generation rows by temperatures 0.1..1.0, 10 rows each "
             "(`MNISTExperiment.py:100-116`)",
    )
    p.add_argument(
        "-Lipshitz", type=float, default=0,
        help="per-batch Lipschitz projection bound (0 = off; "
             "`MNISTExperiment.py:166-167`, reference spelling kept)",
    )
    p.add_argument("-steps_per_epoch", type=int, default=0)
    p.add_argument("-seed", type=int, default=0)
    p.add_argument("-folder", default="runs/mnist")
    p.add_argument("-synthetic", action="store_true")
    p.add_argument(
        "-synthetic_mode", default="uniform", choices=["uniform", "ar1"],
        help="'uniform' = uint8 noise (exact 8.0 bpp floor, validates the "
             "bookkeeping); 'ar1' = raster AR(1) Gaussian copula (uniform "
             "marginals, exact correlated floor — the conditioner must "
             "learn inter-pixel structure to beat 8.0 bpp)",
    )
    p.add_argument("-ar1_rho", type=float, default=0.7)
    p.add_argument(
        "-ar1_rows", type=int, default=20000,
        help="AR(1) gate train rows (valid/test fixed at 2000/5000): the "
             "135M-param parity model memorizes 20k rows once it has the "
             "marginals — gate runs need real-data-order row counts",
    )
    p.add_argument(
        "-load", action="store_true",
        help="resume params+optimizer from the folder's latest checkpoint "
             "(`MNISTExperiment.py:55-57` load path, plus optimizer state as "
             "in the toy driver)",
    )
    p.add_argument(
        "-load_npz", default="",
        help="warm-start params from a compact float16 snapshot "
             "(scripts/snapshot_params.py) — cross-round resume when the "
             "folder's Orbax checkpoints were not committed; optimizer "
             "starts fresh",
    )
    args = p.parse_args()

    folder = Path(args.folder)
    folder.mkdir(parents=True, exist_ok=True)
    logger = get_logger("mnist", folder / "train.log")
    metrics = MetricsWriter(folder / "metrics.jsonl")
    (folder / "args.json").write_text(json.dumps(vars(args)))

    floor_bpp = None
    if args.synthetic and args.synthetic_mode == "ar1":
        from umnn_tpu.data.images import synthetic_mnist_ar1

        data, floor_bpp = synthetic_mnist_ar1(
            rho=args.ar1_rho, seed=args.seed, n=(args.ar1_rows, 2000, 5000)
        )
        logger.info(
            "AR(1) copula gate: rho=%.2f  rows=%d  exact test-floor %.4f bpp "
            "(independence scores 8.0)", args.ar1_rho, args.ar1_rows, floor_bpp,
        )
    else:
        data = load_mnist_flow(synthetic=True if args.synthetic else None)
    logger.info(
        "mnist flow: train=%d valid=%d test=%d", len(data.trn_x), len(data.val_x),
        len(data.tst_x),
    )

    random_steps = args.nb_steps <= 0
    eval_steps = 100 if random_steps else args.nb_steps
    max_steps = 100 if random_steps else eval_steps  # 2*U{5,49} tops at 98
    cond_in = 10 if args.conditionnal else 0
    model = UMNNMAFFlow(
        nb_flow=args.nb_flow,
        nb_in=784,
        hidden_derivative=tuple(args.hidden_derivative),
        hidden_embedding=tuple(args.hidden_embedding),
        embedding_s=args.embedding_s,
        nb_steps=eval_steps,
        cond_in=cond_in,
    )
    params = model.init(jax.random.PRNGKey(args.seed))
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    logger.info("params: %d  devices: %s", n_params, jax.devices())

    optimizer = make_optimizer("adam", lr=args.lr, weight_decay=args.wd, grad_clip=1.0)
    opt_state = optimizer.init(params)
    mesh = data_mesh()
    rep, shd = replicated(mesh), batch_sharded(mesh)

    def onehot(y):
        return jax.nn.one_hot(y, 10) if args.conditionnal else None

    lipschitz = args.Lipshitz > 0

    def loss_fn(prm, x, y, nodes, weights, *unused_step_key):
        ll, _ = model.compute_ll(
            prm, x, context=onehot(y), nodes=nodes, weights=weights
        )
        return -jnp.mean(ll)

    def bpp_fn(prm, x, y):
        bpp, ll, _ = model.compute_bpp(prm, x, context=onehot(y))
        return bpp  # per-sample: lets eval skip wrap-padded dup rows

    # Lipschitz projection after every optimizer step, inside the compiled
    # step (`MNISTExperiment.py:166-167` projects per batch), with a fresh
    # power-iteration init key per step (the reference draws fresh randn per
    # forceLipshitz call; advisor r2)
    post_update = None
    extra_shardings = ("shard", "rep", "rep")
    if lipschitz:
        extra_shardings = ("shard", "rep", "rep", "rep")

        def post_update(prm, y, nodes, weights, step_key):
            return model.force_lipschitz(prm, step_key, args.Lipshitz)

    train_step = make_train_step(
        loss_fn, optimizer, mesh, extra_shardings=extra_shardings,
        post_update=post_update,
    )
    eval_bpp = retry_transient(
        jax.jit(bpp_fn, in_shardings=(rep, shd, shd), out_shardings=rep)
    )

    ckpt = CheckpointManager(folder / "ckpt")
    best = BestTracker(ckpt)
    rng = np.random.RandomState(args.seed + 1)

    if args.load_npz:
        # cross-round warm start from a committed compact snapshot
        # (scripts/snapshot_params.py); optimizer state starts fresh.
        # -load (full Orbax resume) below takes precedence if both hit.
        from umnn_tpu.training.checkpoint import load_params_npz

        params = load_params_npz(args.load_npz, params)
        logger.info("warm-started params from %s (optimizer fresh)", args.load_npz)

    start_epoch = 0
    if args.load:
        restored = ckpt.restore(
            template={"params": params, "opt_state": opt_state}
        )
        if restored is not None:
            start_epoch, params, opt_state = restored
            start_epoch += 1
            logger.info("resumed from epoch %d", start_epoch - 1)
            from umnn_tpu.training.loops import get_learning_rate, set_learning_rate

            args.lr = get_learning_rate(opt_state)  # checkpointed lr wins
            if args.force_lr > 0:
                args.lr = args.force_lr
                opt_state = set_learning_rate(opt_state, args.force_lr)
                logger.info("resume: forcing lr -> %g", args.force_lr)

    def eval_split(x, y):
        tot, n_tot = [], 0
        for (xb, nv), yb in zip(
            batch_iter(x, args.b_size, rng, shuffle=False, with_counts=True),
            batch_iter(y, args.b_size, rng, shuffle=False),
        ):
            vec = eval_bpp(params, jnp.asarray(xb), jnp.asarray(yb))
            tot.append(vec[:nv].sum())
            n_tot += nv
        return float(jnp.stack(tot).sum()) / max(n_tot, 1)

    lip_key = jax.random.PRNGKey(args.seed + 97)
    plateau = None
    lr = args.lr
    if args.s_rate > 0:
        from umnn_tpu.training.loops import ReduceLROnPlateau, set_learning_rate

        plateau = ReduceLROnPlateau(factor=args.s_rate, patience=args.s_patience)
    for epoch in range(start_epoch, args.nb_epoch):
        t0 = time.time()
        perm = rng.permutation(len(data.trn_x))
        losses = []
        for i in range(0, len(perm), args.b_size):
            if args.steps_per_epoch and i // args.b_size >= args.steps_per_epoch:
                break
            sel = perm[i : i + args.b_size]
            if len(sel) < args.b_size:
                break
            # randomized steps: nb_steps ~ 2*U{5,49} per batch
            # (`MNISTExperiment.py:152-155`); zero-padded nodes keep the
            # compiled step shape-stable
            n_steps = 2 * rng.randint(5, 50) if random_steps else args.nb_steps
            nodes, weights = padded_cc_quadrature(n_steps, max_steps)
            extras = (nodes, weights)
            if lipschitz:
                lip_key, k = jax.random.split(lip_key)
                extras = (nodes, weights, k)
            params, opt_state, loss = train_step(
                params, opt_state,
                jnp.asarray(data.trn_x[sel]), jnp.asarray(data.trn_y[sel]),
                *extras,
            )
            losses.append(loss)
        # exclude guard-skipped (non-finite) batches from the epoch metric,
        # mirroring the train step's skip — see loops.finite_mean
        train_nll, n_skip = finite_mean(losses)
        if n_skip:
            logger.info(
                "epoch %d: %d/%d non-finite batch losses excluded from the "
                "train metric (updates were skipped by the step guard)",
                epoch, n_skip, len(losses),
            )
        valid_bpp = eval_split(data.val_x, data.val_y)
        # per-epoch test bpp tracking (`MNISTExperiment.py:213-222` logs the
        # held-out loss every epoch alongside train)
        test_bpp = eval_split(data.tst_x, data.tst_y)
        metrics.scalar("train_nll", train_nll, epoch)
        metrics.scalar("valid_bpp", valid_bpp, epoch)
        metrics.scalar("test_bpp", test_bpp, epoch)
        best.update(train_nll, valid_bpp, params)
        if plateau is not None:
            new_lr = plateau.update(valid_bpp, lr)
            if new_lr != lr:
                lr = new_lr
                opt_state = set_learning_rate(opt_state, lr)
                logger.info("epoch %d: lr -> %g", epoch, lr)
        if epoch % 5 == 0:
            ckpt.save(epoch, params, opt_state)
            # persist improved best stashes with the periodic save so a
            # killed run cannot lose them (see train_uci.py)
            best.flush()
        logger.info(
            "epoch %3d  train NLL %.1f  valid bpp %.4f  test bpp %.4f  (%.1fs)",
            epoch, train_nll, valid_bpp, test_bpp, time.time() - t0,
        )

    best.flush()
    best_params = ckpt.load_best("valid", params)
    if best_params is not None:
        params = best_params
    test_bpp = eval_split(data.tst_x, data.tst_y)
    logger.info("FINAL test bpp: %.4f", test_bpp)
    out = {"test_bpp": test_bpp}
    if floor_bpp is not None:
        out.update(floor_bpp=floor_bpp, bpp_gap=test_bpp - floor_bpp)
        logger.info(
            "AR(1) gate: floor %.4f  gap %.4f bpp", floor_bpp, test_bpp - floor_bpp
        )
    print(json.dumps(out))

    if args.gen > 0:
        # generation: z ~ N(0, T) -> invert -> logit_back (`MNISTExperiment.py:180-196`)
        key = jax.random.PRNGKey(args.seed + 3)
        z = jax.random.normal(key, (args.gen, 784))
        if args.temp_sweep:
            # temperature ladder: 10 consecutive rows per temperature in
            # arange(0.1, 1.1, 0.1) (`MNISTExperiment.py:100-116`)
            temps = jnp.repeat(
                jnp.arange(0.1, 1.1, 0.1), max(args.gen // 10, 1)
            )[: args.gen]
            z = z * temps[:, None]
        else:
            z = z * args.temperature
        ctx = (
            jax.nn.one_hot(jnp.arange(args.gen) % 10, 10)
            if args.conditionnal
            else None
        )
        t0 = time.time()
        # parallel Jacobi-Newton: ~25x fewer integrand sweeps than the
        # reference's dimension-sequential bisection at D=784
        x = model.invert(params, z, iters=5 * args.nb_iter, context=ctx, method="newton")
        # bpp/ll of the generated batch (`MNISTExperiment.py:124-126`)
        gen_bpp, gen_ll, _ = model.compute_bpp(params, x, context=ctx)
        logger.info(
            "generated-batch bpp %.4f  ll %.4f",
            float(gen_bpp.mean()), float(gen_ll.mean()),
        )
        imgs = logit_back(np.asarray(x)).reshape(-1, 28, 28)
        np.save(folder / "generated.npy", imgs)
        try:
            from umnn_tpu.utils.visualize import image_grid

            tag = "sweep" if args.temp_sweep else str(args.temperature)
            image_grid(imgs, folder / f"{tag}images.png", ncols=10)
        except Exception as e:  # matplotlib optional
            logger.info("image grid skipped: %s", e)
        logger.info("generated %d images in %.1fs -> %s", args.gen,
                    time.time() - t0, folder / "generated.npy")
    return 0


if __name__ == "__main__":
    sys.exit(main())
