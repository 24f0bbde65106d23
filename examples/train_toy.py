"""2-D toy density estimation with a UMNN-MAF flow.

Framework equivalent of the reference driver `ToyExperiments.py`: train a
flow on the FFJORD toy densities, report train/test NLL, periodically
checkpoint model AND optimizer state (`ToyExperiments.py:163-165`), resume
with ``-load`` (`ToyExperiments.py:131-136`), optionally sample via
inversion and save density plots (`summary_plots`, `ToyExperiments.py:14-118`).
Model/optimizer defaults follow `ToyExperiments.py:125-129`: hidden sizes
[100]*4 for both subnets, embedding 10, Adam(1e-3, wd=1e-5).

The conditional path (``-data conditionnal8gaussians``) trains a
ConditionalMADE-conditioned flow on the (x, one-hot) pairs the generator
emits (`lib/toy_data.py:54-73`) — density estimation of p(x | component).

TPU-first: one jitted SPMD train step, batch axis sharded over the mesh.

Usage:
    python examples/train_toy.py -data 8gaussians -nb_epoch 10
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from umnn_tpu.data.toy import TOY_DATASETS, inf_train_gen
from umnn_tpu.models.flow import UMNNMAFFlow
from umnn_tpu.parallel.mesh import batch_sharded, data_mesh, replicated
from umnn_tpu.training.checkpoint import CheckpointManager
from umnn_tpu.training.loops import make_optimizer, make_train_step, retry_transient


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-data", default="8gaussians", choices=list(TOY_DATASETS))
    p.add_argument("-nb_epoch", type=int, default=50)
    p.add_argument("-nb_flow", type=int, default=1)
    p.add_argument("-nb_steps", type=int, default=20)
    p.add_argument("-embedding_s", type=int, default=10)
    p.add_argument("-hidden_embedding", type=int, nargs="+", default=[100, 100, 100, 100])
    p.add_argument("-hidden_derivative", type=int, nargs="+", default=[100, 100, 100, 100])
    p.add_argument("-b_size", type=int, default=512)
    p.add_argument("-lr", type=float, default=1e-3)
    p.add_argument("-wd", type=float, default=1e-5)
    p.add_argument("-seed", type=int, default=0)
    p.add_argument("-sample", type=int, default=0, help="draw N samples at the end")
    p.add_argument("-folder", default="")
    p.add_argument("-load", action="store_true", help="resume from checkpoint")
    p.add_argument(
        "-ckpt_every", type=int, default=100,
        help="checkpoint cadence in epochs (`ToyExperiments.py:163`)",
    )
    args = p.parse_args()

    conditional = args.data == "conditionnal8gaussians"
    cond_in = 8 if conditional else 0

    def gen(rng_, n):
        out = inf_train_gen(args.data, rng_, n)
        if conditional:
            return jnp.asarray(out[0]), jnp.asarray(out[1])
        return jnp.asarray(out[:, :2]), None

    rng = np.random.RandomState(args.seed)
    model = UMNNMAFFlow(
        nb_flow=args.nb_flow,
        nb_in=2,
        hidden_derivative=tuple(args.hidden_derivative),
        hidden_embedding=tuple(args.hidden_embedding),
        embedding_s=args.embedding_s,
        nb_steps=args.nb_steps,
        cond_in=cond_in,
    )
    params = model.init(jax.random.PRNGKey(args.seed))
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    print(f"devices={jax.devices()} params={n_params}")

    optimizer = make_optimizer("adam", lr=args.lr, weight_decay=args.wd)
    opt_state = optimizer.init(params)
    mesh = data_mesh()
    rep, shd = replicated(mesh), batch_sharded(mesh)

    ckpt = None
    start_epoch = 0
    if args.folder:
        ckpt = CheckpointManager(Path(args.folder) / args.data / "ckpt")
        if args.load:
            # resume: model AND optimizer state (`ToyExperiments.py:131-136`)
            restored = ckpt.restore(template={"params": params, "opt_state": opt_state})
            if restored is not None:
                start_epoch, params, opt_state = restored
                start_epoch += 1
                print(f"resumed from epoch {start_epoch - 1}")

    if conditional:
        def loss_fn(prm, batch, ctx):
            ll, _ = model.compute_ll(prm, batch, context=ctx)
            return -jnp.mean(ll)

        train_step = make_train_step(loss_fn, optimizer, mesh, extra_shardings=("shard",))
        eval_step = retry_transient(
            jax.jit(loss_fn, in_shardings=(rep, shd, shd), out_shardings=rep)
        )
    else:
        def loss_fn(prm, batch):
            ll, _ = model.compute_ll(prm, batch)
            return -jnp.mean(ll)

        train_step = make_train_step(loss_fn, optimizer, mesh)
        eval_step = retry_transient(
            jax.jit(loss_fn, in_shardings=(rep, shd), out_shardings=rep)
        )

    steps_per_epoch = 10
    for epoch in range(start_epoch, args.nb_epoch):
        t0 = time.time()
        losses = []
        for _ in range(steps_per_epoch):
            batch, ctx = gen(rng, args.b_size)
            if conditional:
                params, opt_state, loss = train_step(params, opt_state, batch, ctx)
            else:
                params, opt_state, loss = train_step(params, opt_state, batch)
            losses.append(loss)
        tb, tc = gen(rng, 2048)
        test_nll = float(eval_step(params, tb, tc) if conditional else eval_step(params, tb))
        print(
            f"epoch {epoch:3d}  train NLL {float(jnp.stack(losses).mean()):8.4f}  "
            f"test NLL {test_nll:8.4f}  ({time.time()-t0:.2f}s)"
        )
        if ckpt is not None and epoch % args.ckpt_every == 0:
            ckpt.save(epoch, params, opt_state)

    if ckpt is not None:
        ckpt.save(max(args.nb_epoch - 1, 0), params, opt_state)

    if args.sample > 0:
        t0 = time.time()
        key = jax.random.PRNGKey(args.seed + 1)
        ctx = None
        if conditional:
            # one sample per mixture component, cycling
            ctx = jnp.eye(8)[jnp.arange(args.sample) % 8]
        samples = model.sample(params, key, args.sample, context=ctx)
        samples = np.asarray(samples)
        print(
            f"sampled {args.sample} points in {time.time()-t0:.1f}s  "
            f"mean={samples.mean(0)}  std={samples.std(0)}"
        )
        if args.folder:
            out = Path(args.folder)
            out.mkdir(parents=True, exist_ok=True)
            np.save(out / f"samples_{args.data}.npy", samples)
            try:
                from umnn_tpu.utils.visualize import visualize_transform

                def log_prob(pts):
                    c = jnp.eye(8)[jnp.zeros(pts.shape[0], jnp.int32)] if conditional else None
                    ll, _ = model.compute_ll(params, pts, context=c)
                    return ll

                visualize_transform(
                    samples, log_prob, out / f"density_{args.data}.png"
                )
                print(f"saved density plot to {out}/density_{args.data}.png")
            except Exception as e:  # matplotlib optional
                print(f"density plot skipped: {e}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
